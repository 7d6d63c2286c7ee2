"""Governance report (governance.corpus_health_report): column
consistency against the member operators it composes."""

from __future__ import annotations

from presto_on_ray_spark import suite

suite.load_all()


def test_report_columns_agree_with_members(spark, sf_dir):
    from presto_on_ray_spark.operators._util import t

    rows = suite.QUERIES["corpus_health_report"](spark, sf_dir).collect()
    d = t(spark, sf_dir, "documents")
    n_sources = d.select("source").distinct().count()
    assert len(rows) == n_sources
    assert sum(r.n_docs for r in rows) == d.filter("text IS NOT NULL").count()

    clf = suite.QUERIES["text_quality_classifier"](spark, sf_dir)
    assert sum(r.n_keep for r in rows) == clf.filter("keep").count()

    bp = suite.QUERIES["corpus_boilerplate_strip"](spark, sf_dir)
    assert sum(r.n_boilerplate_docs for r in rows) == bp.filter(
        "n_cut_segments > 0"
    ).count()

    psi = {r.source: r.psi for r in suite.QUERIES["corpus_drift_psi"](spark, sf_dir).collect()}
    for r in rows:
        assert r.psi == psi[r.source]
        assert 0 <= r.n_exact_dup_docs <= r.n_docs
        assert 0 <= r.n_boilerplate_docs <= r.n_docs
        assert 0 <= r.n_keep <= r.n_docs


def test_pipeline_views_through_the_sql_front_door(spark, sf_dir):
    from presto_on_ray_spark.engine import Engine

    eng = Engine(spark).register_tables(sf_dir).register_pipeline_views(
        ["corpus_health_report", "text_quality_classifier", "split_leakage_safe"]
    )
    # plain read
    rows = eng.sql(
        "SELECT source, n_docs, psi FROM corpus_health_report ORDER BY source"
    ).collect()
    assert len(rows) == 20 and rows[0].source == "src0"
    # JOIN a pipeline view against another one through SQL
    joined = eng.sql(
        """
        SELECT s.split, COUNT(*) AS n,
               SUM(CASE WHEN c.keep THEN 1 ELSE 0 END) AS kept
        FROM split_leakage_safe s JOIN text_quality_classifier c USING (doc_id)
        GROUP BY s.split ORDER BY s.split
        """
    ).collect()
    assert {r.split for r in joined} == {"train", "val", "test"}
    assert all(0 <= r.kept <= r.n for r in joined)


def test_pipeline_views_unknown_name_and_missing_catalog(spark, sf_dir):
    import pytest

    from presto_on_ray_spark.engine import Engine

    with pytest.raises(ValueError, match="attach the table catalog first"):
        Engine(spark).register_pipeline_views(["corpus_health_report"])
    eng = Engine(spark).register_tables(sf_dir)
    with pytest.raises(KeyError, match="not a registered suite query"):
        eng.register_pipeline_views(["no_such_operator"])


def test_saved_report_equals_inline_when_fresh(spark, sf_dir, tmp_path):
    """VERDICT r12 #4 'done' condition: oracle-equality of the
    saved-store dashboard with the inline key when the store is
    fresh."""
    import pyspark.sql.functions as F

    from presto_on_ray_spark.operators._util import t
    from presto_on_ray_spark.operators.governance import (
        corpus_health_report,
        corpus_health_report_from_counts,
    )
    from presto_on_ray_spark.operators.pipeline_prep import (
        _BP_W,
        save_segment_counts,
        segment_counts,
    )

    store = str(tmp_path / "counts")
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    save_segment_counts(segment_counts(d, _BP_W), store)
    inline = corpus_health_report(spark, sf_dir)
    saved = corpus_health_report_from_counts(spark, sf_dir, store)
    assert inline.exceptAll(saved).count() == 0
    assert saved.exceptAll(inline).count() == 0


def test_saved_report_generation_staleness_guard(spark, sf_dir, tmp_path):
    """Pinning the generation raises StaleSegmentCounts after a
    concurrent merge flips the pointer; re-capturing the live
    generation clears it."""
    import pyspark.sql.functions as F
    import pytest

    from presto_on_ray_spark.operators._util import t
    from presto_on_ray_spark.operators.governance import (
        corpus_health_report_from_counts,
    )
    from presto_on_ray_spark.operators.pipeline_prep import (
        _BP_W,
        StaleSegmentCounts,
        counts_live_generation,
        merge_into_saved_segment_counts,
        save_segment_counts,
        segment_counts,
    )

    store = str(tmp_path / "counts")
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    save_segment_counts(segment_counts(d, _BP_W), store)
    pinned = counts_live_generation(store)
    # the pinned read works while the store is untouched
    assert (
        corpus_health_report_from_counts(
            spark, sf_dir, store, expect_generation=pinned
        ).count()
        > 0
    )
    # a concurrent merge flips the generation → the stale pin raises
    merge_into_saved_segment_counts(spark, store, d.limit(3), _BP_W)
    assert counts_live_generation(store) != pinned
    with pytest.raises(StaleSegmentCounts, match="live generation"):
        corpus_health_report_from_counts(
            spark, sf_dir, store, expect_generation=pinned
        )
    # re-capture clears it
    fresh = counts_live_generation(store)
    corpus_health_report_from_counts(
        spark, sf_dir, store, expect_generation=fresh
    )


def test_pinned_report_binds_pinned_generation_not_live(spark, sf_dir, tmp_path):
    """ADVICE r13 TOCTOU fix: when the pin HOLDS at check time, the
    report's lazy plan is bound to the PINNED generation directory —
    a merge landing after the check (the store keeps one superseded
    generation for lazy readers) must not silently rebind the
    relation to the new counts. We simulate the race by building the
    pinned report, flipping the store with a merge, and only then
    executing the plan: the result must equal the pre-merge report."""
    import pyspark.sql.functions as F

    from presto_on_ray_spark.operators._util import t
    from presto_on_ray_spark.operators.governance import (
        corpus_health_report_from_counts,
    )
    from presto_on_ray_spark.operators.pipeline_prep import (
        _BP_W,
        counts_live_generation,
        merge_into_saved_segment_counts,
        save_segment_counts,
        segment_counts,
    )

    store = str(tmp_path / "counts")
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    save_segment_counts(segment_counts(d, _BP_W), store)
    pinned = counts_live_generation(store)
    before = corpus_health_report_from_counts(
        spark, sf_dir, store, expect_generation=pinned
    )
    expected = {tuple(r) for r in before.collect()}
    # build the LAZY pinned plan, then let a concurrent merge flip the
    # pointer BEFORE execution — the classic check-then-read window
    lazy = corpus_health_report_from_counts(
        spark, sf_dir, store, expect_generation=pinned
    )
    merge_into_saved_segment_counts(
        spark, store, d.limit(5).withColumn("text", F.lit("x x x")), _BP_W
    )
    assert counts_live_generation(store) != pinned
    got = {tuple(r) for r in lazy.collect()}
    assert got == expected, "pinned report rebound to the flipped generation"


def test_deferred_pipeline_views_zero_jobs_until_first_read(spark, sf_dir):
    """VERDICT r12 #6 'done' condition: deferred registration triggers
    ZERO jobs and zero operator constructions; the first sql() read
    materializes exactly once (driver jobs + persist + view publish);
    the second read hits the cached view without re-running the
    operator."""
    import contextlib

    from presto_on_ray_spark import suite
    from presto_on_ray_spark.engine import Engine

    name = "similarity_kcenter_seeds"  # a driver-loop operator
    with contextlib.suppress(Exception):
        spark.catalog.dropTempView(name)
    sc = spark.sparkContext
    eng = Engine(spark).register_tables(sf_dir)
    calls = {"n": 0}
    orig = suite.QUERIES[name]

    def counted(s, d):
        calls["n"] += 1
        return orig(s, d)

    suite.QUERIES[name] = counted
    try:
        sc.setJobGroup("defer-reg", "registration must run zero jobs")
        eng.register_pipeline_views([name], deferred=True)
        sc.setJobGroup("defer-done", "")
        assert list(sc.statusTracker().getJobIdsForGroup("defer-reg")) == []
        assert calls["n"] == 0
        assert not spark.catalog.tableExists(name)

        rows = eng.sql(f"SELECT COUNT(*) AS n FROM {name}").collect()
        assert rows[0].n == 6 and calls["n"] == 1
        assert spark.catalog.tableExists(name)

        eng.sql(f"SELECT MAX(seed_rank) AS m FROM {name}").collect()
        assert calls["n"] == 1  # one materialization only
    finally:
        suite.QUERIES[name] = orig
        with contextlib.suppress(Exception):
            spark.catalog.dropTempView(name)


def test_deferred_pipeline_views_validation(spark, sf_dir):
    import pytest

    from presto_on_ray_spark.engine import Engine

    eng = Engine(spark).register_tables(sf_dir)
    with pytest.raises(KeyError, match="not a registered suite query"):
        eng.register_pipeline_views(["no_such_operator"], deferred=True)


def test_saved_report_scratch_store_reused_and_swept(spark, sf_dir):
    """VERDICT r14 #7: the saved-report key's scratch store is ONE
    stable per-(user, corpus) location reused across invocations —
    repeated runs must not mint new store directories, and the
    generation sweep must bound the reused store at live+predecessor
    (~2 generations) no matter how many times the key runs."""
    import getpass
    import glob
    import hashlib
    import os
    import tempfile

    from presto_on_ray_spark import suite

    suite.load_all()
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    store = os.path.join(
        tempfile.gettempdir(),
        f"por_spark_health_counts_{getpass.getuser()}_{tag}",
    )
    pattern = os.path.join(
        tempfile.gettempdir(),
        f"por_spark_health_counts_{getpass.getuser()}_*",
    )
    fn = suite.QUERIES["corpus_health_report_saved"]
    fn(spark, sf_dir).collect()
    stores_after_first = set(glob.glob(pattern))
    fn(spark, sf_dir).collect()
    fn(spark, sf_dir).collect()
    # no new store directories minted by repeat runs (per-corpus tags
    # from OTHER sf_dirs may pre-exist; this sf_dir contributes one)
    assert set(glob.glob(pattern)) == stores_after_first
    assert store in stores_after_first
    # the reused store is swept to live + predecessor
    gens = [
        n for n in os.listdir(store)
        if n.startswith("gen-") and n[4:].isdigit()
    ]
    assert len(gens) <= 2, gens
