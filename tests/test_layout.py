"""Range-clustered write layout (presto_on_ray_spark/layout.py): the
stats-pruning contract that matters at 100 TB, measured on real parquet
footers."""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_on_ray_spark.layout import clustering_stats, write_clustered
from presto_on_ray_spark.operators._util import t


def test_clustered_write_tightens_rowgroup_stats(spark, sf_dir, tmp_path):
    ev = t(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))

    naive = str(tmp_path / "naive")
    clustered = str(tmp_path / "clustered")
    # naive: shuffled layout (round-robin repartition scatters the keys)
    ev.repartition(4).write.parquet(naive)
    write_clustered(ev, clustered, ["ts_us"], num_files=4)

    s_naive = clustering_stats(naive, "ts_us")
    s_clustered = clustering_stats(clustered, "ts_us")
    assert s_clustered["row_groups"] > 0
    # every naive row group spans ~the whole time range; clustered ones
    # must cover a small fraction of it
    assert s_naive["avg_span_fraction"] > 0.8
    assert s_clustered["avg_span_fraction"] < 0.5
    assert (
        s_clustered["avg_span_fraction"] < s_naive["avg_span_fraction"] / 2
    ), (s_naive, s_clustered)


def test_clustered_read_prunes_files_in_plan(spark, sf_dir, tmp_path):
    """A time-range filter over the clustered layout must push the
    predicate to the scan; correctness of the filtered read is checked
    against the unclustered source."""
    ev = t(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    clustered = str(tmp_path / "clustered")
    write_clustered(ev, clustered, ["ts_us"], num_files=4)

    lo = ev.agg(F.min("ts_us")).collect()[0][0]
    hi = ev.agg(F.max("ts_us")).collect()[0][0]
    cut = lo + (hi - lo) // 10  # first ~10% of the time range

    back = spark.read.parquet(clustered).filter(F.col("ts_us") <= cut)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan or "LessThanOrEqual" in plan
    assert back.count() == ev.filter(F.col("ts_us") <= cut).count()


def test_layout_scan_demo_skips_row_groups(spark, sf_dir, tmp_path):
    """The benched layout pair (bench.py layout_scan_* keys): the same
    trailing-time-range predicate must be able to skip most clustered
    row groups on footer stats and none of the naive ones."""
    from presto_on_ray_spark.layout import layout_scan_demo

    demo = layout_scan_demo(spark, sf_dir, str(tmp_path), num_files=4)
    cl, nv = demo["pruning_clustered"], demo["pruning_naive"]
    assert cl["row_groups_pruned"] > 0
    assert cl["row_groups_pruned"] >= cl["row_groups"] // 2
    assert nv["row_groups_pruned"] == 0
    assert demo["rows_selected"] > 0


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """The multi-dimensional layout contract: a (ts, user) z-order
    gives footer stats that prune row groups for predicates on EITHER
    dimension, where the 1-d ts-clustered layout is blind to user_id
    (every row group spans all users); the 2-d box pruning of the two
    layouts stays comparable; and layouts are semantics-preserving
    (identical selected rows)."""
    from presto_on_ray_spark.layout import layout_zorder_demo

    d = layout_zorder_demo(spark, sf_dir, str(tmp_path), num_files=16)
    # 1-d layout: perfect on its key, blind on the other dimension
    assert d["pruning_ts_clustered"]["row_groups_pruned"] > 0
    assert d["pruning_user_clustered"]["row_groups_pruned"] == 0
    # z-order: prunes on BOTH dimensions
    assert d["pruning_ts_zorder"]["row_groups_pruned"] > 0
    assert d["pruning_user_zorder"]["row_groups_pruned"] > 0
    # and the 2-d box is at least half as selective as the 1-d best
    assert (
        2 * d["pruning_box_zorder"]["row_groups_pruned"]
        >= d["pruning_box_clustered"]["row_groups_pruned"]
    )
    assert d["rows_selected"] > 0


def test_zorder_key_interleaves_quantile_buckets(spark):
    """zorder_key semantics on a controlled grid: bucket boundaries
    are quantiles (skew cannot collapse the key space), the key is
    deterministic, and interleaving really mixes both dimensions —
    two rows far apart in EITHER dimension get far-apart keys, rows
    equal in both get equal keys."""
    from presto_on_ray_spark.layout import zorder_key

    # a 10x10 grid where every coordinate pair appears TWICE (ids
    # 0-99 and 100-199), so equal-coordinates-equal-keys is a real
    # comparison, not vacuous
    rows = [
        (i + 100 * dup, float(i % 10), float(i // 10))
        for i in range(100)
        for dup in (0, 1)
    ]
    df = spark.createDataFrame(rows, "id int, x double, y double")
    zdf, k = zorder_key(df, ["x", "y"], bits=4)
    got = {r["id"]: r[k] for r in zdf.collect()}
    # deterministic across evaluation
    again = {r["id"]: r[k] for r in zdf.collect()}
    assert got == again
    # equal coordinates -> equal keys (each pair has two distinct ids)
    for i in range(100):
        assert got[i] == got[i + 100], (i, got[i], got[i + 100])
    # distinct coordinates -> distinct keys on this exact grid (10x10
    # fits 4 bits per dim exactly, so the bucketization is injective)
    assert len({got[i] for i in range(100)}) == 100
    # monotone corner ordering: the (min,min) corner is the smallest
    # key, the (max,max) corner the largest
    assert got[0] == min(got.values())      # (0, 0)
    assert got[99] == max(got.values())     # (9, 9)


def test_zorder_key_guards(spark):
    """The loud-refusal contract: key widths past 63 bits would set
    the sign bit / wrap Java shift amounts and silently destroy
    locality; a pre-existing _zkey column must not be clobbered."""
    import pytest

    from presto_on_ray_spark.layout import zorder_key

    df = spark.createDataFrame(
        [(1, 1.0, 2.0)], "id int, x double, y double"
    )
    with pytest.raises(ValueError, match="63"):
        zorder_key(df, ["x", "y"], bits=32)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key(df, [])
    # caller data already owns '_zkey': the generated key must pick a
    # fresh name and leave the user's column intact
    df2 = df.withColumn("_zkey", df.id * 10)
    zdf, key = zorder_key(df2, ["x", "y"], bits=4)
    assert key != "_zkey" and key in zdf.columns
    assert [r["_zkey"] for r in zdf.collect()] == [10]
    # non-identifier column names are refused loudly up front:
    # Spark's name-based APIs (approxQuantile, Bucketizer) parse dots
    # as struct access, so proceeding would die in an opaque
    # AnalysisException deep in the pipeline
    df3 = spark.createDataFrame([(1, 1.0), (2, 9.0)], ["id", "a.b"])
    with pytest.raises(ValueError, match="identifier"):
        zorder_key(df3, ["a.b"], bits=4)


def test_zorder_key_degenerate_columns(spark):
    """Columns with no finite values (all NULL / empty input) bucket
    constant 0 instead of crashing Bucketizer with a 2-element splits
    array, NaN/NULL land in the low corner alongside real minima, and
    the remaining finite columns still order the key."""
    from presto_on_ray_spark.layout import zorder_key

    df = spark.createDataFrame(
        [
            (1, 1.0, None, float("nan")),
            (2, 9.0, None, 5.0),
        ],
        "id int, x double, dead double, y double",
    )
    zdf, k = zorder_key(df, ["x", "dead", "y"], bits=4)
    got = {r["id"]: r[k] for r in zdf.collect()}
    # the all-NULL column contributes nothing; x and y still order:
    # row 1 is the (min, NaN->low corner) point -> strictly smaller key
    assert got[1] < got[2]
    # fully empty input must not crash
    empty, k2 = zorder_key(df.filter("id < 0"), ["x", "y"], bits=4)
    assert k2 in empty.columns
    assert empty.count() == 0


def test_zorder_key_warns_past_2_53(spark):
    """ADVICE r11: the bucketing path runs in doubles, so integer
    columns beyond 2^53 lose resolution (neighboring ids collapse to
    one double) — the key still computes, but loudly."""
    import warnings

    from presto_on_ray_spark.layout import zorder_key

    big = 1 << 60  # double spacing here is 2^7: ids 0..63 all collapse
    df = spark.createDataFrame(
        [(big + i, i % 7) for i in range(64)], "snowflake long, x int"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        zdf, k = zorder_key(df, ["snowflake", "x"], bits=4)
        assert zdf.count() == 64  # key computes despite the collapse
    assert any("lose resolution" in str(x.message) for x in w)

    # small-magnitude columns stay silent
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        zorder_key(df, ["x"], bits=4)
    assert not [x for x in w if "lose resolution" in str(x.message)]


def test_zorder_2_53_warning_is_type_gated(spark):
    """Code-review r12: a native DOUBLE column past 2^53 is already at
    its stored precision — the integer-resolution warning must not
    fire for it (false alarms train users to ignore the id case)."""
    import warnings

    from presto_on_ray_spark.layout import zorder_key

    df = spark.createDataFrame(
        [(float(2**60) * (1 + i / 50.0), i) for i in range(64)],
        "measurement double, x int",
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        zdf, k = zorder_key(df, ["measurement", "x"], bits=4)
        assert zdf.count() == 64
    assert not [x for x in w if "lose resolution" in str(x.message)]


def test_zorder_decimal_scale_threshold_warns(spark):
    """Code-review r12 #2: decimal(p, s) loses double resolution past
    2^53 / 10^s, far below 2^53 for fractional scales — the warning
    threshold must scale with the type."""
    import decimal
    import warnings

    from presto_on_ray_spark.layout import zorder_key

    # decimal(20, 6) around 1e10: double ULP there (~2e-6) exceeds the
    # type's 1e-6 step, so neighboring values collapse — must warn
    rows = [
        (decimal.Decimal("10000000000.%06d" % i), i % 7) for i in range(64)
    ]
    df = spark.createDataFrame(rows, "d decimal(20,6), x int")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        zdf, k = zorder_key(df, ["d", "x"], bits=4)
        assert zdf.count() == 64
    assert any("lose resolution" in str(x.message) for x in w)

    # the same scale at small magnitudes is exactly representable
    small = [(decimal.Decimal("1.%06d" % i), i % 7) for i in range(64)]
    df2 = spark.createDataFrame(small, "d decimal(20,6), x int")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        zorder_key(df2, ["d", "x"], bits=4)
    assert not [x for x in w if "lose resolution" in str(x.message)]
