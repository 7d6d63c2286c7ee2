"""Streaming ANN admission (streaming/ann.py): stream == one-shot
merge equality, structural exactly-once under re-delivery (no token
log — resume semantics make replays no-ops), checkpoint recovery, and
the loud within-batch-duplicate refusal."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from presto_on_ray_spark.caching import release_cached
from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.operators.similarity import (
    build_ann_index,
    load_ann_index,
    merge_into_ann_index,
    quantized,
    save_ann_index,
    verify_ann_index,
)
from presto_on_ray_spark.streaming.ann import stream_ann_ingest


def _vecs(spark, sf_dir):
    return t(spark, sf_dir, "embeddings").select(
        "vec_id", quantized(F.col("embedding")).alias("qv")
    )


def _codes_set(codes):
    return {
        (r["vec_id"], r["cell"], r["j"], r["code"]) for r in codes.collect()
    }


def _write_arrivals(spark, sf_dir, src):
    """Two single-part arrival files (playbook: multi-part writes split
    into more micro-batches than files under maxFilesPerTrigger=1)."""
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    for name, lo, hi in (("f1", 400, 450), ("f2", 450, 500)):
        e.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).coalesce(
            1
        ).write.parquet(str(src / name))


def _arrival_stream(spark, src):
    return (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )


def test_stream_ann_ingest_equals_one_shot_merge(spark, sf_dir, tmp_path):
    v = _vecs(spark, sf_dir)
    base = v.filter(F.col("vec_id") < 400)
    idx = build_ann_index(base)
    p = str(tmp_path / "ann")
    save_ann_index(idx, p)
    src = tmp_path / "arrivals"
    _write_arrivals(spark, sf_dir, src)

    stream_ann_ingest(
        _arrival_stream(spark, src), p, checkpoint_dir=str(tmp_path / "ckpt")
    )

    streamed = load_ann_index(spark, p)
    verify_ann_index(streamed)
    want = merge_into_ann_index(idx, v.filter(F.col("vec_id") >= 400))
    assert _codes_set(streamed.codes) == _codes_set(want.codes)
    release_cached()


def test_stream_ann_ingest_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Structural exactly-once: a FRESH checkpoint re-delivers every
    batch (batch ids restart at 0 — the exact configuration that needs
    commit tokens on the dedup side), and the index is unchanged,
    because resume semantics skip committed ids rather than matching
    replay tokens. A restart on the SAME checkpoint re-delivers
    nothing, the standard recovery case."""
    v = _vecs(spark, sf_dir)
    idx = build_ann_index(v.filter(F.col("vec_id") < 400))
    p = str(tmp_path / "ann")
    save_ann_index(idx, p)
    src = tmp_path / "arrivals"
    _write_arrivals(spark, sf_dir, src)

    stream_ann_ingest(
        _arrival_stream(spark, src), p, checkpoint_dir=str(tmp_path / "ckpt1")
    )
    after_first = _codes_set(load_ann_index(spark, p).codes)

    # full replay: fresh checkpoint, same files
    stream_ann_ingest(
        _arrival_stream(spark, src), p, checkpoint_dir=str(tmp_path / "ckpt2")
    )
    assert _codes_set(load_ann_index(spark, p).codes) == after_first

    # same-checkpoint restart: no re-delivery, also unchanged
    stream_ann_ingest(
        _arrival_stream(spark, src), p, checkpoint_dir=str(tmp_path / "ckpt1")
    )
    assert _codes_set(load_ann_index(spark, p).codes) == after_first
    verify_ann_index(load_ann_index(spark, p))
    release_cached()


def test_stream_ann_ingest_partial_replay_appends_remainder(
    spark, sf_dir, tmp_path
):
    """The mid-batch-crash shape: half a batch's ids are already
    committed (simulated by a prior merge), and the stream's replayed
    batch appends exactly the missing remainder — no duplicates, no
    refusal."""
    from presto_on_ray_spark.operators.similarity import (
        merge_into_saved_ann_index,
    )

    v = _vecs(spark, sf_dir)
    idx = build_ann_index(v.filter(F.col("vec_id") < 400))
    p = str(tmp_path / "ann")
    save_ann_index(idx, p)
    # "crashed" delivery: ids 400-425 already committed
    merge_into_saved_ann_index(
        spark, p, v.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 425))
    )
    src = tmp_path / "arrivals"
    _write_arrivals(spark, sf_dir, src)

    stream_ann_ingest(
        _arrival_stream(spark, src), p, checkpoint_dir=str(tmp_path / "ckpt")
    )
    merged = load_ann_index(spark, p)
    verify_ann_index(merged)
    assert _codes_set(merged.codes) == _codes_set(build_ann_index(v).codes)
    release_cached()


def test_stream_ann_ingest_refuses_within_batch_duplicates(
    spark, sf_dir, tmp_path
):
    """A vec_id duplicated WITHIN one arrival file must stop the
    stream loudly (the encode argmin would silently keep one arbitrary
    vector) — and the marker releases so the index stays usable after
    the upstream fix."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import StreamingQueryException

    from presto_on_ray_spark.operators.similarity import _ANN_WRITING

    v = _vecs(spark, sf_dir)
    idx = build_ann_index(v.filter(F.col("vec_id") < 400))
    p = str(tmp_path / "ann")
    save_ann_index(idx, p)
    src = tmp_path / "arrivals"
    spark.createDataFrame(
        [(900, [1.0] * 64), (900, [2.0] * 64)],
        "vec_id long, embedding array<float>",
    ).coalesce(1).write.parquet(str(src / "dup"))

    with pytest.raises((StreamingQueryException, Py4JJavaError)) as exc:
        stream_ann_ingest(
            _arrival_stream(spark, src),
            p,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
    assert "appears 2 times in the batch" in str(exc.value)
    assert not os.path.exists(os.path.join(p, _ANN_WRITING))
    verify_ann_index(load_ann_index(spark, p))
    release_cached()


def test_stream_grown_index_rebuild_lifecycle(spark, sf_dir, tmp_path):
    """The composed ANN maintenance loop over an AUTO-sized index
    (r14): build small → stream-ingest 4x the corpus under frozen
    quantizers → ann_rebuild_advice flags the drift → rebuild at the
    corpus's new auto cell count as a fresh generation → advice clears.
    This is the scheduled-maintenance path a 100 TB deployment runs
    next to verify_ann_index: merges stay O(batch) forever, and the
    advisory is what decides when the sqrt-n sizing has drifted a
    rebuild's worth."""
    import pyspark.sql.functions as F

    from presto_on_ray_spark.operators._util import t
    from presto_on_ray_spark.operators.similarity import (
        ann_rebuild_advice,
        auto_ivf_cells,
        build_ann_index,
        load_ann_index,
        quantized,
        save_ann_index,
    )
    from presto_on_ray_spark.streaming.ann import stream_ann_ingest

    e = t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", quantized(F.col("embedding")).alias("qv"))
    n0 = 100
    base = v.filter(F.col("vec_id") < n0)
    p = str(tmp_path / "idx")
    save_ann_index(build_ann_index(base, n_cells=auto_ivf_cells(n0)), p)
    assert not ann_rebuild_advice(load_ann_index(spark, p))["rebuild_due"]

    # stream four append batches (total corpus 5x the build size)
    src = tmp_path / "arrivals"
    for i in range(4):
        base.select((F.col("vec_id") + (i + 1) * n0).alias("vec_id"), "qv") \
            .coalesce(1).write.parquet(str(src / f"b{i}"))
    stream = (
        spark.readStream.schema("vec_id long, qv array<bigint>")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    stream_ann_ingest(
        stream, p, checkpoint_dir=str(tmp_path / "ckpt"), vec_col="qv"
    )
    grown = load_ann_index(spark, p)
    advice = ann_rebuild_advice(grown)
    assert advice["vectors"] == 5 * n0 and advice["rebuild_due"]

    # scheduled rebuild: new generation at the corpus's current auto size
    current = v.filter(F.col("vec_id") < 5 * n0)
    save_ann_index(
        build_ann_index(current, n_cells=advice["auto_cells_now"]), p, force=True
    )
    after = ann_rebuild_advice(load_ann_index(spark, p))
    assert not after["rebuild_due"] and after["cells"] == advice["auto_cells_now"]


def test_stream_ingest_with_rebuild_policy(spark, sf_dir, tmp_path):
    """stream_ann_ingest_with_rebuild runs the r15 lifecycle as
    POLICY: the advice read rides every trigger, the first due trigger
    rebuilds at auto cells (generation flip), a due trigger inside the
    rebuild cooldown is SUPPRESSED (one rebuild per cooldown period,
    not one per batch), and the cooldown's expiry rebuilds again from
    the full vector store. Three due triggers -> exactly two rebuilds."""
    import pyspark.sql.functions as F

    from presto_on_ray_spark.operators._util import t
    from presto_on_ray_spark.operators.similarity import (
        ann_rebuild_advice,
        auto_ivf_cells,
        build_ann_index,
        load_ann_index,
        quantized,
        save_ann_index,
    )
    from presto_on_ray_spark.streaming.ann import (
        stream_ann_ingest_with_rebuild,
    )

    e = t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", quantized(F.col("embedding")).alias("qv"))
    n0 = 100
    base = v.filter(F.col("vec_id") < n0).persist()

    def shifted(lo: int, hi: int):
        """(hi-lo) synthetic vectors with ids [lo, hi) cycled from base."""
        k = (hi - lo + n0 - 1) // n0
        parts = [
            base.select((F.col("vec_id") + lo + i * n0).alias("vec_id"), "qv")
            for i in range(k)
        ]
        out = parts[0]
        for pt in parts[1:]:
            out = out.unionByName(pt)
        return out.filter(F.col("vec_id") < hi)

    p = str(tmp_path / "idx")
    save_ann_index(build_ann_index(base, n_cells=auto_ivf_cells(n0)), p)

    # batches: 4x100 (due at the 4th: 500 vec > 4x100), one 2000-row
    # growth burst and two 100-row tails (due again at 2500/2600/2700;
    # cooldown=2 suppresses the first two)
    bounds = [(100, 200), (200, 300), (300, 400), (400, 500),
              (500, 2500), (2500, 2600), (2600, 2700)]
    src = tmp_path / "arrivals"
    for i, (lo, hi) in enumerate(bounds):
        shifted(lo, hi).coalesce(1).write.parquet(str(src / f"b{i}"))
    full = spark.read.parquet(str(src / "*")).unionByName(base)

    def vectors_source(s):
        ids = load_ann_index(s, p).codes.select("vec_id").distinct()
        return full.join(ids, "vec_id", "left_semi")

    rebuilds = []
    stream = (
        spark.readStream.schema("vec_id long, qv array<bigint>")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    try:
        stream_ann_ingest_with_rebuild(
            stream, p, vectors_source,
            growth_factor=4.0, rebuild_cooldown_triggers=2,
            on_rebuild=rebuilds.append,
            checkpoint_dir=str(tmp_path / "ckpt"), vec_col="qv",
        )
    finally:
        base.unpersist()
    # three due triggers (500, 2500, 2600... and 2700) -> two rebuilds:
    # at 500 vectors and, after the 2-trigger cooldown, at 2700
    assert [a["vectors"] for a in rebuilds] == [500, 2700], rebuilds
    after = load_ann_index(spark, p)
    advice = ann_rebuild_advice(after)
    assert advice["vectors"] == 2700
    assert advice["cells"] == auto_ivf_cells(2700)
    assert not advice["rebuild_due"], advice


# ---------------------------------------------------------------------------
# stream_semantic_admit: sequential admission against the growing
# vector store == the batch twin replayed with the store advanced
# between batches; replay idempotence; empty-store bootstrap; the loud
# within-batch-duplicate refusal.
# ---------------------------------------------------------------------------
def _qv_set(spark, store_path):
    return {
        (r.vec_id, tuple(r.qv))
        for r in spark.read.parquet(store_path).collect()
    }


def _twin_admitted(corpus, batch, cents=None):
    """The batch twin's admitted subset of ``batch`` as a DataFrame;
    ``cents`` pins the store's frozen quantizer sidecar."""
    from presto_on_ray_spark.operators.similarity import (
        semantic_ingest_verdicts,
    )

    verdicts = semantic_ingest_verdicts(corpus, batch, cents=cents)
    return batch.join(
        verdicts.filter(F.col("admit")).select("vec_id"), "vec_id"
    )


def test_stream_semantic_admit_equals_sequential_batch_twin(
    spark, sf_dir, tmp_path
):
    from presto_on_ray_spark.streaming.ann import stream_semantic_admit

    v = _vecs(spark, sf_dir)
    seed = v.filter(F.col("vec_id") < 400)
    store = str(tmp_path / "vstore")
    seed.write.parquet(store)
    src = tmp_path / "arrivals"
    _write_arrivals(spark, sf_dir, src)

    stats = []
    stream_semantic_admit(
        _arrival_stream(spark, src), store,
        on_batch=stats.append, checkpoint_dir=str(tmp_path / "ckpt"),
    )

    from presto_on_ray_spark.operators.similarity import semantic_cells

    # the stream froze its quantizer sidecar from the corpus at first
    # verdict (= the seed); the twin pins the same cells for BOTH steps
    cents0 = semantic_cells(seed)
    b1 = v.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 450))
    b2 = v.filter(F.col("vec_id") >= 450)
    adm1 = _twin_admitted(seed, b1, cents=cents0)
    corpus1 = seed.unionByName(adm1)
    adm2 = _twin_admitted(corpus1, b2, cents=cents0)
    want = corpus1.unionByName(adm2)
    assert _qv_set(spark, store) == {
        (r.vec_id, tuple(r.qv)) for r in want.collect()
    }
    assert [s["batch_id"] for s in stats] == [0, 1]
    assert stats[0]["arrived"] == stats[0]["fresh"] == 50
    assert stats[0]["admitted"] == adm1.count()
    assert stats[1]["admitted"] == adm2.count()


def test_stream_semantic_admit_replay_is_idempotent(spark, sf_dir, tmp_path):
    """A FRESH checkpoint re-delivers both batches; the replay probe
    skips every already-stored id and the re-verdicted remainder is
    empty, so the store survives byte-identical — no token log."""
    from presto_on_ray_spark.streaming.ann import stream_semantic_admit

    v = _vecs(spark, sf_dir)
    store = str(tmp_path / "vstore")
    v.filter(F.col("vec_id") < 400).write.parquet(store)
    src = tmp_path / "arrivals"
    _write_arrivals(spark, sf_dir, src)

    stream_semantic_admit(
        _arrival_stream(spark, src), store,
        checkpoint_dir=str(tmp_path / "ckpt1"),
    )
    before = _qv_set(spark, store)
    stats = []
    stream_semantic_admit(
        _arrival_stream(spark, src), store,
        on_batch=stats.append, checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    assert _qv_set(spark, store) == before
    # previously-ADMITTED ids are skipped by the replay probe;
    # previously-REJECTED ids are absent from the store, so they count
    # as fresh and re-verdict — to rejection again (frozen cells make
    # rejection monotone), which is the invariant that matters
    assert all(s["admitted"] == 0 for s in stats)
    n_rejected_run1 = 100 - (len(before) - 400)
    assert sum(s["fresh"] for s in stats) == n_rejected_run1


def test_stream_semantic_admit_bootstraps_empty_store(
    spark, sf_dir, tmp_path
):
    """No store at start: the first batch seeds the corpus wholesale
    (nothing to collide with), the second admits against it — the
    drift loops' first-batch-seeds-the-reference convention."""
    from presto_on_ray_spark.streaming.ann import stream_semantic_admit

    v = _vecs(spark, sf_dir)
    store = str(tmp_path / "vstore")
    src = tmp_path / "arrivals"
    _write_arrivals(spark, sf_dir, src)

    stream_semantic_admit(
        _arrival_stream(spark, src), store,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    b1 = v.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 450))
    b2 = v.filter(F.col("vec_id") >= 450)
    want = b1.unionByName(_twin_admitted(b1, b2))
    assert _qv_set(spark, store) == {
        (r.vec_id, tuple(r.qv)) for r in want.collect()
    }


def test_stream_semantic_admit_refuses_within_batch_duplicates(
    spark, sf_dir, tmp_path
):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import StreamingQueryException

    from presto_on_ray_spark.streaming.ann import stream_semantic_admit

    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = e.filter(F.col("vec_id") == 400)
    dup.unionByName(dup).coalesce(1).write.parquet(str(tmp_path / "src" / "f"))
    store = str(tmp_path / "vstore")
    with pytest.raises((StreamingQueryException, Py4JJavaError)) as exc:
        stream_semantic_admit(
            _arrival_stream(spark, tmp_path / "src"), store,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
    assert "duplicate vec_id" in str(exc.value)
    assert not os.path.exists(store)


def test_semantic_cells_lifecycle_rebuild(spark, sf_dir, tmp_path):
    """The admission store's maintenance pair end-to-end: seed small →
    stream-admit growth → advice FIRES once the corpus outgrows the
    frozen dial → rebuild rewrites the sidecar at the auto dial →
    advice is quiet and the next admission run verdicts under the new
    geometry (== the batch twin with the rebuilt cells pinned)."""
    from presto_on_ray_spark.operators.similarity import (
        auto_ivf_cells,
        semantic_cells,
    )
    from presto_on_ray_spark.streaming.ann import (
        rebuild_semantic_cells,
        semantic_cells_advice,
        stream_semantic_admit,
    )

    v = _vecs(spark, sf_dir)
    store = str(tmp_path / "vstore")
    # tiny seed: 5 vectors → auto dial floors at 8 cells... a 5-row
    # corpus yields 5 head cells, so built_for = 25 — the 400-row
    # growth below overruns it 16x, a genuine growth episode
    seed = v.filter(F.col("vec_id") < 5)
    seed.write.parquet(store)
    assert not semantic_cells_advice(spark, store)["rebuild_due"]  # no sidecar

    src = tmp_path / "arrivals"
    _write_arrivals(spark, sf_dir, src)
    stream_semantic_admit(
        _arrival_stream(spark, src), store,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    advice = semantic_cells_advice(spark, store)
    assert advice["cells"] == 5 and advice["built_for"] == 25
    assert advice["rebuild_due"], advice

    post = rebuild_semantic_cells(spark, store)
    assert post["cells"] == auto_ivf_cells(post["vectors"])
    assert not post["rebuild_due"], post
    want = {
        (r.cell, tuple(r.cv))
        for r in semantic_cells(
            spark.read.parquet(store).select("vec_id", "qv")
        ).collect()
    }
    got = {
        (r.cell, tuple(r.cv))
        for r in spark.read.parquet(store + "/_cents").collect()
    }
    assert got == want

    # a later run admits under the REBUILT geometry: stream a third
    # batch and compare against the batch twin with the new cells
    extra = t(spark, sf_dir, "embeddings").select("vec_id", "embedding").filter(
        (F.col("vec_id") >= 350) & (F.col("vec_id") < 400)
    )
    extra.coalesce(1).write.parquet(str(tmp_path / "src2" / "f"))
    corpus_before = spark.read.parquet(store).select("vec_id", "qv")
    corpus_before = corpus_before.persist()
    corpus_before.count()
    cents_new = spark.read.parquet(store + "/_cents")
    b3 = v.filter((F.col("vec_id") >= 350) & (F.col("vec_id") < 400))
    want_store = {
        (r.vec_id, tuple(r.qv))
        for r in corpus_before.unionByName(
            _twin_admitted(corpus_before, b3, cents=cents_new)
        ).collect()
    }
    stream_semantic_admit(
        _arrival_stream(spark, tmp_path / "src2"), store,
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    assert _qv_set(spark, store) == want_store
    corpus_before.unpersist()


def test_stream_semantic_admit_heals_torn_cents_sidecar(
    spark, sf_dir, tmp_path
):
    """A crashed first sidecar write leaves a dir the read cannot
    infer a schema from; the sidecar is DERIVED data, so the next
    trigger rebuilds and overwrites it instead of crash-looping."""
    import pathlib

    from presto_on_ray_spark.streaming.ann import stream_semantic_admit

    v = _vecs(spark, sf_dir)
    store = str(tmp_path / "vstore")
    v.filter(F.col("vec_id") < 400).write.parquet(store)
    torn = pathlib.Path(store) / "_cents" / "_temporary"
    torn.mkdir(parents=True)
    src = tmp_path / "arrivals"
    _write_arrivals(spark, sf_dir, src)

    stream_semantic_admit(
        _arrival_stream(spark, src), store,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    cents = spark.read.parquet(store + "/_cents")
    assert cents.count() > 0  # healed: derived and frozen


def test_stream_semantic_admit_zero_row_store_bootstraps(
    spark, sf_dir, tmp_path
):
    """An empty-but-present store (a zero-row seed write) must behave
    like no store: bootstrap-admit, and crucially never freeze an
    EMPTY sidecar that would admit everything forever."""
    import os

    from presto_on_ray_spark.streaming.ann import stream_semantic_admit

    v = _vecs(spark, sf_dir)
    store = str(tmp_path / "vstore")
    v.limit(0).write.parquet(store)
    src = tmp_path / "arrivals"
    _write_arrivals(spark, sf_dir, src)

    stream_semantic_admit(
        _arrival_stream(spark, src), store,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    b1 = v.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 450))
    b2 = v.filter(F.col("vec_id") >= 450)
    want = b1.unionByName(_twin_admitted(b1, b2))
    assert _qv_set(spark, store) == {
        (r.vec_id, tuple(r.qv)) for r in want.collect()
    }
    cents = spark.read.parquet(store + "/_cents")
    assert cents.count() > 0  # frozen from b1, never from the empty seed


def test_rebuild_dial_feeds_next_admission_run(spark, sf_dir, tmp_path):
    """rebuild_semantic_cells(target_recall=...) persists the dialed
    nprobe in the _probe sidecar; the next stream run resolves it and
    verdicts at that width (== the batch twin at the dialed nprobe);
    a dial-less rebuild removes the stale sidecar."""
    from presto_on_ray_spark.operators.similarity import (
        semantic_ingest_verdicts,
        semantic_probe_dial,
    )
    from presto_on_ray_spark.streaming.ann import (
        _read_probe_sidecar,
        rebuild_semantic_cells,
        stream_semantic_admit,
    )

    v = _vecs(spark, sf_dir)
    store = str(tmp_path / "vstore")
    v.filter(F.col("vec_id") < 400).write.parquet(store)

    out = rebuild_semantic_cells(spark, store, target_recall=0.95)
    dialed = out["probe_dial"]["nprobe"]
    assert _read_probe_sidecar(store) == dialed
    assert dialed > 2  # the spread fixture genuinely widens the probe

    src = tmp_path / "arrivals"
    _write_arrivals(spark, sf_dir, src)
    stream_semantic_admit(
        _arrival_stream(spark, src), store,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    corpus0 = v.filter(F.col("vec_id") < 400)
    cents = spark.read.parquet(store + "/_cents")
    b1 = v.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 450))
    b2 = v.filter(F.col("vec_id") >= 450)

    def _adm(corpus, batch):
        verd = semantic_ingest_verdicts(
            corpus, batch, nprobe=dialed, cents=cents
        )
        return batch.join(
            verd.filter(F.col("admit")).select("vec_id"), "vec_id"
        )

    adm1 = _adm(corpus0, b1)
    corpus1 = corpus0.unionByName(adm1)
    want = corpus1.unionByName(_adm(corpus1, b2))
    assert _qv_set(spark, store) == {
        (r.vec_id, tuple(r.qv)) for r in want.collect()
    }

    rebuild_semantic_cells(spark, store)  # dial-less: sidecar removed
    assert _read_probe_sidecar(store) is None


def test_rebuild_semantic_cells_refuses_empty_store(spark, sf_dir, tmp_path):
    from presto_on_ray_spark.streaming.ann import rebuild_semantic_cells

    store = str(tmp_path / "vstore")
    _vecs(spark, sf_dir).limit(0).write.parquet(store)
    with pytest.raises(ValueError, match="empty"):
        rebuild_semantic_cells(spark, store)
    assert not os.path.isdir(store + "/_cents")  # nothing frozen


def test_stream_semantic_decontaminate_matches_batch_api(
    spark, sf_dir, tmp_path
):
    """Each train micro-batch's screen equals decontaminate-semantic's
    batch form restricted to that batch, under pinned eval cells."""
    from presto_on_ray_spark.operators.similarity import (
        semantic_cells,
        semantic_ingest_verdicts,
    )
    from presto_on_ray_spark.streaming.ann import (
        stream_semantic_decontaminate,
    )

    v = _vecs(spark, sf_dir)
    eval_v = v.filter(F.col("vec_id") % 10 == 3).persist()
    eval_v.count()
    cents = semantic_cells(eval_v).persist()
    cents.count()

    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    src = tmp_path / "arrivals"
    for name, lo, hi in (("f1", 400, 450), ("f2", 450, 500)):
        e.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
            & (F.col("vec_id") % 10 != 3)
        ).coalesce(1).write.parquet(str(src / name))

    got = {}

    def sink(df, batch_id):
        got[batch_id] = {
            r.vec_id: (r.contaminated, r.eval_match, r.n_cand)
            for r in df.collect()
        }

    stream_semantic_decontaminate(
        _arrival_stream(spark, src), eval_v, sink, cents=cents,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    for batch_id, (lo, hi) in enumerate(((400, 450), (450, 500))):
        train = v.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
            & (F.col("vec_id") % 10 != 3)
        )
        want = {
            r.vec_id: (not r.admit, r.dup_of, r.n_cand)
            for r in semantic_ingest_verdicts(
                eval_v, train, cents=cents
            ).collect()
        }
        assert got[batch_id] == want, batch_id
    eval_v.unpersist()
    cents.unpersist()
