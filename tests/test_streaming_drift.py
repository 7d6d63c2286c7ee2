"""Streaming drift monitor (streaming/drift.py): per-batch PSI must
equal the batch API on the same snapshot, and reference groups absent
from a batch must still be scored."""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_on_ray_spark.operators.drift import (
    distribution_drift,
    psi_against_reference,
    reference_histogram,
)
from presto_on_ray_spark.streaming.drift import stream_drift_monitor

_W = 64


def _rows(src, vals):
    return [(src, v) for v in vals]


def test_stream_batches_match_batch_api(spark, tmp_path):
    ref_rows = _rows("a", [10, 20, 70, 130]) + _rows("b", [5, 5, 300])
    b1 = _rows("a", [12, 260]) + _rows("b", [7])
    b2 = _rows("a", [500, 510])  # source b silent in this batch

    src = tmp_path / "arrivals"
    # one part-file per arrival batch: under maxFilesPerTrigger=1 the
    # micro-batch content must equal the intended snapshot exactly
    spark.createDataFrame(b1, "source string, val long").coalesce(1).write.parquet(
        str(src / "f1")
    )
    spark.createDataFrame(b2, "source string, val long").coalesce(1).write.parquet(
        str(src / "f2")
    )

    ref = spark.createDataFrame(ref_rows, "source string, val long")
    ref_hist = reference_histogram(ref, _W).persist()
    got: dict[int, dict] = {}

    def sink(df, batch_id):
        got[batch_id] = {
            r.source: (r.n_ref, r.n_cur, r.n_bins, r.psi) for r in df.collect()
        }

    try:
        stream = (
            spark.readStream.schema("source string, val long")
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        stream_drift_monitor(
            stream, ref_hist, _W, sink, checkpoint_dir=str(tmp_path / "ckpt")
        )
        assert len(got) == 2

        def batch_psi(rows):
            cur = spark.createDataFrame(rows, "source string, val long")
            return {
                r.source: (r.n_ref, r.n_cur, r.n_bins, r.psi)
                for r in distribution_drift(ref, cur, _W).collect()
            }

        # batch ids follow file order under maxFilesPerTrigger=1
        assert got[0] == batch_psi(b1)
        assert got[1] == batch_psi(b2)
    finally:
        ref_hist.unpersist()


def test_silent_group_still_scored(spark):
    # source b's reference is NON-uniform (3 rows in bin 0, 1 in bin
    # 4): a silent batch smooths to uniform, so PSI registers the
    # divergence. (A uniform reference smooths silence to itself —
    # PSI 0 by arithmetic — which is why the monitor also surfaces
    # n_cur=0 as the primary silence signal.)
    ref = spark.createDataFrame(
        _rows("a", [10, 20]) + _rows("b", [5, 6, 7, 300]),
        "source string, val long",
    )
    cur = spark.createDataFrame(_rows("a", [12]), "source string, val long")
    got = {
        r.source: r
        for r in psi_against_reference(
            reference_histogram(ref, _W), cur, _W
        ).collect()
    }
    assert set(got) == {"a", "b"}
    assert got["b"].n_cur == 0
    assert got["b"].psi > 0.0


def test_reference_histogram_reuse_equals_two_snapshot_form(spark):
    ref = spark.createDataFrame(
        _rows("a", [1, 2, 3, 100, 200]), "source string, val long"
    )
    cur = spark.createDataFrame(_rows("a", [1, 150, 400]), "source string, val long")
    via_hist = psi_against_reference(
        reference_histogram(ref, _W), cur, _W
    ).collect()
    direct = distribution_drift(ref, cur, _W).collect()
    assert [tuple(r) for r in via_hist] == [tuple(r) for r in direct]


def test_stream_semantic_batches_match_batch_api(spark, tmp_path):
    """Two embedding micro-batches against a frozen reference: each
    trigger's PSI relation equals semantic_drift_psi run on that
    batch alone with the same pinned cells."""
    from presto_on_ray_spark.operators._util import t
    from presto_on_ray_spark.operators.drift import (
        reference_histogram,
        semantic_drift_psi,
        semantic_snapshot,
    )
    from presto_on_ray_spark.operators.similarity import (
        quantized,
        semantic_cells,
    )
    from presto_on_ray_spark.streaming.drift import stream_semantic_drift

    e = t(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id",
        "embedding",
        F.col("label").cast("long").alias("source"),
    )
    v = e.select(
        "vec_id", quantized(F.col("embedding")).alias("qv"), "source"
    )
    ref = v.filter(F.col("vec_id") < 300)
    cents = semantic_cells(ref.select("vec_id", "qv"))
    cents.persist().count()
    ref_hist = reference_histogram(semantic_snapshot(ref, cents), 1)
    ref_hist.persist().count()

    src = tmp_path / "arrivals"
    for name, lo, hi in (("f1", 300, 400), ("f2", 400, 500)):
        e.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).coalesce(
            1
        ).write.parquet(str(src / name))
    stream = (
        spark.readStream.schema(
            "vec_id long, embedding array<float>, source long"
        )
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )

    got = {}

    def sink(df, batch_id):
        got[batch_id] = {
            r.source: (r.n_ref, r.n_cur, r.n_bins, r.psi)
            for r in df.collect()
        }

    stream_semantic_drift(
        stream, ref_hist, cents, sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    for batch_id, (lo, hi) in enumerate(((300, 400), (400, 500))):
        cur = v.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        want = {
            r.source: (r.n_ref, r.n_cur, r.n_bins, r.psi)
            for r in semantic_drift_psi(ref, cur, cents=cents).collect()
        }
        assert got[batch_id] == want, batch_id
    cents.unpersist()
    ref_hist.unpersist()
