"""Streaming ingest-time dedup (streaming/ingest.py): micro-batch
boundaries must not change any classification — each doc is judged
against the BASE index only, so the union of per-batch results equals
the one-shot batch classification of all arriving docs."""

from __future__ import annotations


def test_stream_ingest_matches_batch(spark, tmp_path):
    from presto_on_ray_spark.operators.dedup import (
        build_base_index,
        ingest_batch,
    )
    from presto_on_ray_spark.streaming.ingest import stream_ingest_dedup

    ten = "a b c d e f g h i j"
    base = spark.createDataFrame(
        [(1, ten), (2, "p q r s t u v w x y")], "doc_id int, text string"
    )
    arriving = [
        (10, ten),                        # exact
        (20, "a b c d e f g h i k"),      # near (J = 7/9 vs doc 1)
        (30, "totally novel words only"),  # new
        (40, "p q r s t u v w x y"),      # exact (second file)
        (50, "zz yy xx ww vv uu"),        # new (second file)
    ]
    # two arrival files -> two micro-batches under maxFilesPerTrigger=1
    src = tmp_path / "arrivals"
    spark.createDataFrame(arriving[:3], "doc_id int, text string").write.parquet(
        str(src / "f1")
    )
    # second file also carries a NULL-text row, which the stream path
    # must exclude exactly like the batch query path does (no verdict)
    spark.createDataFrame(
        arriving[3:] + [(60, None)], "doc_id int, text string"
    ).write.parquet(str(src / "f2"))

    idx = build_base_index(base, tracked=False)
    got: dict[int, tuple] = {}
    batches: list[int] = []

    def sink(df, batch_id):
        batches.append(batch_id)
        for r in df.collect():
            got[r["doc_id"]] = (r["status"], r["n_base_matches"])

    try:
        stream = (
            spark.readStream.schema("doc_id int, text string")
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        stream_ingest_dedup(
            stream, idx, sink, checkpoint_dir=str(tmp_path / "ckpt")
        )
        assert len(batches) >= 2  # the arrivals really were split up

        one_shot = {
            r["doc_id"]: (r["status"], r["n_base_matches"])
            for r in ingest_batch(
                spark.createDataFrame(arriving, "doc_id int, text string"), idx
            ).collect()
        }
    finally:
        idx.release()

    assert got == one_shot
    assert got[10] == ("exact", 1)
    assert got[20] == ("near", 1)
    assert got[30] == ("new", 0)
    assert got[40] == ("exact", 1)
    assert got[50] == ("new", 0)
    assert 60 not in got  # NULL text: excluded, not classified 'new'
