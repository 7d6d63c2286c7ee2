"""Streaming boilerplate strip (streaming/boilerplate.py): the union
of per-batch results must equal the one-shot batch strip against the
same frozen counts."""

from __future__ import annotations

from presto_on_ray_spark.operators.pipeline_prep import (
    boilerplate_strip_against,
    segment_counts,
)
from presto_on_ray_spark.streaming.boilerplate import stream_boilerplate_strip


def test_stream_union_equals_one_shot(spark, tmp_path):
    corpus = {
        1: "see terms of service alpha beta",
        2: "one two see terms of service",  # footer NOT block-aligned here
        3: "see terms of service gamma",
    }
    corpus_df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    counts = segment_counts(corpus_df, 4).persist()

    arriving = [
        (10, "see terms of service fresh words"),
        (20, "nothing shared at all here"),
        (30, "see terms of service again"),
    ]
    src = tmp_path / "arrivals"
    spark.createDataFrame(arriving[:2], "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(src / "f1"))
    spark.createDataFrame(arriving[2:], "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(src / "f2"))

    got: dict[int, tuple] = {}
    batches: list[int] = []

    def sink(df, batch_id):
        batches.append(batch_id)
        for r in df.collect():
            got[r.doc_id] = (r.n_cut_segments, r.clean_text)

    try:
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        stream_boilerplate_strip(
            stream, counts, sink, checkpoint_dir=str(tmp_path / "ckpt")
        )
        assert len(batches) == 2

        one_shot = {
            r.doc_id: (r.n_cut_segments, r.clean_text)
            for r in boilerplate_strip_against(
                spark.createDataFrame(arriving, "doc_id long, text string"),
                counts,
                keep=lambda x: x,
            ).collect()
        }
    finally:
        counts.unpersist()

    assert got == one_shot
    # the corpus-frequent aligned footer was cut from the arrivals
    assert got[10] == (1, "fresh words")
    assert got[20] == (0, "nothing shared at all here")
    assert got[30] == (1, "again")
