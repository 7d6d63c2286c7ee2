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


def test_counts_admit_exactly_once_and_chained_growth(spark, tmp_path):
    from presto_on_ray_spark.operators.pipeline_prep import (
        admitted_count_batches,
        load_segment_counts,
        merge_segment_counts,
        save_segment_counts,
        segment_counts,
    )
    from presto_on_ray_spark.streaming.boilerplate import (
        stream_segment_counts_admit,
    )

    base = {1: "x y z w base", 2: "p q r s other"}
    b1 = [(10, "x y z w one"), (11, None)]
    b2 = [(20, "x y z w two"), (21, "p q r s again")]
    store = str(tmp_path / "counts")
    base_df = spark.createDataFrame(list(base.items()), "doc_id long, text string")
    save_segment_counts(segment_counts(base_df, 4), store)

    src = tmp_path / "arrivals"
    spark.createDataFrame(b1, "doc_id long, text string").coalesce(1).write.parquet(
        str(src / "f1")
    )
    spark.createDataFrame(b2, "doc_id long, text string").coalesce(1).write.parquet(
        str(src / "f2")
    )

    stripped: dict[int, dict] = {}

    def sink(df, batch_id):
        stripped[batch_id] = {r.doc_id: r.clean_text for r in df.collect()}

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    stream_segment_counts_admit(
        stream, store, sink=sink, checkpoint_dir=str(tmp_path / "ckpt")
    )

    assert admitted_count_batches(store) == {0, 1}
    # chained growth: final counts == recount over base + both batches
    all_docs = (
        list(base.items())
        + [(i, t) for i, t in b1 if t is not None]
        + [(i, t) for i, t in b2]
    )
    want = {
        r.h: r.df
        for r in segment_counts(
            spark.createDataFrame(all_docs, "doc_id long, text string"), 4
        ).collect()
    }
    got = {r.h: r.df for r in load_segment_counts(spark, store).collect()}
    assert got == want

    # batch 1 classified against the PRE-b1 counts: "x y z w" was
    # already frequent (base doc 1 + ... df=1? base only has it once),
    # so doc 10 keeps it; batch 2 sees it at df=2 and cuts it
    assert stripped[0][10] == "x y z w one"
    assert stripped[1][20] == "two"
    assert 11 not in stripped[0]  # NULL text excluded

    # RE-DELIVERY, end-to-end: replay the SAME arrivals under a fresh
    # checkpoint — batch ids restart at 0/1, both already recorded in
    # the store, so the guard must skip both entirely: no merge (the
    # disjointness contract would otherwise double-count), no sink
    # delivery. (This is also the documented lineage-collision
    # behaviour: recorded ids protect the store from replays but mean
    # a genuinely-new lineage must not reuse a fed store.)
    before = got
    calls = len(stripped)
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    stream_segment_counts_admit(
        stream2, store, sink=sink, checkpoint_dir=str(tmp_path / "ckpt_replay")
    )
    after = {r.h: r.df for r in load_segment_counts(spark, store).collect()}
    assert after == before
    assert len(stripped) == calls
    assert admitted_count_batches(store) == {0, 1}
