"""Span-level benchmark decontamination (pipeline_prep.decontaminate_cut):
crafted-corpus semantics the oracle differential's hash-split fixtures
only exercise as full-doc contamination — partial cuts at the start /
middle, island merging of adjacent contaminated windows, sub-n docs,
and the verbatim pass-through of clean docs."""

from __future__ import annotations

from presto_on_ray_spark.operators.pipeline_prep import decontaminate_cut


def _run(spark, train_rows, eval_rows, n=3):
    kept = []
    train = spark.createDataFrame(train_rows, "doc_id int, text string")
    eval_ = spark.createDataFrame(eval_rows, "doc_id int, text string")

    def keep(df):
        kept.append(df.persist())
        return df

    try:
        return {
            r["doc_id"]: r["clean_text"]
            for r in decontaminate_cut(train, eval_, n, keep=keep).collect()
        }
    finally:
        for df in kept:
            df.unpersist()


def test_decontaminate_cut_span_semantics(spark):
    got = _run(
        spark,
        [
            (1, "a b c d e f g h"),   # middle hit: eval 3-gram "c d e"
            (2, "x y z t u"),         # start hit: covers words 1-3
            (3, "c d e"),             # fully covered -> ''
            (4, "q r"),               # shorter than n: untouched
            (5, "none of these hit"), # clean: verbatim
            (6, None),                # null text: excluded, no row
        ],
        [
            (100, "c d e"),
            (101, "x y z"),
            (102, "to o"),  # eval doc shorter than n contributes nothing
        ],
    )
    assert got == {
        1: "a b f g h",
        2: "t u",
        3: "",
        4: "q r",
        5: "none of these hit",
    }


def test_decontaminate_cut_merges_adjacent_windows(spark):
    # eval grams "c d e" and "d e f" hit train positions 3 and 4: the
    # islands step merges them into ONE run covering words 3..6 —
    # words d/e are not double-counted and the cut is the interval
    # union, not per-window removal
    got = _run(
        spark,
        [(1, "a b c d e f g h")],
        [(100, "c d e"), (101, "d e f")],
    )
    assert got == {1: "a b g h"}


def test_decontaminate_cut_matches_query_fixture(spark, sf_dir):
    # the registered query is exactly decontaminate_cut over the
    # deterministic hash split — pin the wiring (same rows both ways)
    from presto_on_ray_spark.operators._util import t as t_
    from presto_on_ray_spark.operators.pipeline_prep import (
        _DECON_N,
        _bucket_col,
        decontaminate_cut_spans,
    )
    import pyspark.sql.functions as F
    from presto_on_ray_spark.caching import release_cached

    d = t_(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    bucket = F.floor(_bucket_col(F.col("doc_id"))).cast("long")
    via_fn = {
        r["doc_id"]: r["clean_text"]
        for r in decontaminate_cut(
            d.select("doc_id", "text").filter(bucket < 80),
            d.select("doc_id", "text").filter(bucket >= 90),
            _DECON_N,
        ).collect()
    }
    via_query = {
        r["doc_id"]: r["clean_text"]
        for r in decontaminate_cut_spans(spark, sf_dir).collect()
    }
    release_cached()
    assert via_fn == via_query and len(via_query) > 0
