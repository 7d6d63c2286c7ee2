"""Similarity-search invariants: brute force is ground truth; LSH is
measured against it (SURVEY §7 risk 6: LSH recall tuning)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from presto_on_ray_spark import suite
from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.operators.similarity import cosine_q, quantized

suite.load_all()


def test_bruteforce_topk_cosine_bounds(spark, sf_dir):
    df = suite.QUERIES["similarity_bruteforce_topk"](spark, sf_dir)
    rows = df.collect()
    assert rows, "no top-k results"
    for r in rows:
        assert -1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9


def test_bruteforce_self_similarity_is_max(spark, sf_dir):
    """cos(v, v) == 1 must beat every cos(v, other); checked by scoring
    a vector against itself explicitly."""
    e = t(spark, sf_dir, "embeddings").limit(1)
    v = e.select(quantized(F.col("embedding")).alias("q"))
    self_cos = v.select(cosine_q(F.col("q"), F.col("q")).alias("c")).collect()[0].c
    assert abs(self_cos - 1.0) < 1e-12


def test_lsh_bucket_neighbors_recall(spark, sf_dir):
    """Candidate pairs (same bucket in ANY of the 8 hash tables) should
    capture most true top-1 neighbors. Statistical bound, loose
    threshold."""
    from presto_on_ray_spark.operators.similarity import lsh_table_buckets

    e = t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", quantized(F.col("embedding")).alias("qv"))
    buckets = lsh_table_buckets(v).cache()

    # ground truth: top-1 neighbor by exact cosine for 20 query vectors
    q = v.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("qqv")
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cosine_q(F.col("qqv"), F.col("qv")).alias("cos"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    top1 = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)

    qb = buckets.select(
        F.col("vec_id").alias("qid"),
        F.col("table").alias("qtable"),
        F.col("bucket").alias("qbucket"),
    )
    collide = (
        top1.select("qid", F.col("vec_id").alias("nbr_id"))
        .join(qb, "qid")
        .join(
            buckets.alias("bk"),
            (F.col("nbr_id") == F.col("bk.vec_id"))
            & (F.col("qtable") == F.col("bk.table"))
            & (F.col("qbucket") == F.col("bk.bucket")),
            "left_semi",
        )
        .select("qid")
        .distinct()
    )
    n = top1.count()
    hit = collide.count()
    assert hit / n >= 0.5, f"LSH recall of top-1 too low: {hit}/{n}"


def test_pairwise_threshold_symmetric_and_bounded(spark, sf_dir):
    df = suite.QUERIES["similarity_pairwise_threshold"](spark, sf_dir)
    rows = df.collect()
    for r in rows:
        assert r.id_a < r.id_b  # canonical ordering, no dup pairs


def test_ivf_topk_recall_vs_bruteforce(spark, sf_dir):
    """IVF with nprobe=4/16 cells should recover most of the true top-3
    (clustered embeddings land whole-neighborhoods in one cell)."""
    from presto_on_ray_spark.operators.similarity import ivf_topk

    from presto_on_ray_spark import suite

    truth = {
        (r.qid, r.cid)
        for r in suite.QUERIES["similarity_bruteforce_topk"](spark, sf_dir).collect()
    }
    got = {(r.qid, r.cid) for r in ivf_topk(spark, sf_dir).collect()}
    # brute force uses vec_id <= 5 (6 queries); ivf uses vec_id < 5 (5);
    # compare on the intersection of query ids
    qids = {q for q, _ in got}
    truth = {(q, c) for q, c in truth if q in qids}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"IVF recall too low: {recall} ({truth ^ got})"


def test_embedding_neardup_precision_and_recall(spark, sf_dir):
    """dedup_embedding_neardup: every emitted pair truly exceeds the
    cosine threshold (precision exact by construction), and recall vs
    the brute-force all-pairs relation is high on the fixture."""
    from pyspark.sql import functions as F

    from presto_on_ray_spark import suite
    from presto_on_ray_spark.caching import release_cached
    from presto_on_ray_spark.operators.similarity import cosine_q, quantized

    suite.load_all()
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in suite.QUERIES["dedup_embedding_neardup"](spark, sf_dir).collect()
    }
    release_cached()

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = e.select("vec_id", quantized(F.col("embedding")).alias("qv"))
    a, b = v.alias("a"), v.alias("b")
    cos = cosine_q(F.col("a.qv"), F.col("b.qv"))
    truth = {
        (r.id_a, r.id_b): r.cosine
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(cos > 0.9)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .collect()
    }

    # precision: emitted pairs are a subset of the true relation with
    # identical cosines
    for pair, c in got.items():
        assert pair in truth and truth[pair] == c
    # recall: multi-table LSH must recover most true near-dup pairs
    if truth:
        recall = len(got) / len(truth)
        assert recall >= 0.8, f"recall {recall:.2f} over {len(truth)} true pairs"
