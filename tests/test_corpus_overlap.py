"""Bottom-k (KMV) corpus-overlap sketches
(presto_on_ray_spark/operators/corpus_overlap.py): estimator accuracy
against the exact twin, sketch boundedness/mergeability, and the
map-side-prune plan shape that makes the single shuffle 100 TB-safe."""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_on_ray_spark import suite
from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.operators.corpus_overlap import (
    _K,
    bottomk_sketches,
    sketch_overlap,
)
from presto_on_ray_spark.plans.inspect import explain_formatted

suite.load_all()


def test_estimates_track_exact_jaccard(spark, sf_dir):
    """Every pair's estimate within 3 standard errors (3/sqrt(k)) of the
    exact Jaccard, and the mean absolute error well inside one."""
    est = {
        (r["source_a"], r["source_b"]): r["jaccard_est"]
        for r in suite.QUERIES["corpus_overlap_bottomk"](spark, sf_dir).collect()
    }
    exact = {
        (r["source_a"], r["source_b"]): r["jaccard"]
        for r in suite.QUERIES["corpus_overlap_exact"](spark, sf_dir).collect()
    }
    tol = 3.0 / (_K ** 0.5)
    errs = []
    for pair, j_est in est.items():
        j = exact.get(pair, 0.0)  # exact twin emits only n_common>0 pairs
        assert abs(j_est - j) <= tol, (pair, j_est, j)
        errs.append(abs(j_est - j))
    # the exact twin must not know pairs the estimator missed entirely
    # with J above tolerance (inner-join asymmetry check)
    for pair, j in exact.items():
        if pair not in est:
            assert j <= tol, (pair, j)
    assert errs and sum(errs) / len(errs) <= 1.0 / (_K ** 0.5)


def test_sketch_bounded_and_sorted(spark, sf_dir):
    sk = bottomk_sketches(t(spark, sf_dir, "documents"), "source", "text")
    rows = sk.collect()
    assert rows
    for r in rows:
        assert r["sketch_size"] == len(r["sketch"]) <= _K
        assert r["sketch"] == sorted(set(r["sketch"]))


def test_sketches_merge_like_the_union_corpus(spark, sf_dir):
    """KMV mergeability — the property that lets 1000 executors sketch
    shards independently: bottom-k(corpus A ∪ corpus B) equals
    bottom-k(sketch_a ∪ sketch_b) computed from the per-corpus
    sketches alone."""
    d = t(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    merged = d.withColumn("source", F.lit("both"))
    direct = {
        r["source"]: r["sketch"]
        for r in bottomk_sketches(merged, "source", "text").collect()
    }["both"]
    per = {
        r["source"]: r["sketch"]
        for r in bottomk_sketches(d, "source", "text").collect()
    }
    from_sketches = sorted(set(per["src0"]) | set(per["src1"]))[:_K]
    assert direct == from_sketches


def test_self_overlap_is_exact_one(spark, sf_dir):
    """A corpus against itself: jaccard_est and both containments must
    be exactly 1 — the estimator has zero error at the boundary."""
    sk = bottomk_sketches(t(spark, sf_dir, "documents"), "source", "text")
    one = sk.limit(1).select(
        F.col("sketch").alias("ska"), F.col("sketch").alias("skb")
    )
    r = sketch_overlap(one).collect()[0]
    assert r["jaccard_est"] == 1.0
    assert r["contain_a_est"] == 1.0 and r["contain_b_est"] == 1.0
    assert r["n_common"] == r["union_k"]


def test_bottomk_plan_prunes_map_side(spark, sf_dir):
    """The scale contract: the rank filter must compile to
    WindowGroupLimit with a PARTIAL pass BEFORE the exchange, so each
    map partition ships at most k rows per source — the shuffle carries
    O(partitions x k), not the distinct-shingle relation."""
    df = suite.QUERIES["corpus_overlap_bottomk"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    partial = [
        ln for ln in plan.splitlines() if "WindowGroupLimit" in ln and "Partial" in ln
    ]
    assert partial, plan
    # the partial pass must sit BELOW the exchange (map side)
    pre, _, post = plan.partition("Exchange hashpartitioning")
    assert any("Partial" in ln and "WindowGroupLimit" in ln for ln in post.splitlines()), plan

    formatted = explain_formatted(df)
    assert "CartesianProduct" not in formatted
