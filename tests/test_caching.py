"""Unpersist discipline: tracked persists are fully released after a
query is consumed (no storage pinned in a long-lived session), and the
exact pairwise join refuses unbounded input."""

from __future__ import annotations

import pytest

from presto_on_ray_spark import suite
from presto_on_ray_spark.caching import release_cached

suite.load_all()

PERSISTING = ["dedup_minhash_lsh", "dedup_simhash", "similarity_lsh_buckets"]


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


@pytest.mark.parametrize("name", PERSISTING)
def test_release_after_each_query(spark, sf_dir, name):
    """Repeated-run contract: consume a persisting query, release, and
    executor storage is empty again."""
    for _ in range(2):
        df = suite.QUERIES[name](spark, sf_dir)
        df.count()
        assert _n_persistent_rdds(spark) > 0, "query was expected to persist"
        release_cached()
        assert _n_persistent_rdds(spark) == 0


def test_release_cached_idempotent(spark, sf_dir):
    release_cached()
    assert release_cached() == 0


def test_pairwise_threshold_guard_raises(spark, sf_dir):
    from pyspark.sql import functions as F

    from presto_on_ray_spark.operators.similarity import pairwise_threshold, quantized

    e = (
        suite.QUERIES["similarity_pairwise_threshold"]
        and spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    )
    v = e.select("vec_id", "label", quantized(F.col("embedding")).alias("qv"))
    with pytest.raises(ValueError, match="O\\(n\\^2\\) join is capped"):
        pairwise_threshold(v, max_rows=10)
    # under the bound it still runs
    assert pairwise_threshold(v.limit(5), max_rows=10).count() >= 0
