"""Sampling (SURVEY §2.1 TABLESAMPLE) — nondeterministic by contract,
so checks are statistical (tests) or rows-only (driver)."""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query


@query("tablesample_bernoulli")
def tablesample_bernoulli(spark, sf_dir):
    """TABLESAMPLE BERNOULLI(10) → df.sample(0.10). Row-level Bernoulli
    sampling, seeded for repeatability within an engine (cross-engine
    sample identity is not defined, hence no oracle)."""
    li = t(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.10, seed=42).select("l_orderkey", "l_linenumber")


@query(
    "tablesample_aggregate_bounds",
    oracle="""
    SELECT CAST(COUNT(*) > 0 AS BOOLEAN) AS sampled_nonempty,
           CAST(TRUE AS BOOLEAN) AS within_bounds
    FROM (SELECT * FROM lineitem USING SAMPLE 10 PERCENT (bernoulli))
    """,
)
def tablesample_aggregate_bounds(spark, sf_dir):
    """Sampling composed under aggregation; the oracle-checkable claims
    are the invariants (non-empty, bounded fraction), not row identity."""
    li = t(spark, sf_dir, "lineitem")
    total = li.count()
    sampled = li.sample(fraction=0.10, seed=7)
    return sampled.agg(
        (F.count("*") > 0).alias("sampled_nonempty"),
        ((F.count("*") > total * 0.05) & (F.count("*") < total * 0.15)).alias(
            "within_bounds"
        ),
    )


@query("tablesample_system")
def tablesample_system(spark, sf_dir):
    """TABLESAMPLE SYSTEM(p): Presto keeps whole splits with
    probability p. Raw partition-id sampling degenerates on low
    partition counts (all-or-nothing), so the engine's form is bucket
    sampling: hash rows into 32 logical splits by key and keep 8 —
    deterministic, ~25% at any scale, and each kept bucket is a
    co-hashed unit (the property SYSTEM sampling gives: you sample
    storage units, not rows)."""
    li = t(spark, sf_dir, "lineitem")
    bucket = F.pmod(F.xxhash64("l_orderkey"), F.lit(32))
    return li.filter(bucket < 8).select("l_orderkey", "l_linenumber")
