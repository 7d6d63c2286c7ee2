"""Sorts / limits / top-K (SURVEY §2.6).

Presto's fused TopN (partial per node + final) maps onto Catalyst's
TakeOrderedAndProject, which Spark picks automatically for
ORDER BY + LIMIT — verified in tests/test_plans.py. Presto default null
ordering is NULLS LAST for ASC; Spark's is NULLS FIRST — the engine
always spells null placement explicitly (SURVEY §7 milestone 1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query


@query(
    "topn_global",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topn_global(spark, sf_dir):
    """ORDER BY … LIMIT n → TakeOrderedAndProject (partial top-25 per
    partition, merge of 25×P rows on the driver — O(n) not O(n log n),
    and safe at any scale because only k rows cross the wire)."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "sort_nulls_ordering",
    oracle="""
    SELECT o_orderkey, score FROM (
      SELECT o_orderkey, NULLIF(o_totalprice, 0) AS score
      FROM orders WHERE o_orderkey <= 200
    )
    ORDER BY score ASC NULLS LAST, o_orderkey
    """,
)
def sort_nulls_ordering(spark, sf_dir):
    """Explicit NULLS LAST ordering (Presto's ASC default; Spark's
    default is NULLS FIRST — spelled out per the milestone-1 note).
    Result is an ordered relation; comparison is order-insensitive but
    the sort itself is exercised."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return o.select(
        "o_orderkey", F.nullif(F.col("o_totalprice"), F.lit(0.0)).alias("score")
    ).orderBy(F.col("score").asc_nulls_last(), F.col("o_orderkey"))


@query(
    "limit_deterministic",
    oracle="""
    SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey LIMIT 3
    """,
)
def limit_deterministic(spark, sf_dir):
    """LIMIT after a total order (a bare LIMIT is nondeterministic by
    contract in both engines, so the suite only pins the ordered form)."""
    return (
        t(spark, sf_dir, "region")
        .orderBy("r_regionkey")
        .limit(3)
        .select("r_regionkey", "r_name")
    )


@query(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
)
def distinct_rows(spark, sf_dir):
    """SELECT DISTINCT → partial-dedup before shuffle (hash agg on all
    columns), same shape Presto uses."""
    return t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()
