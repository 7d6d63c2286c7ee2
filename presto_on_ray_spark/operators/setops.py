"""Set operations (SURVEY §2.7): UNION [ALL|DISTINCT], INTERSECT,
EXCEPT — df.union/intersect/exceptAll, identical SQL in both engines."""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query


def _cust_nations(spark, sf_dir):
    return t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )


@query(
    "setop_union_all",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
)
def setop_union_all(spark, sf_dir):
    """UNION ALL preserves duplicates (bag union)."""
    u = _cust_nations(spark, sf_dir).unionAll(_supp_nations(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count("*").alias("n"))


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_union_distinct(spark, sf_dir):
    """UNION DISTINCT = union + dedup."""
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


@query(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_intersect(spark, sf_dir):
    """INTERSECT DISTINCT."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@query(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_except(spark, sf_dir):
    """EXCEPT DISTINCT (Presto's only EXCEPT in 0.248)."""
    return (
        _cust_nations(spark, sf_dir)
        .distinct()
        .subtract(_supp_nations(spark, sf_dir))
    )


@query(
    "setop_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_except_all(spark, sf_dir):
    """EXCEPT ALL (bag difference) — beyond Presto 0.248's
    DISTINCT-only set ops; Spark exceptAll maps directly."""
    return _cust_nations(spark, sf_dir).exceptAll(_supp_nations(spark, sf_dir))


@query(
    "setop_intersect_all",
    oracle="""
    SELECT n FROM (
      SELECT nationkey, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT c_nationkey AS nationkey FROM customer
      ) GROUP BY nationkey
    )
    """,
)
def setop_intersect_all(spark, sf_dir):
    """INTERSECT ALL (bag intersection, landed post-0.248 in Presto;
    native in Spark). Self-intersection keeps every duplicate."""
    c = _cust_nations(spark, sf_dir)
    return (
        c.intersectAll(c)
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
        .select("n")
    )
