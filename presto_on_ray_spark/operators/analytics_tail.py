"""Aggregate/analytics tail: linear-regression aggregates, bitwise and
boolean aggregates, ``map_union``, and recursive CTEs.

Presto 0.248 (the SQL engine the reference launches — reference
launcher.py:154-171) ships ``regr_slope`` / ``regr_intercept``,
``bitwise_and_agg`` / ``bitwise_or_agg``, ``bool_and`` / ``bool_or`` /
``every``, and ``map_union``; Spark 4 has native equivalents for all
but the map aggregate (functions/maps.py). Spark 4 also executes
standard ``WITH RECURSIVE`` (iterate-to-fixpoint inside the engine),
which covers the graph/hierarchy closure queries Presto users write.

Determinism notes:
- regression aggregates accumulate doubles, so the last ulp depends on
  partition fold order; results are ROUNDed (4 dp) on both engines —
  same contract as ``agg_stats``'s corr/covar.
- bitwise/boolean aggregates are exact and order-independent.
- the recursive closure aggregates with MIN/MAX/COUNT, so iteration
  order never shows in the result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_on_ray_spark.functions.maps import map_union_agg
from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query


@query(
    "agg_regression",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           regr_count(l_extendedprice, l_quantity) AS n_pairs,
           bit_and(CAST(l_linenumber AS BIGINT)) AS lines_and,
           bit_or(CAST(l_linenumber AS BIGINT)) AS lines_or,
           bool_and(l_quantity > 0) AS all_positive,
           bool_or(l_discount > 0.09) AS any_deep_discount
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_regression(spark, sf_dir):
    """SURVEY §2.4 tail: OLS regression aggregates (slope/intercept/R²/
    count of price on quantity) + bitwise AND/OR + boolean AND/OR per
    return flag. Presto names (bitwise_and_agg, every) rewrite through
    the dialect layer; Spark's regr_* / bit_* / bool_* are the native
    forms — all partial-aggregate friendly (single shuffle of constant-
    size state per group)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n_pairs"),
        F.bit_and(F.col("l_linenumber").cast("long")).alias("lines_and"),
        F.bit_or(F.col("l_linenumber").cast("long")).alias("lines_or"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
    )


@query(
    "agg_map_union",
    oracle="""
    SELECT o_orderpriority, o_orderstatus AS status, COUNT(*) AS n
    FROM orders GROUP BY 1, 2
    """,
)
def agg_map_union(spark, sf_dir):
    """Presto ``map_union`` round trip (functions/maps.py): per
    (priority, status) build single-entry maps, merge them per priority
    into one map<status, count>, then explode back to the relational
    form the oracle states directly. The merge itself is the operator
    under test — shuffle carries (group, key, value) triples, never
    whole maps."""
    o = t(spark, sf_dir, "orders")
    per_status = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n")
    )
    as_maps = per_status.select(
        "o_orderpriority",
        F.create_map(F.col("o_orderstatus"), F.col("n")).alias("m"),
    )
    merged = map_union_agg(as_maps, ["o_orderpriority"], "m", out_col="by_status")
    return merged.select(
        "o_orderpriority", F.explode("by_status").alias("status", "n")
    )


# Synthetic hierarchy over documents: parent(d) = d DIV 2, rooted at
# doc 1 — log-depth chains, so the ancestor closure is n·log n rows.
_RECURSIVE_SPARK = """
WITH RECURSIVE anc AS (
  SELECT doc_id AS child, doc_id DIV 2 AS anc, 1 AS depth
  FROM documents WHERE doc_id >= 2
  UNION ALL
  SELECT a.child, a.anc DIV 2, a.depth + 1
  FROM anc a
  WHERE a.anc >= 2
)
SELECT child AS doc_id,
       MAX(depth) AS depth_to_root,
       MIN(anc) AS root,
       COUNT(*) AS n_ancestors
FROM anc GROUP BY child
"""

_RECURSIVE_ORACLE = """
WITH RECURSIVE anc AS (
  SELECT doc_id AS child, doc_id // 2 AS anc, 1 AS depth
  FROM documents WHERE doc_id >= 2
  UNION ALL
  SELECT a.child, a.anc // 2, a.depth + 1
  FROM anc a
  WHERE a.anc >= 2
)
SELECT child AS doc_id,
       MAX(depth) AS depth_to_root,
       MIN(anc) AS root,
       COUNT(*) AS n_ancestors
FROM anc GROUP BY child
"""


@query("recursive_cte_hierarchy", oracle=_RECURSIVE_ORACLE)
def recursive_cte_hierarchy(spark, sf_dir):
    """``WITH RECURSIVE`` ancestor closure over a synthetic halving
    hierarchy (parent = doc_id DIV 2, root = 1): per document, its
    depth, root, and ancestor count. Spark 4 executes recursive CTEs
    natively (iterate-until-fixpoint inside the engine, level cap
    ``spark.sql.cteRecursionLevelLimit``); chains are log-depth so the
    closure is n·log n rows — linear-ish in input, no pair explosion.
    DuckDB runs the same recursion (// for DIV)."""
    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_RECURSIVE_SPARK)


@query(
    "agg_entropy",
    oracle="""
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c
      FROM orders GROUP BY 1, 2
    ),
    t AS (
      SELECT o_orderstatus, c,
             SUM(c) OVER (PARTITION BY o_orderstatus) AS s
      FROM c
    )
    SELECT o_orderstatus,
           ROUND(CAST(SUM(CAST(ROUND((CAST(c AS DOUBLE) / s) * LOG2(CAST(s AS DOUBLE) / c), 6)
                               AS DECIMAL(20,6))) AS DOUBLE), 6) AS entropy_bits,
           COUNT(*) AS n_outcomes
    FROM t GROUP BY 1
    """,
)
def agg_entropy(spark, sf_dir):
    """Presto entropy(c) (SURVEY §2.4 tail): Shannon entropy in bits of
    the per-status order-priority distribution, from grouped counts —
    -Σ p·log2 p expressed as Σ (c/S)·log2(S/c). Determinism contract:
    each term is rounded to 6 dp and accumulated as DECIMAL (exact,
    order-free), so the distributed sum hash-matches the oracle — the
    same pattern as text_lm_score's log-prob sum. Scale shape: counts
    are a partial-agg groupBy; S is a window over the (bounded)
    per-group outcome set; one more tiny groupBy reads the result."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    c = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("c"))
    w = Window.partitionBy("o_orderstatus")
    tt = c.withColumn("s", F.sum("c").over(w))
    term = F.round(
        (F.col("c").cast("double") / F.col("s"))
        * F.log2(F.col("s").cast("double") / F.col("c")),
        6,
    ).cast("decimal(20,6)")
    return tt.groupBy("o_orderstatus").agg(
        F.round(F.sum(term).cast("double"), 6).alias("entropy_bits"),
        F.count("*").alias("n_outcomes"),
    )
