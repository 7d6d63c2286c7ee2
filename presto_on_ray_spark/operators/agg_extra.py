"""Aggregate tail (SURVEY §2.4): heavy hitters, min_by top-n,
multimap_agg, numeric_histogram."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query


@query(
    "agg_most_frequent",
    oracle="""
    SELECT word, n FROM (
      SELECT word, COUNT(*) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word) AS rn
      FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents)
      GROUP BY word
    ) WHERE rn <= 10
    """,
)
def agg_most_frequent(spark, sf_dir):
    """Presto approx_most_frequent(k, x, cap) — implemented exactly
    (count + top-k), which is a strict-accuracy superset; at 100 TB the
    partial-agg wordcount shuffle is |vocab|-bounded, so exact heavy
    hitters stay cheap until vocab explodes (then: count-min sketch)."""
    d = t(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("word"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("word", "n")
    )


@query(
    "agg_min_by_topn",
    oracle="""
    WITH ranked AS (
      SELECT o_orderstatus, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS rn
      FROM orders
    )
    SELECT o_orderstatus,
           STRING_AGG(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rn) AS top3_cheapest_orders
    FROM ranked WHERE rn <= 3 GROUP BY o_orderstatus
    """,
)
def agg_min_by_topn(spark, sf_dir):
    """Presto min_by(x, y, n): the n x-values with smallest y. Spark has
    no n-ary variant; expressed as sort of collected (y, x) structs +
    slice — the struct-sort trick from SURVEY §2.4. (o_totalprice
    values are unique at fixture scale; o_orderkey tiebreak embedded in
    the struct ordering keeps it deterministic regardless.)"""
    o = t(spark, sf_dir, "orders")
    pairs = F.sort_array(
        F.collect_list(F.struct(F.col("o_totalprice"), F.col("o_orderkey")))
    )
    top3 = F.slice(pairs, 1, 3)
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.array_join(
                F.transform(top3, lambda p: p["o_orderkey"].cast("string")), ","
            ).alias("top3_cheapest_orders")
        )
    )


@query(
    "agg_multimap",
    oracle="""
    SELECT n_regionkey,
           ARRAY_TO_STRING(LIST_SORT(LIST(n_name)), ',') AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_multimap(spark, sf_dir):
    """Presto multimap_agg(k, v): all values per key — collect_list per
    group, rendered sorted for cross-engine comparability."""
    n = t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )


@query(
    "agg_numeric_histogram",
    oracle="""
    SELECT bucket, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS total_qty
    FROM (
      SELECT l_quantity,
             CAST(LEAST(FLOOR(l_quantity / 5), 9) AS BIGINT) AS bucket
      FROM lineitem
    )
    GROUP BY bucket
    """,
)
def agg_numeric_histogram(spark, sf_dir):
    """Presto numeric_histogram(b, x): fixed-width value buckets with
    per-bucket counts/sums (the deterministic equal-width variant;
    Presto's own is an approximate v-optimal sketch)."""
    li = t(spark, sf_dir, "lineitem")
    bucket = F.least(F.floor(F.col("l_quantity") / 5), F.lit(9)).cast("long")
    return (
        li.select(bucket.alias("bucket"), "l_quantity")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(30,2)"))
            .cast("double")
            .alias("total_qty"),
        )
    )
