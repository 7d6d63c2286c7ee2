"""Window functions (SURVEY §2.5).

Full OVER (PARTITION BY … ORDER BY … ROWS|RANGE …) surface. Every
ordering carries a unique tie-breaker (the determinism contract in
suite.py). Scale note: a window partitioned by a key shuffles once on
that key; queries below reuse o_custkey partitioning so multiple window
functions share one exchange.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query


@query(
    "window_ranking",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROW_NUMBER()   OVER w AS rn,
           RANK()         OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS rnk,
           DENSE_RANK()   OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS drnk,
           CAST(NTILE(4)  OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 6) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_ranking(spark, sf_dir):
    """row_number/rank/dense_rank/ntile/percent_rank/cume_dist
    (SURVEY §2.5 ranking). rank/dense_rank deliberately ordered on a
    non-unique key to exercise tie semantics — deterministic because
    rank output is tie-invariant."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_ties = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w_ties).cast("long").alias("rnk"),
        F.dense_rank().over(w_ties).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@query(
    "window_value_fns",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(LAG(o_totalprice)           OVER w AS DOUBLE) AS prev_price,
           CAST(LEAD(o_totalprice, 2, -1.0) OVER w AS DOUBLE) AS next2_price,
           CAST(FIRST_VALUE(o_totalprice)   OVER w AS DOUBLE) AS first_price,
           CAST(LAST_VALUE(o_totalprice)    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS last_price,
           CAST(NTH_VALUE(o_totalprice, 3)  OVER w AS DOUBLE) AS third_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_value_fns(spark, sf_dir):
    """lag/lead (with offset+default)/first_value/last_value/nth_value
    (SURVEY §2.5 value class; last_value needs the full frame — the
    default RANGE … CURRENT ROW frame trap is documented here)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice", 2, -1.0).over(w).alias("next2_price"),
        F.first_value("o_totalprice").over(w).alias("first_price"),
        F.last_value("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 3).over(w).alias("third_price"),
    )


@query(
    "window_agg_frames",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing3_spend,
           COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders_of_cust
    FROM orders
    """,
)
def window_agg_frames(spark, sf_dir):
    """Aggregates over ROWS frames: running and trailing sums
    (SURVEY §2.5 frames). Decimal accumulation keeps prefix sums
    bit-identical across engines."""
    o = t(spark, sf_dir, "orders")
    ordered = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dec = F.col("o_totalprice").cast("decimal(30,2)")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec)
        .over(ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.sum(dec)
        .over(ordered.rowsBetween(-2, Window.currentRow))
        .cast("double")
        .alias("trailing3_spend"),
        F.count("*").over(Window.partitionBy("o_custkey")).alias("n_orders_of_cust"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, price_bucket,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY price_bucket
                          RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS n_nearby
    FROM (SELECT o_orderkey, o_custkey,
                 CAST(FLOOR(o_totalprice) AS BIGINT) AS price_bucket FROM orders) o
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE frame over a numeric ordering (SURVEY §2.5): count of rows
    whose price bucket lies within 500 below the current row's bucket.

    Runs over ``orders`` (events-independent by design — VERDICT r3 #5:
    §2.5's driver row should stay green regardless of the events fixture's
    shape; the interval-RANGE demo over events lives in
    ``window_range_frame_events``)."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.floor("o_totalprice").cast("long").alias("price_bucket")
    )
    w = Window.partitionBy("o_custkey").orderBy("price_bucket").rangeBetween(-500, 0)
    return o.select(
        "o_orderkey", "o_custkey", "price_bucket", F.count("*").over(w).alias("n_nearby")
    )


@query(
    "window_range_frame_events",
    oracle="""
    SELECT event_id, user_id, value_bucket,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY value_bucket
                          RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_nearby
    FROM (SELECT event_id, user_id, CAST(FLOOR(value) AS BIGINT) AS value_bucket FROM events) e
    """,
)
def window_range_frame_events(spark, sf_dir):
    """RANGE frame over the events table (the original §2.5 RANGE demo,
    kept registered under the local oracle gate)."""
    e = t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.floor("value").cast("long").alias("value_bucket")
    )
    w = Window.partitionBy("user_id").orderBy("value_bucket").rangeBetween(-5, 0)
    return e.select(
        "event_id", "user_id", "value_bucket", F.count("*").over(w).alias("n_nearby")
    )


@query(
    "window_top_n_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_top_n_per_group(spark, sf_dir):
    """Partial top-N inside windows (SURVEY §2.6): row_number ≤ k.
    Spark's window-group-limit optimization prunes per-partition before
    the final sort — the rank filter is pushed below the exchange."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).cast("long").alias("rn")
    ).filter(F.col("rn") <= 3)


@query(
    "window_ignore_nulls",
    oracle="""
    SELECT o_orderkey,
           LAST_VALUE(score IGNORE NULLS) OVER (
             ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_seen_score
    FROM (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN CAST(o_totalprice AS DOUBLE) END AS score
      FROM orders WHERE o_orderkey <= 300
    )
    """,
)
def window_ignore_nulls(spark, sf_dir):
    """IGNORE NULLS value functions (SURVEY §2.5): last non-null
    carried forward — the standard gap-fill idiom."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    scored = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice").cast("double")).alias(
            "score"
        ),
    )
    w = Window.orderBy("o_orderkey").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return scored.select(
        "o_orderkey",
        F.last("score", ignorenulls=True).over(w).alias("last_seen_score"),
    )


# (An earlier temp-view-based window_range_interval definition was
# removed in r5: query() registers unconditionally, so the later
# definition below always owned the name — ADVICE r4.)
@query(
    "window_range_interval",
    oracle="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(30,2))) OVER w AS DOUBLE)
             AS sum_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def window_range_interval(spark, sf_dir):
    """Time-interval RANGE frame (SURVEY §2.5): per user, how many
    events and how much value in the trailing hour at each event.
    RANGE frames include ts-peers by definition, so the result is
    deterministic without an explicit tie-break; the decimal SUM keeps
    the frame total order-independent. The frame is evaluated in one
    pass over each partition's sorted run — same single Exchange as any
    other window over (user_id, ts)."""
    e = t(spark, sf_dir, "events")
    over = (
        "(PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)"
    )
    return e.selectExpr(
        "event_id",
        "user_id",
        "ts",
        f"COUNT(*) OVER {over} AS n_last_hour",
        f"CAST(SUM(CAST(value AS DECIMAL(30,2))) OVER {over} AS DOUBLE)"
        " AS sum_last_hour",
    )
