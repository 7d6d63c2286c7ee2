"""Aggregation operators (SURVEY §2.4).

The reference's only observed aggregation is ``select sum(income) from
user`` executed by the delegated Presto JVM as partial→shuffle→final
hash aggregation (reference: README.md:102-110, 18 splits). Spark's
``HashAggregateExec`` has identical partial/final structure; every query
here is a plain ``groupBy().agg()`` so Catalyst keeps map-side partial
aggregation — at 100 TB the shuffle carries only group keys × partial
states, never raw rows.

Determinism: money-typed doubles accumulate via DECIMAL (see
functions.numeric) so distributed Spark and single-threaded DuckDB agree
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_on_ray_spark.functions.numeric import (
    davg,
    dec_charge,
    dec_revenue,
    dsum,
    dsum_dec,
    oracle_davg,
    oracle_dec_rate,
    oracle_dec_revenue,
    oracle_dsum,
    oracle_dsum_dec,
)
from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {oracle_dsum('l_quantity')} AS sum_qty,
           {oracle_dsum('l_extendedprice')} AS sum_base_price,
           {oracle_dsum_dec(oracle_dec_revenue())} AS sum_disc_price,
           {oracle_dsum_dec(f"{oracle_dec_revenue()} * (1 + {oracle_dec_rate('l_tax')})")} AS sum_charge,
           {oracle_davg('l_quantity')} AS avg_qty,
           {oracle_davg('l_extendedprice')} AS avg_price,
           {oracle_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """Flagship: TPC-H Q1 shape — scan→filter→hash agg→sort.

    Exercises the full lifecycle the reference delegates to Presto
    (SURVEY §3.1 step 4). Filter is pushed to the parquet scan; the
    aggregation shuffles 4-ish groups, not 600k rows.
    """
    li = t(spark, sf_dir, "lineitem")
    # exact decimal products (no per-row double->decimal rounding, so
    # the sums are bit-identical across engines at ANY data scale —
    # the double-product form diverged at sf1; see functions/numeric)
    disc_price = dec_revenue()
    charge = dec_charge()
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum_dec(disc_price).alias("sum_disc_price"),
            dsum_dec(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_core",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           CAST(BOOL_OR(o_totalprice > 100000) AS BOOLEAN) AS any_big,
           CAST(BOOL_AND(o_totalprice > 0) AS BOOLEAN) AS all_positive,
           MIN_BY(o_orderstatus, o_orderkey) AS status_of_first_order,
           MAX_BY(o_orderstatus, o_orderkey) AS status_of_last_order
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_core(spark, sf_dir):
    """count/count-distinct/min/max/count_if/bool_and/bool_or/min_by/max_by
    (Presto names per SURVEY §2.4; min_by keyed on the unique o_orderkey
    so the answer is deterministic)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.bool_or(F.col("o_totalprice") > 100000).alias("any_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.min_by("o_orderstatus", "o_orderkey").alias("status_of_first_order"),
        F.max_by("o_orderstatus", "o_orderkey").alias("status_of_last_order"),
    )


@query(
    "agg_distinct_modifiers",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS distinct_suppliers,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_distinct_qty,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct_modifiers(spark, sf_dir):
    """DISTINCT aggregates + FILTER clause (SURVEY §2.4 modifiers)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("distinct_suppliers"),
        F.sum_distinct(F.col("l_quantity").cast("decimal(30,2)"))
        .cast("double")
        .alias("sum_distinct_qty"),
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_linestatus,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
           ROUND(VAR_POP(l_quantity), 4) AS var_qty,
           ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(COVAR_POP(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           ROUND(SKEWNESS(l_quantity), 4) AS skew_qty,
           ROUND(EXP(AVG(LN(l_quantity + 1))), 4) AS geo_mean_qty
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def agg_stats(spark, sf_dir):
    """Statistical aggregates (SURVEY §2.4): stddev/variance/corr/covar/
    skewness + geometric_mean (= exp(avg(ln x)), Presto-only name).
    Rounded: float merge order differs between engines at the ulp level."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_pop("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
        F.round(F.skewness("l_quantity"), 4).alias("skew_qty"),
        F.round(F.exp(F.avg(F.log(F.col("l_quantity") + 1))), 4).alias("geo_mean_qty"),
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           COUNT(*) AS n,
           {oracle_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderstatus, o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """GROUP BY GROUPING SETS + grouping() markers (SURVEY §2.4)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
               COUNT(*) AS n,
               {oracle_dsum('o_totalprice')} AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderstatus, o_orderpriority), ())
        """
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT r_name, n_name, COUNT(*) AS n_customers,
           {oracle_dsum('c_acctbal')} AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark, sf_dir):
    """ROLLUP via the DataFrame API (df.rollup — SURVEY §2.4)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_customers"),
        dsum("c_acctbal").alias("total_acctbal"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    """CUBE via df.cube (SURVEY §2.4)."""
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@query(
    "agg_having",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders, {oracle_dsum('o_totalprice')} AS spend
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
    """,
)
def agg_having(spark, sf_dir):
    """HAVING = filter-after-aggregate (SURVEY §2.4)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("spend"))
        .filter(F.col("n_orders") >= 12)
    )


@query(
    "agg_structural",
    oracle="""
    SELECT l_returnflag,
           STRING_AGG(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
           CAST(COUNT(DISTINCT l_linestatus) AS BIGINT) AS n_statuses
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_structural(spark, sf_dir):
    """array_agg(DISTINCT x ORDER BY x) rendered as a canonical string
    (Presto array_agg → collect_set + sort_array, SURVEY §2.4
    structural; string join makes the value hashable across engines)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias("statuses"),
            F.size(F.collect_set("l_linestatus")).cast("long").alias("n_statuses"),
        )
    )


@query(
    "agg_map",
    oracle="""
    WITH per AS (
      SELECT o_orderstatus AS k, COUNT(*) AS v FROM orders GROUP BY o_orderstatus
    )
    SELECT STRING_AGG(k || ':' || v, ',' ORDER BY k) AS histogram
    FROM per
    """,
)
def agg_map(spark, sf_dir):
    """Presto histogram()/map_agg(k, v) — built as map_from_entries over
    collected (k,count) pairs, rendered sorted for comparability
    (SURVEY §2.4 structural)."""
    per = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("k"))
        .agg(F.count("*").alias("v"))
    )
    # The engine-facing value is the map itself; for the oracle we fold
    # the map to its canonical sorted-entry string.
    hist = per.agg(
        F.map_from_entries(F.sort_array(F.collect_list(F.struct("k", "v")))).alias("hist")
    )
    return hist.select(
        F.array_join(
            F.transform(
                F.sort_array(F.map_entries("hist")),
                lambda e: F.concat(e["key"], F.lit(":"), e["value"].cast("string")),
            ),
            ",",
        ).alias("histogram")
    )


@query("agg_approx_distinct")
def agg_approx_distinct(spark, sf_dir):
    """approx_distinct → approx_count_distinct (SURVEY §2.4 approximate;
    HLL). No oracle: sketch estimates are engine-specific — correctness
    is bounded-error, asserted in tests/test_aggregates.py."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
    )


@query("agg_approx_percentile")
def agg_approx_percentile(spark, sf_dir):
    """approx_percentile → percentile_approx (SURVEY §2.4 approximate).
    Bounded-error; asserted against exact quantiles in tests.

    Scalar output columns only: the driver's canonicalizer hashes every
    result frame (rows-only checks included) and cannot sort/hash
    array-typed cells, so the multi-quantile form is projected to one
    column per quantile rather than returned as an array."""
    li = t(spark, sf_dir, "lineitem")
    multi = F.percentile_approx("l_extendedprice", [0.25, 0.75], 10000)
    return li.groupBy("l_linestatus").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50"),
        multi.getItem(0).alias("p25"),
        multi.getItem(1).alias("p75"),
    )


@query(
    "agg_reduce_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS folded_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_reduce_agg(spark, sf_dir):
    """Presto reduce_agg(x, s0, add, combine) — real two-phase fold via
    functions.reduce_agg (mapInPandas partial states + applyInPandas
    combine), NOT collect_list: per-group executor state is one value,
    so the fold scales to arbitrarily large groups. Exact-decimal state
    keeps the result order-independent (hash-equal to the oracle sum)."""
    from decimal import Decimal

    from presto_on_ray_spark.functions.reduce_agg import reduce_agg

    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("decimal(30,2)").alias("l_quantity")
    )
    return reduce_agg(
        li,
        ["l_returnflag"],
        "l_quantity",
        zero=Decimal(0),
        add_batch=lambda s, vals: s + sum(vals.dropna(), Decimal(0)),
        combine=lambda a, b: a + b,
        out_col="folded_qty",
        state_ddl="decimal(38,2)",
        out_ddl="double",
        finish=float,
    )
