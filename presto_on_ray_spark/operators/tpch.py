"""TPC-H-shaped composite queries adapted to the fixture schema
(FIXTURES.md). These are the realistic multi-operator compositions the
delegated Presto engine served (SURVEY §0: "full ANSI-ish SQL") — each
one exercises several §2 rows together: multiway joins + aggregation +
top-N + date predicates + correlated subqueries.

Adaptations from canonical TPC-H (columns absent from the fixture):
Q4 uses shipdate-vs-orderdate lag instead of commit/receipt dates; Q12
is replaced by Q6 (all columns present). Dates are shifted into the
fixture's 1995–2001 range.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_on_ray_spark.functions.numeric import (
    dec_price,
    dec_rate,
    dec_revenue,
    dsum,
    dsum_dec,
    oracle_dsum,
    oracle_dec_price,
    oracle_dec_rate,
    oracle_dec_revenue,
    oracle_dsum_dec,
)
from presto_on_ray_spark.caching import tracked_persist
from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {oracle_dsum_dec(oracle_dec_revenue())} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark, sf_dir):
    """Q3: segment filter → 3-way join → agg → top-10 by revenue.
    customer broadcasts; lineitem⋈orders is the only shuffle."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    revenue = dec_revenue()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_dec(revenue).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q4_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4_priority_check(spark, sf_dir):
    """Q4 (adapted): correlated EXISTS → left-semi join; late-shipping
    lag replaces the absent commit/receipt dates."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {oracle_dsum_dec(oracle_dec_revenue())} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    """Q5: 6-way join with the customer-nation = supplier-nation
    co-location predicate. All dims broadcast; the join order keeps the
    two fact tables shuffling on l_orderkey only."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = dec_revenue()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum_dec(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {oracle_dsum_dec(f"({oracle_dec_price('l_extendedprice')} * {oracle_dec_rate('l_discount')})")} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """Q6: pure scan-filter-agg — every predicate pushes to parquet;
    the canonical pushdown benchmark."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum_dec(dec_price("l_extendedprice") * dec_rate("l_discount")).alias("revenue"))


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {oracle_dsum_dec(oracle_dec_revenue())} AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark, sf_dir):
    """Q10: returned-item revenue per customer, top-20."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    revenue = dec_revenue()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum_dec(revenue).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           {oracle_dsum('l_quantity')} AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(30,2))) > 150
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def tpch_q18_large_volume_customer(spark, sf_dir):
    """Q18: IN-subquery over a grouped HAVING (semi join against an
    aggregate), then re-aggregate. The inner aggregate is tiny relative
    to lineitem, so Spark broadcasts the semi-join side."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,2)")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big_orders.withColumnRenamed("l_orderkey", "bo")),
                F.col("l_orderkey") == F.col("bo"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {oracle_dsum_dec('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
             {oracle_dec_revenue()} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        AND n2.n_name IN ('NATION_1', 'NATION_2')
        AND n1.n_name <> n2.n_name
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """Q7: bilateral trade volume between two nations by year — the
    self-join-on-dimension shape (nation appears twice with different
    roles); both nation sides broadcast."""
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").withColumnRenamed("n_name", "supp_nation")
    n2 = t(spark, sf_dir, "nation").withColumnRenamed("n_name", "cust_nation")
    nations = ["NATION_1", "NATION_2"]
    volume = dec_revenue()
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == n1.n_nationkey)
        .join(F.broadcast(n2), c.c_nationkey == n2.n_nationkey)
        .filter(
            F.col("supp_nation").isin(nations)
            & F.col("cust_nation").isin(nations)
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            volume.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum_dec(F.col("volume")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH nation_value AS (
      SELECT p_partkey,
             {oracle_dsum_dec(oracle_dec_revenue())} AS value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN part ON l_partkey = p_partkey
      WHERE n_regionkey = 2
      GROUP BY p_partkey
    )
    SELECT p_partkey, value
    FROM nation_value
    WHERE value > (SELECT CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) * 0.001 FROM nation_value)
    ORDER BY value DESC, p_partkey
    """,
)
def tpch_q11_important_stock(spark, sf_dir):
    """Q11 (adapted to the fixture's columns): per-part revenue from
    region-2 suppliers, filtered to parts above a fraction of the
    total — aggregate + scalar-subquery-over-the-same-aggregate shape.
    The intermediate is computed once and reused for both the rows and
    the threshold (cached: two consumers of one relation)."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    p = t(spark, sf_dir, "part")
    value = dec_revenue()
    nation_value = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("p_partkey")
        .agg(dsum_dec(value).alias("value"))
    )
    nation_value = tracked_persist(nation_value)
    threshold = (
        nation_value.agg(
            (F.sum(F.col("value").cast("decimal(30,4)")).cast("double") * 0.001).alias("th")
        )
        .collect()[0]
        .th
    )
    return (
        nation_value.filter(F.col("value") > threshold)
        .orderBy(F.col("value").desc(), F.col("p_partkey"))
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(spark, sf_dir):
    """Q13: distribution of per-customer order counts (zero included via
    the left join) — double aggregation."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q14_promo_revenue_share",
    oracle=f"""
    SELECT ((200000000 * CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                                      THEN {oracle_dec_revenue()}
                                      ELSE 0 END AS DECIMAL(30,4))) * 10000 AS HUGEINT)
             + CAST(SUM(CAST({oracle_dec_revenue()} AS DECIMAL(30,4))) * 10000 AS HUGEINT))
            // (2 * CAST(SUM(CAST({oracle_dec_revenue()} AS DECIMAL(30,4))) * 10000 AS HUGEINT)))
           / 1000000.0
           AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def tpch_q14_promo_revenue_share(spark, sf_dir):
    """Q14: conditional-aggregate ratio (promo share of monthly
    revenue) — CASE inside SUM. The percentage is rounded to 6 places
    ENTIRELY in integer arithmetic (round-half-up of 10^8·A/B as
    (2·10^8·A + B) div 2B over the exact decimal sums, then one exact
    /10^6): a double-typed ROUND can flip the last digit between
    engines at half boundaries — observed at sf0.001 (the
    LM_MEAN_SQL pattern, operators/textstats.py)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    rev = dec_revenue()
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return joined.agg(
        (F.sum(promo.cast("decimal(30,4)")) * 10000)
        .cast("decimal(38,0)")
        .alias("A"),
        (F.sum(rev.cast("decimal(30,4)")) * 10000)
        .cast("decimal(38,0)")
        .alias("B"),
    ).select(
        (
            F.expr("(200000000 * A + B) div (2 * B)")
            / F.lit(1000000.0)
        ).alias("promo_share_pct")
    )


@query(
    "tpch_q19_disjunctive_predicates",
    oracle=f"""
    SELECT COUNT(*) AS n,
           {oracle_dsum_dec(oracle_dec_revenue())} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5 AND l_quantity <= 25)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 50)
    """,
)
def tpch_q19_disjunctive_predicates(spark, sf_dir):
    """Q19: three-way disjunction of conjunctive brand/size/quantity
    ranges — the OR-of-ANDs predicate Catalyst must keep joinable."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(5, 25))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 50))
    )
    rev = dec_revenue()
    return j.filter(cond).agg(
        F.count("*").alias("n"),
        dsum_dec(rev).alias("revenue"),
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def tpch_q22_global_sales_opportunity(spark, sf_dir):
    """Q22 (adapted): above-average-balance customers with no URGENT
    orders (scalar subquery + NOT EXISTS anti join), grouped by nation.
    (The fixture has no fully order-less customers, so the anti join is
    scoped to a priority class to keep the result non-degenerate.)"""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_nationkey, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*)
            FROM customer WHERE c_acctbal > 0
          )
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
        """
    )
