"""Join operators (SURVEY §2.3).

Presto 0.248 runs every equi-join as a hash join (broadcast or
partitioned) and non-equi as nested-loop; semi/anti come from
IN/EXISTS rewrites. Spark's join menu is a strict superset — we
declare the join and let Catalyst/AQE choose, nudging with
``broadcast()`` for dimension tables (the 100 TB-relevant decision:
lineitem never shuffles for a dim join).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_on_ray_spark.functions.numeric import (
    dec_revenue,
    dsum,
    dsum_dec,
    oracle_dsum,
    oracle_dec_revenue,
    oracle_dsum_dec,
)
from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query


@query(
    "join_inner_multiway",
    oracle=f"""
    SELECT r_name, o_orderpriority,
           COUNT(*) AS n_items,
           {oracle_dsum_dec(oracle_dec_revenue())} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, o_orderpriority
    """,
)
def join_inner_multiway(spark, sf_dir):
    """5-way inner equi-join down the star schema (FIXTURES.md join
    graph). customer/nation/region broadcast; only the fact-to-fact
    lineitem⋈orders shuffles — at 100 TB that is the one unavoidable
    shuffle, and AQE can still flip it to broadcast if orders is
    filtered small."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    revenue = dec_revenue()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            dsum_dec(revenue).alias("revenue"),
        )
    )


@query(
    "join_left_outer",
    oracle=f"""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           COALESCE({oracle_dsum('o_totalprice')}, 0.0) AS spend
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 200000
    GROUP BY c_custkey, c_name
    """,
)
def join_left_outer(spark, sf_dir):
    """LEFT OUTER with a join-side predicate — customers with zero
    qualifying orders survive with NULL-padded right side."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 200000)
    return (
        c.join(o, cond, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("spend"),
        )
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT n_name, COUNT(s_suppkey) AS n_suppliers
    FROM supplier
    RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_right_outer(spark, sf_dir):
    """RIGHT OUTER — every nation appears even with no suppliers."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cust AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
         supp AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cust.k, supp.k) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM cust FULL OUTER JOIN supp ON cust.k = supp.k
    """,
)
def join_full_outer(spark, sf_dir):
    """FULL OUTER join of two aggregates (nations having customers
    and/or suppliers)."""
    cust = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cust.join(supp, "k", "full").select(
        F.col("k").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, status, COUNT(*) AS n
    FROM region
    CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders) s
    GROUP BY r_name, status
    """,
)
def join_cross(spark, sf_dir):
    """CROSS JOIN (cartesian) — small×small only; a cartesian at 100 TB
    is a plan bug, so the engine restricts it to dimension inputs."""
    r = t(spark, sf_dir, "region")
    statuses = t(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status")
    ).distinct()
    return r.crossJoin(statuses).groupBy("r_name", "status").agg(F.count("*").alias("n"))


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000)
    """,
)
def join_semi(spark, sf_dir):
    """LEFT SEMI = EXISTS/IN rewrite (SURVEY §2.3)."""
    c = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark, sf_dir):
    """LEFT ANTI = NOT EXISTS (SURVEY §2.3)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_not_in_null_aware",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
    """,
)
def join_not_in_null_aware(spark, sf_dir):
    """NOT IN with its three-valued-logic trap (SURVEY §2.3): if the
    subquery ever yields NULL, the whole predicate is never TRUE. Spark
    plans this as a null-aware anti join; expressed in SQL so the
    rewrite engages."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
        """
    )


@query(
    "join_non_equi",
    oracle="""
    SELECT p_partkey, COUNT(*) AS n_cheaper_suppliers
    FROM part JOIN supplier ON s_acctbal < p_retailprice / 100
    WHERE p_partkey <= 50
    GROUP BY p_partkey
    """,
)
def join_non_equi(spark, sf_dir):
    """Theta join (nested-loop in Presto 0.248; BroadcastNestedLoopJoin
    in Spark — keep the broadcast side tiny)."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    s = t(spark, sf_dir, "supplier")
    return (
        p.join(F.broadcast(s), s.s_acctbal < p.p_retailprice / 100)
        .groupBy("p_partkey")
        .agg(F.count("*").alias("n_cheaper_suppliers"))
    )


@query(
    "join_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*) FROM orders) * 1.8
    """,
)
def join_scalar_subquery(spark, sf_dir):
    """Uncorrelated scalar subquery (SURVEY §4.2 subquery decorrelation).
    AVG over doubles is a single global value — both engines sum the
    same multiset; kept safe by the 1.8 multiplier living far from any
    row's price boundary (verified in tests)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*) FROM orders) * 1.8
        """
    )


@query(
    "join_lateral",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice
    FROM customer,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) best
    WHERE c_custkey <= 30
    """,
)
def join_lateral(spark, sf_dir):
    """CROSS JOIN LATERAL (correlated derived table, SURVEY §2.3) —
    top-2 orders per customer. The idiomatic distributed plan is a
    window rank, not a per-row subquery loop; both produce the same
    relation, so the engine uses the window form."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 30)
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    best = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .drop("rn")
    )
    return c.join(best, c.c_custkey == best.o_custkey, "inner").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )
