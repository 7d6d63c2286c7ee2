"""Bucketed co-located join (SCALING.md / ROADMAP item 4): bucketBy on
the join key at write time removes the Exchange from fact-to-fact joins
— the 100 TB answer to the one irreducible lineitem⋈orders shuffle."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
import pytest

from presto_on_ray_spark.operators._util import t

WAREHOUSE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp_io", "warehouse"
)


@pytest.fixture(scope="module", autouse=True)
def _wh():
    os.makedirs(WAREHOUSE, exist_ok=True)
    yield
    shutil.rmtree(WAREHOUSE, ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    from presto_on_ray_spark.plans.inspect import explain_formatted

    # saveAsTable with an explicit path -> external tables; no need to
    # touch the (static) warehouse dir conf
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")
    t(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").option("path", f"{WAREHOUSE}/li_bkt").saveAsTable("li_bkt")
    t(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").option("path", f"{WAREHOUSE}/o_bkt").saveAsTable("o_bkt")

    # broadcast suppressed so the join must pick a shuffle-free SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("li_bkt")
            .join(spark.table("o_bkt"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = explain_formatted(joined)
        # co-located: no Exchange feeds the join (the only exchange
        # allowed is the one for the final small aggregation)
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section, join_section
        # and it is still correct
        li = t(spark, sf_dir, "lineitem")
        o = t(spark, sf_dir, "orders")
        expected = {
            tuple(r)
            for r in li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert {tuple(r) for r in joined.collect()} == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS o_bkt")


def test_bucketed_join_shuffle_bytes_measured(spark, sf_dir):
    """ROADMAP item 6: the co-located join's win in NUMBERS — executed
    SQL metrics must show zero shuffle bytes written feeding the
    bucketed join, vs megabyte-scale shuffle for the plain parquet
    join of the same relation."""

    def shuffle_bytes(df) -> int:
        # AQE off for the measurement: the executed plan is then the
        # plain tree whose ShuffleExchangeExec nodes carry the
        # "shuffle bytes written" SQL metric directly
        df.collect()
        plan = df._jdf.queryExecution().executedPlan()
        total = 0
        stack = [plan]
        while stack:
            node = stack.pop()
            if "Exchange" in node.nodeName():
                it = node.metrics().iterator()
                while it.hasNext():
                    kv = it.next()
                    # metric map key, e.g. "shuffleBytesWritten"
                    if "ytesWritten" in kv._1():
                        total += kv._2().value()
            for i in range(node.children().length()):
                stack.append(node.children().apply(i))
        return total

    spark.sql("DROP TABLE IF EXISTS li_bkt2")
    spark.sql("DROP TABLE IF EXISTS o_bkt2")
    t(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").option("path", f"{WAREHOUSE}/li_bkt2").saveAsTable("li_bkt2")
    t(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").option("path", f"{WAREHOUSE}/o_bkt2").saveAsTable("o_bkt2")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        def join_of(li, o):
            return (
                li.join(o, li["l_orderkey"] == o["o_orderkey"])
                .groupBy("o_orderpriority")
                .agg(F.count("*").alias("n"))
            )

        plain = join_of(
            t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders")
        )
        bucketed = join_of(spark.table("li_bkt2"), spark.table("o_bkt2"))
        plain_bytes = shuffle_bytes(plain)
        bucketed_bytes = shuffle_bytes(bucketed)
        # plain: both sides shuffle on the join key (~40 KB even at
        # sf0.001); bucketed: only the final tiny agg exchange
        assert plain_bytes > 10_000, plain_bytes
        assert bucketed_bytes < plain_bytes / 10, (plain_bytes, bucketed_bytes)
        print(
            f"\n# shuffle bytes written: plain={plain_bytes} "
            f"bucketed={bucketed_bytes}"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_bkt2")
        spark.sql("DROP TABLE IF EXISTS o_bkt2")
