"""Semantic tests for the incremental/CDC family (operators/incremental.py).
Cross-engine value equality is covered by test_oracle_differential; these
pin the operator-level invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_on_ray_spark import suite
from presto_on_ray_spark.operators._util import t

suite.load_all()


def test_merge_upsert_actions_partition_the_keyspace(spark, sf_dir):
    res = suite.QUERIES["merge_upsert"](spark, sf_dir)
    by_action = {r["action"]: r["n"] for r in res.groupBy("action").agg(F.count("*").alias("n")).collect()}
    assert set(by_action) == {"update", "keep", "insert"}

    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    target_keys = c.filter(F.col("c_custkey") % 3 != 0).select("c_custkey")
    source_keys = (
        o.filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    n_update = target_keys.join(source_keys, "c_custkey", "semi").count()
    n_keep = target_keys.join(source_keys, "c_custkey", "anti").count()
    n_insert = source_keys.join(target_keys, "c_custkey", "anti").count()
    assert by_action == {"update": n_update, "keep": n_keep, "insert": n_insert}
    # MERGE output keys are unique (one row per key, like a table rewrite)
    assert res.count() == res.select("c_custkey").distinct().count()


def test_scd2_versions_are_contiguous_and_single_current(spark, sf_dir):
    res = suite.QUERIES["scd2_history"](spark, sf_dir).cache()
    try:
        # exactly one open (is_current) version per key
        open_counts = (
            res.filter("is_current").groupBy("user_id").agg(F.count("*").alias("n"))
        )
        assert open_counts.filter(F.col("n") != 1).count() == 0
        # versions dense from 1, and valid_to of version v == valid_from of v+1
        nxt = res.select(
            "user_id",
            (F.col("version") - 1).alias("version"),
            F.col("valid_from").alias("next_from"),
        )
        chained = res.join(nxt, ["user_id", "version"])
        assert chained.filter(F.col("valid_to") != F.col("next_from")).count() == 0
        # no version opens with the same state as its predecessor
        prev = res.select(
            "user_id",
            (F.col("version") + 1).alias("version"),
            F.col("state").alias("prev_state"),
        )
        runs = res.join(prev, ["user_id", "version"])
        assert runs.filter(F.col("state") == F.col("prev_state")).count() == 0
    finally:
        res.unpersist()


def test_cdc_latest_state_is_one_row_per_key_at_max_ts(spark, sf_dir):
    res = suite.QUERIES["cdc_latest_state"](spark, sf_dir)
    ev = t(spark, sf_dir, "events")
    maxes = ev.groupBy("user_id").agg(F.max("ts").alias("latest_ts"))
    assert res.count() == maxes.count()
    assert res.join(maxes, ["user_id", "latest_ts"]).count() == maxes.count()


def test_lm_score_orders_rare_above_common(spark, sf_dir):
    """A doc of corpus-common tokens must score lower cross-entropy than
    the corpus at large; scores are finite and positive."""
    res = suite.QUERIES["text_lm_score"](spark, sf_dir)
    stats = res.agg(
        F.min("cross_entropy").alias("lo"), F.max("cross_entropy").alias("hi")
    ).collect()[0]
    assert stats["lo"] > 0
    assert stats["hi"] < 100


def test_incremental_refresh_equals_full_recompute(spark, sf_dir):
    """The refresh algebra: base partials + delta partials == recompute.
    (The DuckDB oracle is the recompute; this pins it engine-internally
    too, independent of the oracle harness.)"""
    from presto_on_ray_spark.operators.temporal import hourly_rollup

    inc = suite.QUERIES["rollup_incremental_refresh"](spark, sf_dir)
    full = hourly_rollup(spark, sf_dir).select(
        "hour_bucket",
        "event_type",
        "n_events",
        F.col("hv").cast("double").alias("total_value"),
    )
    assert inc.exceptAll(full).count() == 0
    assert full.exceptAll(inc).count() == 0
