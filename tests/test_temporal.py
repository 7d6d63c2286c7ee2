"""As-of join + hypertable cascade rollup (operators/temporal.py).

The oracle gate (test_oracle_differential) already checks exact
equality vs DuckDB's native ASOF JOIN; these tests pin the semantic
invariants and the scale shape (no pair-explosion join in the plan).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from presto_on_ray_spark.operators import temporal
from presto_on_ray_spark.plans.inspect import explain_formatted


def test_asof_covers_every_purchase_exactly_once(spark, sf_dir):
    res = temporal.join_asof(spark, sf_dir)
    purchases = temporal._purchases(spark, sf_dir)
    assert res.count() == purchases.count()
    assert res.select("event_id").distinct().count() == res.count()


def test_asof_match_is_at_or_before(spark, sf_dir):
    res = temporal.join_asof(spark, sf_dir).filter(F.col("click_ts").isNotNull())
    assert res.filter(F.col("click_ts") > F.col("ts")).count() == 0
    assert res.filter(F.col("gap_us") < 0).count() == 0


def test_asof_agrees_with_pandas_merge_asof(spark, sf_dir):
    """Independent re-derivation via pandas.merge_asof on the smoke SF."""
    res = (
        temporal.join_asof(spark, sf_dir)
        .select("event_id", "click_ts")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    left = (
        temporal._purchases(spark, sf_dir)
        .select("event_id", "user_id", "ts")
        .toPandas()
        .sort_values("ts", kind="stable")
    )
    right = (
        temporal._clicks_deduped(spark, sf_dir)
        .select("user_id", "ts", F.col("ts").alias("c_ts"))
        .toPandas()
        .sort_values("ts", kind="stable")
    )
    expected = (
        pd.merge_asof(left, right, on="ts", by="user_id", direction="backward")
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert (res["click_ts"].notna().to_numpy() == expected["c_ts"].notna().to_numpy()).all()
    matched = res["click_ts"].notna()
    assert (
        res.loc[matched, "click_ts"].to_numpy() == expected.loc[matched, "c_ts"].to_numpy()
    ).all()


def test_asof_tolerance_nulls_far_matches(spark, sf_dir):
    res = temporal.join_asof_tolerance(spark, sf_dir)
    assert res.filter(F.col("gap_us") > temporal.ASOF_TOLERANCE_US).count() == 0
    # click columns are nulled together
    assert (
        res.filter(
            F.col("click_ts").isNull() & F.col("click_value").isNotNull()
        ).count()
        == 0
    )


def test_asof_plan_has_no_pair_explosion(spark, sf_dir):
    plan = explain_formatted(temporal.join_asof(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Window" in plan


def test_hypertable_cascade_equals_direct_daily(spark, sf_dir):
    """The decimal cascade must be bit-identical to aggregating the raw
    events straight to daily grain."""
    from presto_on_ray_spark.operators._util import t

    cascade = temporal.rollup_hypertable(spark, sf_dir).select(
        "day_bucket", "event_type", "n_events", "total_value"
    )
    direct = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day_bucket"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,2)")).cast("double").alias("total_value"),
        )
    )
    assert cascade.exceptAll(direct).count() == 0
    assert direct.exceptAll(cascade).count() == 0


def test_asof_pandas_available():
    # merge_asof dependency sanity (container ships pandas)
    assert hasattr(pd, "merge_asof")
