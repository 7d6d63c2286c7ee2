"""Pivot/unpivot (operators/reshape.py), sessionization and TF-IDF
invariants. Exact values vs DuckDB are covered by the oracle gate;
these pin shapes and semantic invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_on_ray_spark.operators import reshape, temporal, textstats
from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.plans.inspect import explain_formatted


def test_pivot_roundtrips_through_unpivot(spark, sf_dir):
    long = reshape.unpivot_long_form(spark, sf_dir)
    # melt(n_<type>) summed back == raw event count
    total = long.agg(F.sum("n")).first()[0]
    assert total == t(spark, sf_dir, "events").count()
    # every user carries exactly len(EVENT_TYPES) long rows
    per_user = long.groupBy("user_id").count()
    assert per_user.filter(F.col("count") != len(reshape.EVENT_TYPES)).count() == 0


def test_pivot_has_no_distinct_values_job(spark, sf_dir):
    """An explicit pivot value list keeps the plan a single aggregate —
    no second scan to discover the pivot domain."""
    plan = explain_formatted(reshape.pivot_event_counts(spark, sf_dir))
    # formatted explain names each node twice (tree line + detail
    # section) → one physical scan == 2 occurrences
    assert plan.count("Scan parquet") == 2


def test_unpivot_adds_no_shuffle(spark, sf_dir):
    wide = explain_formatted(reshape.pivot_event_counts(spark, sf_dir))
    long = explain_formatted(reshape.unpivot_long_form(spark, sf_dir))
    assert long.count("Exchange") == wide.count("Exchange")
    assert "Expand" in long


def test_sessions_are_disjoint_and_cover_all_events(spark, sf_dir):
    from pyspark.sql import Window

    sess = temporal.sessionize_batch(spark, sf_dir)
    ev_count = t(spark, sf_dir, "events").count()
    assert sess.agg(F.sum("n_events")).first()[0] == ev_count
    # consecutive sessions of one user are separated by more than the gap
    w = Window.partitionBy("user_id").orderBy("session_idx")
    gaps = sess.select(
        "user_id",
        (
            F.unix_micros("session_start")
            - F.unix_micros(F.lag("session_end").over(w))
        ).alias("between_us"),
    ).filter(F.col("between_us").isNotNull())
    assert gaps.filter(F.col("between_us") <= temporal.SESSION_GAP_US).count() == 0


def test_tfidf_topk_is_bounded_and_sorted(spark, sf_dir):
    res = temporal  # noqa: F841 (keep import grouping honest)
    df = textstats.text_tfidf_topk(spark, sf_dir)
    per_doc = df.groupBy("doc_id").count()
    assert per_doc.filter(F.col("count") > 3).count() == 0
    # scores within a doc are non-increasing when sorted the ranked way
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    checked = df.withColumn("prev", F.lag("score").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("score") > F.col("prev"))
    )
    assert checked.count() == 0
