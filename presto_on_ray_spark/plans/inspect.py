"""Physical-plan introspection (SURVEY §4.2).

The reference delegates all optimization to the Presto JVM; here
Catalyst does it, and these helpers are how the engine (and its tests)
*prove* the plan is right rather than assume it: filters pushed to
parquet, dims broadcast, top-N fused, codegen spanning the operators.
tests/test_plans.py pins these properties so a regression in plan shape
fails CI, not the 100 TB run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The formatted physical plan as a string (same text as
    df.explain('formatted') prints)."""
    jdf = df._jdf
    return jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def physical_summary(df: DataFrame) -> dict[str, bool | int]:
    """Plan-shape facts used by the scale assertions."""
    plan = explain_formatted(df)
    return {
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "broadcast_hash_join": "BroadcastHashJoin" in plan,
        "shuffle_hash_or_smj": ("ShuffledHashJoin" in plan) or ("SortMergeJoin" in plan),
        "take_ordered": "TakeOrderedAndProject" in plan,
        "partial_aggregate": "partial_" in plan or "HashAggregate" in plan,
        "codegen_stages": plan.count("WholeStageCodegen"),
        "exchanges": plan.count("Exchange"),
        "python_udf": "BatchEvalPython" in plan or "ArrowEvalPython" in plan,
    }
