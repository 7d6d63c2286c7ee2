"""Physical-plan introspection (SURVEY §4.2).

The reference delegates all optimization to the Presto JVM; here
Catalyst does it, and these helpers are how the engine (and its tests)
*prove* the plan is right rather than assume it: filters pushed to
parquet, dims broadcast, top-N fused, codegen spanning the operators.
tests/test_plans.py pins these properties so a regression in plan shape
fails CI, not the 100 TB run.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

# serializes the session-global metadata-length conf swap in
# pushed_filter_ranges_by_scan (concurrent EXPLAIN (TYPE IO) callers)
_META_LEN_LOCK = threading.Lock()


def explain_formatted(df: DataFrame) -> str:
    """The formatted physical plan as a string (same text as
    df.explain('formatted') prints)."""
    jdf = df._jdf
    return jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _parse_filter_ranges(filters: str) -> dict[str, tuple]:
    """Numeric (lo, hi) bounds from one PushedFilters list body — the
    subset of pushdown a parquet footer can act on (GreaterThan[OrEqual]
    / LessThan[OrEqual] / EqualTo with numeric literals; IsNotNull and
    string/complex predicates don't constrain a min/max span)."""
    import re

    ranges: dict[str, list] = {}

    def bound(col: str, lo=None, hi=None) -> None:
        cur = ranges.setdefault(col, [None, None])
        if lo is not None:
            cur[0] = lo if cur[0] is None else max(cur[0], lo)
        if hi is not None:
            cur[1] = hi if cur[1] is None else min(cur[1], hi)

    for name, col, val in re.findall(
        r"(GreaterThanOrEqual|GreaterThan|LessThanOrEqual|LessThan|EqualTo)"
        r"\((\w+),([-0-9.eE]+)\)",
        filters,
    ):
        try:
            v = float(val)
        except ValueError:
            # non-numeric literal the value class happens to match
            # (e.g. a DATE rendered 1995-03-15): skip the predicate
            # rather than failing the whole EXPLAIN
            continue
        if name.startswith("Greater"):
            bound(col, lo=v)
        elif name.startswith("Less"):
            bound(col, hi=v)
        else:
            bound(col, lo=v, hi=v)
    return {c: (lo, hi) for c, (lo, hi) in ranges.items()}


def pushed_filter_ranges_by_scan(df: DataFrame) -> list[tuple[list[str], dict[str, tuple]]]:
    """Per-FileScan (location paths, filter ranges) pairs from the
    formatted plan, so each scan's PushedFilters apply only to its OWN
    input location (a plan-wide union would wrongly predict pruning on
    another table that happens to share a column name). Feeds
    EXPLAIN (TYPE IO)'s predicted row-group pruning
    (layout.footer_stats)."""
    import re

    # the formatted plan truncates metadata strings (Location paths) at
    # spark.sql.maxMetadataStringLength (default 100 chars) — raise it
    # for this rendering so long dataset URIs still match their dirs.
    # The conf is session-global, so the set/render/restore must be
    # serialized or a concurrent caller's restore re-truncates this
    # rendering (and the raised value leaks permanently).
    spark = df.sparkSession
    _KEY = "spark.sql.maxMetadataStringLength"
    with _META_LEN_LOCK:
        try:
            old = spark.conf.get(_KEY)
        except Exception:
            old = None
        spark.conf.set(_KEY, "65536")
        try:
            plan = explain_formatted(df)
        finally:
            if old is not None:
                spark.conf.set(_KEY, old)
            else:
                spark.conf.unset(_KEY)
    out: list[tuple[list[str], dict[str, tuple]]] = []
    # formatted-plan scan nodes look like:
    #   (1) Scan parquet
    #   ...
    #   Location: InMemoryFileIndex [file:/path/table.parquet]
    #   PushedFilters: [GreaterThan(x,1.0), ...]
    for chunk in re.split(r"\(\d+\) Scan ", plan)[1:]:
        locm = re.search(r"Location: \w+ \[([^\]]*)\]", chunk)
        if not locm:
            continue
        paths = [p.strip() for p in locm.group(1).split(",") if p.strip()]
        fm = re.search(r"PushedFilters: \[([^\]]*)\]", chunk)
        out.append((paths, _parse_filter_ranges(fm.group(1)) if fm else {}))
    return out


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
