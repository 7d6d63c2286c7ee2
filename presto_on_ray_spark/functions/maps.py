"""Map aggregate functions: Presto ``map_union`` / ``map_union_sum``.

Presto 0.248 (the engine the reference launches — its §2.8/§2.4
function surface lives in the unvendored JVM, reference README.md:46)
exposes ``map_union(map)``: an aggregate that merges maps across rows.
Spark has no map aggregate, and ``map_concat`` errors on duplicate
keys — so both forms are built as the relational decomposition:

    explode(map) → (group, key, value) rows
    → groupBy(group, key) conflict-resolve   [partial-agg friendly]
    → groupBy(group) re-assemble sorted map

Scale shape: the shuffle carries (group, key, value) triples — never a
whole map in one aggregation buffer — and partial aggregation collapses
duplicate keys map-side. The final ``collect_list`` is bounded by the
number of DISTINCT keys per group (the merged map's own size), i.e. the
same bound as the result row itself.

Determinism: Presto's ``map_union`` keeps an ARBITRARY value on key
conflict; that is unacceptable for differential testing, so this
implementation pins the MAX value (documented delta — any associative
choice is Presto-compatible since Presto gives no guarantee).
``map_union_sum`` sums on conflict (exact for integral types).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _reassemble(df_kv: DataFrame, group_cols: list[str], out_col: str) -> DataFrame:
    """(group, _k, _v) rows → per-group map sorted by key (deterministic
    entry order so downstream renders/comparisons are stable)."""
    entries = F.array_sort(F.collect_list(F.struct("_k", "_v")))
    return df_kv.groupBy(*group_cols).agg(
        F.map_from_entries(entries).alias(out_col)
    )


def map_union_agg(
    df: DataFrame, group_cols: list[str], map_col: str, out_col: str = "merged"
) -> DataFrame:
    """Presto ``map_union``: merge maps across rows per group; on key
    conflict keep the MAX value (deterministic refinement of Presto's
    arbitrary pick)."""
    kv = df.select(*group_cols, F.explode(map_col).alias("_k", "_v"))
    resolved = kv.groupBy(*group_cols, "_k").agg(F.max("_v").alias("_v"))
    return _reassemble(resolved, group_cols, out_col)


def map_union_sum_agg(
    df: DataFrame, group_cols: list[str], map_col: str, out_col: str = "merged"
) -> DataFrame:
    """``map_union_sum``: merge maps across rows per group, SUMMING
    values on key conflict (word-count / feature-count merges)."""
    kv = df.select(*group_cols, F.explode(map_col).alias("_k", "_v"))
    resolved = kv.groupBy(*group_cols, "_k").agg(F.sum("_v").alias("_v"))
    return _reassemble(resolved, group_cols, out_col)
