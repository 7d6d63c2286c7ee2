"""Presto reduce_agg(input, s0, add(s,x), combine(s1,s2)) on Spark
(SURVEY §2.4 reduce_agg).

Presto evaluates an arbitrary user fold per group. Spark has no
expression-level equivalent, and the naive ``collect_list``-then-fold
materializes every group in one aggregation buffer — a per-group
memory bomb at scale. This module implements the real two-phase shape:

1. **partial** — ``mapInPandas`` folds each partition's Arrow batches
   into ONE state per (partition, group). Executor memory holds one
   state per distinct group per partition (the same bound Spark's own
   partial hash aggregation gives), never the group's rows.
2. **final** — ``applyInPandas`` combines the few per-partition partial
   states per group (at most #partitions states per group cross the
   shuffle) and applies the optional ``finish`` projection.

The fold must be associative/commutative across partials (the same
contract Presto's combine_function carries); with an exact state type
(int / Decimal / tuple of those) the result is order-independent and
deterministic under any partitioning.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame


def reduce_agg(
    df: DataFrame,
    group_cols: list[str],
    input_col: str,
    zero: Any,
    add_batch: Callable[[Any, pd.Series], Any],
    combine: Callable[[Any, Any], Any],
    out_col: str,
    state_ddl: str,
    out_ddl: str | None = None,
    finish: Callable[[Any], Any] | None = None,
) -> DataFrame:
    """Distributed reduce_agg.

    ``add_batch(state, values)`` folds a whole pandas Series into the
    state (vectorize inside it — it is the hot path); ``combine`` merges
    two partial states; ``finish`` optionally projects the final state
    (default: identity). ``state_ddl``/``out_ddl`` are the Spark DDL
    types of the state and final columns (e.g. ``"decimal(38,2)"``,
    ``"double"``).
    """
    group_ddl = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols
    )
    partial_schema = f"{group_ddl}, {out_col} {state_ddl}"
    final_schema = f"{group_ddl}, {out_col} {out_ddl or state_ddl}"

    def partial(batches):
        states: dict[tuple, Any] = {}
        for pdf in batches:
            for key, grp in pdf.groupby(group_cols, dropna=False, sort=False):
                k = key if isinstance(key, tuple) else (key,)
                states[k] = add_batch(states.get(k, zero), grp[input_col])
        if states:
            yield pd.DataFrame(
                [[*k, v] for k, v in states.items()],
                columns=[*group_cols, out_col],
            )

    partials = df.select(*group_cols, input_col).mapInPandas(
        partial, partial_schema
    )

    def final(key, pdf):
        s = zero
        for v in pdf[out_col]:
            s = combine(s, v)
        if finish is not None:
            s = finish(s)
        return pd.DataFrame([[*key, s]], columns=[*group_cols, out_col])

    return partials.groupBy(*group_cols).applyInPandas(final, final_schema)
