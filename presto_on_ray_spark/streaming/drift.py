"""Streaming distribution-drift monitoring: per-micro-batch PSI of an
arriving (group, val) stream against a FROZEN reference histogram —
the monitoring loop a continuously-ingesting pipeline runs beside
stream_ingest_dedup: the ingest path admits documents, this path
raises the flag when a source's distribution moves.

foreachBatch rather than a stateful streaming aggregation because the
monitoring contract is per-SNAPSHOT: each micro-batch is one
observation window compared whole against the reference
(operators/drift.py semantics, batch-for-batch identical to the batch
API — pinned in tests/test_streaming_drift.py). A cumulative PSI
would need the full current histogram as state; the per-batch form
needs none, which is what makes the monitor O(batch + reference bins)
per trigger forever.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from presto_on_ray_spark.operators.drift import psi_against_reference
from presto_on_ray_spark.streaming.ingest import _start


def stream_drift_monitor(
    stream: DataFrame,
    ref_hist: DataFrame,
    bin_width: int,
    sink: Callable[[DataFrame, int], None],
    group_col: str = "source",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    await_termination: bool | None = None,
):
    """Monitor a streaming (group, val) source for drift against
    ``ref_hist`` (reference_histogram's output — PERSIST it, every
    micro-batch joins it): each batch's per-group PSI relation
    (group, n_ref, n_cur, n_bins, psi) is handed to
    ``sink(psi_df, batch_id)``. A batch carrying rows for only SOME
    reference groups still emits one row per reference group: absent
    groups score with n_cur=0 — the primary silence signal — plus a
    nonzero PSI whenever the group's reference histogram is
    non-uniform (Laplace smoothing maps silence to the uniform
    distribution, so a uniform reference scores silence as 0 by
    arithmetic; alert on n_cur, not PSI alone). Whether an
    entirely-empty trigger fires at all is the stream engine's call,
    not this function's.

    Per-batch cost: one map-side histogram of the batch + joins and
    windows over (groups x bins)-bounded relations; the reference
    corpus is never rescanned. Batch boundaries change WHICH snapshot
    each PSI describes (by design — the trigger interval is the
    monitoring window), never the arithmetic: a batch equal to a
    batch-API snapshot produces the identical relation."""

    def _monitor(batch_df: DataFrame, batch_id: int) -> None:
        sink(
            psi_against_reference(ref_hist, batch_df, bin_width, group_col),
            batch_id,
        )

    return _start(stream, _monitor, checkpoint_dir, available_now,
                  await_termination)


def stream_semantic_drift(
    stream: DataFrame,
    ref_hist: DataFrame,
    cents: DataFrame,
    sink: Callable[[DataFrame, int], None],
    group_col: str = "source",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    await_termination: bool | None = None,
    vec_col: str = "embedding",
):
    """stream_drift_monitor for the embedding modality: each arriving
    (vec_id, <vec_col>, <group_col>) micro-batch is quantized,
    assigned to the FROZEN cells, and its (group x cell) histogram is
    PSI-scored against ``ref_hist`` — built once as
    reference_histogram(semantic_snapshot(ref, cents), 1) and
    persisted, exactly the scalar monitor's frozen-reference contract.

    ``cents`` is required, not derived: the frozen geometry IS the
    binning, and a reference histogram is only comparable to batches
    assigned under the same cells (operators/drift.py's
    semantic-drift rationale; stream_semantic_admit's ``_cents``
    sidecar is the natural source when both loops run beside each
    other). Per-batch cost: one broadcast argmin over the batch + the
    bounded PSI relations — the reference corpus is never rescanned."""
    from presto_on_ray_spark.operators.drift import semantic_snapshot
    from presto_on_ray_spark.operators.similarity import quantized

    from pyspark.sql import functions as F

    def _monitor(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.filter(F.col(vec_col).isNotNull())
        if vec_col == "qv":
            v = batch.select("vec_id", "qv", group_col)
        else:
            v = batch.select(
                "vec_id", quantized(F.col(vec_col)).alias("qv"), group_col
            )
        if v.groupBy("vec_id").count().filter(
            "count > 1"
        ).limit(1).collect():
            raise ValueError(
                "stream_semantic_drift: duplicate vec_id within a batch — "
                "the per-id argmin would collapse colliding rows to one "
                "winner and silently skew the histogram; re-key merged "
                "sources upstream"
            )
        sink(
            psi_against_reference(
                ref_hist, semantic_snapshot(v, cents, group_col), 1, group_col
            ),
            batch_id,
        )

    return _start(stream, _monitor, checkpoint_dir, available_now,
                  await_termination)
