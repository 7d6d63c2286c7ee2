"""Streaming ANN ingest: append arriving vectors to a saved IVF-PQ
index (operators/similarity.py saved-ANN lifecycle) via foreachBatch —
the form a continuously-growing vector corpus runs at 100 TB: the
index is a maintained on-disk table (codes + frozen quantizers), and
every arriving micro-batch pays O(batch) encode + append work.

Exactly-once comes for FREE here, unlike the dedup admit loop
(streaming/ingest.py), and the difference is worth stating: dedup
admission changes CLASSIFICATIONS (a batch must be classified against
exactly the pre-admission index state, so re-delivery needs commit
tokens to pin which state it saw), while ANN append has no
read-dependent output — the encode depends only on the FROZEN
quantizers, never on the other codes. Duplicate suppression is
therefore sufficient: every batch merges with resume semantics
(already-committed ids anti-joined away by one bounded broadcast
probe), so foreachBatch's at-least-once re-delivery appends nothing on
a full replay and exactly the missing remainder after a mid-batch
crash. No token log, no pruning, no checkpoint-lineage coupling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from presto_on_ray_spark.operators.similarity import (
    merge_into_saved_ann_index,
    quantized,
)
from presto_on_ray_spark.streaming.ingest import _start


def stream_ann_ingest(
    vec_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    await_termination: bool | None = None,
    vec_col: str = "embedding",
):
    """Run ANN admission over a streaming (vec_id, <vec_col>) source:
    every micro-batch is filtered to non-null vectors, quantized with
    the module's round(x*1000) convention (pass vec_col="qv" for a
    source that is already array<long>-quantized), and appended to the
    saved index at ``index_path`` under the single-writer marker.

    Re-delivery safety is structural (see module docstring): each
    merge runs resume=True, so replayed ids are skipped by the
    committed-id probe and only genuinely-new vectors encode. The ONE
    failure the loop will not absorb silently is a vec_id duplicated
    WITHIN a single batch — the encode argmin would keep one arbitrary
    vector, so the admission guard fails the batch loudly and the
    stream stops (deduplicate upstream; this mirrors the dedup admit
    loop's refusal to guess).

    A crashed append strands the index's writer marker and every
    subsequent batch fails loudly until the documented one-call
    recovery runs (compact_saved_ann_index(force=True,
    drop_torn=True)); the stream can then simply be restarted — the
    crashed batch re-delivers and resume skips its committed
    survivors. At 100 TB: schedule compact_saved_ann_index
    periodically anyway (file-count hygiene after many small
    appends), exactly like the dedup side's compaction contract."""

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.filter(F.col(vec_col).isNotNull())
        if vec_col == "qv":
            v = batch.select("vec_id", "qv")
        else:
            v = batch.select(
                "vec_id", quantized(F.col(vec_col)).alias("qv")
            )
        # emptiness is checked AFTER the null filter: an all-NULL batch
        # must not pay the marker/guard/append cycle or write empty
        # append-file litter any more than an idle trigger does
        if v.isEmpty():
            return
        merge_into_saved_ann_index(
            batch_df.sparkSession, index_path, v, resume=True
        )

    return _start(
        vec_stream, _admit, checkpoint_dir, available_now, await_termination
    )
