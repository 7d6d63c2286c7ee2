"""Streaming ingest-time dedup: classify each arriving micro-batch of
documents against a prebuilt BaseIndex (operators/dedup.py two-phase
API) via foreachBatch — the form a continuously-growing corpus
actually runs at 100 TB: the base index is a set of maintained tables
(parquet via save_base_index/load_base_index, or persisted relations),
and every arriving batch pays batch-sized work only.

foreachBatch rather than a native streaming join because the near
tier is a multi-stage relational pipeline (prefix rank, candidate
join, co-occurrence verification) that Structured Streaming cannot
express incrementally; per-micro-batch batch semantics are exactly
the ingest contract (each doc is classified against the BASE only,
never against other in-flight docs), so batch boundaries cannot
change any classification — pinned in tests/test_streaming_ingest.py.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from presto_on_ray_spark.operators.dedup import BaseIndex, ingest_batch


def stream_ingest_dedup(
    docs_stream: DataFrame,
    index: BaseIndex,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
):
    """Run ingest-time classification over a streaming (doc_id, text)
    source: every micro-batch is classified against ``index`` with
    ingest_batch and handed to ``sink(classified_df, batch_id)``.
    Uses availableNow so bounded replays terminate (tests/demos); a
    production stream drops the trigger. Returns the finished query.
    """

    def _classify(batch_df: DataFrame, batch_id: int) -> None:
        sink(ingest_batch(batch_df, index), batch_id)

    writer = docs_stream.writeStream.foreachBatch(_classify)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return q
