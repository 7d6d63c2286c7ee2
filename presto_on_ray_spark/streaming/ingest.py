"""Streaming ingest-time dedup: classify each arriving micro-batch of
documents against a prebuilt BaseIndex (operators/dedup.py two-phase
API) via foreachBatch — the form a continuously-growing corpus
actually runs at 100 TB: the base index is a set of maintained tables
(parquet via save_base_index/load_base_index, or caller-owned
persisted relations built with tracked=False), and every arriving
batch pays batch-sized work only.

foreachBatch rather than a native streaming join because the near
tier is a multi-stage relational pipeline (prefix rank, candidate
join, co-occurrence verification) that Structured Streaming cannot
express incrementally; per-micro-batch batch semantics are exactly
the ingest contract (each doc is classified against the BASE only,
never against other in-flight docs), so batch boundaries cannot
change any classification — pinned in tests/test_streaming_ingest.py.
"""

from __future__ import annotations

import contextlib
from typing import Callable

from pyspark.sql import DataFrame, functions as F

from presto_on_ray_spark.operators.dedup import BaseIndex, ingest_batch


def stream_ingest_dedup(
    docs_stream: DataFrame,
    index: BaseIndex,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    await_termination: bool | None = None,
):
    """Run ingest-time classification over a streaming (doc_id, text)
    source: every micro-batch is filtered to non-null text (the same
    contract as the dedup_incremental_ingest query path), classified
    against ``index`` with ingest_batch, and handed to
    ``sink(classified_df, batch_id)``. Each batch's OWN persists (the
    multi-consumed shingle relation) are collected locally and
    unpersisted after the sink returns — even when it raises — so the
    ingest pipeline itself holds O(1) cache state on a long-running
    stream, and the micro-batch worker thread never touches the
    global session cache registry (which a concurrent main-thread
    query may be using). The flip side: anything the SINK persists is
    the sink's own responsibility — a sink that invokes tracked
    operators must release what it tracked, because nothing on this
    path drains the global registry for it (by design).

    available_now=True (the default) drains the current data and
    terminates — bounded replays, tests, catch-up runs. Pass
    available_now=False for a continuous stream. await_termination
    defaults to following available_now: a bounded replay blocks to
    completion, a continuous stream returns the live handle (pass an
    explicit True only if you want to block on a continuous stream,
    e.g. to hold a driver process open). Returns the StreamingQuery
    either way.
    """

    def _classify(batch_df: DataFrame, batch_id: int) -> None:
        batch_persists: list[DataFrame] = []

        def keep(df: DataFrame) -> DataFrame:
            batch_persists.append(df.persist())
            return df

        try:
            sink(
                ingest_batch(
                    batch_df.filter(F.col("text").isNotNull()), index, keep=keep
                ),
                batch_id,
            )
        finally:
            for df in batch_persists:
                # a teardown-time unpersist failure must not mask the
                # sink's real exception or skip the remaining frames
                with contextlib.suppress(Exception):
                    df.unpersist()

    writer = docs_stream.writeStream.foreachBatch(_classify)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if await_termination is None:
        await_termination = available_now
    if await_termination:
        q.awaitTermination()
    return q
