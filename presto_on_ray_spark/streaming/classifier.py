"""Streaming classifier inference: score an arriving (doc_id, text)
stream against FROZEN trained weights — the deploy half of the
round-13 training operator (textstats.classifier_train): train once
in batch, broadcast the fixed-width model, keep/drop every arriving
micro-batch forever at O(batch) per trigger.

foreachBatch rather than a stateful aggregation because inference is
stateless row-local work given the weights: each batch is featurized,
dotted against the broadcast 4097-row weight relation, and handed to
the sink — batch-for-batch identical to classifier_score_biased on
the same rows (pinned in tests/test_streaming_classifier.py). The
weights are the ONLY cross-batch artifact and they are frozen data;
retraining is a batch job that publishes a new weight relation, the
same artifact-lifecycle split as the saved ANN/counts stores.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from presto_on_ray_spark.operators.textstats import classifier_score_biased
from presto_on_ray_spark.streaming.ingest import _start


def stream_classifier_score(
    docs_stream: DataFrame,
    weights: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    await_termination: bool | None = None,
):
    """Score a streaming (doc_id, text) source against a trained
    (bucket, wnum) weight relation (classifier_train's output —
    PERSIST it, every micro-batch joins it): each batch's verdict
    relation (doc_id, n_tokens, logit, keep) is handed to
    ``sink(scored_df, batch_id)``. Docs with no tokens have no
    features and are absent from the batch's verdicts, exactly like
    the batch API.

    Per-batch cost: one featurize explode + two map-combined
    aggregates over the BATCH only, plus the broadcast of the
    fixed-width weight relation — the corpus, the training set, and
    all previous batches are never touched. Batch boundaries change
    which docs share a trigger, never any verdict: scoring is per-doc
    row-local given the weights."""

    def _score(batch_df: DataFrame, batch_id: int) -> None:
        sink(
            classifier_score_biased(
                batch_df.filter(batch_df["text"].isNotNull()), weights
            ),
            batch_id,
        )

    return _start(docs_stream, _score, checkpoint_dir, available_now,
                  await_termination)
