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


def stream_classifier_score_published(
    docs_stream: DataFrame,
    weights_path: str,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    await_termination: bool | None = None,
):
    """stream_classifier_score reading the PUBLISHED weights store
    (textstats.save_classifier_weights' generation-flip layout)
    instead of a frozen in-session relation: every trigger re-resolves
    the LIVE generation, so a publish landing mid-stream changes
    verdicts exactly at the next trigger boundary — never inside a
    batch (each batch binds one generation once; pinned in
    tests/test_classifier_store.py). This is the deploy half of the
    retrain→publish lifecycle: the scorer never restarts for a model
    update, and a rollback (re-publishing the old weights) takes
    effect the same way.

    Per-trigger cost adds one pointer read + one parquet open of the
    4097-row weight relation — noise next to the batch featurize."""
    from presto_on_ray_spark.operators.textstats import (
        load_classifier_weights,
    )

    def _score(batch_df: DataFrame, batch_id: int) -> None:
        w = load_classifier_weights(batch_df.sparkSession, weights_path)
        sink(
            classifier_score_biased(
                batch_df.filter(batch_df["text"].isNotNull()), w
            ),
            batch_id,
        )

    return _start(docs_stream, _score, checkpoint_dir, available_now,
                  await_termination)


def stream_classifier_retrain_on_drift(
    docs_stream: DataFrame,
    ref_hist: DataFrame,
    weights_path: str,
    sink: Callable[[DataFrame, int], None],
    psi_threshold: float = 0.25,
    bin_width: int = 16,
    retrain: Callable[[DataFrame], DataFrame] | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    await_termination: bool | None = None,
):
    """The composed retrain-on-drift loop (VERDICT r13 #4): per
    trigger, (1) monitor the batch's token-count distribution against
    ``ref_hist`` (reference_histogram's output — the same PSI
    arithmetic as stream_drift_monitor), (2) if ANY group's PSI
    breaches ``psi_threshold``, retrain and PUBLISH a new weights
    generation, (3) score the batch through the live store (the new
    generation if this batch breached — retrain-then-score, so the
    drifted batch itself is judged by the refreshed model) and hand
    ``sink(scored_df, batch_id)`` the verdicts.

    ``retrain`` maps the drifted batch's (doc_id, text) rows to a new
    (bucket, wnum) relation; the default trains the pocket perceptron
    on the BATCH under the weak lang-id labels — a stand-in policy
    that keeps the demo self-contained. A production pipeline passes
    a retrainer over its accumulated labeled window instead; the
    lifecycle (breach → train → generation flip → next trigger reads
    the new model) is what this function owns, and it is O(batch) on
    the no-breach path: one histogram + PSI over (groups x bins) rows
    plus the score join."""
    from presto_on_ray_spark.operators.drift import psi_against_reference
    from presto_on_ray_spark.operators.textstats import (
        classifier_train,
        langid_labels,
        load_classifier_weights,
        save_classifier_weights,
    )
    from pyspark.sql import functions as F

    if retrain is None:
        def retrain(batch_docs: DataFrame) -> DataFrame:  # noqa: F811
            return classifier_train(batch_docs, langid_labels(batch_docs))

    def _tick(batch_df: DataFrame, batch_id: int) -> None:
        batch_docs = batch_df.filter(batch_df["text"].isNotNull())
        toks = F.size(F.filter(F.split("text", " "), lambda x: F.length(x) > 0))
        snapshot = batch_docs.select(
            F.col("source").alias("grp") if "source" in batch_docs.columns
            else F.lit("all").alias("grp"),
            toks.cast("long").alias("val"),
        )
        psi = psi_against_reference(ref_hist, snapshot, bin_width, "grp")
        breached = psi.filter(F.col("psi") > psi_threshold).limit(1).count() > 0
        if breached:
            save_classifier_weights(
                retrain(batch_docs), weights_path, force=True
            )
        w = load_classifier_weights(batch_df.sparkSession, weights_path)
        sink(classifier_score_biased(batch_docs, w), batch_id)

    return _start(docs_stream, _tick, checkpoint_dir, available_now,
                  await_termination)
