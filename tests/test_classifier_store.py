"""The published classifier-weights store (round 14, VERDICT r13 #4):
generation-flip publish (textstats.save_classifier_weights over the
counts-store protocol), store round-trip == in-session weights, the
published suite key == the distilled key, per-trigger live-generation
reads (a mid-stream publish changes verdicts exactly at a trigger
boundary), and the composed retrain-on-drift loop."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.operators.textstats import (
    classifier_score_biased,
    classifier_train,
    langid_labels,
    load_classifier_weights,
    save_classifier_weights,
    weights_live_generation,
)


def _weights_map(df):
    return {r["bucket"]: r["wnum"] for r in df.collect()}


def test_store_roundtrip_equals_in_session_weights(spark, sf_dir, tmp_path):
    """VERDICT r13 #4's oracle-equality gate: weights read back from a
    published generation are the trained relation, bit-for-bit."""
    d = t(spark, sf_dir, "documents")
    w = classifier_train(d, langid_labels(d), epochs=2)
    p = str(tmp_path / "wstore")
    save_classifier_weights(w, p)
    assert _weights_map(load_classifier_weights(spark, p)) == _weights_map(w)


def test_generation_flip_and_reader_grace_window(spark, tmp_path):
    wa = spark.range(4097).selectExpr("id AS bucket", "CAST(1 AS LONG) AS wnum")
    wb = spark.range(4097).selectExpr("id AS bucket", "CAST(-1 AS LONG) AS wnum")
    p = str(tmp_path / "wstore")
    save_classifier_weights(wa, p)
    g0 = weights_live_generation(p)
    save_classifier_weights(wb, p)
    g1 = weights_live_generation(p)
    assert g0 != g1
    # live read = new generation; the superseded one stays readable
    # for exactly one mutation (the counts store's grace window)
    assert _weights_map(load_classifier_weights(spark, p)) == _weights_map(wb)
    assert _weights_map(
        load_classifier_weights(spark, p, generation=g0)
    ) == _weights_map(wa)


def test_published_key_equals_distilled_key(spark, sf_dir):
    """The published key scores THROUGH the store; fresh store ⇒ same
    relation as the in-session distilled key (the shared-oracle
    premise)."""
    from presto_on_ray_spark.operators.textstats import (
        text_classifier_distilled,
        text_classifier_published,
    )

    a = text_classifier_published(spark, sf_dir)
    b = text_classifier_distilled(spark, sf_dir)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_midstream_publish_flips_verdicts_at_trigger_boundary(
    spark, sf_dir, tmp_path
):
    """VERDICT r13 #4's streaming gate: batch 0 scores under the
    initially published all-(+1) weights (keep everything), the sink
    publishes all-(-1) weights DURING batch 0, and batch 1 — same
    docs, next trigger — flips every verdict. Inside each batch the
    generation is bound once."""
    from presto_on_ray_spark.streaming.classifier import (
        stream_classifier_score_published,
    )

    docs = (
        t(spark, sf_dir, "documents")
        .filter("text IS NOT NULL")
        .filter("doc_id < 40")
        .select("doc_id", "text")
    )
    src = tmp_path / "arrivals"
    docs.coalesce(1).write.parquet(str(src / "f1"))
    docs.coalesce(1).write.parquet(str(src / "f2"))

    p = str(tmp_path / "wstore")
    wa = spark.range(4097).selectExpr("id AS bucket", "CAST(1 AS LONG) AS wnum")
    wb = spark.range(4097).selectExpr("id AS bucket", "CAST(-1 AS LONG) AS wnum")
    save_classifier_weights(wa, p)

    got: dict[int, dict] = {}

    def sink(df, batch_id):
        got[batch_id] = {r.doc_id: r.keep for r in df.collect()}
        if batch_id == 0:
            save_classifier_weights(wb, p, force=True)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    stream_classifier_score_published(
        stream, p, sink, checkpoint_dir=str(tmp_path / "ckpt")
    )
    assert len(got) == 2
    assert got[0] and all(keep for keep in got[0].values())
    assert set(got[1]) == set(got[0])
    assert all(not keep for keep in got[1].values())


def test_retrain_on_drift_publishes_only_on_breach(spark, sf_dir, tmp_path):
    """The composed loop: an in-distribution batch scores under the
    incumbent generation (no publish); a drifted batch (token counts
    far outside the reference histogram) breaches PSI, retrains on
    the batch, publishes, and is scored under the NEW generation —
    verified against a direct batch-side replay of the same retrain."""
    from presto_on_ray_spark.operators.drift import reference_histogram
    from presto_on_ray_spark.streaming.classifier import (
        stream_classifier_retrain_on_drift,
    )

    docs = t(spark, sf_dir, "documents").filter("text IS NOT NULL")
    toks = F.size(F.filter(F.split("text", " "), lambda x: F.length(x) > 0))
    ref = reference_histogram(
        docs.select(F.lit("all").alias("grp"), toks.cast("long").alias("val")),
        16,
        "grp",
    ).persist()

    b1 = docs.filter("doc_id % 2 = 0").select("doc_id", "text")
    drifted_rows = [
        (100000 + i, "the of and " + " ".join(["drift"] * 400)) for i in range(30)
    ]
    b2 = spark.createDataFrame(drifted_rows, "doc_id long, text string")
    src = tmp_path / "arrivals"
    b1.coalesce(1).write.parquet(str(src / "f1"))
    b2.coalesce(1).write.parquet(str(src / "f2"))

    p = str(tmp_path / "wstore")
    w0 = classifier_train(docs, langid_labels(docs), epochs=2)
    save_classifier_weights(w0, p)
    g0 = weights_live_generation(p)

    gens: dict[int, str] = {}
    got: dict[int, dict] = {}

    def sink(df, batch_id):
        got[batch_id] = {r.doc_id: r.keep for r in df.collect()}
        gens[batch_id] = weights_live_generation(p)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    try:
        stream_classifier_retrain_on_drift(
            stream, ref, p, sink, psi_threshold=0.25, bin_width=16,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
    finally:
        ref.unpersist()
    assert len(got) == 2
    # batch 0: in-distribution → incumbent generation, verdicts = w0's
    assert gens[0] == g0
    expect0 = {
        r.doc_id: r.keep for r in classifier_score_biased(b1, w0).collect()
    }
    assert got[0] == expect0
    # batch 1: drifted → breach published a NEW generation before
    # scoring, and the verdicts equal a batch-side replay of the same
    # batch-trained model
    assert gens[1] != g0
    w_replay = classifier_train(b2, langid_labels(b2))
    expect1 = {
        r.doc_id: r.keep
        for r in classifier_score_biased(b2, w_replay).collect()
    }
    assert got[1] == expect1


def test_score_published_empty_store_raises_descriptive(spark, tmp_path):
    """ADVICE r14: a scorer stream against an empty weights store must
    fail at START with a bootstrap message, not crash the first
    trigger with a raw missing-_CURRENT error."""
    from presto_on_ray_spark.streaming.classifier import (
        stream_classifier_score_published,
    )

    src = tmp_path / "arrivals"
    spark.createDataFrame(
        [(1, "hello world")], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "f1"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(src))
    )
    with pytest.raises(ValueError, match="no published generation"):
        stream_classifier_score_published(
            stream, str(tmp_path / "empty_store"), lambda df, b: None,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )


def test_retrain_on_drift_bootstraps_on_empty_store(spark, sf_dir, tmp_path):
    """ADVICE r14: a NO-BREACH first batch against an empty store
    bootstraps (train+publish on the batch) instead of crashing on the
    missing-_CURRENT read."""
    from presto_on_ray_spark.operators.drift import reference_histogram
    from presto_on_ray_spark.streaming.classifier import (
        stream_classifier_retrain_on_drift,
    )

    docs = t(spark, sf_dir, "documents").filter("text IS NOT NULL")
    toks = F.size(F.filter(F.split("text", " "), lambda x: F.length(x) > 0))
    ref = reference_histogram(
        docs.select(F.lit("all").alias("grp"), toks.cast("long").alias("val")),
        16,
        "grp",
    ).persist()
    b1 = docs.filter("doc_id % 2 = 0").select("doc_id", "text")
    src = tmp_path / "arrivals"
    b1.coalesce(1).write.parquet(str(src / "f1"))
    p = str(tmp_path / "wstore")

    got: dict[int, dict] = {}

    def sink(df, batch_id):
        got[batch_id] = {r.doc_id: r.keep for r in df.collect()}

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    try:
        stream_classifier_retrain_on_drift(
            stream, ref, p, sink, psi_threshold=0.25, bin_width=16,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
    finally:
        ref.unpersist()
    # bootstrapped: a generation exists and verdicts equal a batch
    # replay of the same batch-trained model
    w_replay = classifier_train(b1, langid_labels(b1))
    expect = {
        r.doc_id: r.keep
        for r in classifier_score_biased(b1, w_replay).collect()
    }
    assert weights_live_generation(p)
    assert got[0] == expect


def test_retrain_windowed_cooldown_and_window_training(
    spark, sf_dir, tmp_path
):
    """VERDICT r14 #5's two pins: (1) a breach INSIDE the publish
    cooldown does NOT flip the generation; (2) the accumulate-then-
    retrain cycle trains on the WHOLE window since the last publish —
    the published weights are hash-equal to classifier_train over the
    union of the window's batches."""
    from presto_on_ray_spark.operators.drift import reference_histogram
    from presto_on_ray_spark.streaming.classifier import (
        stream_classifier_retrain_windowed,
    )

    docs = t(spark, sf_dir, "documents").filter("text IS NOT NULL")
    toks = F.size(F.filter(F.split("text", " "), lambda x: F.length(x) > 0))
    ref = reference_histogram(
        docs.select(F.lit("all").alias("grp"), toks.cast("long").alias("val")),
        16,
        "grp",
    ).persist()

    b1 = docs.filter("doc_id % 2 = 0").select("doc_id", "text")
    drift1 = [
        (100000 + i, "the of and " + " ".join(["drift"] * 400))
        for i in range(30)
    ]
    drift2 = [
        (200000 + i, "a in to " + " ".join(["shift"] * 300))
        for i in range(30)
    ]
    b2 = spark.createDataFrame(drift1, "doc_id long, text string")
    b3 = spark.createDataFrame(drift2, "doc_id long, text string")
    src = tmp_path / "arrivals"
    b1.coalesce(1).write.parquet(str(src / "f1"))
    b2.coalesce(1).write.parquet(str(src / "f2"))
    b3.coalesce(1).write.parquet(str(src / "f3"))

    p = str(tmp_path / "wstore")
    gens: dict[int, str] = {}
    got: dict[int, dict] = {}

    def sink(df, batch_id):
        got[batch_id] = {r.doc_id: r.keep for r in df.collect()}
        gens[batch_id] = weights_live_generation(p)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    try:
        stream_classifier_retrain_windowed(
            stream, ref, p, str(tmp_path / "window"), sink,
            psi_threshold=0.25, bin_width=16, cooldown_triggers=1,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
    finally:
        ref.unpersist()
    assert len(got) == 3
    # t0: empty store -> bootstrap publish trained on b1 alone
    w_b1 = classifier_train(b1, langid_labels(b1))
    expect0 = {
        r.doc_id: r.keep for r in classifier_score_biased(b1, w_b1).collect()
    }
    assert got[0] == expect0
    # t1: b2 breaches PSI but is 0 triggers after the publish
    # (cooldown_triggers=1) -> generation does NOT flip
    assert gens[1] == gens[0]
    # t2: b3 breaches after the cooldown -> retrain on the accumulated
    # window {b2, b3}, publish
    assert gens[2] != gens[0]
    w_window = classifier_train(
        b2.unionByName(b3), langid_labels(b2.unionByName(b3))
    )
    assert _weights_map(
        load_classifier_weights(spark, p)
    ) == _weights_map(w_window)
    expect2 = {
        r.doc_id: r.keep
        for r in classifier_score_biased(b3, w_window).collect()
    }
    assert got[2] == expect2
    # consumed spool windows are pruned on publish: no spool dir below
    # the current open window index survives (the open window itself
    # is created lazily by the next trigger's append, so after a
    # final-trigger publish zero dirs is the correct state)
    import json
    import os

    with open(tmp_path / "window" / "_STATE", encoding="utf-8") as fh:
        cur = json.load(fh)["window"]
    assert cur == 2
    spools = sorted(
        n for n in os.listdir(tmp_path / "window")
        if n.startswith("w") and n[1:].isdigit()
    )
    assert all(int(n[1:]) >= cur for n in spools), spools


def test_empty_first_batch_does_not_bootstrap_zero_model(
    spark, sf_dir, tmp_path
):
    """Review pin (r15): an all-NULL-text first trigger against an
    EMPTY store must not train on zero docs and publish an all-zero
    accept-everything model — both drift loops sink an empty verdict
    relation and leave the store unpublished; the windowed loop then
    bootstraps normally on the next non-empty trigger."""
    from presto_on_ray_spark.operators.drift import reference_histogram
    from presto_on_ray_spark.streaming.classifier import (
        _weights_store_live,
        stream_classifier_retrain_windowed,
    )

    docs = t(spark, sf_dir, "documents").filter("text IS NOT NULL")
    toks = F.size(F.filter(F.split("text", " "), lambda x: F.length(x) > 0))
    ref = reference_histogram(
        docs.select(F.lit("all").alias("grp"), toks.cast("long").alias("val")),
        16,
        "grp",
    ).persist()
    b_null = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, text string"
    )
    b_real = docs.filter("doc_id % 2 = 0").select("doc_id", "text")
    src = tmp_path / "arrivals"
    b_null.coalesce(1).write.parquet(str(src / "f1"))
    b_real.coalesce(1).write.parquet(str(src / "f2"))

    p = str(tmp_path / "wstore")
    got: dict[int, dict] = {}
    live_at: dict[int, bool] = {}

    def sink(df, batch_id):
        got[batch_id] = {r.doc_id: r.keep for r in df.collect()}
        live_at[batch_id] = _weights_store_live(p)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    try:
        stream_classifier_retrain_windowed(
            stream, ref, p, str(tmp_path / "window"), sink,
            psi_threshold=0.25, bin_width=16, cooldown_triggers=1,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
    finally:
        ref.unpersist()
    # trigger 0: empty batch -> empty verdicts, NOTHING published
    assert got[0] == {} and live_at[0] is False
    # trigger 1: the first real batch bootstraps (trained on the
    # window = b_real alone; the empty batch contributed nothing)
    assert live_at[1] is True
    w_b = classifier_train(b_real, langid_labels(b_real))
    expect = {
        r.doc_id: r.keep
        for r in classifier_score_biased(b_real, w_b).collect()
    }
    assert got[1] == expect
