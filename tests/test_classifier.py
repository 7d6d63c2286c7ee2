"""Hashing-trick linear classifier (textstats.classifier_score):
weights-as-data inference with a Python twin and exact-verdict pins."""

from __future__ import annotations

import hashlib

from presto_on_ray_spark.operators.textstats import (
    _CLF_BUCKETS,
    _CLF_WSCALE,
    classifier_score,
    demo_weights,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _twin(docs: dict[int, str], weights: dict[int, int]):
    out = {}
    for did, text in docs.items():
        toks = [w for w in text.split(" ") if w]
        if not toks:
            continue
        zint = sum(weights[_h60(tk) % _CLF_BUCKETS] for tk in toks)
        out[did] = (len(toks), zint / (_CLF_WSCALE * 1.0 * len(toks)), zint >= 0)
    return out


def test_python_twin_with_demo_weights(spark):
    docs = {
        0: "alpha beta gamma alpha",
        1: "delta epsilon",
        2: "zeta",
        3: "",  # tokenless: absent from output
    }
    w = {r.bucket: r.wnum for r in demo_weights(spark).collect()}
    assert len(w) == _CLF_BUCKETS
    assert all(-_CLF_WSCALE <= v <= _CLF_WSCALE for v in w.values())
    docs_df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.logit, r.keep)
        for r in classifier_score(docs_df, demo_weights(spark)).collect()
    }
    assert got == _twin(docs, w)
    assert 3 not in got


def test_caller_weights_drive_the_verdict(spark):
    # a model that loves the word "good" and hates "bad"
    docs_df = spark.createDataFrame(
        [(0, "good good neutralw"), (1, "bad neutralw"), (2, "neutralw")],
        "doc_id long, text string",
    )
    buckets = {w: _h60(w) % _CLF_BUCKETS for w in ("good", "bad", "neutralw")}
    assert len(set(buckets.values())) == 3  # no collisions among these three
    wnum = {
        buckets["good"]: 800,
        buckets["bad"]: -900,
        buckets["neutralw"]: 0,
    }
    weights = spark.createDataFrame(
        [(b, wnum.get(b, 0)) for b in range(_CLF_BUCKETS)],
        "bucket long, wnum long",
    )
    got = {
        r.doc_id: (r.logit, r.keep)
        for r in classifier_score(docs_df, weights).collect()
    }
    assert got[0] == (1600 / (_CLF_WSCALE * 3.0), True)
    assert got[1] == (-900 / (_CLF_WSCALE * 2.0), False)
    assert got[2] == (0.0, True)  # zint == 0 keeps (>= 0), exactly


def test_verdict_boundary_is_integer_exact(spark):
    # +1 vs -1 on the unnormalized integer sum: no float can flip it
    docs_df = spark.createDataFrame(
        [(0, "up up dn"), (1, "up dn dn")], "doc_id long, text string"
    )
    b_up, b_dn = _h60("up") % _CLF_BUCKETS, _h60("dn") % _CLF_BUCKETS
    assert b_up != b_dn
    weights = spark.createDataFrame(
        [(b, 1 if b == b_up else (-1 if b == b_dn else 0)) for b in range(_CLF_BUCKETS)],
        "bucket long, wnum long",
    )
    got = {r.doc_id: r.keep for r in classifier_score(docs_df, weights).collect()}
    assert got == {0: True, 1: False}
