"""Semantic ingest admission (similarity.semantic_ingest_verdicts):
NumPy brute-force twin over the fixture split plus the rule pins the
oracle can't see — full-probe exactness, rank-based centroids on a
non-contiguous id space, and the corpus-side self-exclusion the
streaming replay guard leans on."""

from __future__ import annotations

import numpy as np
import pytest

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.operators.similarity import (
    _SEM_INGEST_NPROBE,
    _SEM_TAU,
    auto_ivf_cells,
    quantized,
    semantic_ingest_verdicts,
)
from pyspark.sql import functions as F


def _twin(corpus: dict[int, np.ndarray], batch: dict[int, np.ndarray],
          n_cells: int, nprobe: int, tau: float):
    """Shared-code-free reference: rank-based centroid head, integer-L2
    assignment (smallest-cell ties), nprobe nearest cells per batch
    vector, cosine against probed corpus members, earliest-id dup."""
    cids = sorted(corpus)
    cents = [corpus[i] for i in cids[:n_cells]]

    def dists(q):
        return [int(((q - c).astype(object) ** 2).sum()) for c in cents]

    cell_of = {i: int(np.argmin(dists(corpus[i]))) for i in cids}
    out = {}
    for b in sorted(batch):
        d = dists(batch[b])
        probed = [c for _, c in sorted((d[c], c) for c in range(len(cents)))[:nprobe]]
        cand = [i for i in cids if cell_of[i] in probed and i != b]
        nb = float(np.sqrt(float((batch[b].astype(float) ** 2).sum())))
        dup = None
        for a in sorted(cand):
            na = float(np.sqrt(float((corpus[a].astype(float) ** 2).sum())))
            cos = float(np.dot(corpus[a].astype(float), batch[b].astype(float))) / (na * nb)
            if cos >= tau:
                dup = a
                break
        out[b] = (dup is None, dup, len(cand))
    return out


@pytest.fixture(scope="module")
def split(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", quantized(F.col("embedding")).alias("qv"))
    corpus = v.filter(F.col("vec_id") % 5 != 0)
    batch = v.filter(F.col("vec_id") % 5 == 0)
    cvecs = {r.vec_id: np.array(r.qv, dtype=np.int64) for r in corpus.collect()}
    bvecs = {r.vec_id: np.array(r.qv, dtype=np.int64) for r in batch.collect()}
    return corpus, batch, cvecs, bvecs


def test_numpy_twin_exact(split):
    corpus, batch, cvecs, bvecs = split
    nc = auto_ivf_cells(len(cvecs))
    got = {r.vec_id: (r.admit, r.dup_of, r.n_cand)
           for r in semantic_ingest_verdicts(corpus, batch).collect()}
    assert got == _twin(cvecs, bvecs, nc, _SEM_INGEST_NPROBE, _SEM_TAU)


def test_full_probe_equals_corpus_wide_rule(split):
    """nprobe = n_cells removes the candidate bound entirely: every
    batch vector is compared against the WHOLE corpus, so the verdict
    must equal the brute-force rule with no cell structure at all —
    the probe dial only ever narrows, never changes, the rule."""
    corpus, batch, cvecs, bvecs = split
    nc = auto_ivf_cells(len(cvecs))
    got = {r.vec_id: (r.admit, r.dup_of, r.n_cand)
           for r in semantic_ingest_verdicts(corpus, batch, nprobe=nc).collect()}
    n = len(cvecs)
    for b, vec in bvecs.items():
        nb = float(np.sqrt(float((vec.astype(float) ** 2).sum())))
        dup = None
        for a in sorted(cvecs):
            na = float(np.sqrt(float((cvecs[a].astype(float) ** 2).sum())))
            cos = float(np.dot(cvecs[a].astype(float), vec.astype(float))) / (na * nb)
            if cos >= _SEM_TAU:
                dup = a
                break
        assert got[b] == (dup is None, dup, n), b


def test_rank_based_cents_on_noncontiguous_ids(split):
    """semantic_dedup's sampled cents need a 0-based id prefix; the
    ingest default must NOT (an admission corpus has arbitrary
    surviving ids) — shifting every id by 10_000 changes nothing but
    the reported ids."""
    corpus, batch, _, _ = split
    base = {r.vec_id: (r.admit, r.dup_of, r.n_cand)
            for r in semantic_ingest_verdicts(corpus, batch).collect()}
    shifted = {
        r.vec_id - 10_000: (r.admit, r.dup_of - 10_000 if r.dup_of is not None else None, r.n_cand)
        for r in semantic_ingest_verdicts(
            corpus.withColumn("vec_id", F.col("vec_id") + 10_000),
            batch.withColumn("vec_id", F.col("vec_id") + 10_000),
        ).collect()
    }
    assert shifted == base


def test_own_stored_copy_excluded(split):
    """A batch vector whose id ALREADY sits in the corpus (a replayed,
    previously-admitted vector racing the caller's replay guard) must
    not be rejected by its own stored copy — the id self-exclusion is
    what makes replay verdicts deterministic."""
    corpus, batch, _, bvecs = split
    some_id = min(bvecs)
    polluted = corpus.unionByName(batch.filter(F.col("vec_id") == some_id))
    clean = {r.vec_id: (r.admit, r.dup_of)
             for r in semantic_ingest_verdicts(corpus, batch).collect()}
    got = {r.vec_id: (r.admit, r.dup_of)
           for r in semantic_ingest_verdicts(polluted, batch).collect()}
    # the polluted copy may still shadow OTHER batch vectors (it is a
    # legitimate corpus member for them) but never its own id
    assert got[some_id] == clean[some_id]


def test_empty_corpus_admits_everything(spark, split):
    corpus, batch, _, bvecs = split
    empty = corpus.filter(F.lit(False))
    head = batch.limit(5)
    rows = semantic_ingest_verdicts(empty, head, n_cells=8).collect()
    assert len(rows) == 5
    assert all(r.admit and r.dup_of is None and r.n_cand == 0 for r in rows)


def test_probe_dial_matches_numpy_recurve(split):
    """semantic_probe_dial's whole curve against a shared-code-free
    NumPy replay: sampled queries, full-corpus cosine truth, min
    qualifying cell rank, cumulative crossing at the target."""
    from presto_on_ray_spark.operators.similarity import (
        semantic_probe_dial,
    )

    corpus, _, cvecs, _ = split
    nc = auto_ivf_cells(len(cvecs))
    d = semantic_probe_dial(corpus)

    cids = sorted(cvecs)
    cents = [cvecs[i] for i in cids[:nc]]

    def dists(q):
        return [int(((q - c).astype(object) ** 2).sum()) for c in cents]

    cell_of = {i: int(np.argmin(dists(cvecs[i]))) for i in cids}
    min_rank = {}
    for qid in [i for i in cids if i % 20 == 1]:
        order = [c for _, c in sorted((dv, c) for c, dv in enumerate(dists(cvecs[qid])))]
        rank_of = {c: r + 1 for r, c in enumerate(order)}
        nq = float(np.sqrt(float((cvecs[qid].astype(float) ** 2).sum())))
        best = None
        for a in cids:
            if a == qid:
                continue
            na = float(np.sqrt(float((cvecs[a].astype(float) ** 2).sum())))
            cos = float(
                np.dot(cvecs[a].astype(float), cvecs[qid].astype(float))
            ) / (na * nq)
            if cos >= _SEM_TAU:
                r = rank_of[cell_of[a]]
                best = r if best is None else min(best, r)
        if best is not None:
            min_rank[qid] = best

    dup = len(min_rank)
    assert d["dup_bearing"] == dup
    assert d["sampled"] == len([i for i in cids if i % 20 == 1])
    curve, cum, want_np = {}, 0, None
    for rank in range(1, nc + 1):
        cum += sum(1 for r in min_rank.values() if r == rank)
        curve[rank] = round(cum / dup, 4)
        if want_np is None and cum >= 0.95 * dup:
            want_np = rank
    assert d["curve"] == curve
    assert d["nprobe"] == want_np


def test_probe_dial_full_target_reaches_full_probe_verdicts(split):
    """target_recall=1.0 must land an nprobe at which the SAMPLED
    dup-bearing queries are all caught; and the curve is a proper
    nondecreasing CDF ending at 1.0."""
    from presto_on_ray_spark.operators.similarity import (
        semantic_probe_dial,
    )

    corpus, _, _, _ = split
    d = semantic_probe_dial(corpus, target_recall=1.0)
    vals = [d["curve"][k] for k in sorted(d["curve"])]
    assert vals == sorted(vals) and vals[-1] == 1.0
    assert d["curve"][d["nprobe"]] == 1.0


def test_probe_dial_empty_sample_raises(spark, split):
    """An id space that misses the sample residue class must fail
    loudly — returning the default would let a rebuild persist an
    nprobe as if the recall target were measured."""
    from presto_on_ray_spark.operators.similarity import (
        semantic_probe_dial,
    )

    corpus, _, _, _ = split
    evens = corpus.withColumn("vec_id", F.col("vec_id") * 2)
    with pytest.raises(ValueError, match="residue class"):
        semantic_probe_dial(evens, sample_mod=2)


def test_probe_dial_leaves_caller_cents_cached(split):
    from presto_on_ray_spark.operators.similarity import (
        semantic_cells,
        semantic_probe_dial,
    )

    corpus, _, _, _ = split
    cents = semantic_cells(corpus).persist()
    cents.count()
    try:
        semantic_probe_dial(corpus, cents=cents)
        assert cents.storageLevel.useMemory  # not evicted by the dial
    finally:
        cents.unpersist()


def test_decontaminate_semantic_planted_copy(spark):
    """A train vector that is an exact copy of an eval vector must be
    flagged with that eval id; an orthogonal train vector must not."""
    from presto_on_ray_spark.operators.similarity import (
        semantic_ingest_verdicts,
    )

    # ten DISTINCT directions spread over the upper half-plane (a
    # colinear eval set would make every member match everything)
    import math as _math

    evals = []
    for i in range(10):
        a = _math.pi * (i + 0.5) / 10
        evals.append(
            (1000 + i, [int(1000 * _math.cos(a)), int(1000 * _math.sin(a))])
        )
    eval_set = spark.createDataFrame(
        evals, "vec_id long, qv array<bigint>"
    )
    copy_of = evals[3]
    train = spark.createDataFrame(
        [(1, [x * 3 for x in copy_of[1]]),   # same direction as eval 1003
         (2, [0, -1000])],                   # opposite half-plane: cos < 0
        "vec_id long, qv array<bigint>",
    )
    got = {
        r.vec_id: (not r.admit, r.dup_of)
        for r in semantic_ingest_verdicts(eval_set, train).collect()
    }
    assert got[1] == (True, copy_of[0])
    assert got[2] == (False, None)
