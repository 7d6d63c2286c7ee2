"""SemDeDup (similarity.semantic_dedup): NumPy brute-force twin over
the fixture plus the keeper-rule semantics pins."""

from __future__ import annotations

import numpy as np
import pytest

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.operators.similarity import (
    _SEM_CELLS,
    _SEM_TAU,
    quantized,
    semantic_dedup,
)
from pyspark.sql import functions as F


def _numpy_twin(q: np.ndarray, n_cells: int, tau: float):
    """Shared-code-free reference: integer-L2 assignment with
    smallest-cell ties, within-cell cosine, smallest-id dup_of."""
    cents = q[:n_cells]
    d2 = ((q[:, None, :].astype(object) - cents[None, :, :]) ** 2).sum(axis=2)
    # argmin with smallest-cell tie-break: np.argmin already takes the
    # first (= smallest) index on ties
    cell = np.argmin(d2, axis=1)
    norms = np.sqrt((q * q).sum(axis=1).astype(float))
    dup_of: dict[int, int] = {}
    for i in range(len(q)):
        for a in range(i):
            if cell[a] != cell[i]:
                continue
            cos = float(np.dot(q[a].astype(float), q[i].astype(float))) / (
                norms[a] * norms[i]
            )
            if cos >= tau:
                dup_of[i] = a
                break  # smallest a wins; ids scan ascending
    return cell, dup_of


@pytest.fixture(scope="module")
def fixture_result(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", quantized(F.col("embedding")).alias("qv"))
    rows = semantic_dedup(v).collect()
    qrows = v.orderBy("vec_id").collect()
    q = np.array([r.qv for r in qrows], dtype=np.int64)
    return rows, q


def test_numpy_twin_exact(fixture_result):
    rows, q = fixture_result
    cell, dup_of = _numpy_twin(q, _SEM_CELLS, _SEM_TAU)
    assert len(rows) == len(q)
    for r in rows:
        assert r.cell == cell[r.vec_id], r
        assert r.dup_of == dup_of.get(r.vec_id), r


def test_dedup_rate_meaningful(fixture_result):
    rows, _ = fixture_result
    n_dup = sum(1 for r in rows if r.dup_of is not None)
    # the fixture tau was chosen to exercise the pruning path
    assert 0 < n_dup < len(rows) // 2


def test_keeper_rule_invariants(fixture_result):
    """dup_of is a smaller id in the SAME cell; centroids' own sample
    ids can themselves be duplicates of earlier ones (no special
    casing)."""
    rows, _ = fixture_result
    cell_of = {r.vec_id: r.cell for r in rows}
    for r in rows:
        if r.dup_of is not None:
            assert r.dup_of < r.vec_id
            assert cell_of[r.dup_of] == r.cell


def test_chain_marks_by_nearest_earlier_not_component(spark):
    """a<b<c with cos(a,b)>=tau, cos(b,c)>=tau, cos(a,c)<tau: SemDeDup
    keeps only a (one representative per epsilon-ball), with c's
    dup_of pointing at b — NOT the connected-components union."""
    # 2-d plane embedded in the id space: one cell (single centroid).
    vecs = {
        0: [1000, 0],
        1: [866, 500],  # cos(0,1) ~ 0.866
        2: [500, 866],  # cos(1,2) ~ 0.866, cos(0,2) ~ 0.5
    }
    v = spark.createDataFrame(
        [(i, q) for i, q in vecs.items()], "vec_id long, qv array<long>"
    )
    got = {
        r.vec_id: r.dup_of
        for r in semantic_dedup(v, n_cells=1, tau=0.7).collect()
    }
    assert got == {0: None, 1: 0, 2: 1}


def _numpy_lloyd(q: np.ndarray, n_cells: int, iters: int):
    """Shared-code-free integer Lloyd twin (half-away-from-zero
    centroid division, smallest-cell tie-break, empty cells keep)."""
    cents = {c: q[c].astype(object).tolist() for c in range(n_cells)}
    for _ in range(iters):
        carr = np.array([cents[c] for c in sorted(cents)], dtype=object)
        d2 = ((q[:, None, :].astype(object) - carr[None, :, :]) ** 2).sum(axis=2)
        cell = np.argmin(d2, axis=1)
        new = dict(cents)
        for c in range(n_cells):
            members = q[cell == c]
            if len(members):
                sums = members.astype(object).sum(axis=0)
                n = len(members)
                new[c] = [
                    (abs(int(s)) * 2 + n) // (2 * n) * (1 if s >= 0 else -1)
                    for s in sums
                ]
        if new == cents:
            break
        cents = new
    return cents


def test_refine_cells_iters0_equals_sampled_and_twin_matches(spark, sf_dir):
    from presto_on_ray_spark.operators.similarity import refine_cells

    e = t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", quantized(F.col("embedding")).alias("qv"))
    sampled = {
        r.cell: list(r.cv) for r in refine_cells(v, iters=0).collect()
    }
    raw = {r.vec_id: list(r.qv) for r in v.filter("vec_id < 8").collect()}
    assert sampled == raw

    refined = {
        r.cell: list(r.cv) for r in refine_cells(v, iters=3).collect()
    }
    qrows = v.orderBy("vec_id").collect()
    q = np.array([r.qv for r in qrows], dtype=np.int64)
    twin = _numpy_lloyd(q, 8, 3)
    assert refined == {c: [int(x) for x in cv] for c, cv in twin.items()}
    assert refined != sampled  # the dial actually moves on the fixture


def test_refined_key_keeps_the_dup_rule(spark, sf_dir):
    """Refined cells change WHICH pairs share a cell, never the rule:
    every dup_of is a smaller-id same-cell member, and marked pairs
    really clear the tau threshold."""
    from presto_on_ray_spark import suite

    suite.load_all()
    rows = suite.QUERIES["dedup_semantic_refined"](spark, sf_dir).collect()
    cell_of = {r.vec_id: r.cell for r in rows}
    assert len(rows) == 500
    n_dup = 0
    for r in rows:
        if r.dup_of is not None:
            n_dup += 1
            assert r.dup_of < r.vec_id
            assert cell_of[r.dup_of] == r.cell
    assert 0 < n_dup < len(rows) // 2
