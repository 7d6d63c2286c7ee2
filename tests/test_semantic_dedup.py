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
