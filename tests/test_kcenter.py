"""k-center diversity seeds (similarity.kcenter_seeds): NumPy greedy
twin, radius monotonicity, and degenerate edges."""

from __future__ import annotations

import numpy as np

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.operators.similarity import kcenter_seeds, quantized
from pyspark.sql import functions as F


def _numpy_twin(q: np.ndarray, k: int):
    norms = (q.astype(object) ** 2).sum(axis=1)
    first = int(np.lexsort((np.arange(len(q)), -norms.astype(float)))[0])
    # lexsort tie-break is ascending index for equal -norm
    seeds = [(1, first, None)]
    chosen = {first}
    mind = ((q.astype(object) - q[first]) ** 2).sum(axis=1)
    for rank in range(2, k + 1):
        best, best_d = None, -1
        for i in range(len(q)):
            if i in chosen:
                continue
            if mind[i] > best_d:
                best, best_d = i, mind[i]
        seeds.append((rank, best, int(best_d)))
        chosen.add(best)
        d_new = ((q.astype(object) - q[best]) ** 2).sum(axis=1)
        mind = np.minimum(mind, d_new)
    return seeds


def test_numpy_twin_on_fixture(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", quantized(F.col("embedding")).alias("qv"))
    got = [(r.seed_rank, r.vec_id, r.mind) for r in kcenter_seeds(v, k=6).collect()]
    qrows = v.orderBy("vec_id").collect()
    q = np.array([r.qv for r in qrows], dtype=np.int64)
    assert got == _numpy_twin(q, 6)


def test_radii_non_increasing(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", quantized(F.col("embedding")).alias("qv"))
    radii = [
        r.mind for r in kcenter_seeds(v, k=5).orderBy("seed_rank").collect()
    ][1:]
    assert radii == sorted(radii, reverse=True)
    assert all(d > 0 for d in radii)


def test_duplicate_vectors_never_picked_while_distinct_remain(spark):
    rows = [
        (0, [0, 0]),
        (1, [0, 0]),     # duplicate of 0
        (2, [100, 0]),
        (3, [0, 100]),
        (4, [100, 100]),
    ]
    v = spark.createDataFrame(rows, "vec_id long, qv array<long>")
    got = kcenter_seeds(v, k=4).collect()
    picked = {r.vec_id for r in got}
    # 4 seeds among 4 distinct positions: the duplicate pair
    # contributes exactly one member
    assert not {0, 1} <= picked
    assert len(picked) == 4


def test_smallest_id_tie_break_on_first_seed(spark):
    rows = [(7, [10, 0]), (3, [0, 10]), (9, [10, 0])]  # equal max norms
    v = spark.createDataFrame(rows, "vec_id long, qv array<long>")
    first = kcenter_seeds(v, k=2).orderBy("seed_rank").collect()[0]
    assert first.vec_id == 3 or first.vec_id == 7
    # all three norms are equal (100): smallest id wins outright
    assert first.vec_id == 3


def test_k_exceeding_n_raises(spark):
    import pytest

    v = spark.createDataFrame(
        [(0, [1, 0]), (1, [0, 1])], "vec_id long, qv array<long>"
    )
    with pytest.raises(ValueError, match="exceeds the 2 available"):
        kcenter_seeds(v, k=3)
