"""Distribution drift (drift.distribution_drift): identical-snapshot
zero, planted-shift detection, smoothing edges, and a Python twin."""

from __future__ import annotations

import math
from decimal import Decimal

from presto_on_ray_spark.operators.drift import distribution_drift


def _df(spark, rows):
    return spark.createDataFrame(rows, "source string, val long")


def _brute(ref, cur, width):
    bins = lambda rows: {  # noqa: E731
        (g, v // width) for g, v in rows
    }
    cnt = lambda rows: {  # noqa: E731
        k: sum(1 for g, v in rows if (g, v // width) == k)
        for k in bins(rows)
    }
    rc, cc = cnt(ref), cnt(cur)
    out = {}
    for grp in {g for g, _ in ref} | {g for g, _ in cur}:
        keys = {k for k in set(rc) | set(cc) if k[0] == grp}
        b = len(keys)
        rt = sum(rc.get(k, 0) for k in keys)
        ct = sum(cc.get(k, 0) for k in keys)
        psi = Decimal(0)
        for k in keys:
            pr = (rc.get(k, 0) + 1) / float(rt + b)
            pc = (cc.get(k, 0) + 1) / float(ct + b)
            psi += Decimal(f"{round((pc - pr) * math.log(pc / pr), 6):.6f}")
        out[grp] = (rt, ct, b, float(psi))
    return out


def test_identical_snapshots_are_exactly_zero(spark):
    rows = [("a", v) for v in (1, 5, 70, 130, 130, 260)]
    got = distribution_drift(_df(spark, rows), _df(spark, rows), 64).collect()
    assert [(r.n_bins, r.psi) for r in got] == [(4, 0.0)]


def test_planted_shift_dominates_null_noise(spark):
    # reference centered low, current shifted up by 4 bins
    ref = [("a", 10 + (i % 3)) for i in range(200)]
    cur = [("a", 266 + (i % 3)) for i in range(200)]
    same = [("b", 10 + (i % 3)) for i in range(200)]
    got = {
        r.source: r.psi
        for r in distribution_drift(
            _df(spark, ref + same), _df(spark, cur + same), 64
        ).collect()
    }
    assert got["b"] == 0.0
    assert got["a"] > 1.0  # disjoint supports → PSI far beyond the 0.25 action band


def test_bins_absent_from_one_side_are_smoothed_not_dropped(spark):
    ref = [("a", 1), ("a", 2), ("a", 100)]
    cur = [("a", 1), ("a", 2), ("a", 2)]  # bin 1 empty on the current side
    rows = distribution_drift(_df(spark, ref), _df(spark, cur), 64).collect()
    assert rows[0].n_bins == 2  # union of both sides' bins
    assert rows[0].psi > 0.0  # the missing bin contributes, smoothed


def test_python_twin(spark):
    import random

    rng = random.Random(3)
    ref = [(f"s{rng.randrange(3)}", rng.randrange(500)) for _ in range(300)]
    cur = [(f"s{rng.randrange(3)}", rng.randrange(500)) for _ in range(280)]
    got = {
        r.source: (r.n_ref, r.n_cur, r.n_bins, r.psi)
        for r in distribution_drift(_df(spark, ref), _df(spark, cur), 64).collect()
    }
    assert got == _brute(ref, cur, 64)


def test_negative_values_bin_identically_to_floor_semantics(spark):
    # -1 must land in bin -1 (floor), never bin 0 (truncation): the
    # oracle's // floors, so the Spark side must too
    ref = [("a", -1), ("a", -64), ("a", 0), ("a", 63)]
    got = distribution_drift(_df(spark, ref), _df(spark, ref), 64).collect()
    assert got[0].n_bins == 2  # {-1: [-64..-1], 0: [0..63]}
    assert got[0].psi == 0.0


# ---------------------------------------------------------------------------
# Embedding-space drift (drift.semantic_drift_psi): frozen-cell PSI.
# ---------------------------------------------------------------------------
def _vdf(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, qv array<bigint>, source string")


def test_semantic_identical_snapshots_are_exactly_zero(spark):
    rows = [
        (i, [1000 + 10 * (i % 4), -500 + 7 * (i % 5)], "a") for i in range(40)
    ]
    from presto_on_ray_spark.operators.drift import semantic_drift_psi

    got = semantic_drift_psi(_vdf(spark, rows), _vdf(spark, rows)).collect()
    assert [(r.n_ref, r.n_cur, r.psi) for r in got] == [(40, 40, 0.0)]


def test_semantic_planted_shift_dominates_stable_group(spark):
    """Group "a"'s current snapshot flips to the opposite half-space
    (every vector lands in different frozen cells); group "b" is
    unchanged. PSI must flag a and stay zero on b — the semantic shift
    is invisible to any scalar feature of the vectors' norms."""
    from presto_on_ray_spark.operators.drift import semantic_drift_psi

    a_ref = [(i, [1000 + i, 500 + 2 * i], "a") for i in range(50)]
    a_cur = [(1000 + i, [-1000 - i, -500 - 2 * i], "a") for i in range(50)]
    b = [(100 + i, [800, -300 + (i % 3)], "b") for i in range(50)]
    b_cur = [(1100 + i, [800, -300 + (i % 3)], "b") for i in range(50)]
    got = {
        r.source: r.psi
        for r in semantic_drift_psi(
            _vdf(spark, a_ref + b), _vdf(spark, a_cur + b_cur)
        ).collect()
    }
    assert got["b"] == 0.0
    assert got["a"] > 0.25  # beyond the action band


def test_semantic_explicit_cents_equal_default_derivation(spark):
    from presto_on_ray_spark.operators.drift import semantic_drift_psi
    from presto_on_ray_spark.operators.similarity import semantic_cells

    rows = [
        (i, [100 * (i % 7) - 300, 50 * (i % 3)], "a") for i in range(60)
    ]
    ref, cur = _vdf(spark, rows[:40]), _vdf(spark, rows[40:])
    default = semantic_drift_psi(ref, cur).collect()
    pinned = semantic_drift_psi(
        ref, cur, cents=semantic_cells(ref.select("vec_id", "qv"))
    ).collect()
    assert default == pinned
