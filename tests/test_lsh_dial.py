"""Recall-bounded LSH dial (VERDICT r12 #1): the S-curve math pinned
against brute-force probability, the dial's minimality/feasibility
properties, the signature prefix-stream property the fixture-oracle
superset argument rests on, and the dialed pipeline's fixture recall.
"""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F
import pytest

from presto_on_ray_spark import suite
from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.operators.dedup import (
    _LSH_TARGET_RECALL,
    _MERSENNE_P,
    _NUM_HASHES,
    _perm_params,
    dedup_lsh_keepers_bounded,
    dedup_minhash_lsh,
    dedup_neardup_adaptive,
    dedup_neardup_clusters,
    dedup_ngram_jaccard,
    lsh_candidate_prob,
    lsh_candidates,
    lsh_dial,
    lsh_min_bands,
    minhash_signature,
    shingles,
)

suite.load_all()


# -- S-curve math vs brute force (pure python, no Spark) ----------------


def test_scurve_matches_band_outcome_enumeration():
    """1-(1-s^r)^b equals the exhaustive sum over all 2^b band-outcome
    vectors of P(outcome) x [any band matched] — the independence
    model spelled out rather than factored."""
    for s in (0.2, 0.5, 0.6, 0.9):
        for r in (1, 2, 4):
            for b in (1, 2, 3, 5):
                q = s**r
                brute = 0.0
                for mask in range(1, 1 << b):
                    n_hit = bin(mask).count("1")
                    brute += q**n_hit * (1 - q) ** (b - n_hit)
                assert math.isclose(
                    brute, lsh_candidate_prob(s, b, r), rel_tol=1e-12
                )


def _py_minhash(items: set[int], n: int) -> list[int]:
    """Pure-python twin of minhash_signature's permutation stream."""
    sig = [_MERSENNE_P] * n
    for x in items:
        h = x % _MERSENNE_P
        for i in range(n):
            a, b = _perm_params(i)
            v = (h * a + b) % _MERSENNE_P
            if v < sig[i]:
                sig[i] = v
    return sig


def test_scurve_matches_monte_carlo_minhash():
    """Empirical candidate rate of REAL minhash banding over random
    set pairs with controlled Jaccard tracks the closed form — the
    independence assumption validated against the actual permutation
    machinery, not just its own algebra. Deterministic seed; binomial
    3-sigma tolerance."""
    rng = random.Random(13)
    for s, b, r in ((0.5, 4, 2), (0.6, 8, 4), (0.3, 4, 2)):
        # |A∩B| = c, |A∪B| = u with c/u = s: u=40, c=round(40s)
        u, c = 40, round(40 * s)
        trials, hits = 400, 0
        for _ in range(trials):
            pool = rng.sample(range(1, 1 << 48), u)
            shared, only = pool[:c], pool[c:]
            half = (u - c) // 2
            sa = set(shared) | set(only[:half])
            sb = set(shared) | set(only[half:])
            # true jaccard == s by construction
            assert math.isclose(
                len(sa & sb) / len(sa | sb), s, abs_tol=0.02
            )
            siga, sigb = _py_minhash(sa, b * r), _py_minhash(sb, b * r)
            for band in range(b):
                if siga[band * r : (band + 1) * r] == sigb[band * r : (band + 1) * r]:
                    hits += 1
                    break
        p = lsh_candidate_prob(s, b, r)
        sigma = math.sqrt(p * (1 - p) / trials)
        assert abs(hits / trials - p) < 3 * sigma + 0.01


def test_min_bands_is_minimal():
    for j in (0.5, 0.6, 0.8):
        for r in (1, 2, 3, 4, 5):
            for target in (0.9, 0.95, 0.98, 0.99):
                b = lsh_min_bands(j, r, target)
                assert lsh_candidate_prob(j, b, r) >= target
                if b > 1:
                    assert lsh_candidate_prob(j, b - 1, r) < target


def test_min_bands_matches_brute_force_search():
    for j in (0.4, 0.6, 0.75):
        for r in (2, 3, 4):
            for target in (0.9, 0.98):
                brute = next(
                    b for b in range(1, 10_000)
                    if lsh_candidate_prob(j, b, r) >= target
                )
                assert lsh_min_bands(j, r, target) == brute


def test_dial_default_is_29x4_and_meets_bound():
    b, r = lsh_dial()
    assert (b, r) == (29, 4)
    assert b * r <= 128
    assert lsh_candidate_prob(0.6, b, r) >= _LSH_TARGET_RECALL
    # minimality in b at the chosen r
    assert lsh_candidate_prob(0.6, b - 1, r) < _LSH_TARGET_RECALL


def test_dial_picks_largest_feasible_r():
    """r+1's minimal band count must overflow the budget — the dial's
    'fewest false candidates within the signature budget' rule."""
    for j, target, budget in ((0.6, 0.98, 128), (0.6, 0.9, 64), (0.8, 0.99, 128)):
        b, r = lsh_dial(j, target, budget)
        assert b * r <= budget
        assert lsh_candidate_prob(j, b, r) >= target
        assert lsh_min_bands(j, r + 1, target) * (r + 1) > budget
        # and false-candidate rate at sub-threshold s is no worse than
        # any feasible smaller-r dial's
        s_low = j / 2
        for r2 in range(1, r):
            b2 = lsh_min_bands(j, r2, target)
            if b2 * r2 <= budget:
                assert lsh_candidate_prob(s_low, b, r) <= lsh_candidate_prob(
                    s_low, b2, r2
                ) + 1e-12


def test_dial_infeasible_raises():
    with pytest.raises(ValueError, match="no .bands, rows."):
        lsh_dial(0.6, 0.999999, 4)
    with pytest.raises(ValueError, match="not in"):
        lsh_min_bands(0.0, 4, 0.9)
    with pytest.raises(ValueError, match="not in"):
        lsh_min_bands(0.6, 4, 1.0)


# -- Spark-side: prefix stream, superset, fixture recall ----------------


def test_signature_prefix_property(spark, sf_dir):
    """A 116-lane signature's first 32 lanes are bit-identical to the
    default 32-lane signature — the permutation-stream property the
    dialed-superset oracle argument rests on."""
    d = t(spark, sf_dir, "documents").limit(50)
    both = d.select(
        minhash_signature(shingles(F.col("text"))).alias("s32"),
        minhash_signature(shingles(F.col("text")), 116).alias("s116"),
    )
    bad = both.filter(
        F.slice(F.col("s116"), 1, _NUM_HASHES) != F.col("s32")
    ).count()
    assert bad == 0


def test_dialed_candidates_superset_of_frozen(spark, sf_dir):
    frozen = dedup_minhash_lsh(spark, sf_dir)
    b, r = lsh_dial()
    dialed = lsh_candidates(t(spark, sf_dir, "documents"), b, r)
    assert frozen.exceptAll(dialed).count() == 0


def test_dialed_candidates_cover_all_true_pairs(spark, sf_dir):
    """Fixture recall 1.0 — the oracle precondition for
    dedup_lsh_keepers_bounded, measured not argued."""
    true_pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    b, r = lsh_dial()
    dialed = lsh_candidates(t(spark, sf_dir, "documents"), b, r)
    assert true_pairs.exceptAll(dialed).count() == 0


def test_bounded_keepers_equal_exact_keepers(spark, sf_dir):
    exact = dedup_neardup_clusters(spark, sf_dir)
    bounded = dedup_lsh_keepers_bounded(spark, sf_dir)
    assert exact.exceptAll(bounded).count() == 0
    assert bounded.exceptAll(exact).count() == 0


def test_adaptive_threads_target_recall(spark, sf_dir):
    """The kwarg is accepted and fixture dispatch (exact tier) is
    invariant to it."""
    a = dedup_neardup_adaptive(spark, sf_dir)
    b = dedup_neardup_adaptive(spark, sf_dir, target_recall=0.999)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
