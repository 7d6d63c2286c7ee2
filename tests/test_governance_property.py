"""Property-based differentials for the governance tier: random tiny
inputs vs the shared-code-free Python references (the
test_dedup_property strategy — semantics pinned over adversarial
inputs, not just fixtures)."""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from presto_on_ray_spark.caching import release_cached  # noqa: E402
from tests.test_boilerplate import _brute as _bp_brute  # noqa: E402
from tests.test_boilerplate import _no_persist  # noqa: E402
from tests.test_drift import _brute as _psi_brute  # noqa: E402

# short docs over a 3-word alphabet with a 2-word block size: random
# corpora collide constantly, exercising cut/keep/partial-tail paths
_doc = st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=9).map(
    " ".join
)
_corpus = st.lists(_doc, min_size=1, max_size=6)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus)
def test_boilerplate_strip_matches_python_reference(spark, texts):
    from presto_on_ray_spark.operators.pipeline_prep import boilerplate_strip

    docs = dict(enumerate(texts))
    df = spark.createDataFrame(
        [(int(i), t) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_cut_segments, r.clean_text)
        for r in boilerplate_strip(df, w=2, max_df=1, keep=_no_persist).collect()
    }
    release_cached()
    assert got == _bp_brute(docs, 2, 1), texts


_vals = st.lists(
    st.tuples(st.sampled_from(["s0", "s1"]), st.integers(-40, 120)),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ref=_vals, cur=_vals)
def test_distribution_drift_matches_python_reference(spark, ref, cur):
    from presto_on_ray_spark.operators.drift import distribution_drift

    rdf = spark.createDataFrame(ref, "source string, val long")
    cdf = spark.createDataFrame(cur, "source string, val long")
    got = {
        r.source: (r.n_ref, r.n_cur, r.n_bins, r.psi)
        for r in distribution_drift(rdf, cdf, 32).collect()
    }
    release_cached()
    want = _psi_brute(ref, cur, 32)
    # the Python reference covers groups present on either side; the
    # engine only emits groups with at least one aligned bin row —
    # identical sets by construction (every row makes a bin)
    assert got == want, (ref, cur)
