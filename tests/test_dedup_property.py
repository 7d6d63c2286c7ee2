"""Property-based differential tests for the substring-dedup family:
random tiny corpora vs an independent pure-Python reference. The
Spark pipeline (digest window -> gaps-and-islands -> coverage /
cut) and the reference (brute-force window counting + set algebra)
share no code, so agreement pins the SEMANTICS, not the
implementation — the same strategy as the DuckDB oracles but over
adversarial corpora instead of fixtures."""

from __future__ import annotations

from collections import Counter

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from presto_on_ray_spark.caching import release_cached  # noqa: E402

W = 3  # small window so random corpora actually collide

# documents over a 3-word alphabet, 0..12 words each
_doc = st.lists(st.sampled_from(["a", "b", "c"]), max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=6)


def _py_reference(texts: list[str], w: int):
    """Brute force: corpus window counts, per-doc covered word
    positions (0-based), maximal dup-position runs, interval-union
    coverage, and the cut text."""
    wins: Counter = Counter()
    split = [t.split(" ") for t in texts]
    for ws in split:
        for i in range(len(ws) - w + 1):
            wins[" ".join(ws[i : i + w])] += 1
    out = []
    for ws in split:
        dup_pos = [
            i
            for i in range(len(ws) - w + 1)
            if wins[" ".join(ws[i : i + w])] >= 2
        ]
        covered: set[int] = set()
        for i in dup_pos:
            covered.update(range(i, i + w))
        runs = []
        for i in dup_pos:
            if runs and i == runs[-1][1] + 1:
                runs[-1][1] = i
            else:
                runs.append([i, i])
        out.append(
            {
                "n_spans": len(runs),
                "max_span_words": max((b - a + 1 + w - 1 for a, b in runs), default=0),
                "dup_span_words": len(covered),
                "clean": " ".join(
                    wd for j, wd in enumerate(ws) if j not in covered
                ),
            }
        )
    return out


@settings(
    max_examples=10,  # each example pays two Spark jobs (~3.5 s)
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus)
def test_spans_and_cut_match_python_reference(spark, texts):
    from presto_on_ray_spark.operators.dedup import (
        substring_cut,
        substring_dup_spans,
    )

    ref = _py_reference(texts, W)
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    spans = {
        r["doc_id"]: (r["n_spans"], r["max_span_words"], r["dup_span_words"])
        for r in substring_dup_spans(docs, W).collect()
    }
    cut = {r["doc_id"]: r["clean_text"] for r in substring_cut(docs, W).collect()}
    release_cached()  # drop this example's tracked persists
    for d, expect in enumerate(ref):
        if expect["n_spans"] == 0:
            assert d not in spans  # no-dup docs emit no spans row
        else:
            assert spans[d] == (
                expect["n_spans"],
                expect["max_span_words"],
                expect["dup_span_words"],
            ), (d, texts)
        assert cut[d] == expect["clean"], (d, texts)


def _py_ingest_reference(batch: list[str], base: list[str]):
    """Brute-force tier classification: exact = md5-equal text in
    base; else near = distinct-3-gram Jaccard >= 3/5 with >= 1 base
    doc (8c >= 3(na+nb) integer form); else new. Returns
    (status, n_base_matches) per batch doc."""

    def tri(t: str) -> frozenset:
        ws = t.split(" ")
        return frozenset(
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        )

    base_txt = Counter(base)
    base_tri = [tri(t) for t in base]
    out = []
    for t in batch:
        if base_txt[t]:
            out.append(("exact", base_txt[t]))
            continue
        sb = tri(t)
        if not sb:
            # a sub-3-word doc has NO shingles: the engine (and the
            # DuckDB oracle) produce no shingle rows for it, so it can
            # never reach the near tier — 0/0 Jaccard is 'new', not 1.
            out.append(("new", 0))
            continue
        m = sum(
            1
            for so in base_tri
            if 8 * len(sb & so) >= 3 * (len(sb) + len(so))
        )
        out.append(("near", m) if m else ("new", 0))
    return out


@settings(
    max_examples=8,  # each example pays two multi-join Spark jobs
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batch=st.lists(_doc, min_size=1, max_size=3),
    base=st.lists(_doc, min_size=1, max_size=4),
)
def test_incremental_ingest_matches_python_reference(spark, batch, base):
    from presto_on_ray_spark.operators.dedup import incremental_ingest_status

    ref = _py_ingest_reference(batch, base)
    bdf = spark.createDataFrame(
        list(enumerate(batch)), "doc_id int, text string"
    )
    odf = spark.createDataFrame(
        [(i + 1000, t) for i, t in enumerate(base)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["status"], r["n_base_matches"])
        for r in incremental_ingest_status(bdf, odf).collect()
    }
    release_cached()  # drop this example's tracked base index
    for d, expect in enumerate(ref):
        assert got[d] == expect, (d, batch, base)


@settings(
    max_examples=8,  # each example pays an index build + LSH classify
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batch=st.lists(_doc, min_size=1, max_size=3),
    base=st.lists(_doc, min_size=1, max_size=4),
)
def test_ingest_lsh_tier_precision_matches_python_reference(spark, batch, base):
    """The LSH candidate tier's one-sided contract, property-pinned:
    PRECISION is exact (the digest tier and the exact co-occurrence
    verification are shared with the prefix tier); only candidate
    recall is banding-bounded. So against the brute-force reference:
    exact verdicts are identical (digest-joined, band-independent),
    every 'near' the LSH tier reports is a true near whose match
    count never exceeds the true count, and a 'new' may under-ride
    only a true 'near' (a banding recall miss) — never an 'exact',
    and never the other way around (no invented matches)."""
    from presto_on_ray_spark.operators.dedup import (
        build_base_index,
        ingest_batch_lsh,
    )

    ref = _py_ingest_reference(batch, base)
    bdf = spark.createDataFrame(
        list(enumerate(batch)), "doc_id int, text string"
    )
    odf = spark.createDataFrame(
        [(i + 1000, t) for i, t in enumerate(base)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["status"], r["n_base_matches"])
        for r in ingest_batch_lsh(bdf, build_base_index(odf)).collect()
    }
    release_cached()  # drop this example's tracked base index
    for d, (r_status, r_n) in enumerate(ref):
        g_status, g_n = got[d]
        if r_status == "exact":
            assert (g_status, g_n) == (r_status, r_n), (d, batch, base)
        elif g_status == "near":
            assert r_status == "near" and 1 <= g_n <= r_n, (d, batch, base)
        else:
            assert g_status == "new" and g_n == 0, (d, batch, base)
            assert r_status in ("near", "new"), (d, batch, base)


@settings(
    max_examples=6,  # each example pays index build + merge + classify
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(_doc, min_size=1, max_size=3),
    admitted=st.lists(_doc, min_size=1, max_size=3),
    batch=st.lists(_doc, min_size=1, max_size=3),
)
def test_merge_classify_matches_python_reference(spark, base, admitted, batch):
    """The admit loop differential: build on base, merge_into_base_index
    the admitted docs (strict re-rank), classify the batch — must equal
    the brute-force Python reference over base + admitted. Pins the
    incremental maintenance semantics with code the pipeline shares
    nothing with (not even the rebuild path)."""
    from presto_on_ray_spark.operators.dedup import (
        build_base_index,
        ingest_batch,
        merge_into_base_index,
    )

    ref = _py_ingest_reference(batch, base + admitted)
    idx = build_base_index(
        spark.createDataFrame(
            [(i + 1000, t) for i, t in enumerate(base)], "doc_id int, text string"
        ),
        tracked=False,
    )
    merged = merge_into_base_index(
        idx,
        spark.createDataFrame(
            [(i + 2000, t) for i, t in enumerate(admitted)],
            "doc_id int, text string",
        ),
        tracked=False,
        eager=True,
    )
    try:
        got = {
            r["doc_id"]: (r["status"], r["n_base_matches"])
            for r in ingest_batch(
                spark.createDataFrame(
                    list(enumerate(batch)), "doc_id int, text string"
                ),
                merged,
            ).collect()
        }
    finally:
        idx.release()
        merged.release()
    release_cached()  # drop the classify call's tracked persists
    for d, expect in enumerate(ref):
        assert got[d] == expect, (d, batch, admitted, base)


@settings(
    max_examples=4,  # each example pays save + merge + compact + classify
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(_doc, min_size=1, max_size=3),
    admitted=st.lists(_doc, min_size=1, max_size=3),
    batch=st.lists(_doc, min_size=1, max_size=3),
)
def test_saved_lifecycle_matches_python_reference(spark, base, admitted, batch):
    """The full saved-index maintenance lifecycle under random
    corpora: save(build(base)) -> STALE merge_into_saved_index of the
    admitted docs -> compact_saved_index -> classify the batch from
    the loaded index. Must equal the brute-force Python reference
    over base + admitted — pinning that compaction restores exact
    near-tier semantics after the stale policy's rank drift, with
    code the pipeline shares nothing with."""
    import shutil
    import tempfile

    from presto_on_ray_spark.operators.dedup import (
        build_base_index,
        compact_saved_index,
        ingest_batch,
        load_base_index,
        merge_into_saved_index,
        save_base_index,
    )

    ref = _py_ingest_reference(batch, base + admitted)
    p = tempfile.mkdtemp(prefix="bidx_prop_")
    try:
        idx = build_base_index(
            spark.createDataFrame(
                [(i + 1000, t) for i, t in enumerate(base)],
                "doc_id int, text string",
            ),
            tracked=False,
        )
        save_base_index(idx, p)
        idx.release()
        merge_into_saved_index(
            spark,
            p,
            spark.createDataFrame(
                [(i + 2000, t) for i, t in enumerate(admitted)],
                "doc_id int, text string",
            ),
            rerank=False,
        )
        compact_saved_index(spark, p)
        got = {
            r["doc_id"]: (r["status"], r["n_base_matches"])
            for r in ingest_batch(
                spark.createDataFrame(
                    list(enumerate(batch)), "doc_id int, text string"
                ),
                load_base_index(spark, p),
            ).collect()
        }
    finally:
        shutil.rmtree(p, ignore_errors=True)
        release_cached()  # drop this example's tracked persists even
        # when the lifecycle raised mid-example
    for d, expect in enumerate(ref):
        assert got[d] == expect, (d, batch, admitted, base)
