"""Content-defined chunking (pipeline_prep.content_defined_chunks):
reconstruction, boundary determinism, and the edit-locality property
that is CDC's whole reason to exist."""

from __future__ import annotations

import hashlib

from presto_on_ray_spark.operators.pipeline_prep import content_defined_chunks


def _no_persist(df):
    return df


def _run(spark, docs: dict[int, str]):
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    rows = content_defined_chunks(df, keep=_no_persist).collect()
    out: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_id)):
        out.setdefault(r.doc_id, []).append((r.chunk_id, r.n_words, r.chunk_md5))
    return out


def _py_chunks(text: str, g: int = 3, d: int = 16):
    ws = text.split(" ")
    bnd = []
    for p in range(1, len(ws) + 1):
        if p >= g:
            seg = " ".join(ws[p - g : p])
            h = int(hashlib.md5(seg.encode()).hexdigest()[:15], 16)
            bnd.append(1 if h % d == 0 else 0)
        else:
            bnd.append(0)
    chunks, start = [], 0
    for p in range(1, len(ws) + 1):
        if bnd[p - 1] == 1 or p == len(ws):
            chunks.append(ws[start:p])
            start = p
    # a trailing boundary at the last word already closed the chunk
    if start < len(ws):
        chunks.append(ws[start:])
    return [
        (i, len(c), hashlib.md5(" ".join(c).encode()).hexdigest())
        for i, c in enumerate(c for c in chunks if c)
    ]


def test_python_twin_and_reconstruction(spark):
    docs = {
        0: "a b c d e f g h i j k l m n o p q r s t u v w x y z",
        1: "one",
        2: "x " * 39 + "x",  # 40 identical words
    }
    docs = {k: v.strip() for k, v in docs.items()}
    got = _run(spark, docs)
    for did, text in docs.items():
        assert got[did] == _py_chunks(text), did
        # chunk word counts partition the document exactly
        assert sum(n for _, n, _ in got[did]) == len(text.split(" "))
        assert [c for c, _, _ in got[did]] == list(range(len(got[did])))


def test_edit_locality_appending_preserves_earlier_chunks(spark):
    base_text = " ".join(f"w{i}" for i in range(60))
    edited = base_text + " extra tail words added"
    got = _run(spark, {0: base_text, 1: edited})
    base_chunks, edited_chunks = got[0], got[1]
    # every base chunk except possibly the LAST keeps its exact hash
    # and position in the edited document
    for (c0, n0, h0), (c1, n1, h1) in zip(base_chunks[:-1], edited_chunks):
        assert (c0, n0, h0) == (c1, n1, h1)


def test_prepend_only_disturbs_a_bounded_prefix(spark):
    base_text = " ".join(f"w{i}" for i in range(60))
    edited = "inserted words here " + base_text
    got = _run(spark, {0: base_text, 1: edited})
    base_hashes = [h for _, _, h in got[0]]
    edited_hashes = [h for _, _, h in got[1]]
    # the SUFFIX of chunk hashes re-synchronizes: all but the first
    # few base chunks reappear verbatim in the edited doc
    assert len(base_hashes) >= 3
    tail = base_hashes[1:]
    # the tail appears as a contiguous subsequence of edited hashes
    joined_e, joined_t = "|".join(edited_hashes), "|".join(tail)
    assert joined_t in joined_e
