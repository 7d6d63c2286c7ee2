"""BM25 retrieval (textstats.bm25_topk): pure-Python reference twin
on a synthetic corpus plus ranking-semantics pins."""

from __future__ import annotations

import math
from decimal import Decimal

from presto_on_ray_spark.operators.textstats import bm25_topk


def _brute(docs: dict[int, str], queries: list[tuple[int, str]], topk: int):
    toks = {d: [w for w in s.split(" ") if w] for d, s in docs.items()}
    toks = {d: ws for d, ws in toks.items() if ws}
    n = len(toks)
    avgdl = sum(len(ws) for ws in toks.values()) / n
    df: dict[str, int] = {}
    for ws in toks.values():
        for term in set(ws):
            df[term] = df.get(term, 0) + 1
    scores: dict[tuple[int, int], Decimal] = {}
    for qid, term in queries:
        if term not in df:
            continue
        idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
        for d, ws in toks.items():
            tf = ws.count(term)
            if not tf:
                continue
            comp = round(
                idf * ((tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * len(ws) / avgdl))),
                4,
            )
            scores[(qid, d)] = scores.get((qid, d), Decimal(0)) + Decimal(
                f"{comp:.4f}"
            )
    out = {}
    by_qid: dict[int, list] = {}
    for (qid, d), s in scores.items():
        by_qid.setdefault(qid, []).append((-s, d))
    for qid, lst in by_qid.items():
        for rank, (neg, d) in enumerate(sorted(lst)):
            if rank < topk:
                out[(qid, d)] = float(-neg)
    return out


def test_python_twin(spark):
    docs = {
        0: "apple banana apple cherry",
        1: "banana banana date",
        2: "apple cherry cherry cherry date",
        3: "elder fig grape",
        4: "apple",
    }
    queries = [(0, "apple"), (0, "date"), (1, "banana"), (2, "missing")]
    docs_df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    q_df = spark.createDataFrame(queries, "qid long, term string")
    got = {(r.qid, r.doc_id): r.score for r in bm25_topk(docs_df, q_df).collect()}
    assert got == _brute(docs, queries, 10)
    # qid 2's only term is absent from the corpus: no rows
    assert not [k for k in got if k[0] == 2]


def test_topk_truncation_and_tiebreak(spark):
    # ten identical docs → identical scores; top-3 must keep the three
    # SMALLEST doc_ids (deterministic tie-break)
    docs_df = spark.createDataFrame(
        [(i, "same words here") for i in range(10)], "doc_id long, text string"
    )
    q_df = spark.createDataFrame([(0, "same")], "qid long, term string")
    got = sorted(r.doc_id for r in bm25_topk(docs_df, q_df, topk=3).collect())
    assert got == [0, 1, 2]


def test_tf_saturation_beats_linear_growth(spark):
    # BM25's tf term saturates: 10 repeats must score < 10x one repeat
    docs_df = spark.createDataFrame(
        [(0, " ".join(["term"] * 10) + " pad pad pad"), (1, "term pad pad pad")],
        "doc_id long, text string",
    )
    q_df = spark.createDataFrame([(0, "term")], "qid long, term string")
    got = {r.doc_id: r.score for r in bm25_topk(docs_df, q_df).collect()}
    assert got[0] > got[1]
    assert got[0] < 10 * got[1]


def test_duplicate_query_rows_do_not_double_count(spark):
    docs_df = spark.createDataFrame(
        [(0, "apple pie"), (1, "apple apple tart")], "doc_id long, text string"
    )
    q_once = spark.createDataFrame([(0, "apple")], "qid long, term string")
    q_dup = spark.createDataFrame(
        [(0, "apple"), (0, "apple")], "qid long, term string"
    )
    once = {(r.qid, r.doc_id): r.score for r in bm25_topk(docs_df, q_once).collect()}
    dup = {(r.qid, r.doc_id): r.score for r in bm25_topk(docs_df, q_dup).collect()}
    assert once == dup
