"""Round-14 SCALING measurements: (1) recall@4 of the full-auto
IVF-PQ dials vs the fixed 8/3 dials at the sf rungs, against the true
quantized-cosine top-4; (2) SemDeDup within-cell pair work (sum of
cell-pop^2) fixed vs auto cells; (3) filtered-ANN recall across
selectivities under the adaptive nprobe vs pinned nprobe=3.

Run: python scripts/measure_r14.py /root/testdata/sf0.1 [.scale/sf1]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from presto_on_ray_spark.session import get_spark  # noqa: E402
from presto_on_ray_spark.caching import release_cached  # noqa: E402
from presto_on_ray_spark.operators._util import t  # noqa: E402
from presto_on_ray_spark.operators.similarity import (  # noqa: E402
    _IVFPQ_CELLS,
    _IVFPQ_NPROBE,
    auto_ivf_cells,
    auto_ivf_nprobe,
    dedup_semantic_auto_cells,
    ivfpq_filtered_topk,
    ivfpq_rerank_topk,
    quantized,
)
from presto_on_ray_spark.operators.similarity import dedup_semantic  # noqa: E402


def _truth(vecs, ids, qids, passing=None, k=4):
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    out = {}
    idx = {int(v): i for i, v in enumerate(ids)}
    for q in qids:
        qi = idx[q]
        cos = (vecs @ vecs[qi]) / (norms * norms[qi])
        cand = [
            int(v) for v in ids
            if int(v) != q and (passing is None or int(v) in passing)
        ]
        cand.sort(key=lambda c: (-cos[idx[c]], c))
        out[q] = set(cand[:k])
    return out


def main() -> None:
    spark = get_spark(app_name="measure-r14")
    spark.sparkContext.setLogLevel("ERROR")
    from tests.test_similarity import _quantized_vecs  # reuse the twin

    for sf_dir in sys.argv[1:]:
        e = t(spark, sf_dir, "embeddings")
        rows = e.select("vec_id", "embedding").collect()
        ids, vecs = _quantized_vecs(rows)
        n = len(ids)
        qids = list(range(5))
        truth = _truth(vecs, ids, qids)

        def recall(df):
            got = {}
            for r in df.collect():
                got.setdefault(r["qid"], set()).add(r["cid"])
            hits = sum(len(got.get(q, set()) & truth[q]) for q in qids)
            return hits / (4 * len(qids))

        nc = auto_ivf_cells(n)
        sl = max(64, math.ceil(0.03 * n))
        np_ = auto_ivf_nprobe(n, nc, sl)
        t0 = time.time()
        r_auto = recall(ivfpq_rerank_topk(spark, sf_dir))
        t_auto = round(time.time() - t0, 1)
        release_cached()
        t0 = time.time()
        r_fixed = recall(
            ivfpq_rerank_topk(
                spark, sf_dir, n_cells=_IVFPQ_CELLS, nprobe=_IVFPQ_NPROBE,
                shortlist=64,
            )
        )
        t_fixed = round(time.time() - t0, 1)
        release_cached()
        print(json.dumps({
            "measure": "ivfpq_auto_vs_fixed", "sf_dir": sf_dir, "n": n,
            "auto_dials": {"n_cells": nc, "nprobe": np_, "shortlist": sl},
            "recall4_auto": r_auto, "recall4_fixed_8_3_64": r_fixed,
            "sec_auto": t_auto, "sec_fixed": t_fixed,
        }))

        def pair_work(df):
            pops = [
                r["p"]
                for r in df.groupBy("cell").agg(F.count("*").alias("p")).collect()
            ]
            return sum(p * p for p in pops)

        pw_fixed = pair_work(dedup_semantic(spark, sf_dir))
        release_cached()
        pw_auto = pair_work(dedup_semantic_auto_cells(spark, sf_dir))
        release_cached()
        print(json.dumps({
            "measure": "semdedup_pair_work", "sf_dir": sf_dir, "n": n,
            "auto_cells": auto_ivf_cells(n, 8),
            "pairwork_fixed8": pw_fixed, "pairwork_auto": pw_auto,
            "ratio": round(pw_fixed / max(pw_auto, 1), 2),
        }))

        for mod in (10, 100, 500):
            passing = {int(v) for v in ids if v % mod == 7}
            ptruth = _truth(vecs, ids, qids, passing=passing)

            def frecall(df):
                got = {}
                for r in df.collect():
                    got.setdefault(r["qid"], set()).add(r["cid"])
                denom = sum(min(4, len(ptruth[q])) for q in qids)
                hits = sum(len(got.get(q, set()) & ptruth[q]) for q in qids)
                return round(hits / max(denom, 1), 3)

            pred = (F.col("vec_id") % mod) == 7
            r_adapt = frecall(ivfpq_filtered_topk(spark, sf_dir, pred))
            release_cached()
            r_pin3 = frecall(
                ivfpq_filtered_topk(spark, sf_dir, pred, nprobe=_IVFPQ_NPROBE)
            )
            release_cached()
            print(json.dumps({
                "measure": "filtered_adaptive_sweep", "sf_dir": sf_dir,
                "selectivity_mod": mod, "n_passing": len(passing),
                "recall_adaptive": r_adapt, "recall_nprobe3": r_pin3,
            }))
    spark.stop()


if __name__ == "__main__":
    main()
