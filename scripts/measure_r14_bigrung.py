"""Round-14 big-rung measurement (embeddings-only .scale dir): the
auto IVF-PQ dials and the SemDeDup cell layout at n = 200k (100x the
sf0.1 fixture) — one more decade of evidence that the sqrt-n formulas
hold. Recall truth comes from a NumPy replay over the quantized
vectors (Arrow toPandas — ~100 MB at 200k x 64); SemDeDup pair work is
computed from the CELL ASSIGNMENT populations only (sum of pop^2 — the
algorithm's cost model), because actually executing the fixed-8
within-cell join at 200k would be ~5G candidate pairs, which is the
point of the dial.

Run: python scripts/measure_r14_bigrung.py .scale/sf10e
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

from presto_on_ray_spark.caching import release_cached  # noqa: E402
from presto_on_ray_spark.operators._util import t  # noqa: E402
from presto_on_ray_spark.operators.similarity import (  # noqa: E402
    _IVFPQ_CELLS,
    _IVFPQ_NPROBE,
    _cell_assign,
    auto_ivf_cells,
    auto_ivf_nprobe,
    ivfpq_rerank_topk,
    quantized,
)
from presto_on_ray_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    spark = get_spark(app_name="measure-r14-bigrung")
    spark.sparkContext.setLogLevel("ERROR")
    e = t(spark, sf_dir, "embeddings")
    pdf = e.select("vec_id", "embedding").toPandas()
    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    raw = np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * 1000
    mag = np.abs(raw)
    f = np.floor(mag)
    vecs = (np.sign(raw) * (f + (mag - f >= 0.5))).astype(np.int64)
    ids = pdf["vec_id"].to_numpy()
    assert (ids == np.arange(len(ids))).all()
    n = len(ids)
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    qids = list(range(5))
    truth = {}
    for q in qids:
        cos = (vecs @ vecs[q]) / (norms * norms[q])
        cos[q] = -2  # exclude self
        order = np.lexsort((np.arange(n), -cos))
        truth[q] = set(int(i) for i in order[:4])

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["qid"], set()).add(r["cid"])
        return sum(len(got.get(q, set()) & truth[q]) for q in qids) / (4 * len(qids))

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
            spark, sf_dir, n_cells=_IVFPQ_CELLS, nprobe=_IVFPQ_NPROBE, shortlist=64
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

    v = e.select("vec_id", quantized(F.col("embedding")).alias("qv"))

    def pair_work(cells: int) -> int:
        cents = v.filter(F.col("vec_id") < cells).select(
            F.col("vec_id").alias("cell"), F.col("qv").alias("cv")
        )
        pops = [
            r["p"]
            for r in _cell_assign(v, cents)
            .groupBy("cell").agg(F.count("*").alias("p")).collect()
        ]
        release_cached()
        return sum(p * p for p in pops)

    pw_fixed = pair_work(_IVFPQ_CELLS)
    pw_auto = pair_work(auto_ivf_cells(n, 8))
    print(json.dumps({
        "measure": "semdedup_pair_work_from_assignment", "sf_dir": sf_dir,
        "n": n, "auto_cells": auto_ivf_cells(n, 8),
        "pairwork_fixed8": pw_fixed, "pairwork_auto": pw_auto,
        "ratio": round(pw_fixed / max(pw_auto, 1), 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
