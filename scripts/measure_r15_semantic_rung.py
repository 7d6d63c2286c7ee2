"""Round-15 big-rung measurement for the semantic ingest tier: at
n = 200k (the embeddings-only .scale dir, 100x the sf0.1 fixture),
how tight is the probed-cell candidate bound and what duplicate
recall does the nprobe=2 probe keep vs the full-probe (= corpus-wide)
rule? The full-probe truth comes from a NumPy replay over the
quantized vectors (Arrow toPandas), scored only for the batch rows —
the all-pairs Spark join at 200k x 50k would be 8G candidate pairs,
which is the point of the bound.

Run: python scripts/measure_r15_semantic_rung.py .scale/sf10e
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from presto_on_ray_spark.operators._util import t  # noqa: E402
from presto_on_ray_spark.operators.similarity import (  # noqa: E402
    _SEM_TAU,
    auto_ivf_cells,
    quantized,
    semantic_cells,
    semantic_ingest_verdicts,
)
from presto_on_ray_spark.session import get_spark  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark(
        app_name="r15-semantic-rung", master="local[16]",
        shuffle_partitions=16,
    )
    spark.sparkContext.setLogLevel("ERROR")
    e = t(spark, sf_dir, "embeddings")
    v = e.select("vec_id", quantized(F.col("embedding")).alias("qv"))
    corpus = v.filter(F.col("vec_id") % 5 != 0).persist()
    batch = v.filter(F.col("vec_id") % 5 == 0).persist()
    n_corpus, n_batch = corpus.count(), batch.count()
    nc = auto_ivf_cells(n_corpus)
    print(f"n_corpus={n_corpus} n_batch={n_batch} auto_cells={nc}")

    cents = semantic_cells(corpus).persist()
    cents.count()

    t0 = time.time()
    verd = semantic_ingest_verdicts(corpus, batch, cents=cents).persist()
    row = verd.agg(
        F.sum("n_cand").alias("s"),
        F.sum(F.when(~F.col("admit"), 1).otherwise(0)).alias("rej"),
    ).collect()[0]
    wall = time.time() - t0
    allpairs = n_batch * n_corpus
    print(
        f"probe=2: sum_cand={row.s} allpairs={allpairs} "
        f"bound_ratio={allpairs / row.s:.1f}x rejected={row.rej} "
        f"wall={wall:.1f}s"
    )

    # full-probe truth via NumPy: for each batch vector, does ANY
    # corpus vector reach tau? (argmax over cosine; float64 exact
    # enough for a recall statement — verdict ties at tau are not
    # what this measures)
    cp = corpus.toPandas()
    bp = batch.toPandas()
    C = np.array(list(cp["qv"]), dtype=np.float64)
    B = np.array(list(bp["qv"]), dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
    # blockwise to cap memory: 50k x 160k x 8B ~ 64 GB full — block it
    dup_truth = np.zeros(len(B), dtype=bool)
    step = 2048
    for i in range(0, len(B), step):
        sims = Bn[i : i + step] @ Cn.T
        dup_truth[i : i + step] = (sims >= _SEM_TAU).any(axis=1)
    truth_by_id = dict(zip(bp["vec_id"], dup_truth))

    got = {r["vec_id"]: not r["admit"] for r in verd.collect()}
    n_true = sum(1 for x in truth_by_id.values() if x)
    caught = sum(1 for k, x in truth_by_id.items() if x and got[k])
    false_rej = sum(1 for k, x in truth_by_id.items() if not x and got[k])
    print(
        f"full-probe truth: dups={n_true}/{n_batch} "
        f"caught_by_probe2={caught} recall={caught / max(n_true, 1):.4f} "
        f"false_rejects={false_rej}"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10e")
