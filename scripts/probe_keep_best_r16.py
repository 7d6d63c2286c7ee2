"""Round-16 probe: phase-level timing of dedup_keep_best (VERDICT r15
#2 — driver recorded 15.57 s with inverse scaling 0.50: 8 cores 2x
faster than 32). Replays the key's internal phases as separate timed
actions so the pathological one is identifiable, then runs the intact
key. Run at several core counts:

    SPARK_GRAFT_CPUS=32 python scripts/probe_keep_best_r16.py
    SPARK_GRAFT_CPUS=8  python scripts/probe_keep_best_r16.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from presto_on_ray_spark import suite  # noqa: E402
from presto_on_ray_spark.caching import release_cached, tracked_persist  # noqa: E402
from presto_on_ray_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suite.load_all()
    spark = get_spark(app_name="probe-keep-best-r16")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    sc = spark.sparkContext

    from presto_on_ray_spark.operators import dedup
    from presto_on_ray_spark.operators.pipeline_prep import text_repetition
    from presto_on_ray_spark.sources.tables import load_table

    def timed(label, fn):
        sc.setJobDescription(f"probe:{label}")
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"{dt:8.3f}s  {label}", file=sys.stderr)
        sc.setJobDescription(None)
        return out

    # --- phase replay (same building blocks as the key) ---
    d = load_table(spark, sf_dir, "documents")
    sh = tracked_persist(
        d.select("doc_id", F.explode(dedup.shingles(F.col("text"))).alias("sh"))
    )
    timed("saturation stat", lambda: dedup.shingle_saturation(sh))
    pairs = timed(
        "pairs build (lazy)", lambda: dedup.dedup_ngram_jaccard(spark, sf_dir)
    ).select("doc_a", "doc_b")
    comp = timed("connected_components (CC rounds)",
                 lambda: dedup.connected_components(pairs))
    timed("CC output count", comp.count)
    q = text_repetition(spark, sf_dir).select("doc_id", "rep_ratio")
    timed("repetition count", q.count)

    from pyspark.sql import Window

    w = Window.partitionBy("component_id").orderBy("rep_ratio", "doc_id")
    joined = (
        comp.select(F.col("node").alias("doc_id"), "component_id")
        .join(q, "doc_id")
        .withColumn("is_keeper", F.row_number().over(w) == 1)
    )
    timed("join+window count", joined.count)
    release_cached()

    # --- the intact key, twice ---
    fn = suite.QUERIES["dedup_keep_best"]
    for i in (1, 2):
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        print(
            f"{time.perf_counter() - t0:8.3f}s  dedup_keep_best intact "
            f"(pass {i}, {n} rows)",
            file=sys.stderr,
        )
        release_cached()
    spark.stop()


if __name__ == "__main__":
    main()
