"""Sub-phase wall-clock probe for the composed heavy keys (r15 opt):
times each stage of dedup_ingest_chain_stale, dedup_ingest_chain and
similarity_ivfpq_lifecycle_rebuild with forced materialization between
phases, so the per-phase cost is attributable. NOT the bench (phases
are forced with count()); used only to rank optimization targets.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from presto_on_ray_spark import suite  # noqa: E402
from presto_on_ray_spark.caching import release_cached  # noqa: E402
from presto_on_ray_spark.session import get_spark  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suite.load_all()
    spark = get_spark(app_name="probe-phases-r15")
    spark.sparkContext.setLogLevel("ERROR")
    from presto_on_ray_spark.functions.registry import register_presto_functions

    register_presto_functions(spark)
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    from presto_on_ray_spark.operators.dedup import (
        build_base_index,
        compact_saved_index,
        ingest_batch,
        load_base_index,
        merge_into_saved_index,
        save_base_index,
        t,
    )
    from presto_on_ray_spark.caching import tracked_persist

    marks: list[tuple[str, float]] = []
    t0 = time.perf_counter()

    def mark(label: str) -> None:
        now = time.perf_counter()
        marks.append((label, now - mark.last))
        mark.last = now

    mark.last = t0

    # ---- dedup_ingest_chain_stale phases -------------------------------
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    base = d.filter(F.col("doc_id") % 10 % 5 != 0)
    b1 = d.filter(F.col("doc_id") % 10 == 5)
    b2 = d.filter(F.col("doc_id") % 10 == 0)
    tmp = tempfile.mkdtemp(prefix="probe_stale_")
    p = os.path.join(tmp, "bidx")
    idx = build_base_index(base)
    # force-materialize the index relations
    for rel in idx:
        rel.count()
    mark("stale.build_base_index(materialized)")
    save_base_index(idx, p)
    mark("stale.save_base_index")
    c1 = tracked_persist(ingest_batch(b1, idx))
    c1.count()
    mark("stale.ingest_b1")
    new1 = b1.join(
        c1.filter(F.col("status") == "new").select("doc_id"), "doc_id", "left_semi"
    )
    merge_into_saved_index(spark, p, new1, rerank=False)
    mark("stale.merge_saved(rerank=False)")
    compact_saved_index(spark, p)
    mark("stale.compact_saved_index")
    c2 = ingest_batch(b2, load_base_index(spark, p))
    c2.count()
    mark("stale.ingest_b2")
    release_cached()

    for label, secs in marks:
        print(f"{secs:8.3f}s  {label}")
    total = sum(s for _, s in marks)
    print(f"{total:8.3f}s  TOTAL(stale phases)")

    spark.stop()


if __name__ == "__main__":
    main()
