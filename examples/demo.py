"""End-to-end engine tour — runnable: ``python examples/demo.py``.

Walks the surfaces a presto-on-ray user would recognize (SQL over a
catalog) and the ones this engine adds (training-data pipeline ops,
sketches, streaming), printing small result samples.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from presto_on_ray_spark import Engine, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="presto-on-ray-spark-demo")
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark).register_tables(SF_DIR)

    print("== Presto-dialect SQL (the reference's connect surface) ==")
    eng.sql(
        """
        SELECT l_returnflag,
               approx_distinct(l_orderkey) AS orders,
               arbitrary(l_linestatus) AS a_status
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """
    ).show()

    print("== DataFrame front door: star-schema revenue ==")
    from presto_on_ray_spark import suite

    suite.load_all()
    suite.QUERIES["tpch_q5_local_supplier_volume"](spark, SF_DIR).show()

    print("== Dedup: MinHash-LSH candidates vs exact jaccard ==")
    suite.QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).show(5)
    print(
        "LSH candidate pairs:",
        suite.QUERIES["dedup_minhash_lsh"](spark, SF_DIR).count(),
    )

    print("== Similarity: brute-force top-k ==")
    suite.QUERIES["similarity_bruteforce_topk"](spark, SF_DIR).show(6)

    print("== Mergeable sketches: HLL per status ==")
    suite.QUERIES["hll_sketch_pipeline"](spark, SF_DIR).show()

    print("== Streaming: tumbling windows (availableNow -> memory) ==")
    from presto_on_ray_spark.streaming import tumbling_window_counts
    from presto_on_ray_spark.streaming.windows import run_stream_to_memory

    run_stream_to_memory(tumbling_window_counts(spark, SF_DIR), "demo_windows").orderBy(
        "window_start", "event_type"
    ).show(5)

    print("== CDC: MERGE upsert action accounting ==")
    from pyspark.sql import functions as F

    suite.QUERIES["merge_upsert"](spark, SF_DIR).groupBy("action").agg(
        F.count("*").alias("n")
    ).orderBy("action").show()

    print("== Corpus curation: keep/drop verdicts per rule ==")
    suite.QUERIES["corpus_curation_pipeline"](spark, SF_DIR).groupBy(
        "verdict"
    ).count().orderBy("verdict").show()

    print("== Per-query governance (r5): admission control + pools ==")
    from presto_on_ray_spark.resource_pools import QueryAdmissionError

    try:
        eng.sql("SELECT COUNT(*) AS n FROM lineitem", max_input_bytes=1)
    except QueryAdmissionError as exc:
        print("rejected as expected:", str(exc)[:80], "...")
    eng.sql(
        "SELECT COUNT(*) AS n FROM lineitem",
        max_input_bytes=1 << 40,
        pool="demo-pool",
    ).show()

    print("== timestamp with time zone (r5): AT TIME ZONE on a struct ==")
    suite.QUERIES["tz_type_functions"](spark, SF_DIR).show(3)

    print("== Hash-verified sketches (r5): portable checksum + HLL ==")
    suite.QUERIES["cov_sketch_exact"](spark, SF_DIR).orderBy("src", "k").show(12)

    print("== SQL aggregate surface (r5b): Presto names end-to-end ==")
    eng.sql(
        """
        SELECT o_orderstatus,
               ROUND(entropy(c), 4) AS priority_entropy,
               array_join(max_by(o_orderpriority, c, 2), ',') AS top2
        FROM (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c
              FROM orders GROUP BY 1, 2)
        GROUP BY o_orderstatus ORDER BY o_orderstatus
        """
    ).show()

    print("== Catalog statements (r5b): SHOW family, views, DELETE ==")
    eng.sql("SHOW CATALOGS").show()
    eng.sql("SHOW TABLES LIKE 'doc%'").show()
    eng.sql("CREATE VIEW demo_v AS SELECT doc_id FROM documents WHERE doc_id < 3")
    print("view rows:", eng.sql("SELECT COUNT(*) AS n FROM demo_v").collect()[0][0])
    eng.sql("DROP VIEW demo_v")

    print("== Train-prep (r5b): chunking + link authority ==")
    suite.QUERIES["text_chunking"](spark, SF_DIR).show(4)
    suite.QUERIES["corpus_pagerank"](spark, SF_DIR).orderBy(
        F.col("pr_scaled").desc()
    ).show(4)

    print("== Physical-plan introspection ==")
    from presto_on_ray_spark.plans import physical_summary

    print(physical_summary(suite.QUERIES["q1_pricing_summary"](spark, SF_DIR)))
    spark.stop()


if __name__ == "__main__":
    main()
