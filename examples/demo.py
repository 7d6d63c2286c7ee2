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

    print("== Two-phase ingest dedup (r10-11): index once, batches cheap ==")
    from presto_on_ray_spark.operators.dedup import (
        _SATURATION_AVG_DF,
        build_base_index,
        ingest_batch_adaptive,
        lsh_bands,
        shingle_saturation,
    )

    d = spark.table("documents").where("text IS NOT NULL")
    idx = build_base_index(d.where("doc_id % 10 != 0"), tracked=False)
    bands = None
    try:
        # the two-phase pattern: measure the index's saturation ONCE,
        # and maintain the (persisted) bands artifact only when the
        # dispatch will actually use the LSH tier
        sat = shingle_saturation(idx.shingles)
        print(
            f"index saturation {sat:.1f} "
            f"(tier dispatch threshold {_SATURATION_AVG_DF:g})"
        )
        if sat >= _SATURATION_AVG_DF:
            bands = lsh_bands(idx.shingles).persist()
        ingest_batch_adaptive(
            d.where("doc_id % 10 = 0"), idx, bands=bands, saturation=sat
        ).groupBy("status").count().orderBy("status").show()
    finally:
        if bands is not None:
            bands.unpersist()
        idx.release()

    print("== PQ ANN (r11): codes-only shortlist, exact rerank ==")
    suite.QUERIES["similarity_pq_rerank_topk"](spark, SF_DIR).show(8)

    print("== Z-order layout (r11): multi-dimensional row-group pruning ==")
    import tempfile

    from presto_on_ray_spark.layout import layout_zorder_demo

    with tempfile.TemporaryDirectory(prefix="demo_zorder_") as tmp:
        zd = layout_zorder_demo(spark, SF_DIR, tmp, num_files=8)
    print(
        "box pruning:",
        zd["pruning_box_zorder"]["row_groups_pruned"],
        "/",
        zd["pruning_box_zorder"]["row_groups"],
        "| single-dim (ts, user): zorder",
        (
            zd["pruning_ts_zorder"]["row_groups_pruned"],
            zd["pruning_user_zorder"]["row_groups_pruned"],
        ),
        "vs 1-d clustered",
        (
            zd["pruning_ts_clustered"]["row_groups_pruned"],
            zd["pruning_user_clustered"]["row_groups_pruned"],
        ),
    )

    print("== Corpus governance (r12): strip, classify, split, drift ==")
    # boilerplate out, model verdicts on, leakage-safe split keyed by
    # near-dup clusters, PSI drift between the corpus's hash-halves —
    # the four passes a training-data pipeline runs between dedup and
    # tokenization, each with a hash-exact DuckDB oracle in the suite
    bp = suite.QUERIES["corpus_boilerplate_strip"](spark, SF_DIR)
    print("boilerplate-cut docs:", bp.filter("n_cut_segments > 0").count())
    clf = suite.QUERIES["text_quality_classifier"](spark, SF_DIR)
    print("classifier keep rate:", clf.filter("keep").count(), "/", clf.count())
    suite.QUERIES["split_leakage_safe"](spark, SF_DIR).groupBy("split").count().show()
    suite.QUERIES["corpus_drift_psi"](spark, SF_DIR).orderBy("source").show(4)
    # the same operators through the SQL front door, as joinable views
    eng.register_pipeline_views(["split_leakage_safe", "text_quality_classifier"])
    eng.sql(
        "SELECT s.split, COUNT(*) AS n,"
        "       SUM(CASE WHEN c.keep THEN 1 ELSE 0 END) AS kept"
        "  FROM split_leakage_safe s"
        "  JOIN text_quality_classifier c USING (doc_id)"
        " GROUP BY s.split ORDER BY s.split"
    ).show()
    print("== Diversity + retrieval (r12): k-center seeds, BM25 ==")
    suite.QUERIES["similarity_kcenter_seeds"](spark, SF_DIR).show()
    suite.QUERIES["text_bm25_topk"](spark, SF_DIR).show(6)

    print("== Auto-dial ANN (r14): corpus-sized cells/probes/shortlist ==")
    from presto_on_ray_spark.operators.similarity import (
        ann_rebuild_advice,
        auto_ivf_cells,
        build_ann_index,
        quantized,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    v = emb.select("vec_id", quantized(F.col("embedding")).alias("qv"))
    idx = build_ann_index(v, n_cells=auto_ivf_cells(v.count()))
    print("rebuild advice (fresh auto build):", ann_rebuild_advice(idx))
    suite.QUERIES["similarity_ivfpq_auto_cells"](spark, SF_DIR).show(5)

    print("== Published classifier weights (r14): train -> publish -> score ==")
    import tempfile

    from presto_on_ray_spark.operators.textstats import (
        classifier_train,
        langid_labels,
        load_classifier_weights,
        save_classifier_weights,
        weights_live_generation,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        "text IS NOT NULL"
    )
    store = tempfile.mkdtemp(prefix="demo_weights_")
    save_classifier_weights(classifier_train(docs, langid_labels(docs), epochs=2), store)
    gen = weights_live_generation(store)
    w = load_classifier_weights(spark, store, generation=gen)
    print(f"published generation {gen}; nonzero weights:",
          w.filter("wnum <> 0").count())

    print("== Semantic ingest admission (r15): batch vs corpus cells ==")
    from presto_on_ray_spark.operators.similarity import (
        semantic_ingest_verdicts,
        semantic_probe_dial,
    )

    corpus = v.filter("vec_id % 5 <> 0")
    arriving = v.filter("vec_id % 5 = 0")
    verdicts = semantic_ingest_verdicts(corpus, arriving)
    verdicts.groupBy("admit").count().orderBy("admit").show()
    dial = semantic_probe_dial(corpus, target_recall=0.95)
    print(
        f"probe dial: nprobe {dial['nprobe']} of {dial['n_cells']} cells "
        f"for recall >= 0.95 ({dial['dup_bearing']}/{dial['sampled']} "
        f"sampled queries dup-bearing)"
    )

    print("== Physical-plan introspection ==")
    from presto_on_ray_spark.plans import physical_summary

    print(physical_summary(suite.QUERIES["q1_pricing_summary"](spark, SF_DIR)))
    spark.stop()


if __name__ == "__main__":
    main()
