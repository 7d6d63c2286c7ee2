"""Whole-suite plan audit: every registered query's physical plan is
checked for 100 TB anti-patterns (SURVEY §4.2 / SCALING.md). This is
the 'would this survive a 100× scale-up' gate, run over ALL queries,
not just the hand-picked ones in test_plans.py."""

from __future__ import annotations

import pytest

from presto_on_ray_spark import suite
from presto_on_ray_spark.plans.inspect import explain_formatted

suite.load_all()

# Python eval nodes are legitimate ONLY where the operator is defined
# by a pandas UDF (SURVEY §2.10 / §2.11 multimodal + shims).
PYTHON_ALLOWED = {
    "datetime_mysql_patterns",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_partition_shape",
    "multimodal_decode_features",  # real BMP/WAV decode is per-payload Python by design
    "multimodal_png_decode",       # real PNG inflate+unfilter, same tier
    "grouped_pandas_zscore",
    "grouped_pandas_agg",
    "agg_reduce_agg",  # mapInPandas partial + applyInPandas combine (reduce_agg.py)
}

# collect_list materializes a whole group in one aggregation buffer —
# legitimate only where the collected array is small BY CONSTRUCTION
# (bounded per-group fan-in, top-N slices, per-group register maps),
# never as a stand-in for a distributive aggregate.
COLLECT_LIST_ALLOWED = {
    "agg_structural",        # array_agg demo: 3 groups, rendered sorted
    "agg_map",               # map_agg demo: single bounded group
    "agg_multimap",          # multimap_agg: ≤25 values per region
    "agg_min_by_topn",       # sorted-slice top-3 per group
    "multimap_from_entries", # 25-entry nation fixture array
    "hll_sketch_pipeline",   # approx_set register map: ≤2^p entries/group
    "qdigest_sketch_pipeline",  # bucket map: ≤256 entries/group
    "ddsketch_pipeline",     # sparse log-bucket map: ≤ occupied buckets/group
    "agg_most_frequent",     # bounded candidate map per group
    "agg_numeric_histogram", # ≤10 buckets
    "text_fingerprint",
    "similarity_bruteforce_topk",   # per-query top-k slice
    "similarity_ivf_topk",          # per-query top-k slice
    "similarity_lsh_buckets",
    "streaming_session_windows",
    "window_ignore_nulls",
    # composed coverage suites inherit their members' bounded uses:
    "agg_map_union",         # map re-assembly: ≤ distinct keys per group (maps.py)
    "cov_agg_misc",          # min_by slice + single-group map_agg
    "cov_agg_returnflag",    # agg_structural collect_set render
    "cov_scalar_fixtures",   # multimap_from_entries 25-entry fixture
    "cov_sketch_rollups",    # HLL/qdigest register maps (≤2^p/group)
    "cov_sketch_exact",      # qdigest member's bucket map (≤256/group)
    "sql_agg_surface",       # histogram/max_by/reduce_agg over 5 priorities/group + keyed-bounded slice
    "cov_similarity_ann",    # ivf per-query top-k slice
    "similarity_ivf_exact",  # per-query top-k slice
    # per-doc MAXIMAL-SPAN list: two longs per span, and maximal runs
    # are separated by >=1 non-duplicated position, so the buffer is
    # at most one struct per two window positions — strictly smaller
    # than the doc's own word array that split() materializes per row
    # in the same operator. Bounded by construction, per document.
    "dedup_substring_cut",
    # same shared _cut_spans tail (two longs per maximal contaminated
    # span, <= one span per two window positions, per document)
    "decontaminate_cut_spans",
    # bottom-k sketch: the dense_rank<=k filter runs BEFORE the
    # collect_set, so the buffer is <= k (128) longs per source by
    # construction (corpus_overlap.bottomk_sketches)
    "corpus_overlap_bottomk",
    # per-doc CUT-INDEX list: <= words/_BP_W longs per document —
    # strictly smaller than the word array split() materializes per
    # row in the same operator (pipeline_prep.boilerplate_strip)
    "corpus_boilerplate_strip",
}

# Cartesian/broadcast-nested-loop is legitimate only for deliberately
# tiny inputs (cross-join demos, bounded pairwise similarity, query-
# vector fan-out, non-equi theta joins).
NESTED_LOOP_ALLOWED = {
    "join_cross",
    "corpus_pagerank",       # 1-row count broadcast (teleport term)
    "text_bm25_topk",        # 1-row corpus-stats broadcast (N, avgdl)
    "join_non_equi",
    "similarity_bruteforce_topk",
    "similarity_pairwise_threshold",
    "cast_try_cast",
    "values_inline",
    "readme_parity_sum",
    "quantified_comparison",
    "join_scalar_subquery",
    "tpch_q18_large_volume_customer",
    # composed coverage suites inherit their members' bounded uses:
    "cov_join_special",      # cross-join demo + bounded theta join
    "cov_join_filtering",    # quantified member's scalar-agg join
    "cov_scalar_fixtures",   # tiny VALUES members
    # IVF-PQ coarse quantizer: the ONLY nested-loop passes are the two
    # centroid argmins (vectors x n_cells and queries x n_cells, an
    # 8-row broadcast side by construction — the standard IVF
    # assignment shape); tests/test_plans.py pins the count at exactly
    # 2 and refuses any cartesian product in the same plans.
    "similarity_ivfpq_adc_topk",
    "similarity_ivfpq_rerank_topk",
    "similarity_ivfpq_refined_topk",  # same two bounded centroid argmins
    "similarity_ivfpq_rerank_auto",   # same pipeline, auto shortlist depth
    "similarity_ivfpq_filtered_topk",  # same + predicate semi-join on codes
    # r14 auto dials: the same two centroid argmins, broadcast side now
    # ceil(sqrt n) rows (n_cells ~ sqrt n keeps it broadcast-sized BY
    # FORMULA: 100k rows at n = 10^10)
    "similarity_ivfpq_auto_cells",
    "similarity_ivfpq_filtered_adaptive",
    "similarity_ivfpq_filtered_saved",  # same argmins over the loaded cents
    # r15 lifecycle key: same bounded centroid argmins over the
    # REBUILT generation's cents (ceil(sqrt n)-row broadcast side)
    "similarity_ivfpq_lifecycle_rebuild",
    # SemDeDup's ONLY nested-loop pass is the one centroid argmin
    # (vectors x n_cells, an 8-row broadcast side); the within-cell
    # pairwise stage is a cell-keyed equi-join
    "dedup_semantic",
    "dedup_semantic_refined",  # same bounded argmin, refined cells
    "dedup_semantic_auto_cells",  # same argmin, ceil(sqrt n)-row broadcast side
    # r15 semantic ingest tier: the nested-loop passes are the corpus
    # and batch centroid argmins (x ceil(sqrt n)-row broadcast cents —
    # the IVF assignment shape); the candidate stage is a cell-keyed
    # equi-join. The bounded key adds the dial's sampled full-corpus
    # truth pass (corpus x ~n/20-row broadcast sample, run once per
    # rebuild by design — the dial's documented cost, not a per-batch
    # term), and the drift key the same two argmins over both
    # snapshots.
    "dedup_semantic_ingest",
    "dedup_semantic_ingest_bounded",
    "corpus_drift_semantic",
    "decontaminate_semantic",  # same argmins; eval is the broadcast side
    # source-pair theta self-join over the SKETCH relation (one row of
    # k longs per source — |sources| rows total, never documents)
    "corpus_overlap_bottomk",
}


@pytest.mark.parametrize("name", sorted(suite.QUERIES))
def test_plan_has_no_scale_antipatterns(spark, sf_dir, name):
    df = suite.QUERIES[name](spark, sf_dir)
    if df.isStreaming:
        pytest.skip("streaming plan")
    plan = explain_formatted(df)

    if name not in PYTHON_ALLOWED:
        assert "EvalPython" not in plan, f"{name}: Python UDF in a JVM-expressible operator"

    if name not in NESTED_LOOP_ALLOWED:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join"

    if name not in COLLECT_LIST_ALLOWED:
        assert "collect_list" not in plan, (
            f"{name}: collect_list outside the bounded-by-construction "
            "allow-list (whole-group buffer does not scale)"
        )

    # full-table scans must never read all columns unless the operator
    # genuinely needs them: check ReadSchema is present for parquet scans
    if "Scan parquet" in plan:
        assert "ReadSchema" in plan


@pytest.mark.parametrize("name", sorted(suite.QUERIES))
def test_schema_stable_across_invocations(spark, sf_dir, name):
    """The driver requires a stable schema; two plan builds must agree
    exactly (names, types, nullability-insensitive)."""
    a = suite.QUERIES[name](spark, sf_dir)
    b = suite.QUERIES[name](spark, sf_dir)
    sa = [(f.name, f.dataType.simpleString()) for f in a.schema.fields]
    sb = [(f.name, f.dataType.simpleString()) for f in b.schema.fields]
    assert sa == sb
