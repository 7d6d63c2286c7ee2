"""The curated 50-slot coverage window (suite.CURATED_50): ordering,
family coverage, and composed-suite integrity."""

from __future__ import annotations

from presto_on_ray_spark import suite

suite.load_all()


def test_first_50_registrations_are_the_curated_window():
    assert list(suite.QUERIES)[:50] == suite.CURATED_50
    assert len(suite.CURATED_50) == 50
    assert len(set(suite.CURATED_50)) == 50


def test_curated_window_is_fully_oracle_bearing():
    """Since r5 every driver-window row carries a DuckDB oracle — the
    approximate families are represented by hash-verifiable variants
    (cov_sketch_exact, dedup_lsh_keepers, similarity_ivf_exact); the
    engine-hash internals stay registered under the local rows-only
    gate."""
    rows_only = {n for n in suite.CURATED_50 if n not in suite.ORACLES}
    assert rows_only == set()


def test_curated_window_covers_every_family():
    """Each SURVEY §2 family row / §2.11 operator keeps ≥1 entry in the
    driver's window — the guard against the round-1/round-2 gap where
    73 queries had no driver evidence.

    Round-14 rotation (VERDICT r13 #2): ten redundant rows moved to
    the local oracle gate so the post-r5 ingest/ANN/governance/
    classifier tiers finally get driver evidence. Families whose
    singleton rotated out point at the overlapping window key that
    still exercises the shape; the rotated-out keys themselves stay
    registered and locally verified (test_oracle_differential)."""
    window = set(suite.CURATED_50)
    representatives = {
        "tpch": {"q1_pricing_summary", "tpch_q3_shipping_priority"},
        "tpch_adapted_shapes": {"cov_tpch_adapted"},
        # row 17's predicates are driver-covered via cov_scalar_orders'
        # predicate_null_semantics member; scan_project_filter stays
        # under the local oracle gate
        "scan_filters": {"cov_scalar_orders"},
        "sampling": {"tablesample_aggregate_bounds"},
        "cast_case_values": {"cov_scalar_fixtures"},
        "datetime_struct_null": {"cov_scalar_orders"},
        "math_trig_bitwise": {"cov_scalar_lineitem"},
        "regex_hash_like": {"cov_scalar_documents"},
        "strings": {"cov_scalar_fixtures"},
        "join_filtering": {"cov_join_filtering"},
        "join_special": {"cov_join_special"},
        "join_lateral": {"cov_join_subquery"},
        "join_scalar_subquery": {"cov_join_subquery"},
        "join_asof": {"cov_join_special"},
        "pipeline_scale": {"cov_pipeline_scale"},
        "agg_modifiers_structural": {"cov_agg_returnflag"},
        # cov_agg_linestatus rotated out r14; exact percentiles stay
        # windowed via cov_sketch_exact's percentile members
        "agg_stats_percentiles": {"cov_agg_linestatus", "cov_sketch_exact"},
        "agg_tail": {"cov_agg_misc"},
        "grouping_sets": {"agg_grouping_sets"},
        # Q11's threshold-over-own-aggregate IS the HAVING shape;
        # agg_having itself stays under the local oracle gate
        "having": {"agg_having", "tpch_q11_important_stock"},
        "incremental_cdc": {"cov_incremental"},
        "reduce_agg": {"agg_reduce_agg"},
        "approx_sketches": {"cov_sketch_exact", "cov_sketch_rollups"},
        "windows_core": {"cov_windows_wide"},
        # window_range_frame rotated out r14; §2.5 stays windowed via
        # the core + top-N rows (RANGE frames locally gated)
        "window_frames": {"window_range_frame", "cov_windows_wide"},
        "window_topn": {"window_top_n_per_group"},
        "topn": {"topn_global"},
        "sorts_distinct": {"cov_sorts_distinct"},
        "setops": {"cov_setops"},
        "arrays": {"cov_arrays_embeddings"},
        "json": {"json_extract_ops"},
        "streaming": {"streaming_tumbling_window_batch"},
        "pandas_udf": {"grouped_pandas_agg"},
        # dedup_exact rotated out r14; digest-exact dedup stays
        # windowed via the ingest chain's verify stage and the health
        # report's per-source exact-dup term
        "dedup_exact": {"dedup_exact", "dedup_ingest_chain_stale"},
        # the clustering row's input stage IS the ngram-jaccard pair
        # generator, so the jaccard family is driver-covered through it
        # (dedup_ngram_jaccard itself stays under the local oracle gate)
        "dedup_jaccard": {"dedup_neardup_clusters", "dedup_ngram_jaccard"},
        # the bounded-dial key runs the same candidates→verify→CC→
        # keepers machinery as dedup_lsh_keepers (displaced to the
        # local gate by the r15 trace-key swap, VERDICT r14 #3)
        "dedup_approx": {"dedup_lsh_keepers_bounded", "cov_dedup_approx"},
        "dedup_lsh_bounded": {"dedup_lsh_keepers_bounded"},
        "dedup_ingest_lifecycle": {"dedup_ingest_chain_stale"},
        "similarity_exact": {"similarity_bruteforce_topk", "similarity_pairwise_threshold"},
        "similarity_ann": {
            "similarity_ivfpq_rerank_auto",
            "similarity_ivfpq_filtered_topk",
            "similarity_ivf_exact",
        },
        "text_analysis": {"cov_text_docs", "cov_text_agg"},
        "text_ranking": {"text_bm25_topk"},
        "classifier": {"text_classifier_train", "text_classifier_holdout"},
        "governance": {"corpus_health_report_saved"},
        "splits_mixing": {"split_leakage_safe", "corpus_mix_temperature"},
        "multimodal": {"multimodal_decode_features", "multimodal_features"},
    }
    missing = {
        family: reps for family, reps in representatives.items() if not reps & window
    }
    assert not missing, f"families with no driver-window representative: {missing}"


def test_r14_flagship_rows_are_windowed():
    """The r14 rotation's whole point: the post-r5 flagship tiers hold
    driver-window rows (VERDICT r13 #2's named list)."""
    window = set(suite.CURATED_50)
    flagship = {
        "dedup_ingest_chain_stale",
        "dedup_lsh_keepers_bounded",
        "similarity_ivfpq_rerank_auto",
        "similarity_ivfpq_filtered_topk",
        "corpus_health_report_saved",
        "text_classifier_train",
        "text_classifier_holdout",
        "split_leakage_safe",
        "text_bm25_topk",
        "corpus_mix_temperature",
    }
    assert flagship <= window


def test_all_tpch_shapes_in_window():
    # 10 singleton shapes post-r14-rotation (q4/q14/q22 moved to the
    # local oracle gate; all 22 shapes stay registered + locally
    # verified, 9 more ride in cov_tpch_adapted)
    tpch = [n for n in suite.CURATED_50 if n.startswith("tpch_") or n == "q1_pricing_summary"]
    assert len(tpch) == 10


def test_composed_members_still_registered_with_oracles():
    """Composition must not replace the per-member queries — they stay
    registered (beyond the window) under the local oracle gate."""
    from presto_on_ray_spark.operators.coverage import (
        _AGG_LS_MEMBERS,
        _AGG_MISC_SPECS,
        _AGG_RF_MEMBERS,
        _ARRAY_MEMBERS,
        _FIXTURE_SPECS,
        _SCALAR_DOC_MEMBERS,
        _SCALAR_LI_MEMBERS,
        _SCALAR_ORD_MEMBERS,
        _TEXT_DOC_MEMBERS,
        _WINDOW_MEMBERS,
    )

    members = (
        _WINDOW_MEMBERS + _AGG_RF_MEMBERS + _AGG_LS_MEMBERS + _ARRAY_MEMBERS
        + _SCALAR_LI_MEMBERS + _SCALAR_DOC_MEMBERS + _SCALAR_ORD_MEMBERS
        + _TEXT_DOC_MEMBERS
        + [s[1] for s in _FIXTURE_SPECS] + [s[1] for s in _AGG_MISC_SPECS]
    )
    for m in members:
        assert m in suite.QUERIES, m
        assert m in suite.ORACLES, m
