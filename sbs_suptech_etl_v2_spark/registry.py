"""Central query registry — the driver-checked surface.

Every implemented operator family from SURVEY §2 declares here:
``QUERIES[name]`` (a (spark, sf_dir) -> DataFrame builder) and, when
SQL-expressible, ``ORACLE[name]`` (ANSI SQL for the DuckDB oracle over
the same parquet tables). Column names/aliases match exactly on both
sides — the driver hashes values under name-sorted columns.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sbs_suptech_etl_v2_spark.operators import blocks as B
from sbs_suptech_etl_v2_spark.operators import dedup as X1
from sbs_suptech_etl_v2_spark.operators import extraction as E
from sbs_suptech_etl_v2_spark.operators import jsonops as J
from sbs_suptech_etl_v2_spark.operators import multimodal as X3
from sbs_suptech_etl_v2_spark.operators import documents as D
from sbs_suptech_etl_v2_spark.operators import relational as R
from sbs_suptech_etl_v2_spark.operators import similarity as X2
from sbs_suptech_etl_v2_spark.operators import textops as X4
from sbs_suptech_etl_v2_spark.operators import trainprep as X5

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {
    # ------------------------------------------------------------------
    # Ordering note: the external correctness harness samples a
    # fixed-size prefix of this dict (50 entries, insertion order).
    # Rotation rule: each round the stalest-verdict queries rotate
    # into the prefix; a CHANGED query takes a seat the same round to
    # re-earn its verdict. "Changed" extends to MODULE-MATES of the
    # changed code (ADVICE r12: the extension is now explicit, not
    # silent): an edit to an operator module can affect every query it
    # feeds, so all of that module's registered queries re-earn — r12
    # seated unchanged q102 alongside q99 on the textops.py one-liner
    # under exactly this reading, displacing q97's refresh by a round.
    #
    # Round-17 rotation (VERDICT r16 directive #1; the r16 precompute,
    # verified against CORRECTNESS_r16 — 50/50 hash-green; freshness
    # after r16: 50 r16 / 50 r15 / 21 r14): no query or operator
    # module changed this round (the round diff is this reorder plus
    # test/doc work), so there are no changed-query seats; slots 1-21
    # are the 21 r14-fresh leftovers in numeric order (q59-q78, q95 —
    # includes the heavies q62/q66/q71/q74/q75/q76 with expectations
    # pre-registered in SCALING.md); slots 22-50 backfill with the 29
    # oldest r15-fresh in numeric order (q01-q13, q26-q35, q37-q40,
    # q42, q43 — q43 reads no_oracle BY DESIGN; includes the q30
    # watch-item re-entry, expected back at <= 0.4 s on a settled
    # record).
    # The prefix is PINNED by tests/test_registry_window.py: any
    # reorder must update that test's committed list consciously.
    # CORRECTNESS_local[_sf0.001|_sf0.1].json carry the full registry
    # every round. Numeric order carries no semantic meaning; ORACLE
    # stays sorted for readability and tests iterate the full dict.
    # New queries, if any, enter at slot 1 (a changed query must
    # re-earn its verdict the same round and therefore takes a seat).
    #
    # Round-18 rotation (VERDICT r17 directive #1 — it OVERRIDES the
    # r17 precompute): the r17 round's only semantic restructure
    # (q103) and every query path it rewrote were outside the r17
    # window AND the precomputed r18 window, so their verdicts rode
    # builder-run parity stamps only. This rotation leads with q103,
    # then the r17-rewritten relational/text paths (q104 q105 q108
    # q114 q117, q49 q79 q84 q94 q98 q100) and the similarity
    # carriers (q24 q25 q41 q47 q71 q86 q90 q93 q107), then the
    # round-18-changed queries (module-mate rule: q75 probe-fusion +
    # propagate-helper refactor seats q75/q50/q92; q61 lazy shingle
    # cut; q26/q29/q114 literal-quoting carriers; q18 ditto); then
    # ALL 21 r15-fresh leftovers (q79-q94, q96, q98-q100, q102 —
    # already partly seated above) and the oldest r16-fresh in
    # numeric order (q14-q25 remainder, q36) fill to 50. Left for
    # round 19: q01-q13, q27/q28, q30-q35, q37-q40, q42-q46, q48,
    # q51-q60, q62-q70, q72-q74, q76-q78, q95, q97, q101, q106,
    # q109-q113, q115/q116, q118-q121.
    # Verified against CORRECTNESS_r17 before applying: every r17-
    # window query is hash-green there (q43 no_oracle by design), so
    # nothing seated here displaces an unverified query.
    # ------------------------------------------------------------------
    # -- slots 1-21: the r17-restructured/rewritten paths (VERDICT
    #    r17 #1 list; q103 first) --
    "q103_funnel_conversion": R.funnel_conversion,
    "q104_revenue_interpolation": R.revenue_interpolation,
    "q105_zscore_anomalies": R.zscore_anomalies,
    "q108_nucleus_vocab": X4.nucleus_vocab,
    "q114_bm25_retrieval": X4.bm25_retrieval,
    "q117_segment_spend_gini": R.segment_spend_gini,
    "q49_promo_revenue": R.promo_revenue_share,
    "q79_chunk_dedup": X1.chunk_dedup_stats,
    "q84_shingle_containment": X1.shingle_containment,
    "q94_quantity_price_stats": R.quantity_price_stats,
    "q98_user_snapshot_diff": R.user_snapshot_diff,
    "q100_purchase_nearest_click": R.purchase_nearest_click,
    "q24_topk_cosine": X2.topk_cosine,
    "q25_embedding_neardup": X2.embedding_neardup,
    "q41_ann_bucketed_topk": X2.ann_bucketed_topk,
    "q47_ivf_topk": X2.ivf_topk,
    "q71_kmeans_update": X2.kmeans_update,
    "q86_pq_quantize": X2.pq_quantize,
    "q90_ann_recall_audit": X2.ann_recall_audit,
    "q93_semantic_dedup": X2.semantic_dedup,
    "q107_matryoshka_audit": X2.matryoshka_audit,
    # -- slots 22-28: round-18-changed queries --
    "q75_neardup_fixpoint": X1.neardup_clusters_fixpoint,
    "q50_neardup_clusters": X1.neardup_clusters,
    "q92_dedup_keep_canonical": X1.dedup_keep_canonical,
    "q61_contamination_check": X5.contamination_check,
    "q26_text_stats": X4.text_stats,
    "q29_language_id": X4.language_id,
    "q18_stage_gate_notifications": D.stage_gate_notifications,
    # -- slots 29-40: remaining r15-fresh leftovers (numeric order) --
    "q80_pii_redaction": X5.pii_redaction,
    "q81_source_mixture": X5.source_mixture,
    "q82_distribution_windows": R.order_distribution_windows,
    "q83_nation_presence": R.nation_presence_reconcile,
    "q85_length_histogram": X4.length_histogram,
    "q87_surrogate_keys": R.surrogate_keys,
    "q88_scene_segments": X3.scene_segments,
    "q89_cogroup_attribution": R.cogroup_attribution,
    "q91_unigram_surprisal": X4.unigram_surprisal,
    "q96_only_late_supplier": R.only_late_supplier,
    "q99_bigram_pmi": X4.bigram_pmi,
    "q102_inverted_index": X4.inverted_index,
    # -- slots 41-50: oldest r16-fresh backfill (numeric order) --
    "q14_scalar_refinement": D.scalar_refinement,
    "q15_path_parse": D.path_parse,
    "q16_pages_concat": D.pages_concat,
    "q17_metadata_merge": D.metadata_merge,
    "q19_pages_explode": D.pages_explode,
    "q20_exact_dedup": X1.exact_dedup,
    "q21_minhash_neardup": X1.minhash_neardup,
    "q22_simhash_signatures": X1.simhash_signatures,
    "q23_ngram_jaccard": X1.ngram_jaccard,
    "q36_request_decode": J.request_decode,
    # -- beyond the 50-entry prefix ------------------------------------
    # (round-19 lead candidates, numeric order)
    "q01_pricing_summary": R.pricing_summary,
    "q02_metadata_lookup_join": R.metadata_lookup_join,
    "q03_top_orders_per_customer": R.top_orders_per_customer,
    "q04_semi_join_open_orders": R.customers_with_open_orders,
    "q05_anti_join_no_orders": R.customers_without_orders,
    "q06_revenue_by_nation": R.revenue_by_nation,
    "q07_branch_union": R.order_branches_union,
    "q08_priority_rollup": R.order_priority_rollup,
    "q09_distinct_agg": R.supplier_distinct_parts,
    "q10_running_window": R.running_order_totals,
    "q11_positional_pick": R.positional_pick,
    "q12_set_ops": R.segment_set_ops,
    "q13_events_tumbling": R.events_tumbling_window,
    "q27_token_topk": X4.token_topk,
    "q28_tfidf_top_terms": X4.tfidf_top_terms,
    "q30_doc_fingerprint": X4.doc_fingerprint,
    "q31_extract_polizas": E.extract_polizas,
    "q32_extract_tasaciones": E.extract_tasaciones,
    "q33_extract_inscripciones": E.extract_inscripciones,
    "q34_blocks_page_text": B.blocks_page_text,
    "q35_notification_encode": J.notification_encode,
    "q37_artifact_keys": D.artifact_keys,
    "q38_image_features": X3.image_features,
    "q39_frame_sample": X3.frame_sample,
    "q40_nation_set_ops": R.nation_set_ops,
    "q42_token_counts": X4.token_counts,
    "q43_notification_ids": J.notification_ids,  # C7 uuid — no_oracle BY DESIGN (rows-only driver row);
    # q78_notification_ids_det is its hash-checked deterministic sibling
    "q44_ocr_extract_pages": E.ocr_extract_pages,
    "q45_events_sliding": R.events_sliding_window,
    "q46_events_session": R.events_session_window,
    "q48_props_decode": J.props_decode,
    "q51_quantize_embeddings": X2.quantize_embeddings,
    "q52_status_cube": R.order_status_cube,
    "q53_approx_distinct": R.segment_distinct_customers,
    "q54_purchase_asof_click": R.purchase_asof_click,
    "q55_image_resize": X3.image_resize,
    "q56_audio_features": X3.audio_features,
    "q57_range_frame": R.rolling_spend_range_frame,
    "q58_salted_agg": R.salted_status_totals,
    "q59_percentiles": R.priority_price_percentiles,
    "q60_grouping_sets": R.status_priority_grouping_sets,
    "q62_repetition_stats": X5.repetition_stats,
    "q63_lexicon_scrub": X5.lexicon_scrub,
    "q64_stratified_sample": X5.stratified_sample,
    "q65_sequence_packing": X5.sequence_packing,
    "q66_small_qty_revenue": R.small_quantity_brand_revenue,
    "q67_acctbal_deciles": R.acctbal_deciles,
    "q68_interval_join": R.click_purchase_interval_join,
    "q69_status_pivot": R.status_priority_pivot,
    "q70_brand_argmax": R.top_brand_per_size,
    "q72_status_unpivot": R.status_counts_unpivot,
    "q73_order_calendar": R.order_calendar,
    "q74_edit_distance": X1.variant_edit_distance,
    "q76_session_paths": R.session_event_paths,
    "q77_rank_functions": R.order_rank_functions,
    "q78_notification_ids_det": J.notification_ids_deterministic,
    "q95_calendar_resample": R.order_calendar_resample,
    "q97_weighted_sample": X5.weighted_sample,
    "q101_rag_chunking": X5.rag_chunking,
    "q106_idle_rich_customers": R.idle_rich_customers,
    "q109_activity_history_scd2": R.activity_history_scd2,
    "q110_join_key_skew_profile": R.join_key_skew_profile,
    "q111_supplier_hops_bfs": R.supplier_hops_bfs,
    "q112_decayed_user_score": R.decayed_user_score,
    "q113_cohort_retention": R.cohort_retention,
    "q115_langid_confusion": X4.langid_confusion,
    "q116_cumulative_distinct": R.cumulative_distinct_users,
    "q118_part_pair_baskets": R.part_pair_baskets,
    "q119_incremental_totals": R.incremental_priority_totals,
    "q120_monthly_momentum": R.monthly_revenue_momentum,
    "q121_cusum_changepoints": R.cusum_changepoints,
}

ORACLE: dict[str, str] = {
    "q01_pricing_summary": R.PRICING_SUMMARY_SQL,
    "q02_metadata_lookup_join": R.METADATA_LOOKUP_JOIN_SQL,
    "q03_top_orders_per_customer": R.TOP_ORDERS_PER_CUSTOMER_SQL,
    "q04_semi_join_open_orders": R.CUSTOMERS_WITH_OPEN_ORDERS_SQL,
    "q05_anti_join_no_orders": R.CUSTOMERS_WITHOUT_ORDERS_SQL,
    "q06_revenue_by_nation": R.REVENUE_BY_NATION_SQL,
    "q07_branch_union": R.ORDER_BRANCHES_UNION_SQL,
    "q08_priority_rollup": R.ORDER_PRIORITY_ROLLUP_SQL,
    "q09_distinct_agg": R.SUPPLIER_DISTINCT_PARTS_SQL,
    "q10_running_window": R.RUNNING_ORDER_TOTALS_SQL,
    "q11_positional_pick": R.POSITIONAL_PICK_SQL,
    "q12_set_ops": R.SEGMENT_SET_OPS_SQL,
    "q13_events_tumbling": R.EVENTS_TUMBLING_WINDOW_SQL,
    "q14_scalar_refinement": D.SCALAR_REFINEMENT_SQL,
    "q15_path_parse": D.PATH_PARSE_SQL,
    "q16_pages_concat": D.PAGES_CONCAT_SQL,
    "q17_metadata_merge": D.METADATA_MERGE_SQL,
    "q18_stage_gate_notifications": D.STAGE_GATE_NOTIFICATIONS_SQL,
    "q19_pages_explode": D.PAGES_EXPLODE_SQL,
    "q20_exact_dedup": X1.EXACT_DEDUP_SQL,
    "q21_minhash_neardup": X1.MINHASH_NEARDUP_SQL,
    "q22_simhash_signatures": X1.SIMHASH_SIGNATURES_SQL,
    "q23_ngram_jaccard": X1.NGRAM_JACCARD_SQL,
    "q24_topk_cosine": X2.TOPK_COSINE_SQL,
    "q25_embedding_neardup": X2.EMBEDDING_NEARDUP_SQL,
    "q26_text_stats": X4.TEXT_STATS_SQL,
    "q27_token_topk": X4.TOKEN_TOPK_SQL,
    "q28_tfidf_top_terms": X4.TFIDF_TOP_TERMS_SQL,
    "q29_language_id": X4.LANGUAGE_ID_SQL,
    "q30_doc_fingerprint": X4.DOC_FINGERPRINT_SQL,
    "q31_extract_polizas": E.EXTRACT_POLIZAS_SQL,
    "q32_extract_tasaciones": E.EXTRACT_TASACIONES_SQL,
    "q33_extract_inscripciones": E.EXTRACT_INSCRIPCIONES_SQL,
    "q34_blocks_page_text": B.BLOCKS_PAGE_TEXT_SQL,
    "q35_notification_encode": J.NOTIFICATION_ENCODE_SQL,
    "q36_request_decode": J.REQUEST_DECODE_SQL,
    "q37_artifact_keys": D.ARTIFACT_KEYS_SQL,
    "q38_image_features": X3.IMAGE_FEATURES_SQL,
    "q39_frame_sample": X3.FRAME_SAMPLE_SQL,
    "q40_nation_set_ops": R.NATION_SET_OPS_SQL,
    "q41_ann_bucketed_topk": X2.ANN_BUCKETED_TOPK_SQL,
    "q42_token_counts": X4.TOKEN_COUNTS_SQL,
    # q43_notification_ids: C7 uuid() is nondeterministic — deliberately
    # no oracle entry (driver records the weaker rows-only check)
    "q44_ocr_extract_pages": E.OCR_EXTRACT_PAGES_SQL,
    "q45_events_sliding": R.EVENTS_SLIDING_WINDOW_SQL,
    "q46_events_session": R.EVENTS_SESSION_WINDOW_SQL,
    "q47_ivf_topk": X2.IVF_TOPK_SQL,
    "q48_props_decode": J.PROPS_DECODE_SQL,
    "q49_promo_revenue": R.PROMO_REVENUE_SHARE_SQL,
    "q50_neardup_clusters": X1.NEARDUP_CLUSTERS_SQL,
    "q51_quantize_embeddings": X2.QUANTIZE_EMBEDDINGS_SQL,
    "q52_status_cube": R.ORDER_STATUS_CUBE_SQL,
    "q53_approx_distinct": R.SEGMENT_DISTINCT_CUSTOMERS_SQL,
    "q54_purchase_asof_click": R.PURCHASE_ASOF_CLICK_SQL,
    "q55_image_resize": X3.IMAGE_RESIZE_SQL,
    "q56_audio_features": X3.AUDIO_FEATURES_SQL,
    "q57_range_frame": R.ROLLING_SPEND_RANGE_FRAME_SQL,
    "q58_salted_agg": R.SALTED_STATUS_TOTALS_SQL,
    "q59_percentiles": R.PRIORITY_PRICE_PERCENTILES_SQL,
    "q60_grouping_sets": R.STATUS_PRIORITY_GROUPING_SETS_SQL,
    "q61_contamination_check": X5.CONTAMINATION_CHECK_SQL,
    "q62_repetition_stats": X5.REPETITION_STATS_SQL,
    "q63_lexicon_scrub": X5.LEXICON_SCRUB_SQL,
    "q64_stratified_sample": X5.STRATIFIED_SAMPLE_SQL,
    "q65_sequence_packing": X5.SEQUENCE_PACKING_SQL,
    "q66_small_qty_revenue": R.SMALL_QUANTITY_BRAND_REVENUE_SQL,
    "q67_acctbal_deciles": R.ACCTBAL_DECILES_SQL,
    "q68_interval_join": R.CLICK_PURCHASE_INTERVAL_JOIN_SQL,
    "q69_status_pivot": R.STATUS_PRIORITY_PIVOT_SQL,
    "q70_brand_argmax": R.TOP_BRAND_PER_SIZE_SQL,
    "q71_kmeans_update": X2.KMEANS_UPDATE_SQL,
    "q72_status_unpivot": R.STATUS_COUNTS_UNPIVOT_SQL,
    "q73_order_calendar": R.ORDER_CALENDAR_SQL,
    "q74_edit_distance": X1.VARIANT_EDIT_DISTANCE_SQL,
    # fixpoint clustering converges to the bounded-round labeling on
    # this corpus (diameter <= 2), so it shares q50's oracle
    "q75_neardup_fixpoint": X1.NEARDUP_CLUSTERS_SQL,
    "q76_session_paths": R.SESSION_EVENT_PATHS_SQL,
    "q77_rank_functions": R.ORDER_RANK_FUNCTIONS_SQL,
    # q78 is q43's hash-checkable sibling: same row set, deterministic
    # content-derived id (md5 of recordId:sessionId in UUID format)
    "q78_notification_ids_det": J.NOTIFICATION_IDS_DETERMINISTIC_SQL,
    "q79_chunk_dedup": X1.CHUNK_DEDUP_STATS_SQL,
    "q80_pii_redaction": X5.PII_REDACTION_SQL,
    "q81_source_mixture": X5.SOURCE_MIXTURE_SQL,
    "q82_distribution_windows": R.ORDER_DISTRIBUTION_WINDOWS_SQL,
    "q83_nation_presence": R.NATION_PRESENCE_RECONCILE_SQL,
    "q84_shingle_containment": X1.SHINGLE_CONTAINMENT_SQL,
    "q85_length_histogram": X4.LENGTH_HISTOGRAM_SQL,
    "q86_pq_quantize": X2.PQ_QUANTIZE_SQL,
    "q87_surrogate_keys": R.SURROGATE_KEYS_SQL,
    "q88_scene_segments": X3.SCENE_SEGMENTS_SQL,
    "q89_cogroup_attribution": R.COGROUP_ATTRIBUTION_SQL,
    "q90_ann_recall_audit": X2.ANN_RECALL_AUDIT_SQL,
    "q91_unigram_surprisal": X4.UNIGRAM_SURPRISAL_SQL,
    "q92_dedup_keep_canonical": X1.DEDUP_KEEP_CANONICAL_SQL,
    "q93_semantic_dedup": X2.SEMANTIC_DEDUP_SQL,
    "q94_quantity_price_stats": R.QUANTITY_PRICE_STATS_SQL,
    "q95_calendar_resample": R.ORDER_CALENDAR_RESAMPLE_SQL,
    "q96_only_late_supplier": R.ONLY_LATE_SUPPLIER_SQL,
    "q97_weighted_sample": X5.WEIGHTED_SAMPLE_SQL,
    "q98_user_snapshot_diff": R.USER_SNAPSHOT_DIFF_SQL,
    "q99_bigram_pmi": X4.BIGRAM_PMI_SQL,
    "q100_purchase_nearest_click": R.PURCHASE_NEAREST_CLICK_SQL,
    "q101_rag_chunking": X5.RAG_CHUNKING_SQL,
    "q102_inverted_index": X4.INVERTED_INDEX_SQL,
    "q103_funnel_conversion": R.FUNNEL_CONVERSION_SQL,
    "q104_revenue_interpolation": R.REVENUE_INTERPOLATION_SQL,
    "q105_zscore_anomalies": R.ZSCORE_ANOMALIES_SQL,
    "q106_idle_rich_customers": R.IDLE_RICH_CUSTOMERS_SQL,
    "q107_matryoshka_audit": X2.MATRYOSHKA_AUDIT_SQL,
    "q108_nucleus_vocab": X4.NUCLEUS_VOCAB_SQL,
    "q109_activity_history_scd2": R.ACTIVITY_HISTORY_SCD2_SQL,
    "q110_join_key_skew_profile": R.JOIN_KEY_SKEW_PROFILE_SQL,
    "q111_supplier_hops_bfs": R.SUPPLIER_HOPS_BFS_SQL,
    "q112_decayed_user_score": R.DECAYED_USER_SCORE_SQL,
    "q113_cohort_retention": R.COHORT_RETENTION_SQL,
    "q114_bm25_retrieval": X4.BM25_RETRIEVAL_SQL,
    "q115_langid_confusion": X4.LANGID_CONFUSION_SQL,
    "q116_cumulative_distinct": R.CUMULATIVE_DISTINCT_USERS_SQL,
    "q117_segment_spend_gini": R.SEGMENT_SPEND_GINI_SQL,
    "q118_part_pair_baskets": R.PART_PAIR_BASKETS_SQL,
    "q119_incremental_totals": R.INCREMENTAL_PRIORITY_TOTALS_SQL,
    "q120_monthly_momentum": R.MONTHLY_REVENUE_MOMENTUM_SQL,
    "q121_cusum_changepoints": R.CUSUM_CHANGEPOINTS_SQL,
}
