"""Pin the driver-facing registry window (VERDICT r10 directive #2).

The external correctness harness samples the first 50 entries of
``registry.QUERIES`` in insertion order. Until round 11 that contract
lived only in a comment, so a refactor could silently reorder the
prefix and starve a stale block of its scheduled re-verification.
These tests make the rotation explicit: the committed list below IS
the round's window, and changing the registry order without updating
it (consciously, as part of a rotation) fails the suite.

No SparkSession — pure import-order assertions.
"""

from __future__ import annotations

from sbs_suptech_etl_v2_spark.registry import ORACLE, QUERIES

WINDOW_SIZE = 50

# Round-16 rotation (VERDICT r15 directive #1): no query or operator
# module changed this round, so there are no changed-query seats;
# slots 1-21 = the 21 r13-fresh leftovers in numeric order (q97,
# q101, q103-q121 — includes the q107/q111 AQE-wobble re-entries,
# the q118 standing-accept re-entry, and the heavy tail
# q114/q116/q117, with expectations pre-registered in SCALING.md);
# slots 22-50 = the 29 oldest r14-fresh in numeric order (q14-q25,
# q36, q41, q44-q58). Update this literal TOGETHER with registry.py
# each rotation.
ROTATION_R16 = [
    # slots 1-21: r13-fresh lead (numeric order)
    "q97_weighted_sample",
    "q101_rag_chunking",
    "q103_funnel_conversion",
    "q104_revenue_interpolation",
    "q105_zscore_anomalies",
    "q106_idle_rich_customers",
    "q107_matryoshka_audit",
    "q108_nucleus_vocab",
    "q109_activity_history_scd2",
    "q110_join_key_skew_profile",
    "q111_supplier_hops_bfs",
    "q112_decayed_user_score",
    "q113_cohort_retention",
    "q114_bm25_retrieval",
    "q115_langid_confusion",
    "q116_cumulative_distinct",
    "q117_segment_spend_gini",
    "q118_part_pair_baskets",
    "q119_incremental_totals",
    "q120_monthly_momentum",
    "q121_cusum_changepoints",
    # slots 22-50: oldest-r14 backfill (numeric order)
    "q14_scalar_refinement",
    "q15_path_parse",
    "q16_pages_concat",
    "q17_metadata_merge",
    "q18_stage_gate_notifications",
    "q19_pages_explode",
    "q20_exact_dedup",
    "q21_minhash_neardup",
    "q22_simhash_signatures",
    "q23_ngram_jaccard",
    "q24_topk_cosine",
    "q25_embedding_neardup",
    "q36_request_decode",
    "q41_ann_bucketed_topk",
    "q44_ocr_extract_pages",
    "q45_events_sliding",
    "q46_events_session",
    "q47_ivf_topk",
    "q48_props_decode",
    "q49_promo_revenue",
    "q50_neardup_clusters",
    "q51_quantize_embeddings",
    "q52_status_cube",
    "q53_approx_distinct",
    "q54_purchase_asof_click",
    "q55_image_resize",
    "q56_audio_features",
    "q57_range_frame",
    "q58_salted_agg",
]


def test_window_prefix_matches_committed_rotation():
    assert len(ROTATION_R16) == WINDOW_SIZE
    assert len(set(ROTATION_R16)) == WINDOW_SIZE
    prefix = list(QUERIES)[:WINDOW_SIZE]
    assert prefix == ROTATION_R16, (
        "the driver-facing 50-entry registry prefix no longer matches "
        "the committed rotation list — if this is an intentional "
        "rotation, update ROTATION_R16 in this test alongside "
        "registry.py; if not, a refactor silently reordered the window"
    )


def test_queries_and_oracle_keys_match_modulo_q43():
    # q43 exercises C7 uuid() — non-deterministic by design, rows-only
    # check (SURVEY §5); its deterministic sibling q78 carries the hash.
    assert set(QUERIES) - set(ORACLE) == {"q43_notification_ids"}
    assert set(ORACLE) <= set(QUERIES)


def test_registry_larger_than_window():
    # the rotation argument assumes more queries than window slots;
    # if the registry ever shrinks to <= 50 the prefix is everything
    # and the rotation machinery (and this pin) should be revisited
    assert len(QUERIES) > WINDOW_SIZE
