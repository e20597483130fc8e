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

# Round-14 rotation (VERDICT r13 directive #1): no query or operator
# module changed this round, so there are no changed-query seats;
# slots 1-21 = the 21 r11-fresh leftovers in numeric order (q44, q46,
# q49, q50, q52-q61, q63, q64, q66-q69, q95); slots 22-50 = the 29
# oldest r12-fresh in numeric order (q14-q25, q36, q41, q45, q47,
# q48, q51, q62, q65, q70-q78). q43 leaves the window with its
# standing no_oracle-by-design verdict (r13); q78, its hash-checked
# deterministic sibling, holds slot 50 this round. Update this
# literal TOGETHER with registry.py each rotation.
ROTATION_R14 = [
    # slots 1-21: r11-fresh lead (numeric order)
    "q44_ocr_extract_pages",
    "q46_events_session",
    "q49_promo_revenue",
    "q50_neardup_clusters",
    "q52_status_cube",
    "q53_approx_distinct",
    "q54_purchase_asof_click",
    "q55_image_resize",
    "q56_audio_features",
    "q57_range_frame",
    "q58_salted_agg",
    "q59_percentiles",
    "q60_grouping_sets",
    "q61_contamination_check",
    "q63_lexicon_scrub",
    "q64_stratified_sample",
    "q66_small_qty_revenue",
    "q67_acctbal_deciles",
    "q68_interval_join",
    "q69_status_pivot",
    "q95_calendar_resample",
    # slots 22-50: oldest-r12 backfill (numeric order)
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
    "q45_events_sliding",
    "q47_ivf_topk",
    "q48_props_decode",
    "q51_quantize_embeddings",
    "q62_repetition_stats",
    "q65_sequence_packing",
    "q70_brand_argmax",
    "q71_kmeans_update",
    "q72_status_unpivot",
    "q73_order_calendar",
    "q74_edit_distance",
    "q75_neardup_fixpoint",
    "q76_session_paths",
    "q77_rank_functions",
    "q78_notification_ids_det",
]


def test_window_prefix_matches_committed_rotation():
    assert len(ROTATION_R14) == WINDOW_SIZE
    assert len(set(ROTATION_R14)) == WINDOW_SIZE
    prefix = list(QUERIES)[:WINDOW_SIZE]
    assert prefix == ROTATION_R14, (
        "the driver-facing 50-entry registry prefix no longer matches "
        "the committed rotation list — if this is an intentional "
        "rotation, update ROTATION_R14 in this test alongside "
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
