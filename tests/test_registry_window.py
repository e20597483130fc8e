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

# Round-12 rotation (VERDICT r11 directive #1): slots 1-2 = this
# round's changed queries (q99/q102 — textops broadcast-hint polish,
# directive #6, re-earning per the changed-query rule); slots 3-22 =
# the 20 remaining r09-fresh leftovers in numeric order; slots 23-50 =
# the 28 oldest r10-fresh in numeric order (q97 displaced by q102's
# seat; it leads round 13). Update this literal TOGETHER with
# registry.py each rotation.
ROTATION_R12 = [
    # slots 1-2: round-12-changed (textops broadcast-hint polish)
    "q99_bigram_pmi",
    "q102_inverted_index",
    # slots 3-22: r09-fresh leftovers (numeric order)
    "q70_brand_argmax",
    "q72_status_unpivot",
    "q73_order_calendar",
    "q74_edit_distance",
    "q75_neardup_fixpoint",
    "q76_session_paths",
    "q77_rank_functions",
    "q78_notification_ids_det",
    "q79_chunk_dedup",
    "q80_pii_redaction",
    "q81_source_mixture",
    "q82_distribution_windows",
    "q83_nation_presence",
    "q84_shingle_containment",
    "q85_length_histogram",
    "q87_surrogate_keys",
    "q91_unigram_surprisal",
    "q92_dedup_keep_canonical",
    "q98_user_snapshot_diff",
    "q100_purchase_nearest_click",
    # slots 23-50: oldest-r10 backfill (numeric order; q97 displaced)
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
    "q71_kmeans_update",
    "q86_pq_quantize",
    "q88_scene_segments",
    "q89_cogroup_attribution",
    "q90_ann_recall_audit",
    "q93_semantic_dedup",
    "q94_quantity_price_stats",
    "q96_only_late_supplier",
]


def test_window_prefix_matches_committed_rotation():
    assert len(ROTATION_R12) == WINDOW_SIZE
    assert len(set(ROTATION_R12)) == WINDOW_SIZE
    prefix = list(QUERIES)[:WINDOW_SIZE]
    assert prefix == ROTATION_R12, (
        "the driver-facing 50-entry registry prefix no longer matches "
        "the committed rotation list — if this is an intentional "
        "rotation, update ROTATION_R12 in this test alongside "
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
