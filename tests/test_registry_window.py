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

# Round-15 rotation (VERDICT r14 directive #1): no query or operator
# module changed this round, so there are no changed-query seats;
# slots 1-21 = the 21 r12-fresh leftovers in numeric order (q79-q94,
# q96, q98-q100, q102 — includes the closed q99 watch item and the
# q96/q118 standing-accept re-entries); slots 22-50 = the 29 oldest
# r13-fresh in numeric order (q01-q13, q26-q35, q37-q40, q42, q43).
# q43 re-enters with its no_oracle-by-design verdict (rows-only
# driver row); q78, its hash-checked deterministic sibling, left the
# window hash-green r14. Update this literal TOGETHER with
# registry.py each rotation.
ROTATION_R15 = [
    # slots 1-21: r12-fresh lead (numeric order)
    "q79_chunk_dedup",
    "q80_pii_redaction",
    "q81_source_mixture",
    "q82_distribution_windows",
    "q83_nation_presence",
    "q84_shingle_containment",
    "q85_length_histogram",
    "q86_pq_quantize",
    "q87_surrogate_keys",
    "q88_scene_segments",
    "q89_cogroup_attribution",
    "q90_ann_recall_audit",
    "q91_unigram_surprisal",
    "q92_dedup_keep_canonical",
    "q93_semantic_dedup",
    "q94_quantity_price_stats",
    "q96_only_late_supplier",
    "q98_user_snapshot_diff",
    "q99_bigram_pmi",
    "q100_purchase_nearest_click",
    "q102_inverted_index",
    # slots 22-50: oldest-r13 backfill (numeric order)
    "q01_pricing_summary",
    "q02_metadata_lookup_join",
    "q03_top_orders_per_customer",
    "q04_semi_join_open_orders",
    "q05_anti_join_no_orders",
    "q06_revenue_by_nation",
    "q07_branch_union",
    "q08_priority_rollup",
    "q09_distinct_agg",
    "q10_running_window",
    "q11_positional_pick",
    "q12_set_ops",
    "q13_events_tumbling",
    "q26_text_stats",
    "q27_token_topk",
    "q28_tfidf_top_terms",
    "q29_language_id",
    "q30_doc_fingerprint",
    "q31_extract_polizas",
    "q32_extract_tasaciones",
    "q33_extract_inscripciones",
    "q34_blocks_page_text",
    "q35_notification_encode",
    "q37_artifact_keys",
    "q38_image_features",
    "q39_frame_sample",
    "q40_nation_set_ops",
    "q42_token_counts",
    "q43_notification_ids",
]


def test_window_prefix_matches_committed_rotation():
    assert len(ROTATION_R15) == WINDOW_SIZE
    assert len(set(ROTATION_R15)) == WINDOW_SIZE
    prefix = list(QUERIES)[:WINDOW_SIZE]
    assert prefix == ROTATION_R15, (
        "the driver-facing 50-entry registry prefix no longer matches "
        "the committed rotation list — if this is an intentional "
        "rotation, update ROTATION_R15 in this test alongside "
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
