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

# Round-11 rotation (VERDICT r10 directive #1): slots 1-30 = the 30
# queries whose newest driver verdict is r08; slots 31-41 = oldest-r09
# backfill q02-q13; slots 42-50 = the r09 block continued in numeric
# order. Update this literal TOGETHER with registry.py each rotation.
ROTATION_R11 = [
    # slots 1-30: r08-verdict block
    "q01_pricing_summary",
    "q06_revenue_by_nation",
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
    "q39_frame_sample",
    "q40_nation_set_ops",
    "q42_token_counts",
    "q43_notification_ids",
    "q44_ocr_extract_pages",
    "q46_events_session",
    "q49_promo_revenue",
    "q50_neardup_clusters",
    "q52_status_cube",
    "q53_approx_distinct",
    "q54_purchase_asof_click",
    "q56_audio_features",
    "q57_range_frame",
    "q59_percentiles",
    "q60_grouping_sets",
    "q66_small_qty_revenue",
    "q95_calendar_resample",
    # slots 31-41: oldest-r09 backfill, q02-q13 first
    "q02_metadata_lookup_join",
    "q03_top_orders_per_customer",
    "q04_semi_join_open_orders",
    "q05_anti_join_no_orders",
    "q07_branch_union",
    "q08_priority_rollup",
    "q09_distinct_agg",
    "q10_running_window",
    "q11_positional_pick",
    "q12_set_ops",
    "q13_events_tumbling",
    # slots 42-50: next-oldest r09 backfill (numeric order)
    "q38_image_features",
    "q55_image_resize",
    "q58_salted_agg",
    "q61_contamination_check",
    "q63_lexicon_scrub",
    "q64_stratified_sample",
    "q67_acctbal_deciles",
    "q68_interval_join",
    "q69_status_pivot",
]


def test_window_prefix_matches_committed_rotation():
    assert len(ROTATION_R11) == WINDOW_SIZE
    assert len(set(ROTATION_R11)) == WINDOW_SIZE
    prefix = list(QUERIES)[:WINDOW_SIZE]
    assert prefix == ROTATION_R11, (
        "the driver-facing 50-entry registry prefix no longer matches "
        "the committed rotation list — if this is an intentional "
        "rotation, update ROTATION_R11 in this test alongside "
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
