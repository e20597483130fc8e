"""Partition invariance — results must not depend on the shuffle layout.

On a real cluster the partition count is an ops knob, not a semantic
input: the same query must produce byte-identical results at 3 and at
8 shuffle partitions. The queries picked here are exactly the ones
whose HISTORY tempts layout dependence: salted aggregation (salt must
be row-stable), deterministic sampling (md5 buckets, not TABLESAMPLE),
surrogate keys (ids derived from range-partition offsets), fixed-point
k-means means, minhash pair mining through a checkpoint, and the
bucketed cogroup kernel.
"""

from __future__ import annotations

import math

import pytest

from sbs_suptech_etl_v2_spark.registry import QUERIES

QUERIES_UNDER_TEST = [
    "q58_salted_agg",
    "q64_stratified_sample",
    "q87_surrogate_keys",
    "q71_kmeans_update",
    "q21_minhash_neardup",
    "q89_cogroup_attribution",
    # round 6: decimal-quantized surprisal sums (order-free by
    # construction — this pins it), the two-leg recall audit join, and
    # the cluster-map broadcast behind the canonical keeper
    "q91_unigram_surprisal",
    "q90_ann_recall_audit",
    "q92_dedup_keep_canonical",
    # round 6 batch 2: hash-keyed weighted sampling (rank boundary must
    # not move with layout), chunk hashes, and window decimal moments
    "q97_weighted_sample",
    "q101_rag_chunking",
    "q105_zscore_anomalies",
    # batch 3: integer-weighted decay sums and the BFS anti-join chain
    "q112_decayed_user_score",
    "q111_supplier_hops_bfs",
    # batch 5: integer-cents Gini rank sums (the q117 sf0.1 lesson)
    "q117_segment_spend_gini",
    # round 7: BM25 per-doc score is a decimal-quantized sum of per-term
    # doubles — a raw double SUM here would let the 6-decimal rounding
    # (and the top-10 cut ordered by it) flip with partition layout
    "q114_bm25_retrieval",
    # round 7: pure-Column repetition counting replaced the NumPy kernel
    "q62_repetition_stats",
    # round 8: the salted/bigint two-level accumulators — the salt
    # buckets and the bigint->decimal merge must not move the output
    # doubles with the layout (they are exact integer sums at every
    # level, so any difference is a bug in the quantization)
    "q94_quantity_price_stats",
    "q01_pricing_summary",
    "q06_revenue_by_nation",
    # round 8: q96's window -> chained-aggregate rewrite (the lone
    # late supplier must come out of max(when(...)) identically at
    # any partitioning)
    "q96_only_late_supplier",
    # round 9: the Arrow fold kernels — batch boundaries move with the
    # shuffle layout, and the per-row fold must not care (a pairwise /
    # batch-spanning summation would); q71/q90 above already cover the
    # kmeans + recall-audit variants
    "q24_topk_cosine",
    "q25_embedding_neardup",
    "q41_ann_bucketed_topk",
    "q47_ivf_topk",
    "q93_semantic_dedup",
    "q107_matryoshka_audit",
]


def _rows(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    cols = sorted(df.columns)

    def canon(v):
        if isinstance(v, float):
            return "NULL" if math.isnan(v) else "%.17g" % v
        return str(v)

    return sorted(tuple(canon(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES_UNDER_TEST)
def test_results_identical_across_shuffle_layouts(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        at3 = _rows(spark, sf_dir, name)
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        at8 = _rows(spark, sf_dir, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert at3 == at8
