"""Incremental dedup against a persisted LSH index.

The 100 TB posture: sign the lake once (``write_minhash_index``), then
each arriving batch signs only itself and probes the index
(``incremental_neardup``). The contract pinned here: incremental pairs
(batch×index ∪ batch×batch) plus the index's own historical pairs must
reproduce EXACTLY the full-batch ``minhash_neardup`` pair set — same
pairs, same est_jaccard values — so switching a pipeline from batch
re-mining to incremental probing never changes its dedup decisions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sbs_suptech_etl_v2_spark.io import table
from sbs_suptech_etl_v2_spark.operators.dedup import (
    _variant_corpus,
    incremental_neardup,
    minhash_neardup,
    write_minhash_index,
)


def _pairset(df):
    # orientation-insensitive: cross pairs come out (new, old) while the
    # batch miner orders by id
    return sorted(
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b), float(r.est_jaccard))
        for r in df.collect()
    )


def test_incremental_equals_batch(spark, sf_dir, tmp_path):
    corpus = _variant_corpus(table(spark, sf_dir, "documents"))
    existing = corpus.filter(F.col("doc_id") % 2 == 0)
    arriving = corpus.filter(F.col("doc_id") % 2 == 1)

    index_path = str(tmp_path / "lsh_index")
    write_minhash_index(existing, index_path)
    index = spark.read.parquet(index_path)
    # the persisted layout carries everything a probe needs
    assert set(index.columns) == {"doc_id", "sig", "band_id", "band_sig"}

    incremental = incremental_neardup(arriving, index)
    # historical pairs: both endpoints even (mined when the index was
    # built — simulated here by filtering the batch miner's output)
    batch = minhash_neardup(spark, sf_dir)
    historical = batch.filter(
        (F.col("doc_a") % 2 == 0) & (F.col("doc_b") % 2 == 0)
    )

    got = sorted(_pairset(incremental) + _pairset(historical))
    want = _pairset(batch)
    assert got == want
    # non-vacuous: the planted variants guarantee pairs in BOTH legs
    assert _pairset(incremental) and _pairset(historical)


def test_index_is_band_partitioned(spark, sf_dir, tmp_path):
    corpus = _variant_corpus(table(spark, sf_dir, "documents"))
    index_path = str(tmp_path / "lsh_index")
    write_minhash_index(corpus, index_path)
    import os

    subdirs = {d for d in os.listdir(index_path) if d.startswith("band_id=")}
    assert len(subdirs) >= 2  # directory-level pruning is real
    # a band-restricted probe prunes partitions at the scan
    pruned = spark.read.parquet(index_path).filter(F.col("band_id") == 0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "band_id" in plan
    assert pruned.count() > 0
