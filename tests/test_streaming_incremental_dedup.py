"""Streaming near-dup dedup at ingest — §2.10 × EXT-1 composition.

Two micro-batches of documents flow through a foreachBatch pipeline
that probes and then grows the persisted LSH index; the union of the
per-epoch pair outputs must equal the full-batch miner's pairs over
the same corpus (same pairs, same est_jaccard), and replaying an epoch
must not duplicate index rows (idempotent-by-layout contract).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sbs_suptech_etl_v2_spark.io import table
from sbs_suptech_etl_v2_spark.operators.dedup import (
    _variant_corpus,
    incremental_dedup_batch_fn,
    minhash_neardup,
)
from sbs_suptech_etl_v2_spark.streaming.ingress import (
    foreach_batch_pipeline,
    stop_quietly,
)


def _write_batch(path, rows):
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")


def _pairset(df):
    return sorted(
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b), float(r.est_jaccard))
        for r in df.collect()
    )


def test_streaming_ingest_dedup_equals_batch_miner(spark, sf_dir, tmp_path):
    corpus = _variant_corpus(table(spark, sf_dir, "documents"))
    rows = [r.asDict() for r in corpus.collect()]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # two arrival waves: even ids land first, odd ids second
    _write_batch(in_dir / "batch-a.json", [r for r in rows if r["doc_id"] % 2 == 0])
    _write_batch(in_dir / "batch-b.json", [r for r in rows if r["doc_id"] % 2 == 1])

    index_path = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    q = foreach_batch_pipeline(
        stream,
        incremental_dedup_batch_fn(index_path, pairs_dir),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    stop_quietly(q, timeout_s=300)

    got = _pairset(
        spark.read.parquet(pairs_dir).select("doc_a", "doc_b", "est_jaccard")
    )
    want = _pairset(minhash_neardup(spark, sf_dir))
    assert got == want
    # both epochs contributed (within-wave pairs and cross-wave pairs)
    n_epochs = (
        spark.read.parquet(pairs_dir).select("ingest_batch").distinct().count()
    )
    assert n_epochs == 2
    # the grown index covers the whole corpus
    assert (
        spark.read.parquet(index_path).select("doc_id").distinct().count()
        == corpus.count()
    )


def test_epoch_replay_is_idempotent_in_rows_and_pair_content(spark, sf_dir, tmp_path):
    # the dangerous replay: the epoch CRASHED AFTER its index append,
    # so the re-run probes an index that already contains its own rows.
    # Row counts AND the pair content must come out identical — the
    # first version of this operator passed a count-only check while
    # emitting (x, x) self-pairs at est 1.0 on exactly this path.
    corpus = _variant_corpus(table(spark, sf_dir, "documents")).limit(50)
    index_path = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    fn = incremental_dedup_batch_fn(index_path, pairs_dir)
    fn(corpus, 0)
    index_before = spark.read.parquet(index_path).count()
    pairs_before = _pairset(spark.read.parquet(pairs_dir))
    fn(corpus, 0)  # at-least-once replay of the same epoch
    assert spark.read.parquet(index_path).count() == index_before
    pairs_after = _pairset(spark.read.parquet(pairs_dir))
    assert pairs_after == pairs_before
    assert all(a != b for a, b, _ in pairs_after)  # no self-pairs ever
    assert spark.read.parquet(pairs_dir).select("ingest_batch").distinct().count() == 1


def test_upsert_reingest_emits_no_self_pairs_or_mirrored_pairs(spark, sf_dir, tmp_path):
    # a lake re-ingests documents whose doc_ids are ALREADY indexed
    # (upsert pipelines do this constantly): the probe must not pair a
    # document with its own indexed copy, and a true pair whose both
    # endpoints were re-ingested must appear once, not once per
    # orientation
    from sbs_suptech_etl_v2_spark.operators.dedup import (
        incremental_neardup,
        write_minhash_index,
    )

    corpus = _variant_corpus(table(spark, sf_dir, "documents"))
    index_path = str(tmp_path / "index")
    write_minhash_index(corpus, index_path)
    reingested = incremental_neardup(corpus, spark.read.parquet(index_path))
    got = sorted((r.doc_a, r.doc_b) for r in reingested.collect())
    assert all(a < b for a, b in got)  # canonical orientation, no (x, x)
    assert len(got) == len(set(got))  # no orientation duplicates
    want = sorted(
        (r.doc_a, r.doc_b) for r in minhash_neardup(spark, sf_dir).collect()
    )
    assert got == want  # exactly the true pair set, nothing else
