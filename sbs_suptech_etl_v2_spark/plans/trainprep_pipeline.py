"""End-to-end training-data curation — the EXT-5 operators composed.

The registry proves each stage alone (q92 dedup-keep-canonical, q62
repetition gates, q61 contamination, q80 PII audit, q65 packing); this
plan is the shape a real corpus pipeline runs them in, as ONE lazy
DAG: the corpus scan is shared (``io.table`` returns one DataFrame per
(app, path)), every verdict frame is doc-keyed, and the joins are
doc_id equi-joins — so the whole curation is a chain of co-keyed
hash joins over frames no larger than the corpus, with the only
non-doc-keyed shuffles being the ones the stage operators already pay
(band buckets, shingle hits; see each operator's docstring).

Stage semantics (drop reasons are disjoint and auditable):

1. **Near-dup dedup** (EXT-1, q92): only cluster survivors pass —
   'unique' docs and the min-id canonical of every near-dup cluster.
2. **Repetition gates** (q62): Gopher-style keep flag — top-token,
   duplicated-token and top-bigram fractions under their ceilings.
3. **Decontamination** (q61): the benchmark docs themselves
   (doc_id % BENCH_MOD == 0) are EVAL data and never enter training;
   evaluation-side docs sharing >= the flag fraction of shingles with
   the benchmark are dropped as contaminated.
4. **PII redaction** (q80's patterns): emails/phones substituted with
   class tokens in the surviving text.

Output: (doc_id, text, lang, source, n_tokens) — the frame a packing
stage (q65) or mixture ledger (q81) consumes next.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sbs_suptech_etl_v2_spark.io import table
from sbs_suptech_etl_v2_spark.operators.dedup import _words, dedup_keep_canonical
from sbs_suptech_etl_v2_spark.operators.trainprep import (
    BENCH_MOD,
    _EMAIL_RE,
    _PHONE_RE,
    contamination_check,
    repetition_stats,
)


def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curated training corpus — one lazy plan over all gates."""
    docs = table(spark, sf_dir, "documents")
    survivors = dedup_keep_canonical(spark, sf_dir).select("doc_id")
    gates = repetition_stats(spark, sf_dir).select("doc_id", "keep")
    # inner join: docs absent from the contamination frame are the
    # benchmark itself (eval data, excluded from training by design)
    # and NULL-text docs (no shingles to score — nothing to train on
    # either); curation_report buckets the two separately
    contam = contamination_check(spark, sf_dir).select("doc_id", "flagged")
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return (
        docs.join(survivors, "doc_id")
        .join(gates, "doc_id")
        .join(contam, "doc_id")
        .filter(F.col("keep") & ~F.col("flagged"))
        .select(
            "doc_id",
            redacted.alias("text"),
            "lang",
            "source",
            # tokenize the EMITTED text (same _words tokenizer as the
            # gates): counting the pre-redaction column only works
            # while every pattern and class token is space-free, and
            # the packing stage consumes these counts
            F.size(_words(redacted)).cast("bigint").alias("n_tokens"),
        )
    )


def curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per drop reason — the audit trail beside the corpus.

    Reasons are assigned in pipeline order (a doc dropped by dedup is
    counted there even if it would also fail a later gate), so the
    counts sum to exactly the raw corpus size. The benchmark bucket
    tests doc_id membership DIRECTLY — inferring it from a missing
    contamination verdict would fold NULL-text documents (also absent
    from that frame, because they have no shingles) into the
    benchmark count and corrupt the audit; those get their own
    'no_text' bucket.
    """
    docs = table(spark, sf_dir, "documents").select("doc_id")
    survivors = dedup_keep_canonical(spark, sf_dir).select(
        "doc_id", F.lit(True).alias("_s")
    )
    gates = repetition_stats(spark, sf_dir).select("doc_id", "keep")
    contam = contamination_check(spark, sf_dir).select("doc_id", "flagged")
    reason = (
        F.when(F.col("_s").isNull(), "near_duplicate")
        .when(F.col("doc_id") % BENCH_MOD == 0, "benchmark_eval")
        .when(F.col("keep").isNull(), "no_text")
        .when(~F.col("keep"), "repetitive")
        .when(F.col("flagged"), "contaminated")
        .otherwise("kept")
    )
    return (
        docs.join(survivors, "doc_id", "left")
        .join(gates, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .select(reason.alias("reason"))
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
