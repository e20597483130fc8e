"""End-to-end curation plan: stage semantics compose, counts reconcile.

The stages are individually oracle-verified (q92/q62/q61/q80); these
tests pin the COMPOSITION: set relations between the curated corpus
and each verdict frame, the drop-reason accounting summing exactly to
the corpus, and the output being PII-free.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sbs_suptech_etl_v2_spark.io import table
from sbs_suptech_etl_v2_spark.operators.dedup import dedup_keep_canonical
from sbs_suptech_etl_v2_spark.operators.trainprep import (
    BENCH_MOD,
    _EMAIL_RE,
    _PHONE_RE,
    contamination_check,
    repetition_stats,
)
from sbs_suptech_etl_v2_spark.plans.trainprep_pipeline import (
    curate_corpus,
    curation_report,
)


def test_curated_corpus_respects_every_gate(spark, sf_dir):
    curated = curate_corpus(spark, sf_dir)
    rows = curated.collect()
    assert rows, "curation must keep a non-trivial corpus"
    kept = {r["doc_id"] for r in rows}

    raw = {r["doc_id"] for r in table(spark, sf_dir, "documents").collect()}
    assert kept <= raw

    # no benchmark (eval) docs in training data
    assert all(d % BENCH_MOD != 0 for d in kept)

    # every kept doc survived dedup, passed the repetition gate, and
    # is not contaminated
    survivors = {
        r["doc_id"] for r in dedup_keep_canonical(spark, sf_dir).collect()
    }
    assert kept <= survivors
    gates = {
        r["doc_id"]: r["keep"]
        for r in repetition_stats(spark, sf_dir).collect()
    }
    assert all(gates[d] for d in kept)
    contam = {
        r["doc_id"]: r["flagged"]
        for r in contamination_check(spark, sf_dir).collect()
    }
    assert all(contam[d] is False for d in kept)

    # output text is PII-free and token counts describe the text
    for r in rows:
        assert r["n_tokens"] == len(r["text"].split(" "))
    clean = curated.filter(
        F.col("text").rlike(_EMAIL_RE) | F.col("text").rlike(_PHONE_RE)
    )
    assert clean.count() == 0


def test_curation_report_accounts_for_every_document(spark, sf_dir):
    report = {
        r["reason"]: r["n_docs"]
        for r in curation_report(spark, sf_dir).collect()
    }
    n_raw = table(spark, sf_dir, "documents").count()
    assert sum(report.values()) == n_raw
    # the kept count must equal the curated corpus exactly
    assert report.get("kept", 0) == curate_corpus(spark, sf_dir).count()
    # the benchmark rows land in their own bucket, never 'contaminated'
    n_bench = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % BENCH_MOD == 0)
        .count()
    )
    # benchmark docs that survive dedup + gates appear as
    # benchmark_eval; the rest were already dropped upstream
    assert report.get("benchmark_eval", 0) <= n_bench


def test_null_text_docs_get_their_own_bucket_not_benchmark(spark, tmp_path, sf_dir):
    """Regression pin (round-8 review): NULL-text docs are absent from
    the contamination frame just like benchmark docs; inferring the
    benchmark bucket from that absence mislabeled corrupt documents as
    held-out eval data. The report must bucket them as 'no_text' and
    membership in 'benchmark_eval' must come from doc_id arithmetic.
    """
    import pyarrow.parquet as pq
    import pyarrow as pa

    tbl = pq.read_table(f"{sf_dir}/documents.parquet")
    head = tbl.slice(0, 30).to_pylist()
    victim = next(r["doc_id"] for r in head if r["doc_id"] % BENCH_MOD != 0)
    for r in head:
        if r["doc_id"] == victim:
            r["text"] = None
    fixture = tmp_path / "sf_no_text"
    fixture.mkdir()
    pq.write_table(
        pa.Table.from_pylist(head, schema=tbl.schema),
        str(fixture / "documents.parquet"),
    )

    report = {
        r["reason"]: r["n_docs"]
        for r in curation_report(spark, str(fixture)).collect()
    }
    assert report.get("no_text") == 1
    n_bench = sum(1 for r in head if r["doc_id"] % BENCH_MOD == 0)
    assert report.get("benchmark_eval", 0) <= n_bench
    assert sum(report.values()) == len(head)
    kept_ids = {
        r["doc_id"] for r in curate_corpus(spark, str(fixture)).collect()
    }
    assert victim not in kept_ids
