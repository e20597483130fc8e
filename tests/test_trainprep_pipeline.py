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


# -- round-9: stage-accounting invariant under adversarial corpora ----------
#
# VERDICT r08 directive #6: the report's invariant — every document
# lands in EXACTLY one bucket and the buckets sum to the raw corpus —
# must hold on degenerate inputs, not just the benign fixture: an
# all-duplicate corpus, an all-contaminated one, an empty one, and an
# all-NULL-text one.

_REASONS = {
    "kept",
    "near_duplicate",
    "benchmark_eval",
    "no_text",
    "repetitive",
    "contaminated",
}


def _write_docs(tmp_path, name, rows, schema):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / name
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), str(d / "documents.parquet"))
    return str(d)


def _assert_invariants(spark, fixture, n_rows):
    rep = {
        r["reason"]: r["n_docs"] for r in curation_report(spark, fixture).collect()
    }
    assert set(rep) <= _REASONS
    assert all(v > 0 for v in rep.values())
    assert sum(rep.values()) == n_rows
    kept = curate_corpus(spark, fixture).collect()
    assert rep.get("kept", 0) == len(kept)
    kept_ids = [r["doc_id"] for r in kept]
    assert len(set(kept_ids)) == len(kept_ids)
    return rep


def _doc_slice(sf_dir, n=30):
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/documents.parquet")
    return tbl.slice(0, n).to_pylist(), tbl.schema


def test_invariant_all_duplicate_corpus(spark, tmp_path, sf_dir):
    rows, schema = _doc_slice(sf_dir)
    text = next(r["text"] for r in rows if r["text"] and len(r["text"]) > 50)
    for r in rows:
        r["text"] = text
    fixture = _write_docs(tmp_path, "all_dup", rows, schema)
    rep = _assert_invariants(spark, fixture, len(rows))
    # one canonical survives per cluster; everything else is dropped at
    # the dedup stage (reason order: near_duplicate wins even for docs
    # that would also fail later gates)
    assert rep.get("near_duplicate", 0) >= len(rows) - 2
    assert rep.get("kept", 0) <= 1


def test_invariant_all_contaminated_corpus(spark, tmp_path, sf_dir):
    rows, schema = _doc_slice(sf_dir)
    bench_tokens = [f"b{i}" for i in range(30)]
    for i, r in enumerate(rows):
        if r["doc_id"] % BENCH_MOD == 0:
            r["text"] = " ".join(bench_tokens)
        else:
            # ~23% shingle overlap with the benchmark (>= the 15% flag)
            # but pairwise Jaccard ~0.2 — far below near-dup territory,
            # so the docs reach the contamination stage un-deduped
            r["text"] = " ".join(bench_tokens[:20] + [f"u{i}x{j}" for j in range(60)])
    fixture = _write_docs(tmp_path, "all_contam", rows, schema)
    rep = _assert_invariants(spark, fixture, len(rows))
    n_bench = sum(1 for r in rows if r["doc_id"] % BENCH_MOD == 0)
    # benchmark docs share identical text, so all but one of them fall
    # to the (earlier) dedup stage; a handful of eval docs may also
    # LSH-collide — the invariant under test is that everything else
    # lands in 'contaminated' and NOTHING trains
    assert rep.get("contaminated", 0) >= len(rows) - n_bench - 4
    assert rep.get("kept", 0) == 0


def test_invariant_empty_corpus(spark, tmp_path, sf_dir):
    rows, schema = _doc_slice(sf_dir)
    fixture = _write_docs(tmp_path, "empty_docs", [], schema)
    rep = _assert_invariants(spark, fixture, 0)
    assert rep == {}


def test_invariant_all_null_text_corpus(spark, tmp_path, sf_dir):
    rows, schema = _doc_slice(sf_dir)
    for r in rows:
        r["text"] = None
    fixture = _write_docs(tmp_path, "all_null", rows, schema)
    rep = _assert_invariants(spark, fixture, len(rows))
    # no text anywhere: only the id-arithmetic benchmark bucket and the
    # no_text bucket may appear — and nothing trains
    assert set(rep) <= {"benchmark_eval", "no_text"}
    assert rep.get("kept", 0) == 0
