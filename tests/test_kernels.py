"""NumPy-kernel edge cases the oracle corpus never exercises.

The vectorized ``mapInPandas`` kernels (minhash signatures, shingle
sets) must agree with a transparent pure-Python reference on NULL text,
empty strings, sub-shingle-length docs, repeated tokens, and non-ASCII —
the batch-vectorized index math (factorize, boundary masking, reduceat
segments) is exactly where such edges break silently.
"""

from __future__ import annotations

import hashlib

from sbs_suptech_etl_v2_spark.operators.dedup import (
    MERSENNE_P,
    MINHASH_A,
    MINHASH_B,
    SHINGLE_K,
    _minhash_signatures,
    _shingle_sets,
)

EDGE_TEXTS = [
    (0, None),
    (1, ""),
    (2, "solo"),
    (3, "two words"),
    (4, "a b c"),
    (5, "a a a a a"),
    (6, "the quick brown fox jumps over the lazy dog"),
    (7, "á é í ó ú ñ"),
    (8, "x " * 40 + "y"),  # long doc with heavy repetition
]


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) % MERSENNE_P


def _ref_shingles(text: str | None) -> list[int] | None:
    if text is None:
        return None
    toks = text.split(" ")
    if len(toks) >= SHINGLE_K:
        th = [_h32(w) for w in toks]
        return [
            ((th[i] * 31 + th[i + 1]) * 31 + th[i + 2]) % MERSENNE_P
            for i in range(len(th) - 2)
        ]
    return [_h32(text)]


def _ref_sig(text: str | None) -> list[int] | None:
    sh = _ref_shingles(text)
    if sh is None:
        return None
    return [min((a * h + b) % MERSENNE_P for h in sh) for a, b in zip(MINHASH_A, MINHASH_B)]


def test_minhash_kernel_matches_reference_on_edges(spark):
    df = spark.createDataFrame(EDGE_TEXTS, "doc_id bigint, text string").repartition(3)
    got = {r["doc_id"]: r["sig"] for r in _minhash_signatures(df).collect()}
    for doc_id, text in EDGE_TEXTS:
        assert got[doc_id] == _ref_sig(text), f"doc {doc_id} ({text!r})"


def test_shingle_set_kernel_matches_reference_on_edges(spark):
    df = spark.createDataFrame(EDGE_TEXTS, "doc_id bigint, text string").repartition(3)
    got = {r["doc_id"]: r["hashes"] for r in _shingle_sets(df).collect()}
    for doc_id, text in EDGE_TEXTS:
        ref = _ref_shingles(text)
        ref = sorted(set(ref)) if ref is not None else None
        have = sorted(got[doc_id]) if got[doc_id] is not None else None
        assert have == ref, f"doc {doc_id} ({text!r})"


def test_repetition_kernel_counts_exact_on_edges(spark):
    from sbs_suptech_etl_v2_spark.operators import trainprep

    # drive the registry query builder over a crafted table by writing
    # a documents.parquet with the edge rows (lang/source/n_chars are
    # pass-through columns)
    import os

    rows = [
        (i, t, "en", "srcX", len(t) if t else 0)
        for i, t in EDGE_TEXTS
        if t is not None and t != ""  # the SQL contract assumes non-empty text
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    out = {}
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        got = trainprep.repetition_stats(spark, d).collect()
        for r in got:
            out[r["doc_id"]] = r
    for doc_id, text in EDGE_TEXTS:
        if text is None or text == "":
            continue
        toks = text.split(" ")
        n = len(toks)
        counts = {t: toks.count(t) for t in set(toks)}
        top = max(counts.values())
        dup = sum(c for c in counts.values() if c >= 2)
        bigrams = [f"{toks[i]} {toks[i+1]}" for i in range(n - 1)]
        top_bg = max((bigrams.count(b) for b in set(bigrams)), default=0)
        r = out[doc_id]
        assert (r["n_tokens"], r["top_token_n"], r["dup_token_n"], r["top_bigram_n"]) == (
            n,
            top,
            dup,
            top_bg,
        ), f"doc {doc_id} ({text!r})"
