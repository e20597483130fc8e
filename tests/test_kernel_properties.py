"""Property tests: the NumPy signature kernels must bit-match a direct
Python transcription of the oracle semantics on ARBITRARY corpora.

The example-based kernel tests cover the planted corpus; these cover
the space around it — unicode tokens, empty tokens (split(' ') keeps
them), whitespace runs, None text, sub-shingle-length docs, duplicate
tokens — where vectorized boundary math (document-straddling windows,
factorize over mixed batches) is most likely to drift from the
per-row definition.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st

from sbs_suptech_etl_v2_spark.operators.dedup import (
    MERSENNE_P,
    MINHASH_A,
    MINHASH_B,
    N_HASHES,
    SHINGLE_K,
    _minhash_signatures,
    _shingle_sets,
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) % MERSENNE_P


def _ref_shingles(text: str) -> list[int]:
    """Direct transcription of the _shingle_hashes expression (ordered,
    with duplicates — distinctness is applied by the set variant)."""
    toks = text.split(" ")
    if len(toks) >= SHINGLE_K:
        hs = [_h32(t) for t in toks]
        return [
            ((hs[i] * 31 + hs[i + 1]) * 31 + hs[i + 2]) % MERSENNE_P
            for i in range(len(hs) - SHINGLE_K + 1)
        ]
    return [_h32(text)]


def _ref_minhash(text: str) -> list[int]:
    vals = _ref_shingles(text)
    return [
        min((a * v + b) % MERSENNE_P for v in vals)
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]


# tokens that stress split(' ') semantics: empties, unicode, repeats
_token = st.one_of(
    st.just(""),
    st.text(alphabet="abcáé日本語ñ✓", min_size=1, max_size=6),
    st.sampled_from(["the", "the", "a"]),  # forced repeats
)
_text = st.one_of(
    st.none(),
    st.just(""),
    st.lists(_token, min_size=1, max_size=30).map(lambda ws: " ".join(ws)),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_text, min_size=1, max_size=12))
def test_minhash_kernel_matches_reference(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["sig"] for r in _minhash_signatures(df).collect()
    }
    for i, t in enumerate(texts):
        expect = None if t is None else _ref_minhash(t)
        assert got[i] == expect, (i, t)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_text, min_size=1, max_size=10))
def test_shingle_set_kernel_matches_reference(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["hashes"] for r in _shingle_sets(df).collect()
    }
    for i, t in enumerate(texts):
        if t is None:
            assert got[i] is None, (i, t)
        else:
            assert sorted(got[i]) == sorted(set(_ref_shingles(t))), (i, t)
