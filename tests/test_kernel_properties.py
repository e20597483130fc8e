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


# -- round-9: the Arrow fold kernels vs the Catalyst expression fold --------
#
# The similarity family's numpy kernels claim BIT-identical results to
# the F.aggregate(F.zip_with(...)) left fold they replaced (and to the
# oracle's list_reduce). Pin that with adversarial doubles: subnormals,
# huge/tiny magnitude mixes (catastrophic cancellation orders), signed
# zeros, NaN and infinities.

_double = st.one_of(
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.just(0.0),
    st.just(-0.0),
    st.just(5e-324),
    st.just(1.7976931348623157e308),
    st.just(float("nan")),
    st.just(float("inf")),
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.integers(min_value=1, max_value=16).flatmap(
        lambda d: st.lists(
            st.tuples(
                st.lists(_double, min_size=d, max_size=d),
                st.lists(_double, min_size=d, max_size=d),
            ),
            min_size=1,
            max_size=6,
        )
    )
)
def test_np_fold_dot_bit_matches_expression_fold(spark, pairs):
    import struct

    import numpy as np
    from pyspark.sql import functions as F

    from sbs_suptech_etl_v2_spark.operators.similarity import (
        _dot,
        _np_fold_dot,
    )

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "i long, a array<double>, b array<double>",
    )
    jvm = {
        r["i"]: r["s"]
        for r in df.select("i", _dot(F.col("a"), F.col("b")).alias("s")).collect()
    }
    A = np.stack([np.asarray(a, dtype=np.float64) for a, _ in pairs])
    B = np.stack([np.asarray(b, dtype=np.float64) for _, b in pairs])
    ker = _np_fold_dot(A, B)

    def bits(x):
        # any-NaN compares equal: the JVM canonicalizes NaN (always
        # +0x7ff8…) while IEEE multiply/add in numpy may carry the
        # operand's sign/payload — semantically identical, and every
        # parity canon maps NaN to one token before hashing
        import math

        if math.isnan(x):
            return b"nan"
        return struct.pack("<d", x)

    for i in range(len(pairs)):
        assert bits(jvm[i]) == bits(float(ker[i])), (i, pairs[i], jvm[i], ker[i])


def test_np_keep_mirrors_engine_nan_ordering(spark):
    """Spark and DuckDB both order NaN above every number, so a NaN
    dot KEEPS its row; numpy's ``NaN > 0`` is False — ``_np_keep``
    carries the explicit disjunct. Prove the Spark side of the claim
    (the DuckDB side is a documented engine rule exercised by the
    oracle WHERE clauses)."""
    import numpy as np
    from pyspark.sql import functions as F

    from sbs_suptech_etl_v2_spark.operators.similarity import _np_keep

    df = spark.createDataFrame(
        [(0, float("nan")), (1, 0.0), (2, -1.0), (3, 2.0), (4, float("inf"))],
        "i long, x double",
    )
    spark_kept = {
        r["i"] for r in df.filter(F.col("x") > 0).collect()
    }
    acc = np.array([float("nan"), 0.0, -1.0, 2.0, float("inf")])
    np_kept = {i for i, k in enumerate(_np_keep(acc)) if k}
    assert spark_kept == np_kept == {0, 3, 4}


def test_null_element_vs_nan_vector(spark, tmp_path, oracle_sf_dir):
    """Round-9 review regression pin: a NULL ELEMENT poisons both
    engines' folds to NULL and the row must DROP, while a genuine-NaN
    vector folds to NaN and must be KEPT (NaN orders above every
    number in Spark and DuckDB). Arrow hands the kernels NaN for both
    cases, so the distinction is restored JVM-side (_whole_vecs) —
    without it the kernels kept NULL-element rows the oracles drop."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sbs_suptech_etl_v2_spark.io import TABLES
    from sbs_suptech_etl_v2_spark.registry import ORACLE, QUERIES
    from tests.parity import assert_parity

    fixture = tmp_path / "sf_nullelem"
    fixture.mkdir()
    for t in TABLES:
        if t != "embeddings":
            os.symlink(
                f"{oracle_sf_dir}/{t}.parquet", str(fixture / f"{t}.parquet")
            )
    tbl = pq.read_table(f"{oracle_sf_dir}/embeddings.parquet")
    rows = tbl.slice(0, 60).to_pylist()
    dim = len(rows[0]["embedding"])
    # victim 1: inner NULL -> NULL fold -> dropped by both engines
    rows[7]["embedding"][3] = None
    # victim 2: genuine NaN vector -> NaN fold -> KEPT by both engines
    rows[11]["embedding"] = [float("nan")] * dim
    # victim 3: whole-NULL embedding -> dropped by both engines
    rows[13]["embedding"] = None
    pq.write_table(
        pa.Table.from_pylist(rows, schema=tbl.schema),
        str(fixture / "embeddings.parquet"),
    )

    for q in ("q24_topk_cosine", "q25_embedding_neardup"):
        assert_parity(spark, QUERIES[q], ORACLE[q], str(fixture), q)

    # the live-vector set itself: NULL-element + whole-NULL dropped,
    # NaN kept
    from sbs_suptech_etl_v2_spark.operators.similarity import _dbl, _unit
    from pyspark.sql import functions as F

    emb = spark.read.parquet(str(fixture / "embeddings.parquet"))
    live = {
        r["vec_id"]
        for r in _unit(
            emb.select("vec_id", _dbl(F.col("embedding")).alias("v"))
        ).collect()
    }
    assert rows[7]["vec_id"] not in live
    assert rows[13]["vec_id"] not in live
    assert rows[11]["vec_id"] in live
