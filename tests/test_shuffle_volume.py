"""Shuffle VOLUME guards — what the exchanges carry, not just how many.

test_plan_quality pins exchange *counts*; these tests pin the bytes.
The scale contract for the dedup family is that document TEXT never
shuffles: signatures, hashes, and verified pair scalars do. A
regression that, say, keeps the text column alive through the band
join would pass the count guards (same exchanges) while multiplying
the shuffled volume by the corpus payload size — exactly the failure
mode that turns a 100 TB run from signature-sized network traffic
into re-shuffling the lake.

Metrics come from the executed plan's SQLMetrics (``dataSize`` on
each ShuffleExchangeExec = UnsafeRow bytes entering the exchange),
read after a ``collect()`` drives the Dataset's own QueryExecution.
Broadcast exchanges are excluded: at this toy SF AQE broadcasts
frames it would sort-merge at scale, and the logical plans carry no
broadcast hints on corpus-sized sides (asserted separately below).
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pyarrow.compute as pc

from sbs_suptech_etl_v2_spark.registry import QUERIES


def _walk(node, out):
    name = node.getClass().getSimpleName()
    out.append((name, node))
    if name == "AdaptiveSparkPlanExec":
        _walk(node.executedPlan(), out)
        return
    children = node.children()
    for i in range(children.size()):
        _walk(children.apply(i), out)
    if name.endswith("QueryStageExec"):
        _walk(node.plan(), out)


def _shuffled_bytes(df) -> list[int]:
    """dataSize per ShuffleExchangeExec after executing ``df``."""
    df.collect()
    nodes: list = []
    _walk(df._jdf.queryExecution().executedPlan(), nodes)
    sizes = []
    for name, node in nodes:
        if name == "ShuffleExchangeExec":
            metrics = node.metrics()
            it = metrics.iterator()
            for _ in range(metrics.size()):
                kv = it.next()
                if kv._1() == "dataSize":
                    sizes.append(kv._2().value())
    return sizes


def _text_bytes(sf_dir: str) -> int:
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    return int(pc.sum(pc.binary_length(tbl.column("text"))).as_py())


def test_q21_shuffles_signatures_and_pairs_never_text(spark, oracle_sf_dir):
    corpus = _text_bytes(oracle_sf_dir)
    sizes = _shuffled_bytes(
        QUERIES["q21_minhash_neardup"](spark, oracle_sf_dir)
    )
    assert sizes, "expected at least the pair-dedup exchange"
    # every real shuffle is pair/signature-scalar-sized: far below the
    # corpus text volume (measured ~6 KB vs ~590 KB text at sf0.01)
    assert sum(sizes) < 0.2 * corpus, (sizes, corpus)


def test_q20_exact_dedup_shuffles_hashes_never_text(spark, oracle_sf_dir):
    corpus = _text_bytes(oracle_sf_dir)
    sizes = _shuffled_bytes(QUERIES["q20_exact_dedup"](spark, oracle_sf_dir))
    assert sizes
    assert sum(sizes) < 0.2 * corpus, (sizes, corpus)


def test_q21_band_join_has_no_broadcast_hint_in_logical_plan(
    spark, oracle_sf_dir
):
    """AQE may broadcast the toy-scale band frame; the LOGICAL plan
    must not force it — at 100 TB both band sides are corpus-sized and
    the join has to degrade to a shuffled equi-join on
    (band_id, band_sig)."""
    df = QUERIES["q21_minhash_neardup"](spark, oracle_sf_dir)
    logical = df._jdf.queryExecution().logical().toString()
    assert "UnresolvedHint" not in logical
    assert "broadcast" not in logical.lower()


def test_q25_shuffles_banded_vectors_never_the_pair_fanout(spark, oracle_sf_dir):
    """Round-9 pin for the bucket-grouped pair scorer: the cell-key
    exchange carries corpus×bands unit-vector ROWS, and the only other
    shuffle is the already-thresholded pair list — a regression back
    to a join-shaped plan would shuffle the C(occupancy, 2) pair
    fan-out (~occupancy× the corpus with TWO vectors per row) and
    multiply these numbers by orders of magnitude."""
    import pyarrow.parquet as pq

    n_vecs = pq.read_metadata(f"{oracle_sf_dir}/embeddings.parquet").num_rows
    n_banded = (n_vecs + n_vecs // 5) * 2  # corpus + planted variants, ×2 bands
    # unit vector row ≈ 64 doubles + ids/buckets ≈ <700 bytes UnsafeRow
    budget = n_banded * 700
    sizes = _shuffled_bytes(QUERIES["q25_embedding_neardup"](spark, oracle_sf_dir))
    assert sizes, "expected the cell-key exchange"
    assert max(sizes) < budget, (sizes, budget)
    # pair-list regroup (dropDuplicates) is result-shaped: tiny
    assert sorted(sizes)[0] < 0.2 * budget, sizes
