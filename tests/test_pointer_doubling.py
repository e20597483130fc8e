"""Pointer-doubling (pointer-jumping) fixpoint clustering.

Two claims: (1) composing propagation with a pointer jump converges in
O(log diameter) rounds where plain min-label propagation needs
O(diameter) — shown on a synthetic chain component, the shape that
stalls propagation at scale; (2) the ``pointer_doubling`` flag does not
change the operator's result on the real corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sbs_suptech_etl_v2_spark.operators.dedup import (
    _bidirectional_edges,
    _fixpoint_clusters_from_pairs,
    _initial_labels,
    _pointer_jump,
    _propagate_min_label,
    neardup_clusters,
    neardup_clusters_fixpoint,
)

CHAIN_N = 17  # diameter 16: propagation needs 16 rounds, doubling ~5


def _chain_edges(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(CHAIN_N - 1)], "doc_a bigint, doc_b bigint"
    )
    return _bidirectional_edges(pairs)


def _labels_after(edges, rounds, jump):
    labels = _initial_labels(edges)
    for _ in range(rounds):
        labels = _propagate_min_label(labels, edges)
        if jump:
            labels = _pointer_jump(labels)
        # cut lineage each round — the pure unroll would branch 2^rounds
        labels = labels.localCheckpoint(eager=True)
    return {r["doc_id"]: r["label"] for r in labels.collect()}


def test_doubling_converges_in_log_rounds_where_propagation_does_not(spark):
    edges = _chain_edges(spark)
    converged = {i: 0 for i in range(CHAIN_N)}
    # 5 rounds: propagate+jump >= 3-hops-per-round reach -> converged
    assert _labels_after(edges, 5, jump=True) == converged
    # plain propagation moves the min one hop per round: after 5 rounds
    # the chain's far end still carries a non-min label
    assert _labels_after(edges, 5, jump=False) != converged
    assert _labels_after(edges, CHAIN_N - 1, jump=False) == converged


def test_pointer_doubling_flag_is_result_invariant(spark, sf_dir):
    base = neardup_clusters(spark, sf_dir)
    doubled = neardup_clusters_fixpoint(spark, sf_dir, pointer_doubling=True)
    key = ["doc_id", "cluster_id", "cluster_size"]
    assert sorted(map(tuple, base.select(*key).collect())) == sorted(
        map(tuple, doubled.select(*key).collect())
    )


def test_fixpoint_loop_converges_past_the_seed(spark):
    # the round-6 pure-plan first probe short-circuits graphs that
    # converge inside the seed; this chain does NOT (diameter 16 >>
    # seed 2), so the test drives the full persist-per-round loop —
    # both with and without pointer doubling — through the exact
    # production path and checks the final labeling is the component
    # minimum everywhere
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(CHAIN_N - 1)], "doc_a bigint, doc_b bigint"
    ).localCheckpoint(eager=True)
    expect = sorted((i, 0, CHAIN_N) for i in range(CHAIN_N))
    for doubling in (False, True):
        got = sorted(
            map(
                tuple,
                _fixpoint_clusters_from_pairs(pairs, 25, doubling)
                .select("doc_id", "cluster_id", "cluster_size")
                .collect(),
            )
        )
        assert got == expect, f"pointer_doubling={doubling}"


def test_fixpoint_respects_max_rounds_valve(spark):
    # max_rounds below the chain diameter must still return a valid
    # (partial) labeling without hanging: every label is within the
    # component and monotone <= doc_id
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(CHAIN_N - 1)], "doc_a bigint, doc_b bigint"
    ).localCheckpoint(eager=True)
    rows = _fixpoint_clusters_from_pairs(pairs, 4, False).collect()
    assert rows  # chain stays one (partial) cluster family
    assert all(r["cluster_id"] <= r["doc_id"] for r in rows)


def test_fixpoint_matches_union_find_on_random_graphs(spark):
    # property: on arbitrary pair graphs the production fixpoint (both
    # postures) computes exactly the connected components a plain
    # union-find computes. Deterministic seed batch instead of
    # @given — each case spins real Spark jobs, so a handful of
    # adversarial shapes (chains, stars, cliques-by-parity, random)
    # beats hypothesis' hundreds of tiny examples here.
    import random

    def union_find_components(n_nodes, pairs):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp: dict[int, list[int]] = {}
        for x in set(a for p in pairs for a in p):
            comp.setdefault(find(x), []).append(x)
        return sorted(
            (m, root, len(members))
            for root, members in comp.items()
            if len(members) > 1
            for m in members
        )

    rng = random.Random(20260814)
    cases = [
        [(i, i + 1) for i in range(12)],  # chain
        [(0, i) for i in range(1, 10)],  # star
        [(a, b) for a in range(6) for b in range(a + 1, 6)],  # clique
        [(rng.randrange(30), rng.randrange(30)) for _ in range(25)],
        [(rng.randrange(40), rng.randrange(40)) for _ in range(15)],
    ]
    for pairs in cases:
        pairs = [(a, b) for a, b in pairs if a != b]
        pdf = spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")
        want = union_find_components(max(max(p) for p in pairs) + 1, pairs)
        for doubling in (False, True):
            got = sorted(
                map(
                    tuple,
                    _fixpoint_clusters_from_pairs(
                        pdf.localCheckpoint(eager=True), 60, doubling
                    )
                    .select("doc_id", "cluster_id", "cluster_size")
                    .collect(),
                )
            )
            assert got == want, (pairs, doubling)


def test_jump_is_label_monotone(spark):
    # label(label(u)) <= label(u): the convergence probe's monotonicity
    # argument depends on this
    edges = _chain_edges(spark)
    labels = _propagate_min_label(_initial_labels(edges), edges).localCheckpoint()
    before = {r["doc_id"]: r["label"] for r in labels.collect()}
    after = {r["doc_id"]: r["label"] for r in _pointer_jump(labels).collect()}
    assert all(after[d] <= before[d] for d in before)
