"""Connected-components dedup clustering (operators/cluster.py).

Oracle: a driver-side union-find over the same pairs — the cluster id of
every node must equal the minimum id of its component, and dedup_clusters
must keep exactly one representative per cluster.
"""

import random

import pytest
from pyspark.sql import functions as F

from pysearchlite_spark.operators.cluster import (connected_components,
                                                  dedup_clusters)


def _union_find(n_nodes, pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id root: path-compress fully, then map to component min
    comp = {}
    for x in list(parent):
        comp.setdefault(find(x), []).append(x)
    out = {}
    for root, members in comp.items():
        m = min(members + [root])
        for x in members + [root]:
            out[x] = m
    return out


def _cc_dict(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    return {r["node"]: r["cluster"]
            for r in connected_components(df).collect()}


def test_chain_collapses_to_min(spark):
    # a path graph is the adversarial case for label propagation —
    # alternating star must still converge (O(log n) rounds) to min id
    pairs = [(i, i + 1) for i in range(0, 63)]
    got = _cc_dict(spark, pairs)
    assert got == {i: 0 for i in range(64)}


def test_two_components_and_orientation(spark):
    pairs = [(5, 3), (3, 9), (20, 21), (21, 20), (22, 21)]
    got = _cc_dict(spark, pairs)
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 22: 20}


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "a long, b long")
    assert connected_components(df).count() == 0


def test_self_loops_ignored(spark):
    got = _cc_dict(spark, [(4, 4), (4, 7)])
    assert got == {4: 4, 7: 4}


def test_self_loop_only_node_kept(spark):
    # a node whose ONLY appearance is a self-loop must still get a row
    # (contract: every node in `pairs`), mapped to itself
    got = _cc_dict(spark, [(4, 4), (9, 8)])
    assert got == {4: 4, 8: 8, 9: 8}
    assert _cc_dict(spark, [(4, 4)]) == {4: 4}


def test_randomized_vs_union_find(spark):
    rng = random.Random(99)
    for trial in range(3):
        n = 80
        pairs = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(rng.randint(10, 60))]
        pairs = [(a, b) for a, b in pairs if a != b]
        want = _union_find(n, pairs)
        got = _cc_dict(spark, pairs)
        assert got == want, trial


def test_dedup_clusters_end_to_end(spark):
    # planted near-dup group {0,1,2} (chained: 0~1 and 1~2 overlap but
    # 0~2 only transitively) + exact pair {3,4} + uniques {5,6}
    docs = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon eta"),
        (2, "beta gamma delta epsilon eta theta"),
        (3, "totally different words entirely here now"),
        (4, "totally different words entirely here now"),
        (5, "unique first vocabulary one two three"),
        (6, "another singleton document four five six"),
    ]
    df = spark.createDataFrame([(i, t) for i, t in docs],
                               "doc_id long, text string")
    out = {r["doc_id"]: (r["cluster_id"], r["is_dup"])
           for r in dedup_clusters(df, threshold=0.7).collect()}
    assert out == {0: (0, False), 1: (0, True), 2: (0, True),
                   3: (3, False), 4: (3, True),
                   5: (5, False), 6: (6, False)}
    # keep-list = exactly one representative per cluster, ids preserved
    kept = sorted(k for k, (c, d) in out.items() if not d)
    assert kept == [0, 3, 5, 6]


def test_dedup_clusters_external_pairs(spark):
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(6)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 5), (5, 2)], "a long, b long")
    out = {r["doc_id"]: r["cluster_id"]
           for r in dedup_clusters(docs, pairs=pairs).collect()}
    assert out == {0: 0, 1: 1, 2: 0, 3: 3, 4: 4, 5: 0}
