"""Integer PageRank vs an exact pure-Python oracle."""

import pytest
from pyspark.sql import functions as F

from conflation_spark.operators.graph import (
    PR_DAMPING_DEN,
    PR_DAMPING_NUM,
    PR_SCALE,
    pagerank,
    similarity_pagerank,
)


def _pr_oracle(edges, nodes, iters, scale=PR_SCALE, num=PR_DAMPING_NUM, den=PR_DAMPING_DEN):
    """Same integer arithmetic, plain Python — exact equality expected."""
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    teleport = (scale * (den - num)) // den
    rank = {v: scale for v in nodes}
    for _ in range(iters):
        mass = {v: 0 for v in nodes}
        for s, d in edges:
            mass[d] += (rank[s] * num) // (den * outdeg[s])
        rank = {v: teleport + mass[v] for v in nodes}
    return rank


def _run(spark, edges, nodes, iters):
    e = spark.createDataFrame(edges, "src string, dst string")
    n = spark.createDataFrame([(v,) for v in nodes], "id string")
    got = {r["id"]: r["rank_c"] for r in pagerank(e, n, iters=iters).collect()}
    return got


def test_pagerank_matches_python_oracle_exactly(spark):
    nodes = [f"n{i}" for i in range(8)]
    edges = [
        ("n0", "n1"), ("n1", "n2"), ("n2", "n0"),  # 3-cycle
        ("n3", "n0"), ("n4", "n0"), ("n5", "n0"),  # fan into n0
        ("n0", "n6"),                              # n0 also points out
        # n7 isolated
    ]
    got = _run(spark, edges, nodes, iters=6)
    assert got == _pr_oracle(edges, nodes, 6)


def test_pagerank_star_center_ranks_highest(spark):
    nodes = ["hub"] + [f"s{i}" for i in range(10)]
    # undirected star (both directions): the hub concentrates the mass
    edges = [(f"s{i}", "hub") for i in range(10)] + [
        ("hub", f"s{i}") for i in range(10)
    ]
    got = _run(spark, edges, nodes, iters=4)
    assert got == _pr_oracle(edges, nodes, 4)
    assert got["hub"] == max(got.values())


def test_pagerank_isolated_node_settles_at_teleport(spark):
    got = _run(spark, [("a", "b")], ["a", "b", "zzz"], iters=3)
    teleport = (PR_SCALE * (PR_DAMPING_DEN - PR_DAMPING_NUM)) // PR_DAMPING_DEN
    assert got["zzz"] == teleport
    assert got["b"] > got["a"] >= teleport


def test_pagerank_partitioning_invariant(spark):
    """Exactness claim: the same graph at different parallelism yields
    bit-equal ranks (integer sums are order-independent)."""
    nodes = [f"n{i}" for i in range(30)]
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 30}") for i in range(30)] + [
        (f"n{i}", f"n{(i * 11 + 1) % 30}") for i in range(30)
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    n = spark.createDataFrame([(v,) for v in nodes], "id string")
    a = {r["id"]: r["rank_c"] for r in pagerank(e, n, iters=5).collect()}
    b = {
        r["id"]: r["rank_c"]
        for r in pagerank(e.repartition(13), n.repartition(7), iters=5).collect()
    }
    assert a == b == _pr_oracle(edges, nodes, 5)


def test_pagerank_bad_iters_raises(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    n = spark.createDataFrame([("a",), ("b",)], "id string")
    with pytest.raises(ValueError, match="iters"):
        pagerank(e, n, iters=0)


def test_similarity_pagerank_dense_core_outranks_pendants(spark):
    """The pruning signal: WITHIN a connected component, documents in the
    dense core (high similarity-degree) outrank pendant members — mass
    is conserved per component, so the contrast is degree-driven.
    (On disjoint vertex-transitive components uniform mass is already
    stationary — a dense clique does NOT outrank a separate sparse pair;
    the signal is neighborhood density, which IS degree.)"""
    vecs = spark.createDataFrame([(f"v{i}",) for i in range(6)], "vec_id string")
    # dense core v0-v1-v2 (clique) with a pendant chain v0-v3-v4; v5 isolated
    pairs = spark.createDataFrame(
        [("v0", "v1"), ("v0", "v2"), ("v1", "v2"), ("v0", "v3"), ("v3", "v4")],
        "id_a string, id_b string",
    )
    got = {r["vec_id"]: r["rank_c"] for r in similarity_pagerank(vecs, pairs).collect()}
    assert got["v0"] == max(got.values())  # highest degree
    assert min(got[f"v{i}"] for i in range(3)) > got["v4"]  # core > chain tail
    assert got["v5"] == min(got.values())  # isolated: teleport only


# ------------------------------------------------------- triangles

def _tri_df(spark, edges, node_ids):
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a string, id_b string"
    )
    nodes = spark.createDataFrame([(n,) for n in node_ids], "id string")
    from conflation_spark.operators.graph import triangle_count

    out = triangle_count(pairs, nodes)
    return {r["id"]: r["n_triangles"] for r in out.collect()}


def test_triangle_count_known_graphs(spark):
    # K4: 4 triangles, every vertex in 3
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    assert _tri_df(spark, k4, "abcd") == {v: 3 for v in "abcd"}
    # path: no triangles
    assert _tri_df(spark, [("a", "b"), ("b", "c"), ("c", "d")], "abcd") == {
        v: 0 for v in "abcd"
    }
    # two triangles sharing edge (b, c)
    bowtie = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")]
    assert _tri_df(spark, bowtie, "abcd") == {"a": 1, "b": 2, "c": 2, "d": 1}


def test_triangle_count_matches_bruteforce(spark):
    import itertools

    import numpy as np

    rng = np.random.default_rng(13)
    n = 40
    ids = [f"v{i:02d}" for i in range(n)]
    edges = set()
    for _ in range(160):
        i, j = rng.integers(0, n, 2)
        if i != j:
            edges.add((ids[min(i, j)], ids[max(i, j)]))
    adj = {v: set() for v in ids}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = {v: 0 for v in ids}
    for a, b, c in itertools.combinations(ids, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            want[a] += 1
            want[b] += 1
            want[c] += 1
    got = _tri_df(spark, sorted(edges), ids)
    assert got == want


def test_triangle_count_partition_invariant(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("b", "d")]
    pairs3 = spark.createDataFrame(edges, "id_a string, id_b string").repartition(3)
    pairs1 = spark.createDataFrame(edges, "id_a string, id_b string").coalesce(1)
    nodes = spark.createDataFrame([(v,) for v in "abcd"], "id string")
    from conflation_spark.operators.graph import triangle_count

    a = sorted(map(tuple, triangle_count(pairs3, nodes).collect()))
    b = sorted(map(tuple, triangle_count(pairs1, nodes).collect()))
    assert a == b


def test_triangle_count_robust_to_symmetrized_input(spark):
    """A symmetrized edge list (both orientations, the pagerank form)
    and self-loops must not inflate counts."""
    tri = [("a", "b"), ("a", "c"), ("b", "c")]
    sym = tri + [(b, a) for a, b in tri] + [("a", "a")]
    assert _tri_df(spark, sym, "abc") == {v: 1 for v in "abc"}
