"""Connected components / dedup clusters vs a pure-Python union-find
oracle, including transitive chains longer than one hop and singleton
handling."""

import numpy as np
from pyspark.sql import functions as F

from conflation_spark.operators.cluster import connected_components, dedup_clusters


def _uf_components(pairs):
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
    return {x: find(x) for x in parent}


def _rand_pairs(seed, n_nodes=400, n_edges=300):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    return [(f"d{int(x):04d}", f"d{int(y):04d}") for x, y in zip(a, b) if x != y]


def test_connected_components_matches_union_find(spark):
    pairs = _rand_pairs(3)
    # plus a long chain (diameter 12) to force multi-round propagation
    chain = [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(12)]
    pdf = spark.createDataFrame(pairs + chain, "id_a string, id_b string")
    got = {
        r["id"]: r["cluster_id"] for r in connected_components(pdf).collect()
    }
    want = _uf_components(pairs + chain)
    assert got == want
    # canonical label is the component minimum
    assert all(lbl <= node for node, lbl in got.items())


def test_dedup_clusters_assigns_everyone(spark):
    docs = spark.createDataFrame(
        [(f"t{i}",) for i in range(10)], "doc_id string"
    )
    pairs = spark.createDataFrame(
        [("t1", "t3"), ("t3", "t5"), ("t7", "t8")], "id_a string, id_b string"
    )
    out = dedup_clusters(docs, pairs).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 10
    # transitive: t1-t3-t5 one cluster, canonical t1
    assert by_id["t5"]["cluster_id"] == "t1" and not by_id["t5"]["keep"]
    assert by_id["t3"]["cluster_id"] == "t1" and not by_id["t3"]["keep"]
    assert by_id["t1"]["keep"]
    assert by_id["t8"]["cluster_id"] == "t7" and not by_id["t8"]["keep"]
    # singletons keep themselves
    assert by_id["t0"]["cluster_id"] == "t0" and by_id["t0"]["keep"]
    # dedup = filter on keep: one survivor per cluster
    kept = {r["doc_id"] for r in out if r["keep"]}
    assert kept == {"t0", "t1", "t2", "t4", "t6", "t7", "t9"}


def test_connected_components_max_iter_raises(spark):
    import pytest

    chain = [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(9)]
    pdf = spark.createDataFrame(chain, "id_a string, id_b string")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pdf, max_iter=2, algorithm="hashmin")
    # enough rounds: fine
    out = connected_components(pdf, max_iter=12, algorithm="hashmin")
    assert out.where(F.col("cluster_id") != "c00").count() == 0


def test_star_cc_matches_union_find(spark):
    """Large-star/small-star must produce the identical (id -> component
    minimum) assignment as the union-find oracle on a mixed random +
    chain graph, and converge in few rounds."""
    from conflation_spark.operators.cluster import (
        LAST_CC_INFO,
        connected_components_star,
    )

    pairs = _rand_pairs(7)
    chain = [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(30)]
    pdf = spark.createDataFrame(pairs + chain, "id_a string, id_b string")
    got = {r["id"]: r["cluster_id"] for r in connected_components_star(pdf).collect()}
    assert got == _uf_components(pairs + chain)
    assert LAST_CC_INFO["algorithm"] == "star"
    assert LAST_CC_INFO["star_rounds"] <= 10


def test_auto_cc_survives_diameter_beyond_hashmin_budget(spark):
    """The verdict scenario: a chained near-dup graph whose diameter
    exceeds the hash-min round budget. algorithm='hashmin' raises at
    that budget; the default 'auto' changes gears to star and still
    returns the exact union-find assignment — and the star phase's
    round count stays logarithmic, not O(diameter)."""
    import pytest

    from conflation_spark.operators.cluster import LAST_CC_INFO

    # diameter 120 chain (template-drift shape) plus random noise
    chain = [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(120)]
    noise = _rand_pairs(11, n_nodes=150, n_edges=80)
    pdf = spark.createDataFrame(chain + noise, "id_a string, id_b string")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pdf, max_iter=6, algorithm="hashmin")
    got = {r["id"]: r["cluster_id"] for r in connected_components(pdf).collect()}
    assert got == _uf_components(chain + noise)
    assert LAST_CC_INFO["algorithm"] == "auto->star"
    assert LAST_CC_INFO["star_rounds"] <= 12  # log-ish, nowhere near 120


def test_connected_components_frees_superseded_checkpoints(spark):
    """Each round's localCheckpoint supersedes the previous one; the loop
    must free old label/edge blocks (via the underlying RDD — plain
    DataFrame.unpersist is a no-op for checkpoints) so long runs don't
    accumulate max_iter dead tables in executor storage. After the run at
    most ONE new persistent RDD (the final labels) may remain, and the
    result must still be readable."""
    from conflation_spark.operators.cluster import connected_components

    def n_persistent():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    before = n_persistent()
    # a chain a-b-c-d-e (diameter 4) forces several propagation rounds
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        "id_a string, id_b string",
    )
    cc = connected_components(pairs)
    got = {r["id"]: r["cluster_id"] for r in cc.collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "a", "x": "x", "y": "x"}
    assert n_persistent() - before <= 1
    # still readable after the superseded rounds were freed
    assert cc.count() == 7
