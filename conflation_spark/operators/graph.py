"""Graph centrality over corpus-derived graphs: integer-exact PageRank.

Corpus-pruning pipelines (SemDeDup, D4, CommonCrawl's harmonic-centrality
page ranking) score documents by centrality in a similarity or link graph
— dense regions are redundant (prune hardest there), high-centrality
pages are quality-prior anchors. The reference repo has no analog (its
only graph is the dedup-pair connected-components in
`operators/cluster.py`); this is the scale-tier centrality sibling.

Determinism (the repo's oracle-gate rules): a float PageRank sums
neighbor contributions in partition order — double addition is
non-associative, so the same graph can hash differently across runs and
engines. This implementation keeps ranks as SCALED LONGS end-to-end:
per-edge contributions are exact integer division (rank * d_num div
(d_den * outdeg)), sums are exact in any order, and the DuckDB twin
replays the identical arithmetic in unrolled per-iteration CTEs. The
cost is a deterministic variant of PageRank (each division floors, so
~1 ulp of mass leaks per edge per iteration — irrelevant for ranking);
the benefit is bit-equal results at any parallelism on any engine.

Scale shape: a FIXED iteration count means the whole power method is ONE
lazy declarative plan — no driver-synchronous rounds (the CC loop's
cost), no convergence actions; Catalyst/AQE sees the full chain. The
edge table (with out-degrees) is localCheckpointed once so the K
iterations read a materialized copy instead of recomputing the
edge-degree join K times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000  # initial per-node rank (longs; see overflow note below)
PR_DAMPING_NUM = 85  # damping d = 85/100, kept as an exact rational
PR_DAMPING_DEN = 100
PR_ITERS = 6


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = PR_ITERS,
    damping_num: int = PR_DAMPING_NUM,
    damping_den: int = PR_DAMPING_DEN,
    scale: int = PR_SCALE,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """Fixed-iteration integer PageRank: returns (id_col, rank_c) with
    rank_c a scaled long (initial mass ``scale`` per node).

    r_{t+1}(v) = teleport + sum over in-edges (u, v) of
    (r_t(u) * damping_num) div (damping_den * outdeg(u)), with teleport
    = (scale * (damping_den - damping_num)) div damping_den. All
    arithmetic is exact long math — results are independent of partition
    order and engine. Nodes with no in-edges settle at the teleport
    mass; dangling nodes' residual mass leaks (the standard simplified
    treatment — rankings, not probabilities, are the product).

    Overflow headroom: per-node rank is bounded by the total mass
    N * scale; rank * damping_num must stay under 2^63, so at N = 1e11
    nodes keep scale <= 1e6 (the default) — documented, not assumed.

    Plan: the (src, dst, outdeg) edge table materializes ONCE
    (localCheckpoint) and each iteration is join + hash-agg + left join
    — 3 shuffles x iters in one lazy plan, zero driver actions between
    iterations.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    # Materialize the EDGE LIST first, then the edge+degree join: the
    # join references its input twice (degree-agg side + probe side), so
    # without the first checkpoint an expensive upstream edge pipeline
    # (e.g. the LSH cosine-pair join) would execute twice just to build
    # the second checkpoint — and K more times in the iterations without
    # it. With both, upstream runs exactly once. Lineage truncation also
    # keeps the iterated plan shallow. Block lifecycle: one checkpoint
    # pair per call, freed by the ContextCleaner once the returned
    # DataFrame is dropped (no driver loop holds checkpoints live here,
    # unlike cluster.py's per-round chain which frees explicitly).
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = e.join(deg, "src").localCheckpoint(eager=False)
    n = nodes.select(F.col(id_col).alias("id"))
    teleport = (scale * (damping_den - damping_num)) // damping_den
    ranks = n.select("id", F.lit(scale).cast("long").alias("rank"))
    contrib = F.expr(f"(rank * {damping_num}) div ({damping_den} * outdeg)")
    for _ in range(iters):
        sums = (
            ed.join(ranks, ed["src"] == ranks["id"])
            .select(F.col("dst").alias("id"), contrib.alias("_c"))
            .groupBy("id")
            .agg(F.sum("_c").alias("_m"))
        )
        ranks = n.join(sums, "id", "left").select(
            "id",
            (F.lit(teleport) + F.coalesce(F.col("_m"), F.lit(0))).cast("long").alias("rank"),
        )
    return ranks.select(F.col("id").alias(id_col), F.col("rank").alias("rank_c"))


def similarity_pagerank(
    vectors: DataFrame,
    pairs: DataFrame,
    id_col: str = "vec_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    iters: int = PR_ITERS,
) -> DataFrame:
    """Centrality over an undirected similarity-pair graph (e.g.
    `dedup.embedding_cosine_pairs` output): symmetrize the pairs into
    directed edges and PageRank over them. High rank_c = document sits
    in a dense semantic neighborhood — the D4/SemDeDup pruning signal
    (drop or downweight the densest regions first)."""
    # symmetrize via ONE explode instead of a self-union: a union
    # references the (expensive: LSH candidate join + cosine verify)
    # pair pipeline twice, doubling its execution in the checkpoint job
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
                F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return pagerank(edges, vectors.select(id_col), iters=iters, id_col=id_col)


def triangle_count(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Per-vertex triangle counts over an undirected pair list — the
    local-clustering signal corpus pipelines use alongside centrality
    (a vertex in many triangles sits in a tight near-dup clique; a
    high-degree vertex with NO triangles is a hub/template).

    Scale shape: the standard degree-ordered orientation — each edge
    points from its (degree, id)-smaller endpoint — bounds every
    vertex's out-degree by O(sqrt(m)), so the wedge self-join is
    O(m^1.5) worst-case instead of sum(deg^2), and every triangle is
    generated exactly once (at its order-minimal apex; the closing
    edge exists in exactly one orientation, which also kills the
    symmetric wedge duplicate). All joins are equi-joins on node ids /
    id pairs — shuffle-partitioned, no cartesian anywhere. Counts are
    exact integers: bit-equal at any parallelism and in the DuckDB
    twin (`triangle_counts` oracle row).

    Input robustness: pairs are canonicalized (least/greatest) before
    the distinct, so a SYMMETRIZED edge list — both (a,b) and (b,a),
    e.g. the form pagerank builds — and self-loops cannot inflate
    degrees or duplicate oriented edges."""
    e = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    ed = (
        e.join(deg.withColumnsRenamed({"id": "a", "d": "da"}), "a")
        .join(deg.withColumnsRenamed({"id": "b", "d": "db"}), "b")
    )
    lt = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(lt, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lt, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )
    wedges = (
        o.alias("e1")
        .join(
            o.alias("e2"),
            (F.col("e1.src") == F.col("e2.src"))
            & (F.col("e1.dst") != F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("x"),
            F.col("e1.dst").alias("y"),
            F.col("e2.dst").alias("z"),
        )
    )
    tri = wedges.join(o.withColumnsRenamed({"src": "y", "dst": "z"}), ["y", "z"])
    pv = (
        tri.select(F.col("x").alias("id"))
        .unionAll(tri.select(F.col("y").alias("id")))
        .unionAll(tri.select(F.col("z").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("n"))
    )
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(pv, "id", "left")
        .select(
            "id", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_triangles")
        )
    )
