"""Connected components over near-duplicate pair graphs -> dedup clusters.

A near-dup stage (minhash/simhash/ngram/embedding, `operators/dedup.py`)
emits PAIRS; an actual dedup pipeline needs the transitive closure — A~B
and B~C put A,B,C in one cluster even when A~C was never emitted — plus a
deterministic canonical representative per cluster. The reference has no
analog (its dedup is per-sequence-ID distinct); this is the LLM-pipeline
extension the brief calls for.

Two engines, auto-dispatched:

1. Hash-min label propagation (fast path):

    label(v) := min(v, neighbors(v))        -- one shuffle
    repeat:  label(v) := min(label(v), min over neighbors of THEIR label)
    until no label changes

   Each round is one equi-join of the symmetrized edge list with the
   label table plus a min-aggregate — hash-partitioned, AQE-friendly, no
   driver data movement (the convergence check is a `LIMIT 1` count).
   Rounds needed = max component DIAMETER: near-dup clusters are
   boilerplate stars and short chains (diameter <= ~4 in practice), so
   per-round cost stays minimal.

2. Large-star/small-star (Kiveris et al., "Connected Components in
   MapReduce and Beyond", `connected_components_star`): alternates two
   edge rewrites whose fixpoint is a star per component rooted at the
   component minimum. Round count is O(log n) INDEPENDENT of diameter —
   the scale path for chained near-dup graphs (template drift producing
   long paths) where hash-min's round count explodes. Each round costs
   ~2 aggregations + 2 joins vs hash-min's 1+1, so it is the fallback,
   not the default.

`algorithm="auto"` (the default everywhere) runs hash-min for a small
round budget and, if the graph hasn't converged (diameter > budget),
falls over to large-star/small-star SEEDED with the partially-propagated
labels: the star edges (v -> label(v)) union the original edges have
exactly the same components (label(v) is always a member of v's
component), so no hash-min work is discarded. The auto path therefore
never raises on deep graphs — it changes gears.

Iterative plans grow per round, so each round's label table is
`localCheckpoint`ed (lineage truncation — without it Catalyst re-analyzes
an exponentially deepening plan and executors re-run every prior round).
`localCheckpoint` stores blocks on executors: fast, but an executor loss
mid-computation fails the job (acceptable — the whole CC re-runs in
minutes and callers persist only its OUTPUT). For a multi-hour graph on
a flaky cluster, swap in `df.checkpoint()` against a reliable
`spark.sparkContext.setCheckpointDir` — one-line change, same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _free_local_checkpoint(ck: DataFrame) -> None:
    """Free a SUPERSEDED localCheckpoint's executor blocks.

    ``DataFrame.unpersist()`` only talks to the cache manager and is a
    silent no-op for checkpointed frames (verified empirically) — the
    blocks belong to the RDD inside the plan's LogicalRDD node, so that is
    what must be unpersisted. The freed frame is DEAD afterwards (its
    lineage was truncated); only call this on checkpoints no live plan
    reads."""
    try:
        plan = ck._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass  # best-effort: leaked blocks degrade memory, never correctness


# diagnostic only: round counts of the most recent connected_components /
# connected_components_star call in this process (read by bench tooling to
# report convergence behavior; never consulted by the operators themselves)
LAST_CC_INFO: dict = {}


def _set_cc_info(**kw) -> None:
    LAST_CC_INFO.clear()
    LAST_CC_INFO.update(kw)


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Diameter-INDEPENDENT connected components: alternating
    large-star/small-star (Kiveris et al., "Connected Components in
    MapReduce and Beyond"). Same output contract as
    ``connected_components`` — (id, cluster_id=component minimum) for
    every id appearing in a pair.

    One round = large-star then small-star, each a groupBy-min plus an
    equi-join on edge endpoints (hash-partitioned, AQE-friendly):

      large-star: for every node u with m(u) = min(N(u) + {u}), rewrite
        each edge to a STRICTLY LARGER neighbor v > u as (v, m(u));
      small-star: orient edges (hi, lo); for every hi with m = min(lo*),
        rewrite its edges to (lo, m) for lo != m plus (hi, m).

    Both rewrites preserve components; their joint fixpoint is one star
    per component rooted at the component minimum, reached in O(log n)
    rounds regardless of diameter. Convergence is checked EXACTLY (count
    + exceptAll on the checkpointed edge sets, not a hash heuristic), so
    ``max_iter`` at the default 30 covers any graph this side of 2^30
    nodes; hitting it raises rather than returning a non-fixpoint.

    Per-round cost is ~2x hash-min's, so this is the deep-graph engine;
    ``connected_components(algorithm="auto")`` picks between them."""
    edges = (
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("hi"),
            F.least(F.col(id_a), F.col(id_b)).alias("lo"),
        )
        .where(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("hi").alias("id"))
        .unionByName(edges.select(F.col("lo").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()  # carried across rounds: ss.count() of round k
    # IS edges.count() of round k+1 — recounting would waste a job/round
    for rounds in range(1, max_iter + 1):
        # large-star: symmetrize, take each node's min-including-self,
        # point every strictly larger neighbor at it
        nbrs = edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionByName(
            edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        mins = (
            nbrs.groupBy("u")
            .agg(F.min("v").alias("_mv"))
            .select("u", F.least(F.col("u"), F.col("_mv")).alias("m"))
        )
        ls = (
            nbrs.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .distinct()
        )
        # small-star on the (hi, lo) orientation large-star emitted
        mins2 = ls.groupBy("hi").agg(F.min("lo").alias("m"))
        ss = (
            ls.join(mins2, "hi")
            .where(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .unionByName(mins2.select("hi", F.col("m").alias("lo")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # exact convergence: the round left the edge set unchanged
        n_ss = ss.count()
        converged = n_ss == n_edges and ss.exceptAll(edges).limit(1).count() == 0
        _free_local_checkpoint(edges)
        edges = ss
        n_edges = n_ss
        if converged:
            _set_cc_info(algorithm="star", star_rounds=rounds)
            labels = nodes.join(
                edges.select(F.col("hi").alias("id"), F.col("lo").alias("_lbl")),
                "id",
                "left",
            ).select(
                "id", F.coalesce(F.col("_lbl"), F.col("id")).alias("cluster_id")
            )
            return labels
    _free_local_checkpoint(edges)
    _free_local_checkpoint(nodes)
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} rounds "
        "(O(log n) bound exceeded — raise max_iter)"
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "auto",
    hashmin_budget: int = 6,
) -> DataFrame:
    """Pair rows -> (id, cluster_id) for every id appearing in a pair,
    where cluster_id is the MINIMUM id of the connected component
    (deterministic canonical label; min over strings is lexicographic in
    both Spark and DuckDB, so the result is oracle-comparable).

    ``algorithm``:
      - "auto" (default): hash-min for up to ``hashmin_budget`` rounds —
        converges there for the star-ish/short-chain graphs near-dup
        detection actually produces — then falls over to
        ``connected_components_star`` seeded with the current labels'
        star edges union the original edges (identical components, so
        the spent rounds carry over as contracted structure). Never
        raises on deep graphs.
      - "hashmin": the pure label-propagation loop; raises RuntimeError
        if not converged after ``max_iter`` rounds (the fixpoint reached
        by round k is correct only for components of diameter <= k).
      - "star": diameter-independent from the start."""
    if algorithm not in ("auto", "hashmin", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if algorithm == "star":
        return connected_components_star(pairs, id_a, id_b, max_iter=max(max_iter, 30))
    budget = max_iter if algorithm == "hashmin" else min(hashmin_budget, max_iter)
    # symmetrize with ONE reference to `pairs`: a union of two selects
    # re-evaluates the caller's whole pair pipeline per branch (Catalyst
    # does not CSE across subtrees — r6; the ngram pair join ran twice
    # inside this checkpoint). The 2-struct explode doubles rows in one
    # pass instead.
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    edges = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                    F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)  # reused every round: cut the dedup lineage
    )
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("_m"))
        .select("src", F.least(F.col("src"), F.col("_m")).alias("lbl"))
        .localCheckpoint(eager=True)
    )
    prev_ckpt = labels  # handle to the round's checkpoint, freed when superseded

    for rounds in range(1, budget + 1):
        neigh = (
            edges.join(
                labels.select(F.col("src").alias("dst"), F.col("lbl").alias("nlbl")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nlbl").alias("nmin"))
        )
        # the change flag rides along in the same pass (nmin < lbl is
        # exactly "this round improved the label"), so convergence costs
        # one scan of the checkpointed round output, not another join
        new_labels = (
            labels.join(neigh, "src", "left")
            .select(
                "src",
                F.least(F.col("lbl"), F.coalesce(F.col("nmin"), F.col("lbl"))).alias(
                    "lbl"
                ),
                (F.col("nmin") < F.col("lbl")).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        # the eager checkpoint above has materialized: the PREVIOUS round's
        # label blocks are now dead weight — free them instead of letting
        # up to max_iter superseded tables pile up in executor storage
        _free_local_checkpoint(prev_ckpt)
        prev_ckpt = new_labels
        changed = new_labels.where(F.col("_chg")).limit(1).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            # edges are no longer referenced by the (checkpointed) result;
            # the FINAL labels checkpoint stays alive — the returned frame
            # reads from it
            _free_local_checkpoint(edges)
            _set_cc_info(algorithm="hashmin", hashmin_rounds=rounds)
            return labels.select(F.col("src").alias("id"), F.col("lbl").alias("cluster_id"))
    if algorithm == "hashmin":
        _free_local_checkpoint(edges)
        _free_local_checkpoint(prev_ckpt)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "component diameter exceeds the cap — raise max_iter or use "
            "algorithm='auto'/'star' (large-star/small-star) for this graph"
        )
    # auto: diameter > budget — change gears. The current labels' star
    # edges (v -> label(v)) union the original edges have exactly the
    # same components (every label is a member of its node's component),
    # so the budget rounds carry over as contracted structure rather
    # than being thrown away.
    seed = (
        labels.where(F.col("src") != F.col("lbl"))
        .select(F.col("src").alias("id_a"), F.col("lbl").alias("id_b"))
        .unionByName(
            edges.select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
        )
    )
    out = connected_components_star(seed, "id_a", "id_b")
    # star's eager input checkpoint has materialized: the hash-min
    # checkpoints are now dead weight
    _free_local_checkpoint(edges)
    _free_local_checkpoint(prev_ckpt)
    _set_cc_info(
        algorithm="auto->star",
        hashmin_rounds=budget,
        star_rounds=LAST_CC_INFO.get("star_rounds"),
    )
    return out


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "auto",
) -> DataFrame:
    """Full-corpus cluster assignment: every document gets a cluster_id
    (its component's minimum doc id; docs in no pair are singletons) and a
    ``keep`` flag marking the canonical representative — filtering on
    ``keep`` IS the dedup. One broadcast-or-shuffle left join onto the
    corpus beyond the component computation."""
    cc = connected_components(pairs, id_a, id_b, max_iter, algorithm=algorithm)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(cc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id"),
        )
        .withColumn("keep", F.col(id_col) == F.col("cluster_id"))
    )
