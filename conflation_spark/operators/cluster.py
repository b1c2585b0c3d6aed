"""Connected components over near-duplicate pair graphs -> dedup clusters.

A near-dup stage (minhash/simhash/ngram/embedding, `operators/dedup.py`)
emits PAIRS; an actual dedup pipeline needs the transitive closure — A~B
and B~C put A,B,C in one cluster even when A~C was never emitted — plus a
deterministic canonical representative per cluster. The reference has no
analog (its dedup is per-sequence-ID distinct); this is the LLM-pipeline
extension the brief calls for.

Algorithm: iterative hash-min label propagation on DataFrames.

    label(v) := min(v, neighbors(v))        -- one shuffle
    repeat:  label(v) := min(label(v), min over neighbors of THEIR label)
    until no label changes

Each round is one equi-join of the symmetrized edge list with the label
table plus a min-aggregate — hash-partitioned, AQE-friendly, no driver
data movement (the convergence check is a `LIMIT 1` count). Rounds needed
= max component DIAMETER, not component size: near-dup clusters are
boilerplate stars and short chains (diameter <= ~4 in practice), so this
beats the O(log n)-round large-star/small-star construction (Kiveris et
al., "Connected Components in MapReduce and Beyond") which pays 4+
shuffles per round to handle adversarial topologies. `max_iter` caps
runaway graphs and raises rather than returning a wrong fixpoint; switch
to large-star if a corpus ever trips it.

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


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Pair rows -> (id, cluster_id) for every id appearing in a pair,
    where cluster_id is the MINIMUM id of the connected component
    (deterministic canonical label; min over strings is lexicographic in
    both Spark and DuckDB, so the result is oracle-comparable).

    Raises RuntimeError if not converged after ``max_iter`` rounds (the
    fixpoint reached by round k is correct only for components of
    diameter <= k)."""
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        e.unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
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

    for _ in range(max_iter):
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
            return labels.select(F.col("src").alias("id"), F.col("lbl").alias("cluster_id"))
    _free_local_checkpoint(edges)
    _free_local_checkpoint(prev_ckpt)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "component diameter exceeds the cap — raise max_iter or switch to "
        "a large-star/small-star implementation for this graph"
    )


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Full-corpus cluster assignment: every document gets a cluster_id
    (its component's minimum doc id; docs in no pair are singletons) and a
    ``keep`` flag marking the canonical representative — filtering on
    ``keep`` IS the dedup. One broadcast-or-shuffle left join onto the
    corpus beyond the component computation."""
    cc = connected_components(pairs, id_a, id_b, max_iter)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(cc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id"),
        )
        .withColumn("keep", F.col(id_col) == F.col("cluster_id"))
    )
