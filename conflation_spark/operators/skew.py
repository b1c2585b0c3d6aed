"""Skew handling for the trace-to-edge spatial join (north_star: urban-core
cells are hot — salt them before the shuffled cell join).

The default candidate path broadcasts the edge-cell index, which sidesteps
skew entirely (no shuffle on cell). When the road graph is too big to
broadcast (continental scale), the join shuffles on `cell` and urban-core
cells dominate partitions. `salted_cell_join` splits each hot cell's point
rows across `n_salts` sub-keys and replicates the (small per-cell) edge
rows to every sub-key — the classic replicate-the-build-side salt — on top
of AQE's runtime skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_cells(points_with_cell: DataFrame, threshold: int) -> DataFrame:
    """Cells whose point count exceeds threshold (the salt set). Tiny —
    collectable/broadcastable."""
    return (
        points_with_cell.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_pts"))
        .where(F.col("n_pts") > threshold)
        .select("cell")
    )


def salted_cell_join(
    points_with_cell: DataFrame,
    edge_cells: DataFrame,
    n_salts: int = 8,
    hot_threshold: int = 100_000,
) -> DataFrame:
    """Shuffled equi-join points x edge-cells on (cell, salt).

    Points in hot cells get a deterministic salt from their doc_id hash;
    edge rows of hot cells are replicated to all salts (explode). Cold
    cells use salt 0 on both sides — no replication cost.
    """
    hot = F.broadcast(hot_cells(points_with_cell, hot_threshold).withColumn("is_hot", F.lit(True)))
    p = points_with_cell.join(hot, "cell", "left").withColumn(
        "salt",
        F.when(
            F.col("is_hot").isNotNull(),
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_salts)),
        ).otherwise(F.lit(0)).cast("int"),
    ).drop("is_hot")
    e = (
        edge_cells.join(hot, "cell", "left")
        .withColumn(
            "salts",
            F.when(
                F.col("is_hot").isNotNull(), F.sequence(F.lit(0), F.lit(n_salts - 1))
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn("salt", F.explode("salts"))
        .withColumn("salt", F.col("salt").cast("int"))
        .drop("is_hot", "salts")
    )
    return p.join(e, ["cell", "salt"]).drop("salt")
