"""Connected components over an undirected edge list — the clustering step
that turns near-dup PAIRS into dedup GROUPS (keep one representative per
component).

Algorithm: iterative min-label propagation to fixpoint — every node adopts
the smallest label among itself and its neighbors, repeated until no label
changes.  Each iteration is one join + one aggregation (both partitioned on
the node id), so the cost is O(diameter) shuffles; near-dup clusters are
shallow (diameter 2-3), so this converges in a handful of rounds.  The
classic large-graph alternative (alternating large-star/small-star) drops in
behind the same interface if diameters grow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, src: str = "d1", dst: str = "d2", max_iter: int = 50
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component =
    min node id reachable (deterministic representative)."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy(edges.a)
            .agg(F.min("comp").alias("nmin"))
            .select(F.col("a").alias("node"), "nmin")
        )
        new_comp = F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp")))
        # carry the convergence flag IN the checkpointed frame: the changed
        # check is then a cheap aggregate over already-materialized
        # partitions (one job per iteration), not a second join job against
        # the previous labels.  Labels only ever decrease, so != is <.
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                new_comp.alias("new_comp"),
                (new_comp < F.col("comp")).alias("_changed"),
            )
            .withColumnRenamed("new_comp", "comp")
            .localCheckpoint(eager=True)
        )
        changed = updated.agg(F.max(F.col("_changed"))).first()[0]
        labels = updated.drop("_changed")
        if not changed:
            break
    return labels
