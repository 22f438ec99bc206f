"""Iterative graph operators: connected components on DataFrames.

Near-dup detection (operators/dedup.py) emits PAIRS; production dedup
needs CLUSTERS — every doc labeled with its duplicate-group — and then
one representative per cluster.  That is connected components: an
inherently iterative algorithm, implemented here as min-label
propagation with a driver-side convergence loop (the standard
Pregel-on-DataFrames shape):

    label(v) ← min(label(v), min over neighbors' labels);  repeat.

Each iteration is one equi-join + one aggregation — all keyed, all
shuffle-partitioned by vertex.  Convergence in O(diameter) iterations;
near-dup graphs have tiny diameters (dup clusters are cliques-ish), so
3-5 iterations is typical.  ``localCheckpoint`` truncates the lineage
each round — without it the plan doubles every iteration and the driver
dies planning, not computing (the classic iterative-Spark trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 1000,
) -> DataFrame:
    """(id, component) for every vertex appearing in ``edges``;
    ``component`` = the minimum vertex id reachable from it.

    Deterministic: min-label propagation has a unique fixpoint, and the
    loop runs UNTIL convergence (one iteration per hop of graph
    diameter; ``max_iterations`` is a runaway safety net, not a result
    cap — stopping early would silently return wrong labels on
    high-diameter graphs).
    """
    both = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).distinct()
    both = both.localCheckpoint()

    labels = (
        both.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        neighbor_min = (
            both.join(labels, on=both["v"] == labels["id"])
            .groupBy(F.col("u").alias("id2"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, on=labels["id"] == neighbor_min["id2"], how="left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
            )
        )
        updated = updated.localCheckpoint()  # truncate lineage per round
        changed = (
            updated.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} iterations"
        )
    return labels


def cluster_representatives(
    df: DataFrame, components: DataFrame, id_col: str
) -> DataFrame:
    """Keep one row per duplicate cluster: the member with the smallest
    id (= the component label itself); rows not in any cluster pass
    through untouched.  This is the final dedup stage: pairs →
    components → survivors."""
    clustered = df.join(components, on=df[id_col] == components["id"], how="left")
    return (
        clustered.where(
            F.col("component").isNull() | (F.col(id_col) == F.col("component"))
        )
        .drop("id", "component")
    )
