"""Graph operators: connected components over near-duplicate pair graphs.

The missing last step of a dedup pipeline (operators/corpus.py keeps the
"drop the larger id of any qualifying pair" linear heuristic): TRANSITIVE
clustering, so a chain a~b~c collapses to one cluster even when a~c
itself is below the similarity threshold.

Spark-first shape: iterative min-label propagation — each iteration is
one equi-join + one aggregation (both keyed shuffles), converging in
O(graph diameter) rounds; ``localCheckpoint`` cuts the lineage so plan
size stays constant across iterations. Near-dup graphs have tiny
diameters (dup clusters are dense), so 3-5 rounds is typical at any
scale. This is the standard map-reduce CC construction; the
small-star/large-star optimization is the drop-in upgrade if a corpus
ever produces deep chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, a: str = "doc_a", b: str = "doc_b",
                         max_iter: int = 50) -> DataFrame:
    """(node, cluster) for every node in the undirected edge list;
    ``cluster`` = min node id in the component (deterministic labels)."""
    sym = edges.select(F.col(a).alias("s"), F.col(b).alias("d")).unionByName(
        edges.select(F.col(b).alias("s"), F.col(a).alias("d"))
    ).localCheckpoint()
    labels = (
        sym.select(F.col("s").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = labels.join(sym, labels["node"] == sym["s"]).select(
            F.col("d").alias("node"), F.col("label")
        )
        new_labels = (
            labels.unionByName(nbr).groupBy("node").agg(F.min("label").alias("label"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("cluster"))
