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
    # frontier propagation: after the first sweep only nodes whose label
    # IMPROVED need to push it to their neighbors, so per-round work
    # shrinks with the frontier instead of staying O(V + E) every round
    frontier = labels
    converged = False
    for _ in range(max_iter):
        nbr = frontier.join(sym, frontier["node"] == sym["s"]).select(
            F.col("d").alias("node"), F.col("label").alias("_cand")
        )
        best = nbr.groupBy("node").agg(F.min("_cand").alias("_cand"))
        joined = labels.join(best, "node", "left").localCheckpoint()
        frontier = joined.filter(
            F.col("_cand").isNotNull() & (F.col("_cand") < F.col("label"))
        ).select("node", F.col("_cand").alias("label"))
        labels = joined.select(
            "node", F.least(F.col("label"), F.coalesce("_cand", "label")).alias("label")
        )
        if frontier.isEmpty():
            converged = True
            break
    if not converged:
        # partial labels would silently disagree with any exact oracle —
        # refuse rather than return unconverged clusters
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds (component diameter exceeds the budget); raise max_iter or "
            "switch to the small-star/large-star variant"
        )
    return labels.select(F.col("node"), F.col("label").alias("cluster"))
