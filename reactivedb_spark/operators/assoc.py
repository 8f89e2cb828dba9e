"""Market-basket association rules (Agrawal & Srikant's support/
confidence framework, pair rules) — the classic co-occurrence analytics
operator over a (basket, item) relation.

For every ordered pair of items (x -> y) co-occurring in >= min_count
baskets, emits support/confidence/lift. All three ratios are integer
parts-per-million by truncating division — bit-portable across engines
(a double ratio would hash-drift); counts are exact longs.

100 TB shape: one distinct on (basket, item), one self-equi-join keyed
on the basket id (never an item-item product), two keyed counts, and a
broadcast-sized item-count relation joined back twice. Baskets with B
items emit B(B-1)/2 pairs — the same bounded fan-out as the co-purchase
edge derivations (suite kcore/triangles); a hub-basket guard belongs in
the caller's data contract, not here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 3,
) -> DataFrame:
    """Rules (antecedent, consequent, n_pair, support_ppm,
    confidence_ppm, lift_ppm) for item pairs co-occurring in at least
    ``min_count`` baskets. Both rule directions are emitted."""
    bi = baskets.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    n_baskets = bi.select("b").distinct().count()

    item_n = bi.groupBy("i").agg(F.count(F.lit(1)).alias("n_item"))
    lhs = bi.select("b", F.col("i").alias("x"))
    rhs = bi.select("b", F.col("i").alias("y"))
    pair_n = (
        lhs.join(rhs, "b")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    # both rule directions from the one undirected count
    directed = pair_n.select(
        F.col("x").alias("antecedent"), F.col("y").alias("consequent"), "n_pair"
    ).unionByName(pair_n.select(
        F.col("y").alias("antecedent"), F.col("x").alias("consequent"), "n_pair"
    ))
    nx = item_n.select(F.col("i").alias("antecedent"),
                       F.col("n_item").alias("n_ante"))
    ny = item_n.select(F.col("i").alias("consequent"),
                       F.col("n_item").alias("n_cons"))
    out = (
        directed.join(F.broadcast(nx), "antecedent")
        .join(F.broadcast(ny), "consequent")
        .select(
            F.col("antecedent").cast("long").alias("antecedent"),
            F.col("consequent").cast("long").alias("consequent"),
            F.col("n_pair").cast("long").alias("n_pair"),
            # all three ratios widen before the integral division —
            # n_pair * 1e6 alone wraps int64 once n_pair > ~9.2e12
            # (same class as the lift product below)
            F.expr(f"CAST((CAST(n_pair AS DECIMAL(38,0)) * 1000000)"
                   f" DIV {n_baskets} AS BIGINT)").alias("support_ppm"),
            F.expr("CAST((CAST(n_pair AS DECIMAL(38,0)) * 1000000)"
                   " DIV n_ante AS BIGINT)").alias("confidence_ppm"),
            # lift's triple product overflows int64 once n_baskets
            # reaches ~1.5e7 with a hot pair (Spark non-ANSI wraps
            # silently, DuckDB errors) — widen to DECIMAL(38,0) before
            # the integral division, like burst_detection / gini_spend
            F.expr(f"CAST((CAST(n_pair AS DECIMAL(38,0)) * {n_baskets}"
                   " * 1000000) DIV (CAST(n_ante AS DECIMAL(38,0))"
                   " * n_cons) AS BIGINT)").alias("lift_ppm"),
        )
    )
    return out
