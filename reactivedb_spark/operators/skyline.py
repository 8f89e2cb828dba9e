"""Two-dimensional Pareto frontier (skyline) per group.

The classic OLAP skyline operator (Börzsönyi, Kossmann & Stocker, ICDE
2001) restricted to two criteria — minimize one column, maximize the
other — which admits a pure window-function plan: within a group, sort
by (min_col asc, max_col desc); a row is dominated iff

  * some row has a strictly smaller min_col and a >= max_col
    (running max over the strictly-cheaper prefix), or
  * some row ties min_col with a strictly larger max_col
    (per-(group, min_col) max).

No dominance self-join, no crossJoin: the operator is one aggregation
to a per-(group, min_col) relation, one window pass over it, and a join
back keyed on (group, min_col) — at 100 TB two shuffles on the group
key, every stage whole-stage codegen. "Strictly smaller" is computed by
deduplicating min_col FIRST (one row per distinct value) so a ROWS
window sees exactly the strictly-cheaper prefix — a RANGE window with a
fixed -1 offset would silently skip cheaper rows less than one unit
away on DECIMAL/DOUBLE columns. Ties on both criteria are mutually
non-dominating and all survive (standard skyline semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pareto_front(
    df: DataFrame,
    group_cols: list[str],
    minimize: str,
    maximize: str,
) -> DataFrame:
    """Rows of ``df`` not dominated within their group, where row b
    dominates row a iff b.minimize <= a.minimize, b.maximize >=
    a.maximize, and at least one inequality is strict."""
    per_value = df.groupBy(*group_cols, minimize).agg(
        F.max(maximize).alias("_best"))
    cheaper = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(minimize).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        per_value.withColumn("_mx_cheaper", F.max("_best").over(cheaper))
        .filter(F.col("_mx_cheaper").isNull()
                | (F.col("_mx_cheaper") < F.col("_best")))
        .select(*group_cols, minimize, "_best")
    )
    out = df.join(
        frontier,
        on=[*group_cols, minimize],
    ).filter(F.col(maximize) == F.col("_best")).drop("_best")
    return out
