"""Declarative data-quality audit (the Deequ/great-expectations core):
a constraint suite evaluated in ONE pass over the table, emitting a
long-format metrics relation instead of failing row-by-row.

Checks:
  * ``checks``: named boolean Column predicates — each contributes a
    ``violations:<name>`` metric counting rows where the predicate is
    FALSE or NULL (NULL comparisons are violations, matching the
    constraint reading "every row provably satisfies the rule").
  * ``pk``: column list whose combination must be unique —
    ``pk_duplicate_rows`` counts rows in excess of one per key.
  * ``fk``: (parent_df, child_cols, parent_cols) referential check —
    ``fk_orphan_rows`` counts child rows whose key has no parent match
    (NULL child keys are orphans).

100 TB shape: every named check folds into ONE conditional aggregation
over a single scan (no per-check passes); the pk check is one keyed
count; the fk check is one left-anti join (broadcast when the parent is
small — Spark's planner decides from stats). Output is a handful of
(metric, value) rows — nothing wide ever leaves the executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def audit(
    df: DataFrame,
    checks: dict[str, Column],
    pk: list[str] | None = None,
    fk: tuple[DataFrame, list[str], list[str]] | None = None,
) -> DataFrame:
    """Long-format metrics: (metric string, value long)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("rows")]
    for name, cond in sorted(checks.items()):
        aggs.append(
            F.sum(F.when(cond, F.lit(0)).otherwise(F.lit(1)))
            .cast("long").alias(f"violations:{name}"))
    wide = df.agg(*aggs)
    # melt the one wide row via a map explode — a UNION of per-metric
    # selects would re-execute the aggregation (and rescan the table)
    # once per metric
    kv = []
    for c in wide.columns:
        kv += [F.lit(c), F.col(c)]
    out = wide.select(F.explode(F.create_map(*kv)).alias("metric", "value"))

    if pk:
        dups = (
            df.groupBy(*pk).agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.coalesce(F.sum(F.col("_n") - 1), F.lit(0))
                 .cast("long").alias("value"))
            .select(F.lit("pk_duplicate_rows").alias("metric"), "value")
        )
        out = out.unionByName(dups)

    if fk is not None:
        parent, child_cols, parent_cols = fk
        # plain equality, NOT eqNullSafe: a NULL child key must never
        # match (even a NULL parent key) so it counts as an orphan —
        # the module contract and the SQL oracle's `=` both say so
        cond = [df[c] == parent[p]
                for c, p in zip(child_cols, parent_cols)]
        orphans = (
            df.join(parent, cond, "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("value"))
            .select(F.lit("fk_orphan_rows").alias("metric"), "value")
        )
        out = out.unionByName(orphans)
    return out
