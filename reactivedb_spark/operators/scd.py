"""Slowly-changing-dimension (type 2) history builds — the warehouse
operator that turns a change LOG into interval-versioned dimension rows
(no reference analogue; the reference has no temporal operators at all —
its closest is version-flipping storage, which our store already
mirrors at the snapshot level).

``scd2_history`` is the batch build: given every observed (key, attrs,
ts) change record, emit one row per CONSECUTIVE-DISTINCT attribute
state per key with its validity interval — the standard
lag-compare → filter → lead pipeline:

1. total-order events per key by (ts, tiebreak) — the tiebreak column
   must make the order total or the collapse is nondeterministic;
2. a row OPENS a new version iff any attribute differs from the
   previous row's (NULL-safe comparison);
3. ``valid_from`` = opening ts, ``valid_to`` = the NEXT version's
   opening ts (exclusive upper bound; NULL for the current version),
   ``is_current`` flags the open row.

Plan shape (100 TB): two window passes over the SAME (key) partitioning
— Catalyst reuses one hash shuffle for both, the within-key sort is the
operator's inherent cost. No joins, no driver materialization; output
is proportional to the number of genuine transitions. Incremental
maintenance at scale is a MERGE against the open rows (Delta Lake
pattern); this module gives the deterministic batch semantics the
incremental path must agree with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def scd2_history(df: DataFrame, key_col: str, attr_cols: list,
                 ts_col: str, tiebreak_col: str) -> DataFrame:
    """(key, attrs..., valid_from, valid_to, is_current) — one row per
    consecutive-distinct attribute state per key. ``valid_to`` is the
    exclusive upper bound (next version's ``valid_from``), NULL while
    current. NULL attribute values compare NULL-safely (a NULL→NULL
    step is NOT a change; NULL→value and value→NULL are)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changed = F.lit(False)
    for c in attr_cols:
        # eqNullSafe is <=> : NULL <=> NULL is true, NULL <=> x false
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    first = F.lag(ts_col).over(w).isNull()
    versions = (
        df.select(key_col, ts_col, tiebreak_col, *attr_cols)
        .withColumn("_open", first | changed)
        .filter(F.col("_open"))
        .drop("_open")
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return (
        versions
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn(
            "is_current",
            F.lead(ts_col).over(w2).isNull().cast("int").cast("long"),
        )
        .select(key_col, *attr_cols, "valid_from", "valid_to", "is_current")
    )


def scd2_oracle_sql(src: str, key_col: str, attr_cols: list, ts_expr: str,
                    tiebreak_col: str) -> str:
    """DuckDB twin of :func:`scd2_history`: identical lag-compare,
    filter, lead pipeline over the same total order. ``ts_expr`` is the
    SQL expression producing the integer timestamp (e.g. epoch_ns
    normalization)."""
    lag_neq = " OR ".join(
        f"(NOT ({c} IS NOT DISTINCT FROM "
        f"lag({c}) OVER (PARTITION BY {key_col} ORDER BY _ts, {tiebreak_col})))"
        for c in attr_cols
    )
    attrs = ", ".join(attr_cols)
    return f"""
WITH base AS (
  SELECT {key_col}, {attrs}, {ts_expr} AS _ts, {tiebreak_col} FROM {src}),
flagged AS (
  SELECT *,
         (lag(_ts) OVER (PARTITION BY {key_col}
                         ORDER BY _ts, {tiebreak_col}) IS NULL
          OR {lag_neq}) AS _open
  FROM base),
versions AS (SELECT * FROM flagged WHERE _open)
SELECT {key_col}, {attrs},
       CAST(_ts AS BIGINT) AS valid_from,
       CAST(lead(_ts) OVER (PARTITION BY {key_col}
                            ORDER BY _ts, {tiebreak_col}) AS BIGINT)
         AS valid_to,
       CAST(CASE WHEN lead(_ts) OVER (PARTITION BY {key_col}
                                      ORDER BY _ts, {tiebreak_col}) IS NULL
                 THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM versions
"""
