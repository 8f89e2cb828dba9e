"""As-of join — an ordered operator Spark has no native form of.

``asof_join(left, right, ...)`` attaches, to every left row, the right
row with the greatest time ≤ the left row's time, per key ("backward"
as-of, inclusive). The classic uses: trades←quotes, events←latest
dimension state, feature point-in-time correctness in training data.

Implementation is the **union + ordered-window trick**, not a pandas
``merge_asof``: tag both sides, union them, and carry the right side's
values forward with ``last(ignorenulls)`` over a window ordered by
(time, right-before-left); left rows then read the most recent right
values. This keeps the whole operator in native window execution — one
shuffle on the key, whole-stage codegen, no Python, and it scales to any
partition-fitting key group (contrast: per-group ``applyInPandas`` pays
Arrow transfer on the entire both sides).

Right rows that tie on (key, time) are deduplicated first with an
explicit tie-break column — required, so results are deterministic (the
reference point: DuckDB's native ASOF JOIN, which the oracle uses).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window as W, functions as F, types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    time_col: str,
    value_cols: Sequence[str],
    tie_break: Optional[str] = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: Optional[int] = None,
) -> DataFrame:
    """Inclusive as-of join, ``direction`` ∈ {backward, forward}.

    backward: greatest right time ≤ left time; forward: smallest right
    time ≥ left time (same union + ordered-window plan, time order
    reversed). ``tolerance`` (same units as ``time_col``, typically ns)
    NULLs the attached values when the matched right row is further than
    that from the left time — pandas ``merge_asof(tolerance=...)``
    semantics.

    Returns all left columns plus ``<value_col><suffix>`` for each right
    value column (NULL when no right row qualifies).
    """
    on = list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"unsupported direction={direction!r}")
    if tie_break is not None:
        w_dedup = W.partitionBy(*on, time_col).orderBy(F.col(tie_break).desc())
        right = (
            right.withColumn("_rn", F.row_number().over(w_dedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    out_vals = [f"{v}{suffix}" for v in value_cols]
    left_cols = left.columns

    # All right values travel inside ONE struct alongside their own row
    # time. Two reasons: (a) row semantics — the nearest right ROW wins
    # even if one of its values is NULL (last(ignorenulls) per value
    # would skip it and reach back to a farther row, diverging from
    # merge_asof / DuckDB ASOF); (b) the tolerance gate must test the
    # time of the row the values actually came from, not a separately
    # tracked nearest-row time.
    rrow_type = T.StructType(
        [T.StructField("_t", right.schema[time_col].dataType)]
        + [T.StructField(ov, right.schema[v].dataType)
           for v, ov in zip(value_cols, out_vals)]
    )
    r_tagged = right.select(
        *on,
        F.col(time_col).alias(time_col),
        F.lit(1).alias("_is_right"),
        F.struct(
            F.col(time_col).alias("_t"),
            *[F.col(v).alias(ov) for v, ov in zip(value_cols, out_vals)],
        ).alias("_rrow"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in on and c != time_col],
    )
    l_tagged = left.select(
        *on,
        F.col(time_col),
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(rrow_type).alias("_rrow"),
        *[F.col(c) for c in left_cols if c not in on and c != time_col],
    )
    unioned = r_tagged.unionByName(l_tagged)

    # right rows sort before left rows at equal time → inclusive;
    # forward walks time descending so "last right seen" = nearest ≥
    torder = F.col(time_col) if direction == "backward" else F.col(time_col).desc()
    w = (
        W.partitionBy(*on)
        .orderBy(torder, F.col("_is_right").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        "*", F.last("_rrow", ignorenulls=True).over(w).alias("_f")
    )
    out = filled.filter(F.col("_is_right") == 0)
    if tolerance is not None:
        gap = (
            F.col(time_col) - F.col("_f._t")
            if direction == "backward"
            else F.col("_f._t") - F.col(time_col)
        )
        within = F.col("_f").isNotNull() & (gap <= F.lit(tolerance))
        out = out.select(
            *[F.col(c) for c in left_cols],
            *[F.when(within, F.col(f"_f.{ov}")).alias(ov) for ov in out_vals],
        )
    else:
        out = out.select(
            *[F.col(c) for c in left_cols],
            *[F.col(f"_f.{ov}").alias(ov) for ov in out_vals],
        )
    return out
