"""Banded (bucketed) range join — interval/temporal joins at scale.

A range join ``left ⋈ right ON key AND r.t ∈ [l.t + lower, l.t + upper]``
has no native Spark operator: the DataFrame API plans it as an equi-join
on the key with the range as a post-filter, which degenerates to a
per-key nested loop when keys are hot (one power user's events make one
task quadratic). The scale-safe plan used here is time banding:

- bucket both sides by ``t div W`` with band width W = window span;
- explode the LEFT side to the (at most 2-3) buckets its window covers,
  the right side keeps exactly one bucket;
- equi-join on ``(key, bucket)``, then apply the exact range predicate.

Each join group is now bounded by ~2 band-widths of one key's rows
regardless of how hot the key is, every pair appears exactly once (the
right row lives in a single bucket), and the whole thing is one shuffle
per side on (key, bucket) — AQE can further split stragglers since the
bucket key is fine-grained. This is the standard interval-join design
(Flink's interval join and Databricks' range-join optimization bin
exactly this way).

Times are int64 (the engine's canonical epoch-ns); ``div`` is integer
division so 1.7e18-scale ns values never round through a double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def range_join(left: DataFrame, right: DataFrame, on: list[str],
               left_time: str, right_time: str,
               lower: int, upper: int, how: str = "inner",
               bucket_width: int | None = None) -> DataFrame:
    """Join rows where ``right.right_time`` falls in
    ``[left.left_time + lower, left.left_time + upper]`` (inclusive),
    matching on the ``on`` equi-keys. ``how`` ∈ {inner, left}: 'left'
    keeps unmatched left rows (right columns NULL) — the attribution
    use case wants purchases with zero preceding views kept.

    'left' is exact for arbitrary left rows: duplicates and NULL-valued
    columns are both preserved with plain left-outer multiplicity (each
    left row is identified by a per-duplicate row number and the
    unmatched add-back anti-joins null-safely on that identity).

    Requires non-negative int64 times (epoch ns); ``lower <= upper``.
    """
    if lower > upper:
        raise ValueError(f"empty range [{lower}, {upper}]")
    overlap = (set(left.columns) & set(right.columns)) - set(on)
    if overlap:
        # ambiguous output columns break the left-mode add-back join and
        # make inner-mode outputs unselectable by name — fail loudly
        raise ValueError(
            f"left/right share non-key columns {sorted(overlap)}; rename one side"
        )
    w = int(bucket_width or max(upper - lower, 1))
    if how == "left":
        # Left rows need a unique identity for the unmatched add-back:
        # a per-duplicate sequence number over rows that are identical in
        # every column. Deterministic (unlike monotonically_increasing_id
        # recomputed across plan branches) and, joined null-safely below,
        # immune to both failure modes of an all-columns anti-join:
        # duplicate left rows collapsing to one match key, and NULL
        # columns never equalling themselves (NULL = NULL is NULL).
        dup_w = W.partitionBy(*[F.col(c) for c in left.columns]).orderBy(F.lit(1))
        left = left.withColumn("_rj_dup", F.row_number().over(dup_w))
    lo_b = F.expr(f"(CAST({left_time} AS BIGINT) + ({lower})) div {w}")
    hi_b = F.expr(f"(CAST({left_time} AS BIGINT) + ({upper})) div {w}")
    l2 = left.withColumn("_band", F.explode(F.sequence(lo_b, hi_b)))
    r2 = right.withColumn("_band", F.expr(f"CAST({right_time} AS BIGINT) div {w}"))
    cond = [l2["_band"] == r2["_band"]] + [l2[c] == r2[c] for c in on]
    in_range = (
        r2[right_time] >= l2[left_time] + F.lit(lower)
    ) & (r2[right_time] <= l2[left_time] + F.lit(upper))
    if how == "inner":
        out = l2.join(r2, cond, "inner").filter(in_range)
        return out.drop(l2["_band"]).drop(r2["_band"]).drop(*[r2[c] for c in on])
    if how == "left":
        # left-outer over a banded join can't be expressed directly (an
        # unmatched left row appears once per band): inner-join the
        # matches, then add back left rows with no match via a null-safe
        # anti-join on the unique (all columns, _rj_dup) identity.
        matches = l2.join(r2, cond, "inner").filter(in_range)
        matches = matches.drop(l2["_band"]).drop(r2["_band"]).drop(*[r2[c] for c in on])
        right_cols = [c for c in right.columns if c not in on and c != "_band"]
        matched_keys = matches.select(*[F.col(c) for c in left.columns]).distinct()
        anti = [left[c].eqNullSafe(matched_keys[c]) for c in left.columns]
        unmatched = left.join(matched_keys, anti, "left_anti")
        for c in right_cols:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(right.schema[c].dataType))
        return matches.unionByName(unmatched).drop("_rj_dup")
    raise ValueError(f"unsupported how={how!r}")


def interval_join(left: DataFrame, right: DataFrame, on: list[str],
                  left_start: str, left_end: str,
                  right_start: str, right_end: str,
                  bucket_width: int) -> DataFrame:
    """INTERVAL overlap join: pairs where ``[left_start, left_end]`` and
    ``[right_start, right_end]`` intersect (closed intervals:
    ``ls <= re AND rs <= le``), matching on the ``on`` equi-keys — the
    two-sided sibling of :func:`range_join` (point-in-window).

    Banded plan, exactly-once WITHOUT a distinct: BOTH sides explode to
    every ``bucket_width`` band their interval covers, the equi-join
    runs on (key, band), and a candidate pair is kept only in the ONE
    canonical band containing the overlap's start
    (``greatest(ls, rs) div W``) — so a pair spanning many shared bands
    still emits once, and no dedup shuffle is needed. Join groups are
    bounded by one band of one key's intervals regardless of key heat;
    intervals much longer than ``bucket_width`` explode to
    span/W bands, so pick W near the typical interval length (the same
    sizing rule as Flink's interval join / Databricks' range-join
    binning).

    Times are int64 epoch-ns; ``bucket_width`` > 0. Output carries the
    key columns + both sides' non-key columns (collisions are an
    error, like :func:`range_join`)."""
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    overlap_cols = (set(left.columns) & set(right.columns)) - set(on)
    if overlap_cols:
        raise ValueError(
            f"left/right share non-key columns {sorted(overlap_cols)}; "
            "rename one side"
        )
    w = int(bucket_width)
    lb = left.withColumn(
        "_b",
        F.explode(F.sequence(
            F.expr(f"{left_start} div {w}"), F.expr(f"{left_end} div {w}")
        )),
    )
    rb = right.withColumn(
        "_b",
        F.explode(F.sequence(
            F.expr(f"{right_start} div {w}"), F.expr(f"{right_end} div {w}")
        )),
    )
    joined = lb.join(rb, on + ["_b"])
    keep = (
        (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
        & (F.expr(f"greatest({left_start}, {right_start}) div {w}")
           == F.col("_b"))
    )
    return joined.filter(keep).drop("_b")
