"""Sequence packing: assign documents to fixed-token-budget bins.

The shard-building step of a training pipeline — documents are packed
into contiguous bins of ~``budget`` tokens in a deterministic order.
Packing is inherently a running total, and a GLOBAL ordered cumsum is a
single-partition window (a non-starter at 100 TB), so packing is keyed
by a stratum column (source/shard/language): one keyed window shuffle,
each stratum packed independently — exactly how production packers run
(each data shard packs locally). Chunker semantics: a document starts a
new bin when the running total before it has crossed the next budget
boundary; oversized documents own their span (bins can overflow by one
document's tail, never silently truncate). Pure integer math — exact in
any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pack_by_budget(df: DataFrame, id_col: str, stratum_col: str,
                   size_col: str, budget: int) -> DataFrame:
    """(id, stratum, bin_id, offset_in_bin, size): streaming-chunker bin
    assignment per stratum in id order. ``bin_id`` is the budget-multiple
    the document STARTS in; ``offset_in_bin`` its start offset there."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(stratum_col).orderBy(id_col)
    cum = F.sum(size_col).over(w)
    start = (cum - F.col(size_col)).cast("long")
    # integer `div`, not double `/`: running totals at corpus scale pass
    # 2^53 and double division would mis-bin
    return df.select(
        F.col(id_col),
        F.col(stratum_col),
        start.alias("_start"),
        F.col(size_col).cast("long").alias("size"),
    ).select(
        id_col,
        stratum_col,
        F.expr(f"_start div {int(budget)}").alias("bin_id"),
        (F.col("_start") % int(budget)).alias("offset_in_bin"),
        "size",
    )
