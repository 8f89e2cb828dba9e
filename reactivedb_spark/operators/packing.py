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


def chunk_tokens(df, id_col: str, text_col: str,
                 chunk_size: int = 64, overlap: int = 16):
    """Split each document's token stream into fixed-size chunks with
    overlap — the context-window preprocessing step of a training
    pipeline (stride = chunk_size - overlap; the final short chunk is
    kept; empty docs yield no chunks).

    Pure column expressions: one ``split`` per row, chunk starts from a
    ``sequence`` explode, ``slice`` + ``concat_ws`` rebuild the chunk —
    no UDF, no shuffle at all (the explode is answer-sized and stays in
    the scan stage; chunk counts are bounded by token counts). Returns
    (id, chunk_no [0-based], n_tokens, chunk_text).
    """
    from pyspark.sql import functions as F

    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    stride = chunk_size - overlap
    toks = F.filter(F.split(F.trim(F.col(text_col)), " "), lambda x: x != "")
    n = F.size("_toks")
    # chunk starts: 0, stride, 2*stride, ... while start < n (a full
    # trailing window ends the walk: last start <= n-1, and any start
    # past n - chunk_size would only repeat covered tokens unless the
    # doc is shorter than one chunk)
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1))
    )
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .withColumn("_nc", n_chunks)
        .filter(F.col("_nc") > 0)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_no"),
            F.col("_toks"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_no").cast("long").alias("chunk_no"),
            F.slice(
                F.col("_toks"), F.col("chunk_no") * stride + 1, chunk_size
            ).alias("_chunk"),
        )
        .select(
            F.col(id_col),
            "chunk_no",
            F.size("_chunk").cast("long").alias("n_tokens"),
            F.concat_ws(" ", F.col("_chunk")).alias("chunk_text"),
        )
    )


def length_buckets(df: DataFrame, id_col: str, stratum_col: str,
                   text_col: str, k: int = 8) -> DataFrame:
    """(stratum, bucket, n_docs, total_tokens, max_tokens, waste_ppm):
    length-bucketed batching — the padding-minimization step of a
    training pipeline. Within each stratum, documents sort by
    (token count, id) and split into ``k`` equal-count buckets
    (ntile); a batch drawn from one bucket pads every sequence to the
    bucket max, so the bucket's padding waste is exactly
    (max·n − Σlen)/(max·n), reported in integer ppm.

    Like pack_by_budget, the window is KEYED by the stratum (one keyed
    shuffle; a GLOBAL ntile would be a single-partition sort — a
    non-starter at 100 TB); production batch-builders bucket per shard
    for the same reason. The waste cross-product widens to
    DECIMAL(38,0) before the integral division (max·n overflows int64
    at shard scale; same rule as assoc lift_ppm)."""
    from pyspark.sql.window import Window

    # NULL text counts as a 0-token document in BOTH engines: Spark's
    # legacy size(NULL) is -1 (and NULLS FIRST ordering differs from
    # DuckDB's NULLS LAST), so pin NULL -> 0 explicitly here and with
    # coalesce in the oracle
    toks = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.size(F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), " "),
            lambda x: x != ""))).cast("long")
    per_doc = (
        df.select(F.col(id_col), F.col(stratum_col).alias("stratum"),
                  toks.alias("n_toks"))
        .withColumn("bucket", F.ntile(int(k)).over(
            Window.partitionBy("stratum").orderBy("n_toks", id_col)))
    )
    agg = per_doc.groupBy("stratum", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        F.max("n_toks").cast("long").alias("max_tokens"),
    )
    return agg.select(
        "stratum", F.col("bucket").cast("long").alias("bucket"),
        "n_docs", "total_tokens", "max_tokens",
        # the zero-guard tests max_tokens alone (n_docs >= 1 after the
        # groupBy) — guarding on the raw int64 product would itself
        # wrap/overflow at the shard scale the widening protects
        F.expr("CAST(CASE WHEN max_tokens = 0 THEN 0 ELSE "
               "(CAST(max_tokens AS DECIMAL(38,0)) * n_docs - total_tokens)"
               " * 1000000 DIV (CAST(max_tokens AS DECIMAL(38,0)) * n_docs)"
               " END AS BIGINT)").alias("waste_ppm"),
    )
