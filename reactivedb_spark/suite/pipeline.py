"""Round-4 pipeline extensions: BM25 retrieval, time-series
resample/gap-fill and rolling windows, fixed-width histograms,
winsorized aggregates, single-pass profiling, duplicated-span census,
semi-structured JSON extraction, sliding-window streaming, a
partition-pruned source round-trip, and product-quantization ANN —
each as a (Spark query, DuckDB oracle) pair.

Determinism follows the suite convention: integer-ns time math, rank-
based quantiles, exact decimal/int64 accumulation, libm results pinned
to DECIMAL(28,14) at the point of production, and unique-id tie-breaks
on every ordering.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from reactivedb_spark.operators import dedup, numeric, retrieval, timeseries
from reactivedb_spark.operators.similarity import pq_topk
from reactivedb_spark.suite._common import (
    dump_stream_progress, load, release_stream_state, streaming_shuffle)

NS_PER_HOUR = 3600 * 1_000_000_000
RESAMPLE_NS = 6 * NS_PER_HOUR

BM25_QUERY = "table scan join fast window"


# -- BM25 retrieval ------------------------------------------------------------

def q_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Okapi BM25 top-10 for a fixed bag-of-words query. See
    operators/retrieval.py for the scan-pushed term filter and
    broadcast df-relation plan."""
    return retrieval.bm25_topk(
        dedup.widen(load(spark, sf, "documents")), BM25_QUERY, k=10
    )


SQL_BM25_TOPK = retrieval.bm25_oracle_sql(BM25_QUERY, k=10)


# -- time-series resample + gap fill (locf) ------------------------------------

def q_resample_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user 6-hour resampling of event values with forward fill —
    the hypertable `time_bucket_gapfill + locf` shape as two keyed
    window shuffles (operators/timeseries.py)."""
    ev = load(spark, sf, "events")
    return timeseries.resample(
        ev, key_col="user_id", time_col="ts", value_col="value",
        id_col="event_id", interval_ns=RESAMPLE_NS,
    )


SQL_RESAMPLE_GAPFILL = timeseries.resample_oracle_sql(
    "events", key_col="user_id", time_expr="epoch_ns(ts)",
    value_col='"value"', id_col="event_id", interval_ns=RESAMPLE_NS,
)


# -- rolling-window aggregates -------------------------------------------------

def q_rolling_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing-5-event moving sum/avg/min/max per user: one keyed
    window with a ROWS frame, exact decimal accumulation (DuckDB's
    segment-tree FP ordering never shows)."""
    ev = load(spark, sf, "events").select("event_id", "user_id", "ts", "value")
    return timeseries.rolling(
        ev, key_col="user_id", order_cols=["ts", "event_id"],
        value_col="value", n=5,
    ).select(
        "event_id", "user_id", "roll_n", "roll_sum", "roll_avg",
        "roll_min", "roll_max",
    )


SQL_ROLLING_AVG = """
WITH o AS (SELECT event_id, user_id, epoch_ns(ts) AS tns, "value" FROM events)
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS roll_n,
       CAST(CAST(sum(CAST("value" AS DECIMAL(18,6))) OVER w AS DECIMAL(38,6)) AS DOUBLE) AS roll_sum,
       CAST(CAST(sum(CAST("value" AS DECIMAL(18,6))) OVER w AS DECIMAL(38,6)) AS DOUBLE)
         / CAST(count(*) OVER w AS BIGINT) AS roll_avg,
       min("value") OVER w AS roll_min,
       max("value") OVER w AS roll_max
FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


# -- fixed-width histogram -----------------------------------------------------

HIST_LO, HIST_HI, HIST_BINS = 900.0, 105000.0, 50


def q_price_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """50-bin fixed-width histogram of lineitem extended price: per-row
    bin expression + one ≤50-group partial-aggregable groupBy."""
    return numeric.histogram(
        load(spark, sf, "lineitem"), "l_extendedprice",
        lo=HIST_LO, hi=HIST_HI, nbins=HIST_BINS,
    )


SQL_PRICE_HISTOGRAM = numeric.histogram_oracle_sql(
    "lineitem", "l_extendedprice", lo=HIST_LO, hi=HIST_HI, nbins=HIST_BINS
)


# -- winsorized totals ---------------------------------------------------------

def q_winsorize_prices(spark: SparkSession, sf: str) -> DataFrame:
    """Winsorized order totals per priority: ntile-based 5% tail clip
    (rank math, keyed window — the price_deciles plan class)."""
    return numeric.winsorize_sum(
        load(spark, sf, "orders"), group_col="o_orderpriority",
        col="o_totalprice", tiebreak_col="o_orderkey", ntiles=20,
    )


SQL_WINSORIZE_PRICES = numeric.winsorize_oracle_sql(
    "orders", group_col="o_orderpriority", col="o_totalprice",
    tiebreak_col="o_orderkey", ntiles=20,
)


# -- single-pass table profile -------------------------------------------------

def q_table_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Data-quality profile of orders: one aggregation pass computing
    every column's null/distinct/min/max simultaneously, then a
    constant-width unpivot."""
    return numeric.profile(load(spark, sf, "orders"))


SQL_TABLE_PROFILE = numeric.profile_oracle_sql(
    "orders",
    [
        ("o_orderkey", True),
        ("o_custkey", True),
        ("o_orderstatus", False),
        ("o_totalprice", True),
        ("o_orderdate", False),
        ("o_orderpriority", False),
    ],
)


# -- duplicated-span census ----------------------------------------------------

def q_duplicate_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 cross-document duplicated 8-word spans (substring-dedup
    detection, Lee et al.): narrow shingle explode + ONE groupBy on the
    span text."""
    return dedup.span_census(
        dedup.widen(load(spark, sf, "documents")), "doc_id", "text",
        n=8, min_docs=2, top=20,
    )


SQL_DUPLICATE_SPANS = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
  WHERE len(string_split(text, ' ')) >= 8),
spans AS (
  SELECT doc_id,
         array_to_string(list_slice(words, p, p + 7), ' ') AS span
  FROM (SELECT doc_id, words, unnest(range(1, len(words) - 6)) AS p FROM w)),
census AS (
  SELECT span, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_occurrences
  FROM spans GROUP BY span HAVING count(DISTINCT doc_id) >= 2)
SELECT span, n_docs, n_occurrences FROM census
ORDER BY n_docs DESC, n_occurrences DESC, span LIMIT 20
"""


# -- semi-structured JSON extraction -------------------------------------------

def q_events_json(spark: SparkSession, sf: str) -> DataFrame:
    """Typed extraction from the JSON ``props`` payload (``{"k": int}``)
    + rollup by the extracted key — schema-on-read over a string column
    with ``from_json``; the extraction is a narrow JVM expression that
    pushes column pruning to the scan."""
    ev = load(spark, sf, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        ev.select(k.alias("k"), "value")
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("decimal(38,6)")
            .cast("double").alias("value_sum"),
        )
    )


SQL_EVENTS_JSON = """
SELECT CAST(props->>'$.k' AS INT) AS k, CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST("value" AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS value_sum
FROM events GROUP BY 1
"""


# -- sliding-window streaming --------------------------------------------------

def q_streaming_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked SLIDING-window streaming aggregation (2-hour windows
    every hour — each event lands in two windows), the overlapping
    sibling of ``streaming_tumbling``. The oracle unions the two hour
    offsets each event contributes to."""
    import uuid

    from reactivedb_spark.sources import stream_parquet_dir

    ev = load(spark, sf, "events").select(
        "event_id", "user_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("tstamp"),
    )
    root = tempfile.mkdtemp(prefix="rdb_slide_")
    src = os.path.join(root, "in")
    ev.repartition(3).write.mode("append").parquet(src)
    name = "slide_" + uuid.uuid4().hex[:8]
    agg = (
        stream_parquet_dir(spark, src, ev.schema)
        .withWatermark("tstamp", "3650 days")
        .groupBy(F.window("tstamp", "2 hours", "1 hour"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("user_id").cast("long").alias("uid_sum"),
        )
    )
    with streaming_shuffle(spark):
        q = (
            agg.writeStream.format("memory").queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            dump_stream_progress(q, "streaming_sliding")
            q.stop()
            release_stream_state(spark)
    return spark.table(name).select(
        (F.unix_timestamp("window.start") * F.lit(1_000_000)).cast("long")
        .alias("win_start_us"),
        "n", "uid_sum",
    )


SQL_STREAMING_SLIDING = """
WITH e AS (SELECT epoch_us(ts) // 1000 * 1000 AS tus, user_id FROM events),
ex AS (
  SELECT (tus // 3600000000 - off) * 3600000000 AS win_start_us, user_id
  FROM e, (SELECT unnest(range(0, 2)) AS off))
SELECT CAST(win_start_us AS BIGINT) AS win_start_us,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(user_id) AS BIGINT) AS uid_sum
FROM ex GROUP BY win_start_us
"""


# -- partition-pruned source round-trip ----------------------------------------

def q_source_partitioned(spark: SparkSession, sf: str) -> DataFrame:
    """Hive-style partitioned parquet round-trip: orders written
    ``partitionBy(o_orderpriority)``, read back with a partition
    predicate — the filter prunes DIRECTORIES, not rows (the plan's
    PartitionFilters; asserted in tests/test_pipeline_ops.py), which is
    the 100 TB difference between scanning 2/5 of the table and all of
    it. The aggregate then runs on the pruned scan."""
    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    path = os.path.join(tempfile.mkdtemp(prefix="rdb_part_"), "orders")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    back = spark.read.parquet(path).filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    return back.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("decimal(38,2)")
        .cast("double").alias("price_sum"),
    )


SQL_SOURCE_PARTITIONED = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS price_sum
FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority
"""


# -- product-quantization ANN --------------------------------------------------

PQ_QUERY_ID = 0
PQ_M, PQ_KSUB = 4, 16


def q_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """PQ/ADC approximate nearest neighbours: corpus compressed to m=4
    one-byte codes per vector (seeded codebooks), query scored against
    a broadcast LUT — exact int64 arithmetic end-to-end
    (operators/similarity.py pq_topk)."""
    emb = dedup.widen(load(spark, sf, "embeddings"))
    return pq_topk(emb, "vec_id", "embedding", PQ_QUERY_ID,
                   k=10, m=PQ_M, ksub=PQ_KSUB)


def _sql_pq_topk(dim: int = 64, m: int = PQ_M, ksub: int = PQ_KSUB,
                 qid: int = PQ_QUERY_ID, k: int = 10) -> str:
    dsub = dim // m
    return f"""
WITH elem AS (
  SELECT vec_id, g.j,
         CAST(CAST(CAST(embedding[g.j] AS DOUBLE) AS DECIMAL(12,8)) * 100000000 AS BIGINT) AS xl
  FROM embeddings, generate_series(1, {dim}) g(j)
),
seeds AS (
  SELECT vec_id AS sid, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
  FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id LIMIT {ksub})),
codebook AS (
  SELECT CAST((e.j - 1) // {dsub} AS INT) AS s, sd.code, e.j, e.xl AS cl
  FROM elem e JOIN seeds sd ON sd.sid = e.vec_id),
d2 AS (
  SELECT e.vec_id, cb.s, cb.code, sum((e.xl - cb.cl) * (e.xl - cb.cl)) AS d2
  FROM elem e JOIN codebook cb ON cb.j = e.j
  GROUP BY e.vec_id, cb.s, cb.code),
codes AS (
  SELECT vec_id, s, code FROM (
    SELECT vec_id, s, code,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code) AS rn
    FROM d2) WHERE rn = 1),
lut AS (
  SELECT cb.s, cb.code, sum((q.xl - cb.cl) * (q.xl - cb.cl)) AS qd2
  FROM codebook cb JOIN elem q ON q.j = cb.j AND q.vec_id = {qid}
  GROUP BY cb.s, cb.code)
SELECT c.vec_id, CAST(sum(l.qd2) AS BIGINT) AS d2_fp
FROM codes c JOIN lut l ON l.s = c.s AND l.code = c.code
WHERE c.vec_id <> {qid}
GROUP BY c.vec_id
ORDER BY d2_fp ASC, c.vec_id LIMIT {k}
"""


SQL_PQ_TOPK = _sql_pq_topk()


QUERIES = {
    "bm25_topk": q_bm25_topk,
    "resample_gapfill": q_resample_gapfill,
    "rolling_avg": q_rolling_avg,
    "price_histogram": q_price_histogram,
    "winsorize_prices": q_winsorize_prices,
    "table_profile": q_table_profile,
    "duplicate_spans": q_duplicate_spans,
    "events_json": q_events_json,
    "streaming_sliding": q_streaming_sliding,
    "source_partitioned": q_source_partitioned,
    "pq_topk": q_pq_topk,
}

ORACLES = {
    "bm25_topk": SQL_BM25_TOPK,
    "resample_gapfill": SQL_RESAMPLE_GAPFILL,
    "rolling_avg": SQL_ROLLING_AVG,
    "price_histogram": SQL_PRICE_HISTOGRAM,
    "winsorize_prices": SQL_WINSORIZE_PRICES,
    "table_profile": SQL_TABLE_PROFILE,
    "duplicate_spans": SQL_DUPLICATE_SPANS,
    "events_json": SQL_EVENTS_JSON,
    "streaming_sliding": SQL_STREAMING_SLIDING,
    "source_partitioned": SQL_SOURCE_PARTITIONED,
    "pq_topk": SQL_PQ_TOPK,
}


# -- tail family (round 4c): registered AFTER the 50-query gate window --------

def q_zscore_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type 3-sigma outlier counting with exact cross-
    multiplied integer algebra — no sqrt, no FP variance
    (operators/numeric.py sigma_outliers)."""
    return numeric.sigma_outliers(
        load(spark, sf, "events"), group_col="event_type", col="value",
        k_sigma=3, scale=100,
    )


SQL_ZSCORE_OUTLIERS = numeric.sigma_outliers_oracle_sql(
    "events", group_col="event_type", col='"value"', k_sigma=3, scale=100
)


def q_span_dedup_rewrite(spark: SparkSession, sf: str) -> DataFrame:
    """Substring-level dedup REWRITE: duplicated 8-word spans removed
    everywhere except their lowest-id document, texts rebuilt from the
    surviving tokens (dedup.span_dedup — census + anti-join, no pair
    join)."""
    return dedup.span_dedup(
        dedup.widen(load(spark, sf, "documents")), "doc_id", "text", n=8
    )


SQL_SPAN_DEDUP_REWRITE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
tokpos AS (
  SELECT doc_id, p, list_extract(words, p) AS token
  FROM (SELECT doc_id, words, unnest(range(1, len(words) + 1)) AS p FROM w)),
spans AS (
  SELECT doc_id, p,
         md5(array_to_string(list_slice(words, p, p + 7), ' ')) AS h
  FROM (SELECT doc_id, words, unnest(range(1, len(words) - 6)) AS p
        FROM w WHERE len(words) >= 8)),
census AS (
  SELECT h, min(doc_id) AS keep FROM spans
  GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
removed AS (
  SELECT s.doc_id, s.p FROM spans s
  JOIN census c ON c.h = s.h WHERE s.doc_id <> c.keep),
covered AS (
  SELECT DISTINCT doc_id, p + o AS p
  FROM removed, (SELECT unnest(range(0, 8)) AS o)),
kept AS (
  SELECT t.doc_id, t.p, t.token FROM tokpos t
  ANTI JOIN covered c ON c.doc_id = t.doc_id AND c.p = t.p),
rebuilt AS (
  SELECT doc_id, string_agg(token, ' ' ORDER BY p) AS clean_text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY doc_id),
totals AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
  FROM tokpos GROUP BY doc_id)
SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text, t.n_tokens,
       CAST(t.n_tokens - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
FROM totals t LEFT JOIN rebuilt r USING (doc_id)
"""


QUERIES_TAIL = {
    "zscore_outliers": q_zscore_outliers,
    "span_dedup_rewrite": q_span_dedup_rewrite,
}

ORACLES_TAIL = {
    "zscore_outliers": SQL_ZSCORE_OUTLIERS,
    "span_dedup_rewrite": SQL_SPAN_DEDUP_REWRITE,
}


def q_chunk_transform(spark: SparkSession, sf: str) -> DataFrame:
    """Config-level ChunkTransform end-to-end (extension transform #3):
    documents through the reactive engine into a chunked derived table
    (size 32, overlap 8) with metadata passthrough — the oracle replays
    the identical chunk math in SQL."""
    import tempfile as _tempfile

    from reactivedb_spark.engine import Engine

    cfg = {"tables": [
        {"Source": {"name": "documents", "columns": {
            "doc_id": "Integer", "body": "Str", "lang": "Str"}}},
        {"Derived": {"name": "doc_chunks",
                     "transform_definition": {"ChunkTransform": {
                         "source_table": "documents", "text_column": "body",
                         "chunk_size": 32, "overlap": 8}}}},
    ]}
    eng = Engine(spark, cfg, workspace=_tempfile.mkdtemp(prefix="rdb_chtq_"))
    docs = load(spark, sf, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").alias("body"),
        "lang",
    )
    eng.insert_df("documents", docs, order_by=["doc_id"])
    return eng.table("doc_chunks").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("chunk_no").cast("long").alias("chunk_no"),
        F.col("n_chunk_tokens").cast("long").alias("n_chunk_tokens"),
        "chunk_text", "lang",
    )


SQL_CHUNK_TRANSFORM = """
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split(trim(text), ' '), x -> x <> '') AS t
  FROM documents),
d AS (SELECT doc_id, lang, t, len(t) AS n FROM toks WHERE len(t) > 0),
c AS (
  SELECT doc_id, lang, t, n,
         greatest(CAST(ceil((n - 8) / 24.0) AS INT), 1) AS nc
  FROM d),
e AS (
  -- per-row unbounded series: no silent cap on chunks per document
  SELECT doc_id, lang, t, unnest(range(0, nc)) AS chunk_no
  FROM c),
s AS (
  SELECT doc_id, lang, chunk_no,
         list_slice(t, chunk_no * 24 + 1, chunk_no * 24 + 32) AS chunk
  FROM e)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(chunk_no AS BIGINT) AS chunk_no,
       CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
       array_to_string(chunk, ' ') AS chunk_text, lang
FROM s
"""

QUERIES_TAIL["chunk_transform"] = q_chunk_transform
ORACLES_TAIL["chunk_transform"] = SQL_CHUNK_TRANSFORM


def q_zorder_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order clustering end-to-end: orders written as 8 parquet files
    Morton-clustered on (o_custkey, o_totalprice), read back through a
    selective predicate on EACH dimension — correctness here, and the
    skipping property (footer-stat file pruning on both columns) is
    asserted in tests/test_layout.py."""
    from reactivedb_spark.operators import layout

    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    path = os.path.join(tempfile.mkdtemp(prefix="rdb_zord_"), "orders")
    layout.zorder_write(o, "o_custkey", "o_totalprice", path, n_files=8)
    back = spark.read.parquet(path)
    lo_cust = back.filter(F.col("o_custkey") < 100)
    hi_price = back.filter(F.col("o_totalprice") >= 400000.0)
    return (
        lo_cust.select(F.lit("cust_lt_100").alias("slice"), "o_orderkey", "o_totalprice")
        .unionByName(
            hi_price.select(F.lit("price_ge_400k").alias("slice"), "o_orderkey", "o_totalprice")
        )
        .groupBy("slice")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("decimal(38,2)")
            .cast("double").alias("price_sum"),
        )
    )


SQL_ZORDER_SCAN = """
WITH s AS (
  SELECT 'cust_lt_100' AS slice, o_orderkey, o_totalprice
  FROM orders WHERE o_custkey < 100
  UNION ALL
  SELECT 'price_ge_400k' AS slice, o_orderkey, o_totalprice
  FROM orders WHERE o_totalprice >= 400000.0)
SELECT slice, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS price_sum
FROM s GROUP BY slice
"""

QUERIES_TAIL["zorder_scan"] = q_zorder_scan
ORACLES_TAIL["zorder_scan"] = SQL_ZORDER_SCAN


def q_full_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    """Full-outer reconciliation: every customer and every order
    survives, matched where possible — completes the join-type matrix
    (inner/semi/anti/left-variants elsewhere). One shuffle on the join
    key; the aggregate classifies match status."""
    # each side filtered so all three statuses actually occur (the raw
    # fixture is fully referential — an unfiltered full outer is inner)
    c = load(spark, sf, "customer").select("c_custkey", "c_mktsegment").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_totalprice").filter(
        F.col("o_totalprice") >= 300000.0
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    status = (
        F.when(F.col("c_custkey").isNull(), F.lit("order_only"))
        .when(F.col("o_orderkey").isNull(), F.lit("customer_only"))
        .otherwise(F.lit("matched"))
    )
    return j.select(status.alias("status"), "o_totalprice").groupBy("status").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("decimal(38,2)")
        .cast("double").alias("price_sum"),
    )


SQL_FULL_OUTER_JOIN = """
SELECT CASE WHEN c.c_custkey IS NULL THEN 'order_only'
            WHEN o.o_orderkey IS NULL THEN 'customer_only'
            ELSE 'matched' END AS status,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS price_sum
FROM (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice >= 300000.0) o
  ON o.o_custkey = c.c_custkey
GROUP BY 1
"""

QUERIES_TAIL["full_outer_join"] = q_full_outer_join
ORACLES_TAIL["full_outer_join"] = SQL_FULL_OUTER_JOIN


def q_textstats_transform(spark: SparkSession, sf: str) -> DataFrame:
    """Config-level TextStatsTransform end-to-end (extension transform
    #4): documents through the reactive engine into a per-document
    metrics table (token/char counts, alpha ratio, quality, language
    guess, fingerprint) — the oracle recomputes every metric in SQL."""
    import tempfile as _tempfile

    from reactivedb_spark.engine import Engine

    cfg = {"tables": [
        {"Source": {"name": "documents", "columns": {
            "doc_id": "Integer", "body": "Str", "src": "Str"}}},
        {"Derived": {"name": "doc_stats",
                     "transform_definition": {"TextStatsTransform": {
                         "source_table": "documents", "text_column": "body"}}}},
    ]}
    eng = Engine(spark, cfg, workspace=_tempfile.mkdtemp(prefix="rdb_tstq_"))
    docs = load(spark, sf, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").alias("body"),
        F.col("source").alias("src"),
    )
    eng.insert_df("documents", docs, order_by=["doc_id"])
    return eng.table("doc_stats").select(
        F.col("doc_id").cast("long").alias("doc_id"), "src",
        "n_tokens", "n_chars",
        F.round("alpha_ratio", 9).alias("alpha_ratio"),
        F.round("quality", 9).alias("quality"),
        "lang_guess", "fingerprint",
    )


def _sql_textstats_transform() -> str:
    from reactivedb_spark.suite.scale import (
        LANG_ORDER, _lang_case_sql, _lang_score_sql,
    )

    scores = ", ".join(f"{_lang_score_sql(lang)} AS s_{lang}" for lang in LANG_ORDER)
    return f"""
WITH scored AS (
  SELECT doc_id, source AS src, text, {scores} FROM documents),
base AS (
  SELECT doc_id, src, text,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE)
           / CAST(length(text) AS DOUBLE) AS alpha_ratio,
         {_lang_case_sql()} AS lang_guess
  FROM scored)
SELECT doc_id, src, n_tokens, n_chars,
       round(alpha_ratio, 9) AS alpha_ratio,
       round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
             + alpha_ratio * 0.5, 9) AS quality,
       lang_guess,
       md5(lower(trim(text))) AS fingerprint
FROM base
"""


QUERIES_TAIL["textstats_transform"] = q_textstats_transform
ORACLES_TAIL["textstats_transform"] = _sql_textstats_transform()


def q_pq_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage ANN (FAISS IVF-PQ + refine shape): PQ/ADC shortlist of
    50 over the code table, then exact fixed-point cosine re-rank of
    just those candidates — the float vectors are touched only for the
    shortlist (similarity.pq_topk_rerank)."""
    from reactivedb_spark.operators.similarity import pq_topk_rerank

    emb = dedup.widen(load(spark, sf, "embeddings"))
    return pq_topk_rerank(emb, "vec_id", "embedding", PQ_QUERY_ID,
                          k=10, shortlist=50, m=PQ_M, ksub=PQ_KSUB)


def _sql_pq_rerank(dim: int = 64, m: int = PQ_M, ksub: int = PQ_KSUB,
                   qid: int = PQ_QUERY_ID, shortlist: int = 50, k: int = 10) -> str:
    dsub = dim // m
    return f"""
WITH elem AS (
  SELECT vec_id, g.j,
         CAST(CAST(CAST(embedding[g.j] AS DOUBLE) AS DECIMAL(12,8)) * 100000000 AS BIGINT) AS xl
  FROM embeddings, generate_series(1, {dim}) g(j)
),
seeds AS (
  SELECT vec_id AS sid, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
  FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id LIMIT {ksub})),
codebook AS (
  SELECT CAST((e.j - 1) // {dsub} AS INT) AS s, sd.code, e.j, e.xl AS cl
  FROM elem e JOIN seeds sd ON sd.sid = e.vec_id),
d2 AS (
  SELECT e.vec_id, cb.s, cb.code, sum((e.xl - cb.cl) * (e.xl - cb.cl)) AS d2
  FROM elem e JOIN codebook cb ON cb.j = e.j
  GROUP BY e.vec_id, cb.s, cb.code),
codes AS (
  SELECT vec_id, s, code FROM (
    SELECT vec_id, s, code,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code) AS rn
    FROM d2) WHERE rn = 1),
lut AS (
  SELECT cb.s, cb.code, sum((q.xl - cb.cl) * (q.xl - cb.cl)) AS qd2
  FROM codebook cb JOIN elem q ON q.j = cb.j AND q.vec_id = {qid}
  GROUP BY cb.s, cb.code),
short AS (
  SELECT c.vec_id
  FROM codes c JOIN lut l ON l.s = c.s AND l.code = c.code
  WHERE c.vec_id <> {qid}
  GROUP BY c.vec_id
  ORDER BY CAST(sum(l.qd2) AS BIGINT) ASC, c.vec_id LIMIT {shortlist}),
q AS (SELECT j, xl AS ql FROM elem WHERE vec_id = {qid}),
d AS (
  SELECT e.vec_id, SUM(e.xl * q.ql) AS dot, SUM(e.xl * e.xl) AS n2
  FROM elem e JOIN q USING (j) JOIN short s ON s.vec_id = e.vec_id
  GROUP BY e.vec_id),
qn AS (SELECT SUM(ql * ql) AS qn2 FROM q)
SELECT vec_id,
       round((CAST(dot AS DOUBLE) / 1e16)
             / (sqrt(CAST(n2 AS DOUBLE) / 1e16) * sqrt(CAST(qn2 AS DOUBLE) / 1e16)), 9) AS cos_sim
FROM d, qn
ORDER BY cos_sim DESC, vec_id LIMIT {k}
"""


QUERIES_TAIL["pq_rerank"] = q_pq_rerank
ORACLES_TAIL["pq_rerank"] = _sql_pq_rerank()


def q_bucketed_join(spark: SparkSession, sf: str) -> DataFrame:
    """Bucketed co-located join: orders and customer written as
    EXTERNAL parquet tables bucketed 8 ways on the customer key, then
    joined — with both sides bucketed identically the SortMergeJoin
    needs NO Exchange (asserted with broadcast disabled in
    tests/test_pipeline_ops.py), which at 100 TB is the difference
    between shuffling the fact table on every join and shuffling it
    once at write time. Correctness vs a plain-join oracle."""
    import uuid

    tag = uuid.uuid4().hex[:8]
    root = tempfile.mkdtemp(prefix="rdb_bkt_")
    o = load(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    c = load(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    (o.write.mode("overwrite").format("parquet")
       .bucketBy(8, "o_custkey").sortBy("o_custkey")
       .option("path", os.path.join(root, "orders"))
       .saveAsTable(f"orders_bkt_{tag}"))
    (c.write.mode("overwrite").format("parquet")
       .bucketBy(8, "c_custkey").sortBy("c_custkey")
       .option("path", os.path.join(root, "customer"))
       .saveAsTable(f"customer_bkt_{tag}"))
    ob = spark.table(f"orders_bkt_{tag}")
    cb = spark.table(f"customer_bkt_{tag}")
    return (
        ob.join(cb, ob.o_custkey == cb.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("decimal(38,2)")
            .cast("double").alias("price_sum"),
        )
    )


SQL_BUCKETED_JOIN = """
SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(o.o_orderkey) AS BIGINT) AS key_sum,
       CAST(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS price_sum
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""

QUERIES_TAIL["bucketed_join"] = q_bucketed_join
ORACLES_TAIL["bucketed_join"] = SQL_BUCKETED_JOIN


def q_funnel_stages(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase per user:
    stage k counts users whose first stage-k event follows their first
    stage-(k-1) event — strictly ordered, integer-ns comparisons, one
    conditional aggregation per user then one global rollup (two
    partial-aggregable groupBys, no self-join chain)."""
    ev = load(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    # first click strictly after first view; first purchase strictly
    # after that click
    did_view = F.col("t_view").isNotNull()
    did_click = did_view & F.col("t_click").isNotNull() & (F.col("t_click") > F.col("t_view"))
    did_buy = did_click & F.col("t_buy").isNotNull() & (F.col("t_buy") > F.col("t_click"))
    return per_user.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(did_view.cast("long")).cast("long").alias("n_view"),
        F.sum(did_click.cast("long")).cast("long").alias("n_view_click"),
        F.sum(did_buy.cast("long")).cast("long").alias("n_view_click_buy"),
    )


SQL_FUNNEL_STAGES = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN epoch_ns(ts) END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END) AS t_buy
  FROM events GROUP BY user_id),
flags AS (
  SELECT
    (t_view IS NOT NULL) AS did_view,
    (t_view IS NOT NULL AND t_click IS NOT NULL AND t_click > t_view) AS did_click,
    (t_view IS NOT NULL AND t_click IS NOT NULL AND t_click > t_view
       AND t_buy IS NOT NULL AND t_buy > t_click) AS did_buy
  FROM per_user)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN did_view THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(sum(CASE WHEN did_click THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
       CAST(sum(CASE WHEN did_buy THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click_buy
FROM flags
"""

QUERIES_TAIL["funnel_stages"] = q_funnel_stages
ORACLES_TAIL["funnel_stages"] = SQL_FUNNEL_STAGES


def q_source_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """Schema evolution on a parquet lake: generation 1 lands without
    the discount column, generation 2 adds it; a mergeSchema read
    unions both generations with NULLs where the old files lack the
    column — the append-only lake upgrade path, no rewrite of old
    data. Aggregate proves NULL accounting matches the oracle's
    generation split exactly."""
    li = load(spark, sf, "lineitem")
    gen1 = li.filter(F.col("l_orderkey") % 2 == 0).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    gen2 = li.filter(F.col("l_orderkey") % 2 == 1).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount"
    )
    path = os.path.join(tempfile.mkdtemp(prefix="rdb_evo_"), "li")
    gen1.write.mode("overwrite").parquet(path)
    gen2.write.mode("append").parquet(path)
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("l_discount").isNull().cast("long")).cast("long").alias("n_pre_evolution"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("decimal(38,2)")
        .cast("double").alias("qty_sum"),
        F.sum(F.col("l_discount").cast("decimal(18,6)")).cast("decimal(38,6)")
        .cast("double").alias("disc_sum"),
    )


SQL_SOURCE_SCHEMA_EVOLUTION = """
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pre_evolution,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS qty_sum,
       CAST(CAST(sum(CASE WHEN l_orderkey % 2 = 1
                          THEN CAST(l_discount AS DECIMAL(18,6)) END)
                 AS DECIMAL(38,6)) AS DOUBLE) AS disc_sum
FROM lineitem
"""

QUERIES_TAIL["source_schema_evolution"] = q_source_schema_evolution
ORACLES_TAIL["source_schema_evolution"] = SQL_SOURCE_SCHEMA_EVOLUTION


def q_store_time_travel(spark: SparkSession, sf: str) -> DataFrame:
    """Snapshot time travel through the engine store: two committed
    generations of a keyed derived table; ``read_at`` the PREVIOUS
    version must see exactly the first batch while the current version
    sees the merge — both sides of the comparison emitted in one
    relation (version, n, age_sum). Oracle replays the two batch
    states from the fixture."""
    import tempfile as _tempfile

    from reactivedb_spark.engine import Engine

    cfg = {"tables": [
        {"Source": {"name": "users", "columns": {
            "uid": "Integer", "age": "Integer"}}},
        {"Derived": {"name": "latest",
                     "transform_definition": {"UnionTransform": {
                         "tables_and_foreign_keys": [["users", "uid"]]}}}},
    ]}
    eng = Engine(spark, cfg, workspace=_tempfile.mkdtemp(prefix="rdb_ttq_"))
    cust = load(spark, sf, "customer").select(
        F.col("c_custkey").cast("long").alias("uid"),
        F.col("c_nationkey").cast("long").alias("age"),
    )
    # split by key order without materializing rows on the driver: the
    # batch boundaries are the (total//2)-th and (total//4)-th smallest
    # keys — two scalar collects, never the row set
    total = cust.count()
    half, quarter = total // 2, (total // 2) // 2
    th_half = cust.orderBy("uid").limit(half).agg(F.max("uid")).first()[0]
    th_quarter = cust.orderBy("uid").limit(quarter).agg(F.max("uid")).first()[0]
    eng.insert_df("users", cust.filter(F.col("uid") <= th_half), order_by=["uid"])
    v1 = eng.store.current_version("latest")
    # second batch overlaps the first quarter (updates) and adds the rest
    batch2 = (
        cust.filter(F.col("uid") <= th_quarter)
        .withColumn("age", F.col("age") + F.lit(100))
        .unionByName(cust.filter(F.col("uid") > th_half))
    )
    eng.insert_df("users", batch2, order_by=["uid"])
    # UnionTransform stores its key as ``matchingKey``
    old = eng.store.read_at("latest", v1).select(
        F.lit("v1").alias("version"),
        F.col("matchingKey").cast("long").alias("uid"),
        F.col("age").cast("long").alias("age"),
    )
    cur = eng.table("latest").select(
        F.lit("current").alias("version"),
        F.col("matchingKey").cast("long").alias("uid"),
        F.col("age").cast("long").alias("age"),
    )
    return old.unionByName(cur).groupBy("version").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("age").cast("long").alias("age_sum"),
    )


SQL_STORE_TIME_TRAVEL = """
WITH ranked AS (
  SELECT c_custkey AS uid, c_nationkey AS age,
         row_number() OVER (ORDER BY c_custkey) AS rn,
         count(*) OVER () AS total
  FROM customer),
v1 AS (SELECT uid, age FROM ranked WHERE rn <= total // 2),
cur AS (
  SELECT uid,
         CASE WHEN rn <= (total // 2) // 2 THEN age + 100 ELSE age END AS age
  FROM ranked)
SELECT 'v1' AS version, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(age) AS BIGINT) AS age_sum FROM v1
UNION ALL
SELECT 'current', CAST(count(*) AS BIGINT), CAST(sum(age) AS BIGINT) FROM cur
"""

QUERIES_TAIL["store_time_travel"] = q_store_time_travel
ORACLES_TAIL["store_time_travel"] = SQL_STORE_TIME_TRAVEL


def q_dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Max-containment verify on LSH candidates — near-superset
    detection (dedup.containment_pairs): same prune/verify plan as
    dedup_jaccard, the score divides by min(|A|,|B|) instead of the
    union size."""
    return dedup.containment_pairs(
        dedup.widen(load(spark, sf, "documents")), "doc_id", "text"
    )


def _sql_dedup_containment() -> str:
    from reactivedb_spark.suite.scale import (
        _BANDED_CTE, _PAIRS_CTE, _SIG_CTE, _TOK_CTE,
    )

    return (
        "WITH " + _TOK_CTE + ", " + _SIG_CTE + ", " + _BANDED_CTE + ", "
        + _PAIRS_CTE + """,
sets AS (
  SELECT doc_id, list(DISTINCT token) AS toks,
         CAST(count(DISTINCT token) AS BIGINT) AS n_tok
  FROM tok GROUP BY doc_id),
j AS (
  SELECT p.doc_a, p.doc_b,
         CAST(len(list_intersect(sa.toks, sb.toks)) AS BIGINT) AS n_inter,
         sa.n_tok AS n_a, sb.n_tok AS n_b
  FROM pairs p
  JOIN sets sa ON sa.doc_id = p.doc_a
  JOIN sets sb ON sb.doc_id = p.doc_b)
SELECT doc_a, doc_b,
       CAST(n_inter AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE) AS containment
FROM j WHERE n_inter > 0
"""
    )


QUERIES_TAIL["dedup_containment"] = q_dedup_containment
ORACLES_TAIL["dedup_containment"] = _sql_dedup_containment()


def q_phrase_search(spark: SparkSession, sf: str) -> DataFrame:
    """Positional-index phrase query (retrieval.phrase_match): find the
    corpus's most frequent adjacent bigram, then count its exact
    occurrences per document through the (id, pos, token) posting
    relation — slot i filters to term i BEFORE any join, the slots chain
    on (id, pos−i) equi-keys, and overlapping matches count one row per
    start position (Lucene phrase semantics). The argmax bigram is a
    bounded single-row driver pull (the bpe_train convention); ties
    break on the bigram text. Emits the phrase on every row so the
    result is self-describing."""
    from reactivedb_spark.functions import text as textfn

    docs = load(spark, sf, "documents")
    top = textfn.top_ngrams(docs, "doc_id", "text", k=1).collect()[0]
    w1, w2 = top["bigram"].split(" ")
    return (
        retrieval.phrase_match(docs, [w1, w2], "doc_id", "text")
        .select(
            "doc_id",
            F.lit(w1).alias("w1"),
            F.lit(w2).alias("w2"),
            "n_matches",
        )
    )


SQL_PHRASE_SEARCH = """
WITH arr AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents),
tok AS (
  SELECT doc_id, unnest(l) AS token, generate_subscripts(l, 1) AS pos
  FROM arr),
big AS (
  SELECT token AS w1,
         lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tok),
top1 AS (
  SELECT w1, w2, count(*) AS n FROM big WHERE w2 IS NOT NULL
  GROUP BY w1, w2 ORDER BY n DESC, w1, w2 LIMIT 1)
SELECT t0.doc_id, top1.w1, top1.w2, CAST(count(*) AS BIGINT) AS n_matches
FROM tok t0
JOIN top1 ON t0.token = top1.w1
JOIN tok t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
           AND t1.token = top1.w2
GROUP BY t0.doc_id, top1.w1, top1.w2
"""


QUERIES_TAIL["phrase_search"] = q_phrase_search
ORACLES_TAIL["phrase_search"] = SQL_PHRASE_SEARCH


def q_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document 8-gram novelty fraction (functions/text.py
    ngram_novelty) — the per-doc dual of the duplicated-span census:
    share of the doc's distinct 8-grams whose globally first occurrence
    (lowest doc_id) is this document. Two hash aggregations + one
    co-partitioned join on a 16-byte gram hash; the fraction is one
    int/int IEEE division."""
    from reactivedb_spark.functions import text as textfn

    return textfn.ngram_novelty(load(spark, sf, "documents"), "doc_id", "text", n=8)


SQL_NGRAM_NOVELTY = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
  WHERE len(string_split(text, ' ')) >= 8),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(words, p, p + 7), ' ') AS gram
  FROM (SELECT doc_id, words, unnest(range(1, len(words) - 6)) AS p FROM w)),
census AS (
  SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN g.doc_id = c.first_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST(sum(CASE WHEN g.doc_id = c.first_doc THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS novelty
FROM grams g JOIN census c ON g.gram = c.gram
GROUP BY g.doc_id
"""


QUERIES_TAIL["ngram_novelty"] = q_ngram_novelty
ORACLES_TAIL["ngram_novelty"] = SQL_NGRAM_NOVELTY


# -- DSIR importance weighting (data selection toward a target domain) -----------

def q_dsir_weights(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR hashed-unigram importance weights (operators/importance.py,
    Xie et al. 2023) of every document toward the English subset
    (lang='en' as the curated target): md5-hashed 1024-bucket token
    features, Laplace-smoothed target/source multinomials,
    log w = Σ cnt·ln(p_t/p_s) with the DECIMAL(28,14) ln pinning.
    Selecting log_w > 0 would tilt the corpus toward the target — the
    selection draw composes with operators/sampling.py downstream."""
    from reactivedb_spark.operators.importance import dsir_log_weights

    d = load(spark, sf, "documents")
    return dsir_log_weights(d, "doc_id", "text",
                            target=F.col("lang") == "en", n_buckets=1024)


def _dsir_sql() -> str:
    from reactivedb_spark.operators.importance import dsir_oracle_sql

    return dsir_oracle_sql("documents", "doc_id", "text",
                           "lang = 'en'", n_buckets=1024)


QUERIES_TAIL["dsir_weights"] = q_dsir_weights
ORACLES_TAIL["dsir_weights"] = _dsir_sql()


def q_dsir_resample(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR end-to-end (VERDICT r9 #7): the computed importance weights
    actually CONSUMED — Gumbel-top-k resampling (operators/importance.py
    dsir_resample, Xie et al. 2023 §3) of the corpus toward the English
    target into a 100-document budget. Selection key = log_w + the
    md5-uniform Gumbel draw, pinned by round(·,6) in the DOUBLE domain
    (a decimal cast is NOT cross-engine portable here — see the
    operator's determinism note); per-partition top-k
    (TakeOrderedAndProject), no global sort."""
    from reactivedb_spark.operators.importance import dsir_resample

    d = load(spark, sf, "documents")
    return dsir_resample(d, "doc_id", "text",
                         target=F.col("lang") == "en", budget=100,
                         n_buckets=1024)


def _dsir_resample_sql() -> str:
    from reactivedb_spark.operators.importance import dsir_resample_oracle_sql

    return dsir_resample_oracle_sql("documents", "doc_id", "text",
                                    "lang = 'en'", budget=100,
                                    n_buckets=1024)


QUERIES_TAIL["dsir_resample"] = q_dsir_resample
ORACLES_TAIL["dsir_resample"] = _dsir_resample_sql()


# -- length-bucketed batching (padding-waste accounting) --------------------------

def q_length_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source length bucketing (operators/packing.py:length_buckets):
    8 equal-count ntile buckets by (token count, doc_id) within each
    source shard, with exact integer-ppm padding waste per bucket — the
    batch-building padding-minimization step. One keyed window shuffle +
    one keyed aggregation; the waste cross-product is DECIMAL(38,0)-
    widened (HUGEINT in the oracle)."""
    from reactivedb_spark.operators.packing import length_buckets

    d = load(spark, sf, "documents")
    return length_buckets(d, "doc_id", "source", "text", k=8)


SQL_LENGTH_BUCKETS = """
WITH per_doc AS (
  SELECT doc_id, source AS stratum,
         CAST(coalesce(len(list_filter(string_split(lower(trim(text)), ' '),
                                       x -> x <> '')), 0) AS BIGINT) AS n_toks
  FROM documents),
bucketed AS (
  SELECT stratum, n_toks,
         ntile(8) OVER (PARTITION BY stratum ORDER BY n_toks, doc_id)
           AS bucket
  FROM per_doc),
agg AS (
  SELECT stratum, bucket,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_toks) AS BIGINT) AS total_tokens,
         CAST(max(n_toks) AS BIGINT) AS max_tokens
  FROM bucketed GROUP BY stratum, bucket)
SELECT stratum, CAST(bucket AS BIGINT) AS bucket, n_docs, total_tokens,
       max_tokens,
       CAST(CASE WHEN max_tokens = 0 THEN 0 ELSE
            (CAST(max_tokens AS HUGEINT) * n_docs - total_tokens) * 1000000
            // (CAST(max_tokens AS HUGEINT) * n_docs) END AS BIGINT)
         AS waste_ppm
FROM agg
"""


QUERIES_TAIL["length_buckets"] = q_length_buckets
ORACLES_TAIL["length_buckets"] = SQL_LENGTH_BUCKETS
