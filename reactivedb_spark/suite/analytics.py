"""Round-3 analytics extensions: distributed sketches, banded range
joins, cohort retention, source-format round-trips, and a multi-hop
engine DAG — each as a (Spark query, DuckDB oracle) pair.

Determinism notes follow the suite convention (suite/__init__.py):
integer/ns arithmetic everywhere time is involved, decimal sums for
aggregated fractionals, md5-derived hashes for anything pseudo-random,
and single-division doubles where a ratio is emitted.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from reactivedb_spark import cache, stats
from reactivedb_spark.engine import Engine
from reactivedb_spark.operators import rangejoin, sketch
from reactivedb_spark.sources.readers import read_table
from reactivedb_spark.suite._common import (
    dump_stream_progress, load, release_stream_state, rocksdb_state,
    spread, streaming_shuffle)

NS_PER_WEEK = 7 * 24 * 3600 * 1_000_000_000
NS_PER_DAY = 24 * 3600 * 1_000_000_000


# -- HyperLogLog distinct (portable sketch) -----------------------------------

def q_hll_users(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct users per event type via the md5-portable HLL sketch
    (operators/sketch.py): two partial-aggregable groupBys, ≤256 longs
    of state per group — the 100 TB shape for distinct counts."""
    ev = load(spark, sf, "events")
    return sketch.hll_distinct(ev, ["event_type"], "user_id")


SQL_HLL_USERS = sketch.oracle_sql("events", ["event_type"], "user_id")


# -- histogram quantile sketch (portable, mergeable) --------------------------

def q_quantile_sketch_prices(spark: SparkSession, sf: str) -> DataFrame:
    """p50/p95/p99 of order totalprice per priority via the mergeable
    fixed-bin histogram sketch (operators/quantile.py): two
    partial-aggregable groupBys, ≤1024 longs of state per group, no
    sort — the 100 TB shape for percentiles. Pure IEEE-double algebra
    (no libm), so the DuckDB oracle matches bit-for-bit."""
    from reactivedb_spark.operators.quantile import approx_quantiles

    return approx_quantiles(
        load(spark, sf, "orders"), ["o_orderpriority"], "o_totalprice",
        [0.5, 0.95, 0.99],
    )


def _sql_quantile_sketch_prices() -> str:
    from reactivedb_spark.operators import quantile

    return quantile.oracle_sql(
        "orders", "o_orderpriority", "o_totalprice", [0.5, 0.95, 0.99])


# -- banded range join (attribution) ------------------------------------------

def q_range_join_attrib(spark: SparkSession, sf: str) -> DataFrame:
    """Attribution: for every purchase, how many views by the same user
    in the preceding 7 days ([t-7d, t) half-open). Uses the banded
    range join (operators/rangejoin.py) — equi-join on
    (user, time-band), never a per-user nested loop — then a count and
    a left join back so zero-view purchases survive."""
    ev = load(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("vts")
    )
    pairs = rangejoin.range_join(
        purchases, views, on=["user_id"], left_time="pts", right_time="vts",
        lower=-7 * NS_PER_DAY, upper=-1,
    )
    counts = pairs.groupBy("purchase_id").agg(F.count("*").cast("long").alias("n_views"))
    return (
        purchases.join(counts, "purchase_id", "left")
        .select(
            "purchase_id", "user_id",
            F.coalesce(F.col("n_views"), F.lit(0)).cast("long").alias("n_views"),
        )
    )


SQL_RANGE_JOIN_ATTRIB = f"""
WITH p AS (
  SELECT user_id, event_id AS purchase_id, epoch_ns(ts) AS pts
  FROM events WHERE event_type = 'purchase'),
v AS (
  SELECT user_id, epoch_ns(ts) AS vts
  FROM events WHERE event_type = 'view')
SELECT p.purchase_id, p.user_id,
       CAST(count(v.vts) AS BIGINT) AS n_views
FROM p LEFT JOIN v
  ON v.user_id = p.user_id
 AND v.vts >= p.pts - {7 * NS_PER_DAY}
 AND v.vts < p.pts
GROUP BY p.purchase_id, p.user_id
"""


# -- group-wise missing-value imputation -----------------------------------------

def q_impute_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Group-wise missing-value imputation (operators/impute.py): a
    deterministic nullification (n_chars dropped when doc_id % 7 == 0,
    lang when doc_id % 11 == 0) repaired with the per-source exact-mean
    (numeric) and deterministic mode (categorical). The oracle replays
    the identical nullification, the same decimal-sum/single-division
    mean and the same (count desc, value asc) mode tie-break — a float
    mean accumulation or a nondeterministic mode pick breaks the
    hash."""
    from reactivedb_spark.operators.impute import impute

    d = load(spark, sf, "documents").select(
        "doc_id", "source",
        F.when(F.col("doc_id") % 11 == 0, F.lit(None)).otherwise(
            F.col("lang")).alias("lang"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("n_chars").cast("long")).alias("n_chars"),
    )
    out = impute(d, ["source"], numeric_cols=["n_chars"],
                 categorical_cols=["lang"])
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"), "source", "lang",
        F.col("n_chars").cast("double").alias("n_chars"),
    )


SQL_IMPUTE_DOCS = """
WITH base AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 11 = 0 THEN NULL ELSE lang END AS lang,
         CASE WHEN doc_id % 7 = 0 THEN NULL
              ELSE CAST(n_chars AS BIGINT) END AS n_chars
  FROM documents),
m AS (SELECT source,
             CAST(sum(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(count(n_chars) AS DOUBLE) AS mean_n
      FROM base GROUP BY source),
gm AS (SELECT CAST(sum(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE)
              / CAST(count(n_chars) AS DOUBLE) AS gmean_n FROM base),
md AS (SELECT source, lang AS mode_lang FROM (
         SELECT source, lang,
                row_number() OVER (PARTITION BY source
                                   ORDER BY count(*) DESC, lang) AS rn
         FROM base WHERE lang IS NOT NULL GROUP BY source, lang)
       WHERE rn = 1),
gmd AS (SELECT lang AS gmode_lang FROM (
          SELECT lang, row_number() OVER (ORDER BY count(*) DESC, lang) AS rn
          FROM base WHERE lang IS NOT NULL GROUP BY lang) WHERE rn = 1)
SELECT CAST(b.doc_id AS BIGINT) AS doc_id, b.source,
       coalesce(b.lang, md.mode_lang, gmd.gmode_lang) AS lang,
       CAST(coalesce(CAST(b.n_chars AS DOUBLE), m.mean_n, gm.gmean_n)
            AS DOUBLE) AS n_chars
FROM base b
LEFT JOIN m ON m.source = b.source
LEFT JOIN md ON md.source = b.source
CROSS JOIN gm CROSS JOIN gmd
"""


# -- interval overlap join ------------------------------------------------------

def q_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sided INTERVAL overlap join (operators/rangejoin.py:
    interval_join — the banded exactly-once plan, canonical-band trick
    instead of a dedup shuffle): each user's per-day view-activity span
    joined to their purchase-activity spans wherever the two intervals
    intersect. Band width = 1 hour. The oracle recomputes both span
    relations and the closed-interval predicate directly — a missed
    band, a double-counted pair or an off-by-one at an interval edge
    breaks the row count and hash."""
    from reactivedb_spark.operators.rangejoin import interval_join

    ev = load(spark, sf, "events").select(
        "user_id", "event_type", F.col("ts").cast("long").alias("tns")
    )

    def spans(et, pre):
        return (
            ev.filter(F.col("event_type") == et)
            .groupBy("user_id", F.expr(f"tns div {NS_PER_DAY}").alias(f"{pre}_day"))
            .agg(F.min("tns").alias(f"{pre}_start"), F.max("tns").alias(f"{pre}_end"))
            .drop(f"{pre}_day")
        )

    out = interval_join(
        spans("view", "v"), spans("purchase", "p"), on=["user_id"],
        left_start="v_start", left_end="v_end",
        right_start="p_start", right_end="p_end",
        bucket_width=3600 * 1_000_000_000,
    )
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        "v_start", "v_end", "p_start", "p_end",
    )


SQL_INTERVAL_JOIN = f"""
WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS tns FROM events),
v AS (SELECT user_id, min(tns) AS v_start, max(tns) AS v_end
      FROM e WHERE event_type = 'view'
      GROUP BY user_id, tns // {NS_PER_DAY}),
p AS (SELECT user_id, min(tns) AS p_start, max(tns) AS p_end
      FROM e WHERE event_type = 'purchase'
      GROUP BY user_id, tns // {NS_PER_DAY})
SELECT CAST(v.user_id AS BIGINT) AS user_id,
       CAST(v_start AS BIGINT) AS v_start, CAST(v_end AS BIGINT) AS v_end,
       CAST(p_start AS BIGINT) AS p_start, CAST(p_end AS BIGINT) AS p_end
FROM v JOIN p ON v.user_id = p.user_id
 AND v_start <= p_end AND p_start <= v_end
"""


# -- weekly cohort retention --------------------------------------------------

def q_retention_weeks(spark: SparkSession, sf: str) -> DataFrame:
    """Classic cohort retention: users grouped by first-active week,
    counted in every later week they appear. Plan: distinct (user,
    week) → min-week per user → user-keyed shuffle join → count by
    (cohort, week). Both joins are keyed on user_id, so at scale the
    cohort map co-partitions with the activity relation — no broadcast
    of a user-sized table."""
    ev = load(spark, sf, "events")
    active = ev.select(
        "user_id", F.expr(f"ts div {NS_PER_WEEK}").cast("long").alias("week")
    ).distinct()
    cohort = active.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        active.join(cohort, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


SQL_RETENTION_WEEKS = f"""
WITH active AS (
  SELECT DISTINCT user_id, epoch_ns(ts) // {NS_PER_WEEK} AS week FROM events),
cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM active GROUP BY user_id)
SELECT c.cohort_week, a.week, CAST(count(*) AS BIGINT) AS n_users
FROM active a JOIN cohort c ON a.user_id = c.user_id
GROUP BY c.cohort_week, a.week
"""


# -- JSONL source/sink round-trip ---------------------------------------------

def q_source_jsonl(spark: SparkSession, sf: str) -> DataFrame:
    """Source-connector fidelity in the correctness gate: documents →
    JSONL files → read back with an explicit schema (schema inference
    at 100 TB is a full extra scan) → aggregate. The oracle reads the
    original parquet, so any JSON quoting/escaping/precision loss in
    either direction breaks the hash."""
    docs = load(spark, sf, "documents")
    path = os.path.join(tempfile.mkdtemp(prefix="rdb_jsonl_"), "docs")
    docs.write.mode("overwrite").json(path)
    back = read_table(spark, path, fmt="json", schema=docs.schema)
    return back.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum(F.length("text")).cast("long").alias("sum_text_len"),
    )


SQL_SOURCE_JSONL = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(length(text)) AS BIGINT) AS sum_text_len
FROM documents GROUP BY lang
"""


# -- CSV source/sink round-trip -----------------------------------------------

def q_source_csv(spark: SparkSession, sf: str) -> DataFrame:
    """CSV connector fidelity: orders' key/string/date-derived columns →
    CSV files → explicit-schema read-back → aggregate vs the parquet
    original. Integer/string columns only by design: CSV is not a
    round-trip-safe carrier for binary doubles, which is itself part of
    the documented connector contract (parquet/JSONL carry doubles)."""
    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    path = os.path.join(tempfile.mkdtemp(prefix="rdb_csv_"), "orders")
    o.write.mode("overwrite").option("header", "true").csv(path)
    back = read_table(spark, path, fmt="csv", schema=o.schema, header="true")
    return back.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
        F.count(F.col("o_custkey")).cast("long").alias("n_cust"),
    )


SQL_SOURCE_CSV = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
       CAST(count(o_custkey) AS BIGINT) AS n_cust
FROM orders GROUP BY o_orderstatus, o_orderpriority
"""


# -- unigram LM document scoring ----------------------------------------------

VOCAB_BROADCAST_LIMIT = 32 << 20  # bytes of estimated vocabulary relation


def q_unigram_logprob(spark: SparkSession, sf: str,
                      broadcast_vocab: bool | None = None) -> DataFrame:
    """Corpus-trained unigram language-model score per document:
    Σ ln p(token) over the doc's tokens (with multiplicity), the
    classic LM-quality signal for corpus filtering. Plan: one token
    count aggregation (the vocabulary) joined back to the token stream,
    one per-doc sum. The vocabulary is corpus-derived — on web-scale
    text distinct tokens run to 10⁸+ — so it is broadcast only when its
    estimated size fits ``VOCAB_BROADCAST_LIMIT`` (same gate shape as
    ``dedup.jaccard_pairs``); above that the join shuffles on ``token``,
    which both sides already produce. Determinism: ln() may differ by
    1 ulp across libms, so each term is cast to DECIMAL(28,14) (pinning
    ~1e-14 drift) before the exact decimal sum; the final round(6)
    absorbs what remains."""
    tok = cache.pin(
        load(spark, sf, "documents")
        .select("doc_id", F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    counts = tok.groupBy("token").agg(F.count("*").cast("long").alias("n_tok"))
    # one job over the persisted tokens yields both gate inputs
    stats = tok.agg(
        F.count("*").alias("n_total"),
        F.count_distinct("token").alias("n_vocab"),
    ).collect()[0]
    total, n_vocab = int(stats["n_total"]), int(stats["n_vocab"])
    if broadcast_vocab is None:
        # ~64 B/row upper estimate: token string + decimal + row overhead
        broadcast_vocab = n_vocab * 64 <= VOCAB_BROADCAST_LIMIT
    hint = F.broadcast if broadcast_vocab else (lambda d: d)
    probs = counts.select(
        "token",
        F.log(F.col("n_tok").cast("double") / F.lit(float(total)))
        .cast("decimal(28,14)").alias("lp"),
    )
    return (
        tok.join(hint(probs), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.sum("lp").cast("double"), 6).alias("logprob"),
        )
    )


SQL_UNIGRAM_LOGPROB = """
WITH tok AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS token
    FROM documents) WHERE token <> ''),
probs AS (
  SELECT token,
         CAST(ln(CAST(count(*) AS DOUBLE) /
                 CAST((SELECT count(*) FROM tok) AS DOUBLE)) AS DECIMAL(28,14)) AS lp
  FROM tok GROUP BY token)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(CAST(sum(p.lp) AS DOUBLE), 6) AS logprob
FROM tok t JOIN probs p USING (token)
GROUP BY t.doc_id
"""


# -- interpolated bigram LM scoring --------------------------------------------

def q_bigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """Jelinek-Mercer interpolated bigram LM scoring (operators/lm.py):
    each document scored under a corpus-trained
    λ·p(w|ctx) + (1−λ)·p(w) model — the next rung above
    ``unigram_logprob`` on the LM-quality ladder. Same determinism
    recipe: IEEE-identical probability op order, DECIMAL(28,14)-pinned
    ln terms, exact decimal sum, round(6)."""
    from reactivedb_spark.operators.lm import bigram_logprob

    return bigram_logprob(load(spark, sf, "documents"), "doc_id", "text")


from reactivedb_spark.operators.lm import (
    bigram_logprob_oracle_sql as _bigram_sql)

SQL_BIGRAM_LOGPROB = _bigram_sql("documents", "doc_id", "text")


# -- PageRank (fixed-iteration, iterative-algorithm flagship) -----------------

def q_pagerank_orders(spark: SparkSession, sf: str) -> DataFrame:
    """5-round PageRank over the bipartite customer–order graph
    (operators/graph.py:pagerank): the iterative-algorithm flagship —
    each round two keyed shuffles, lineage cut per round. The oracle
    unrolls the same 5 synchronous rounds as chained CTEs with the
    identical decimal-sum / IEEE-double update."""
    from reactivedb_spark.operators.graph import pagerank

    o = load(spark, sf, "orders").select(
        F.col("o_custkey").alias("doc_a"),
        (F.col("o_orderkey") + F.lit(10_000_000)).alias("doc_b"),
    )
    pr = pagerank(o, iters=5)
    return pr.select(F.col("node").cast("long").alias("node"), "pr")


def _pagerank_sql(iters: int = 5, damping: float = 0.85) -> str:
    base = repr(1.0 - damping)  # 1.0-0.85 != 0.15 in doubles: emit the exact value
    ctes = [
        "e0 AS (SELECT o_custkey AS s, o_orderkey + 10000000 AS d FROM orders)",
        "sym AS (SELECT DISTINCT s, d FROM (SELECT s, d FROM e0 UNION ALL SELECT d, s FROM e0))",
        "deg AS (SELECT s, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY s)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg)",
        "p0 AS (SELECT s AS node, 1.0 / (SELECT n FROM nn) AS pr FROM deg)",
    ]
    for i in range(1, iters + 1):
        prev = f"p{i - 1}"
        ctes.append(
            f"p{i} AS (SELECT sym.d AS node, "
            f"({base} / (SELECT n FROM nn)) + {damping!r} * "
            f"CAST(sum(CAST({prev}.pr / CAST(deg.deg AS DOUBLE) AS DECIMAL(28,14))) AS DOUBLE) AS pr "
            f"FROM {prev} JOIN deg ON {prev}.node = deg.s "
            f"JOIN sym ON {prev}.node = sym.s GROUP BY sym.d)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT CAST(node AS BIGINT) AS node, round(pr, 9) AS pr FROM p{iters}"
    )


SQL_PAGERANK_ORDERS = _pagerank_sql()


def q_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Exact triangle counting with DEGREE-ORIENTED wedge closing
    (operators/graph.py:triangle_count; Suri & Vassilvitskii 2011) over
    the part co-purchase graph: parts are linked when they appear in
    the same order. Orders are small (≤7 items) so the edge derivation
    is a bounded per-order pair explode; hub PARTS are where a naive
    node-iterator would melt, and the (degree, id) orientation bounds
    every wedge list by ~√(2m) instead. The oracle replays degrees,
    orientation, wedges and closings in SQL — n_wedges is part of the
    contract so a wrong orientation cannot hide behind a correct
    triangle total."""
    from reactivedb_spark.operators.graph import triangle_count

    li = load(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey")
    ).distinct()
    a = li.select("okey", F.col("pkey").alias("u"))
    b = li.select("okey", F.col("pkey").alias("v"))
    edges = (
        a.join(b, "okey").filter(F.col("u") < F.col("v")).select("u", "v")
    )
    return triangle_count(edges)


SQL_TRIANGLE_COUNT = """
WITH li AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem),
und AS (
  SELECT DISTINCT a.pkey AS x, b.pkey AS y
  FROM li a JOIN li b ON a.okey = b.okey AND a.pkey < b.pkey),
deg AS (
  SELECT n, count(*) AS d FROM (
    SELECT x AS n FROM und UNION ALL SELECT y AS n FROM und) GROUP BY n),
fwd AS (
  SELECT CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND u.x < u.y)
              THEN u.x ELSE u.y END AS src,
         CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND u.x < u.y)
              THEN u.y ELSE u.x END AS dst
  FROM und u JOIN deg dx ON dx.n = u.x JOIN deg dy ON dy.n = u.y),
wedges AS (
  SELECT w1.dst AS p, w2.dst AS q
  FROM fwd w1 JOIN fwd w2 ON w1.src = w2.src AND w1.dst < w2.dst),
closing AS (
  SELECT least(src, dst) AS p, greatest(src, dst) AS q FROM fwd),
tri AS (SELECT count(*) AS n FROM wedges JOIN closing USING (p, q))
SELECT CAST((SELECT count(*) FROM und) AS BIGINT) AS n_edges,
       CAST((SELECT count(*) FROM wedges) AS BIGINT) AS n_wedges,
       CAST((SELECT n FROM tri) AS BIGINT) AS n_triangles
"""

def q_kcore_parts(spark: SparkSession, sf: str) -> DataFrame:
    """k-core decomposition (operators/graph.py:k_core — iterative
    degree peeling, Matula & Beck) of the part co-purchase graph: the
    maximal subgraph where every part co-occurs with >= 80 other core
    parts, plus each survivor's within-core degree. The oracle unrolls
    the identical fixed peel budget as chained degree->filter->semi-join
    CTEs; peeling is idempotent past fixpoint, so Spark's early stop and
    the oracle's full unroll agree by construction — a wrong degree
    count, a one-sided prune or a missed round breaks the hash."""
    from reactivedb_spark.operators.graph import k_core

    li = load(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey")
    ).distinct()
    ka = li.select("okey", F.col("pkey").alias("u"))
    kb = li.select("okey", F.col("pkey").alias("v"))
    edges = (
        ka.join(kb, "okey").filter(F.col("u") < F.col("v"))
        .select("u", "v").distinct()  # simple graph: multi-order pairs = one edge
    )
    return k_core(edges, k=80).select(
        F.col("node").cast("long").alias("node"), "core_degree"
    )


def _kcore_sql(k: int = 80, rounds: int = 16) -> str:
    ctes = ["""li AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem),
und AS (SELECT DISTINCT a.pkey AS x, b.pkey AS y
        FROM li a JOIN li b ON a.okey = b.okey AND a.pkey < b.pkey),
e0 AS MATERIALIZED (SELECT x AS s, y AS d FROM und UNION ALL SELECT y AS s, x AS d FROM und)"""]
    for r in range(rounds):
        ctes.append(
            f"k{r} AS MATERIALIZED (SELECT s FROM (SELECT s, count(*) AS c "
            f"FROM e{r} GROUP BY s) WHERE c >= {k})"
        )
        ctes.append(
            f"e{r + 1} AS MATERIALIZED (SELECT e.s, e.d FROM e{r} e "
            f"JOIN k{r} x ON e.s = x.s JOIN k{r} y ON e.d = y.s)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT CAST(s AS BIGINT) AS node, "
          f"CAST(count(*) AS BIGINT) AS core_degree FROM e{rounds} GROUP BY s"
    )


SQL_KCORE_PARTS = _kcore_sql()


def q_scd2_users(spark: SparkSession, sf: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history build
    (operators/scd.py): each user's event_type change log collapsed to
    interval-versioned rows — consecutive-duplicate states merge, each
    version carries [valid_from, valid_to) in epoch-ns plus an
    is_current flag. Total order per user is (ts, event_id), so the
    collapse is deterministic on both engines; the oracle replays the
    identical lag-compare → filter → lead pipeline."""
    from reactivedb_spark.operators.scd import scd2_history

    ev = load(spark, sf, "events").select(
        "user_id", "event_type",
        F.col("ts").cast("long").alias("tns"),
        F.col("event_id").cast("long").alias("eid"),
    )
    return scd2_history(
        ev, "user_id", ["event_type"], "tns", "eid"
    ).select(
        F.col("user_id").cast("long").alias("user_id"), "event_type",
        "valid_from", "valid_to", "is_current",
    )


from reactivedb_spark.operators.scd import scd2_oracle_sql as _scd2_sql

SQL_SCD2_USERS = _scd2_sql(
    "(SELECT user_id, event_type, epoch_ns(ts) AS tns, event_id AS eid "
    "FROM events)",
    "user_id", ["event_type"], "tns", "eid",
)



# -- multi-hop DAG through the engine -----------------------------------------

DAG_CHAIN_CFG = {
    "tables": [
        {"Source": {"name": "orders_src", "columns": {
            "okey": "Integer", "ckey": "Integer",
            "price": "Float", "price_dec": "Decimal"}}},
        {"Derived": {"name": "enriched",
                     "transform_definition": {"FunctionTransform": {
                         "source_table": "orders_src",
                         "functions": ["ckey2 ~ ckey",
                                       "margin ~ price * 0.9",
                                       "pd ~ price_dec"]}}}},
        {"Derived": {"name": "big_margin",
                     "transform_definition": {"FilterTransform": {
                         "source_table": "enriched",
                         "filter": "margin > 150000.0"}}}},
        {"Derived": {"name": "by_cust",
                     "transform_definition": {"AggregationTransform": {
                         "source_table": "big_margin",
                         "aggregated_column": "ckey2",
                         "functions": ["n ~ memo.n + 1",
                                       "total ~ memo.total + pd"]}}}},
    ]
}


def q_dag_chain(spark: SparkSession, sf: str) -> DataFrame:
    """Three-hop reactive DAG: Function → Filter → Aggregation chained
    through the engine (topo-walk propagation, engine.py), the deepest
    derived chain in the suite. Per-row double math is portable; the
    aggregated sum folds decimals (exact, order-independent) per the
    suite contract."""
    eng = Engine(spark, DAG_CHAIN_CFG,
                 workspace=tempfile.mkdtemp(prefix="rdb_dag_"))
    orders = load(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long").alias("okey"),
        F.col("o_custkey").cast("long").alias("ckey"),
        F.col("o_totalprice").alias("price"),
        F.col("o_totalprice").cast("decimal(18,6)").cast("decimal(38,18)").alias("price_dec"),
    )
    eng.insert_df("orders_src", orders)
    return eng.table("by_cust").select(
        F.col("aggregatedColumn").alias("ckey"),
        F.col("n").cast("long").alias("n"),
        F.col("total").cast("double").alias("total"),
    )


SQL_DAG_CHAIN = """
SELECT o_custkey AS ckey,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total
FROM orders
WHERE o_totalprice * 0.9 > 150000.0
GROUP BY o_custkey
"""


# -- streaming exact dedup ----------------------------------------------------

def q_streaming_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming exactly-once dedup: replay events DOUBLED (every row
    twice, split across micro-batches) through ``dropDuplicates`` on
    event_id — state-store-backed keyed dedup, the streaming twin of
    exact dedup. The oracle is a plain DISTINCT, so duplicate delivery
    across batch boundaries must be invisible in the result.

    Runs under the ROCKSDB state store provider (round 6): per-key
    dedup state is the suite's largest (every event_id), which is
    exactly the state the heap-backed default cannot hold at 100 TB —
    the gate row also proves provider-invariance of the result
    (PLANS.md round-6 has the measured 10.9x heap reduction)."""
    from reactivedb_spark.sources import stream_parquet_dir

    ev = load(spark, sf, "events").select("event_id", "user_id", "event_type")
    doubled = ev.unionAll(ev)
    root = tempfile.mkdtemp(prefix="rdb_sdedup_")
    src = os.path.join(root, "in")
    doubled.repartition(4).write.mode("append").parquet(src)
    import uuid

    name = "dedup_" + uuid.uuid4().hex[:8]
    with streaming_shuffle(spark), rocksdb_state(spark):
        q = (
            stream_parquet_dir(spark, src, doubled.schema)
            .dropDuplicates(["event_id"])
            .writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            dump_stream_progress(q, "streaming_dedup")
            q.stop()
            release_stream_state(spark)
    return spark.table(name)


SQL_STREAMING_DEDUP = """
SELECT DISTINCT event_id, user_id, event_type FROM events
"""


# -- stream-stream interval join ----------------------------------------------

def q_streaming_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream interval join: purchases and views replayed as TWO
    independent file streams, inner-joined per user with a time-range
    condition (view within the 7 days before the purchase) — Structured
    Streaming's watermark-bounded two-sided state join, the streaming
    twin of the batch banded range join. The oracle is the equivalent
    batch join: micro-batch interleaving must not change the pairs.
    Watermarks exceed the replay's disorder (round-robin files span the
    whole fixture range) so no pair is dropped; production sets them to
    the real lateness bound to bound state.

    Runs under the ROCKSDB state store (round 7): two-sided join state
    retains every in-watermark row — the suite's largest streaming
    state per input row — and the A/B measured RocksDB FASTER here
    (5.6-7.3 s vs 7.0-8.5 s) at 17.7 → 3.8 MB state (PLANS.md round-7);
    the gate row doubles as the provider-invariance proof."""
    import uuid

    from reactivedb_spark.sources import stream_parquet_dir

    ev = load(spark, sf, "events")
    base = ev.select(
        "event_id", "user_id", "event_type",
        F.timestamp_micros(F.expr("ts div 1000")).alias("tstamp"),
    )
    purchases = base.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"),
        F.col("tstamp").alias("p_ts"),
    )
    views = base.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("event_id").alias("view_id"),
        F.col("tstamp").alias("v_ts"),
    )
    root = tempfile.mkdtemp(prefix="rdb_ssj_")
    p_src, v_src = os.path.join(root, "p"), os.path.join(root, "v")
    purchases.repartition(3).write.mode("append").parquet(p_src)
    views.repartition(3).write.mode("append").parquet(v_src)
    ps = stream_parquet_dir(spark, p_src, purchases.schema).withWatermark("p_ts", "3650 days")
    vs = stream_parquet_dir(spark, v_src, views.schema).withWatermark("v_ts", "3650 days")
    joined = ps.join(
        vs,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
        & (F.col("v_ts") < F.col("p_ts")),
        "inner",
    ).select("purchase_id", "view_id")
    name = "ssj_" + uuid.uuid4().hex[:8]
    with streaming_shuffle(spark), rocksdb_state(spark):
        q = (
            joined.writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            dump_stream_progress(q, "streaming_stream_join")
            q.stop()
            release_stream_state(spark)
    return spark.table(name)


SQL_STREAMING_STREAM_JOIN = f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, epoch_ns(ts) AS pts
  FROM events WHERE event_type = 'purchase'),
v AS (
  SELECT event_id AS view_id, user_id, epoch_ns(ts) AS vts
  FROM events WHERE event_type = 'view')
SELECT p.purchase_id, v.view_id
FROM p JOIN v ON v.user_id = p.user_id
 AND v.vts >= p.pts - {7 * NS_PER_DAY}
 AND v.vts < p.pts
"""


# -- custom stateful operator (applyInPandasWithState) in the gate ------------

def q_streaming_stateful_totals(spark: SparkSession, sf: str) -> DataFrame:
    """Custom stateful streaming operator in the correctness gate:
    per-user running (count, total) via ``applyInPandasWithState``
    (streaming/listen.py) over a 3-batch replay. Values ride as exact
    integer micro-units so state accumulation is batch-composition-proof;
    the final state per user (picked by max_by over the monotone count)
    must equal the plain batch GROUP BY of the oracle.

    Runs under the ROCKSDB state store (round 7): per-user state is
    key-proportional (billions of keys at 100 TB); the A/B measured par
    wall (3.6-3.9 s vs 3.3-5.5 s) at 0.7 → 0.4 MB state for the
    fixture's 1,500 users (PLANS.md round-7)."""
    import uuid

    from reactivedb_spark.sources import stream_parquet_dir
    from reactivedb_spark.streaming.listen import stateful_running_totals

    ev = load(spark, sf, "events").select(
        "user_id",
        (F.col("value").cast("decimal(18,6)") * 1_000_000)
        .cast("long").alias("vl"),
    )
    root = tempfile.mkdtemp(prefix="rdb_sst_")
    src = os.path.join(root, "in")
    ev.repartition(3).write.mode("append").parquet(src)
    totals = stateful_running_totals(
        stream_parquet_dir(spark, src, ev.schema), "user_id", "vl"
    )
    name = "sst_" + uuid.uuid4().hex[:8]
    with streaming_shuffle(spark), rocksdb_state(spark):
        q = (
            totals.writeStream.format("memory").queryName(name)
            .outputMode("update")
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            dump_stream_progress(q, "streaming_stateful_totals")
            q.stop()
            release_stream_state(spark)
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max_by("total", "n").cast("long").alias("total_micro"),
        )
    )


SQL_STREAMING_STATEFUL_TOTALS = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(CAST("value" AS DECIMAL(18,6)) * 1000000 AS BIGINT)) AS BIGINT)
         AS total_micro
FROM events GROUP BY user_id
"""


# -- equi-depth deciles (ntile) -----------------------------------------------

def q_price_deciles(spark: SparkSession, sf: str) -> DataFrame:
    """Per-segment equi-depth histogram: NTILE(10) over order value by
    customer market segment — exact distributed quantiles as one keyed
    window shuffle (rank math, no sketch error, portable everywhere).
    Ties broken by orderkey so both engines bin identically."""
    from pyspark.sql.window import Window as W

    o = load(spark, sf, "orders")
    # customer grows with the corpus — size-gated hint, not unconditional
    c = load(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    w = W.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    return (
        o.join(stats.broadcast_if_small(c), o.o_custkey == c.c_custkey)
        .withColumn("decile", F.ntile(10).over(w))
        .groupBy("c_mktsegment", "decile")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


SQL_PRICE_DECILES = """
SELECT c_mktsegment, decile, CAST(count(*) AS BIGINT) AS n,
       min(o_totalprice) AS lo, max(o_totalprice) AS hi
FROM (
  SELECT c.c_mktsegment, o.o_totalprice,
         ntile(10) OVER (PARTITION BY c.c_mktsegment
                         ORDER BY o.o_totalprice, o.o_orderkey) AS decile
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment, decile
"""


# -- lead/lag deltas ----------------------------------------------------------

def q_event_deltas(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user inter-event gaps and value deltas (lead/lag windows) —
    integer-ns gaps, per-row double subtraction (portable), one keyed
    window shuffle."""
    from pyspark.sql.window import Window as W

    ev = load(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id",
        (F.col("ts") - F.lag("ts").over(w)).cast("long").alias("gap_ns"),
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )


SQL_EVENT_DELTAS = """
WITH o AS (SELECT event_id, user_id, event_type, "value", epoch_ns(ts) AS tns
           FROM events)
SELECT event_id, user_id,
       CAST(tns - lag(tns) OVER w AS BIGINT) AS gap_ns,
       "value" - lag("value") OVER w AS value_delta,
       lead(event_type) OVER w AS next_type
FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)
"""


# -- forward as-of join with tolerance ----------------------------------------

def q_asof_forward(spark: SparkSession, sf: str) -> DataFrame:
    """Forward as-of with a 3-day tolerance: for each click, the user's
    NEXT purchase within 3 days (conversion attribution). Same union +
    ordered-window plan as backward as-of, time order reversed; the
    tolerance NULLs matches beyond the window. Oracle: DuckDB ASOF with
    ``<=`` plus the same tolerance filter."""
    from reactivedb_spark.operators.asof import asof_join

    ev = load(spark, sf, "events")
    base = ev.select(
        "event_id", "user_id", "event_type", "value",
        F.expr("CAST(ts div 1000 AS BIGINT)").alias("tus"),
    )
    clicks = base.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "tus"
    )
    purchases = base.filter(F.col("event_type") == "purchase").select(
        "user_id", "tus", F.col("value").alias("next_purchase"),
        F.col("event_id").alias("p_event_id"),
    )
    out = asof_join(
        clicks, purchases, on=["user_id"], time_col="tus",
        value_cols=["next_purchase"], tie_break="p_event_id", suffix="",
        direction="forward", tolerance=3 * 24 * 3600 * 1_000_000,
    )
    return out.select("event_id", "user_id", "tus", "next_purchase")


SQL_ASOF_FORWARD = f"""
WITH base AS (
  SELECT event_id, user_id, event_type, "value", epoch_us(ts) AS tus FROM events),
clicks AS (
  SELECT event_id, user_id, tus FROM base WHERE event_type = 'click'),
purchases AS (
  SELECT user_id, tus, "value" AS next_purchase, event_id FROM base
  WHERE event_type = 'purchase'
  QUALIFY row_number() OVER (PARTITION BY user_id, tus ORDER BY event_id DESC) = 1)
SELECT c.event_id, c.user_id, c.tus,
       CASE WHEN p.tus - c.tus <= {3 * 24 * 3600 * 1_000_000}
            THEN p.next_purchase END AS next_purchase
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.tus <= p.tus
"""


# -- bloom-pruned semi join ---------------------------------------------------

def q_bloom_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-pruned semi join (operators/bloom.py): lineitems of
    high-value orders. The 4 KiB xxhash64-bit filter built from the small
    side prunes the big scan map-side before the shuffle; the exact
    semi-join afterward removes false positives, so the oracle is the
    plain semi-join — the filter must be invisible in the result."""
    from reactivedb_spark.operators.bloom import bloom_semi_join

    li = load(spark, sf, "lineitem")
    big_orders = load(spark, sf, "orders").filter(
        F.col("o_totalprice") > 400000.0
    ).select(F.col("o_orderkey").alias("l_orderkey"))
    kept = bloom_semi_join(li, big_orders, "l_orderkey")
    return kept.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("decimal(38,2)").cast("double").alias("sum_qty"),
    )


SQL_BLOOM_SEMI_JOIN = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
FROM lineitem l
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l.l_orderkey AND o.o_totalprice > 400000.0)
GROUP BY l_returnflag
"""


# -- skew-salted aggregation --------------------------------------------------

def q_skew_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage salted aggregation (operators/skew.py) over lineitem's
    3 ultra-hot return-flag keys — a hot key spreads over 16 reducers in
    stage 1, stage 2 combines one row per (key, salt). The oracle is the
    plain GROUP BY: salting must be invisible in the result (decimal
    sums, order-independent)."""
    from reactivedb_spark.operators.skew import salted_sum_count

    li = load(spark, sf, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
        F.col("l_extendedprice").cast("decimal(18,6)").alias("price"),
    )
    out = salted_sum_count(li, ["l_returnflag"], ["qty", "price"])
    return out.select(
        "l_returnflag", "n",
        F.col("sum_qty").cast("decimal(38,2)").cast("double").alias("sum_qty"),
        F.col("sum_price").cast("decimal(38,6)").cast("double").alias("sum_price"),
    )


SQL_SKEW_SALTED_AGG = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_price
FROM lineitem GROUP BY l_returnflag
"""


# -- grouping sets ------------------------------------------------------------

def q_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS (finer than cube/rollup): totals by
    (status, priority), by status alone, and grand total, with
    grouping_id to disambiguate NULLs — one pass, Spark expands the
    sets map-side. Sums fold decimals per the suite contract."""
    o = load(spark, sf, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               CAST(count(*) AS BIGINT) AS n,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
                 AS revenue
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """)


SQL_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
         AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


def q_multimodal_pixel_features(spark: SparkSession, sf: str) -> DataFrame:
    """REAL pixel-content features end-to-end: text bytes → genuine
    grayscale PNG (stdlib encoder) → REAL decode (CRC walk, inflate,
    de-filter) → strided bucket means over the DECODED pixel plane
    (functions/multimodal.py:extract_features, PNG path). The encoder
    zero-pads the last row, so the pixel count is 16·height and every
    bucket sees exactly n_pix/8 samples — the oracle recomputes the
    identical means from the source text with explicit zero padding; a
    decoder bug (filter, inflate, geometry) shifts the means and breaks
    the match. Output exploded long-form (doc_id, j, feat): scalar
    columns hash-compare robustly across engines."""
    d = spread(load(spark, sf, "documents"))  # straggler smoothing
    from reactivedb_spark.functions import multimodal

    pay = multimodal.encode_png(d, "doc_id", "text", width=16)
    feats = multimodal.extract_features(pay, "doc_id")
    return feats.select(
        "doc_id", F.posexplode("features").alias("j", "feat")
    ).select(
        "doc_id",
        F.col("j").cast("long").alias("j"),
        F.col("feat").cast("double").alias("feat"),
    )


SQL_MULTIMODAL_PIXEL_FEATURES = """
WITH dims AS (
  SELECT doc_id, length(text) AS len,
         16 * greatest((length(text) + 15) // 16, 1) AS n_pix
  FROM documents),
series AS (SELECT g.pos FROM generate_series(0, 4095) g(pos)),
pix AS (
  -- fixture text is pure ASCII: char codes == UTF-8 payload bytes;
  -- positions beyond len are the encoder's zero row-padding
  SELECT d.doc_id, s.pos % 8 AS j,
         CASE WHEN s.pos < d.len
              THEN ascii(substr(doc.text, CAST(s.pos + 1 AS INT), 1))
              ELSE 0 END AS code
  FROM dims d JOIN documents doc USING (doc_id)
  CROSS JOIN series s WHERE s.pos < d.n_pix)
SELECT doc_id, CAST(j AS BIGINT) AS j,
       CAST(CAST((CAST(SUM(code) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / 255.0
                 AS REAL) AS DOUBLE) AS feat
FROM pix GROUP BY doc_id, j
"""


def q_multimodal_resize(spark: SparkSession, sf: str) -> DataFrame:
    """REAL image resize end-to-end: text bytes → grayscale PNG (width
    16) → decode → nearest-neighbor grid downsample to ≤8×8 → re-encode
    → decode again. The oracle recomputes the exact nearest-neighbor
    pixel picks (source index ``(y·h)//th·16 + (x·16)//8``) from the
    source text with zero padding — any resize-geometry or resampling
    bug shifts ``pix_sum`` or the reported dimensions and breaks the
    match."""
    from reactivedb_spark.functions import multimodal

    d = spread(load(spark, sf, "documents"))  # straggler smoothing
    pay = multimodal.encode_png(d, "doc_id", "text", width=16)
    # This is the suite's only THREE-deep Python chain (encode → resize
    # → decode in one task); late in a long session the tail workers
    # starve behind the two-hop relay — same mode as wav_frame_features
    # (VERDICT r8 #1), observed when the r9 window rotation moved this
    # query to the session tail (2.9-4.7 s vs its 1.6 s median).
    # Materializing ONE boundary caps the relay depth at two hops, which
    # the jpeg/wav two-stage chains show is stable at any position.
    pay = cache.pin(pay)
    pay.count()
    rez = multimodal.resize(pay, "doc_id", target=8)
    return multimodal.decode_png(rez, "doc_id")


SQL_MULTIMODAL_RESIZE = """
WITH dims AS (
  SELECT doc_id, length(text) AS len,
         greatest((length(text) + 15) // 16, 1) AS h
  FROM documents),
d2 AS (SELECT doc_id, len, h, least(8, h) AS th FROM dims),
grid AS (
  SELECT gy.y, gx.x
  FROM generate_series(0, 7) gy(y) CROSS JOIN generate_series(0, 7) gx(x)),
pix AS (
  -- nearest-neighbor source position: row (y*h)//th, column (x*16)//8 = 2x;
  -- positions beyond len are the encoder's zero padding
  SELECT d.doc_id, d.th,
         CASE WHEN ((g.y * d.h) // d.th) * 16 + 2 * g.x < d.len
              THEN ascii(substr(t.text,
                   CAST(((g.y * d.h) // d.th) * 16 + 2 * g.x + 1 AS INT), 1))
              ELSE 0 END AS code
  FROM d2 d JOIN documents t USING (doc_id) CROSS JOIN grid g
  WHERE g.y < d.th)
SELECT doc_id,
       CAST(8 AS BIGINT) AS width,
       CAST(any_value(th) AS BIGINT) AS height,
       CAST(8 AS BIGINT) AS bit_depth,
       CAST(0 AS BIGINT) AS color_type,
       CAST(SUM(code) AS BIGINT) AS pix_sum
FROM pix GROUP BY doc_id
"""


def q_cms_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min-sketch heavy hitters (operators/sketch.py): token
    frequencies summarized into a 4×1024-cell sketch (one partial-
    aggregable groupBy — the whole corpus travels as ≤4096 longs), then
    the min-over-rows point estimate for each distinct token, top-20 by
    (est desc, token). The oracle replays the identical md5 cell
    algebra, so every overestimate collision must reproduce exactly —
    a hash, width, or merge bug shifts a cell and breaks the match."""
    from reactivedb_spark.operators.sketch import cms_topk

    tok = (
        load(spark, sf, "documents")
        .select(F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    return cms_topk(tok, "token", k=20)


SQL_CMS_HEAVY_HITTERS = """
WITH tok AS (
  SELECT token FROM (
    SELECT unnest(string_split(lower(trim(text)), ' ')) AS token
    FROM documents) WHERE token <> ''),
cells AS (
  SELECT g.i AS row,
         ('0x' || substr(md5('c' || g.i || '_' || token), 1, 15))::BIGINT % 1024 AS pos,
         CAST(count(*) AS BIGINT) AS cnt
  FROM tok CROSS JOIN generate_series(1, 4) g(i)
  GROUP BY 1, 2),
items AS (SELECT DISTINCT token FROM tok),
probes AS (
  SELECT token, g.i AS row,
         ('0x' || substr(md5('c' || g.i || '_' || token), 1, 15))::BIGINT % 1024 AS pos
  FROM items CROSS JOIN generate_series(1, 4) g(i)),
est AS (
  SELECT p.token, MIN(COALESCE(c.cnt, 0)) AS est
  FROM probes p LEFT JOIN cells c USING (row, pos)
  GROUP BY p.token)
SELECT token, CAST(est AS BIGINT) AS est
FROM est ORDER BY est DESC, token LIMIT 20
"""


def q_ann_knn_join(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate k-NN self-join (operators/similarity.py:knn_join):
    every vector's top-5 cosine neighbors among its LSH bucket-mates —
    the all-pairs ANN operator (vs the one-query ``similarity_topk``).
    The oracle replays the identical bucket/candidate/fixed-point-dot
    algebra and the same (cos_sim desc, doc_b) rank order."""
    from reactivedb_spark.operators import dedup
    from reactivedb_spark.operators.similarity import knn_join

    return knn_join(
        dedup.widen(load(spark, sf, "embeddings")), "vec_id", "embedding", k=5
    )


def q_ann_knn_join_banded(spark: SparkSession, sf: str) -> DataFrame:
    """Production config of the k-NN self-join (VERDICT r12 #7 class:
    bound the declared-quadratic candidate stage): same LSH buckets,
    but each vector pairs only with the 64 bucket-mates FOLLOWING it in
    (md5(id), id) order — candidates ≤ n·64 by construction, worst-case
    LINEAR however skewed the buckets get, where the unbanded bucket
    self-join measured 6.5 s → 238 s over sf1→sf10 (quadratic on the
    fixed 256-bucket layout). Identical output to ``ann_knn_join``
    whenever every bucket holds ≤ 65 vectors (the sf≤0.1 gates); the
    oracle replays the identical band rule."""
    from reactivedb_spark.operators import dedup
    from reactivedb_spark.operators.similarity import knn_join_banded

    return knn_join_banded(
        dedup.widen(load(spark, sf, "embeddings")), "vec_id", "embedding",
        k=5, band=64,
    )


def _sql_ann_knn_join_banded() -> str:
    from reactivedb_spark.suite import scale as _scale

    return (
        "WITH " + _scale._ELEM_CTE + ", " + _scale._BUCKETS_CTE + """,
posn AS (
  SELECT vec_id, bucket,
         row_number() OVER (PARTITION BY bucket
                            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS pos
  FROM buckets),
cand AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM posn a JOIN posn b
    ON a.bucket = b.bucket AND b.pos > a.pos AND b.pos <= a.pos + 64),
n2 AS (SELECT vec_id, SUM(xl * xl) AS n2 FROM elem GROUP BY vec_id),
dotp AS (
  SELECT c.doc_a, c.doc_b, SUM(ea.xl * eb.xl) AS dot
  FROM cand c
  JOIN elem ea ON ea.vec_id = c.doc_a
  JOIN elem eb ON eb.vec_id = c.doc_b AND eb.j = ea.j
  GROUP BY c.doc_a, c.doc_b),
pairs AS (
  SELECT d.doc_a, d.doc_b,
         round((CAST(d.dot AS DOUBLE) / 1e16)
               / (sqrt(CAST(na.n2 AS DOUBLE) / 1e16)
                  * sqrt(CAST(nb.n2 AS DOUBLE) / 1e16)), 9) AS cos_sim
  FROM dotp d
  JOIN n2 na ON na.vec_id = d.doc_a
  JOIN n2 nb ON nb.vec_id = d.doc_b),
sym AS (
  SELECT doc_a, doc_b, cos_sim FROM pairs
  UNION ALL
  SELECT doc_b AS doc_a, doc_a AS doc_b, cos_sim FROM pairs),
ranked AS (
  SELECT doc_a, doc_b, cos_sim,
         row_number() OVER (PARTITION BY doc_a
                            ORDER BY cos_sim DESC, doc_b) AS rnk
  FROM sym)
SELECT doc_a, doc_b, CAST(rnk AS BIGINT) AS rank, cos_sim
FROM ranked WHERE rnk <= 5
"""
    )


def _sql_ann_knn_join() -> str:
    from reactivedb_spark.suite import scale as _scale

    return (
        "WITH " + _scale._ELEM_CTE + ", " + _scale._BUCKETS_CTE + """,
cand AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
n2 AS (SELECT vec_id, SUM(xl * xl) AS n2 FROM elem GROUP BY vec_id),
dotp AS (
  SELECT c.doc_a, c.doc_b, SUM(ea.xl * eb.xl) AS dot
  FROM cand c
  JOIN elem ea ON ea.vec_id = c.doc_a
  JOIN elem eb ON eb.vec_id = c.doc_b AND eb.j = ea.j
  GROUP BY c.doc_a, c.doc_b),
pairs AS (
  SELECT d.doc_a, d.doc_b,
         round((CAST(d.dot AS DOUBLE) / 1e16)
               / (sqrt(CAST(na.n2 AS DOUBLE) / 1e16)
                  * sqrt(CAST(nb.n2 AS DOUBLE) / 1e16)), 9) AS cos_sim
  FROM dotp d
  JOIN n2 na ON na.vec_id = d.doc_a
  JOIN n2 nb ON nb.vec_id = d.doc_b),
sym AS (
  SELECT doc_a, doc_b, cos_sim FROM pairs
  UNION ALL
  SELECT doc_b AS doc_a, doc_a AS doc_b, cos_sim FROM pairs),
ranked AS (
  SELECT doc_a, doc_b, cos_sim,
         row_number() OVER (PARTITION BY doc_a
                            ORDER BY cos_sim DESC, doc_b) AS rnk
  FROM sym)
SELECT doc_a, doc_b, CAST(rnk AS BIGINT) AS rank, cos_sim
FROM ranked WHERE rnk <= 5
"""
    )


def q_sample_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted Bernoulli (PPS) sample (operators/sampling.py:
    weighted_sample): orders kept with probability ∝ o_totalprice —
    the importance-sampling step of a training-mix pipeline. The draw
    is md5-seeded and the comparison is pure IEEE arithmetic (no libm),
    so both engines keep the identical row set."""
    from reactivedb_spark.operators.sampling import weighted_sample

    o = load(spark, sf, "orders")
    return weighted_sample(o, "o_orderkey", "o_totalprice", rate=1e-6).select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice")
    )


SQL_SAMPLE_WEIGHTED = """
SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders
WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE)
      / 1152921504606846976.0
      < CAST(1e-6 AS DOUBLE) * CAST(o_totalprice AS DOUBLE)
"""


def q_streaming_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked tumbling-window aggregation — the event-time operator
    class the reference lacks entirely (SURVEY.md §2.4), as a streaming
    replay: events through ``F.window(tstamp, '1 hour')`` (epoch-aligned)
    with per-hour count and exact uid sum. The streaming twin of the
    batch ``events_hourly``; the oracle buckets the same integer µs by
    hour, so micro-batch composition must be invisible."""
    import uuid

    from reactivedb_spark.sources import stream_parquet_dir

    ev = load(spark, sf, "events").select(
        "event_id", "user_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("tstamp"),
    )
    root = tempfile.mkdtemp(prefix="rdb_tumb_")
    src = os.path.join(root, "in")
    ev.repartition(3).write.mode("append").parquet(src)
    name = "tumb_" + uuid.uuid4().hex[:8]
    agg = (
        stream_parquet_dir(spark, src, ev.schema)
        .withWatermark("tstamp", "3650 days")
        .groupBy(F.window("tstamp", "1 hour"))
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
            dump_stream_progress(q, "streaming_tumbling")
            q.stop()
            release_stream_state(spark)
    return spark.table(name).select(
        F.unix_micros(F.col("window.start")).alias("hour_start_us"), "n", "uid_sum"
    )


SQL_STREAMING_TUMBLING = """
SELECT (epoch_ns(ts) // 1000) // 3600000000 * 3600000000 AS hour_start_us,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(user_id) AS BIGINT) AS uid_sum
FROM events GROUP BY 1
"""


QUERIES = {
    "multimodal_pixel_features": q_multimodal_pixel_features,
    "multimodal_resize": q_multimodal_resize,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "ann_knn_join": q_ann_knn_join,
    "ann_knn_join_banded": q_ann_knn_join_banded,
    "sample_weighted": q_sample_weighted,
    "streaming_tumbling": q_streaming_tumbling,
    "hll_users": q_hll_users,
    "quantile_sketch_prices": q_quantile_sketch_prices,
    "streaming_dedup": q_streaming_dedup,
    "streaming_stream_join": q_streaming_stream_join,
    "streaming_stateful_totals": q_streaming_stateful_totals,
    "price_deciles": q_price_deciles,
    "event_deltas": q_event_deltas,
    "asof_forward": q_asof_forward,
    "skew_salted_agg": q_skew_salted_agg,
    "bloom_semi_join": q_bloom_semi_join,
    "grouping_sets": q_grouping_sets,
    "range_join_attrib": q_range_join_attrib,
    "interval_join": q_interval_join,
    "impute_docs": q_impute_docs,
    "retention_weeks": q_retention_weeks,
    "source_jsonl": q_source_jsonl,
    "source_csv": q_source_csv,
    "unigram_logprob": q_unigram_logprob,
    "bigram_logprob": q_bigram_logprob,
    "pagerank_orders": q_pagerank_orders,
    "triangle_count": q_triangle_count,
    "kcore_parts": q_kcore_parts,
    "scd2_users": q_scd2_users,
    "dag_chain": q_dag_chain,
}

ORACLES = {
    "multimodal_pixel_features": SQL_MULTIMODAL_PIXEL_FEATURES,
    "multimodal_resize": SQL_MULTIMODAL_RESIZE,
    "cms_heavy_hitters": SQL_CMS_HEAVY_HITTERS,
    "ann_knn_join": _sql_ann_knn_join(),
    "ann_knn_join_banded": _sql_ann_knn_join_banded(),
    "sample_weighted": SQL_SAMPLE_WEIGHTED,
    "streaming_tumbling": SQL_STREAMING_TUMBLING,
    "hll_users": SQL_HLL_USERS,
    "quantile_sketch_prices": _sql_quantile_sketch_prices(),
    "streaming_dedup": SQL_STREAMING_DEDUP,
    "streaming_stream_join": SQL_STREAMING_STREAM_JOIN,
    "streaming_stateful_totals": SQL_STREAMING_STATEFUL_TOTALS,
    "price_deciles": SQL_PRICE_DECILES,
    "event_deltas": SQL_EVENT_DELTAS,
    "asof_forward": SQL_ASOF_FORWARD,
    "skew_salted_agg": SQL_SKEW_SALTED_AGG,
    "bloom_semi_join": SQL_BLOOM_SEMI_JOIN,
    "grouping_sets": SQL_GROUPING_SETS,
    "range_join_attrib": SQL_RANGE_JOIN_ATTRIB,
    "interval_join": SQL_INTERVAL_JOIN,
    "impute_docs": SQL_IMPUTE_DOCS,
    "retention_weeks": SQL_RETENTION_WEEKS,
    "source_jsonl": SQL_SOURCE_JSONL,
    "source_csv": SQL_SOURCE_CSV,
    "unigram_logprob": SQL_UNIGRAM_LOGPROB,
    "bigram_logprob": SQL_BIGRAM_LOGPROB,
    "pagerank_orders": SQL_PAGERANK_ORDERS,
    "triangle_count": SQL_TRIANGLE_COUNT,
    "kcore_parts": SQL_KCORE_PARTS,
    "scd2_users": SQL_SCD2_USERS,
    "dag_chain": SQL_DAG_CHAIN,
}


def q_stream_static_enrich(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-static enrichment join — the canonical Structured-
    Streaming dimension lookup: a purchase stream joined per micro-batch
    against a STATIC dim (customer ⋈ nation, prepared batch-side and
    broadcast). Stream-static inner joins are STATELESS — each
    micro-batch probes the dim and emits; nothing accumulates in the
    state store, so at 100 TB the cost is the broadcast hash probe per
    batch and watermarks are unnecessary. The oracle is the equivalent
    batch join: micro-batch slicing must not change the enriched rows.
    `value` passes through untouched (no arithmetic → bit-exact)."""
    from reactivedb_spark.suite._common import replay_batches

    ev = load(spark, sf, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    cust = load(spark, sf, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    nation = load(spark, sf, "nation").select("n_nationkey", "n_name")
    dim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_mktsegment", "n_name")
    )
    batches = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]

    def transform(stream):
        return (
            stream.filter(F.col("event_type") == "purchase")
            .join(F.broadcast(dim), F.col("user_id") == F.col("c_custkey"))
            .select("event_id", "user_id", "c_mktsegment", "n_name", "value")
        )

    return replay_batches(
        spark, batches,
        "event_id long, user_id long, event_type string, value double",
        transform, prefix="sse",
    )


SQL_STREAM_STATIC_ENRICH = """
SELECT e.event_id, e.user_id, c.c_mktsegment, n.n_name, e.value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE e.event_type = 'purchase'
"""

QUERIES["stream_static_enrich"] = q_stream_static_enrich
ORACLES["stream_static_enrich"] = SQL_STREAM_STATIC_ENRICH


def q_ks_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution-shift detection (operators/numeric.ks_pairs): exact
    two-sample KS statistic of the document-length distribution for
    every unordered pair of sources. Integer cross-multiplied ECDF gaps
    (no float accumulates), one division per pair at the end; the pair
    relation broadcasts into two equi-joins — never an OR-condition
    nested loop."""
    from reactivedb_spark.operators import numeric

    return numeric.ks_pairs(load(spark, sf, "documents"), "source", "n_chars")


def _sql_ks_drift() -> str:
    from reactivedb_spark.operators import numeric

    return numeric.ks_oracle_sql("documents", "source", "n_chars")


QUERIES["ks_drift"] = q_ks_drift
ORACLES["ks_drift"] = _sql_ks_drift()
