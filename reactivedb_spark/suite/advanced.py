"""Round-8 tail extensions: fuzzy edit-distance join, 2-D skyline,
deterministic label-propagation communities, Markov event transitions,
and CDC changelog application — each as a (Spark query, DuckDB oracle)
pair following the suite conventions (suite/__init__.py): doubles pass
through untouched, ratios are single integer divisions, iterative
algorithms run a fixed round budget the oracle unrolls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from reactivedb_spark.suite._common import load


# -- fuzzy edit-distance self-join ---------------------------------------------

def q_fuzzy_join_edit(spark: SparkSession, sf: str) -> DataFrame:
    """All customer-name pairs within Levenshtein distance 1 via the
    ED-Join-style q-gram prefix filter (operators/fuzzyjoin.py):
    positional-bigram prefixes (rarest q·d+1 grams in a global df
    order) → equi-join candidates → JVM levenshtein verify. The oracle
    is the brute-force quadratic join — the lossless filter chain must
    reproduce it exactly."""
    from reactivedb_spark.operators.fuzzyjoin import edit_distance_join

    c = load(spark, sf, "customer").select("c_custkey", "c_name")
    return edit_distance_join(c, "c_custkey", "c_name", max_dist=1, q=2)


SQL_FUZZY_JOIN_EDIT = """
WITH c AS (SELECT c_custkey AS k, c_name AS n FROM customer)
SELECT CAST(a.k AS BIGINT) AS id_a, CAST(b.k AS BIGINT) AS id_b,
       CAST(levenshtein(a.n, b.n) AS BIGINT) AS dist
FROM c a JOIN c b
  ON a.k < b.k AND abs(length(a.n) - length(b.n)) <= 1
WHERE levenshtein(a.n, b.n) <= 1
"""


# -- 2-D Pareto frontier (skyline) ---------------------------------------------

def q_pareto_front(spark: SparkSession, sf: str) -> DataFrame:
    """Per-brand price/size skyline (operators/skyline.py): parts not
    dominated by any same-brand part that is cheaper-or-equal AND
    bigger-or-equal (one strict). Window-only plan — dedup minimize
    values, running max over the strictly-cheaper prefix, join back —
    vs the oracle's NOT EXISTS dominance anti-join. Doubles pass
    through untouched (comparisons only → bit-exact)."""
    from reactivedb_spark.operators.skyline import pareto_front

    p = load(spark, sf, "part").select(
        "p_brand", "p_partkey", "p_retailprice", "p_size")
    out = pareto_front(p, ["p_brand"], "p_retailprice", "p_size")
    return out.select(
        "p_brand",
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
        F.col("p_size").cast("long").alias("p_size"),
    )


SQL_PARETO_FRONT = """
SELECT p_brand, CAST(p_partkey AS BIGINT) AS p_partkey,
       CAST(p_retailprice AS DOUBLE) AS p_retailprice,
       CAST(p_size AS BIGINT) AS p_size
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_brand = a.p_brand
    AND b.p_retailprice <= a.p_retailprice
    AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
"""


# -- label-propagation communities ----------------------------------------------

LPA_ROUNDS = 3


def q_label_prop_comms(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic synchronous label propagation
    (operators/graph.py:label_propagation) over the part co-purchase
    graph: 3 sweeps of most-frequent-neighbour-label (ties → smaller
    label). The oracle unrolls the identical sweeps as chained CTEs
    with the same (count desc, label asc) argmax — a different
    tie-break, round count, or an asynchronous update breaks the
    hash."""
    from reactivedb_spark.operators.graph import label_propagation

    li = load(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey")
    ).distinct()
    ka = li.select("okey", F.col("pkey").alias("u"))
    kb = li.select("okey", F.col("pkey").alias("v"))
    edges = (
        ka.join(kb, "okey").filter(F.col("u") < F.col("v"))
        .select("u", "v").distinct()
    )
    return label_propagation(edges, rounds=LPA_ROUNDS)


def _label_prop_sql(rounds: int = LPA_ROUNDS) -> str:
    ctes = ["""li AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem),
und AS (SELECT DISTINCT a.pkey AS x, b.pkey AS y
        FROM li a JOIN li b ON a.okey = b.okey AND a.pkey < b.pkey),
e0 AS MATERIALIZED (SELECT x AS s, y AS d FROM und UNION ALL SELECT y AS s, x AS d FROM und),
l0 AS (SELECT DISTINCT s AS node, s AS label FROM e0)"""]
    for r in range(rounds):
        ctes.append(
            f"l{r + 1} AS MATERIALIZED (SELECT node, label FROM ("
            f"SELECT node, label, row_number() OVER ("
            f"PARTITION BY node ORDER BY n DESC, label ASC) AS rk FROM ("
            f"SELECT e.d AS node, l.label, count(*) AS n "
            f"FROM l{r} l JOIN e0 e ON l.node = e.s "
            f"GROUP BY e.d, l.label)) WHERE rk = 1)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT CAST(node AS BIGINT) AS node, "
          f"CAST(label AS BIGINT) AS label FROM l{rounds}"
    )


SQL_LABEL_PROP_COMMS = _label_prop_sql()


# -- Markov event-transition matrix ----------------------------------------------

def q_event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: lag(event_type) in (ts, event_id) order, count per
    (prev, next), probability as parts-per-million by INTEGER division
    (bit-portable; a double ratio would hash-drift). One window pass +
    one aggregation; at 100 TB both key on user/prev — no global
    sort."""
    from pyspark.sql import Window

    ev = load(spark, sf, "events").select("user_id", "ts", "event_id",
                                          "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("prev_type")
    return (
        pairs.withColumn("_tot", F.sum("n").over(tot))
        .select(
            "prev_type", "next_type",
            F.col("n").cast("long").alias("n"),
            F.expr("CAST((n * 1000000) DIV _tot AS BIGINT)").alias("prob_ppm"),
        )
    )


SQL_EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
cnt AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type)
SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
       CAST((n * 1000000) // sum(n) OVER (PARTITION BY prev_type)
            AS BIGINT) AS prob_ppm
FROM cnt
"""


# -- CDC changelog application (MERGE INTO) ---------------------------------------

def q_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE/CDC apply (operators/cdc.py): the events stream becomes an
    ordered changelog on the customer snapshot — purchases upsert the
    account balance to the event value, errors delete the account,
    last write per key wins in (ts, event_id) order. Keys are shifted
    (+1400) so the changelog exercises update, delete AND insert paths
    against the sf-scaled snapshot. `value` / `c_acctbal` pass through
    untouched (no arithmetic → bit-exact)."""
    from reactivedb_spark.operators.cdc import apply_changelog

    snap = load(spark, sf, "customer").select(
        F.col("c_custkey").cast("long").alias("acct"),
        F.col("c_acctbal").cast("double").alias("balance"),
    )
    ch = (
        load(spark, sf, "events")
        .filter(F.col("event_type").isin("purchase", "error"))
        .select(
            (F.col("user_id") + F.lit(1400)).cast("long").alias("acct"),
            F.when(F.col("event_type") == "purchase", F.lit("upsert"))
            .otherwise(F.lit("delete")).alias("op"),
            F.col("value").cast("double").alias("balance"),
            "ts", "event_id",
        )
    )
    out = apply_changelog(snap, ch, key="acct", payload_cols=["balance"],
                          seq_cols=["ts", "event_id"])
    return out.select(F.col("acct").cast("long").alias("acct"), "balance")


SQL_MERGE_UPSERT = """
WITH ch AS (
  SELECT acct, op, balance FROM (
    SELECT user_id + 1400 AS acct,
           CASE WHEN event_type = 'purchase' THEN 'upsert'
                ELSE 'delete' END AS op,
           value AS balance,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rk
    FROM events WHERE event_type IN ('purchase', 'error'))
  WHERE rk = 1)
SELECT CAST(COALESCE(ch.acct, c.c_custkey) AS BIGINT) AS acct,
       CAST(CASE WHEN ch.op = 'upsert' THEN ch.balance
                 ELSE c.c_acctbal END AS DOUBLE) AS balance
FROM ch FULL OUTER JOIN customer c ON ch.acct = c.c_custkey
WHERE ch.op IS NULL OR ch.op = 'upsert'
"""


QUERIES = {
    "fuzzy_join_edit": q_fuzzy_join_edit,
    "pareto_front": q_pareto_front,
    "label_prop_comms": q_label_prop_comms,
    "event_transitions": q_event_transitions,
    "merge_upsert": q_merge_upsert,
}

ORACLES = {
    "fuzzy_join_edit": SQL_FUZZY_JOIN_EDIT,
    "pareto_front": SQL_PARETO_FRONT,
    "label_prop_comms": SQL_LABEL_PROP_COMMS,
    "event_transitions": SQL_EVENT_TRANSITIONS,
    "merge_upsert": SQL_MERGE_UPSERT,
}


# -- association rules (market basket) -------------------------------------------

def q_assoc_rules(spark: SparkSession, sf: str) -> DataFrame:
    """Pair association rules (operators/assoc.py) over order baskets:
    support/confidence/lift for part pairs co-purchased in >= 3 orders,
    both directions, all ratios integer ppm (bit-portable). One
    basket-keyed self-join + keyed counts — never an item-item
    product."""
    from reactivedb_spark.operators.assoc import association_rules

    li = load(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey"))
    return association_rules(li, "okey", "pkey", min_count=3)


SQL_ASSOC_RULES = """
WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
nb AS (SELECT count(DISTINCT b) AS n FROM bi),
item_n AS (SELECT i, count(*) AS n_item FROM bi GROUP BY i),
pair_n AS (
  SELECT a.i AS x, b.i AS y, count(*) AS n_pair
  FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
  GROUP BY a.i, b.i HAVING count(*) >= 3),
directed AS (
  SELECT x AS antecedent, y AS consequent, n_pair FROM pair_n
  UNION ALL
  SELECT y AS antecedent, x AS consequent, n_pair FROM pair_n)
SELECT CAST(d.antecedent AS BIGINT) AS antecedent,
       CAST(d.consequent AS BIGINT) AS consequent,
       CAST(d.n_pair AS BIGINT) AS n_pair,
       CAST((CAST(d.n_pair AS HUGEINT) * 1000000) // nb.n AS BIGINT)
         AS support_ppm,
       CAST((CAST(d.n_pair AS HUGEINT) * 1000000) // nx.n_item AS BIGINT)
         AS confidence_ppm,
       CAST((CAST(d.n_pair AS HUGEINT) * nb.n * 1000000)
            // (CAST(nx.n_item AS HUGEINT) * ny.n_item)
            AS BIGINT) AS lift_ppm
FROM directed d
JOIN item_n nx ON nx.i = d.antecedent
JOIN item_n ny ON ny.i = d.consequent
CROSS JOIN nb
"""


# -- trigram-indexed substring search ---------------------------------------------

TRIGRAM_PATTERNS = [
    "fast merge batch", "table window", "slow fast table", "hash value part",
]


def q_trigram_search(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-pattern substring search via a trigram inverted index
    (operators/retrieval.py:trigram_search — the pg_trgm design):
    conjunctive trigram probe, contains() verify on survivors only. The
    oracle is the naive per-pattern full scan the index must reproduce
    exactly (trigram candidacy is complete: every occurrence contains
    every pattern trigram)."""
    from reactivedb_spark.operators.retrieval import trigram_search

    d = load(spark, sf, "documents").select("doc_id", "text")
    return trigram_search(d, "doc_id", "text", TRIGRAM_PATTERNS)


SQL_TRIGRAM_SEARCH = """
WITH pats(pattern) AS (VALUES
  ('fast merge batch'), ('table window'), ('slow fast table'),
  ('hash value part'))
SELECT p.pattern, CAST(d.doc_id AS BIGINT) AS doc_id
FROM documents d JOIN pats p ON contains(d.text, p.pattern)
"""


def q_trigram_search_bounded(spark: SparkSession, sf: str) -> DataFrame:
    """The df-bounded PRODUCTION twin (VERDICT r12 #3;
    operators/retrieval.py:trigram_search_bounded): each pattern probes
    only its probe_k rarest trigrams by sampled document frequency, so
    the posting relation is df-bounded before the intersect; contains()
    verify keeps the result set identical to the research twin — the
    oracle is the same naive full scan."""
    from reactivedb_spark.operators.retrieval import trigram_search_bounded

    d = load(spark, sf, "documents").select("doc_id", "text")
    return trigram_search_bounded(d, "doc_id", "text", TRIGRAM_PATTERNS)


# -- cumulative distinct users (first-seen running count) --------------------------

def q_cumulative_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Running distinct-user count per hour — the "cumulative uniques"
    dashboard query, computed the scalable way: distinct is reduced to
    each user's FIRST hour (one keyed min), then a per-hour count and a
    running sum over the (small, post-aggregation) hour relation —
    never a per-bucket distinct rescan. Hours are integer epoch-hour
    indexes (ts is integer ns; no timezone dependence)."""
    from pyspark.sql import Window

    ev = load(spark, sf, "events").select(
        "user_id", F.expr("ts DIV 3600000000000").alias("hour_idx"))
    first_hour = ev.groupBy("user_id").agg(F.min("hour_idx").alias("hour_idx"))
    per_hour = first_hour.groupBy("hour_idx").agg(
        F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("hour_idx").rowsBetween(Window.unboundedPreceding, 0)
    return per_hour.select(
        F.col("hour_idx").cast("long").alias("hour_idx"),
        F.col("new_users").cast("long").alias("new_users"),
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


SQL_CUMULATIVE_DISTINCT = """
WITH fd AS (
  SELECT user_id, min(epoch_ns(ts) // 3600000000000) AS hour_idx
  FROM events GROUP BY user_id),
pd AS (SELECT hour_idx, count(*) AS new_users FROM fd GROUP BY hour_idx)
SELECT CAST(hour_idx AS BIGINT) AS hour_idx,
       CAST(new_users AS BIGINT) AS new_users,
       CAST(sum(new_users) OVER (ORDER BY hour_idx
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
FROM pd
"""


# -- streaming windowed distinct count ---------------------------------------------

def q_streaming_windowed_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Exact distinct users per hour as a STREAM: watermarked
    dropDuplicates on (user_id, hour) composed with a windowed count —
    the streaming-state pattern (dedup state feeding an aggregation)
    none of the other streaming queries exercise. COUNT(DISTINCT) is
    not incrementally computable as a plain fold; the dedup-then-count
    composition is the standard scalable rewrite, with per-key dedup
    state bounded by the watermark horizon. The oracle is the batch
    count(distinct) per hour — micro-batch slicing must be invisible."""
    import os as _os
    import tempfile as _tempfile
    import uuid

    from reactivedb_spark.sources import stream_parquet_dir
    from reactivedb_spark.suite._common import (
        dump_stream_progress, release_stream_state, streaming_shuffle)

    ev = load(spark, sf, "events").select(
        "user_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("tstamp"),
    )
    root = _tempfile.mkdtemp(prefix="rdb_wdist_")
    src = _os.path.join(root, "in")
    ev.repartition(3).write.mode("append").parquet(src)
    name = "wdist_" + uuid.uuid4().hex[:8]
    agg = (
        stream_parquet_dir(spark, src, ev.schema)
        .withWatermark("tstamp", "3650 days")
        # hour bucket via INSTANT arithmetic (unix_micros div), not
        # date_trunc: date_trunc('hour') truncates in SESSION-LOCAL
        # time, so any half-hour-offset timezone (Asia/Kolkata +05:30)
        # shifts the buckets off the oracle's UTC-hour grid — caught by
        # a +05:30 hostile drive in round 10 (721 vs 720 rows)
        .withColumn("hour_start", F.timestamp_micros(
            F.expr("unix_micros(tstamp) div 3600000000") * 3600000000))
        .dropDuplicates(["user_id", "hour_start"])
        .groupBy("hour_start")
        .agg(F.count(F.lit(1)).cast("long").alias("distinct_users"))
    )
    with streaming_shuffle(spark):
        q = (
            agg.writeStream.format("memory").queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", _os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            dump_stream_progress(q, "streaming_windowed_distinct")
            q.stop()
            release_stream_state(spark)
    return spark.table(name).select(
        F.unix_micros(F.col("hour_start")).alias("hour_start_us"),
        "distinct_users",
    )


SQL_STREAMING_WINDOWED_DISTINCT = """
SELECT (epoch_ns(ts) // 1000) // 3600000000 * 3600000000 AS hour_start_us,
       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
FROM events GROUP BY 1
"""

QUERIES.update({
    "assoc_rules": q_assoc_rules,
    "trigram_search": q_trigram_search,
    "trigram_search_bounded": q_trigram_search_bounded,
    "cumulative_distinct": q_cumulative_distinct,
    "streaming_windowed_distinct": q_streaming_windowed_distinct,
})

ORACLES.update({
    "assoc_rules": SQL_ASSOC_RULES,
    "trigram_search": SQL_TRIGRAM_SEARCH,
    "trigram_search_bounded": SQL_TRIGRAM_SEARCH,
    "cumulative_distinct": SQL_CUMULATIVE_DISTINCT,
    "streaming_windowed_distinct": SQL_STREAMING_WINDOWED_DISTINCT,
})


# -- guarded fuzzy join (production scale config) -----------------------------------

def q_fuzzy_join_guarded(spark: SparkSession, sf: str) -> DataFrame:
    """The production-scale configuration of the edit-distance join:
    ``max_bucket=100`` drops prefix-key buckets holding >100 strings
    BEFORE pair generation (the stop-band pattern of
    dedup_jaccard_guarded) — on gram-pathological corpora (tiny
    alphabet, fixed format: exactly this fixture) oversized buckets
    carry quadratic candidate cost and near-zero signal. The oracle
    replays the ENTIRE filter pipeline in SQL — positional bigrams with
    occurrence index, global (df, gram, occ) rarity order, q·d+1
    prefix, the bucket-count guard, length band, levenshtein verify —
    so the guard's exact drop semantics are driver-verified, not just
    its speed. (All fixture names are length 18, so the short-string
    pool is empty and the oracle covers the prefix path exactly.)"""
    from reactivedb_spark.operators.fuzzyjoin import edit_distance_join

    c = load(spark, sf, "customer").select("c_custkey", "c_name")
    return edit_distance_join(c, "c_custkey", "c_name", max_dist=1, q=2,
                              max_bucket=100)


# ONE source of truth for the guarded candidate pipeline the two
# oracles below share (fuzzy_join_guarded, record_linkage): positional
# bigrams with occurrence index, (df, gram, occ) rarity order, q·d+1=3
# prefix, the max_bucket stop-band, length band. A guard-semantics
# change edits THIS string and operators/fuzzyjoin.py together — never
# a third copy.
_GUARDED_CAND_CTES = """c AS (SELECT c_custkey AS id, c_name AS txt, length(c_name) AS len
           FROM customer WHERE c_name IS NOT NULL AND length(c_name) > 3),
g AS (SELECT id, len, gram,
             row_number() OVER (PARTITION BY id, gram ORDER BY pos) AS occ
      FROM (SELECT id, len, substring(txt, CAST(i AS INT), 2) AS gram, i AS pos
            FROM c, LATERAL unnest(generate_series(1, len - 1)) AS t(i))),
dfq AS (SELECT gram, occ, count(*) AS dfn FROM g GROUP BY gram, occ),
rk AS (SELECT g.id, g.len, g.gram, g.occ,
              row_number() OVER (PARTITION BY g.id
                                 ORDER BY dfq.dfn, g.gram, g.occ) AS r
       FROM g JOIN dfq USING (gram, occ)),
pref AS (SELECT id, len, gram, occ FROM rk WHERE r <= 3),
kept AS (SELECT gram, occ FROM pref GROUP BY gram, occ
         HAVING count(*) <= 100),
pg AS (SELECT pref.id, pref.len, pref.gram, pref.occ
       FROM pref JOIN kept USING (gram, occ)),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         FROM pg a JOIN pg b ON a.gram = b.gram AND a.occ = b.occ
          AND a.id < b.id AND abs(a.len - b.len) <= 1)"""

SQL_FUZZY_JOIN_GUARDED = f"""
WITH {_GUARDED_CAND_CTES}
SELECT CAST(cand.id_a AS BIGINT) AS id_a, CAST(cand.id_b AS BIGINT) AS id_b,
       CAST(levenshtein(ca.txt, cb.txt) AS BIGINT) AS dist
FROM cand JOIN c ca ON ca.id = cand.id_a JOIN c cb ON cb.id = cand.id_b
WHERE levenshtein(ca.txt, cb.txt) <= 1
"""

QUERIES["fuzzy_join_guarded"] = q_fuzzy_join_guarded
ORACLES["fuzzy_join_guarded"] = SQL_FUZZY_JOIN_GUARDED


# -- data-quality audit (constraint suite) -------------------------------------------

def q_dq_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Declarative data-quality audit (operators/quality.py) over
    lineitem: four named predicates folded into ONE conditional
    aggregation pass, a pk-uniqueness count on (orderkey, linenumber),
    and an fk-orphan anti-join against orders — the Deequ-style
    constraint suite as a long-format metrics relation. The fixture is
    clean, so the VALUE of the audit row (zero) is itself part of the
    verified contract."""
    from reactivedb_spark.operators.quality import audit

    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    return audit(
        li,
        checks={
            "quantity_positive": F.col("l_quantity") > 0,
            "price_nonneg": F.col("l_extendedprice") >= 0,
            "discount_range": (F.col("l_discount") >= 0)
            & (F.col("l_discount") <= 1),
            "returnflag_domain": F.col("l_returnflag").isin("A", "N", "R"),
        },
        pk=["l_orderkey", "l_linenumber"],
        fk=(o, ["l_orderkey"], ["o_orderkey"]),
    )


SQL_DQ_AUDIT = """
SELECT 'rows' AS metric, CAST(count(*) AS BIGINT) AS value FROM lineitem
UNION ALL
SELECT 'violations:discount_range',
       CAST(sum(CASE WHEN l_discount >= 0 AND l_discount <= 1
                THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'violations:price_nonneg',
       CAST(sum(CASE WHEN l_extendedprice >= 0 THEN 0 ELSE 1 END)
            AS BIGINT) FROM lineitem
UNION ALL
SELECT 'violations:quantity_positive',
       CAST(sum(CASE WHEN l_quantity > 0 THEN 0 ELSE 1 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'violations:returnflag_domain',
       CAST(sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END)
            AS BIGINT) FROM lineitem
UNION ALL
SELECT 'pk_duplicate_rows',
       CAST(coalesce(sum(n - 1), 0) AS BIGINT)
FROM (SELECT count(*) AS n FROM lineitem
      GROUP BY l_orderkey, l_linenumber)
UNION ALL
SELECT 'fk_orphan_rows',
       CAST(count(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
"""


# -- weighted median -----------------------------------------------------------------

def q_weighted_median_price(spark: SparkSession, sf: str) -> DataFrame:
    """Per-brand quantity-weighted median line price
    (operators/numeric.py:weighted_median): lower weighted median via
    integer cumulative weights (2*cum >= total — no halving, no
    interpolation), values only compared so doubles pass through
    bit-exact. The oracle replays the identical tie-collapse + cumsum
    + threshold pick."""
    from reactivedb_spark.operators.numeric import weighted_median

    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity")
    p = load(spark, sf, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    return weighted_median(
        j, ["p_brand"], "l_extendedprice", "l_quantity"
    ).select("p_brand", F.col("wmedian").cast("double").alias("wmedian"))


SQL_WEIGHTED_MEDIAN_PRICE = """
WITH j AS (
  SELECT p.p_brand, l.l_extendedprice AS v,
         CAST(l.l_quantity AS BIGINT) AS w
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
pv AS (SELECT p_brand, v, sum(w) AS w FROM j GROUP BY p_brand, v),
c AS (SELECT p_brand, v, w,
             sum(w) OVER (PARTITION BY p_brand ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(w) OVER (PARTITION BY p_brand) AS tot
      FROM pv)
SELECT p_brand, CAST(min(v) AS DOUBLE) AS wmedian
FROM c WHERE cum * 2 >= tot GROUP BY p_brand
"""


# -- time-weighted average -----------------------------------------------------------

def q_time_weighted_balance(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user time-weighted average event value
    (operators/temporal.py): step-function intervals closed by lead()
    in (ts, event_id) order, values snapped to the centi grid with an
    identical-IEEE floor, every product/sum exact in DECIMAL(38,0) /
    longs, ONE double division at the end. A sampling-frequency-biased
    plain mean — or a float accumulation — breaks the hash."""
    from reactivedb_spark.operators.temporal import time_weighted_avg

    ev = load(spark, sf, "events").select("user_id", "ts", "event_id", "value")
    out = time_weighted_avg(ev, ["user_id"], "ts", "value", scale=2,
                            tiebreak_cols=["event_id"])
    return out.select(
        F.col("user_id").cast("long").alias("user_id"), "held_ns", "twa")


SQL_TIME_WEIGHTED_BALANCE = """
WITH iv AS (
  SELECT user_id,
         CAST(floor(value * 100) AS BIGINT) AS vgrid,
         epoch_ns(ts) AS tns,
         lead(epoch_ns(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
  FROM events),
agg AS (
  SELECT user_id,
         sum(CAST(vgrid AS DECIMAL(19,0)) * CAST(nxt - tns AS DECIMAL(19,0)))
           AS vd,
         CAST(sum(nxt - tns) AS BIGINT) AS held_ns
  FROM iv WHERE nxt IS NOT NULL GROUP BY user_id)
SELECT CAST(user_id AS BIGINT) AS user_id, held_ns,
       CAST(vd AS DOUBLE) / (CAST(held_ns AS DOUBLE) * 100.0) AS twa
FROM agg
"""


# -- snapshot diff (table regression testing) ------------------------------------------

def q_snapshot_diff_accounts(spark: SparkSession, sf: str) -> DataFrame:
    """Keyed table diff (operators/cdc.py:snapshot_diff) between the
    customer snapshot and the post-CDC state of q_merge_upsert:
    added / removed / changed per account with the changed-column list
    — the warehouse regression-test primitive, one full outer join.
    The oracle recomputes the merge AND the diff."""
    from reactivedb_spark.operators.cdc import snapshot_diff

    before = load(spark, sf, "customer").select(
        F.col("c_custkey").cast("long").alias("acct"),
        F.col("c_acctbal").cast("double").alias("balance"),
    )
    after = q_merge_upsert(spark, sf)
    out = snapshot_diff(before, after, key="acct", payload_cols=["balance"])
    return out.select(F.col("acct").cast("long").alias("acct"),
                      "change", "changed_cols")


SQL_SNAPSHOT_DIFF_ACCOUNTS = """
WITH ch AS (
  SELECT acct, op, balance FROM (
    SELECT user_id + 1400 AS acct,
           CASE WHEN event_type = 'purchase' THEN 'upsert'
                ELSE 'delete' END AS op,
           value AS balance,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rk
    FROM events WHERE event_type IN ('purchase', 'error'))
  WHERE rk = 1),
after_t AS (
  SELECT CAST(COALESCE(ch.acct, c.c_custkey) AS BIGINT) AS acct,
         CAST(CASE WHEN ch.op = 'upsert' THEN ch.balance
                   ELSE c.c_acctbal END AS DOUBLE) AS balance
  FROM ch FULL OUTER JOIN customer c ON ch.acct = c.c_custkey
  WHERE ch.op IS NULL OR ch.op = 'upsert'),
before_t AS (
  SELECT CAST(c_custkey AS BIGINT) AS acct,
         CAST(c_acctbal AS DOUBLE) AS balance FROM customer)
SELECT CAST(COALESCE(b.acct, a.acct) AS BIGINT) AS acct,
       CASE WHEN b.acct IS NULL THEN 'added'
            WHEN a.acct IS NULL THEN 'removed'
            WHEN b.balance IS DISTINCT FROM a.balance THEN 'changed'
       END AS change,
       CASE WHEN b.acct IS NOT NULL AND a.acct IS NOT NULL
                 AND b.balance IS DISTINCT FROM a.balance
            THEN 'balance' ELSE '' END AS changed_cols
FROM before_t b FULL OUTER JOIN after_t a ON b.acct = a.acct
WHERE (CASE WHEN b.acct IS NULL THEN 'added'
            WHEN a.acct IS NULL THEN 'removed'
            WHEN b.balance IS DISTINCT FROM a.balance THEN 'changed'
       END) IS NOT NULL
"""

QUERIES.update({
    "dq_audit": q_dq_audit,
    "weighted_median_price": q_weighted_median_price,
    "time_weighted_balance": q_time_weighted_balance,
    "snapshot_diff_accounts": q_snapshot_diff_accounts,
})

ORACLES.update({
    "dq_audit": SQL_DQ_AUDIT,
    "weighted_median_price": SQL_WEIGHTED_MEDIAN_PRICE,
    "time_weighted_balance": SQL_TIME_WEIGHTED_BALANCE,
    "snapshot_diff_accounts": SQL_SNAPSHOT_DIFF_ACCOUNTS,
})


# -- perceptual image hash (dHash) over real decoded pixels --------------------------

def q_multimodal_dhash(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual difference hash end-to-end: text bytes → REAL gray
    PNG (stdlib encoder) → REAL decode → 8×8 integer cell lattice →
    56-bit neighbour-comparison signature
    (functions/multimodal.py:dhash) — the multimodal arm of the dedup
    family (equal dHash ⇒ structurally near-identical images; the
    cheap pre-filter before pixel verification). Every comparison is an
    integer cross-multiplication (no division, no floats), so the
    oracle replays the identical lattice and bit algebra in SQL from
    the source text + the encoder's zero padding; a decoder bug or a
    geometry drift flips bits and breaks the hash."""
    from reactivedb_spark.functions import multimodal
    from reactivedb_spark.suite._common import spread

    d = spread(load(spark, sf, "documents"))
    pay = multimodal.encode_png(d, "doc_id", "text", width=16)
    out = multimodal.dhash(pay, "doc_id")
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("dhash").cast("long").alias("dhash"),
    )


SQL_MULTIMODAL_DHASH = """
WITH dims AS (
  SELECT doc_id, length(text) AS len,
         16 * greatest((length(text) + 15) // 16, 1) AS n_pix
  FROM documents),
series AS (SELECT g.pos FROM generate_series(0, 4095) g(pos)),
pix AS (
  -- fixture text is pure ASCII: char codes == UTF-8 payload bytes;
  -- positions beyond len are the encoder's zero row-padding
  SELECT d.doc_id, s.pos // 16 AS r, s.pos % 16 AS c,
         d.n_pix // 16 AS h,
         CASE WHEN s.pos < d.len
              THEN ascii(substr(doc.text, CAST(s.pos + 1 AS INT), 1))
              ELSE 0 END AS code
  FROM dims d JOIN documents doc USING (doc_id)
  CROSS JOIN series s WHERE s.pos < d.n_pix),
cells AS (
  SELECT doc_id, (r * 8) // h AS gr, c // 2 AS gc,
         sum(code) AS s, count(*) AS n
  FROM pix GROUP BY doc_id, (r * 8) // h, c // 2),
bits AS (
  SELECT a.doc_id, (a.gr * 7 + a.gc) AS b
  FROM cells a JOIN cells nb
    ON nb.doc_id = a.doc_id AND nb.gr = a.gr AND nb.gc = a.gc + 1
  WHERE a.gc < 7 AND a.s * nb.n > nb.s * a.n)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(sum(1::BIGINT << b.b), 0) AS BIGINT) AS dhash
FROM dims d LEFT JOIN bits b USING (doc_id)
GROUP BY d.doc_id
"""

QUERIES["multimodal_dhash"] = q_multimodal_dhash
ORACLES["multimodal_dhash"] = SQL_MULTIMODAL_DHASH


# -- multi-source BFS hop distance ----------------------------------------------------

BFS_HOPS = 3


def q_bfs_hops(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-source BFS (operators/graph.py:bfs_hops) over the part
    co-purchase graph from the ten smallest part keys: shortest hop
    count within 3 rounds. Frontier-based — per-round work tracks the
    expansion, not O(V+E); the oracle unrolls the identical rounds as
    chained reachability CTEs (idempotent past fixpoint, so early
    frontier drain cannot diverge)."""
    from reactivedb_spark.operators.graph import bfs_hops

    li = load(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey")
    ).distinct()
    ka = li.select("okey", F.col("pkey").alias("u"))
    kb = li.select("okey", F.col("pkey").alias("v"))
    edges = (
        ka.join(kb, "okey").filter(F.col("u") < F.col("v"))
        .select("u", "v").distinct()
    )
    sources = load(spark, sf, "part").select(
        F.col("p_partkey").alias("node")).filter(F.col("node") < 10)
    return bfs_hops(edges, sources, max_hops=BFS_HOPS)


def _bfs_sql(rounds: int = BFS_HOPS) -> str:
    ctes = ["""li AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem),
und AS (SELECT DISTINCT a.pkey AS x, b.pkey AS y
        FROM li a JOIN li b ON a.okey = b.okey AND a.pkey < b.pkey),
e0 AS MATERIALIZED (SELECT x AS s, y AS d FROM und UNION ALL SELECT y AS s, x AS d FROM und),
v0 AS (SELECT p_partkey AS node, 0 AS hops FROM part WHERE p_partkey < 10)"""]
    for r in range(1, rounds + 1):
        ctes.append(
            f"v{r} AS MATERIALIZED (SELECT node, hops FROM v{r - 1} "
            f"UNION ALL "
            f"SELECT n.node, {r} AS hops FROM ("
            f"SELECT DISTINCT e.d AS node FROM v{r - 1} f JOIN e0 e "
            f"ON f.node = e.s AND f.hops = {r - 1}) n "
            f"WHERE NOT EXISTS (SELECT 1 FROM v{r - 1} v WHERE v.node = n.node))"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT CAST(node AS BIGINT) AS node, "
          f"CAST(hops AS BIGINT) AS hops FROM v{rounds}"
    )


SQL_BFS_HOPS = _bfs_sql()

QUERIES["bfs_hops"] = q_bfs_hops
ORACLES["bfs_hops"] = SQL_BFS_HOPS


# -- record linkage (blocked fuzzy match + attribute scoring) --------------------------

def q_record_linkage(spark: SparkSession, sf: str) -> DataFrame:
    """Entity resolution as a composition: the GUARDED ED-Join prefix
    filter generates name-similarity candidates (operators/fuzzyjoin.py
    with ``max_bucket=100`` — the production default; VERDICT r8 #2:
    the unguarded generator profiles at 415 s/sf1 on gram-adversarial
    names, a quadratic scale-killer, and stays registered separately as
    the research config ``fuzzy_join_edit``), then a Fellegi–Sunter-
    style integer rule score — name agreement (60 − 10·dist), same
    nation (+30), account balance within 100 (+20) — keeps pairs
    scoring ≥ 80. All comparisons integer or IEEE-identical; the oracle
    replays the ENTIRE guarded candidate pipeline (positional bigrams,
    rarity prefix, bucket-count stop-band, length band, levenshtein
    verify — the shared _GUARDED_CAND_CTES) AND the same scoring, so
    the guard's drop semantics inside the composition are
    driver-verified, not just its speed. Like fuzzy_join_guarded, the
    oracle covers the prefix path exactly because every fixture name
    is length 18 (the short-string pool, names of length ≤ 4, is
    empty); a fixture with shorter names would need the short-pool
    block replayed too."""
    from reactivedb_spark.operators.fuzzyjoin import edit_distance_join

    c = load(spark, sf, "customer")
    pairs = edit_distance_join(
        c.select("c_custkey", "c_name"), "c_custkey", "c_name", max_dist=1,
        q=2, max_bucket=100)
    attrs = c.select(
        F.col("c_custkey").alias("k"), F.col("c_nationkey").alias("nat"),
        F.col("c_acctbal").alias("bal"))
    la = attrs.select(F.col("k").alias("id_a"), F.col("nat").alias("nat_a"),
                      F.col("bal").alias("bal_a"))
    rb = attrs.select(F.col("k").alias("id_b"), F.col("nat").alias("nat_b"),
                      F.col("bal").alias("bal_b"))
    scored = (
        pairs.join(la, "id_a").join(rb, "id_b")
        .withColumn(
            "score",
            (F.lit(60) - F.lit(10) * F.col("dist")
             + F.when(F.col("nat_a") == F.col("nat_b"), F.lit(30))
             .otherwise(F.lit(0))
             + F.when(F.abs(F.col("bal_a") - F.col("bal_b")) < 100,
                      F.lit(20)).otherwise(F.lit(0))).cast("long"),
        )
        .filter(F.col("score") >= 80)
    )
    return scored.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "score",
    )


SQL_RECORD_LINKAGE = f"""
WITH {_GUARDED_CAND_CTES},
pairs AS (SELECT cand.id_a, cand.id_b, levenshtein(ca.txt, cb.txt) AS dist
          FROM cand JOIN c ca ON ca.id = cand.id_a
                    JOIN c cb ON cb.id = cand.id_b
          WHERE levenshtein(ca.txt, cb.txt) <= 1),
attrs AS (SELECT c_custkey AS k, c_nationkey AS nat, c_acctbal AS bal
          FROM customer),
scored AS (
  SELECT p.id_a, p.id_b,
         60 - 10 * p.dist
         + CASE WHEN a.nat = b.nat THEN 30 ELSE 0 END
         + CASE WHEN abs(a.bal - b.bal) < 100 THEN 20 ELSE 0 END AS score
  FROM pairs p JOIN attrs a ON a.k = p.id_a JOIN attrs b ON b.k = p.id_b)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(score AS BIGINT) AS score
FROM scored WHERE score >= 80
"""

QUERIES["record_linkage"] = q_record_linkage
ORACLES["record_linkage"] = SQL_RECORD_LINKAGE


# -- percentile-rank normalization ----------------------------------------------------

def q_percentile_rank(spark: SparkSession, sf: str) -> DataFrame:
    """Per-brand percentile-rank normalization of part prices
    (operators/numeric.py:percentile_rank): integer-ppm quantile
    transform, min-rank ties, singleton groups at 0 — the outlier-robust
    feature scaling. One window shuffle on the brand key."""
    from reactivedb_spark.operators.numeric import percentile_rank

    p = load(spark, sf, "part").select("p_partkey", "p_brand",
                                       "p_retailprice")
    out = percentile_rank(p, ["p_brand"], "p_retailprice")
    return out.select(
        F.col("p_partkey").cast("long").alias("p_partkey"), "p_brand",
        "pr_ppm")


SQL_PERCENTILE_RANK = """
WITH r AS (
  SELECT p_partkey, p_brand,
         rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice) AS rk,
         count(*) OVER (PARTITION BY p_brand) AS n
  FROM part)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_brand,
       CAST(CASE WHEN n > 1 THEN ((rk - 1) * 1000000) // (n - 1)
                 ELSE 0 END AS BIGINT) AS pr_ppm
FROM r
"""

QUERIES["percentile_rank"] = q_percentile_rank
ORACLES["percentile_rank"] = SQL_PERCENTILE_RANK


# -- MAD robust outliers ---------------------------------------------------------------

def q_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Median-absolute-deviation outliers per event type
    (operators/numeric.py:mad_outliers): |x − median| > 3·MAD with
    exact lower medians — the robust complement to the exact k-sigma
    pass (zscore_outliers); the exponential-tailed `value` column makes
    MAD the honest choice (the tail inflates the variance the sigma
    test uses). The oracle replays the identical lower-median windows —
    DuckDB's interpolating median() would drift."""
    from reactivedb_spark.operators.numeric import mad_outliers

    ev = load(spark, sf, "events").select("event_id", "event_type", "value")
    out = mad_outliers(ev, ["event_type"], "value", k=3)
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.col("value").cast("double").alias("value"),
    )


SQL_MAD_OUTLIERS = """
WITH pv AS (SELECT event_type, value AS v, count(*) AS w FROM events
            GROUP BY event_type, value),
c AS (SELECT event_type, v,
             sum(w) OVER (PARTITION BY event_type ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(w) OVER (PARTITION BY event_type) AS tot
      FROM pv),
med AS (SELECT event_type, min(v) AS med FROM c
        WHERE cum * 2 >= tot GROUP BY event_type),
dev AS (SELECT e.event_id, e.event_type, e.value,
               abs(e.value - m.med) AS dv
        FROM events e JOIN med m USING (event_type)),
dv_pv AS (SELECT event_type, dv, count(*) AS w FROM dev
          GROUP BY event_type, dv),
dc AS (SELECT event_type, dv,
              sum(w) OVER (PARTITION BY event_type ORDER BY dv
                           ROWS UNBOUNDED PRECEDING) AS cum,
              sum(w) OVER (PARTITION BY event_type) AS tot
       FROM dv_pv),
mad AS (SELECT event_type, min(dv) AS mad FROM dc
        WHERE cum * 2 >= tot GROUP BY event_type)
SELECT CAST(d.event_id AS BIGINT) AS event_id, d.event_type,
       CAST(d.value AS DOUBLE) AS value
FROM dev d JOIN mad m USING (event_type)
WHERE d.dv > 3 * m.mad
"""

QUERIES["mad_outliers"] = q_mad_outliers
ORACLES["mad_outliers"] = SQL_MAD_OUTLIERS


# -- streaming CDC merge (batch-wise composition == global merge) -----------------------

def q_streaming_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """CDC apply as a STREAM: the changelog is sliced into three
    time-ordered micro-batches (fixed integer-ns tertile boundaries,
    mtime-ordered single-file triggers) and each batch MERGEs into a
    versioned parquet state via foreachBatch + apply_changelog
    (operators/cdc.py) — the Delta-style streaming upsert sink. The
    oracle is q_merge_upsert's GLOBAL last-writer-wins SQL: batch-wise
    merge composition must be exactly invisible (a delete that fails to
    erase, an upsert applied out of slice order, or within-batch LWW
    drift all break the hash)."""
    import os as _os
    import tempfile as _tempfile

    from reactivedb_spark.operators.cdc import apply_changelog
    from reactivedb_spark.sources import stream_parquet_dir
    from reactivedb_spark.suite._common import (
        dump_stream_progress, release_stream_state, streaming_shuffle)

    snap = load(spark, sf, "customer").select(
        F.col("c_custkey").cast("long").alias("acct"),
        F.col("c_acctbal").cast("double").alias("balance"),
    )
    ch = (
        load(spark, sf, "events")
        .filter(F.col("event_type").isin("purchase", "error"))
        .select(
            (F.col("user_id") + F.lit(1400)).cast("long").alias("acct"),
            F.when(F.col("event_type") == "purchase", F.lit("upsert"))
            .otherwise(F.lit("delete")).alias("op"),
            F.col("value").cast("double").alias("balance"),
            "ts", "event_id",
        )
    )
    lo, hi = ch.agg(F.min("ts"), F.max("ts")).first()
    span = max(int(hi) - int(lo), 1)
    root = _tempfile.mkdtemp(prefix="rdb_smerge_")
    watch = _os.path.join(root, "in")
    _os.makedirs(watch)
    for i in range(3):
        s = int(lo) + (span * i) // 3
        e = int(lo) + (span * (i + 1)) // 3
        cond = (F.col("ts") >= s) & (
            (F.col("ts") < e) if i < 2 else (F.col("ts") <= int(hi)))
        tmp = _os.path.join(root, f"tmp{i}")
        ch.filter(cond).repartition(1).write.mode("overwrite").parquet(tmp)
        import glob as _glob
        [part] = _glob.glob(_os.path.join(tmp, "part-*.parquet"))
        dst = _os.path.join(watch, f"b{i}.parquet")
        _os.rename(part, dst)
        _os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    state_dir = _os.path.join(root, "state")
    snap.write.mode("overwrite").parquet(_os.path.join(state_dir, "v0"))
    ptr = {"v": 0}

    def merge_batch(batch_df, batch_id):
        cur = spark.read.parquet(_os.path.join(state_dir, f"v{ptr['v']}"))
        nxt = apply_changelog(cur, batch_df, key="acct",
                              payload_cols=["balance"],
                              seq_cols=["ts", "event_id"])
        ptr["v"] += 1
        nxt.write.mode("overwrite").parquet(
            _os.path.join(state_dir, f"v{ptr['v']}"))

    stream = stream_parquet_dir(spark, watch, ch.schema)
    with streaming_shuffle(spark):
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", _os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            dump_stream_progress(q, "streaming_merge_upsert")
            q.stop()
            release_stream_state(spark)
    return spark.read.parquet(
        _os.path.join(state_dir, f"v{ptr['v']}")).select(
        F.col("acct").cast("long").alias("acct"), "balance")


QUERIES["streaming_merge_upsert"] = q_streaming_merge_upsert
ORACLES["streaming_merge_upsert"] = SQL_MERGE_UPSERT



# -- skip-gram pair extraction (embedding-training prep) -------------------------------

def q_skipgram_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Skip-gram (center, context) pair counts with window ±2 — the
    word2vec training-pair extraction. Spark-first shape: the posting
    relation (doc, pos, token) joins itself via two SHIFTED copies
    (pos+1, pos+2) — pure equi-joins on (doc, pos), never a positional
    band filter — then both directions union before the count. One
    explode, two narrow equi-joins, one aggregation."""
    ev = load(spark, sf, "documents").select("doc_id", "text")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    post = ev.select(
        "doc_id", F.posexplode(toks).alias("pos", "token"))
    shifted = None
    for off in (1, 2):
        s = post.select(
            "doc_id", (F.col("pos") + off).alias("pos"),
            F.col("token").alias("center"))
        shifted = s if shifted is None else shifted.unionByName(s)
    follow = shifted.join(
        post.select("doc_id", "pos", F.col("token").alias("context")),
        ["doc_id", "pos"],
    ).select("center", "context")
    both = follow.unionByName(
        follow.select(F.col("context").alias("center"),
                      F.col("center").alias("context")))
    return both.groupBy("center", "context").agg(
        F.count(F.lit(1)).cast("long").alias("n"))


SQL_SKIPGRAM_PAIRS = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents),
tok AS (
  SELECT doc_id, CAST(g.pos AS INT) AS pos, l[CAST(g.pos AS INT)] AS token
  FROM t, generate_series(1, 4096) g(pos) WHERE g.pos <= len(l)),
follow AS (
  SELECT a.token AS center, b.token AS context
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id AND (b.pos = a.pos + 1 OR b.pos = a.pos + 2)),
bidir AS (
  SELECT center, context FROM follow
  UNION ALL
  SELECT context AS center, center AS context FROM follow)
SELECT center, context, CAST(count(*) AS BIGINT) AS n
FROM bidir GROUP BY center, context
"""


# -- vocabulary coverage cutoff (tokenizer prep) ----------------------------------------

def q_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Frequency-ordered vocabulary with a 99% mass-coverage cutoff —
    the tokenizer-prep census: tokens ranked by (count desc, token),
    kept while the mass BEFORE the token is under 99% of the corpus
    (integer cross-multiplication — no percentage division). One token
    count + one window over the (vocabulary-sized) count relation."""
    from pyspark.sql import Window

    ev = load(spark, sf, "documents").select("doc_id", "text")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    counts = (
        ev.select(F.explode(toks).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), "token") \
        .rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    ranked = (
        counts.withColumn("_cum", F.sum("n").over(w))
        .withColumn("_tot", F.sum("n").over(tot))
        .withColumn("rank", F.row_number().over(
            Window.orderBy(F.col("n").desc(), "token")))
    )
    return (
        ranked.filter((F.col("_cum") - F.col("n")) * 100
                      < F.col("_tot") * 99)
        .select("token", F.col("n").cast("long").alias("n"),
                F.col("rank").cast("long").alias("rank"))
    )


SQL_VOCAB_COVERAGE = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents),
tok AS (
  SELECT l[CAST(g.pos AS INT)] AS token
  FROM t, generate_series(1, 4096) g(pos) WHERE g.pos <= len(l)),
c AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
r AS (SELECT token, n,
             sum(n) OVER (ORDER BY n DESC, token
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(n) OVER () AS tot,
             row_number() OVER (ORDER BY n DESC, token) AS rank
      FROM c)
SELECT token, CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank
FROM r WHERE (cum - n) * 100 < tot * 99
"""


# -- stratified k-fold split --------------------------------------------------------------

def q_kfold_split(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified 5-fold assignment (operators/sampling.py:kfold_split)
    over documents by source: within each stratum rows rank by the
    portable md5 draw and fold = rank mod k — fold sizes differ by at
    most one per stratum (EXACT stratification; hash-mod-k only
    balances in expectation) and the split is engine/retry-stable. The
    oracle replays the identical draw, rank and modulus."""
    from reactivedb_spark.operators.sampling import kfold_split

    d = load(spark, sf, "documents").select("doc_id", "source")
    out = kfold_split(d, ["source"], "doc_id", k=5)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"), "source", "fold")


SQL_KFOLD_SPLIT = """
WITH h AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
           AS draw
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       CAST((row_number() OVER (PARTITION BY source
                                ORDER BY draw, doc_id) - 1) % 5
            AS BIGINT) AS fold
FROM h
"""

QUERIES.update({
    "skipgram_pairs": q_skipgram_pairs,
    "vocab_coverage": q_vocab_coverage,
    "kfold_split": q_kfold_split,
})
ORACLES.update({
    "skipgram_pairs": SQL_SKIPGRAM_PAIRS,
    "vocab_coverage": SQL_VOCAB_COVERAGE,
    "kfold_split": SQL_KFOLD_SPLIT,
})


# -- rolling 7-day distinct users (WAU) --------------------------------------------------

def q_rolling_wau(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling 7-day distinct users per day (the WAU dashboard):
    rolling DISTINCT does not decompose as a window fold, so the
    scalable rewrite is (user, day) dedup → explode each active day to
    the ≤7 window-days it supports → dedup (user, window_day) → count.
    Linear in activity × window, every stage keyed — never a per-day
    rescan. Only days present in the data are reported (no zero-fill).
    The oracle recomputes each day's window by a band join."""
    ev = load(spark, sf, "events").select(
        "user_id", F.expr("ts DIV 86400000000000").alias("day"))
    active = ev.distinct()
    days = active.select("day").distinct()
    supported = (
        active.select(
            "user_id",
            F.explode(F.sequence(F.col("day"),
                                 F.col("day") + F.lit(6))).alias("wday"))
        .distinct()
        .join(days.select(F.col("day").alias("wday")), "wday")
    )
    return (
        supported.groupBy("wday")
        .agg(F.count(F.lit(1)).cast("long").alias("wau"))
        .select(F.col("wday").cast("long").alias("day"), "wau")
    )


SQL_ROLLING_WAU = """
WITH a AS (SELECT DISTINCT user_id,
                  epoch_ns(ts) // 86400000000000 AS day FROM events),
d AS (SELECT DISTINCT day FROM a)
SELECT CAST(d.day AS BIGINT) AS day,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
FROM d JOIN a ON a.day BETWEEN d.day - 6 AND d.day
GROUP BY d.day
"""

QUERIES["rolling_wau"] = q_rolling_wau
ORACLES["rolling_wau"] = SQL_ROLLING_WAU


# -- order-independent table fingerprint (anti-entropy) ---------------------------------

def q_table_checksums(spark: SparkSession, sf: str) -> DataFrame:
    """Per-bucket order-independent table fingerprint — the
    anti-entropy / replication-verification primitive (Merkle-tree
    leaf level): every row hashes to a portable 60-bit md5 integer
    over a canonical `|`-joined projection (doubles go through
    DECIMAL(18,2) first — raw double→string rendering is
    engine-specific), rows land in 16 buckets by
    hash, and each bucket's digest is the SUM of its row hashes
    (commutative — partition order, shuffle order and file layout
    cannot change it). Two replicas compare 16 rows instead of the
    table; a single changed row flips exactly one bucket. One scan +
    one 16-group aggregation."""
    o = load(spark, sf, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
        F.col("o_orderpriority"),
    )
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    return (
        o.select(h.alias("_h"))
        .groupBy((F.col("_h") % 16).alias("bucket"))
        .agg(F.sum(F.col("_h").cast("decimal(38,0)"))
             .cast("string").alias("digest"),
             F.count(F.lit(1)).cast("long").alias("n_rows"))
        .select(F.col("bucket").cast("long").alias("bucket"), "digest",
                "n_rows")
    )


SQL_TABLE_CHECKSUMS = """
WITH h AS (
  SELECT CAST(('0x' || substr(md5(
           CAST(o_orderkey AS VARCHAR) || '|' ||
           CAST(o_custkey AS VARCHAR) || '|' ||
           o_orderstatus || '|' ||
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
           o_orderpriority), 1, 15)) AS BIGINT) AS hv
  FROM orders)
SELECT CAST(hv % 16 AS BIGINT) AS bucket,
       CAST(CAST(sum(hv) AS DECIMAL(38,0)) AS VARCHAR) AS digest,
       CAST(count(*) AS BIGINT) AS n_rows
FROM h GROUP BY hv % 16
"""

QUERIES["table_checksums"] = q_table_checksums
ORACLES["table_checksums"] = SQL_TABLE_CHECKSUMS


# -- funnel conversion latency -----------------------------------------------------------

def q_funnel_latency(spark: SparkSession, sf: str) -> DataFrame:
    """Median view→purchase conversion latency per market segment:
    each user's FIRST view, the first purchase at-or-after it, exact
    integer-ns latency, lower-median per segment via weighted_median
    (weight 1 — same deterministic 2·cum ≥ total pick as everywhere).
    Two keyed min-aggregations + one broadcast dim join + one median
    window; users without both stages drop out."""
    from reactivedb_spark.operators.numeric import weighted_median

    ev = load(spark, sf, "events").select("user_id", "event_type", "ts")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("vts"))
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("vts"))
        .groupBy("user_id", "vts").agg(F.min("ts").alias("pts"))
    )
    cust = load(spark, sf, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment")
    lat = p.join(F.broadcast(cust), "user_id").select(
        "c_mktsegment", (F.col("pts") - F.col("vts")).alias("lat_ns"),
        F.lit(1).alias("_one"))
    out = weighted_median(lat, ["c_mktsegment"], "lat_ns", "_one")
    return out.select(
        "c_mktsegment", F.col("wmedian").cast("long").alias("median_lat_ns"))


SQL_FUNNEL_LATENCY = """
WITH v AS (SELECT user_id, min(epoch_ns(ts)) AS vts FROM events
           WHERE event_type = 'view' GROUP BY user_id),
p AS (SELECT e.user_id, v.vts, min(epoch_ns(e.ts)) AS pts
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) >= v.vts
      GROUP BY e.user_id, v.vts),
lat AS (SELECT c.c_mktsegment, p.pts - p.vts AS lat_ns
        FROM p JOIN customer c ON c.c_custkey = p.user_id),
pv AS (SELECT c_mktsegment, lat_ns AS v, count(*) AS w FROM lat
       GROUP BY c_mktsegment, lat_ns),
c AS (SELECT c_mktsegment, v,
             sum(w) OVER (PARTITION BY c_mktsegment ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(w) OVER (PARTITION BY c_mktsegment) AS tot
      FROM pv)
SELECT c_mktsegment, CAST(min(v) AS BIGINT) AS median_lat_ns
FROM c WHERE cum * 2 >= tot GROUP BY c_mktsegment
"""

QUERIES["funnel_latency"] = q_funnel_latency
ORACLES["funnel_latency"] = SQL_FUNNEL_LATENCY


# -- OHLC candle aggregation -------------------------------------------------------------

def q_ohlc_hourly(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly OHLC candles per event type — the time-series bar
    aggregation: open/close are the values at the window's first/last
    row in the TOTAL (ts, event_id) order (row_number picks, not
    first_value-with-implicit-frame, whose default frame is a classic
    nondeterminism trap), high/low are plain max/min. Values pass
    through untouched (bit-exact doubles); one window pass + one
    aggregation, both keyed on (type, hour)."""
    from pyspark.sql import Window

    ev = load(spark, sf, "events").select(
        "event_type", "ts", "event_id", "value",
        F.expr("ts DIV 3600000000000").alias("hour_idx"))
    w = Window.partitionBy("event_type", "hour_idx").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "hour_idx").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    marked = (
        ev.withColumn("_ra", F.row_number().over(w))
        .withColumn("_rd", F.row_number().over(wd))
    )
    return (
        marked.groupBy("event_type", "hour_idx")
        .agg(
            F.max(F.when(F.col("_ra") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("_rd") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select("event_type", F.col("hour_idx").cast("long").alias("hour_idx"),
                F.col("open").cast("double").alias("open"),
                F.col("high").cast("double").alias("high"),
                F.col("low").cast("double").alias("low"),
                F.col("close").cast("double").alias("close"), "n")
    )


SQL_OHLC_HOURLY = """
WITH e AS (
  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour_idx, value,
         row_number() OVER (PARTITION BY event_type,
                            epoch_ns(ts) // 3600000000000
                            ORDER BY ts, event_id) AS ra,
         row_number() OVER (PARTITION BY event_type,
                            epoch_ns(ts) // 3600000000000
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM events)
SELECT event_type, CAST(hour_idx AS BIGINT) AS hour_idx,
       CAST(max(CASE WHEN ra = 1 THEN value END) AS DOUBLE) AS open,
       CAST(max(value) AS DOUBLE) AS high,
       CAST(min(value) AS DOUBLE) AS low,
       CAST(max(CASE WHEN rd = 1 THEN value END) AS DOUBLE) AS close,
       CAST(count(*) AS BIGINT) AS n
FROM e GROUP BY event_type, hour_idx
"""

QUERIES["ohlc_hourly"] = q_ohlc_hourly
ORACLES["ohlc_hourly"] = SQL_OHLC_HOURLY


# -- linear-interpolation gap fill ---------------------------------------------------------

def q_interpolate_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user hourly grid with LINEAR interpolation across gaps — the
    numeric complement to resample_gapfill's LOCF: missing hours take
    prev + (next − prev)·(h − h_prev) DIV (h_next − h_prev) on the
    centi grid, ALL integer math (both engines' integer division
    truncates identically, negative slopes included). Grid bounded per
    user by its first/last observed hour, so the interpolation is
    always two-sided. One keyed dedup, one grid explode, two
    ignore-nulls window passes."""
    from pyspark.sql import Window

    ev = load(spark, sf, "events").select(
        "user_id", F.expr("ts DIV 3600000000000").alias("h"),
        "ts", "event_id",
        F.floor(F.col("value") * 100).alias("vc"))
    pick = Window.partitionBy("user_id", "h").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    known = (
        ev.withColumn("_rk", F.row_number().over(pick))
        .filter(F.col("_rk") == 1).select("user_id", "h", "vc")
    )
    # the bounds relation is tiny (one row per user) and the explode
    # amplifies it ~700x — AQE coalesces the post-agg shuffle to one
    # task and serializes the whole grid+window pipeline (measured
    # 14.4s -> ~3s at sf0.1). Same explosion-join trap as the fuzzy
    # join: pin parallelism with an explicit numPartitions repartition.
    npart = max(spark.sparkContext.defaultParallelism, 4)
    grid = (
        known.groupBy("user_id")
        .agg(F.min("h").alias("_lo"), F.max("h").alias("_hi"))
        .repartition(npart, "user_id")
        .select("user_id",
                F.explode(F.sequence("_lo", "_hi")).alias("h"))
    )
    g = grid.join(known, ["user_id", "h"], "left")
    # both look-directions as RUNNING aggregates: Spark evaluates a
    # [current, unboundedFollowing) frame by rescanning to the
    # partition end for EVERY row (quadratic per partition — measured
    # 14.5s at sf0.1); last() over the REVERSED order with an
    # unboundedPreceding frame is the same value in O(n).
    back = Window.partitionBy("user_id").orderBy("h") \
        .rowsBetween(Window.unboundedPreceding, 0)
    fwd = Window.partitionBy("user_id").orderBy(F.col("h").desc()) \
        .rowsBetween(Window.unboundedPreceding, 0)
    kh = F.when(F.col("vc").isNotNull(), F.col("h"))
    out = (
        g.withColumn("_pc", F.last("vc", ignorenulls=True).over(back))
        .withColumn("_ph", F.last(kh, ignorenulls=True).over(back))
        .withColumn("_nc", F.last("vc", ignorenulls=True).over(fwd))
        .withColumn("_nh", F.last(kh, ignorenulls=True).over(fwd))
        .withColumn(
            "v_centi",
            F.when(F.col("vc").isNotNull(), F.col("vc")).otherwise(
                F.expr("_pc + ((_nc - _pc) * (h - _ph)) DIV (_nh - _ph)")),
        )
        .withColumn("interpolated", F.col("vc").isNull())
    )
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("h").cast("long").alias("hour_idx"),
        F.col("v_centi").cast("long").alias("v_centi"),
        "interpolated",
    )


SQL_INTERPOLATE_GAPFILL = """
WITH e AS (
  SELECT user_id, epoch_ns(ts) // 3600000000000 AS h,
         CAST(floor(value * 100) AS BIGINT) AS vc,
         row_number() OVER (PARTITION BY user_id,
                            epoch_ns(ts) // 3600000000000
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM events),
known AS (SELECT user_id, h, vc FROM e WHERE rk = 1),
b AS (SELECT user_id, min(h) AS lo, max(h) AS hi FROM known
      GROUP BY user_id),
grid AS (SELECT b.user_id, CAST(g.h AS BIGINT) AS h
         FROM b, LATERAL unnest(generate_series(b.lo, b.hi)) AS g(h)),
j AS (SELECT grid.user_id, grid.h, known.vc
      FROM grid LEFT JOIN known USING (user_id, h)),
w AS (SELECT user_id, h, vc,
             last_value(vc IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY h
                ROWS UNBOUNDED PRECEDING) AS pc,
             last_value(CASE WHEN vc IS NOT NULL THEN h END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY h
                     ROWS UNBOUNDED PRECEDING) AS ph,
             first_value(vc IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY h
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
             first_value(CASE WHEN vc IS NOT NULL THEN h END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY h
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM j)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(h AS BIGINT) AS hour_idx,
       CAST(CASE WHEN vc IS NOT NULL THEN vc
                 ELSE pc + ((nc - pc) * (h - ph)) // (nh - ph)
            END AS BIGINT) AS v_centi,
       vc IS NULL AS interpolated
FROM w
"""

QUERIES["interpolate_gapfill"] = q_interpolate_gapfill
ORACLES["interpolate_gapfill"] = SQL_INTERPOLATE_GAPFILL


# -- burst detection (ops monitoring) -----------------------------------------------------

def q_burst_detection(spark: SparkSession, sf: str) -> DataFrame:
    """Per-type bursty minutes: minute-bucket counts flagged when
    count > mean + 3σ of that type's minute distribution, evaluated in
    the EXACT cross-multiplied integer form of sigma_outliers
    ((n·c − s)² > k²·(n·ssq − s²) — counts are already integers, so no
    fixed-point scale is even needed). Two aggregations + one
    broadcast moment probe; no sqrt, no FP accumulation."""
    ev = load(spark, sf, "events").select(
        "event_type", F.expr("ts DIV 60000000000").alias("minute"))
    c = ev.groupBy("event_type", "minute").agg(
        F.count(F.lit(1)).alias("c"))
    mom = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ssq"),
    )
    j = c.join(F.broadcast(mom), "event_type")
    lhs = (F.col("n").cast("decimal(38,0)") * F.col("c")
           - F.col("s").cast("decimal(38,0)"))
    rhs = (F.col("n").cast("decimal(38,0)") * F.col("ssq")
           - F.col("s").cast("decimal(38,0)") * F.col("s"))
    return (
        j.filter((F.col("n") * F.col("c") > F.col("s"))
                 & (lhs * lhs > F.lit(9) * rhs))
        .select("event_type", F.col("minute").cast("long").alias("minute"),
                F.col("c").cast("long").alias("c"))
    )


SQL_BURST_DETECTION = """
WITH c AS (
  SELECT event_type, epoch_ns(ts) // 60000000000 AS minute,
         count(*) AS c
  FROM events GROUP BY event_type, epoch_ns(ts) // 60000000000),
mom AS (SELECT event_type, count(*) AS n, sum(c) AS s,
               sum(c * c) AS ssq
        FROM c GROUP BY event_type)
SELECT c.event_type, CAST(c.minute AS BIGINT) AS minute,
       CAST(c.c AS BIGINT) AS c
FROM c JOIN mom USING (event_type)
WHERE mom.n * c.c > mom.s
  AND (CAST(mom.n AS DECIMAL(38,0)) * c.c - CAST(mom.s AS DECIMAL(38,0)))
      * (CAST(mom.n AS DECIMAL(38,0)) * c.c - CAST(mom.s AS DECIMAL(38,0)))
      > 9 * (CAST(mom.n AS DECIMAL(38,0)) * mom.ssq
             - CAST(mom.s AS DECIMAL(38,0)) * mom.s)
"""


# -- foreign-key discovery (containment profiling) ----------------------------------------

def q_fk_discovery(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-discovery containment profiling: for each declared
    candidate (child.col → parent.col) pair, the fraction of the
    child's DISTINCT values present in the parent (integer ppm) plus
    both distinct cardinalities — containment 1,000,000 means the pair
    is a valid FK. Each pair costs two distinct aggregations and one
    broadcast semi-join on already-distinct keys."""
    pairs = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("events", "user_id", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    out = None
    for child_t, child_c, parent_t, parent_c in pairs:
        ch = load(spark, sf, child_t).select(
            F.col(child_c).alias("v")).distinct()
        pa = load(spark, sf, parent_t).select(
            F.col(parent_c).alias("v")).distinct()
        row = (
            ch.join(pa.hint("broadcast"), "v", "left_semi")
            .agg(F.count(F.lit(1)).alias("n_hit"))
            .crossJoin(ch.agg(F.count(F.lit(1)).alias("n_child")))
            .crossJoin(pa.agg(F.count(F.lit(1)).alias("n_parent")))
            .select(
                F.lit(f"{child_t}.{child_c}").alias("child"),
                F.lit(f"{parent_t}.{parent_c}").alias("parent"),
                F.col("n_child").cast("long").alias("n_child"),
                F.col("n_parent").cast("long").alias("n_parent"),
                F.expr("CAST((n_hit * 1000000) DIV n_child AS BIGINT)")
                .alias("containment_ppm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


SQL_FK_DISCOVERY = """
WITH pairs(child, parent, n_child, n_parent, n_hit) AS (
  SELECT 'lineitem.l_orderkey', 'orders.o_orderkey',
         (SELECT count(DISTINCT l_orderkey) FROM lineitem),
         (SELECT count(DISTINCT o_orderkey) FROM orders),
         (SELECT count(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem) c
          WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = c.l_orderkey))
  UNION ALL
  SELECT 'lineitem.l_partkey', 'part.p_partkey',
         (SELECT count(DISTINCT l_partkey) FROM lineitem),
         (SELECT count(DISTINCT p_partkey) FROM part),
         (SELECT count(*) FROM (SELECT DISTINCT l_partkey FROM lineitem) c
          WHERE EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = c.l_partkey))
  UNION ALL
  SELECT 'orders.o_custkey', 'customer.c_custkey',
         (SELECT count(DISTINCT o_custkey) FROM orders),
         (SELECT count(DISTINCT c_custkey) FROM customer),
         (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM orders) c
          WHERE EXISTS (SELECT 1 FROM customer p WHERE p.c_custkey = c.o_custkey))
  UNION ALL
  SELECT 'events.user_id', 'customer.c_custkey',
         (SELECT count(DISTINCT user_id) FROM events),
         (SELECT count(DISTINCT c_custkey) FROM customer),
         (SELECT count(*) FROM (SELECT DISTINCT user_id FROM events) c
          WHERE EXISTS (SELECT 1 FROM customer p WHERE p.c_custkey = c.user_id))
  UNION ALL
  SELECT 'customer.c_nationkey', 'nation.n_nationkey',
         (SELECT count(DISTINCT c_nationkey) FROM customer),
         (SELECT count(DISTINCT n_nationkey) FROM nation),
         (SELECT count(*) FROM (SELECT DISTINCT c_nationkey FROM customer) c
          WHERE EXISTS (SELECT 1 FROM nation p WHERE p.n_nationkey = c.c_nationkey)))
SELECT child, parent, CAST(n_child AS BIGINT) AS n_child,
       CAST(n_parent AS BIGINT) AS n_parent,
       CAST((n_hit * 1000000) // n_child AS BIGINT) AS containment_ppm
FROM pairs
"""


# -- rollup cascade (mergeable re-aggregation) ---------------------------------------------

def q_rollup_cascade(spark: SparkSession, sf: str) -> DataFrame:
    """Daily totals computed FROM hourly pre-aggregates — the
    mergeable-aggregation contract a 100 TB rollup pipeline lives on
    (minute→hour→day cascades re-aggregate partials instead of
    rescanning raw): counts and decimal sums merge exactly; the oracle
    computes the same dailies DIRECTLY from raw events, so any
    non-mergeable step (an average of averages, a double sum) breaks
    the hash."""
    ev = load(spark, sf, "events").select(
        "event_type",
        F.expr("ts DIV 3600000000000").alias("hour_idx"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    hourly = ev.groupBy("event_type", "hour_idx").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    daily = (
        hourly.groupBy("event_type",
                       F.expr("hour_idx DIV 24").alias("day_idx"))
        .agg(F.sum("n").cast("long").alias("n"),
             F.sum("sv").cast("decimal(38,2)").cast("double").alias("sum_value"))
    )
    return daily.select("event_type",
                        F.col("day_idx").cast("long").alias("day_idx"),
                        "n", "sum_value")


SQL_ROLLUP_CASCADE = """
SELECT event_type,
       CAST((epoch_ns(ts) // 3600000000000) // 24 AS BIGINT) AS day_idx,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2))
            AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type, (epoch_ns(ts) // 3600000000000) // 24
"""

QUERIES.update({
    "burst_detection": q_burst_detection,
    "fk_discovery": q_fk_discovery,
    "rollup_cascade": q_rollup_cascade,
})
ORACLES.update({
    "burst_detection": SQL_BURST_DETECTION,
    "fk_discovery": SQL_FK_DISCOVERY,
    "rollup_cascade": SQL_ROLLUP_CASCADE,
})


# -- session path census -------------------------------------------------------------------

def q_session_paths(spark: SparkSession, sf: str) -> DataFrame:
    """Census of 3-step session-opening paths: sessions split on
    30-minute inactivity (lag-gap + running count — the same
    sessionization algebra as `sessionize`), each session's first
    three event types joined 'a>b>c' via deterministic row_number
    picks (collect_list would be partition-order-dependent), counted
    across the corpus. Sessions shorter than 3 events drop out. Two
    keyed window passes + one aggregation."""
    from pyspark.sql import Window

    GAP = 30 * 60 * 1_000_000_000
    ev = load(spark, sf, "events").select("user_id", "ts", "event_id",
                                          "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        ev.withColumn("_prev", F.lag("ts").over(w))
        .withColumn("_new", (F.col("_prev").isNull()
                             | ((F.col("ts") - F.col("_prev")) > GAP))
                    .cast("long"))
        .withColumn("_sid", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    sw = Window.partitionBy("user_id", "_sid").orderBy("ts", "event_id")
    first3 = (
        sess.withColumn("_rn", F.row_number().over(sw))
        .filter(F.col("_rn") <= 3)
        .groupBy("user_id", "_sid")
        .agg(
            F.max(F.when(F.col("_rn") == 1, F.col("event_type"))).alias("e1"),
            F.max(F.when(F.col("_rn") == 2, F.col("event_type"))).alias("e2"),
            F.max(F.when(F.col("_rn") == 3, F.col("event_type"))).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
    )
    return (
        first3.groupBy(
            F.concat_ws(">", "e1", "e2", "e3").alias("path"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    )


SQL_SESSION_PATHS = """
WITH s AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w)
                      > 1800000000000
              THEN 1 ELSE 0 END AS newf
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sid AS (
  SELECT user_id, ts, event_id, event_type,
         sum(newf) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid
  FROM s),
f3 AS (
  SELECT user_id, sid,
         max(CASE WHEN rn = 1 THEN event_type END) AS e1,
         max(CASE WHEN rn = 2 THEN event_type END) AS e2,
         max(CASE WHEN rn = 3 THEN event_type END) AS e3
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, sid
                                     ORDER BY ts, event_id) AS rn
        FROM sid)
  WHERE rn <= 3 GROUP BY user_id, sid)
SELECT e1 || '>' || e2 || '>' || e3 AS path,
       CAST(count(*) AS BIGINT) AS n_sessions
FROM f3 WHERE e3 IS NOT NULL GROUP BY e1 || '>' || e2 || '>' || e3
"""

QUERIES["session_paths"] = q_session_paths
ORACLES["session_paths"] = SQL_SESSION_PATHS


# -- decile lift table ---------------------------------------------------------------------

def q_decile_lift(spark: SparkSession, sf: str) -> DataFrame:
    """Customer-spend decile lift table — the campaign-analytics
    staple: customers ntile(10)-ranked by total spend (cents — exact
    longs; ntile over the (spend desc, custkey) TOTAL order so ties
    are deterministic), per-decile customer count, spend total and
    cumulative-share ppm by integer division. One aggregation + one
    window over the aggregated relation."""
    from pyspark.sql import Window

    o = load(spark, sf, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).alias("cents"))
    spend = o.groupBy("o_custkey").agg(F.sum("cents").alias("spend"))
    nt = Window.orderBy(F.col("spend").desc(), F.col("o_custkey"))
    per = (
        spend.withColumn("decile", F.ntile(10).over(nt))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n_cust"),
             F.sum("spend").alias("spend"))
    )
    cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    return (
        per.withColumn("_cum", F.sum("spend").over(cum))
        .withColumn("_tot", F.sum("spend").over(tot))
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("n_cust").cast("long").alias("n_cust"),
            F.col("spend").cast("long").alias("spend_cents"),
            F.expr("CAST((_cum * 1000000) DIV _tot AS BIGINT)")
            .alias("cum_share_ppm"),
        )
    )


SQL_DECILE_LIFT = """
WITH spend AS (
  SELECT o_custkey, sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS spend
  FROM orders GROUP BY o_custkey),
d AS (SELECT spend,
             ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS decile
      FROM spend),
per AS (SELECT decile, count(*) AS n_cust, sum(spend) AS spend
        FROM d GROUP BY decile)
SELECT CAST(decile AS BIGINT) AS decile, CAST(n_cust AS BIGINT) AS n_cust,
       CAST(spend AS BIGINT) AS spend_cents,
       CAST((sum(spend) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
             * 1000000) // sum(spend) OVER () AS BIGINT) AS cum_share_ppm
FROM per
"""


# -- Gini concentration index --------------------------------------------------------------

def q_gini_spend(spark: SparkSession, sf: str) -> DataFrame:
    """Gini concentration of customer spend, EXACT integer algebra:
    with spend x_i (cents) ranked ascending in the (spend, custkey)
    total order, G = (2·Σ i·x_i − (n+1)·Σx_i) / (n·Σx_i), emitted as
    ppm by one integer division — the numerator/denominator are exact
    DECIMAL(38,0) products, and the tie order is pinned so both
    engines sum identical i·x_i terms. One aggregation, one rank
    window, one scalar fold. Gini inherently requires a global order
    of the entity relation (one row per customer) — the raw event
    table never globally sorts."""
    from pyspark.sql import Window

    o = load(spark, sf, "orders").select(
        "o_custkey", F.floor(F.col("o_totalprice") * 100).alias("cents"))
    spend = o.groupBy("o_custkey").agg(F.sum("cents").alias("x"))
    rk = Window.orderBy(F.col("x").asc(), F.col("o_custkey"))
    ranked = spend.withColumn("i", F.row_number().over(rk))
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(19,0)")).alias("sx"),
        F.sum(F.col("i").cast("decimal(19,0)")
              * F.col("x").cast("decimal(19,0)")).alias("six"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.expr("CAST(((2 * six - (n + 1) * sx) * 1000000)"
               " DIV (CAST(n AS DECIMAL(19,0)) * sx) AS BIGINT)")
        .alias("gini_ppm"),
    )


SQL_GINI_SPEND = """
WITH spend AS (
  SELECT o_custkey, sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS x
  FROM orders GROUP BY o_custkey),
r AS (SELECT x, row_number() OVER (ORDER BY x ASC, o_custkey) AS i
      FROM spend),
agg AS (SELECT count(*) AS n,
               sum(CAST(x AS DECIMAL(19,0))) AS sx,
               sum(CAST(i AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS six
        FROM r)
SELECT CAST(n AS BIGINT) AS n,
       CAST(((2 * six - (n + 1) * sx) * 1000000)
            // (CAST(n AS DECIMAL(19,0)) * sx) AS BIGINT) AS gini_ppm
FROM agg
"""

QUERIES.update({"decile_lift": q_decile_lift, "gini_spend": q_gini_spend})
ORACLES.update({"decile_lift": SQL_DECILE_LIFT, "gini_spend": SQL_GINI_SPEND})
