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
