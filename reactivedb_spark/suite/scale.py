"""Training-data-pipeline queries (dedup / similarity / text / multimodal /
windows / streaming-ish event analytics) with DuckDB oracles.

The oracle SQL for the hash-heavy operators (minhash, simhash, LSH planes,
language scores) is **generated from the same Python constants** the Spark
operators use, so both engines compute literally the same formula; md5-hex
strings are the only hash primitive (portable everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from reactivedb_spark import cache
from reactivedb_spark.functions import multimodal, text as textfns
from reactivedb_spark.functions.text import LANG_MARKERS, LANG_ORDER
from reactivedb_spark.operators import dedup, similarity
from reactivedb_spark.suite._common import (
    dump_stream_progress, load, release_stream_state, replay_batches,
    rocksdb_state, spread, streaming_shuffle)

EMB_DIM = 64
HEX_HIGH_SQL = "('8','9','a','b','c','d','e','f')"
HEX_BIT2_SQL = "('4','5','6','7','c','d','e','f')"  # hex digit & 0x4

# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.exact_dedup(load(spark, sf, "documents"), "doc_id", "text")


SQL_DEDUP_EXACT = """
SELECT min(doc_id) AS doc_id,
       md5(lower(trim(text))) AS text_hash,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY md5(lower(trim(text)))
"""

def _tok_cte(src: str = "documents") -> str:
    return f"""
tok AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM {src}
  ) WHERE token <> ''
)
"""


_TOK_CTE = _tok_cte()

_SIG_CTE = (
    "sig AS (SELECT doc_id, "
    + ", ".join(f"min(md5('s{i}_' || token)) AS mh{i}" for i in range(1, dedup.MINHASH_K + 1))
    + " FROM tok GROUP BY doc_id)"
)

_ROWS_PER_BAND = dedup.MINHASH_K // dedup.LSH_BANDS
_BANDED_CTE = (
    "banded AS (SELECT doc_id, "
    + ", ".join(
        "md5("
        + " || ".join(f"mh{b * _ROWS_PER_BAND + r + 1}" for r in range(_ROWS_PER_BAND))
        + f") AS band{b + 1}"
        for b in range(dedup.LSH_BANDS)
    )
    + " FROM sig)"
)

_PAIRS_CTE = (
    "pairs AS ("
    + " UNION ".join(
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM banded a "
        f"JOIN banded b ON a.band{b + 1} = b.band{b + 1} AND a.doc_id < b.doc_id"
        for b in range(dedup.LSH_BANDS)
    )
    + ")"
)


def q_dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.minhash_signatures(dedup.widen(load(spark, sf, "documents")), "doc_id", "text")


SQL_DEDUP_MINHASH = (
    "WITH " + _TOK_CTE + ", " + _SIG_CTE + " SELECT * FROM sig"
)


def q_dedup_lsh_candidates(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.lsh_candidates(dedup.widen(load(spark, sf, "documents")), "doc_id", "text")


SQL_DEDUP_LSH_CANDIDATES = (
    "WITH " + _TOK_CTE + ", " + _SIG_CTE + ", " + _BANDED_CTE + ", " + _PAIRS_CTE
    + " SELECT doc_a, doc_b FROM pairs"
)


def q_dedup_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.jaccard_pairs(dedup.widen(load(spark, sf, "documents")), "doc_id", "text")


SQL_DEDUP_JACCARD = (
    "WITH " + _TOK_CTE + ", " + _SIG_CTE + ", " + _BANDED_CTE + ", " + _PAIRS_CTE + """,
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
       CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE) AS jaccard
FROM j WHERE n_inter > 0
"""
)


def q_dedup_jaccard_guarded(spark: SparkSession, sf: str) -> DataFrame:
    """The production-scale configuration of the LSH→verify pipeline:
    ``max_bucket=100`` drops stop-bands (band buckets holding >100
    docs — boilerplate/empty-ish text whose |bucket|² pairs carry no
    signal) BEFORE pair generation. The round-5 sf1 validation measured
    this as the 9-19× scale lever on a candidate-dense corpus
    (BASELINE.md RESULTS-r5-sf1 #3); the oracle applies the identical
    bucket-count rule, so the guard's exact semantics — not just its
    speed — are driver-verified."""
    return dedup.jaccard_pairs(
        dedup.widen(load(spark, sf, "documents")), "doc_id", "text",
        max_bucket=100,
    )


_LONG_CTE = (
    "lng AS ("
    + " UNION ALL ".join(
        f"SELECT doc_id, {b + 1} AS bi, band{b + 1} AS bk FROM banded"
        for b in range(dedup.LSH_BANDS)
    )
    + ")"
)

SQL_DEDUP_JACCARD_GUARDED = (
    "WITH " + _TOK_CTE + ", " + _SIG_CTE + ", " + _BANDED_CTE + ", " + _LONG_CTE + """,
kept AS (
  SELECT doc_id, bi, bk FROM (
    SELECT doc_id, bi, bk, count(*) OVER (PARTITION BY bi, bk) AS bn FROM lng)
  WHERE bn <= 100),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id),
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
       CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE) AS jaccard
FROM j WHERE n_inter > 0
"""
)


def q_dedup_lsh_candidates_guarded(spark: SparkSession, sf: str) -> DataFrame:
    """Production config of the raw LSH candidate relation: the same
    ``max_bucket=100`` stop-band as the guarded Jaccard/cluster family,
    applied to the candidate-pair query itself. The unguarded twin's
    cost IS the pair materialization (88.7M pairs at sf1 — the
    signature stages cost 1.5 s of its 17.4 s wall; profiled r13),
    which densifies as Σ|bucket|² on a fixed-vocabulary corpus; the
    stop-band bounds every bucket's contribution at 100² rows BEFORE
    the self-join — the same linear-by-construction argument as the
    banded ANN twins. The oracle replays the identical bucket-count
    rule. The unguarded twin stays registered as the research config;
    ``bench --scale`` measures this one."""
    return dedup.lsh_candidates(
        dedup.widen(load(spark, sf, "documents")), "doc_id", "text",
        max_bucket=100,
    )


def _sql_dedup_lsh_candidates_guarded() -> str:
    return (
        "WITH " + _TOK_CTE + ", " + _SIG_CTE + ", " + _BANDED_CTE + ", "
        + _LONG_CTE + """,
kept AS (
  SELECT doc_id, bi, bk FROM (
    SELECT doc_id, bi, bk, count(*) OVER (PARTITION BY bi, bk) AS bn FROM lng)
  WHERE bn <= 100)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM kept a JOIN kept b ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id
"""
    )


def q_dedup_containment_exact(spark: SparkSession, sf: str) -> DataFrame:
    """FULL-RECALL near-superset detection (round-5 answer to the
    advisor's recall finding on the LSH containment path): prefix-
    filtered set-similarity join at containment ≥ 4/5. The guarantee is
    algebraic, not probabilistic — a qualifying pair MUST share one of
    the small side's rarest-prefix tokens — so unlike
    ``dedup_containment`` (MinHash-LSH candidates, Jaccard-bounded
    recall) the tiny-doc-inside-huge-doc case cannot be missed. The
    oracle replays the identical frequency ranking, integer prefix
    bound and integer threshold compare.

    Workload scope: the fixture's ~31-word vocabulary is the
    pathological input for prefix filtering (NO token is rare, so the
    'rarest-prefix' join degenerates toward all-pairs — real corpora
    are Zipfian and the prefix join is df-bounded); the query bounds
    the corpus to doc_id < 1000 so the demonstrated semantics stay
    exact without an all-pairs-sized bench row. The oracle applies the
    same bound."""
    return dedup.containment_prefix_pairs(
        dedup.widen(
            load(spark, sf, "documents").filter(F.col("doc_id") < 1000)
        ),
        "doc_id", "text", num=4, den=5,
    )


SQL_DEDUP_CONTAINMENT_EXACT = (
    "WITH " + _tok_cte("(SELECT * FROM documents WHERE doc_id < 1000)") + """,
tokd AS (SELECT DISTINCT doc_id, token FROM tok),
freq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tokd GROUP BY token),
ranked AS (
  SELECT t.doc_id, t.token,
         row_number() OVER (PARTITION BY t.doc_id ORDER BY f.df, t.token) AS rn,
         count(*) OVER (PARTITION BY t.doc_id) AS n
  FROM tokd t JOIN freq f USING (token)),
prefix AS (
  SELECT doc_id AS small, token FROM ranked
  WHERE rn <= n - ((4 * n + 4) // 5) + 1),
cand AS (
  SELECT DISTINCT least(p.small, t.doc_id) AS doc_a,
                  greatest(p.small, t.doc_id) AS doc_b
  FROM prefix p JOIN tokd t USING (token) WHERE p.small <> t.doc_id),
sets AS (
  SELECT doc_id, list(token) AS toks, CAST(count(*) AS BIGINT) AS n_tok
  FROM tokd GROUP BY doc_id),
v AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(sa.toks, sb.toks)) AS BIGINT) AS ni,
         least(sa.n_tok, sb.n_tok) AS mn
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.doc_a
  JOIN sets sb ON sb.doc_id = c.doc_b)
SELECT doc_a, doc_b, CAST(ni AS DOUBLE) / CAST(mn AS DOUBLE) AS containment
FROM v WHERE 5 * ni >= 4 * mn
"""
)


def q_dedup_containment_zipf(spark: SparkSession, sf: str) -> DataFrame:
    """Full-recall containment join on a ZIPFIAN-vocabulary corpus — the
    regime the prefix filter's df-bounded cost claim actually lives in
    (VERDICT r5 #4; the fixture's ~31-word vocabulary is the technique's
    pathological input, so ``dedup_containment_exact`` had to scope its
    corpus). The corpus is generated deterministically inside the query
    with pure integer arithmetic, identically on both engines: token
    ``t`` (t in [2, VOCAB]) appears in doc ``d`` iff t divides d, so
    df(t) = floor(N/t) — an EXACT Zipf law — and every (a, k*a) pair is
    a true near-superset (divisors(a) ⊆ divisors(k*a)). At N=12000,
    V=3000 the surviving corpus is 7176 docs (7× the scoped _exact
    row); the rarest-prefix join generates ~207k candidates vs ~25.7M
    all-pairs — the 124× df-bound pruning the operator exists for."""
    n_docs, vocab = 12000, 3000
    tokd = (
        spark.range(2, vocab + 1)
        .select(F.col("id").alias("t"))
        .select("t", F.explode(F.expr(f"sequence(1L, {n_docs} div t)")).alias("k"))
        .select(
            (F.col("t") * F.col("k")).alias("doc_id"),
            F.concat(F.lit("t"), F.col("t").cast("string")).alias("token"),
        )
    )
    docs = (
        tokd.groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("token")).alias("_toks"))
        .filter(F.size("_toks") >= 4)
        .select("doc_id", F.array_join("_toks", " ").alias("text"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return dedup.containment_prefix_pairs(docs, "doc_id", "text", num=4, den=5)


SQL_DEDUP_CONTAINMENT_ZIPF = """
WITH g AS (
  SELECT t, k FROM generate_series(2, 3000) AS gt(t),
               generate_series(1, 6000) AS gk(k)
  WHERE t * k <= 12000),
tokd AS (SELECT t * k AS doc_id, 't' || CAST(t AS VARCHAR) AS token FROM g),
docs AS (SELECT doc_id FROM tokd GROUP BY doc_id HAVING count(*) >= 4),
tok AS (SELECT tokd.doc_id, token FROM tokd JOIN docs USING (doc_id)),
freq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY token),
ranked AS (
  SELECT t.doc_id, t.token,
         row_number() OVER (PARTITION BY t.doc_id ORDER BY f.df, t.token) AS rn,
         count(*) OVER (PARTITION BY t.doc_id) AS n
  FROM tok t JOIN freq f USING (token)),
prefix AS (
  SELECT doc_id AS small, token FROM ranked
  WHERE rn <= n - ((4 * n + 4) // 5) + 1),
cand AS (
  SELECT DISTINCT least(p.small, t.doc_id) AS doc_a,
                  greatest(p.small, t.doc_id) AS doc_b
  FROM prefix p JOIN tok t USING (token) WHERE p.small <> t.doc_id),
sets AS (
  SELECT doc_id, list(token) AS toks, CAST(count(*) AS BIGINT) AS n_tok
  FROM tok GROUP BY doc_id),
v AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(sa.toks, sb.toks)) AS BIGINT) AS ni,
         least(sa.n_tok, sb.n_tok) AS mn
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.doc_a
  JOIN sets sb ON sb.doc_id = c.doc_b)
SELECT doc_a, doc_b, CAST(ni AS DOUBLE) / CAST(mn AS DOUBLE) AS containment
FROM v WHERE 5 * ni >= 4 * mn
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Character-3-gram Jaccard near-dups (threshold 0.8): the n-gram
    variant of the LSH→verify pipeline — robust to word-boundary edits,
    same shuffle structure as the word-token path."""
    return dedup.ngram_jaccard_pairs(
        dedup.widen(load(spark, sf, "documents")), "doc_id", "text", n=3, threshold=0.8
    )


SQL_DEDUP_NGRAM_JACCARD = (
    """WITH series AS (
  SELECT g.p FROM generate_series(1, 4096) g(p)),
tok AS (
  SELECT DISTINCT doc_id, substr(lower(trim(text)), CAST(s.p AS INT), 3) AS token
  FROM documents, series s
  WHERE s.p <= length(lower(trim(text))) - 2), """
    + _SIG_CTE + ", " + _BANDED_CTE + ", " + _PAIRS_CTE + """,
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
       CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE) AS jaccard
FROM j WHERE n_inter > 0
  AND CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE) >= 0.8
"""
)


def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Transitive near-dup clusters: connected components (alternating
    small/large-star contraction, O(log² n) rounds; operators/graph.py)
    over the Jaccard ≥ 0.8 pair graph — chains a~b~c collapse into one
    cluster even when a~c is below threshold. Switched from the frontier
    variant in round 10: identical (node, min-id cluster) contract, and
    the star rounds are ~1.7-3× cheaper on dup graphs at both measured
    decades (A/B in BASELINE.md RESULTS-r10). Oracle: recursive
    reachability CTE."""
    from reactivedb_spark.operators.graph import connected_components_star

    pairs = dedup.jaccard_pairs(
        dedup.widen(load(spark, sf, "documents")), "doc_id", "text", threshold=0.8
    ).select("doc_a", "doc_b")
    return connected_components_star(pairs).select(
        F.col("node").alias("doc_id"), F.col("cluster").cast("long").alias("cluster")
    )


SQL_DEDUP_CLUSTERS = (
    """WITH RECURSIVE tok AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE token <> ''), """
    + _SIG_CTE + ", " + _BANDED_CTE + ", " + _PAIRS_CTE + """,
sets AS (
  SELECT doc_id, list(DISTINCT token) AS toks,
         CAST(count(DISTINCT token) AS BIGINT) AS n_tok
  FROM tok GROUP BY doc_id),
edges AS (
  SELECT p.doc_a, p.doc_b
  FROM pairs p
  JOIN sets sa ON sa.doc_id = p.doc_a
  JOIN sets sb ON sb.doc_id = p.doc_b
  WHERE len(list_intersect(sa.toks, sb.toks)) > 0
    AND CAST(len(list_intersect(sa.toks, sb.toks)) AS DOUBLE)
        / CAST(sa.n_tok + sb.n_tok - len(list_intersect(sa.toks, sb.toks)) AS DOUBLE) >= 0.8),
sym AS (SELECT doc_a AS s, doc_b AS d FROM edges
        UNION SELECT doc_b, doc_a FROM edges),
reach AS (
  SELECT s AS doc, s AS r FROM sym
  UNION
  SELECT y.d AS doc, re.r FROM reach re JOIN sym y ON y.s = re.doc)
SELECT doc AS doc_id, CAST(min(r) AS BIGINT) AS cluster
FROM reach GROUP BY doc
"""
)


def q_dedup_ngram_jaccard_guarded(spark: SparkSession, sf: str) -> DataFrame:
    """Production config of the char-3-gram near-dup pipeline (VERDICT
    r12 #7): ``max_bucket=100`` drops stop-band LSH buckets before pair
    generation — the same guard dedup_jaccard_guarded carries, applied
    to the shingle tokenizer. The oracle replays the identical bucket-
    count rule, so the guard's semantics are driver-verified."""
    return dedup.ngram_jaccard_pairs(
        dedup.widen(load(spark, sf, "documents")), "doc_id", "text",
        n=3, threshold=0.8, max_bucket=100,
    )


SQL_DEDUP_NGRAM_JACCARD_GUARDED = (
    """WITH series AS (
  SELECT g.p FROM generate_series(1, 4096) g(p)),
tok AS (
  SELECT DISTINCT doc_id, substr(lower(trim(text)), CAST(s.p AS INT), 3) AS token
  FROM documents, series s
  WHERE s.p <= length(lower(trim(text))) - 2), """
    + _SIG_CTE + ", " + _BANDED_CTE + ", " + _LONG_CTE + """,
kept AS (
  SELECT doc_id, bi, bk FROM (
    SELECT doc_id, bi, bk, count(*) OVER (PARTITION BY bi, bk) AS bn FROM lng)
  WHERE bn <= 100),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id),
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
       CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE) AS jaccard
FROM j WHERE n_inter > 0
  AND CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE) >= 0.8
"""
)


def q_dedup_clusters_guarded(spark: SparkSession, sf: str) -> DataFrame:
    """Production config of transitive near-dup clustering (VERDICT r12
    #7): connected components over the GUARDED (max_bucket=100) Jaccard
    >= 0.8 pair graph — the committed config at scale (16.0 s vs
    569.5 s unguarded at sf10, BASELINE.md). Oracle: recursive
    reachability over the identically-guarded pair CTE."""
    from reactivedb_spark.operators.graph import connected_components_star

    pairs = dedup.jaccard_pairs(
        dedup.widen(load(spark, sf, "documents")), "doc_id", "text",
        threshold=0.8, max_bucket=100,
    ).select("doc_a", "doc_b")
    return connected_components_star(pairs).select(
        F.col("node").alias("doc_id"), F.col("cluster").cast("long").alias("cluster")
    )


SQL_DEDUP_CLUSTERS_GUARDED = (
    """WITH RECURSIVE tok AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE token <> ''), """
    + _SIG_CTE + ", " + _BANDED_CTE + ", " + _LONG_CTE + """,
kept AS (
  SELECT doc_id, bi, bk FROM (
    SELECT doc_id, bi, bk, count(*) OVER (PARTITION BY bi, bk) AS bn FROM lng)
  WHERE bn <= 100),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id),
sets AS (
  SELECT doc_id, list(DISTINCT token) AS toks,
         CAST(count(DISTINCT token) AS BIGINT) AS n_tok
  FROM tok GROUP BY doc_id),
edges AS (
  SELECT p.doc_a, p.doc_b
  FROM pairs p
  JOIN sets sa ON sa.doc_id = p.doc_a
  JOIN sets sb ON sb.doc_id = p.doc_b
  WHERE len(list_intersect(sa.toks, sb.toks)) > 0
    AND CAST(len(list_intersect(sa.toks, sb.toks)) AS DOUBLE)
        / CAST(sa.n_tok + sb.n_tok - len(list_intersect(sa.toks, sb.toks)) AS DOUBLE) >= 0.8),
sym AS (SELECT doc_a AS s, doc_b AS d FROM edges
        UNION SELECT doc_b, doc_a FROM edges),
reach AS (
  SELECT s AS doc, s AS r FROM sym
  UNION
  SELECT y.d AS doc, re.r FROM reach re JOIN sym y ON y.s = re.doc)
SELECT doc AS doc_id, CAST(min(r) AS BIGINT) AS cluster
FROM reach GROUP BY doc
"""
)


def q_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.simhash(dedup.widen(load(spark, sf, "documents")), "doc_id", "text")


SQL_DEDUP_SIMHASH = (
    "WITH " + _TOK_CTE + f""",
tokd AS (SELECT DISTINCT doc_id, token FROM tok),
votes AS (
  SELECT doc_id, g.j,
         SUM(CASE WHEN substr(md5(token), g.j, 1) IN {HEX_HIGH_SQL} THEN 1 ELSE -1 END) AS s
  FROM tokd, generate_series(1, {dedup.SIMHASH_BITS}) g(j)
  GROUP BY doc_id, g.j)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN CAST(power(2, j - 1) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""
)

# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_ELEM_CTE = f"""
elem AS (
  SELECT vec_id, g.j,
         CAST(CAST(CAST(embedding[g.j] AS DOUBLE) AS DECIMAL(12,8)) * 100000000 AS BIGINT) AS xl
  FROM embeddings, generate_series(1, {EMB_DIM}) g(j)
)
"""

_PLANE_SUMS = ", ".join(
    f"SUM(CASE WHEN substr(md5('p' || {i} || '_' || j), 1, 1) IN {HEX_HIGH_SQL} "
    f"THEN xl ELSE -xl END) AS d{i}"
    for i in range(1, similarity.N_PLANES + 1)
)
_BUCKET_EXPR = " || ".join(
    f"(CASE WHEN d{i} > 0 THEN '1' ELSE '0' END)" for i in range(1, similarity.N_PLANES + 1)
)
_BUCKETS_CTE = (
    f"dots AS (SELECT vec_id, {_PLANE_SUMS} FROM elem GROUP BY vec_id), "
    f"buckets AS (SELECT vec_id, {_BUCKET_EXPR} AS bucket FROM dots)"
)


def q_dedup_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs at the scale-correct signature width:
    Hamming ≤ 3 over 64-bit split signatures (sh_hi/sh_lo) via the
    4×16-bit pigeonhole band join. Round 5 replaced the 32-bit/7-band
    layout after the sf1 validation measured its band buckets growing
    linearly with the corpus (birthday-quadratic join — PLANS.md)."""
    sig = dedup.simhash2(dedup.widen(load(spark, sf, "documents")), "doc_id", "text")
    return dedup.simhash2_pairs(sig, "doc_id", max_hamming=3)


SQL_DEDUP_SIMHASH_PAIRS = (
    "WITH " + _TOK_CTE + f""",
tokd AS (SELECT DISTINCT doc_id, token FROM tok),
votes AS (
  SELECT doc_id, g.j,
         SUM(CASE WHEN substr(md5(token), g.j, 1) IN {HEX_HIGH_SQL} THEN 1 ELSE -1 END) AS s_hi,
         SUM(CASE WHEN substr(md5(token), g.j, 1) IN {HEX_BIT2_SQL} THEN 1 ELSE -1 END) AS s_lo
  FROM tokd, generate_series(1, 32) g(j)
  GROUP BY doc_id, g.j),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s_hi > 0 THEN CAST(power(2, j - 1) AS BIGINT) ELSE 0 END) AS BIGINT) AS sh_hi,
         CAST(SUM(CASE WHEN s_lo > 0 THEN CAST(power(2, j - 1) AS BIGINT) ELSE 0 END) AS BIGINT) AS sh_lo
  FROM votes GROUP BY doc_id),
-- banded Hamming join (pigeonhole over 4 x 16-bit bands across the two
-- 32-bit halves), mirroring the Spark plan — no all-pairs join anywhere
bands AS (
  SELECT doc_id, sh_hi, sh_lo, b.band,
         CASE b.src WHEN 0 THEN (sh_hi >> b.sh) & 65535
                    ELSE (sh_lo >> b.sh) & 65535 END AS bv
  FROM sig, (VALUES (0, 0, 0), (1, 0, 16), (2, 1, 0), (3, 1, 16)) b(band, src, sh)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.sh_hi AS ha_hi, a.sh_lo AS ha_lo,
                  b.sh_hi AS hb_hi, b.sh_lo AS hb_lo
  FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv
                           AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(ha_hi, hb_hi)) + bit_count(xor(ha_lo, hb_lo)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(ha_hi, hb_hi)) + bit_count(xor(ha_lo, hb_lo)) <= 3
"""
)


def q_multimodal_embed(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal → embedding pipeline end-to-end: binary payloads through
    the Arrow ``mapInPandas`` feature extractor (stub: byte-histogram
    means), its ``features`` column consumed by the similarity operator
    (exact fixed-point cosine top-k). Exercises the full
    decode→embed→search path the production pipeline would run with a
    real model behind the same signature."""
    from reactivedb_spark.functions import multimodal

    d = multimodal.with_payload(spread(load(spark, sf, "documents")), "text")
    # persist: the cosine's query/corpus/norm branches would otherwise
    # re-run the Python feature extractor once each
    feats = cache.pin(multimodal.extract_features(d, "doc_id"))
    return similarity.cosine_topk(feats, "doc_id", "features", 0, k=10)


SQL_MULTIMODAL_EMBED = """
WITH series AS (
  -- constant bound (DuckDB generate_series takes constants only); fixture
  -- texts are < 1k chars and extra positions are filtered out below
  SELECT g.pos FROM generate_series(1, 4096) g(pos)),
bytes AS (
  -- text is ASCII in this fixture, so char codes == UTF-8 payload bytes
  SELECT doc_id, s.pos, ascii(substr(text, CAST(s.pos AS INT), 1)) AS code
  FROM documents, series s WHERE s.pos <= length(text)),
feat AS (
  -- mirror extract_features: per-residue byte mean / 255 in double, then
  -- a single float32 rounding (the Arrow array element type)
  SELECT doc_id, CAST((pos - 1) % 8 AS INT) + 1 AS j,
         CAST(CAST(CAST(SUM(code) AS DOUBLE) / COUNT(*) / 255.0 AS REAL) AS DOUBLE) AS x
  FROM bytes GROUP BY doc_id, (pos - 1) % 8),
elem AS (
  SELECT doc_id, j,
         CAST(CAST(x AS DECIMAL(12,8)) * 100000000 AS BIGINT) AS xl
  FROM feat),
q AS (SELECT j, xl AS ql FROM elem WHERE doc_id = 0),
d AS (
  SELECT e.doc_id, SUM(e.xl * q.ql) AS dot, SUM(e.xl * e.xl) AS n2
  FROM elem e JOIN q USING (j) WHERE e.doc_id <> 0 GROUP BY e.doc_id),
qn AS (SELECT SUM(ql * ql) AS qn2 FROM q)
SELECT doc_id,
       round((CAST(dot AS DOUBLE) / 1e16)
             / (sqrt(CAST(n2 AS DOUBLE) / 1e16) * sqrt(CAST(qn2 AS DOUBLE) / 1e16)), 9) AS cos_sim
FROM d, qn
ORDER BY cos_sim DESC, doc_id LIMIT 10
"""


def q_similarity_topk(spark: SparkSession, sf: str) -> DataFrame:
    # widen at the raw-scan call site (single-file parquet → 1 partition);
    # the operator itself no longer probes partition counts
    return similarity.cosine_topk(
        dedup.widen(load(spark, sf, "embeddings")), "vec_id", "embedding", 0, k=10
    )


SQL_SIMILARITY_TOPK = (
    "WITH " + _ELEM_CTE + """,
q AS (SELECT j, xl AS ql FROM elem WHERE vec_id = 0),
d AS (
  SELECT e.vec_id, SUM(e.xl * q.ql) AS dot, SUM(e.xl * e.xl) AS n2
  FROM elem e JOIN q USING (j) WHERE e.vec_id <> 0 GROUP BY e.vec_id),
qn AS (SELECT SUM(ql * ql) AS qn2 FROM q)
SELECT vec_id,
       round((CAST(dot AS DOUBLE) / 1e16)
             / (sqrt(CAST(n2 AS DOUBLE) / 1e16) * sqrt(CAST(qn2 AS DOUBLE) / 1e16)), 9) AS cos_sim
FROM d, qn
ORDER BY cos_sim DESC, vec_id LIMIT 10
"""
)


def q_ann_buckets(spark: SparkSession, sf: str) -> DataFrame:
    return similarity.lsh_buckets(
        dedup.widen(load(spark, sf, "embeddings")), "vec_id", "embedding"
    )


SQL_ANN_BUCKETS = (
    "WITH " + _ELEM_CTE + ", " + _BUCKETS_CTE + " SELECT vec_id, bucket FROM buckets"
)


def q_ann_sq8_topk(spark: SparkSession, sf: str) -> DataFrame:
    """SQ8 scalar-quantized ANN top-10 (operators/similarity.py:
    sq8_topk): per-dimension [min,max] trained on the corpus, one byte
    per element, the EXACT query scored against every vector's
    reconstruction (asymmetric distance) — the memory-compression rung
    of the ANN ladder (FAISS ScalarQuantizer). Codes, reconstructions
    and distances are all integer fixed-point, so the oracle replays
    them bit-for-bit; a clamp, rounding or reconstruction drift breaks
    the hash."""
    return similarity.sq8_topk(
        dedup.widen(load(spark, sf, "embeddings")), "vec_id", "embedding", 0,
        k=10,
    )


SQL_ANN_SQ8_TOPK = (
    "WITH " + _ELEM_CTE + """,
params AS (SELECT j, min(xl) AS mn, max(xl) AS mx FROM elem GROUP BY j),
rec AS (
  SELECT vec_id, e.j,
         mn + ((CASE WHEN mx = mn THEN 0
                     ELSE ((xl - mn) * 255) // (mx - mn) END)
               * (mx - mn)) // 255 AS rl
  FROM elem e JOIN params USING (j)),
q AS (SELECT j, xl AS ql FROM elem WHERE vec_id = 0),
d AS (
  SELECT r.vec_id, SUM((ql - rl) * (ql - rl)) AS adc_d2
  FROM rec r JOIN q USING (j) WHERE r.vec_id <> 0 GROUP BY r.vec_id)
SELECT vec_id, CAST(adc_d2 AS BIGINT) AS adc_d2
FROM d ORDER BY adc_d2, vec_id LIMIT 10
"""
)


def q_ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-probed ANN top-10 against seed centroids — assignment and probe
    use exact int64 fixed-point L2, so the whole pipeline (cluster →
    probe → cosine) is bit-reproducible in SQL. The iterative k-means
    variant (``similarity.ivf_topk``) keeps its recall test in
    tests/test_similarity.py."""
    return similarity.ivf_seed_topk(
        dedup.widen(load(spark, sf, "embeddings")), "vec_id", "embedding", 0, k=10
    )


SQL_ANN_IVF_TOPK = (
    "WITH " + _ELEM_CTE + """,
seeds AS (
  SELECT vec_id AS sid, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster
  FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
cent AS (SELECT s.cluster, e.j, e.xl AS cl FROM elem e JOIN seeds s ON e.vec_id = s.sid),
d2 AS (
  SELECT e.vec_id, c.cluster, SUM((e.xl - c.cl) * (e.xl - c.cl)) AS d2
  FROM elem e JOIN cent c ON e.j = c.j
  GROUP BY e.vec_id, c.cluster),
assign AS (
  SELECT vec_id, cluster FROM d2
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1),
probe AS (SELECT cluster FROM d2 WHERE vec_id = 0 ORDER BY d2, cluster LIMIT 4),
cand AS (
  SELECT DISTINCT vec_id FROM assign WHERE cluster IN (SELECT cluster FROM probe)
  UNION SELECT 0),
q AS (SELECT j, xl AS ql FROM elem WHERE vec_id = 0),
d AS (
  SELECT e.vec_id, SUM(e.xl * q.ql) AS dot, SUM(e.xl * e.xl) AS n2
  FROM elem e JOIN q USING (j)
  WHERE e.vec_id <> 0 AND e.vec_id IN (SELECT vec_id FROM cand)
  GROUP BY e.vec_id),
qn AS (SELECT SUM(ql * ql) AS qn2 FROM q)
SELECT vec_id,
       round((CAST(dot AS DOUBLE) / 1e16)
             / (sqrt(CAST(n2 AS DOUBLE) / 1e16) * sqrt(CAST(qn2 AS DOUBLE) / 1e16)), 9) AS cos_sim
FROM d, qn
ORDER BY cos_sim DESC, vec_id LIMIT 10
"""
)


def q_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embedding-space near-duplicate
    removal — cluster with the exact fixed-point seed quantizer, then
    within-cluster cosine ≥ 0.999 drops the higher id of each pair. The
    fixture's embeddings are random (max within-cluster cosine 0.49),
    so the corpus is augmented with REAL semantic duplicates built
    deterministically in both engines: every 10th vector re-enters as
    id + 1,000,000 scaled by 1.001 (cosine is scale-invariant ⇒ ≈ 1.0
    after fixed-point rounding). Each copy that lands in its original's
    cluster — the expected case; boundary flips are deterministic and
    replayed identically by the oracle — is dropped, originals all
    survive.

    Scale-true parameterization (VERDICT r6 #2): ``n_clusters=None``
    scales k with the corpus (k = max(16, ⌈n/128⌉) — SemDeDup's own
    recipe), so pairs grow LINEARLY instead of quadratically, and
    ``max_cluster=1024`` is the stop-band-style guard against seed skew.
    Assignment is the two-level exact quantizer (n·O(√k)·d). The oracle
    replays the dynamic k, the ceil-sqrt super-seed count, both
    assignment levels, the cluster-size cap, the pair rule and the
    rounded-cosine threshold — all in exact integer math."""
    emb = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    dup = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.001)).alias("embedding"),
    )
    corpus = emb.unionByName(dup).repartition(
        spark.sparkContext.defaultParallelism
    )
    return similarity.semantic_dedup(
        corpus, "vec_id", "embedding", n_clusters=None, max_cluster=1024
    )


SQL_SEMANTIC_DEDUP = f"""
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.001) AS embedding
  FROM embeddings WHERE vec_id % 10 = 0),
elem AS (
  SELECT vec_id, g.j,
         CAST(CAST(embedding[g.j] AS DECIMAL(12,8)) * 100000000 AS BIGINT) AS xl
  FROM corpus, generate_series(1, {EMB_DIM}) g(j)),
ncl AS (SELECT GREATEST(16, CAST(ceil(COUNT(*) / 128.0) AS BIGINT)) AS k FROM corpus),
sup_s AS (SELECT MIN(i) AS s FROM generate_series(1, 65536) t(i), ncl WHERE i * i >= k),
seeds AS (
  SELECT sid, CAST(rn - 1 AS INT) AS cluster FROM (
    SELECT vec_id AS sid, row_number() OVER (ORDER BY vec_id) AS rn
    FROM corpus), ncl
  WHERE rn <= k),
scent AS (SELECT s.cluster, e.j, e.xl FROM elem e JOIN seeds s ON e.vec_id = s.sid),
supcent AS (SELECT c.cluster AS sidx, c.j, c.xl FROM scent c, sup_s WHERE c.cluster < s),
sd2 AS (
  SELECT c.cluster, p.sidx, SUM((c.xl - p.xl) * (c.xl - p.xl)) AS d2
  FROM scent c JOIN supcent p USING (j) GROUP BY c.cluster, p.sidx),
seedg AS (
  SELECT cluster, sidx AS g FROM sd2
  QUALIFY row_number() OVER (PARTITION BY cluster ORDER BY d2, sidx) = 1),
vd2 AS (
  SELECT e.vec_id, p.sidx, SUM((e.xl - p.xl) * (e.xl - p.xl)) AS d2
  FROM elem e JOIN supcent p USING (j) GROUP BY e.vec_id, p.sidx),
vg AS (
  SELECT vec_id, sidx AS g FROM vd2
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, sidx) = 1),
l2 AS (
  SELECT e.vec_id, c.cluster, SUM((e.xl - c.xl) * (e.xl - c.xl)) AS d2
  FROM elem e
  JOIN vg ON vg.vec_id = e.vec_id
  JOIN seedg sg ON sg.g = vg.g
  JOIN scent c ON c.cluster = sg.cluster AND c.j = e.j
  GROUP BY e.vec_id, c.cluster),
assign AS (
  SELECT vec_id, cluster FROM l2
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) = 1),
okc AS (SELECT cluster FROM assign GROUP BY cluster HAVING COUNT(*) <= 1024),
passign AS (SELECT a.vec_id, a.cluster FROM assign a JOIN okc USING (cluster)),
n2 AS (SELECT vec_id, SUM(xl * xl) AS n2 FROM elem GROUP BY vec_id),
pairs AS (
  SELECT a.vec_id AS da, b.vec_id AS db
  FROM passign a JOIN passign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
d AS (
  SELECT p.da, p.db, SUM(ea.xl * eb.xl) AS dot
  FROM pairs p
  JOIN elem ea ON ea.vec_id = p.da
  JOIN elem eb ON eb.vec_id = p.db AND ea.j = eb.j
  GROUP BY p.da, p.db),
losers AS (
  SELECT DISTINCT d.db FROM d
  JOIN n2 na ON na.vec_id = d.da
  JOIN n2 nb ON nb.vec_id = d.db
  WHERE round((CAST(dot AS DOUBLE) / 1e16)
              / (sqrt(CAST(na.n2 AS DOUBLE) / 1e16)
                 * sqrt(CAST(nb.n2 AS DOUBLE) / 1e16)), 9) >= 0.999)
SELECT a.vec_id, CAST(a.cluster AS INT) AS cluster
FROM assign a WHERE a.vec_id NOT IN (SELECT db FROM losers)
"""


def q_embedding_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    return similarity.cosine_pairs(
        dedup.widen(load(spark, sf, "embeddings")), "vec_id", "embedding"
    )


SQL_EMBEDDING_NEAR_DUPS = (
    "WITH " + _ELEM_CTE + ", " + _BUCKETS_CTE + """,
cand AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
n2 AS (SELECT vec_id, SUM(xl * xl) AS n2 FROM elem GROUP BY vec_id),
dotp AS (
  SELECT c.doc_a, c.doc_b, SUM(ea.xl * eb.xl) AS dot
  FROM cand c
  JOIN elem ea ON ea.vec_id = c.doc_a
  JOIN elem eb ON eb.vec_id = c.doc_b AND eb.j = ea.j
  GROUP BY c.doc_a, c.doc_b)
SELECT d.doc_a, d.doc_b,
       round((CAST(d.dot AS DOUBLE) / 1e16)
             / (sqrt(CAST(na.n2 AS DOUBLE) / 1e16) * sqrt(CAST(nb.n2 AS DOUBLE) / 1e16)), 9) AS cos_sim
FROM dotp d
JOIN n2 na ON na.vec_id = d.doc_a
JOIN n2 nb ON nb.vec_id = d.doc_b
"""
)

# Banded candidate rule (similarity.banded_pairs): within each bucket,
# members totally ordered by (md5(id), id); each vector pairs with the
# 64 members FOLLOWING it — candidates <= n*64 by construction, the
# worst-case-linear production config of the bucket self-join (the sf10
# drive measured the unbanded cand CTE densifying quadratically on the
# fixed 256-bucket layout — BASELINE.md RESULTS-r13).
_BANDED_CAND_CTE = """posn AS (
  SELECT vec_id, bucket,
         row_number() OVER (PARTITION BY bucket
                            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS pos
  FROM buckets),
cand AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM posn a JOIN posn b
    ON a.bucket = b.bucket AND b.pos > a.pos AND b.pos <= a.pos + 64)"""


def q_embedding_near_dups_banded(spark: SparkSession, sf: str) -> DataFrame:
    """Production config of embedding near-dup pairs: the BANDED
    candidate relation (candidates <= n·64, worst-case linear at any
    bucket skew) with the identical array-native fixed-point verify.
    Identical output to ``embedding_near_dups`` while buckets hold
    <= 65 vectors (every sf <= 0.1 fixture); declared bounded-recall
    beyond. The unbanded twin stays registered as the research config."""
    return similarity.banded_pairs(
        dedup.widen(load(spark, sf, "embeddings")), "vec_id", "embedding",
        band=64,
    )


SQL_EMBEDDING_NEAR_DUPS_BANDED = (
    "WITH " + _ELEM_CTE + ", " + _BUCKETS_CTE + ", " + _BANDED_CAND_CTE + """,
n2 AS (SELECT vec_id, SUM(xl * xl) AS n2 FROM elem GROUP BY vec_id),
dotp AS (
  SELECT c.doc_a, c.doc_b, SUM(ea.xl * eb.xl) AS dot
  FROM cand c
  JOIN elem ea ON ea.vec_id = c.doc_a
  JOIN elem eb ON eb.vec_id = c.doc_b AND eb.j = ea.j
  GROUP BY c.doc_a, c.doc_b)
SELECT d.doc_a, d.doc_b,
       round((CAST(d.dot AS DOUBLE) / 1e16)
             / (sqrt(CAST(na.n2 AS DOUBLE) / 1e16) * sqrt(CAST(nb.n2 AS DOUBLE) / 1e16)), 9) AS cos_sim
FROM dotp d
JOIN n2 na ON na.vec_id = d.doc_a
JOIN n2 nb ON nb.vec_id = d.doc_b
"""
)

# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def _lang_score_sql(lang: str) -> str:
    expr = "(' ' || text || ' ')"
    for m in LANG_MARKERS[lang]:
        expr = f"replace({expr}, '{m}', ' ')"
    return f"(length(' ' || text || ' ') - length({expr}))"


def _lang_case_sql() -> str:
    scores = {lang: f"s_{lang}" for lang in LANG_ORDER}
    total = " + ".join(scores.values())
    whens = []
    for lang in LANG_ORDER:
        conds = [f"({total}) > 0"]
        for other in LANG_ORDER:
            if other == lang:
                continue
            op = ">" if LANG_ORDER.index(other) < LANG_ORDER.index(lang) else ">="
            conds.append(f"{scores[lang]} {op} {scores[other]}")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


def q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    return d.select("doc_id", "lang", textfns.lang_id(F.col("text")).alias("pred_lang"))


SQL_LANG_ID = (
    "WITH scored AS (SELECT doc_id, lang, "
    + ", ".join(f"{_lang_score_sql(lang)} AS s_{lang}" for lang in LANG_ORDER)
    + " FROM documents) SELECT doc_id, lang, "
    + _lang_case_sql()
    + " AS pred_lang FROM scored"
)


def q_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        textfns.token_count(t).alias("n_tokens"),
        textfns.avg_token_len(t).alias("avg_tok_len"),
        textfns.alpha_ratio(t).alias("alpha_ratio"),
        textfns.quality_score(t).alias("quality"),
    )


SQL_TEXT_QUALITY = """
WITH base AS (
  SELECT doc_id,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
         CAST(length(replace(text, ' ', '')) AS DOUBLE) AS n_nonspace,
         CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE)
           / CAST(length(text) AS DOUBLE) AS alpha_ratio
  FROM documents)
SELECT doc_id, n_tokens,
       n_nonspace / CAST(n_tokens AS DOUBLE) AS avg_tok_len,
       alpha_ratio,
       least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5 + alpha_ratio * 0.5 AS quality
FROM base
"""


def q_char_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Character-level Shannon entropy per document
    (functions/text.py:char_entropy) — the distribution-shape quality
    signal the ratio-based `text_quality` cannot see. The oracle
    replays the histogram, the per-term DECIMAL(28,14) pin on
    p·log2 p, the exact decimal sum and the round(6) — the same
    cross-libm determinism contract q_unigram_logprob pioneered.
    Documents with no characters are absent from both sides."""
    return textfns.char_entropy(load(spark, sf, "documents"), "doc_id", "text")


SQL_CHAR_ENTROPY = """
WITH b AS (
  SELECT doc_id, ascii(substr(text, CAST(p AS INT), 1)) AS code
  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS p
        FROM documents)),
hist AS (
  SELECT doc_id, code, CAST(count(*) AS BIGINT) AS n_c
  FROM b GROUP BY doc_id, code),
tot AS (SELECT doc_id, CAST(sum(n_c) AS BIGINT) AS n FROM hist GROUP BY doc_id)
SELECT h.doc_id,
       CAST(max(t.n) AS BIGINT) AS n_chars,
       round(CAST(CAST(0 AS DECIMAL(28,14)) - sum(
         CAST((CAST(h.n_c AS DOUBLE) / CAST(t.n AS DOUBLE))
              * log2(CAST(h.n_c AS DOUBLE) / CAST(t.n AS DOUBLE))
              AS DECIMAL(28,14))) AS DOUBLE), 6) AS entropy_bits
FROM hist h JOIN tot t USING (doc_id)
GROUP BY h.doc_id
"""


def q_bpe_train(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed BPE merge LEARNING (operators/bpe.py): 6 rounds of
    weighted adjacent-pair counting over the word-frequency relation,
    argmax pair per round (ties (left, right) ascending), 6-pass
    ``replace`` rewrite. The oracle unrolls the identical 6 rounds as
    chained CTEs — pair counts, argmax and every replace pass replayed
    in SQL — so a wrong tie-break, a missed fixpoint pass or a
    miscounted pair breaks the hash. Complements `token_bpe`, which
    APPLIES a merge table this operator learns."""
    from reactivedb_spark.operators.bpe import bpe_train

    return bpe_train(load(spark, sf, "documents"), "text", merges=6, passes=6)


def _bpe_train_sql(merges: int = 6, passes: int = 6) -> str:
    ctes = [
        """w0 AS MATERIALIZED (
  SELECT ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s,
         CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(lower(trim(text)), ' ')) AS w
        FROM documents)
  WHERE w <> '' GROUP BY 1)"""
    ]
    for r in range(merges):
        ctes.append(
            f"""p{r} AS MATERIALIZED (
  SELECT arr[i] AS l, arr[i+1] AS r2, CAST(sum(cnt) AS BIGINT) AS n
  FROM (SELECT string_split(trim(s), ' ') AS arr, cnt,
               unnest(range(1, len(string_split(trim(s), ' ')))) AS i
        FROM w{r})
  GROUP BY 1, 2)"""
        )
        ctes.append(
            f"b{r} AS MATERIALIZED (SELECT l, r2, n FROM p{r} ORDER BY n DESC, l, r2 LIMIT 1)"
        )
        rep = "s"
        for _ in range(passes):
            rep = (
                f"replace({rep}, ' ' || (SELECT l FROM b{r}) || ' ' || "
                f"(SELECT r2 FROM b{r}) || ' ', ' ' || (SELECT l FROM b{r}) || "
                f"(SELECT r2 FROM b{r}) || ' ')"
            )
        ctes.append(f"w{r + 1} AS MATERIALIZED (SELECT {rep} AS s, cnt FROM w{r})")
    finals = " UNION ALL ".join(
        f"SELECT CAST({r + 1} AS INT) AS merge_rank, l AS left_sym, "
        f"r2 AS right_sym, n AS n_pair FROM b{r}"
        for r in range(merges)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + finals


SQL_BPE_TRAIN = _bpe_train_sql()


def q_bpe_train_batched(spark: SparkSession, sf: str) -> DataFrame:
    """BATCHED BPE merge learning (operators/bpe.py, VERDICT r7 #4):
    64 merges in 8 aggregation rounds of up to 8 symbol-disjoint merges
    each — the round schedule is fixed and the selection rule
    (rank by (n desc, l, r), keep top 128 candidates, dominance-filter
    on symbol overlap, take the first 8 qualifying) is purely
    relational, so the oracle unrolls the identical 8 rounds in SQL:
    candidate ranking, NOT-EXISTS dominance, per-slot replace chain and
    the cross-round merge_rank numbering are all replayed. A wrong
    dominance test, a candidate-cap drift or a misordered batch breaks
    the hash."""
    from reactivedb_spark.operators.bpe import bpe_train

    return bpe_train(load(spark, sf, "documents"), "text",
                     merges=64, passes=6, batch=8)


def _bpe_train_batched_sql(merges: int = 64, passes: int = 6,
                           batch: int = 8) -> str:
    top_c = 16 * batch
    n_rounds = -(-merges // batch)
    ctes = [
        """w0 AS MATERIALIZED (
  SELECT ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s,
         CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(lower(trim(text)), ' ')) AS w
        FROM documents)
  WHERE w <> '' GROUP BY 1)"""
    ]
    unions = []
    for r in range(n_rounds):
        limit_r = min(batch, merges - batch * r)
        ctes.append(
            f"""p{r} AS MATERIALIZED (
  SELECT arr[i] AS l, arr[i+1] AS r2, CAST(sum(cnt) AS BIGINT) AS n
  FROM (SELECT string_split(trim(s), ' ') AS arr, cnt,
               unnest(range(1, len(string_split(trim(s), ' ')))) AS i
        FROM w{r})
  GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""rk{r} AS MATERIALIZED (
  SELECT l, r2, n, row_number() OVER (ORDER BY n DESC, l, r2) AS rk
  FROM p{r} ORDER BY n DESC, l, r2 LIMIT {top_c})"""
        )
        ctes.append(
            f"""b{r} AS MATERIALIZED (
  SELECT l, r2, n, row_number() OVER (ORDER BY rk) AS j
  FROM rk{r} a
  WHERE NOT EXISTS (SELECT 1 FROM rk{r} b WHERE b.rk < a.rk
    AND (b.l = a.l OR b.l = a.r2 OR b.r2 = a.l OR b.r2 = a.r2))
  ORDER BY rk LIMIT {limit_r})"""
        )
        rep = "s"
        for j in range(1, limit_r + 1):
            # a slot with no selected pair must be an identity replace:
            # the two-space fallback pattern can never occur in the
            # single-space-separated symbol strings
            pat = (f"coalesce((SELECT ' ' || l || ' ' || r2 || ' ' "
                   f"FROM b{r} WHERE j = {j}), '  ')")
            sub = (f"coalesce((SELECT ' ' || l || r2 || ' ' "
                   f"FROM b{r} WHERE j = {j}), '')")
            for _ in range(passes):
                rep = f"replace({rep}, {pat}, {sub})"
        ctes.append(f"w{r + 1} AS MATERIALIZED (SELECT {rep} AS s, cnt FROM w{r})")
        unions.append(
            f"SELECT {r} AS rnd, j, l AS left_sym, r2 AS right_sym, "
            f"n AS n_pair FROM b{r}"
        )
    body = " UNION ALL ".join(unions)
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT CAST(row_number() OVER (ORDER BY rnd, j) AS INT) AS merge_rank,"
        " left_sym, right_sym, n_pair\n"
        f"FROM ({body})"
    )


SQL_BPE_TRAIN_BATCHED = _bpe_train_batched_sql()


def q_token_count(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        "n_chars",
        F.length("text").cast("long").alias("len_text"),
        textfns.token_count(F.col("text")).alias("n_tokens"),
    )


SQL_TOKEN_COUNT = """
SELECT doc_id, n_chars, CAST(length(text) AS BIGINT) AS len_text,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
FROM documents
"""


def q_token_bpe(spark: SparkSession, sf: str) -> DataFrame:
    """BPE-ish subword estimate (regex pretokenization + chars/token≈4
    within letter runs) next to the whitespace count — the two token
    meters a training-data pipeline budgets with."""
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        textfns.token_count(F.col("text")).alias("ws_tokens"),
        textfns.bpe_token_estimate("text").alias("bpe_tokens"),
    )


SQL_TOKEN_BPE = """
SELECT doc_id,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS ws_tokens,
       CAST(
         (SELECT COALESCE(SUM((length(r) + 3) // 4), 0)
          FROM unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t(r))
         + length(regexp_replace(lower(text), '[^0-9]', '', 'g'))
         + length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
       AS BIGINT) AS bpe_tokens
FROM documents
"""


def q_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        textfns.fingerprint(F.col("text")).alias("fp"),
        F.md5(F.substring(F.col("text"), 1, 64)).alias("prefix_fp"),
    )


SQL_FINGERPRINT = """
SELECT doc_id, md5(lower(trim(text))) AS fp, md5(substr(text, 1, 64)) AS prefix_fp
FROM documents
"""


def q_text_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition filters: top-token fraction and duplicate
    adjacent-bigram fraction per document (functions/text.py
    repetition_stats) — the repetition axis of corpus quality scoring."""
    return textfns.repetition_stats(
        dedup.widen(load(spark, sf, "documents")), "doc_id", "text"
    )


SQL_TEXT_REPETITION = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents),
tok AS (
  SELECT doc_id, CAST(g.pos AS INT) AS pos, l[CAST(g.pos AS INT)] AS token
  FROM t, generate_series(1, 4096) g(pos) WHERE g.pos <= len(l)),
counts AS (SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY doc_id, token),
per_tok AS (
  SELECT doc_id, SUM(c) AS n_tokens, MAX(c) AS top_c FROM counts GROUP BY doc_id),
bi AS (
  SELECT doc_id, bg FROM (
    SELECT doc_id,
           token || ' ' || lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS bg
    FROM tok) WHERE bg IS NOT NULL),
per_bi AS (
  SELECT doc_id, COUNT(*) AS n_bi, COUNT(DISTINCT bg) AS n_bi_distinct
  FROM bi GROUP BY doc_id)
SELECT p.doc_id,
       CAST(p.n_tokens AS BIGINT) AS n_tokens,
       CAST(p.top_c AS DOUBLE) / CAST(p.n_tokens AS DOUBLE) AS top_tok_frac,
       CASE WHEN coalesce(b.n_bi, 0) = 0 THEN 0.0
            ELSE 1.0 - CAST(b.n_bi_distinct AS DOUBLE) / CAST(b.n_bi AS DOUBLE)
       END AS dup_bigram_frac
FROM per_tok p LEFT JOIN per_bi b USING (doc_id)
"""


def q_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document TF-IDF keyword extraction (rational idf N/df — no
    log, so the score is a fixed-op-order double identical in any
    engine). Top-3 terms per document."""
    return textfns.tfidf_top_terms(
        dedup.widen(load(spark, sf, "documents")), "doc_id", "text", k=3
    )


SQL_TFIDF_TOP_TERMS = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents),
tok AS (
  SELECT doc_id, l[CAST(g.pos AS INT)] AS token
  FROM t, generate_series(1, 4096) g(pos) WHERE g.pos <= len(l)),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
dfreq AS (SELECT token, COUNT(*) AS df_t FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT f.doc_id, f.token, f.tf, d.df_t,
         CAST(f.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE) / CAST(d.df_t AS DOUBLE) AS tfidf
  FROM tf f JOIN dfreq d USING (token), n)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df_t AS BIGINT) AS df_t,
       tfidf, CAST(rk AS BIGINT) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, token) AS rk
      FROM scored)
WHERE rk <= 3
"""


def q_top_bigrams(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus bigram census: global top-20 adjacent bigrams (orderBy +
    limit compiles to distributed TakeOrdered, not a full sort)."""
    return textfns.top_ngrams(
        dedup.widen(load(spark, sf, "documents")), "doc_id", "text", k=20
    )


SQL_TOP_BIGRAMS = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents),
tok AS (
  SELECT doc_id, CAST(g.pos AS INT) AS pos, l[CAST(g.pos AS INT)] AS token
  FROM t, generate_series(1, 4096) g(pos) WHERE g.pos <= len(l)),
bi AS (
  SELECT bg FROM (
    SELECT token || ' ' || lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS bg
    FROM tok) WHERE bg IS NOT NULL)
SELECT bg AS bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM bi GROUP BY bg ORDER BY n DESC, bigram LIMIT 20
"""


def q_pack_budget(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget sequence packing per source shard (operators/
    packing.py): streaming-chunker bin assignment by running token
    total — keyed window, exact integer math."""
    from reactivedb_spark.operators.packing import pack_by_budget

    d = load(spark, sf, "documents").select(
        "doc_id", "source",
        textfns.token_count(F.col("text")).alias("n_tokens"),
    )
    return pack_by_budget(d, "doc_id", "source", "n_tokens", budget=2048)


SQL_PACK_BUDGET = """
WITH d AS (
  SELECT doc_id, source,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS sz
  FROM documents),
c AS (
  SELECT doc_id, source, sz,
         SUM(sz) OVER (PARTITION BY source ORDER BY doc_id) - sz AS strt
  FROM d)
SELECT doc_id, source,
       CAST(strt // 2048 AS BIGINT) AS bin_id,
       CAST(strt % 2048 AS BIGINT) AS offset_in_bin,
       sz AS size
FROM c
"""


def q_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination (operators/contamination.py): flag
    training docs sharing any 5-gram with a held-out eval slice
    (doc_id % 19 == 3 plays the benchmark set). Broadcast semi-join on
    the eval n-gram set — no corpus-side shuffle before the per-doc
    hit aggregation."""
    from reactivedb_spark.operators.contamination import ngram_overlap

    docs = dedup.widen(load(spark, sf, "documents"))
    bench = docs.filter(F.col("doc_id") % 19 == 3)
    corpus = docs.filter(F.col("doc_id") % 19 != 3)
    return ngram_overlap(corpus, bench, "doc_id", "text", n=5)


SQL_DECONTAMINATE = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
  FROM documents),
g AS (
  SELECT doc_id, array_to_string(l[CAST(i AS INT):CAST(i + 4 AS INT)], ' ') AS ng
  FROM t, generate_series(1, 4096) s(i) WHERE i <= len(l) - 4),
b AS (SELECT DISTINCT ng FROM g WHERE doc_id % 19 = 3),
hits AS (
  SELECT g.doc_id, count(DISTINCT g.ng) AS n_hits
  FROM g JOIN b USING (ng) WHERE g.doc_id % 19 <> 3 GROUP BY g.doc_id),
base AS (
  SELECT doc_id, CAST(count(DISTINCT ng) AS BIGINT) AS n_ngrams
  FROM g WHERE doc_id % 19 <> 3 GROUP BY doc_id
  UNION ALL
  SELECT doc_id, 0 AS n_ngrams FROM t
  WHERE doc_id % 19 <> 3 AND len(l) < 5)
SELECT base.doc_id, n_ngrams,
       CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(n_hits, 0) > 0 AS INT) AS contaminated
FROM base LEFT JOIN hits ON base.doc_id = hits.doc_id
"""


def q_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """PII redaction: plant a synthetic email + phone per doc (the
    fixture corpus has none), scrub both, and report match counts. A
    narrow regex map — no shuffle anywhere in the plan."""
    d = load(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit("contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" "), F.col("text"),
        ).alias("raw"),
    )
    n_emails, n_phones = textfns.pii_counts(F.col("raw"))
    return d.select(
        "doc_id",
        F.substring(textfns.scrub_pii(F.col("raw")), 1, 120).alias("scrubbed"),
        n_emails,
        n_phones,
    )


SQL_PII_SCRUB = f"""
WITH d AS (
  SELECT doc_id,
         'contact user' || CAST(doc_id AS VARCHAR) || '@example.com or call 555-'
           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' || text AS raw
  FROM documents)
SELECT doc_id,
       substr(regexp_replace(regexp_replace(raw,
                '{textfns.EMAIL_RE}', '<EMAIL>', 'g'),
                '{textfns.PHONE_RE}', '<PHONE>', 'g'), 1, 120) AS scrubbed,
       CAST(len(regexp_extract_all(raw, '{textfns.EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(raw, '{textfns.PHONE_RE}')) AS BIGINT) AS n_phones
FROM d
"""


_MD5_ID_SQL = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"


def q_sample_hash(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic ~20% corpus sample: md5(id) mod 100 — a narrow
    filter (no shuffle, scan-pushable), repeatable at any parallelism."""
    from reactivedb_spark.operators.sampling import hash_sample

    return hash_sample(load(spark, sf, "documents"), "doc_id", 20).select(
        "doc_id", "lang", "source", "n_chars"
    )


SQL_SAMPLE_HASH = f"""
SELECT doc_id, lang, source, n_chars
FROM documents WHERE {_MD5_ID_SQL} % 100 < 20
"""


def q_sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Equal-allocation stratified sample: 20 docs per language, chosen
    by md5-hash order (deterministic class balancing for a training
    mix); one window shuffle on the stratum key."""
    from reactivedb_spark.operators.sampling import stratified_sample

    return stratified_sample(
        load(spark, sf, "documents"), "doc_id", "lang", 20
    ).select("doc_id", "lang", "source")


SQL_SAMPLE_STRATIFIED = f"""
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY lang ORDER BY {_MD5_ID_SQL}, doc_id) AS rn
  FROM documents) WHERE rn <= 20
"""


def q_graph_components_star(spark: SparkSession, sf: str) -> DataFrame:
    """Small-star/large-star connected components on a DEEP graph: orders
    chained by orderkey within each priority form 5 components whose
    diameter grows linearly with SF (thousands of hops at sf0.1) — far
    past any label-propagation round budget; star contraction converges
    in O(log² n) rounds regardless. The known chain structure gives an
    exact non-recursive oracle: every node's cluster is its priority's
    minimum orderkey."""
    from reactivedb_spark.operators.graph import connected_components_star

    o = load(spark, sf, "orders").filter(F.col("o_orderkey") % 7 == 0)
    nxt = F.lead("o_orderkey").over(
        W.partitionBy("o_orderpriority").orderBy("o_orderkey")
    )
    edges = (
        o.select("o_orderkey", "o_orderpriority")
        .withColumn("nxt", nxt)
        .filter(F.col("nxt").isNotNull())
        .select(F.col("o_orderkey").alias("doc_a"), F.col("nxt").alias("doc_b"))
    )
    return connected_components_star(edges)


SQL_GRAPH_COMPONENTS_STAR = """
WITH o AS (SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 7 = 0),
sized AS (
  SELECT o_orderkey, o_orderpriority,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n,
         MIN(o_orderkey) OVER (PARTITION BY o_orderpriority) AS mn
  FROM o)
-- chains with a single node produce no edges, so only priorities with
-- >= 2 selected orders appear in the component labeling
SELECT o_orderkey AS node, mn AS cluster FROM sized WHERE n >= 2
"""

# ---------------------------------------------------------------------------
# multimodal (binary payload plumbing; decode stubbed deterministically)
# ---------------------------------------------------------------------------

def q_multimodal_decode(spark: SparkSession, sf: str) -> DataFrame:
    d = multimodal.with_payload(spread(load(spark, sf, "documents")), "text")
    return multimodal.decode_metadata(d, "doc_id")


def q_multimodal_png_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL image codec end-to-end: each document's text bytes become the
    pixels of a genuine 8-bit grayscale PNG (stdlib zlib encoder), then
    the REAL decoder parses the actual chunk headers (IHDR width/height/
    depth/color), verifies CRCs, inflates IDAT and de-filters scanlines;
    ``pix_sum`` sums the decoded samples. The oracle recomputes the
    expected geometry and pixel sum from the same source text — any
    header mis-parse, inflate bug or filter error breaks the match."""
    d = spread(load(spark, sf, "documents"))  # straggler smoothing
    pay = multimodal.encode_png(d, "doc_id", "text", width=16)
    return multimodal.decode_png(pay, "doc_id")


SQL_MULTIMODAL_PNG_DECODE = """
WITH series AS (SELECT g.pos FROM generate_series(1, 4096) g(pos)),
b AS (
  -- fixture text is pure ASCII: char codes == UTF-8 payload bytes
  SELECT doc_id, ascii(substr(text, CAST(s.pos AS INT), 1)) AS code
  FROM documents, series s WHERE s.pos <= length(text)),
sums AS (SELECT doc_id, SUM(code) AS pix_sum FROM b GROUP BY doc_id)
SELECT d.doc_id,
       CAST(16 AS BIGINT) AS width,
       CAST(greatest((length(d.text) + 15) // 16, 1) AS BIGINT) AS height,
       CAST(8 AS BIGINT) AS bit_depth,
       CAST(0 AS BIGINT) AS color_type,
       CAST(coalesce(s.pix_sum, 0) AS BIGINT) AS pix_sum
FROM documents d LEFT JOIN sums s USING (doc_id)
"""


def q_multimodal_jpeg_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL baseline-JPEG codec end-to-end (round-5 format completion):
    each document's text bytes become the constant 8×8 blocks of a
    genuine baseline JPEG (functions/jpeg.py — valid JFIF/DQT/SOF0/DHT/
    SOS segments, canonical Huffman, byte stuffing), then the REAL
    decoder re-derives the file's Huffman tables from its DHT, entropy-
    decodes every block, dequantizes, dezigzags and runs the exact
    separable IDCT. Constant blocks make the lossy format round-trip
    exact (DC-only, unit quantization), so ``pix_sum`` is 64 × Σ byte
    values — the oracle recomputes geometry and pixel sum from the same
    source text; any marker mis-parse, Huffman or IDCT bug breaks the
    match."""
    # _common.spread: ~4 tasks per core so a host-load straggler delays
    # one slice, not the stage (at 100 TB the input arrives in thousands
    # of partitions and this repartition is a no-op decision)
    d = spread(load(spark, sf, "documents"), factor=2)
    pay = multimodal.encode_jpeg(d, "doc_id", "text", blocks_per_row=16)
    return multimodal.decode_jpeg(pay, "doc_id")


SQL_MULTIMODAL_JPEG_DECODE = """
WITH b AS (
  -- fixture text is pure ASCII: char codes == UTF-8 payload bytes;
  -- per-row unnest(range()) — no fixed series cap
  SELECT doc_id, ascii(substr(text, CAST(p AS INT), 1)) AS code
  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS p
        FROM documents)),
sums AS (SELECT doc_id, 64 * SUM(code) AS pix_sum FROM b GROUP BY doc_id)
SELECT d.doc_id,
       CAST(128 AS BIGINT) AS width,
       CAST(8 * greatest((length(d.text) + 15) // 16, 1) AS BIGINT) AS height,
       CAST(1 AS BIGINT) AS n_components,
       CAST(coalesce(s.pix_sum, 0) AS BIGINT) AS pix_sum
FROM documents d LEFT JOIN sums s USING (doc_id)
"""


def q_multimodal_wav_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL audio codec round-trip: text bytes → PCM16 mono WAV
    (canonical RIFF/fmt/data) → struct-parsed decode. ``amp_sum`` sums
    |sample| over the unpacked PCM data; the oracle recomputes the
    expected header fields and amplitude sum from the same source text —
    a chunk mis-parse or sample unpack bug breaks the match."""
    d = spread(load(spark, sf, "documents"))  # straggler smoothing
    pay = multimodal.encode_wav(d, "doc_id", "text", sample_rate=8000)
    return multimodal.decode_wav(pay, "doc_id")


SQL_MULTIMODAL_WAV_DECODE = """
WITH series AS (SELECT g.pos FROM generate_series(1, 4096) g(pos)),
b AS (
  -- fixture text is pure ASCII: char codes == UTF-8 payload bytes
  SELECT doc_id, ascii(substr(text, CAST(s.pos AS INT), 1)) AS code
  FROM documents, series s WHERE s.pos <= length(text)),
sums AS (
  SELECT doc_id, SUM(abs(code - 128) * 256) AS amp_sum,
         count(*) AS n FROM b GROUP BY doc_id)
SELECT d.doc_id,
       CAST(1 AS BIGINT) AS n_channels,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(coalesce(s.n, 0) AS BIGINT) AS n_samples,
       CAST(coalesce(s.amp_sum, 0) AS BIGINT) AS amp_sum
FROM documents d LEFT JOIN sums s USING (doc_id)
"""


def q_wav_frame_features(spark: SparkSession, sf: str) -> DataFrame:
    """Windowed audio features over REAL WAV decode
    (:func:`multimodal.wav_frame_features`): 256-sample frames, exact
    integer Σ|sample| and half-scale level crossings per frame — the
    audio analogue of the image pixel-feature query. The oracle
    recomputes every frame from the source text (byte b ↔ sample
    (b−128)·256; crossings where consecutive in-frame bytes straddle
    byte 96). A RIFF mis-parse, off-by-one at a frame boundary, or a
    boundary-pair leak breaks the match."""
    d = spread(load(spark, sf, "documents"))  # straggler smoothing
    # Persist + materialize the encoded samples BEFORE the frames Arrow
    # stage (VERDICT r8 #1): chained encode→frames ran as one task with
    # two Python hops, and in long suite sessions the frames workers sat
    # feed-starved behind the in-task encode relay (MMPROF: p50 batch
    # wait 0.93 s vs 37 ms compute). Splitting the stages lets the
    # frames feed read local cached blocks; at 100 TB the upstream
    # relation would already be a materialized table and this persist is
    # the same stage boundary a pipeline would have naturally.
    pay = cache.pin(
        multimodal.encode_wav(d, "doc_id", "text", sample_rate=8000))
    pay.count()
    return multimodal.wav_frame_features(pay, "doc_id", frame=256)


SQL_WAV_FRAME_FEATURES = """
WITH b AS (
  SELECT doc_id, p, ascii(substr(text, CAST(p AS INT), 1)) AS code
  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS p
        FROM documents)),
f AS (
  SELECT doc_id, CAST((p - 1) // 256 AS BIGINT) AS frame_idx,
         count(*) AS n_samples,
         SUM(abs(code - 128) * 256) AS amp_sum
  FROM b GROUP BY 1, 2),
x AS (
  SELECT a.doc_id, CAST((a.p - 1) // 256 AS BIGINT) AS frame_idx,
         SUM(CASE WHEN (a.code - 96) * (c.code - 96) < 0 THEN 1 ELSE 0 END)
           AS crossings
  FROM b a JOIN b c ON c.doc_id = a.doc_id AND c.p = a.p + 1
  WHERE (a.p % 256) != 0
  GROUP BY 1, 2)
SELECT f.doc_id, f.frame_idx,
       CAST(f.n_samples AS BIGINT) AS n_samples,
       CAST(f.amp_sum AS BIGINT) AS amp_sum,
       CAST(coalesce(x.crossings, 0) AS BIGINT) AS crossings
FROM f LEFT JOIN x USING (doc_id, frame_idx)
"""


def q_multimodal_frames(spark: SparkSession, sf: str) -> DataFrame:
    """Frame sampling (one-to-many mapInPandas): every 100-byte window of
    the payload is a fake 'frame'; emitted as (doc_id, frame_no,
    frame_len). The Arrow plumbing is real; the oracle recomputes the
    window arithmetic in SQL."""
    d = multimodal.with_payload(spread(load(spark, sf, "documents")), "text")
    frames = multimodal.sample_frames(d, "doc_id", every_n=100)
    return frames.select(
        "doc_id", "frame_no", F.octet_length("frame").cast("long").alias("frame_len")
    )


SQL_MULTIMODAL_FRAMES = """
WITH f AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
         unnest(generate_series(0, CAST(ceil(length(text) / 100.0) AS BIGINT) - 1)) AS frame_no
  FROM documents WHERE length(text) > 0)
SELECT doc_id, frame_no, least(100, len - frame_no * 100) AS frame_len FROM f
"""

SQL_MULTIMODAL_DECODE = """
SELECT doc_id,
       64 + (length(text) % 512) AS width,
       64 + ((length(text) * 31 + ascii(substr(text, 1, 1))) % 512) AS height,
       CASE length(text) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
       CAST(length(text) AS BIGINT) AS n_bytes
FROM documents
"""

# ---------------------------------------------------------------------------
# windowing / ordered analytics (free in Spark, absent in the reference —
# SURVEY.md §2.4 "absent operator classes")
# ---------------------------------------------------------------------------

def q_window_rank(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return o.select(
        "o_orderkey", "o_custkey", F.row_number().over(w).cast("long").alias("rk")
    )


SQL_WINDOW_RANK = """
SELECT o_orderkey, o_custkey,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
FROM orders
"""


def q_topk_orders(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


SQL_TOPK_ORDERS = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_events_hourly(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")  # ts = int64 nanoseconds
    return (
        ev.groupBy(
            F.expr("CAST(ts div 3600000000000 AS BIGINT)").alias("hour_bucket"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("decimal(38,6)").cast("double").alias("sum_value"),
        )
    )


SQL_EVENTS_HOURLY = """
SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST("value" AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization: 30-min inactivity gap splits a user's events."""
    ev = load(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") - F.lag("ts").over(w)
    flag = F.when(gap.isNull(), F.lit(0)).when(
        gap > 1_800_000_000_000, F.lit(1)
    ).otherwise(F.lit(0))
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return ev.select(
        "event_id", "user_id", F.sum(flag).over(run).cast("long").alias("session_id")
    )


SQL_SESSIONIZE = """
WITH o AS (SELECT event_id, user_id, epoch_ns(ts) AS tns FROM events),
g AS (
  SELECT event_id, user_id, tns,
         CASE WHEN lag(tns) OVER w IS NULL THEN 0
              WHEN tns - lag(tns) OVER w > 1800000000000 THEN 1 ELSE 0 END AS flag
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id))
SELECT event_id, user_id,
       CAST(SUM(flag) OVER (PARTITION BY user_id ORDER BY tns, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM g
"""


def q_streaming_timeout_sessions(spark: SparkSession, sf: str) -> DataFrame:
    """Timer-driven custom stateful sessionization
    (streaming/listen.py:stateful_timeout_sessions —
    ``applyInPandasWithState`` with EventTimeTimeout): sessions split on
    >15-min gaps; CLOSED sessions emit in the batch that closes them,
    and each key's final OPEN session emits from the TIMEOUT callback
    once the watermark passes last_event + gap. The replay exercises
    both paths deterministically:

    - batch 0: events with t < BASE+1h, batch 1: the rest (time-split,
      so every key's batches arrive in event-time order and a session
      spanning the split is CONTINUED from state, not duplicated);
    - batches 2-3: ticks at BASE+3h (event-time-cutoff-filtered above
      the watermark node, the streaming_outer_join pattern) advance the
      watermark — the first burns the one-batch watermark lag, the
      second (plus availableNow's finalization batch) fires every
      remaining timeout.

    The oracle is the plain batch sessionization (lag/cumsum, the
    `sessionize` rule) aggregated to (session_start, end, count) —
    streamed timer semantics must converge exactly to batch sessions."""
    base_us = 1_600_000_000_123_456
    ev = cache.pin(load(spark, sf, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        (F.lit(base_us)
         + (F.col("event_id") * 37 % 7200) * F.lit(1_000_000)).alias("t_us"),
    ))
    mid = base_us + 3_600_000_000
    b0 = ev.filter(F.col("t_us") < mid)
    b1 = ev.filter(F.col("t_us") >= mid)
    ticks = [
        spark.createDataFrame(
            [(-1, base_us + 10_800_000_000 + k * 1_000_000)],
            "user_id long, t_us long",
        )
        for k in (0, 1)
    ]
    cutoff = F.timestamp_micros(F.lit(base_us + 9_000_000_000))

    def stamped(df):
        # the watermark rides the timestamp column; the OPERATOR's
        # arithmetic rides the int64 µs twin (Arrow localizes
        # timestamps to the session tz — see the operator docstring)
        return df.select(
            "user_id", F.timestamp_micros("t_us").alias("tstamp"), "t_us"
        )

    def sessions(s):
        from reactivedb_spark.streaming.listen import stateful_timeout_sessions

        return stateful_timeout_sessions(
            s.withWatermark("tstamp", "1 minute")
            .filter(F.col("tstamp") < cutoff),
            "user_id", "t_us", gap_us=900_000_000,
        )

    return replay_batches(
        spark, [stamped(df) for df in (b0, b1, *ticks)],
        "user_id long, tstamp timestamp, t_us long", sessions, prefix="sto",
    )


SQL_STREAMING_TIMEOUT_SESSIONS = """
WITH e AS (
  SELECT user_id,
         1600000000123456 + ((event_id * 37) % 7200) * 1000000 AS t
  FROM events),
g AS (
  SELECT user_id, t,
         CASE WHEN lag(t) OVER w IS NULL THEN 1
              WHEN t - lag(t) OVER w > 900000000 THEN 1 ELSE 0 END AS flag
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
s AS (
  SELECT user_id, t,
         SUM(flag) OVER (PARTITION BY user_id ORDER BY t
                         ROWS UNBOUNDED PRECEDING) AS sid
  FROM g)
SELECT user_id,
       CAST(min(t) AS BIGINT) AS session_start_us,
       CAST(max(t) AS BIGINT) AS session_end_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sid
"""


def q_streaming_aggregate(spark: SparkSession, sf: str) -> DataFrame:
    """Structured Streaming in the correctness gate: replay the events
    table as 3 micro-batches through the reactive engine
    (file source → foreachBatch → DAG propagation) and return the
    aggregation-derived table. The oracle is a plain SQL GROUP BY — the
    streaming path must converge to exactly the batch answer
    (micro-batch boundaries must not change sums/counts)."""
    import os
    import tempfile

    from reactivedb_spark.engine import Engine
    from reactivedb_spark.sources import stream_parquet_dir
    from reactivedb_spark.streaming import stream_into

    cfg = {
        "tables": [
            {"Source": {"name": "events", "columns": {
                "event_id": "Integer", "user_id": "Integer", "vdec": "Decimal"}}},
            {"Derived": {"name": "per_user",
                         "transform_definition": {"AggregationTransform": {
                             "source_table": "events",
                             "aggregated_column": "user_id",
                             "functions": ["n ~ memo.n + 1",
                                           "total ~ memo.total + vdec"]}}}},
        ]
    }
    root = tempfile.mkdtemp(prefix="rdb_stream_q_")
    eng = Engine(spark, cfg, workspace=os.path.join(root, "ws"))
    ev = load(spark, sf, "events").select(
        "event_id", "user_id",
        F.col("value").cast("decimal(18,6)").cast("decimal(38,18)").alias("vdec"),
    )
    src = os.path.join(root, "in")
    # one write job → 3 round-robin files → 3 micro-batches (batch
    # composition doesn't matter: the result must be batch-invariant)
    ev.repartition(3).write.mode("append").parquet(src)
    # NOT wrapped in streaming_shuffle: this replay is compute-bound
    # (foreachBatch runs full engine commits over 50k-row batches), so
    # narrowing the shuffle hurts; the state-store-bound replays
    # (dedup/join/sessionize/stateful) are the ones that benefit.
    q = stream_into(eng, "events", stream_parquet_dir(spark, src, ev.schema),
                    checkpoint_dir=os.path.join(root, "ckpt"),
                    trigger_once=True)  # availableNow: drain and stop
    try:
        q.awaitTermination()
    finally:
        dump_stream_progress(q, "streaming_aggregate")
        q.stop()
        release_stream_state(spark)
    return eng.table("per_user").select(
        F.col("aggregatedColumn").alias("user_id"), "n",
        F.col("total").cast("double").alias("total"),
    )


SQL_STREAMING_AGGREGATE = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n,
       -- keep the oracle decimal at scale 6: DuckDB's decimal->double at scale 18
       -- goes through an int128 > 2^53 and double-rounds (1 ulp off); at scale 6 the
       -- int64 mantissa is exact and the cast is correctly rounded like Spark's.
       CAST(CAST(sum(CAST("value" AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total
FROM events GROUP BY user_id
"""


def q_streaming_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Native Structured Streaming session windows: replay events as a
    file stream and sessionize per user with ``F.session_window`` (30-min
    gap) — the streaming twin of the batch `sessionize` query. The
    oracle recomputes the same sessions with a batch lag/cumsum in
    DuckDB: a session splits when the gap is >= the timeout (session
    windows are half-open [start, last + gap)), so micro-batch
    boundaries must not change the answer.

    Timestamps go through exact integer µs (timestamp_micros(ns div
    1000)) so both engines bucket identical values.

    Runs under the ROCKSDB state store (round 7): session state is one
    row per (user, session) — key-proportional, the suite's largest
    state-row count (95k at sf0.1) — at 58 → 14.3 MB state for ~1.1-1.3x
    wall in the A/B (PLANS.md round-7)."""
    import os
    import tempfile
    import uuid

    from reactivedb_spark.sources import stream_parquet_dir

    ev = load(spark, sf, "events").select(
        "event_id", "user_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("tstamp"),
    )
    root = tempfile.mkdtemp(prefix="rdb_sess_q_")
    src = os.path.join(root, "in")
    ev.repartition(3).write.mode("append").parquet(src)
    name = "sess_" + uuid.uuid4().hex[:8]
    sessions = (
        # The watermark must exceed the replay's disorder: round-robin
        # files make every micro-batch span the whole fixture time range,
        # so anything short drops "late" events and the answer stops
        # being batch-composition-invariant. Production sets this to the
        # real lateness bound; the correctness replay sets it past the
        # data's span so nothing is dropped.
        stream_parquet_dir(spark, src, ev.schema)
        .withWatermark("tstamp", "3650 days")
        .groupBy(F.session_window("tstamp", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    with streaming_shuffle(spark), rocksdb_state(spark):
        q = (
            sessions.writeStream.format("memory").queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            dump_stream_progress(q, "streaming_sessionize")
            q.stop()
            release_stream_state(spark)
    return spark.table(name).select(
        "user_id",
        F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
        F.col("n_events").cast("long").alias("n_events"),
    )


SQL_STREAMING_SESSIONIZE = """
WITH o AS (SELECT user_id, epoch_ns(ts) // 1000 AS tus FROM events),
g AS (
  SELECT user_id, tus,
         CASE WHEN lag(tus) OVER w IS NULL THEN 1
              WHEN tus - lag(tus) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
s AS (
  SELECT user_id, tus,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY tus
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM g)
SELECT user_id, CAST(min(tus) AS BIGINT) AS session_start_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sid
"""


def q_streaming_late_data(spark: SparkSession, sf: str) -> DataFrame:
    """Event-time watermark with REAL late-data dropping (VERDICT r5 #6
    — the one operator class the streaming family didn't cover): a
    tumbling 1-hour windowed aggregation in APPEND mode under
    ``withWatermark("tstamp", "1 hour")``, replayed as four explicitly
    controlled micro-batches (maxFilesPerTrigger=1, files mtime-ordered)
    so the lateness rule is deterministic and the oracle can replay it:

    - batch 0: on-time rows (event_id % 4 != 3) — establishes the
      watermark WM1 = max(batch-0 event time) - 1h;
    - batch 1: a single max-neutral tick row (user_id = -1, at BASE):
      Spark's LATE-ROW FILTER runs one batch behind the official
      watermark (measured on 4.1: a late row in batch N is filtered
      with the watermark derived from data through batch N-2), so the
      tick burns that lag batch; because it does not raise the max
      event time, the filter watermark the held-back rows meet is
      exactly WM1 under either lag convention;
    - batch 2: the held-back rows, half shifted 1.5h earlier — Spark
      drops exactly those whose WINDOW END <= WM1 (window-end predicate,
      WatermarkSupport.watermarkExpression) and aggregates the rest,
      late-but-window-alive rows included;
    - batch 3: a far-future flush row (user_id = -1, +30d) that
      advances the watermark past every real window; availableNow then
      runs one final EMPTY finalization batch (measured on 4.1) whose
      eviction emits them all in append mode. The tick/flush rows' own
      groups are filtered out by user_id >= 0.

    Determinism engineering: event times are synthesized with integer
    arithmetic (BASE + (event_id*37 % 7200) s) where BASE carries a
    123456 us sub-second offset, so no hour-aligned window end can ever
    tie with the watermark — the <= vs < boundary and Spark's ms-level
    watermark truncation are both unobservable. The oracle applies the
    identical rule: drop batch-2 rows with window_end <= max(batch-1
    time) - 1h, then GROUP BY window, user. Replay mechanics (mtime
    batch order, single-file triggers) live in
    :func:`suite._common.replay_batches`."""
    base_us = 1_600_000_000_123_456
    day_us = 86_400_000_000
    ev = cache.pin(load(spark, sf, "events").select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        (F.lit(base_us)
         + (F.col("event_id") * 37 % 7200) * F.lit(1_000_000)).alias("t_us"),
    ))
    b1 = ev.filter(F.col("event_id") % 4 != 3)
    b2 = ev.filter(F.col("event_id") % 4 == 3).select(
        "event_id", "user_id",
        F.when(F.col("event_id") % 8 == 3,
               F.col("t_us") - F.lit(5_400_000_000))
        .otherwise(F.col("t_us")).alias("t_us"),
    )
    tick = spark.createDataFrame(
        [(0, -1, base_us)], "event_id long, user_id long, t_us long"
    )
    flush = spark.createDataFrame(
        [(0, -1, base_us + 30 * day_us)],
        "event_id long, user_id long, t_us long",
    )

    def stamped(df):
        return df.select(
            "event_id", "user_id", F.timestamp_micros("t_us").alias("tstamp")
        )

    def agg(stream):
        return (
            stream.withWatermark("tstamp", "1 hour")
            .groupBy(F.window("tstamp", "1 hour"), "user_id")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum("event_id").cast("long").alias("sum_eid"),
            )
        )

    out = replay_batches(
        spark, [stamped(df) for df in (b1, tick, b2, flush)],
        "event_id long, user_id long, tstamp timestamp", agg, prefix="late",
    )
    return out.filter(F.col("user_id") >= 0).select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "user_id", "n", "sum_eid",
    )


def q_streaming_dedup_watermark(spark: SparkSession, sf: str) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` — the BOUNDED-STATE streaming
    dedup (the production configuration at 100 TB: plain
    ``dropDuplicates`` keys state forever; within-watermark dedup
    evicts keys once the watermark passes event_time + delay, trading
    a bounded duplicate-window guarantee for O(watermark) state).

    The replay makes both sides of the guarantee deterministic and
    oracle-checkable (same mtime-ordered file trick as
    ``streaming_late_data``):

    - batch 0: every event once (t0 in a 30-min span) — all emitted;
    - batches 1-2: clock rows at BASE+3h (two, so the one-batch lag in
      both the eviction and late-filter watermarks is burned): every
      batch-0 key's state (expiry t0 + 10 min) is evicted;
    - batch 3: duplicates of event_id % 5 == 0 at fresh event times
      ≥ BASE+3h — NOT late, and their prior state is gone, so the
      within-watermark contract re-emits every one of them.

    Oracle: events UNION ALL the %5 subset at the shifted times —
    exactly one duplicate re-emission per expired key, zero for live
    keys. Clock rows (event_id < 0) are filtered from the result."""
    base_us = 1_600_000_000_123_456
    ev = cache.pin(load(spark, sf, "events").select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        (F.lit(base_us)
         + (F.col("event_id") * 13 % 1800) * F.lit(1_000_000)).alias("t_us"),
    ))
    dup = ev.filter(F.col("event_id") % 5 == 0).select(
        "event_id", "user_id",
        (F.lit(base_us + 10_800_000_000)
         + (F.col("event_id") % 600) * F.lit(1_000_000)).alias("t_us"),
    )
    clocks = [
        spark.createDataFrame(
            [(-k, -1, base_us + 10_800_000_000 + (k - 1) * 1_000_000)],
            "event_id long, user_id long, t_us long",
        )
        for k in (1, 2)
    ]

    def stamped(df):
        return df.select(
            "event_id", "user_id", F.timestamp_micros("t_us").alias("tstamp")
        )

    out = replay_batches(
        spark, [stamped(df) for df in (ev, clocks[0], clocks[1], dup)],
        "event_id long, user_id long, tstamp timestamp",
        lambda s: s.withWatermark("tstamp", "10 minutes")
                   .dropDuplicatesWithinWatermark(["event_id"]),
        prefix="ddw",
    )
    return out.filter(F.col("event_id") >= 0).select(
        "event_id", "user_id", F.unix_micros("tstamp").alias("t_us")
    )


SQL_STREAMING_DEDUP_WATERMARK = """
WITH ev AS (
  SELECT event_id, user_id,
         1600000000123456 + ((event_id * 13) % 1800) * 1000000 AS t_us
  FROM events),
dup AS (
  SELECT event_id, user_id,
         1600000000123456 + 10800000000 + (event_id % 600) * 1000000 AS t_us
  FROM events WHERE event_id % 5 = 0)
SELECT event_id, user_id, t_us FROM ev
UNION ALL
SELECT event_id, user_id, t_us FROM dup
"""


SQL_STREAMING_LATE_DATA = """
WITH ev AS (
  SELECT event_id, user_id,
         1600000000123456 + ((event_id * 37) % 7200) * 1000000 AS t
  FROM events),
b1 AS (SELECT * FROM ev WHERE event_id % 4 <> 3),
b2 AS (
  SELECT event_id, user_id,
         CASE WHEN event_id % 8 = 3 THEN t - 5400000000 ELSE t END AS t
  FROM ev WHERE event_id % 4 = 3),
wm1 AS (SELECT max(t) - 3600000000 AS w FROM b1),
kept2 AS (
  SELECT * FROM b2
  WHERE ((t // 3600000000) + 1) * 3600000000 > (SELECT w FROM wm1)),
allr AS (SELECT * FROM b1 UNION ALL SELECT * FROM kept2)
SELECT (t // 3600000000) * 3600000000 AS window_start_us, user_id,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(event_id) AS BIGINT) AS sum_eid
FROM allr GROUP BY 1, 2
"""


def q_streaming_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join with watermark-driven
    null emission — the operator class the inner `streaming_stream_join`
    cannot show: an unmatched purchase may only emit its NULL row once
    the view-side watermark proves no matching view can still arrive.

    Replay (same deterministic mtime-batch mechanics as
    `streaming_late_data`): both sides ride ONE tagged file stream and
    split into two watermarked branches (Spark supports streaming
    self-joins; `multipleWatermarkPolicy=min` governs the pair) —

    - batch 0: every purchase and view at synthesized integer times
      BASE + (event_id·37 % 7200) s, join window = views in the 10 min
      at-or-before the purchase;
    - batches 1-3: one tick per SIDE at BASE+3h (ticks carry
      event_id −1 and are filtered out of the join inputs AFTER the
      watermark node, so they advance both watermarks without joining).
      THREE tick batches, not two: outer-join state eviction in batch N
      uses the watermark derived from data through batch N−2 (measured
      on 4.1 — with only two ticks, exactly the purchases in the last
      `delay` of the data span never flushed, and the availableNow
      finalization batch does NOT run outer eviction), so the last tick
      evicts with a watermark already past the whole data span and every
      unmatched purchase emits its (purchase_id, NULL) row.

    The oracle is the plain batch LEFT JOIN — matched pairs must be
    identical and the null rows exactly the purchases with no view in
    window, i.e. the replay's outer semantics must converge to batch
    semantics once the watermark passes everything."""
    base_us = 1_600_000_000_123_456
    ev = cache.pin(load(spark, sf, "events").filter(
        F.col("event_type").isin("purchase", "view")
    ).select(
        F.when(F.col("event_type") == "purchase", F.lit("p"))
         .otherwise(F.lit("v")).alias("tag"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        (F.lit(base_us)
         + (F.col("event_id") * 37 % 7200) * F.lit(1_000_000)).alias("t_us"),
    ))
    ticks = [
        spark.createDataFrame(
            [("p", -1, -1, base_us + 10_800_000_000 + k * 1_000_000),
             ("v", -1, -1, base_us + 10_800_000_000 + k * 1_000_000)],
            "tag string, event_id long, user_id long, t_us long",
        )
        for k in (0, 1, 2)
    ]

    def stamped(df):
        return df.select(
            "tag", "event_id", "user_id",
            F.timestamp_micros("t_us").alias("tstamp"),
        )

    # ticks sit at BASE+3h; every data row is under BASE+2h. The tick
    # exclusion below MUST be an EVENT-TIME predicate: Catalyst pushes
    # ordinary predicates (e.g. event_id >= 0) BELOW the
    # EventTimeWatermark node (PushPredicateThroughNonJoin exempts only
    # predicates referencing the watermark column), and a pushed-down
    # tick filter means the watermark never advances past the data and
    # the last-minute purchases never flush (measured both for a
    # pre-join filter and for a post-join filter pushed through the
    # join back into the branch).
    cutoff = F.timestamp_micros(F.lit(base_us + 9_000_000_000))

    def outer(s):
        p = (
            s.filter(F.col("tag") == "p")
            .withWatermark("tstamp", "1 minute")
            .filter(F.col("tstamp") < cutoff)
            .select(F.col("event_id").alias("purchase_id"),
                    F.col("user_id").alias("p_user"),
                    F.col("tstamp").alias("p_ts"))
        )
        v = (
            s.filter(F.col("tag") == "v")
            .withWatermark("tstamp", "1 minute")
            .filter(F.col("tstamp") < cutoff)
            .select(F.col("event_id").alias("view_id"),
                    F.col("user_id").alias("v_user"),
                    F.col("tstamp").alias("v_ts"))
        )
        return p.join(
            v,
            (F.col("p_user") == F.col("v_user"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("v_ts") <= F.col("p_ts")),
            "leftOuter",
        ).select("purchase_id", "p_user", "view_id")

    return replay_batches(
        spark, [stamped(df) for df in (ev, ticks[0], ticks[1], ticks[2])],
        "tag string, event_id long, user_id long, tstamp timestamp",
        outer, prefix="soj",
    )


SQL_STREAMING_OUTER_JOIN = """
WITH e AS (
  SELECT event_id, user_id, event_type,
         1600000000123456 + ((event_id * 37) % 7200) * 1000000 AS t
  FROM events WHERE event_type IN ('purchase', 'view')),
p AS (SELECT event_id AS purchase_id, user_id, t AS pts
      FROM e WHERE event_type = 'purchase'),
v AS (SELECT event_id AS view_id, user_id, t AS vts
      FROM e WHERE event_type = 'view')
SELECT p.purchase_id, p.user_id AS p_user, v.view_id
FROM p LEFT JOIN v
  ON v.user_id = p.user_id
 AND v.vts >= p.pts - 600000000
 AND v.vts <= p.pts
"""


def q_corpus_clean(spark: SparkSession, sf: str) -> DataFrame:
    """The composed training-data cleanup (operators/corpus.py): quality
    gate → lang gate → exact dedup → LSH+Jaccard near-dup removal. The
    whole composition is oracle-checked."""
    from reactivedb_spark.operators.corpus import clean_corpus

    return clean_corpus(dedup.widen(load(spark, sf, "documents")))


_QUALITY_SQL = """
  least(CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE) / 100.0, 1.0) * 0.5
  + CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE)
    / CAST(length(text) AS DOUBLE) * 0.5
"""

SQL_CORPUS_CLEAN = (
    "WITH scored AS (SELECT doc_id, text, "
    + _QUALITY_SQL
    + " AS quality, "
    + ", ".join(f"{_lang_score_sql(lang)} AS s_{lang}" for lang in LANG_ORDER)
    + " FROM documents), "
    + "langed AS (SELECT doc_id, text, quality, "
    + _lang_case_sql()
    + " AS pred_lang FROM scored), "
    + "gated AS (SELECT * FROM langed WHERE quality >= 0.5 AND pred_lang IN ('en')), "
    + "reps AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(lower(trim(text)))), "
    + "exact AS (SELECT g.* FROM gated g JOIN reps r ON r.doc_id = g.doc_id), "
    + _tok_cte("exact")
    + ", " + _SIG_CTE + ", " + _BANDED_CTE + ", " + _PAIRS_CTE + """,
sets AS (
  SELECT doc_id, list(DISTINCT token) AS toks,
         CAST(count(DISTINCT token) AS BIGINT) AS n_tok
  FROM tok GROUP BY doc_id),
jac AS (
  SELECT p.doc_a, p.doc_b,
         CAST(len(list_intersect(sa.toks, sb.toks)) AS BIGINT) AS n_inter,
         sa.n_tok AS n_a, sb.n_tok AS n_b
  FROM pairs p
  JOIN sets sa ON sa.doc_id = p.doc_a
  JOIN sets sb ON sb.doc_id = p.doc_b),
losers AS (
  SELECT DISTINCT doc_b FROM jac
  WHERE n_inter > 0
    AND CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE) >= 0.8)
SELECT doc_id, text, quality, pred_lang FROM exact
WHERE doc_id NOT IN (SELECT doc_b FROM losers)
"""
)


def q_corpus_clean_cc(spark: SparkSession, sf: str) -> DataFrame:
    """corpus_clean with TRANSITIVE near-dup clustering (VERDICT r7 #6):
    the keep-first rule under-merges chains a~b~c when a~c is below
    threshold; cluster=True runs connected components over the verified
    pair graph and keeps exactly the min-id doc per component. Oracle:
    the same composed pipeline with a recursive reachability CTE in
    place of the keep-first losers."""
    from reactivedb_spark.operators.corpus import clean_corpus

    return clean_corpus(dedup.widen(load(spark, sf, "documents")), cluster=True)


SQL_CORPUS_CLEAN_CC = (
    "WITH RECURSIVE scored AS (SELECT doc_id, text, "
    + _QUALITY_SQL
    + " AS quality, "
    + ", ".join(f"{_lang_score_sql(lang)} AS s_{lang}" for lang in LANG_ORDER)
    + " FROM documents), "
    + "langed AS (SELECT doc_id, text, quality, "
    + _lang_case_sql()
    + " AS pred_lang FROM scored), "
    + "gated AS (SELECT * FROM langed WHERE quality >= 0.5 AND pred_lang IN ('en')), "
    + "reps AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(lower(trim(text)))), "
    + "exact AS (SELECT g.* FROM gated g JOIN reps r ON r.doc_id = g.doc_id), "
    + _tok_cte("exact")
    + ", " + _SIG_CTE + ", " + _BANDED_CTE + ", " + _PAIRS_CTE + """,
sets AS (
  SELECT doc_id, list(DISTINCT token) AS toks,
         CAST(count(DISTINCT token) AS BIGINT) AS n_tok
  FROM tok GROUP BY doc_id),
jac AS (
  SELECT p.doc_a, p.doc_b,
         CAST(len(list_intersect(sa.toks, sb.toks)) AS BIGINT) AS n_inter,
         sa.n_tok AS n_a, sb.n_tok AS n_b
  FROM pairs p
  JOIN sets sa ON sa.doc_id = p.doc_a
  JOIN sets sb ON sb.doc_id = p.doc_b),
cedges AS (
  SELECT doc_a, doc_b FROM jac
  WHERE n_inter > 0
    AND CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE) >= 0.8),
sym AS (SELECT doc_a AS s, doc_b AS d FROM cedges
        UNION SELECT doc_b, doc_a FROM cedges),
reach AS (
  SELECT s AS doc, s AS r FROM sym
  UNION
  SELECT y.d AS doc, re.r FROM reach re JOIN sym y ON y.s = re.doc),
losers AS (
  SELECT doc AS doc_id FROM reach GROUP BY doc HAVING min(r) < doc)
SELECT doc_id, text, quality, pred_lang FROM exact
WHERE doc_id NOT IN (SELECT doc_id FROM losers)
"""
)




def q_chunk_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-size token chunking with overlap (operators/packing.py:
    chunk_tokens): each document's token stream split into 64-token
    windows with 16-token overlap — the context-window preprocessing
    step of a training pipeline. Pure column expressions (split +
    sequence explode + slice), no UDF and no shuffle; the oracle
    replays the identical chunk-count/slice arithmetic over the same
    whitespace tokens."""
    from reactivedb_spark.operators.packing import chunk_tokens

    return chunk_tokens(
        load(spark, sf, "documents"), "doc_id", "text",
        chunk_size=64, overlap=16,
    )


SQL_CHUNK_WINDOWS = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS t
  FROM documents),
d AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
c AS (
  SELECT doc_id, t, n,
         greatest(CAST(ceil((n - 16) / 48.0) AS INT), 1) AS nc
  FROM d),
e AS (
  SELECT doc_id, t, g.i AS chunk_no
  FROM c CROSS JOIN generate_series(0, 1023) g(i) WHERE g.i < nc),
s AS (
  SELECT doc_id, chunk_no,
         list_slice(t, chunk_no * 48 + 1, chunk_no * 48 + 64) AS chunk
  FROM e)
SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no,
       CAST(len(chunk) AS BIGINT) AS n_tokens,
       array_to_string(chunk, ' ') AS chunk_text
FROM s
"""




def q_source_orc(spark: SparkSession, sf: str) -> DataFrame:
    """ORC source round-trip (the columnar alternative Spark bundles):
    orders written to ORC and read back with an explicit schema, then
    aggregated. Unlike the CSV connector, ORC carries decimals/doubles
    losslessly, so the round-trip includes o_totalprice — the oracle
    aggregates the parquet original and every value must survive the
    format hop bit-exactly."""
    import os as _os
    import tempfile as _tempfile

    from reactivedb_spark.sources.readers import read_table

    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    path = _os.path.join(_tempfile.mkdtemp(prefix="rdb_orc_"), "orders")
    o.write.mode("overwrite").orc(path)
    back = read_table(spark, path, fmt="orc", schema=o.schema)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)").cast("double").alias("revenue"),
    )


SQL_SOURCE_ORC = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS revenue
FROM orders GROUP BY o_orderstatus
"""




def q_embedding_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-space near-dup CLUSTERS: connected components over the
    cosine ≥ 0.3 pair graph (the fixture embeddings are near-orthogonal random vectors — production embeddings cluster much tighter and use ≥ 0.95+) — operator composition (LSH buckets →
    array-native verify → star CC), the image/audio analogue of
    ``dedup_clusters``. Oracle: recursive reachability CTE over the
    identical fixed-point pair algebra."""
    from reactivedb_spark.operators.graph import connected_components_star

    pairs = similarity.cosine_pairs(
        dedup.widen(load(spark, sf, "embeddings")), "vec_id", "embedding"
    ).filter(F.col("cos_sim") >= 0.3).select("doc_a", "doc_b")
    return connected_components_star(pairs).select(
        F.col("node").alias("vec_id"), F.col("cluster").cast("long").alias("cluster")
    )


SQL_EMBEDDING_CLUSTERS = (
    "WITH RECURSIVE " + _ELEM_CTE + ", " + _BUCKETS_CTE + """,
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
edges AS (
  SELECT d.doc_a, d.doc_b
  FROM dotp d
  JOIN n2 na ON na.vec_id = d.doc_a
  JOIN n2 nb ON nb.vec_id = d.doc_b
  WHERE round((CAST(d.dot AS DOUBLE) / 1e16)
              / (sqrt(CAST(na.n2 AS DOUBLE) / 1e16)
                 * sqrt(CAST(nb.n2 AS DOUBLE) / 1e16)), 9) >= 0.3),
sym AS (SELECT doc_a AS s, doc_b AS d FROM edges
        UNION SELECT doc_b, doc_a FROM edges),
reach AS (
  SELECT s AS v, s AS r FROM sym
  UNION
  SELECT y.d AS v, re.r FROM reach re JOIN sym y ON y.s = re.v)
SELECT v AS vec_id, CAST(min(r) AS BIGINT) AS cluster
FROM reach GROUP BY v
"""
)


def q_embedding_clusters_banded(spark: SparkSession, sf: str) -> DataFrame:
    """Production config of embedding near-dup CLUSTERS: star-contraction
    CC over the BANDED cosine >= 0.3 pair graph (see
    ``embedding_near_dups_banded`` — candidates <= n·64 by construction,
    worst-case linear; identical to the research twin while buckets hold
    <= 65 vectors). Note the cluster IDs themselves stay exact whenever
    the band covers each bucket, and degrade to a band-connected
    APPROXIMATION of transitive closure beyond — declared, replayed
    identically by the oracle."""
    from reactivedb_spark.operators.graph import connected_components_star

    pairs = similarity.banded_pairs(
        dedup.widen(load(spark, sf, "embeddings")), "vec_id", "embedding",
        band=64,
    ).filter(F.col("cos_sim") >= 0.3).select("doc_a", "doc_b")
    return connected_components_star(pairs).select(
        F.col("node").alias("vec_id"), F.col("cluster").cast("long").alias("cluster")
    )


SQL_EMBEDDING_CLUSTERS_BANDED = (
    "WITH RECURSIVE " + _ELEM_CTE + ", " + _BUCKETS_CTE + ", "
    + _BANDED_CAND_CTE + """,
n2 AS (SELECT vec_id, SUM(xl * xl) AS n2 FROM elem GROUP BY vec_id),
dotp AS (
  SELECT c.doc_a, c.doc_b, SUM(ea.xl * eb.xl) AS dot
  FROM cand c
  JOIN elem ea ON ea.vec_id = c.doc_a
  JOIN elem eb ON eb.vec_id = c.doc_b AND eb.j = ea.j
  GROUP BY c.doc_a, c.doc_b),
edges AS (
  SELECT d.doc_a, d.doc_b
  FROM dotp d
  JOIN n2 na ON na.vec_id = d.doc_a
  JOIN n2 nb ON nb.vec_id = d.doc_b
  WHERE round((CAST(d.dot AS DOUBLE) / 1e16)
              / (sqrt(CAST(na.n2 AS DOUBLE) / 1e16)
                 * sqrt(CAST(nb.n2 AS DOUBLE) / 1e16)), 9) >= 0.3),
sym AS (SELECT doc_a AS s, doc_b AS d FROM edges
        UNION SELECT doc_b, doc_a FROM edges),
reach AS (
  SELECT s AS v, s AS r FROM sym
  UNION
  SELECT y.d AS v, re.r FROM reach re JOIN sym y ON y.s = re.v)
SELECT v AS vec_id, CAST(min(r) AS BIGINT) AS cluster
FROM reach GROUP BY v
"""
)




def q_dedup_transform(spark: SparkSession, sf: str) -> DataFrame:
    """Config-level DedupTransform end-to-end (SURVEY.md §7 phase 6 —
    extension operators in the reference's YAML surface): documents
    inserted through the reactive engine in doc_id order; the derived
    table keeps the FIRST writer per normalized body. Determinism:
    ``insert_df(order_by=["doc_id"])`` assigns ``_seq`` ascending in
    doc_id order without a driver round-trip, so the representative is
    exactly min(doc_id) per key — which is the oracle's GROUP BY."""
    import tempfile as _tempfile

    from reactivedb_spark.engine import Engine

    cfg = {"tables": [
        {"Source": {"name": "documents", "columns": {
            "doc_id": "Integer", "body": "Str"}}},
        {"Derived": {"name": "unique_docs",
                     "transform_definition": {"DedupTransform": {
                         "source_table": "documents", "key": "body"}}}},
    ]}
    eng = Engine(spark, cfg, workspace=_tempfile.mkdtemp(prefix="rdb_ddtq_"))
    docs = load(spark, sf, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").alias("body"),
    )
    eng.insert_df("documents", docs, order_by=["doc_id"])
    return eng.table("unique_docs").select(
        "dedupKey", F.col("doc_id").cast("long").alias("doc_id")
    )


SQL_DEDUP_TRANSFORM = """
SELECT md5(lower(trim(text))) AS dedupKey,
       CAST(min(doc_id) AS BIGINT) AS doc_id
FROM documents GROUP BY 1
"""


def q_distinct_transform(spark: SparkSession, sf: str) -> DataFrame:
    """Config-level DistinctTransform end-to-end (extension transform
    #6, operators/distinct_transform.py): the distinct live
    (user_id, event_type) tuples of the events table, maintained
    reactively across TWO bulk insert waves (even event_ids, then odd —
    the second wave exercises refcount-silent re-arrivals and late
    births) and ONE delete wave (every event of min(user_id): since the
    tuple includes user_id, each of that user's tuples must die exactly
    when its count drains to zero, touching nothing else and never
    reading the parent). The oracle is plain DISTINCT over the
    surviving rows."""
    import tempfile as _tempfile

    from reactivedb_spark.engine import Engine

    cfg = {"tables": [
        {"Source": {"name": "ev", "columns": {
            "uid": "Integer", "etype": "Str", "eid": "Integer"}}},
        {"Derived": {"name": "pairs",
                     "transform_definition": {"DistinctTransform": {
                         "source_table": "ev", "columns": ["uid", "etype"]}}}},
    ]}
    eng = Engine(spark, cfg, workspace=_tempfile.mkdtemp(prefix="rdb_dstq_"))
    ev = load(spark, sf, "events").select(
        F.col("user_id").cast("long").alias("uid"),
        F.col("event_type").alias("etype"),
        F.col("event_id").cast("long").alias("eid"),
    )
    for wave in (0, 1):
        eng.insert_df("ev", ev.filter(F.col("eid") % 2 == wave),
                      order_by=["eid"])
    min_uid = ev.agg(F.min("uid")).first()[0]
    eng.delete("ev", "uid", int(min_uid))
    return eng.table("pairs").select("uid", "etype")


SQL_DISTINCT_TRANSFORM = """
SELECT DISTINCT CAST(user_id AS BIGINT) AS uid, event_type AS etype
FROM events
WHERE user_id <> (SELECT min(user_id) FROM events)
"""




def q_join_transform(spark: SparkSession, sf: str) -> DataFrame:
    """Config-level JoinTransform end-to-end (round-7 extension — the
    reference's only multi-parent operator is the LWW UnionTransform;
    this is the incrementally maintained INNER equi-join,
    operators/join_transform.py). Customers bulk-insert first (the
    derived join stays empty — no left rows), then orders: the orders
    delta joins the committed customer state in ONE AQE-sized equi-join
    (Δ(L⋈R) decomposition; ancestor-disjoint parents enforced at build
    time). The oracle is the plain SQL inner join — the reactive path
    must converge to it exactly. Integer/string columns only: zero FP
    surface."""
    import tempfile as _tempfile

    from reactivedb_spark.engine import Engine

    cfg = {"tables": [
        {"Source": {"name": "ord", "columns": {
            "okey": "Integer", "ckey": "Integer",
            "opriority": "Str"}}},
        {"Source": {"name": "cust", "columns": {
            "cust_id": "Integer", "cseg": "Str"}}},
        {"Derived": {"name": "joined", "transform_definition": {
            "JoinTransform": {"left_table": "ord", "right_table": "cust",
                              "left_on": "ckey", "right_on": "cust_id"}}}},
    ]}
    eng = Engine(spark, cfg, workspace=_tempfile.mkdtemp(prefix="rdb_jtq_"))
    eng.insert_df("cust", load(spark, sf, "customer").select(
        F.col("c_custkey").cast("long").alias("cust_id"),
        F.col("c_mktsegment").alias("cseg"),
    ))
    eng.insert_df("ord", load(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long").alias("okey"),
        F.col("o_custkey").cast("long").alias("ckey"),
        F.col("o_orderpriority").alias("opriority"),
    ))
    return eng.table("joined").select(
        F.col("okey").cast("long").alias("okey"),
        F.col("ckey").cast("long").alias("ckey"),
        "opriority", "cseg",
    )


SQL_JOIN_TRANSFORM = """
SELECT CAST(o.o_orderkey AS BIGINT) AS okey,
       CAST(o.o_custkey AS BIGINT) AS ckey,
       o.o_orderpriority AS opriority,
       c.c_mktsegment AS cseg
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
"""


def q_join_transform_diamond(spark: SparkSession, sf: str) -> DataFrame:
    """Shared-ancestry diamond through the wave-aware join
    (Engine._apply_join_wave): ONE source table (orders) feeds BOTH join
    parents — urgent orders on the left, low-priority on the right,
    each renamed through a FunctionTransform below a FilterTransform —
    so every insert_df commit delivers deltas to both parents in the
    SAME propagation wave and the ΔL×ΔR pairs must be counted exactly
    once (the regime the old build-time ancestor-disjoint rejection
    forbade). Two commit waves: even orderkeys then odd, so the second
    wave exercises all three pair regimes (ΔL×R_old, L_old×ΔR, ΔL×ΔR).
    Oracle: the plain per-customer urgent×low pair join. Integer/string
    columns only: zero FP surface."""
    import tempfile as _tempfile

    from reactivedb_spark.engine import Engine

    cfg = {"tables": [
        {"Source": {"name": "ord", "columns": {
            "okey": "Integer", "ckey": "Integer", "opriority": "Str"}}},
        {"Derived": {"name": "urgent", "transform_definition": {
            "FilterTransform": {"source_table": "ord",
                                "filter": 'opriority == "1-URGENT"'}}}},
        {"Derived": {"name": "lrn", "transform_definition": {
            "FunctionTransform": {"source_table": "urgent",
                                  "functions": ["k1 ~ ckey", "lkey ~ okey"]}}}},
        {"Derived": {"name": "low", "transform_definition": {
            "FilterTransform": {"source_table": "ord",
                                "filter": 'opriority == "5-LOW"'}}}},
        {"Derived": {"name": "rrn", "transform_definition": {
            "FunctionTransform": {"source_table": "low",
                                  "functions": ["k2 ~ ckey", "rkey ~ okey"]}}}},
        {"Derived": {"name": "pairs", "transform_definition": {
            "JoinTransform": {"left_table": "lrn", "right_table": "rrn",
                              "left_on": "k1", "right_on": "k2"}}}},
    ]}
    eng = Engine(spark, cfg, workspace=_tempfile.mkdtemp(prefix="rdb_jtd_"))
    src = load(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long").alias("okey"),
        F.col("o_custkey").cast("long").alias("ckey"),
        F.col("o_orderpriority").alias("opriority"),
    )
    eng.insert_df("ord", src.filter(F.col("okey") % 2 == 0))
    eng.insert_df("ord", src.filter(F.col("okey") % 2 == 1))
    return eng.table("pairs").select(
        F.col("k1").cast("long").alias("ckey"),
        F.col("lkey").cast("long").alias("urgent_okey"),
        F.col("rkey").cast("long").alias("low_okey"),
    )


SQL_JOIN_TRANSFORM_DIAMOND = """
SELECT CAST(l.o_custkey AS BIGINT) AS ckey,
       CAST(l.o_orderkey AS BIGINT) AS urgent_okey,
       CAST(r.o_orderkey AS BIGINT) AS low_okey
FROM orders l JOIN orders r ON l.o_custkey = r.o_custkey
WHERE l.o_orderpriority = '1-URGENT' AND r.o_orderpriority = '5-LOW'
"""


def q_sample_transform(spark: SparkSession, sf: str) -> DataFrame:
    """Config-level SampleTransform end-to-end (extension transform #2):
    documents through the reactive engine into a 25% hash-sampled
    derived table — the oracle applies the identical md5 gate, so the
    engine-maintained sample must equal the declarative one row for
    row."""
    import tempfile as _tempfile

    from reactivedb_spark.engine import Engine

    cfg = {"tables": [
        {"Source": {"name": "documents", "columns": {
            "doc_id": "Integer", "body": "Str"}}},
        {"Derived": {"name": "docs_sample",
                     "transform_definition": {"SampleTransform": {
                         "source_table": "documents", "key": "doc_id",
                         "rate_pct": 25}}}},
    ]}
    eng = Engine(spark, cfg, workspace=_tempfile.mkdtemp(prefix="rdb_stq_"))
    src = load(spark, sf, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").alias("body"),
    )
    eng.insert_df("documents", src)
    return eng.table("docs_sample").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length("body").cast("long").alias("body_len"),
    )


SQL_SAMPLE_TRANSFORM = """
SELECT doc_id, CAST(length(text) AS BIGINT) AS body_len
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 25
"""


QUERIES = {
    "streaming_aggregate": q_streaming_aggregate,
    "streaming_sessionize": q_streaming_sessionize,
    "streaming_late_data": q_streaming_late_data,
    "streaming_dedup_watermark": q_streaming_dedup_watermark,
    "streaming_outer_join": q_streaming_outer_join,
    "streaming_timeout_sessions": q_streaming_timeout_sessions,
    "corpus_clean": q_corpus_clean,
    "corpus_clean_cc": q_corpus_clean_cc,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash": q_dedup_minhash,
    "dedup_lsh_candidates": q_dedup_lsh_candidates,
    "dedup_lsh_candidates_guarded": q_dedup_lsh_candidates_guarded,
    "dedup_jaccard": q_dedup_jaccard,
    "dedup_jaccard_guarded": q_dedup_jaccard_guarded,
    "dedup_ngram_jaccard_guarded": q_dedup_ngram_jaccard_guarded,
    "dedup_clusters_guarded": q_dedup_clusters_guarded,
    "dedup_containment_exact": q_dedup_containment_exact,
    "dedup_containment_zipf": q_dedup_containment_zipf,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_clusters": q_dedup_clusters,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "similarity_topk": q_similarity_topk,
    "ann_buckets": q_ann_buckets,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_sq8_topk": q_ann_sq8_topk,
    "embedding_near_dups": q_embedding_near_dups,
    "embedding_near_dups_banded": q_embedding_near_dups_banded,
    "semantic_dedup": q_semantic_dedup,
    "lang_id": q_lang_id,
    "text_quality": q_text_quality,
    "char_entropy": q_char_entropy,
    "bpe_train": q_bpe_train,
    "bpe_train_batched": q_bpe_train_batched,
    "token_count": q_token_count,
    "token_bpe": q_token_bpe,
    "fingerprint": q_fingerprint,
    "text_repetition": q_text_repetition,
    "tfidf_top_terms": q_tfidf_top_terms,
    "top_bigrams": q_top_bigrams,
    "pack_budget": q_pack_budget,
    "decontaminate": q_decontaminate,
    "pii_scrub": q_pii_scrub,
    "sample_hash": q_sample_hash,
    "sample_stratified": q_sample_stratified,
    "graph_components_star": q_graph_components_star,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_png_decode": q_multimodal_png_decode,
    "multimodal_jpeg_decode": q_multimodal_jpeg_decode,
    "multimodal_wav_decode": q_multimodal_wav_decode,
    "wav_frame_features": q_wav_frame_features,
    "multimodal_embed": q_multimodal_embed,
    "multimodal_frames": q_multimodal_frames,
    "window_rank": q_window_rank,
    "topk_orders": q_topk_orders,
    "events_hourly": q_events_hourly,
    "sessionize": q_sessionize,
    "chunk_windows": q_chunk_windows,
    "source_orc": q_source_orc,
    "embedding_clusters": q_embedding_clusters,
    "embedding_clusters_banded": q_embedding_clusters_banded,
    "dedup_transform": q_dedup_transform,
    "distinct_transform": q_distinct_transform,
    "join_transform": q_join_transform,
    "join_transform_diamond": q_join_transform_diamond,
    "sample_transform": q_sample_transform,
}

ORACLES = {
    "streaming_aggregate": SQL_STREAMING_AGGREGATE,
    "streaming_sessionize": SQL_STREAMING_SESSIONIZE,
    "streaming_late_data": SQL_STREAMING_LATE_DATA,
    "streaming_outer_join": SQL_STREAMING_OUTER_JOIN,
    "streaming_timeout_sessions": SQL_STREAMING_TIMEOUT_SESSIONS,
    "streaming_dedup_watermark": SQL_STREAMING_DEDUP_WATERMARK,
    "corpus_clean": SQL_CORPUS_CLEAN,
    "corpus_clean_cc": SQL_CORPUS_CLEAN_CC,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_minhash": SQL_DEDUP_MINHASH,
    "dedup_lsh_candidates": SQL_DEDUP_LSH_CANDIDATES,
    "dedup_lsh_candidates_guarded": _sql_dedup_lsh_candidates_guarded(),
    "dedup_jaccard": SQL_DEDUP_JACCARD,
    "dedup_jaccard_guarded": SQL_DEDUP_JACCARD_GUARDED,
    "dedup_ngram_jaccard_guarded": SQL_DEDUP_NGRAM_JACCARD_GUARDED,
    "dedup_clusters_guarded": SQL_DEDUP_CLUSTERS_GUARDED,
    "dedup_containment_exact": SQL_DEDUP_CONTAINMENT_EXACT,
    "dedup_containment_zipf": SQL_DEDUP_CONTAINMENT_ZIPF,
    "dedup_ngram_jaccard": SQL_DEDUP_NGRAM_JACCARD,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "dedup_simhash_pairs": SQL_DEDUP_SIMHASH_PAIRS,
    "similarity_topk": SQL_SIMILARITY_TOPK,
    "ann_buckets": SQL_ANN_BUCKETS,
    "ann_ivf_topk": SQL_ANN_IVF_TOPK,
    "ann_sq8_topk": SQL_ANN_SQ8_TOPK,
    "semantic_dedup": SQL_SEMANTIC_DEDUP,
    "embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
    "embedding_near_dups_banded": SQL_EMBEDDING_NEAR_DUPS_BANDED,
    "lang_id": SQL_LANG_ID,
    "text_quality": SQL_TEXT_QUALITY,
    "char_entropy": SQL_CHAR_ENTROPY,
    "bpe_train": SQL_BPE_TRAIN,
    "bpe_train_batched": SQL_BPE_TRAIN_BATCHED,
    "token_count": SQL_TOKEN_COUNT,
    "token_bpe": SQL_TOKEN_BPE,
    "fingerprint": SQL_FINGERPRINT,
    "text_repetition": SQL_TEXT_REPETITION,
    "tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
    "top_bigrams": SQL_TOP_BIGRAMS,
    "pack_budget": SQL_PACK_BUDGET,
    "decontaminate": SQL_DECONTAMINATE,
    "pii_scrub": SQL_PII_SCRUB,
    "sample_hash": SQL_SAMPLE_HASH,
    "sample_stratified": SQL_SAMPLE_STRATIFIED,
    "graph_components_star": SQL_GRAPH_COMPONENTS_STAR,
    "multimodal_decode": SQL_MULTIMODAL_DECODE,
    "multimodal_png_decode": SQL_MULTIMODAL_PNG_DECODE,
    "multimodal_jpeg_decode": SQL_MULTIMODAL_JPEG_DECODE,
    "multimodal_wav_decode": SQL_MULTIMODAL_WAV_DECODE,
    "wav_frame_features": SQL_WAV_FRAME_FEATURES,
    "multimodal_embed": SQL_MULTIMODAL_EMBED,
    "multimodal_frames": SQL_MULTIMODAL_FRAMES,
    "window_rank": SQL_WINDOW_RANK,
    "topk_orders": SQL_TOPK_ORDERS,
    "events_hourly": SQL_EVENTS_HOURLY,
    "sessionize": SQL_SESSIONIZE,
    "chunk_windows": SQL_CHUNK_WINDOWS,
    "source_orc": SQL_SOURCE_ORC,
    "embedding_clusters": SQL_EMBEDDING_CLUSTERS,
    "embedding_clusters_banded": SQL_EMBEDDING_CLUSTERS_BANDED,
    "dedup_transform": SQL_DEDUP_TRANSFORM,
    "distinct_transform": SQL_DISTINCT_TRANSFORM,
    "join_transform": SQL_JOIN_TRANSFORM,
    "join_transform_diamond": SQL_JOIN_TRANSFORM_DIAMOND,
    "sample_transform": SQL_SAMPLE_TRANSFORM,
}


def q_topk_transform(spark: SparkSession, sf: str) -> DataFrame:
    """Config-level TopKTransform end-to-end (extension transform #5,
    operators/topk_transform.py): the 5 highest-value orders per
    priority, maintained reactively across TWO bulk commit waves (even
    orderkeys, then odd) so the second wave exercises the real
    insert-path maintenance — delta rows displace committed members and
    the evictions cascade as child deletes. Determinism: arrival order
    is (wave, orderkey) via ``insert_df(order_by=["okey"])`` per wave,
    so value ties resolve to the earliest wave then lowest key — which
    is exactly the oracle's window tie-break."""
    import tempfile as _tempfile

    from reactivedb_spark.engine import Engine

    cfg = {"tables": [
        {"Source": {"name": "ord", "columns": {
            "okey": "Integer", "opriority": "Str", "total": "Float"}}},
        {"Derived": {"name": "top_orders", "transform_definition": {
            "TopKTransform": {"source_table": "ord", "group_by": "opriority",
                              "order_by": "total", "k": 5}}}},
    ]}
    eng = Engine(spark, cfg, workspace=_tempfile.mkdtemp(prefix="rdb_tkq_"))
    orders = load(spark, sf, "orders").select(
        F.col("o_orderkey").cast("long").alias("okey"),
        F.col("o_orderpriority").alias("opriority"),
        F.col("o_totalprice").alias("total"),
    )
    for wave in (0, 1):
        eng.insert_df("ord", orders.filter(F.col("okey") % 2 == wave),
                      order_by=["okey"])
    return eng.table("top_orders").select("opriority", "okey", "total")


SQL_TOPK_TRANSFORM = """
SELECT o_orderpriority AS opriority,
       CAST(o_orderkey AS BIGINT) AS okey,
       o_totalprice AS total
FROM orders
QUALIFY row_number() OVER (
  PARTITION BY o_orderpriority
  ORDER BY o_totalprice DESC, o_orderkey % 2, o_orderkey) <= 5
"""

QUERIES["topk_transform"] = q_topk_transform
ORACLES["topk_transform"] = SQL_TOPK_TRANSFORM


def q_kmeans_iterate(spark: SparkSession, sf: str) -> DataFrame:
    """Grid-quantized Lloyd's k-means over the embeddings table
    (similarity.kmeans_assignments): 2 full update iterations + the
    final assignment, every arithmetic step exact int64 fixed-point so
    the unrolled-CTE oracle hash-matches bit-for-bit. k=8 fixed — the
    classic iterative loop; the k ∝ n rung is semantic_dedup's
    two-level quantizer."""
    from reactivedb_spark.operators.dedup import widen

    emb = widen(load(spark, sf, "embeddings"))
    return similarity.kmeans_assignments(emb, "vec_id", "embedding",
                                         k=8, iters=2)


def _sql_kmeans_iterate(k: int = 8, iters: int = 2) -> str:
    """Unrolled Lloyd's as chained CTEs — one (assign, sums, cent) trio
    per iteration, integer round-half-away-from-zero on nonnegative
    operands so `//` (floor) and Spark's `div` (trunc) agree."""
    parts = [_ELEM_CTE.strip().rstrip(")") + ")", f"""
seedmap AS (
  SELECT vec_id AS _sid,
         CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})),
cent0 AS (
  SELECT s.cluster, e.j, e.xl AS cl
  FROM elem e JOIN seedmap s ON e.vec_id = s._sid)"""]
    for i in range(1, iters + 1):
        parts.append(f"""
a{i} AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
    FROM (SELECT e.vec_id, c.cluster,
                 SUM((e.xl - c.cl) * (e.xl - c.cl)) AS d2
          FROM elem e JOIN cent{i-1} c ON e.j = c.j
          GROUP BY e.vec_id, c.cluster))
  WHERE rn = 1),
sums{i} AS (
  SELECT a.cluster, e.j, SUM(e.xl) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM a{i} a JOIN elem e ON a.vec_id = e.vec_id
  GROUP BY a.cluster, e.j),
cent{i} AS (
  SELECT c.cluster, c.j,
         COALESCE(CASE WHEN s.s >= 0 THEN (s.s + (s.n // 2)) // s.n
                       ELSE -(((-s.s) + (s.n // 2)) // s.n) END,
                  c.cl) AS cl
  FROM cent{i-1} c LEFT JOIN sums{i} s
    ON c.cluster = s.cluster AND c.j = s.j)""")
    return ("WITH " + ",".join(parts) + f"""
SELECT vec_id, cluster, CAST(d2 AS BIGINT) AS d2 FROM (
  SELECT vec_id, cluster, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
  FROM (SELECT e.vec_id, c.cluster,
               SUM((e.xl - c.cl) * (e.xl - c.cl)) AS d2
        FROM elem e JOIN cent{iters} c ON e.j = c.j
        GROUP BY e.vec_id, c.cluster))
WHERE rn = 1
""")


QUERIES["kmeans_iterate"] = q_kmeans_iterate
ORACLES["kmeans_iterate"] = _sql_kmeans_iterate()


def q_bpe_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Train-then-apply BPE (operators/bpe.bpe_encode): the corpus is
    tokenized with the 6 merges learned from itself — per-doc symbol
    counts after the replace chain. The encode runs over the
    DISTINCT-word relation (vocabulary-sized) and joins back to the
    (doc, word) occurrences; docs with no tokens carry no row."""
    from reactivedb_spark.operators.bpe import bpe_encode

    return bpe_encode(load(spark, sf, "documents"), "doc_id", "text",
                      merges=6, passes=6)


def _bpe_encode_sql(merges: int = 6, passes: int = 6) -> str:
    """Train CTEs from _bpe_train_sql, plus a WORD-KEYED merge chain
    (m0..mN applies the same replace rounds to the distinct-word
    relation, keeping the word as the join key) and the per-doc sum."""
    train = _bpe_train_sql(merges, passes)
    ctes = train.split("WITH ", 1)[1].rsplit(")\n", 1)[0] + ")"
    m = ["""m0 AS MATERIALIZED (
  SELECT w, ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS s
  FROM (SELECT DISTINCT unnest(string_split(lower(trim(text)), ' ')) AS w
        FROM documents)
  WHERE w <> '')"""]
    for r in range(merges):
        rep = "s"
        for _ in range(passes):
            rep = (
                f"replace({rep}, ' ' || (SELECT l FROM b{r}) || ' ' || "
                f"(SELECT r2 FROM b{r}) || ' ', ' ' || (SELECT l FROM b{r}) || "
                f"(SELECT r2 FROM b{r}) || ' ')"
            )
        m.append(f"m{r + 1} AS MATERIALIZED (SELECT w, {rep} AS s FROM m{r})")
    return (
        "WITH " + ctes + ",\n" + ",\n".join(m) + f"""
SELECT d.doc_id,
       CAST(sum(len(string_split(trim(m.s), ' '))) AS BIGINT) AS n_tokens
FROM (SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS w
      FROM documents) d
JOIN m{merges} m ON d.w = m.w
WHERE d.w <> ''
GROUP BY d.doc_id
""")


QUERIES["bpe_encode"] = q_bpe_encode
ORACLES["bpe_encode"] = _bpe_encode_sql()
