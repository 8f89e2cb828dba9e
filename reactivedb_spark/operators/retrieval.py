"""BM25 full-text retrieval over a document relation.

The training-data curation counterpart of a search engine's scoring
pass: given a bag-of-words query, rank every document by Okapi BM25.
Used in pipelines for targeted corpus slicing ("find docs about X"),
eval-set mining, and retrieval-augmented filtering.

Plan shape (100 TB): the query's term list is a driver-side constant,
so the exploded token stream is filtered to query terms immediately (a
constant `IN` predicate evaluated inside the scan stage, before any
shuffle — tokens are derived by the explode, so there is no storage
column to push it into). Two
keyed aggregations follow: per-(doc, term) term frequency and the
per-doc length relation, joined on the doc id. The per-term document
frequency relation has at most |query terms| rows and is broadcast.
The final top-k is an `ORDER BY ... LIMIT k` — Spark executes it as
TakeOrderedAndProject (per-partition heaps + driver merge), never a
global sort.

Determinism: IEEE multiply/divide on identical inputs is correctly
rounded and bit-portable across engines; only ``ln()`` crosses libm.
Each idf is therefore pinned to DECIMAL(28,14) immediately (the
``unigram_logprob`` convention, suite/analytics.py), per-term scores
are summed as exact decimals, and the emitted score is rounded to 6
decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from reactivedb_spark import cache
from reactivedb_spark.operators.dedup import tokens


def bm25_topk(
    df: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 score for a whitespace bag-of-words
    ``query``. Returns (id, n_terms, score) ordered by (score desc, id).

    Documents with no tokens take no part (they cannot match); ``N``
    and ``avgdl`` are defined over token-bearing documents.
    """
    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        raise ValueError("query must contain at least one term")

    tok = cache.pin(tokens(df, id_col, text_col, distinct=False))
    dl = tok.groupBy(id_col).agg(F.count("*").cast("long").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("n_tokens"),
    ).collect()[0]
    n_docs, n_tokens = int(stats["n_docs"]), int(stats["n_tokens"] or 0)
    if n_docs == 0:
        raise ValueError(
            "bm25_topk: corpus has no token-bearing documents "
            f"({id_col}/{text_col} yielded zero tokens) — N and avgdl are undefined"
        )
    avgdl = n_tokens / n_docs  # one IEEE division of two exact ints

    tf = (
        tok.filter(F.col("token").isin(terms))  # constant IN, pre-shuffle
        .groupBy(id_col, "token")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    # ≤ |terms| rows: (id, token) is unique in tf, so count(*) = doc freq
    dfreq = tf.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    idf = dfreq.select(
        "token",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df").cast("double") + F.lit(0.5))
            / (F.col("df").cast("double") + F.lit(0.5))
        ).cast("decimal(28,14)").alias("idf"),
    )
    term_score = (
        tf.join(F.broadcast(idf), "token")
        .join(dl, id_col)
        .select(
            F.col(id_col),
            (
                F.col("idf").cast("double")
                * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
                / (
                    F.col("tf").cast("double")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl))
                )
            ).cast("decimal(28,14)").alias("s"),
        )
    )
    return (
        term_score.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.round(F.sum("s").cast("double"), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def bm25_oracle_sql(
    query: str,
    src: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_topk` — identical tokenization, idf
    decimal pinning, and score algebra, with ``N``/``avgdl`` computed
    in-query from the same integer aggregates (same IEEE division)."""
    terms = sorted({t for t in query.lower().split() if t})
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH tok AS (
  SELECT {id_col} AS id, token FROM (
    SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS token FROM {src}
  ) WHERE token <> ''
),
dl AS (SELECT id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY id),
c AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(CAST(sum(dl) AS BIGINT) AS DOUBLE) / count(*) AS avgdl
      FROM dl),
tf AS (SELECT id, token, CAST(count(*) AS BIGINT) AS tf
       FROM tok WHERE token IN ({in_list}) GROUP BY id, token),
dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
idf AS (SELECT token,
               CAST(ln(1.0 + (c.n_docs - CAST(df AS DOUBLE) + 0.5)
                             / (CAST(df AS DOUBLE) + 0.5)) AS DECIMAL(28,14)) AS idf
        FROM dfreq, c),
ts AS (
  SELECT tf.id,
         CAST(CAST(idf.idf AS DOUBLE)
              * (CAST(tf.tf AS DOUBLE) * {k1 + 1.0!r})
              / (CAST(tf.tf AS DOUBLE)
                 + {k1!r} * ({1.0 - b!r} + {b!r} * CAST(dl.dl AS DOUBLE) / c.avgdl))
              AS DECIMAL(28,14)) AS s
  FROM tf JOIN idf ON idf.token = tf.token JOIN dl ON dl.id = tf.id, c)
SELECT id AS {id_col}, CAST(count(*) AS BIGINT) AS n_terms,
       round(CAST(sum(s) AS DOUBLE), 6) AS score
FROM ts GROUP BY id
ORDER BY score DESC, id LIMIT {k}
"""


def phrase_match(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document occurrence count of the exact token phrase ``terms``
    via a positional inverted index — the phrase-query primitive of a
    full-text engine, and the "find every document containing this exact
    passage" tool of corpus forensics.

    Plan shape (100 TB): one ``posexplode`` builds the posting relation
    (id, pos, token); each phrase slot i keeps only ``token = terms[i]``
    — a constant predicate evaluated inside the explode's stage, so the
    joins below see |postings of that term| rows, not the corpus. Slot i
    is re-keyed to its would-be phrase start ``pos - i`` and the slots
    are chained with (id, start) equi-joins — narrow int keys, AQE-sized,
    never a per-document scan. Overlapping matches count individually
    (each start position is its own row), matching the positional-index
    semantics of Lucene-style phrase queries.

    Emits (id, n_matches) for documents with ≥1 match.
    """
    if not terms:
        raise ValueError("phrase_match: terms must be non-empty")
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    postings = df.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "token")
    )
    starts = None
    for i, term in enumerate(terms):
        slot = postings.filter(F.col("token") == term).select(
            F.col(id_col), (F.col("pos") - F.lit(i)).alias("start")
        )
        starts = slot if starts is None else starts.join(slot, [id_col, "start"])
    return starts.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_matches")
    )


def trigram_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: list[str],
) -> DataFrame:
    """Indexed multi-pattern substring search — the pg_trgm design: a
    positional-free trigram inverted index probed conjunctively, then an
    exact ``contains`` verify on the survivors only.

    Every literal pattern of length >= 3 contributes its distinct
    character trigrams; a document is a candidate for pattern p iff it
    contains ALL of p's trigrams (count == n_tri(p) after a distinct
    semi-join). Candidates are then verified with the built-in JVM
    ``contains`` — false positives (trigrams present but not contiguous)
    drop out; false negatives are impossible (every substring occurrence
    contains every trigram of the pattern).

    Plan shape (100 TB): the corpus trigram explode is filtered by an
    isin() against the UNION of pattern trigrams (a compile-time literal
    set — evaluated inside the explode's stage, so the posting relation
    is |docs x pattern-trigram hits|, never |docs x all trigrams|); one
    distinct, one broadcast join against the tiny pattern-trigram
    relation, one count, and a contains() verify on candidates. The full
    text is scanned exactly once (the explode) regardless of pattern
    count — amortizing the scan across patterns is the point of the
    index. Patterns shorter than 3 chars are rejected (no trigram
    signal; a LIKE scan is the right tool there).

    Emits (pattern, id) for every (pattern, document) match.
    """
    if not patterns:
        raise ValueError("trigram_search: patterns must be non-empty")
    if any(len(p) < 3 for p in patterns):
        raise ValueError("trigram_search: every pattern needs length >= 3")

    def tris(s: str) -> list[str]:
        return sorted({s[i:i + 3] for i in range(len(s) - 2)})

    pat_rows = [(p, t) for p in patterns for t in tris(p)]
    all_tris = sorted({t for _, t in pat_rows})
    spark = df.sparkSession
    pat_df = spark.createDataFrame(pat_rows, ["pattern", "tri"])
    n_tri = {p: len(tris(p)) for p in patterns}
    need = spark.createDataFrame(list(n_tri.items()), ["pattern", "n_need"])

    postings = (
        df.select(
            F.col(id_col),
            F.explode(F.expr(
                f"transform(sequence(1, greatest(length({text_col}) - 2, 0)),"
                f" i -> substring({text_col}, i, 3))")).alias("tri"),
        )
        .filter(F.col("tri").isin(all_tris))
        .distinct()
    )
    cand = (
        postings.join(F.broadcast(pat_df), "tri")
        .groupBy(id_col, "pattern")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .join(F.broadcast(need), "pattern")
        .filter(F.col("n_hit") == F.col("n_need"))
        .select(id_col, "pattern")
    )
    verified = (
        cand.join(df.select(id_col, text_col), id_col)
        .filter(F.expr(f"contains({text_col}, pattern)"))
        .select("pattern", F.col(id_col).cast("long").alias(id_col))
    )
    return verified


def trigram_search_bounded(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: list[str],
    probe_k: int = 2,
    sample_mod: int = 8,
) -> DataFrame:
    """df-bounded production twin of :func:`trigram_search`
    (VERDICT r12 #3) — same exact result set, posting lists capped by a
    document-frequency bound before the intersect, the
    :func:`containment_prefix_pairs` rarest-first technique applied to
    the pg_trgm design.

    :func:`trigram_search` probes the posting list of EVERY pattern
    trigram; on a fixed trigram vocabulary the posting relation (and the
    distinct shuffle over it) densifies — |docs × all pattern-trigram
    hits| grows super-linearly on fixture-like corpora. Here each pattern
    probes only its ``probe_k`` RAREST trigrams by (estimated) document
    frequency, so candidate generation touches Σ df(rarest trigrams)
    postings — the rarest-first order keeps every probed posting list
    df-bounded by construction, exactly the prefix-filter argument of
    containment_prefix_pairs (SSJoin/PPJoin).

    Exactness is unchanged: a true match contains ALL pattern trigrams,
    in particular the probed subset (no false negatives); the contains()
    verify removes the extra false positives the looser candidacy admits
    (no false-positive cost beyond the verify scan). df estimates come
    from a deterministic 1/``sample_mod`` hash-sample of the corpus —
    estimate quality affects only WHICH posting lists are probed (cost),
    never the result.

    Posting generation is the second half of the fix: the research twin
    explodes EVERY character position of every document (|chars| rows
    before its isin filter — the dominant sf1 cost, shared by any
    per-position index build). Here postings come from vectorized JVM
    ``contains`` over the chosen trigram literals: one text scan with
    |chosen| ≤ probe_k × |patterns| boolean probes per document, each
    (doc, tri) hit emitted at most once — the posting relation is BORN
    distinct, so the distinct shuffle disappears entirely. (The explode
    index amortizes better only when the pattern set is so large that
    |all pattern trigrams| rivals the document length — not the bounded
    production regime.)

    Plan shape (100 TB): one 1/sample_mod text scan for the df estimate
    (aggregated to ≤ |pattern trigrams| rows — a bounded collect, like
    the ANN k-row seeds), one full text scan emitting the df-bounded
    postings, one partial-aggregable count per (doc, pattern), two
    broadcast joins, one contains() verify on candidates. Linear in the
    corpus; the only shuffle is Σ df(chosen trigrams) rows — df-bounded
    by the rarest-first selection.
    """
    if not patterns:
        raise ValueError("trigram_search: patterns must be non-empty")
    if any(len(p) < 3 for p in patterns):
        raise ValueError("trigram_search: every pattern needs length >= 3")
    if probe_k < 1:
        raise ValueError("trigram_search_bounded: probe_k must be >= 1")

    def tris(s: str) -> list[str]:
        return sorted({s[i:i + 3] for i in range(len(s) - 2)})

    def probe_postings(frame: DataFrame, probe_tris: list[str]) -> DataFrame:
        # one scan, |probe_tris| vectorized contains per doc; a (doc, tri)
        # hit appears at most once — no distinct needed downstream
        return frame.select(
            F.col(id_col),
            F.explode(F.array(*[F.lit(t) for t in probe_tris])).alias("tri"),
        ).filter(F.expr(f"contains({text_col}, tri)"))

    all_tris = sorted({t for p in patterns for t in tris(p)})
    spark = df.sparkSession

    # pass 1: document-frequency estimates on a deterministic hash-sample
    est = (
        probe_postings(
            df.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(sample_mod)) == 0),
            all_tris)
        .groupBy("tri")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    df_est = {r["tri"]: r["_df"] for r in est.collect()}  # ≤ |all_tris| rows

    chosen_rows, need_rows = [], []
    for p in patterns:
        probe = sorted(tris(p), key=lambda t: (df_est.get(t, 0), t))[:probe_k]
        chosen_rows += [(p, t) for t in probe]
        need_rows.append((p, len(probe)))
    chosen_union = sorted({t for _, t in chosen_rows})
    pat_df = spark.createDataFrame(chosen_rows, ["pattern", "tri"])
    need = spark.createDataFrame(need_rows, ["pattern", "n_need"])

    # pass 2: probe only the chosen (df-bounded) posting lists
    cand = (
        probe_postings(df, chosen_union)
        .join(F.broadcast(pat_df), "tri")
        .groupBy(id_col, "pattern")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .join(F.broadcast(need), "pattern")
        .filter(F.col("n_hit") == F.col("n_need"))
        .select(id_col, "pattern")
    )
    return (
        cand.join(df.select(id_col, text_col), id_col)
        .filter(F.expr(f"contains({text_col}, pattern)"))
        .select("pattern", F.col(id_col).cast("long").alias(id_col))
    )
