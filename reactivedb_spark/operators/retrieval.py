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
