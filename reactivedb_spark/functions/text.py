"""Text-analysis column functions for large-scale corpus processing.

All of these are pure ``pyspark.sql.functions`` column expressions — JVM
whole-stage-codegen, no Python in the hot path — and each has an exact
ANSI-SQL twin used by the DuckDB oracle (see suite/scale.py). Determinism
across engines is part of the design: counting is done with
length/replace arithmetic and single-division doubles, never
locale/regex-dialect-sensitive constructs (except explicitly portable
character classes).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Marker-word sets per language for the n-gram/stopword language-ID
# heuristic. Scoring = total characters removed when deleting the padded
# markers — portable to any SQL engine via length/replace.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " a ", " and ", " of "],
    "de": [" der ", " die ", " und ", " das "],
    "fr": [" le ", " la ", " et ", " les "],
    "es": [" el ", " los ", " y ", " una "],
    "zh": [" de ", " shi ", " le ", " zai "],
}
LANG_ORDER = ["en", "de", "fr", "es", "zh"]


def _padded(col: Column) -> Column:
    return F.concat(F.lit(" "), col, F.lit(" "))


def lang_score(col: Column, lang: str) -> Column:
    """Marker mass for one language: chars removed by deleting markers."""
    padded = _padded(col)
    stripped = padded
    for marker in LANG_MARKERS[lang]:
        stripped = F.replace(stripped, F.lit(marker), F.lit(" "))
    return (F.length(padded) - F.length(stripped)).cast("long")


def lang_id(col: Column) -> Column:
    """Argmax language with deterministic tie-break order (LANG_ORDER);
    'und' when no marker hits at all."""
    scores = {lang: lang_score(col, lang) for lang in LANG_ORDER}
    total = None
    for s in scores.values():
        total = s if total is None else total + s
    result = F.lit("und")
    # build reversed CASE chain: first lang in LANG_ORDER wins ties
    for lang in reversed(LANG_ORDER):
        cond = F.lit(True)
        for other in LANG_ORDER:
            if other != lang:
                # >= for langs later in order, > for earlier → first-wins
                earlier = LANG_ORDER.index(other) < LANG_ORDER.index(lang)
                cond = cond & (
                    (scores[lang] > scores[other]) if earlier else (scores[lang] >= scores[other])
                )
        result = F.when((total > 0) & cond, F.lit(lang)).otherwise(result)
    return result


def token_count(col: Column) -> Column:
    """Token count for single-space-separated text: separators + 1."""
    return (F.length(col) - F.length(F.replace(col, F.lit(" "), F.lit(""))) + 1).cast("long")


def bpe_token_estimate(colname: str, chars_per_token: int = 4) -> Column:
    """BPE-ish subword-count estimate for a named column, pure column
    expressions: regex pretokenization in the GPT-2 style — letter runs,
    digit characters, punctuation singletons — then the standard
    ~4-chars-per-token heuristic within each letter run (``ceil(len/4)``
    in exact integer math, portable to any SQL engine). Takes a column
    NAME because ``regexp_extract_all`` is SQL-only in this Spark
    version."""
    n = chars_per_token
    runs = F.expr(f"regexp_extract_all(lower({colname}), '[a-z]+', 0)")
    sub = F.aggregate(
        F.transform(runs, lambda x: ((F.length(x) + (n - 1)) / n).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    digits = F.length(F.regexp_replace(F.lower(F.col(colname)), "[^0-9]", ""))
    other = F.length(F.regexp_replace(F.lower(F.col(colname)), "[a-z0-9 ]", ""))
    return (sub + digits + other).cast("long")


def avg_token_len(col: Column) -> Column:
    return F.length(F.replace(col, F.lit(" "), F.lit(""))).cast("double") / token_count(
        col
    ).cast("double")


def alpha_ratio(col: Column) -> Column:
    """Share of [a-z ] characters (portable regex class)."""
    kept = F.length(F.regexp_replace(col, "[^a-z ]", ""))
    return kept.cast("double") / F.length(col).cast("double")


def quality_score(col: Column) -> Column:
    """Toy quality heuristic: saturating length term + alpha purity —
    the shape of a Gopher/C4-style quality filter, kept deterministic."""
    n = token_count(col).cast("double")
    len_term = F.least(n / F.lit(100.0), F.lit(1.0))
    return len_term * F.lit(0.5) + alpha_ratio(col) * F.lit(0.5)


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of case/whitespace-normalized text."""
    return F.md5(F.lower(F.trim(col)))


def tfidf_top_terms(df, id_col: str, text_col: str, k: int = 3):
    """Top-k characteristic terms per document by tf·(N/df) — the
    TF-IDF keyword extractor of a corpus-analysis pipeline, kept
    oracle-exact by using the rational idf N/df directly instead of a
    log (cross-engine log() can differ in the last ulp; a single
    multiply-divide in fixed op order is bit-identical).

    Plan: one token explode, two hash aggregations (tf per (doc, token),
    df per token), a token-keyed join, one per-doc window for the top-k.
    The doc-count scalar joins in as a broadcast 1-row aggregate — no
    driver-side count."""
    from pyspark.sql.window import Window

    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    tok = df.select(F.col(id_col), F.explode(toks).alias("token"))
    tf = tok.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df_t"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf").cast("double") * F.col("n_docs").cast("double")
            / F.col("df_t").cast("double"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col(id_col), F.col("token"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df_t").cast("long").alias("df_t"),
            "tfidf",
            F.col("rk").cast("long").alias("rk"),
        )
    )


def top_ngrams(df, id_col: str, text_col: str, k: int = 20):
    """Corpus-level top-k adjacent bigrams — the n-gram census of a
    corpus report. One explode + per-doc window for adjacency, one
    global hash aggregation, then TakeOrdered (orderBy+limit compiles to
    a distributed top-k, never a full sort)."""
    from pyspark.sql.window import Window

    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    tok = df.select(F.col(id_col), F.posexplode(toks).alias("pos", "token"))
    nxt = F.lead("token").over(Window.partitionBy(id_col).orderBy("pos"))
    bi = (
        tok.withColumn("nxt", nxt)
        .filter(F.col("nxt").isNotNull())
        .select(F.concat_ws(" ", "token", "nxt").alias("bigram"))
    )
    return (
        bi.groupBy("bigram").agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(k)
        .select("bigram", F.col("n").cast("long").alias("n"))
    )


# PII patterns: written to mean the same thing under Java regex (Spark)
# and RE2 (DuckDB) — character classes, bounded repetition, \b only.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"


def scrub_pii(col: Column) -> Column:
    """Redact email addresses and (toy) phone numbers — the PII-scrub
    map of a training-data pipeline. A narrow per-row regex replace:
    pushes into the scan stage, no shuffle, whole-stage codegen."""
    out = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def pii_counts(col: Column):
    """(n_emails, n_phones) match counts for audit/reporting."""
    return (
        F.regexp_count(col, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(col, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
    )


def repetition_stats(df, id_col: str, text_col: str):
    """Gopher-style repetition signals per document (the repetition
    filters of large-corpus quality pipelines):

    - ``top_tok_frac``: share of all tokens taken by the single most
      frequent token (tie-free: it's a max over counts);
    - ``dup_bigram_frac``: 1 − distinct/total adjacent-bigram ratio.

    One explode + two hash aggregations, all JVM-side; fractions are a
    single int/int double division (bit-identical cross-engine). Tokens
    are the non-empty pieces of a space split — positions assigned AFTER
    dropping empties so bigram adjacency is stable under repeated
    separators."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    tok = df.select(F.col(id_col), F.posexplode(toks).alias("pos", "token"))
    counts = tok.groupBy(id_col, "token").agg(F.count("*").alias("c"))
    per_tok = counts.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"), F.max("c").alias("top_c")
    )
    from pyspark.sql.window import Window

    nxt = F.lead("token").over(Window.partitionBy(id_col).orderBy("pos"))
    bi = (
        tok.withColumn("nxt", nxt)
        .filter(F.col("nxt").isNotNull())
        .select(F.col(id_col), F.concat_ws(" ", "token", "nxt").alias("bg"))
    )
    per_bi = bi.groupBy(id_col).agg(
        F.count("*").alias("n_bi"), F.count_distinct("bg").alias("n_bi_distinct")
    )
    return (
        per_tok.join(per_bi, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("top_c").cast("double") / F.col("n_tokens").cast("double"))
            .alias("top_tok_frac"),
            F.when(
                F.coalesce(F.col("n_bi"), F.lit(0)) == 0, F.lit(0.0)
            ).otherwise(
                F.lit(1.0)
                - F.col("n_bi_distinct").cast("double") / F.col("n_bi").cast("double")
            ).alias("dup_bigram_frac"),
        )
    )


def char_entropy(df, id_col: str, text_col: str):
    """(id, n_chars, entropy_bits): character-level Shannon entropy per
    document — a classic corpus-quality signal (boilerplate and
    generated spam sit at abnormally low/high entropy; complements the
    ratio-based :func:`quality_score`).

    H = −Σ_c (n_c/N)·log2(n_c/N) over the doc's character histogram.
    Determinism follows the unigram-LM pattern (q_unigram_logprob):
    log2 may differ by 1 ulp across libms, so each term is pinned to
    DECIMAL(28,14) before the exact decimal sum and the result rounds
    to 6 — double-summation order can never show through.

    100 TB plan shape: two keyed aggregations — (doc, char-code) counts,
    then per-doc totals joined back on the doc key (co-partitioned: the
    histogram and its totals share the doc-keyed shuffle) — all with
    map-side partial aggregation, so shuffled rows are ≤ |alphabet| per
    doc. Pure JVM column expressions; no UDF."""
    from pyspark.sql import functions as F

    from reactivedb_spark import cache

    hist = cache.pin(
        df.select(id_col, F.explode(F.split(F.col(text_col), "")).alias("ch"))
        .filter(F.col("ch") != "")
        .select(id_col, F.ascii("ch").alias("code"))
        .groupBy(id_col, "code")
        .agg(F.count(F.lit(1)).cast("long").alias("n_c"))
    )
    totals = hist.groupBy(id_col).agg(F.sum("n_c").cast("long").alias("n"))
    p_c = F.col("n_c").cast("double") / F.col("n").cast("double")
    term = (p_c * F.log2(p_c)).cast("decimal(28,14)")
    return (
        hist.join(totals, id_col)
        .groupBy(id_col)
        .agg(
            F.max("n").cast("long").alias("n_chars"),
            F.round((F.lit(0).cast("decimal(28,14)") - F.sum(term))
                    .cast("double"), 6).alias("entropy_bits"),
        )
    )


def ngram_novelty(df, id_col: str, text_col: str, n: int = 8):
    """Per-document n-gram novelty: the fraction of a document's
    DISTINCT word n-grams whose globally first occurrence (lowest id)
    is this document — the "how much of this text is new vs the rest of
    the corpus" quality signal that large-corpus curation pipelines
    compute alongside the duplicated-span census (the per-doc dual of
    operators/dedup.span_census). Documents with fewer than ``n`` words
    carry no grams and are omitted.

    Plan shape (100 TB): grams come from one sequence-explode +
    ``slice`` (no UDF) keyed by a 16-byte md5 instead of the span text;
    per-doc distinct and the global min-id census are two hash
    aggregations on that key (map-side partial combine), the census
    joins back on the SAME key — co-partitioned with the distinct's
    shuffle output — and the per-doc fold is one id-keyed aggregation.
    Never a pair join, never a driver pull. The novelty fraction is a
    single int/int IEEE division (bit-identical cross-engine).
    """
    from pyspark.sql import functions as F

    words = F.split(F.col(text_col), " ")
    grams = (
        df.select(F.col(id_col).alias("_id"), words.alias("_w"))
        .filter(F.size("_w") >= n)
        .select(
            "_id",
            F.explode(F.sequence(F.lit(1), F.size("_w") - (n - 1))).alias("_p"),
            "_w",
        )
        .select(
            "_id",
            F.md5(F.concat_ws(" ", F.expr(f"slice(_w, _p, {n})"))).alias("_h"),
        )
        .distinct()
    )
    census = grams.groupBy("_h").agg(F.min("_id").alias("_first"))
    return (
        grams.join(census, "_h")
        .groupBy("_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum((F.col("_id") == F.col("_first")).cast("long"))
            .cast("long").alias("n_novel"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_grams",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_grams").cast("double"))
            .alias("novelty"),
        )
    )
