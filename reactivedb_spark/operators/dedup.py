"""Deduplication operators for large-scale corpora.

Five families, each designed Spark-first (shuffle-conscious, no driver
loops in the hot path) with an exact SQL twin for the DuckDB oracle:

- **exact**: hash-groupBy on normalized text — one shuffle on the hash.
- **MinHash + LSH**: per-token seeded md5 minima → band signatures →
  bucket self-join on band equality. The classic shingle→minhash→band→
  bucket-join pipeline; only bucket-mates are ever paired, so candidate
  generation is linear-ish instead of O(n²).
- **Jaccard verify (word or char-n-gram shingles)**: exact Jaccard on
  the LSH candidates only (the scalable verify step; a full pairwise
  token join would explode); ``char_shingles`` feeds the same pipeline
  for word-boundary-robust near-dup detection.
- **SimHash**: per-token md5 hex-digit sign votes → per-bit majority →
  packed integer signature. Near-dup pairs = small Hamming distance via
  a pigeonhole band join over DISTINCT signature values.
- **Transitive clusters**: connected components over the near-dup pair
  graph (operators/graph.py) — the final collapse step of a dedup run.

Hashes are md5-hex **strings** (portable across engines, min() on hex
strings is well-defined); no engine-specific hash functions.
At cluster scale the token explode is a narrow flatMap; the band join
shuffles on band keys — oversized buckets (stop-word-like bands) are
dropped by `lsh_candidates`'s `max_bucket` guard before they can make a
reducer quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from reactivedb_spark import cache, stats

MINHASH_K = 6  # number of hash functions
LSH_BANDS = 3  # bands of size MINHASH_K / LSH_BANDS
SIMHASH_BITS = 32  # one per md5 hex char

_HEX_HIGH = ["8", "9", "a", "b", "c", "d", "e", "f"]


def normalize_text(col):
    return F.lower(F.trim(col))


def _estimate_scan_partitions(df: DataFrame) -> int | None:
    """Scan-partition estimate from the source files' total size vs
    ``spark.sql.files.maxPartitionBytes`` — no job, no plan compile.
    Returns None when the source isn't local files (cluster storage,
    non-file sources): callers fall back to the df.rdd probe there."""
    total = stats.scan_size_bytes(df)
    if total is None:
        return None
    try:
        mpb = stats.parse_bytes(
            df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes")
        )
    except Exception:
        mpb = 128 << 20
    return max(1, -(-total // max(mpb, 1)))


def widen(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Spread a narrow SCAN across all cores before a heavy expansion
    (token explode, per-token hashing). A small corpus arrives as one
    parquet file = ONE scan partition, which would pin the entire
    downstream pipeline to a single task.

    Apply this to raw table scans only. The partition count comes from a
    static file-size estimate when the source is stat-able local files
    (free — no job, no plan compile); only otherwise does it fall back
    to the ``df.rdd`` probe, which forces a non-AQE plan compile (cheap
    on a scan, tens of seconds on complex plans — those already get
    their parallelism from their own shuffles). At cluster scale a big
    input arrives already-split and this is a no-op."""
    p = min_parts or df.sparkSession.sparkContext.defaultParallelism
    est = _estimate_scan_partitions(df)
    if est is None:
        est = df.rdd.getNumPartitions()
    if est >= p:
        return df
    return df.repartition(p)


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One representative (min id) per distinct normalized text."""
    return (
        df.select(F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias(id_col), F.count("*").cast("long").alias("n_copies"))
        .select(id_col, "text_hash", "n_copies")
    )


def tokens(df: DataFrame, id_col: str, text_col: str, distinct: bool = True) -> DataFrame:
    """(id, token) pairs from single-space-separated text."""
    t = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).filter(F.col("token") != "")
    return t.distinct() if distinct else t


def char_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, token) distinct character n-gram shingles of the normalized
    text — the n-gram alternative to word tokens for Jaccard/MinHash
    (robust to word-boundary edits). Pure column expressions: a sequence
    of start offsets exploded against substring(), no UDF."""
    norm = normalize_text(F.col(text_col))
    return (
        # texts shorter than n yield no shingles (Spark sequence() would
        # flip to a descending range for an empty window)
        df.filter(F.length(norm) >= n)
        .select(
            F.col(id_col),
            norm.alias("_t"),
            F.explode(F.sequence(F.lit(1), F.length(norm) - (n - 1))).alias("_p"),
        )
        .select(F.col(id_col), F.substring(F.col("_t"), F.col("_p"), n).alias("token"))
        .distinct()
    )


def containment_pairs(df: DataFrame, id_col: str, text_col: str,
                      threshold: float = 0.0, **kwargs) -> DataFrame:
    """Max-containment |A∩B| / min(|A|,|B|) as the SCORE on MinHash-LSH
    candidate pairs. Containment scoring corrects Jaccard's length bias
    on the pairs that ARE examined, but **recall is bounded by the
    Jaccard-tuned LSH candidate stage**: collision probability tracks
    Jaccard, so the headline asymmetric case — a tiny document wholly
    contained in a much larger one — has LOW Jaccard and often never
    becomes a candidate at all. This is therefore a containment
    re-scorer for near-duplicate-sized pairs, not a general near-superset
    detector — :func:`containment_prefix_pairs` is the FULL-RECALL
    candidate path for that case. The oracle applies the identical
    candidate rule, so gate comparisons stay exact. Same LSH-prune →
    exact-verify plan and size gates as :func:`jaccard_pairs`."""
    return jaccard_pairs(df, id_col, text_col, threshold=threshold,
                         measure="containment", **kwargs)


def containment_prefix_pairs(df: DataFrame, id_col: str, text_col: str,
                             num: int = 4, den: int = 5,
                             max_token_docs: int | None = None) -> DataFrame:
    """EXACT (full-recall) max-containment join via prefix filtering —
    the set-similarity-join technique (SSJoin, Chaudhuri et al. ICDE'06;
    PPJoin, Xiao et al. WWW'08) the MinHash path cannot provide for
    asymmetric pairs.

    Guarantee: for threshold t = ``num/den``, a pair with
    |A∩B| / min(|A|,|B|) ≥ t (WLOG |A| ≤ |B|) shares ≥ ⌈t·|A|⌉ tokens,
    so at least one of the first |A| − ⌈t·|A|⌉ + 1 tokens of A in the
    GLOBAL rarest-first order must also be in B — a pair missed by the
    prefix join is provably below threshold, so recall is 1.0 by
    construction (no LSH probability involved). Only the potential
    SMALL side needs its prefix matched, so candidates come from ONE
    equi-join of the prefix relation (a few rarest tokens per doc)
    against the full token relation; rarest-first ordering keeps the
    join's buckets df(token)-sized and small by construction. The
    threshold is a rational ``num/den`` so the prefix length and the
    verify comparison are pure integer arithmetic — bit-identical in
    any engine (⌈t·n⌉ = (num·n + den − 1) div den; verify as
    den·|A∩B| ≥ num·min).

    ``max_token_docs`` optionally drops tokens whose document frequency
    exceeds it from CANDIDATE GENERATION only (the stop-band analogue;
    verification still uses full token sets, so precision is unaffected
    and only pairs whose every shared prefix token is a stop-token can
    be lost — at web scale those are boilerplate joins you want gone).

    Emits (doc_a, doc_b, containment double) for pairs ≥ num/den.
    """
    from pyspark.sql.window import Window

    if not (0 < num <= den):
        raise ValueError(f"threshold must be in (0, 1]: {num}/{den}")
    tok = cache.pin(tokens(df, id_col, text_col, distinct=True))
    # _n is the FULL set size (pre-guard): the prefix-length bound must
    # be computed on |A|, not on the stop-filtered count, or pairs whose
    # shared tokens are only partly stop-tokens can be lost beyond the
    # documented all-shared-tokens-are-stop case. Taking the first
    # min(L, #non-stop) non-stop tokens with L = n − ⌈t·n⌉ + 1 keeps the
    # guarantee: a qualifying pair shares ≥ ⌈t·n⌉ − (n − n') non-stop
    # tokens, which exceeds the n' − L it could hide outside the prefix.
    sizes = tok.groupBy(id_col).agg(F.count("*").cast("long").alias("_n"))
    freq = tok.groupBy("token").agg(F.count("*").cast("long").alias("_df"))
    if max_token_docs is not None:
        freq = freq.filter(F.col("_df") <= max_token_docs)
    ranked = (
        tok.join(freq, "token")
        .join(sizes, id_col)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy("_df", "token")
            ),
        )
    )
    # prefix length = n - ceil(t*n) + 1, integer-exact: `div` keeps the
    # whole bound in integer arithmetic (bit-identical to the oracle's
    # `//`), never through a double
    need = F.expr(f"({num} * _n + {den - 1}) div {den}")
    prefix = ranked.filter(
        F.col("_rn") <= F.col("_n") - need + 1
    ).select(F.col(id_col).alias("_small"), "token")
    cand = (
        prefix.join(tok.select(F.col(id_col).alias("_other"), "token"), "token")
        .filter(F.col("_small") != F.col("_other"))
        .select(
            F.least("_small", "_other").alias("doc_a"),
            F.greatest("_small", "_other").alias("doc_b"),
        )
        .distinct()
    )
    sets = cache.pin(
        tok.groupBy(id_col).agg(
            F.collect_set("token").alias("toks"),
            F.count("*").cast("long").alias("n_tok"),
        )
    )
    sa = sets.select(F.col(id_col).alias("doc_a"), F.col("toks").alias("ta"),
                     F.col("n_tok").alias("na"))
    sb = sets.select(F.col(id_col).alias("doc_b"), F.col("toks").alias("tb"),
                     F.col("n_tok").alias("nb"))
    inter = F.size(F.array_intersect("ta", "tb")).cast("long")
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("_ni", inter)
        .filter(
            F.lit(den) * F.col("_ni") >= F.lit(num) * F.least("na", "nb")
        )
        .select(
            "doc_a", "doc_b",
            (F.col("_ni").cast("double")
             / F.least("na", "nb").cast("double")).alias("containment"),
        )
    )


def span_census(df: DataFrame, id_col: str, text_col: str, n: int = 8,
                min_docs: int = 2, top: int | None = 20) -> DataFrame:
    """Cross-document duplicated-span census: every ``n``-word sliding
    window that occurs in at least ``min_docs`` distinct documents, with
    its document and occurrence counts — the detection half of
    substring-level deduplication (Lee et al., "Deduplicating Training
    Data Makes Language Models Better": repeated spans are memorization
    fuel even when whole-document dedup passes).

    Plan: one narrow explode (start offsets against ``slice()`` of the
    split word array — no UDF, no quadratic join), then ONE partial-
    aggregable groupBy on the span text. Distinct-doc counting rides the
    same shuffle. ``top`` (ordered by n_docs desc, n_occurrences desc,
    span) returns via TakeOrderedAndProject; pass ``top=None`` for the
    full census relation (the input to an actual span-removal pass).

    Emits (span, n_docs, n_occurrences).
    """
    words = F.split(F.col(text_col), " ")
    base = (
        df.select(F.col(id_col).alias("_id"), words.alias("_w"))
        .filter(F.size("_w") >= n)
        .select(
            "_id",
            "_w",
            F.explode(F.sequence(F.lit(1), F.size("_w") - (n - 1))).alias("_p"),
        )
        .select(
            "_id",
            F.array_join(F.slice(F.col("_w"), F.col("_p"), n), " ").alias("span"),
        )
    )
    out = (
        base.groupBy("span")
        .agg(
            F.count_distinct("_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )
    if top is not None:
        out = out.orderBy(
            F.col("n_docs").desc(), F.col("n_occurrences").desc(), F.col("span")
        ).limit(top)
    return out


def span_dedup(df: DataFrame, id_col: str, text_col: str, n: int = 8) -> DataFrame:
    """Substring-level deduplication (the removal half of
    :func:`span_census`, Lee et al.): every ``n``-word span that occurs
    in 2+ documents keeps its canonical occurrence (the lowest-id
    document containing the span) and is deleted everywhere else —
    token positions covered by ANY removed span are dropped, so
    overlapping duplicated spans merge naturally, and the surviving
    tokens are re-joined in order.

    Plan (100 TB): positions come from one ``posexplode``; spans join
    their census on an md5 span key — a narrow equi-shuffle on a
    16-byte hash instead of the span text. Removed intervals explode to
    covered positions (``n``× the duplicated-occurrence volume — linear,
    bounded by corpus tokens), distinct, and anti-join the token stream
    on (id, pos); reconstruction is one ``collect_list(struct(pos,
    token))`` + ``array_sort`` per document, which rides the same id
    shuffle. No pair join anywhere.

    Emits (id, clean_text, n_tokens, n_removed); documents that lose
    every token keep a row with ``clean_text = ''``.
    """
    words = F.split(F.col(text_col), " ")
    tokpos = cache.pin(
        df.select(F.col(id_col).alias("_id"), F.posexplode(words).alias("_p", "token"))
        # 1-based positions to match the span offsets below
        .select("_id", (F.col("_p") + 1).alias("_p"), "token")
    )
    spans = (
        df.select(F.col(id_col).alias("_id"), words.alias("_w"))
        .filter(F.size("_w") >= n)
        .select(
            "_id",
            "_w",
            F.explode(F.sequence(F.lit(1), F.size("_w") - (n - 1))).alias("_p"),
        )
        .select(
            "_id", "_p",
            F.md5(F.concat_ws(" ", F.expr(f"slice(_w, _p, {n})"))).alias("_h"),
        )
    )
    spans = cache.pin(spans)
    census = (
        spans.groupBy("_h")
        .agg(F.count_distinct("_id").alias("_nd"), F.min("_id").alias("_keep"))
        .filter(F.col("_nd") >= 2)
        .select("_h", "_keep")
    )
    removed = spans.join(census, "_h").filter(F.col("_id") != F.col("_keep"))
    covered = (
        removed.select(
            "_id", F.explode(F.sequence(F.col("_p"), F.col("_p") + (n - 1))).alias("_p")
        ).distinct()
    )
    kept = tokpos.join(covered, ["_id", "_p"], "left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_p", "token"))),
                lambda s: s["token"],
            ),
        ).alias("clean_text"),
        F.count("*").cast("long").alias("n_kept"),
    )
    totals = tokpos.groupBy("_id").agg(F.count("*").cast("long").alias("n_tokens"))
    return (
        totals.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long").alias("n_removed"),
        )
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str, n: int = 3,
                        threshold: float = 0.0, **kwargs) -> DataFrame:
    """Exact character-n-gram Jaccard on LSH candidates: the same
    minhash→band→verify pipeline as ``jaccard_pairs`` but over character
    shingles — near-dup detection robust to tokenization differences.
    ``kwargs`` forward to ``jaccard_pairs`` (n_docs, broadcast_sets,
    max_bucket)."""
    sh = char_shingles(df, id_col, text_col, n)
    return jaccard_pairs(df, id_col, text_col, threshold=threshold, tok=sh, **kwargs)


def minhash_signatures(df: DataFrame, id_col: str, text_col: str, k: int = MINHASH_K,
                       tok: DataFrame | None = None) -> DataFrame:
    """k seeded-md5 minima per document (word-level shingle set).

    ``tok`` lets a composed pipeline (operators/corpus.py) share one
    token relation across stages; min() is duplicate-insensitive, so a
    distinct token relation yields identical signatures."""
    if tok is None:
        tok = tokens(df, id_col, text_col, distinct=False)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"s{i}_"), F.col("token")))).alias(f"mh{i}")
        for i in range(1, k + 1)
    ]
    return tok.groupBy(id_col).agg(*aggs)


def lsh_bands(sigs: DataFrame, id_col: str, k: int = MINHASH_K, bands: int = LSH_BANDS) -> DataFrame:
    rows = k // bands
    out = sigs
    for b in range(bands):
        parts = [F.col(f"mh{b * rows + r + 1}") for r in range(rows)]
        out = out.withColumn(f"band{b + 1}", F.md5(F.concat(*parts)))
    return out.select(id_col, *[f"band{b + 1}" for b in range(bands)])


def lsh_candidates(df: DataFrame, id_col: str, text_col: str,
                   k: int = MINHASH_K, bands: int = LSH_BANDS,
                   tok: DataFrame | None = None,
                   max_bucket: int | None = None) -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) sharing at least one band.

    Bands go long-format ((doc, band_idx, band_key) via ``stack``) so one
    equi-join on (band_idx, band_key) replaces ``bands`` separate
    self-joins + union — one shuffle instead of 2×bands, ~1.5× faster at
    sf0.1.

    ``max_bucket`` is the stop-band guard: a band bucket holding more than
    ``max_bucket`` documents (empty-ish docs, boilerplate — the stop-word
    analogue of LSH) is EXCLUDED from pair generation, because one such
    key makes one reducer quadratic (|bucket|² pairs) while carrying
    essentially no near-dup signal. The size check is a window count over
    the same (band_idx, band_key) shuffle — linear, one extra pass, no
    extra shuffle key. Default None keeps exact pair semantics (the
    oracle-compared suite queries use that)."""
    banded = lsh_bands(minhash_signatures(df, id_col, text_col, k, tok=tok), id_col, k, bands)
    stack_args = ", ".join(f"{b + 1}, band{b + 1}" for b in range(bands))
    long = banded.selectExpr(
        id_col, f"stack({bands}, {stack_args}) AS (bi, bk)"
    )
    if max_bucket is not None:
        from pyspark.sql.window import Window

        long = (
            long.withColumn(
                "_bn", F.count("*").over(Window.partitionBy("bi", "bk"))
            )
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    if max_bucket is not None:
        # GUARDED pair generation without a self-join: the a⋈b band join
        # evaluates the whole upstream (scan → token explode → 6×md5
        # minhash SortAggregate → bands) once PER SIDE — the most
        # expensive compute in the pipeline, twice. With the stop-band
        # guard active every bucket holds ≤ max_bucket ids, so one
        # groupBy per bucket (sharing the guard window's (bi, bk)
        # exchange) collects the bucket's ids sorted and pos-explode +
        # tail-slice emits each unordered pair exactly once (array_sort
        # ascending ⇒ doc_a < doc_b by construction — the same pair set
        # as the join's a < b filter). Measured at sf0.1:
        # dedup_jaccard_guarded 11.3 → 4.4 s min-of-3.
        grouped = long.groupBy("bi", "bk").agg(
            F.array_sort(F.collect_list(F.col(id_col))).alias("_ids")
        )
        return (
            grouped.select(F.posexplode("_ids").alias("_i", "doc_a"), "_ids")
            .select(
                "doc_a",
                F.explode(
                    F.slice("_ids", F.col("_i") + 2,
                            F.size("_ids") - F.col("_i") - 1)
                ).alias("doc_b"),
            )
            .distinct()
        )
    # UNGUARDED (research) configs keep the self-join: without the bucket
    # bound a stop-band-sized bucket generates |bucket|² pairs, and the
    # join formulation lets AQE's skew-join splitting spread that hot
    # (bi, bk) key across tasks — the collect_list shape would pin the
    # whole quadratic bucket onto one task (measured: dedup_clusters
    # 11 → 18 s when collect-paired unguarded). Pin the band relation so
    # the join's two sides read ONE computed copy: unpinned, each side
    # re-ran the scan → explode → 6×md5 minhash upstream (broadcast
    # conversion defeats exchange reuse — seen in the before-plan as two
    # full identical subtrees).
    long = cache.pin(long)
    a = long.select(F.col(id_col).alias("doc_a"), "bi", "bk")
    b = long.select(F.col(id_col).alias("doc_b"), "bi", "bk")
    return (
        a.join(b, ["bi", "bk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


BITSET_VOCAB_LIMIT = 4096  # dictionary-bitset path cap (64 longs/doc)


def _token_bitsets(tok: DataFrame, id_col: str, vocab: int) -> DataFrame:
    """Per-doc token set packed into ``ceil(vocab/64)`` longs via a dense
    dictionary (deterministic: ids assigned in token sort order).
    Set ops become bitwise: |A∩B| = Σ bit_count(a&b)."""
    n_buckets = (vocab + 63) // 64
    # Window.orderBy without partitioning = a single-partition sort of
    # the token dictionary. Bounded by construction: this path only runs
    # when vocab ≤ BITSET_VOCAB_LIMIT (4096 rows), so the "sort
    # everything on one task" anti-pattern never sees corpus-sized data.
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("token")
    dict_df = (
        tok.select("token").distinct()
        .withColumn("tid", F.row_number().over(w) - 1)
    )
    bits = (
        tok.join(F.broadcast(dict_df), "token")
        .select(
            F.col(id_col),
            (F.col("tid") / 64).cast("int").alias("bucket"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(tid % 64 AS INT))").alias("bit"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.bit_or("bit").alias("mask"))
    )
    filled = bits.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "mask"))).alias("m")
    ).select(
        F.col(id_col),
        F.transform(
            F.sequence(F.lit(0), F.lit(n_buckets - 1)),
            # element_at on a map looks up by KEY (the bucket number)
            lambda b: F.coalesce(F.element_at("m", b.cast("int")), F.lit(0).cast("long")),
        ).alias("mask"),
    )
    return filled


BROADCAST_SETS_LIMIT = 32 << 20  # bytes of estimated per-doc-set relation


def jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                  threshold: float = 0.0,
                  tok: DataFrame | None = None,
                  vocab: int | None = None,
                  n_docs: int | None = None,
                  broadcast_sets: bool | None = None,
                  max_bucket: int | None = None,
                  measure: str = "jaccard") -> DataFrame:
    """Exact token-set Jaccard on LSH candidates (LSH prune → exact verify).

    Two physical strategies, chosen by vocabulary size:

    - **dictionary bitsets** (vocab ≤ 4096): token sets pack into a few
      longs; per pair the intersection is ``Σ bit_count(a & b)`` — pure
      integer ALU work, ~an order of magnitude cheaper than hash-set
      intersection at millions of candidate pairs;
    - **array_intersect** over collected token sets otherwise (still one
      row per pair; the earlier (pair × token) explode-join produced a
      ~24M-row intermediate and is long gone).

    The per-doc set side is **corpus-sized** (one row per document), so it
    is broadcast only when its estimated size fits ``BROADCAST_SETS_LIMIT``
    (``broadcast_sets=None`` estimates from ``n_docs``, counted if not
    given); above that the candidate pairs shuffle-join the sets on doc id
    — two linear shuffles on ids, the 100 TB-safe plan (AQE may still
    choose a runtime broadcast if the sets turn out small). Pairs sharing
    no tokens are dropped (n_inter > 0); ``max_bucket`` forwards to the
    LSH stop-band guard.

    Returns (doc_a, doc_b, jaccard double) — values independent of the
    chosen strategy (both are exact set computations)."""
    # tok feeds at least three branches (minhash signatures inside
    # lsh_candidates, the vocab count, the per-doc sets) — pin so the
    # tokenize+distinct shuffle runs once, not per branch. An
    # already-persisted caller tok is left alone (its cache lifecycle
    # belongs to the caller, e.g. corpus_clean); an unpersisted caller
    # tok gets a FRESH pinned projection so the caller's own frame's
    # cache state is never mutated (e.g. ngram_jaccard_pairs' shingles,
    # which would otherwise recompute per branch — an 8× slowdown).
    if tok is None:
        tok = cache.pin(tokens(df, id_col, text_col, distinct=True))
    elif not (tok.storageLevel.useMemory or tok.storageLevel.useDisk):
        tok = cache.pin(tok.select("*"))
    cand = lsh_candidates(df, id_col, text_col, tok=tok, max_bucket=max_bucket)
    if vocab is None:
        # strategy pick needs the vocab size; callers that already know it
        # (or cache ``tok``) skip this job entirely
        vocab = tok.select("token").distinct().count()
    use_bitset = bool(vocab) and vocab <= BITSET_VOCAB_LIMIT
    if broadcast_sets is None:
        if n_docs is None:
            n_docs = df.count()
        # bitset rows: id + ceil(vocab/64) longs; array rows: id + token
        # strings (~1 KiB upper estimate per doc)
        per_doc = (24 + 8 * ((vocab + 63) // 64)) if use_bitset else 1024
        broadcast_sets = n_docs * per_doc <= BROADCAST_SETS_LIMIT
    hint = F.broadcast if broadcast_sets else (lambda d: d)
    if use_bitset:
        # both join sides (doc_a / doc_b) read the per-doc set relation:
        # pin it so the token aggregation runs once, not per side
        sets = cache.pin(_token_bitsets(tok, id_col, vocab))
        sa = sets.select(F.col(id_col).alias("doc_a"), F.col("mask").alias("ma"))
        sb = sets.select(F.col(id_col).alias("doc_b"), F.col("mask").alias("mb"))
        inter = F.aggregate(
            F.zip_with("ma", "mb", lambda x, y: F.bit_count(x.bitwiseAND(y)).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        popcnt = lambda col: F.aggregate(  # noqa: E731
            F.transform(col, lambda x: F.bit_count(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        out = (
            cand.join(hint(sa), "doc_a")
            .join(hint(sb), "doc_b")
            .withColumn("n_inter", inter)
            .filter(F.col("n_inter") > 0)
            .withColumn("n_a", popcnt(F.col("ma")))
            .withColumn("n_b", popcnt(F.col("mb")))
        )
    else:
        sets = cache.pin(tok.groupBy(id_col).agg(
            F.collect_set("token").alias("toks"), F.count("*").cast("long").alias("n_tok")
        ))
        sa = sets.select(F.col(id_col).alias("doc_a"), F.col("toks").alias("toks_a"),
                         F.col("n_tok").alias("n_a"))
        sb = sets.select(F.col(id_col).alias("doc_b"), F.col("toks").alias("toks_b"),
                         F.col("n_tok").alias("n_b"))
        out = (
            cand.join(hint(sa), "doc_a")
            .join(hint(sb), "doc_b")
            .withColumn("n_inter", F.size(F.array_intersect("toks_a", "toks_b")).cast("long"))
            .filter(F.col("n_inter") > 0)
        )
    if measure == "containment":
        # max-containment |A∩B| / min(|A|, |B|): near-superset detection —
        # a short doc wholly quoted inside a long one scores 1.0 here
        # while its Jaccard can be arbitrarily small
        out = out.withColumn(
            "containment",
            F.col("n_inter").cast("double")
            / F.least(F.col("n_a"), F.col("n_b")).cast("double"),
        ).select("doc_a", "doc_b", "containment")
        col = "containment"
    elif measure == "jaccard":
        out = out.withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        ).select("doc_a", "doc_b", "jaccard")
        col = "jaccard"
    else:
        raise ValueError(f"unknown measure {measure!r} (jaccard | containment)")
    return out.filter(F.col(col) >= threshold) if threshold > 0 else out


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS) -> DataFrame:
    """Packed SimHash signature per document.

    Bit j = majority vote over distinct tokens of the high bit of hex char
    j of md5(token). Portable: substring + IN-list + integer sums only.
    """
    tok = tokens(df, id_col, text_col, distinct=True)
    # One shuffle, no row blowup: the per-bit ±1 votes are ``bits``
    # parallel aggregate expressions over the (doc, token) relation —
    # width-32 partial aggregates instead of the 32× exploded (doc,
    # token, j) relation a bit-table join would produce (measured ~5×
    # faster at corpus scale, identical votes).
    h = F.md5(F.col("token"))
    vote = [
        F.sum(
            F.when(F.substring(h, j, 1).isin(_HEX_HIGH), F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"_s{j}")
        for j in range(1, bits + 1)
    ]
    votes = tok.groupBy(id_col).agg(*vote)
    packed_expr = None
    for j in range(1, bits + 1):
        term = F.when(F.col(f"_s{j}") > 0, F.lit(1 << (j - 1)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        packed_expr = term if packed_expr is None else packed_expr + term
    return votes.select(id_col, packed_expr.alias("simhash"))


def simhash_pairs(sig: DataFrame, id_col: str = "doc_id",
                  sig_col: str = "simhash", max_hamming: int = 6,
                  bits: int = SIMHASH_BITS) -> DataFrame:
    """Near-dup pairs with Hamming(sig_a, sig_b) <= max_hamming — banded,
    never all-pairs.

    Pigeonhole: split the ``bits``-bit signature into ``max_hamming + 1``
    disjoint bands; any pair within the Hamming budget is identical in at
    least one band, so ONE equi-join on (band, band_value) finds every
    qualifying pair with linear-ish candidate volume (same shape as the
    MinHash LSH band join above). Exact: candidates are then verified with
    bit_count(xor).

    SCALE CAVEAT (measured, round-5 sf1 validation): with the 32-bit
    default, bits/(max_hamming+1) gives 4-5-bit band values — at most 32
    distinct — so band buckets grow linearly with the corpus and the
    band join is birthday-quadratic (22× cost at 10× data). Beyond
    ~10k distinct signatures use :func:`simhash2` +
    :func:`simhash2_pairs` (64-bit split signature, 16-bit bands),
    which is the layout the suite query ships.
    """
    # the signature relation feeds three plan branches (distinct values,
    # doc_a expansion, doc_b expansion): pin it or the whole upstream
    # signature computation runs three times (the cosine_topk lesson).
    # Pin a fresh projection, not the caller's frame — persisting the
    # argument would mutate cache state the caller owns.
    sig = cache.pin(sig.select("*"))
    n_bands = max_hamming + 1
    base, extra = divmod(bits, n_bands)
    sizes = [base + (1 if i < extra else 0) for i in range(n_bands)]
    offsets = [sum(sizes[:i]) for i in range(n_bands)]
    # Band over DISTINCT signature VALUES, not documents: duplicate
    # signatures are the norm in a near-dup corpus, and doc-level banding
    # would materialize |value group|² rows per colliding band. At value
    # level each signature enters a band bucket once, so the join is
    # K-distinct-sized; doc pairs are recovered afterward by joining the
    # value-pair table back through the signature column (output-sized —
    # the answer itself dominates that cost at any scale).
    vals = sig.select(F.col(sig_col).alias("_v")).distinct()
    bands = F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned(F.col("_v"), off)
            .bitwiseAND(F.lit((1 << sz) - 1)).alias("bv"),
        )
        for i, (off, sz) in enumerate(zip(offsets, sizes))
    ])
    e = vals.select("_v", F.explode(bands).alias("b")).select(
        "_v", F.col("b.band").alias("band"), F.col("b.bv").alias("bv")
    )
    # collect each band bucket's distinct signature values once and emit
    # every unordered pair from the sorted array — the old a⋈b self-join
    # evaluated the distinct+explode upstream once per side (see
    # lsh_candidates for the same rewrite and its equivalence argument)
    grouped = e.groupBy("band", "bv").agg(
        F.array_sort(F.collect_list(F.col("_v"))).alias("_vs")
    )
    vp = (
        grouped.select(F.posexplode("_vs").alias("_i", "_va"), "_vs")
        .select(
            "_va",
            F.explode(
                F.slice("_vs", F.col("_i") + 2, F.size("_vs") - F.col("_i") - 1)
            ).alias("_vb"),
        )
        .distinct()  # a value pair may collide in several bands
        .withColumn(
            "hamming", F.bit_count(F.col("_va").bitwiseXOR(F.col("_vb"))).cast("long")
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    # symmetric closure + identity so one equi-join pass expands every
    # ordered (sig_a, sig_b) combination exactly once
    sym = vp.unionByName(
        vp.select(F.col("_vb").alias("_va"), F.col("_va").alias("_vb"), "hamming")
    )
    ident = vals.select(
        F.col("_v").alias("_va"), F.col("_v").alias("_vb"),
        F.lit(0).cast("long").alias("hamming"),
    )
    allp = sym.unionByName(ident)
    da = sig.select(F.col(id_col).alias("doc_a"), F.col(sig_col).alias("_va"))
    db = sig.select(F.col(id_col).alias("doc_b"), F.col(sig_col).alias("_vb"))
    return (
        da.join(allp, "_va")
        .join(db, "_vb")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "hamming")
    )


_HEX_BIT2 = ["4", "5", "6", "7", "c", "d", "e", "f"]  # hex digit & 0x4


def simhash2(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash as TWO 32-bit halves (id, sh_hi, sh_lo) — the
    scale-correct signature width (round-5 sf1 finding, PLANS.md).

    Two independent bits per md5 hex char: ``sh_hi`` bit j votes on the
    char's high bit (digit ≥ 8 — identical to :func:`simhash`), ``sh_lo``
    bit j votes on bit 2 (digit & 4). Split halves keep every value in
    non-negative int32 range, so no engine has to reason about the sign
    bit of a packed 64-bit signature (DuckDB and Spark disagree on
    ``1 << 63`` overflow); Hamming distance is the sum of the two
    bit_count(xor) terms. Same single width-64 partial aggregate shape
    as :func:`simhash` — one shuffle, no row blowup."""
    tok = tokens(df, id_col, text_col, distinct=True)
    h = F.md5(F.col("token"))
    vote = [
        F.sum(
            F.when(F.substring(h, j, 1).isin(_HEX_HIGH), F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"_h{j}")
        for j in range(1, 33)
    ] + [
        F.sum(
            F.when(F.substring(h, j, 1).isin(_HEX_BIT2), F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"_l{j}")
        for j in range(1, 33)
    ]
    votes = tok.groupBy(id_col).agg(*vote)

    def pack(prefix: str):
        expr = None
        for j in range(1, 33):
            term = F.when(
                F.col(f"_{prefix}{j}") > 0, F.lit(1 << (j - 1)).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            expr = term if expr is None else expr + term
        return expr

    return votes.select(id_col, pack("h").alias("sh_hi"), pack("l").alias("sh_lo"))


def simhash2_pairs(sig: DataFrame, id_col: str = "doc_id",
                   max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming ≤ ``max_hamming`` over 64-bit split
    signatures — pigeonhole over ``max_hamming + 1`` bands of 64 /
    (max_hamming+1) bits (default 4 × 16).

    This exists because :func:`simhash_pairs`' 32-bit / 7-band layout is
    birthday-quadratic: 4-5-bit band values have ≤ 32 distinct values,
    so band buckets grow LINEARLY with the corpus and the band join
    emits O(n²/32) candidate pairs — measured 22× cost at 10× data in
    the round-5 sf1 validation. 16-bit bands have 65,536 values: bucket
    occupancy stays O(n/65536) and the join is linear until the corpus
    approaches millions of DISTINCT signatures per band value, which is
    the regime where you widen again (128-bit SimHash), not a cliff.
    Same distinct-signature-value banding + verify + doc re-expansion
    plan as :func:`simhash_pairs`."""
    if max_hamming not in (1, 3, 7, 15, 31):
        # band width must divide 64 AND stay ≤ 32 bits so every band
        # mask/value fits a non-negative int64 literal (max_hamming=0
        # would need a 64-bit all-ones mask, which LongType can't hold;
        # exact-duplicate signatures are a plain groupBy, not a band join)
        raise ValueError(
            f"max_hamming must be one of 1, 3, 7, 15, 31 (got {max_hamming})"
        )
    sig = cache.pin(sig.select("*"))
    n_bands = max_hamming + 1
    sz = 64 // n_bands
    vals = sig.select(F.col("sh_hi").alias("_ha"), F.col("sh_lo").alias("_la")).distinct()
    bands = []
    for i in range(n_bands):
        off = i * sz
        src = F.col("_ha") if off < 32 else F.col("_la")
        bands.append(
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(src, off % 32)
                .bitwiseAND(F.lit((1 << sz) - 1)).alias("bv"),
            )
        )
    e = vals.select("_ha", "_la", F.explode(F.array(*bands)).alias("b")).select(
        "_ha", "_la", F.col("b.band").alias("band"), F.col("b.bv").alias("bv")
    )
    ham = (
        F.bit_count(F.col("_haa").bitwiseXOR(F.col("_hab")))
        + F.bit_count(F.col("_laa").bitwiseXOR(F.col("_lab")))
    ).cast("long")
    # same self-join-free pair generation as simhash_pairs/lsh_candidates;
    # array_sort on struct(_ha, _la) orders lexicographically by field,
    # which is exactly the old (_haa < _hab) OR (== AND _laa < _lab) rule
    grouped = e.groupBy("band", "bv").agg(
        F.array_sort(F.collect_list(F.struct("_ha", "_la"))).alias("_vs")
    )
    vp = (
        grouped.select(F.posexplode("_vs").alias("_i", "_a"), "_vs")
        .select(
            "_a",
            F.explode(
                F.slice("_vs", F.col("_i") + 2, F.size("_vs") - F.col("_i") - 1)
            ).alias("_b"),
        )
        .select(
            F.col("_a._ha").alias("_haa"), F.col("_a._la").alias("_laa"),
            F.col("_b._ha").alias("_hab"), F.col("_b._la").alias("_lab"),
        )
        .distinct()
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
    )
    sym = vp.unionByName(
        vp.select(
            F.col("_hab").alias("_haa"), F.col("_lab").alias("_laa"),
            F.col("_haa").alias("_hab"), F.col("_laa").alias("_lab"), "hamming",
        )
    )
    ident = vals.select(
        F.col("_ha").alias("_haa"), F.col("_la").alias("_laa"),
        F.col("_ha").alias("_hab"), F.col("_la").alias("_lab"),
        F.lit(0).cast("long").alias("hamming"),
    )
    allp = sym.unionByName(ident)
    da = sig.select(
        F.col(id_col).alias("doc_a"),
        F.col("sh_hi").alias("_haa"), F.col("sh_lo").alias("_laa"),
    )
    db = sig.select(
        F.col(id_col).alias("doc_b"),
        F.col("sh_hi").alias("_hab"), F.col("sh_lo").alias("_lab"),
    )
    return (
        da.join(allp, ["_haa", "_laa"])
        .join(db, ["_hab", "_lab"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "hamming")
    )


def embedding_near_dups(df: DataFrame, id_col: str, vec_col: str,
                        threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via the similarity module's
    deterministic decimal dot products (see operators/similarity.py)."""
    from reactivedb_spark.operators.similarity import cosine_pairs

    return cosine_pairs(df, id_col, vec_col).filter(F.col("cos_sim") >= threshold)
