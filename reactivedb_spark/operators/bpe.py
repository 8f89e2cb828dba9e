"""Distributed BPE vocabulary TRAINING (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
iterative merge-learning loop that produces the merge table
``functions/text.py``'s tokenizers consume.

Spark-first shape: the corpus collapses to a WORD-FREQUENCY relation
first (one shuffle; at web scale the vocabulary is ~10⁸ rows — small
next to the corpus), and every merge round is ONE aggregation over that
relation (adjacent-pair counts weighted by word frequency, map-side
combined) plus a single-ROW driver pull (the argmax pair — the same
bounded-pull pattern as the IVF centroid loop). The per-round rewrite
is a JVM string ``replace``, never a Python UDF; ``localCheckpoint``-
free because each round's plan is one narrow projection over the pinned
previous round.

Determinism contract (oracle-replayed, tests/test_oracle_parity):
- symbols start as the word's characters joined by single spaces with
  sentinel spaces at both ends;
- best pair = max Σ word-count, ties by (left, right) ascending;
- the merge applies ``replace(s, ' l r ', ' lr ')`` exactly ``passes``
  times (adjacent occurrences share a separator space, so one pass
  merges alternate occurrences; ``passes`` = 6 reaches the fixpoint for
  identical-pair runs up to 2⁶ — declared, and identical in any engine
  with standard left-to-right non-overlapping replace semantics).

Batched merge learning (``batch`` > 1, VERDICT r7 #4): one aggregation
round learns up to ``batch`` merges, so a 32k-merge production
vocabulary costs 32k/batch Spark jobs instead of 32k. Selection rule
(deterministic AND purely relational, so the SQL oracle replays it):

- rank this round's pairs by (n desc, left, right) and keep the top
  ``top_c`` (= 16·batch) CANDIDATES — the bounded driver pull;
- a candidate QUALIFIES iff no higher-ranked candidate shares a symbol
  with it (dominance filter). Qualifying pairs are pairwise
  symbol-DISJOINT — {l,r} sets never intersect — so their replaces
  touch disjoint symbol occurrences, commute, and each selected pair's
  pre-round count stays exact after the other replaces apply;
- the round schedule is FIXED: ceil(merges/batch) rounds, round r
  selecting the first min(batch, merges−batch·r) qualifying pairs by
  rank; merge_rank numbers them sequentially across rounds. Rank 1
  always qualifies, so every non-empty round learns ≥ 1 merge; a round
  may under-fill when the dominance filter thins the candidates, and
  the shortfall is NOT made up by extra rounds — total merges simply
  fall short, identically on both engines (declared; keeps the round
  count static so the SQL oracle unrolls it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from reactivedb_spark import cache


def _select_batch(ranked_rows, limit: int) -> list:
    """Dominance-filtered batch selection over the (already ranked)
    candidate rows: a candidate qualifies iff NO higher-ranked candidate
    shares a symbol with it; the first ``limit`` qualifying rows win.
    Driver-side over ≤ top_c rows — the oracle replays the same rule
    relationally (NOT EXISTS over rank-lower symbol overlap)."""
    out = []
    for i, row in enumerate(ranked_rows):
        syms = {row["l"], row["r"]}
        dominated = any(
            q["l"] in syms or q["r"] in syms for q in ranked_rows[:i]
        )
        if not dominated:
            out.append(row)
            if len(out) == limit:
                break
    return out


def bpe_train(df: DataFrame, text_col: str, merges: int = 6,
              passes: int = 6, batch: int = 1) -> DataFrame:
    """Learn ``merges`` BPE merges from the corpus; emits one row per
    learned merge: (merge_rank, left_sym, right_sym, n_pair).
    ``batch`` > 1 learns up to that many symbol-disjoint merges per
    aggregation round (module docstring: the dominance-filter rule)."""
    spark = df.sparkSession
    batch = max(1, int(batch))
    top_c = 16 * batch
    words = (
        df.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    cur = cache.pin(words.select(
        F.concat(F.lit(" "), F.concat_ws(" ", F.split("w", "")), F.lit(" "))
        .alias("s"),
        "cnt",
    ))
    learned = []
    # FIXED round schedule (static, so the oracle unrolls identically):
    # ceil(merges/batch) rounds, round r capped at min(batch, merges−b·r).
    # A round that under-fills is NOT made up by extra rounds — the total
    # simply falls short, on both engines alike.
    n_rounds = -(-int(merges) // batch)
    for rnd in range(n_rounds):
        pairs = (
            cur.select("cnt", F.split(F.trim(F.col("s")), " ").alias("arr"))
            .select("cnt", F.explode(F.expr(
                # sequence(1, 0) DESCENDS in Spark: single-symbol words
                # must short-circuit to an empty pair list
                "CASE WHEN size(arr) < 2 THEN"
                " array()::array<struct<l string, r string>>"
                " ELSE transform(sequence(1, size(arr) - 1),"
                " i -> struct(arr[i-1] AS l, arr[i] AS r)) END")).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").cast("long").alias("n"))
        )
        cand = pairs.orderBy(F.col("n").desc(), "l", "r").limit(top_c).collect()
        picked = _select_batch(cand, min(batch, int(merges) - batch * rnd))
        if not picked:
            break
        col = F.col("s")
        for row in picked:
            left, right, n = row["l"], row["r"], int(row["n"])
            learned.append((len(learned) + 1, left, right, n))
            for _ in range(int(passes)):
                col = F.replace(
                    col, F.lit(f" {left} {right} "), F.lit(f" {left}{right} ")
                )
        cur = cache.pin(cur.select(col.alias("s"), "cnt"))
    return spark.createDataFrame(
        learned, "merge_rank int, left_sym string, right_sym string, n_pair long"
    )


def bpe_encode(df: DataFrame, id_col: str, text_col: str, merges: int = 6,
               passes: int = 6) -> DataFrame:
    """Tokenize the corpus with a vocabulary TRAINED ON ITSELF — the
    apply half of :func:`bpe_train` (train → encode is the full
    Sennrich pipeline). Emits (id, n_tokens): the per-document symbol
    count after the learned merges.

    Plan shape (100 TB): training runs on the word-frequency relation
    (see bpe_train); the learned merge table is ≤ ``merges`` rows and
    comes to the driver (the bounded argmax pulls already did), so the
    ENCODE is a constant JVM replace chain over the DISTINCT-word
    relation — vocabulary-sized, not corpus-sized — and one equi-join
    back to the (id, word) occurrences with a final per-id sum. No
    Python anywhere; the corpus is touched exactly twice (word counts,
    occurrence join).

    Documents with no tokens carry no row (declared; the oracle's
    inner join drops them identically).
    """
    trained = bpe_train(df, text_col, merges=merges, passes=passes).collect()
    occurrences = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), " ")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    vocab = occurrences.select("w").distinct().select(
        "w",
        F.concat(F.lit(" "), F.concat_ws(" ", F.split("w", "")), F.lit(" "))
        .alias("s"),
    )
    col = F.col("s")
    for m in sorted(trained, key=lambda r: r["merge_rank"]):
        left, right = m["left_sym"], m["right_sym"]
        for _ in range(int(passes)):
            col = F.replace(
                col, F.lit(f" {left} {right} "), F.lit(f" {left}{right} ")
            )
    counts = vocab.select(
        "w", F.size(F.split(F.trim(col), " ")).cast("long").alias("n_sym")
    )
    return (
        occurrences.join(counts, "w")
        .groupBy(id_col)
        .agg(F.sum("n_sym").cast("long").alias("n_tokens"))
    )
