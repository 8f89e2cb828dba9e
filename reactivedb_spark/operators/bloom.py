"""Bloom-filter join pruning: cut a big-side scan before the shuffle.

At 100 TB the expensive part of ``big ⋉ small`` is shuffling the big
side; when the small side's key set fits a few KB of bits, a Bloom
prefilter evaluated INSIDE the big side's scan (pure column exprs →
whole-stage codegen, map-side work) drops most non-matching rows before
any exchange. The exact semi-join still runs afterward — the Bloom
filter only prunes, so false positives cost a little work and never
correctness (and false negatives are impossible).

Spark has ``spark.sql.optimizer.runtime.bloomFilter.enabled`` for this
pattern inside Catalyst; this operator is the explicit, engine-portable
version: bit positions are seeded XXH64 hashes (the public xxHash
algorithm — Spark's ``xxhash64``, and standard implementations in
DuckDB/ClickHouse/etc.), so any engine or external writer can build or
probe the same filter. xxhash64 is JVM-native and an order of magnitude
cheaper per probe than the md5-substring-conv chain the dedup/sketch
families use — and unlike there, nothing here needs md5's cross-engine
ORACLE reproducibility: the exact semi-join makes results independent
of the hash function.

Build side is distributed: each key explodes to its k bit positions,
one ``bit_or`` aggregation packs them into ``m/64`` longs, and only
that word array (a few KB) reaches the driver — never the keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_BITS = 1 << 15  # 32768 bits = 4 KiB
DEFAULT_K = 4


def _round_bits(m_bits: int) -> int:
    """Filters are stored as 64-bit words, and the probe side derives
    the modulus from ``len(words) * 64`` — so build and probe must agree
    on a word-aligned bit count. Round up here, in the one place both
    paths go through, or a non-multiple-of-64 ``m_bits`` would give the
    build a smaller hash space than the probe (silent false negatives).
    """
    if m_bits <= 0:
        raise ValueError(f"m_bits must be positive, got {m_bits}")
    return (m_bits + 63) // 64 * 64


def _probe_positions(col: Column, k: int, m_bits: int) -> list[Column]:
    """k bit positions per value: independent seed-prefixed xxhash64
    values, each reduced to [0, m_bits) with a sign-safe mod (xxhash64
    is signed int64)."""
    return [
        F.pmod(F.xxhash64(F.lit(i), col.cast("string")), F.lit(m_bits)).cast("long")
        for i in range(1, k + 1)
    ]


def _shiftleft_col(value: Column, count: Column) -> Column:
    """shiftleft with a COLUMN shift count (the python helper only takes
    a literal int): route through the SQL function registry."""
    return F.call_function("shiftleft", value, count)


def build_bloom(df: DataFrame, col: str, m_bits: int = DEFAULT_BITS,
                k: int = DEFAULT_K) -> list[int]:
    """Pack the key set into an ``m_bits``-bit filter; returns the
    ``m_bits/64`` words (driver-side, a few KB — never the keys).
    ``m_bits`` is rounded up to a multiple of 64 (word storage)."""
    m_bits = _round_bits(m_bits)
    n_words = m_bits // 64
    pos = _probe_positions(F.col(col), k, m_bits)
    exploded = df.select(F.explode(F.array(*pos)).alias("p")).select(
        (F.col("p") / 64).cast("long").alias("w"),
        _shiftleft_col(F.lit(1).cast("long"), (F.col("p") % 64).cast("int")).alias("bit"),
    )
    words = exploded.groupBy("w").agg(F.bit_or("bit").alias("word")).collect()
    out = [0] * n_words
    for r in words:
        out[int(r["w"])] = int(r["word"])
    return out


def bloom_might_contain(col: Column, words: list[int], k: int = DEFAULT_K) -> Column:
    """Membership test as a pure column expression: AND of k bit probes
    against the literal word array — codegen-friendly, no Python, no
    false negatives."""
    m_bits = len(words) * 64
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = None
    for p in _probe_positions(col, k, m_bits):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        test = word.bitwiseAND(
            _shiftleft_col(F.lit(1).cast("long"), (p % 64).cast("int"))
        ) != 0
        cond = test if cond is None else cond & test
    return cond


def bloom_semi_join(big: DataFrame, small: DataFrame, on: str,
                    m_bits: int = DEFAULT_BITS, k: int = DEFAULT_K) -> DataFrame:
    """``big ⋉ small`` with a Bloom prefilter on the big side's scan.

    Exact: the final left-semi join removes Bloom false positives, so
    the result equals a plain semi-join — the filter only reduces the
    rows that reach the shuffle.
    """
    words = build_bloom(small.select(on), on, m_bits, k)
    pruned = big.filter(bloom_might_contain(F.col(on), words, k))
    return pruned.join(small.select(on).distinct(), on, "left_semi")
