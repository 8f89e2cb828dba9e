"""Decomposable-aggregate coverage audit (VERDICT r5 #8): for any config
the static classifier accepts, the native partial-aggregation path must
compute EXACTLY what the general ordered fold computes — the fold is the
reference-exact semantics (transform.rs:250-266), the native path is the
O(delta)/partial-aggregable execution the engine prefers. Random
decomposable configs (sum-like + last + memo-post statements over
integer arithmetic) are generated from the grammar the classifier
accepts and both paths are compared row-for-row.

Classification contract (documented in PLANS.md round-6):
- ``d ~ memo.d + E`` (E memo-free)        → native SUM, O(delta) merge
- ``d ~ E`` (memo-free)                   → native LAST (max-by-_seq)
- ``d ~ f(memo.sums/lasts only)``         → post-projection on aggregates
- anything else (self-multiplying memos, cross-memo accumulation,
  memo+column mixes) → ordered fold, O(group) per affected key
"""

import random

import pytest
from pyspark.sql import functions as F

from reactivedb_spark import constants as C
from reactivedb_spark.config import AggregationTransformConfig
from reactivedb_spark.expr.parser import parse_statement
from reactivedb_spark.operators import aggregation

TERMS = ["1", "a", "b", "a + b", "a * 2", "(a - b) * 3", "a * a"]


def _random_cfg(rng: random.Random) -> AggregationTransformConfig:
    stmts, memos = [], []
    for i in range(rng.randint(1, 3)):
        d, t = f"s{i}", rng.choice(TERMS)
        # memo on either side of +, or memo-left minus — all sum folds
        form = rng.randint(0, 2)
        stmts.append([f"{d} ~ memo.{d} + ({t})",
                      f"{d} ~ ({t}) + memo.{d}",
                      f"{d} ~ memo.{d} - ({t})"][form])
        memos.append(d)
    if rng.random() < 0.7:
        stmts.append(f"last0 ~ {rng.choice(TERMS)}")
        memos.append("last0")
    for i in range(rng.randint(0, 2)):
        x, y = rng.choice(memos), rng.choice(memos)
        op = rng.choice(["+", "-", "*", "/"])
        stmts.append(f"p{i} ~ memo.{x} {op} memo.{y}")
    return AggregationTransformConfig(
        "src", "k", tuple(parse_statement(s) for s in stmts)
    )


def _rows_df(spark, rng: random.Random, n=200, keys=7):
    # ~8% NULLs per value column: the fold NULL-poisons the accumulator
    # from the first NULL term on, and the native path must reproduce
    # that exactly (r12 fold-fuzz finding: bare F.sum silently SKIPPED
    # null terms, diverging from the reference's sequential semantics)
    rows = [
        (f"e{i}", i + 1, i % keys,
         None if rng.random() < 0.08 else rng.randint(-50, 100),
         None if rng.random() < 0.08 else rng.randint(-20, 60))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, f"{C.ENTRY_ID} string, {C.SEQ} long, k long, a long, b long"
    )


def _collect(df, dests):
    out = {}
    for r in df.collect():
        d = r.asDict()
        out[d[C.AGGREGATED_COLUMN]] = tuple(d[name] for name in dests)
    return out


@pytest.mark.parametrize("seed", [11, 23, 37, 41, 59, 73, 97, 113])
def test_decomposable_path_matches_general_fold(spark, monkeypatch, seed):
    rng = random.Random(seed)
    cfg = _random_cfg(rng)
    assert aggregation.classify(cfg) is not None, "generator must stay decomposable"
    df = _rows_df(spark, rng)
    dests = [st.dest for st in cfg.functions]

    native = _collect(aggregation.compute_groups(cfg, df), dests)
    monkeypatch.setattr(aggregation, "classify", lambda _cfg: None)
    folded = _collect(aggregation.compute_groups(cfg, df), dests)

    assert native.keys() == folded.keys()
    for k in native:
        assert native[k] == folded[k], (
            f"seed={seed} key={k} dests={dests} "
            f"stmts={[str(st.expr) for st in cfg.functions]} "
            f"native={native[k]} folded={folded[k]}"
        )


@pytest.mark.parametrize("stmt,decomposable", [
    ("s ~ memo.s + a", True),
    ("s ~ a + memo.s", True),
    ("s ~ memo.s + (a * a - b)", True),
    ("l ~ a * 2", True),
    ("m ~ (memo.m * 2) + a", False),       # self-multiplying memo
    ("m ~ memo.m + memo.m", False),        # memo on both sides of +
    ("m ~ memo.m - a", True),              # minus fold = sum of -a
    ("m ~ a - memo.m", False),             # alternating sign: not a sum
    ("m ~ memo.m + a * memo.m", False),    # memo inside the added term
])
def test_classification_table(stmt, decomposable):
    cfg = AggregationTransformConfig("src", "k", (parse_statement(stmt),))
    assert (aggregation.classify(cfg) is not None) == decomposable
