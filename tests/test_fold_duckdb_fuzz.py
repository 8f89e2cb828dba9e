"""AggregationTransform memo-fold fuzz vs a DuckDB ordered-replay oracle
(VERDICT r11 #6): ≥1k random well-typed ``dest ~ expr`` assignment lists
— ``memo.*``-referencing, int and decimal, NULL-bearing rows — run
through the engine's aggregation path (``compute_groups``: the NATIVE
decomposable plan when ``classify`` accepts, the general ordered fold
otherwise) and compared against an independent DuckDB row-stepped replay of the
reference's sequential left-fold semantics
(transform.rs:229-275: memo init Integer(0), statements applied
left-to-right per row, each seeing the memos already updated by earlier
statements on the SAME row; refs to later dests see the previous row).

The oracle reuses the scalar fuzz's coefficient-space decimal macros
(test_dsl_duckdb_fuzz._MACROS): decimal memos ride as scale-18 HUGEINT
coefficients, so the (19,9) operand contract (HALF_UP, overflow⇒NULL)
replays exactly. Integer ops ride as lguard'd HUGEINTs — the guard is
unreachable at the generator's magnitude bounds (each INT statement
carries at most ONE memo leaf, so values grow additively, < ~5e11; a
trip would surface as a value mismatch, not a silent wrap).

Writing this fuzz found two real bugs (fixed in this round):
1. the decomposable path's bare ``F.sum`` SKIPPED null terms where the
   sequential fold NULL-poisons the memo from the first null on;
2. Spark's ``aggregate()`` with a STRUCT accumulator silently rewrites
   a NULL field to the field's zero — the general fold now encodes each
   memo as a never-null (is_null, value) pair.
"""

from __future__ import annotations

import random
from decimal import Decimal

import duckdb
import pytest
from pyspark.sql import types as T

from reactivedb_spark import constants as C
from reactivedb_spark.config import AggregationTransformConfig
from reactivedb_spark.errors import ConfigError, ExpressionError
from reactivedb_spark.expr.ast import BinOp, ColumnRef, Expr, FuncCall, Literal, MemoRef
from reactivedb_spark.expr.parser import parse_statement
from reactivedb_spark.operators import aggregation
from tests.test_dsl_duckdb_fuzz import _MACROS, P18

N_CONFIGS = 200
SEED = 0xF01D  # deterministic: green once == green always
MIN_STATEMENTS = 1000

INT, DEC = "int", "dec"

# -- fixture rows: 4 groups of 2/3/4/5 rows, ~15% NULLs per value column ------

_KEYS = [(0, 2), (1, 3), (2, 4), (3, 5)]


def _rows(rng: random.Random):
    rows, seq = [], 0
    for k, n in _KEYS:
        for _ in range(n):
            seq += 1
            v1 = None if rng.random() < 0.15 else rng.randint(-999, 999)
            v2 = None if rng.random() < 0.15 else rng.randint(-999, 999)
            w1 = (None if rng.random() < 0.15 else
                  Decimal(rng.randint(-999_999, 999_999)).scaleb(-3))
            rows.append((f"e{seq}", seq, k, v1, v2, w1))
    return rows


_SPARK_SCHEMA = T.StructType([
    T.StructField(C.ENTRY_ID, T.StringType()),
    T.StructField(C.SEQ, T.LongType()),
    T.StructField("k", T.LongType()),
    T.StructField("v1", T.LongType()),
    T.StructField("v2", T.LongType()),
    T.StructField("w1", T.DecimalType(38, 18)),
])

_COLS = {INT: ["v1", "v2"], DEC: ["w1"]}


# -- generator: typed assignment lists ----------------------------------------

class FoldGen:
    """Each config: 3-7 dests, each INT or DEC, expr of matching type.
    INT statements carry at most ONE memo leaf in integer-arithmetic
    position (additive growth only — long overflow is session-defined,
    so it must stay unreachable); DEC statements reference memos freely
    (the (19,9) operand guard saturates to NULL identically on both
    engines). ``*`` between INT operands is memo-free and leaf-level."""

    def __init__(self, rng: random.Random, kinds: dict[str, str]):
        self.r = rng
        self.kinds = kinds  # dest -> INT | DEC
        self.int_memo_budget = 0
        self.memo_budget = 0

    def statement(self, dest: str) -> Expr:
        self.int_memo_budget = 1
        self.memo_budget = 3  # caps cross-ref tree nesting (analysis cost)
        t = self.kinds[dest]
        # bias toward memo-referencing shapes: pure projections are the
        # scalar fuzz's turf
        e = self.expr(t, 2)
        if not any(isinstance(n, MemoRef) for n in e.walk()):
            m = self._memo_leaf(t)
            if m is not None:
                e = BinOp("+" if t == DEC or self.r.random() < 0.8 else "-",
                          m, e)
        return e

    def _memo_leaf(self, t: str):
        opts = [d for d, k in self.kinds.items() if k == t]
        if not opts or self.memo_budget <= 0:
            return None
        if t == INT:
            if self.int_memo_budget <= 0:
                return None
            self.int_memo_budget -= 1
        self.memo_budget -= 1
        return MemoRef(self.r.choice(opts))

    def leaf(self, t: str) -> Expr:
        r = self.r
        if r.random() < 0.3:
            m = self._memo_leaf(t)
            if m is not None:
                return m
        if r.random() < 0.55:
            return ColumnRef(r.choice(_COLS[t]))
        if t == INT:
            return Literal(r.randint(-999, 999))
        return Literal(Decimal(r.randint(-999_999, 999_999)).scaleb(-3))

    def expr(self, t: str, depth: int) -> Expr:
        if depth <= 0 or self.r.random() < 0.3:
            return self.leaf(t)
        return self.int_node(depth) if t == INT else self.dec_node(depth)

    def int_node(self, d: int) -> Expr:
        r = self.r
        pick = r.random()
        if pick < 0.45:
            return BinOp(r.choice("+-/"), self.expr(INT, d - 1),
                         self.expr(INT, d - 1))
        if pick < 0.55:
            # memo-free leaf-level product: bounded |v| <= ~1e6
            budget, self.int_memo_budget = self.int_memo_budget, 0
            e = BinOp("*", self.leaf(INT), self.leaf(INT))
            self.int_memo_budget = budget
            return e
        if pick < 0.7:
            return FuncCall("abs", (self.expr(INT, d - 1),))
        if pick < 0.85:
            return FuncCall(r.choice(["floor", "ceil"]), (self.expr(DEC, d - 1),))
        return FuncCall("coalesce", (self.expr(INT, d - 1), self.expr(INT, d - 1)))

    def dec_node(self, d: int) -> Expr:
        r = self.r
        pick = r.random()
        if pick < 0.6:
            sides = [DEC, r.choice([DEC, INT])]
            r.shuffle(sides)
            return BinOp(r.choice("+-*/"), self.expr(sides[0], d - 1),
                         self.expr(sides[1], d - 1))
        if pick < 0.75:
            return FuncCall("abs", (self.expr(DEC, d - 1),))
        return FuncCall("coalesce", (self.expr(DEC, d - 1),
                                     self.expr(r.choice([DEC, INT]), d - 1)))


def _render(e: Expr) -> str:
    if isinstance(e, Literal):
        v = e.value
        if isinstance(v, Decimal):
            s = f"{v:f}"
            s = s if "." in s else s + ".0"
            return f"({s})" if v < 0 else s
        return f"({v})" if v < 0 else str(v)
    if isinstance(e, ColumnRef):
        return e.name
    if isinstance(e, MemoRef):
        return f"memo.{e.name}"
    if isinstance(e, FuncCall):
        return f"{e.name}({', '.join(_render(a) for a in e.args)})"
    assert isinstance(e, BinOp)
    return f"({_render(e.left)} {e.op} {_render(e.right)})"


# -- DuckDB translation (inline; mirrors test_dsl_duckdb_fuzz._tr for the
# restricted INT/DEC grammar; memo refs become «name» placeholders) -----------

_FOLD_MACROS = """
CREATE MACRO iaddh(a, b) AS lguard(CAST(a AS HUGEINT) + CAST(b AS HUGEINT));
CREATE MACRO isubh(a, b) AS lguard(CAST(a AS HUGEINT) - CAST(b AS HUGEINT));
CREATE MACRO imulh(a, b) AS lguard(CAST(a AS HUGEINT) * CAST(b AS HUGEINT));
CREATE MACRO idivh(a, b) AS CASE
  WHEN b = 0 THEN NULL
  ELSE lguard(CAST(a AS HUGEINT) // CAST(b AS HUGEINT)) END;
"""


def _tr_memo(e: Expr, kinds: dict[str, str], nodes: list,
             prefix: str) -> tuple[str, str, int]:
    """AST → (leaf SQL or node-column name, kind, height). DEC subtrees
    are scale-18 HUGEINT coefficients (c9/i9 operand coercion as in the
    scalar fuzz); INT subtrees are HUGEINTs. Memo refs emit «name»
    placeholders resolved per fold layer; their kind comes from the
    config's memo types. Composite nodes append to ``nodes`` as
    (col_name, sql-over-child-COLUMNS, height) — the same height-layered
    splitting the scalar fuzz needs: a naive inline translation
    re-expands every macro argument's whole subtree (ddivd references
    its args ~5×), which made the replay >10 s/config (measured); as
    column references it is linear."""

    def emit(sql: str, t: str, hs: list) -> tuple[str, str, int]:
        h = max(hs, default=0) + 1
        name = f"{prefix}_{len(nodes)}"
        nodes.append((name, sql, h))
        return name, t, h

    if isinstance(e, MemoRef):
        return f"«{e.name}»", kinds[e.name], 0
    if isinstance(e, Literal):
        v = e.value
        if isinstance(v, Decimal):
            return f"CAST({int(v.scaleb(18))} AS HUGEINT)", DEC, 0
        return f"CAST({v} AS HUGEINT)", INT, 0
    if isinstance(e, ColumnRef):
        if e.name == "w1":
            return "w1_c", DEC, 0
        return f"CAST({e.name} AS HUGEINT)", INT, 0
    if isinstance(e, BinOp):
        ls, lt, lh = _tr_memo(e.left, kinds, nodes, prefix)
        rs, rt, rh = _tr_memo(e.right, kinds, nodes, prefix)
        hs = [lh, rh]
        if DEC in (lt, rt):
            a = f"c9({ls})" if lt == DEC else f"i9({ls})"
            b = f"c9({rs})" if rt == DEC else f"i9({rs})"
            fn = {"+": "dadd", "-": "dsub", "*": "dmul", "/": "ddivd"}[e.op]
            return emit(f"{fn}({a}, {b})", DEC, hs)
        fn = {"+": "iaddh", "-": "isubh", "*": "imulh", "/": "idivh"}[e.op]
        return emit(f"{fn}({ls}, {rs})", INT, hs)
    assert isinstance(e, FuncCall)
    if e.name == "abs":
        s, t, h = _tr_memo(e.args[0], kinds, nodes, prefix)
        return emit(f"abs({s})", t, [h])
    if e.name in ("floor", "ceil"):
        s, t, h = _tr_memo(e.args[0], kinds, nodes, prefix)
        if t == INT:
            return s, INT, h
        return emit(f"{'fl18' if e.name == 'floor' else 'ce18'}({s})",
                    INT, [h])
    assert e.name == "coalesce"
    parts = [_tr_memo(a, kinds, nodes, prefix) for a in e.args]
    hs = [h for _, _, h in parts]
    part_kinds = {t for _, t, _ in parts}
    if part_kinds == {INT}:
        return emit("COALESCE(" + ", ".join(s for s, _, _ in parts) + ")",
                    INT, hs)
    # mixed numeric promotes to DEC (round-11 compiler contract)
    lifted = [s if t == DEC else f"(CAST({s} AS HUGEINT) * {P18})"
              for s, t, _ in parts]
    return emit("COALESCE(" + ", ".join(lifted) + ")", DEC, hs)


def _decomposable_candidate(rng: random.Random, n: int):
    """Candidate built from the grammar ``classify`` accepts (sum-like /
    last / memo-only post), so the NATIVE partial-aggregation path gets
    real fuzz coverage too — random free-form statements almost never
    land decomposable. INT posts avoid ``*`` (the product of two ~5e10
    sums would exceed long, and long overflow is session-defined)."""
    kinds: dict[str, str] = {}
    stmts: list[str] = []
    n_post = rng.randint(0, min(2, n - 1))
    firsts = [f"d{i}" for i in range(n - n_post)]
    for d in firsts:
        t = rng.choice([INT, INT, DEC])
        kinds[d] = t
        gen = FoldGen(rng, {})  # no memo leaves inside the term
        term = _render(gen.expr(t, 2))
        form = rng.randrange(4)
        if form == 0:
            stmts.append(f"{d} ~ (memo.{d} + ({term}))")
        elif form == 1:
            stmts.append(f"{d} ~ (({term}) + memo.{d})")
        elif form == 2:
            stmts.append(f"{d} ~ (memo.{d} - ({term}))")  # minus fold
        else:
            stmts.append(f"{d} ~ ({term})")  # last (max-by-_seq)
    for j in range(n_post):
        d = f"d{n - n_post + j}"
        x, y = rng.choice(firsts), rng.choice(firsts)
        both_int = kinds[x] == INT and kinds[y] == INT
        op = rng.choice("+-/" if both_int else "+-*/")
        kinds[d] = INT if both_int else DEC
        stmts.append(f"{d} ~ (memo.{x} {op} memo.{y})")
    return kinds, stmts


def _hlit(v) -> str:
    return "CAST(NULL AS HUGEINT)" if v is None else f"CAST('{v}' AS HUGEINT)"


def _replay_key(con, dests: list[str], stmt_trs: list, key_rows):
    """DuckDB ordered replay of one group, row by row: memos init
    Integer(0); per row, the k statements evaluate as height-layered
    SELECT levels, so statement i sees NEW values of dests < i (same
    row, m_*) and PREVIOUS values of dests >= i (p_*) — exactly the
    reference's left-to-right fold (transform.rs:250-266). DuckDB does
    ALL the arithmetic; Python only shuttles the accumulator between
    rows. (A single recursive-CTE formulation is equivalent but hits
    pathological DuckDB planning — 20-40 s/config, measured.)"""
    mem = {d: 0 for d in dests}
    for v1, v2, w1c in key_rows:
        base_cols = [
            ("CAST(NULL AS BIGINT)" if v1 is None else
             f"CAST({v1} AS BIGINT)") + " AS v1",
            ("CAST(NULL AS BIGINT)" if v2 is None else
             f"CAST({v2} AS BIGINT)") + " AS v2",
            _hlit(w1c) + " AS w1_c",
        ] + [f"{_hlit(mem[d])} AS p_{d}" for d in dests]
        inner = "SELECT " + ", ".join(base_cols)
        for i, (d, (nodes, final_sql)) in enumerate(zip(dests, stmt_trs)):
            def rp(sql: str) -> str:
                for j, dj in enumerate(dests):
                    sql = sql.replace(f"«{dj}»",
                                      f"m_{dj}" if j < i else f"p_{dj}")
                return sql

            by_h: dict[int, list] = {}
            for name, sql, h in nodes:
                by_h.setdefault(h, []).append((name, sql))
            for h in sorted(by_h):
                defs = ", ".join(f"({rp(sql)}) AS {name}"
                                 for name, sql in by_h[h])
                inner = f"SELECT *, {defs} FROM ({inner})"
            inner = f"SELECT *, ({rp(final_sql)}) AS m_{d} FROM ({inner})"
        row = con.execute(
            f"SELECT {', '.join(f'm_{d}' for d in dests)} FROM ({inner})"
        ).fetchone()
        mem = dict(zip(dests, (None if v is None else int(v) for v in row)))
    return tuple(mem[d] for d in dests)


def _canon_spark(v, kind: str):
    if v is None:
        return None
    if kind == DEC:
        return int(v.scaleb(18).to_integral_value())
    return int(v)


def test_fold_fuzz_vs_duckdb(spark):
    from concurrent.futures import ThreadPoolExecutor

    rng = random.Random(SEED)
    rows = _rows(rng)
    sdf = spark.createDataFrame(rows, _SPARK_SCHEMA)

    by_key: dict[int, list] = {}
    for _eid, _seq, k, v1, v2, w1 in rows:  # rows are already seq-ordered
        by_key.setdefault(k, []).append(
            (v1, v2, None if w1 is None else int(w1.scaleb(18))))

    # Candidate generation is pure-Python and stays SERIAL (deterministic
    # rng stream); the expensive memo_types fixpoint (py4j-bound Column
    # building per statement per iteration — the dominant cost at this
    # scale) validates across threads, then the first N_CONFIGS
    # surviving candidates are taken IN ORDER (still deterministic).
    candidates = []
    for ci in range(int(N_CONFIGS * 1.8)):
        n = rng.randint(4, 7)
        if ci % 3 == 0:  # every 3rd: the classifier-accepted grammar,
            # so the native partial-aggregate path is fuzzed too
            candidates.append(_decomposable_candidate(rng, n))
            continue
        kinds = {f"d{i}": rng.choice([INT, INT, DEC]) for i in range(n)}
        gen = FoldGen(rng, kinds)
        stmts = [f"{d} ~ {_render(gen.statement(d))}" for d in kinds]
        candidates.append((kinds, stmts))

    def validate(item):
        kinds, stmts = item
        try:
            cfg = AggregationTransformConfig(
                "src", "k", tuple(parse_statement(s) for s in stmts))
            mtypes = aggregation.memo_types(cfg, _SPARK_SCHEMA)
        except (ConfigError, ExpressionError):
            return None
        got = {d: (DEC if isinstance(t, T.DecimalType) else INT)
               for d, t in mtypes.items()}
        if got != kinds:  # planned types must survive the fixpoint
            return None
        return cfg, kinds, stmts

    with ThreadPoolExecutor(12) as ex:
        validated = list(ex.map(validate, candidates))
    configs = [c for c in validated if c is not None][:N_CONFIGS]
    assert len(configs) >= N_CONFIGS * 0.5, (
        f"generator mostly ill-typed: {len(configs)}/{len(candidates)}")

    # Spark leg: the engine's own path chooser (native when classify
    # accepts, ordered fold otherwise), jobs across threads
    def run_spark(item, strategy="auto"):
        cfg, kinds, _stmts = item
        out = {}
        df = aggregation.compute_groups(cfg, sdf, fold_strategy=strategy)
        for r in df.collect():
            d = r.asDict()
            out[d[C.AGGREGATED_COLUMN]] = tuple(
                _canon_spark(d[st.dest], kinds[st.dest])
                for st in cfg.functions)
        return out

    with ThreadPoolExecutor(8) as ex:
        spark_results = list(ex.map(run_spark, configs))
        # second leg (VERDICT r12 #4): the SAME configs through the
        # memory-bounded streaming fold — the Python evaluator must match
        # the JVM paths and the DuckDB replay statement for statement
        stream_results = list(ex.map(
            lambda it: run_spark(it, "stream"), configs))

    # DuckDB replay leg: one serial connection, bounded memory (the
    # spark fixture's JVM already owns most of the address space; a
    # per-thread connection pool OOM'd the process here)
    con = duckdb.connect()
    con.execute("SET memory_limit='512MB'")
    con.execute("SET threads=2")
    for stmt in (_MACROS + _FOLD_MACROS).split(";"):
        if stmt.strip():
            con.execute(stmt)

    def run_oracle(item):
        cfg, kinds, stmts = item
        dests = [st.dest for st in cfg.functions]
        stmt_trs = []
        for i, st in enumerate(cfg.functions):
            nodes: list = []
            sql, t, _h = _tr_memo(st.expr, kinds, nodes, f"s{i}")
            assert t == kinds[st.dest], (stmts, st.dest, t)
            stmt_trs.append((nodes, sql))
        return {k: _replay_key(con, dests, stmt_trs, key_rows)
                for k, key_rows in by_key.items()}

    oracle_results = [run_oracle(item) for item in configs]

    n_statements = n_decomposable = n_general = 0
    mismatches = []
    for (cfg, kinds, stmts), got, got_stream, want in zip(
            configs, spark_results, stream_results, oracle_results):
        n_statements += len(cfg.functions)
        if aggregation.classify(cfg) is not None:
            n_decomposable += 1
        else:
            n_general += 1
        if got != want:
            mismatches.append(("auto", stmts,
                               {k: (got.get(k), want.get(k))
                                for k in set(got) | set(want)
                                if got.get(k) != want.get(k)}))
        if got_stream != want:
            mismatches.append(("stream", stmts,
                               {k: (got_stream.get(k), want.get(k))
                                for k in set(got_stream) | set(want)
                                if got_stream.get(k) != want.get(k)}))

    assert not mismatches, f"{len(mismatches)} diverging configs; first 3: " \
                           f"{mismatches[:3]}"
    assert n_statements >= MIN_STATEMENTS, n_statements
    # both execution paths must actually be exercised
    assert n_decomposable >= 25, n_decomposable
    assert n_general >= 50, n_general


# -- decimal mid-sequence overflow leg (VERDICT r12 #8) -----------------------
#
# Magnitudes that CROSS the (19,9) operand bound mid-fold: |w1| <= 8e9, so
# two same-sign adds exceed 1e10 (the memo operand then try_casts to NULL
# and the fold stays poisoned), while every individual term stays castable.
# Both general-fold paths (JVM array + Arrow streaming) must replay the
# crossings exactly as the DuckDB coefficient-space oracle (c9's >= 1e19
# coefficient saturation IS the (19,9) bound). The decomposable NATIVE
# path is deliberately absent here: its divergence on re-entering
# crossings is the DECLARED contract, pinned separately below.

N_OVERFLOW_CONFIGS = 40


def _overflow_rows(rng: random.Random):
    rows, seq = [], 0
    for k, n in _KEYS:
        for _ in range(n):
            seq += 1
            v1 = None if rng.random() < 0.15 else rng.randint(-999, 999)
            v2 = None if rng.random() < 0.15 else rng.randint(-999, 999)
            w1 = (None if rng.random() < 0.1 else
                  Decimal(rng.randint(-8_000_000_000_000, 8_000_000_000_000))
                  .scaleb(-3))
            rows.append((f"e{seq}", seq, k, v1, v2, w1))
    return rows


def test_fold_fuzz_decimal_overflow_leg(spark):
    from concurrent.futures import ThreadPoolExecutor

    rng = random.Random(0xD0C5)
    rows = _overflow_rows(rng)
    sdf = spark.createDataFrame(rows, _SPARK_SCHEMA)
    by_key: dict[int, list] = {}
    for _eid, _seq, k, v1, v2, w1 in rows:
        by_key.setdefault(k, []).append(
            (v1, v2, None if w1 is None else int(w1.scaleb(18))))

    candidates = []
    for _ in range(int(N_OVERFLOW_CONFIGS * 1.6)):
        n = rng.randint(3, 5)
        kinds = {f"d{i}": DEC for i in range(n)}
        gen = FoldGen(rng, kinds)
        stmts = [f"{d} ~ {_render(gen.statement(d))}" for d in kinds]
        candidates.append((kinds, stmts))

    configs = []
    for kinds, stmts in candidates:
        try:
            cfg = AggregationTransformConfig(
                "src", "k", tuple(parse_statement(s) for s in stmts))
            mtypes = aggregation.memo_types(cfg, _SPARK_SCHEMA)
        except (ConfigError, ExpressionError):
            continue
        if all(isinstance(t, T.DecimalType) for t in mtypes.values()):
            configs.append((cfg, kinds, stmts))
        if len(configs) == N_OVERFLOW_CONFIGS:
            break
    assert len(configs) >= N_OVERFLOW_CONFIGS * 0.75, len(configs)

    def run(item, strategy):
        cfg, kinds, _stmts = item
        out = {}
        df = aggregation.compute_groups(cfg, sdf, fold_strategy=strategy)
        for r in df.collect():
            d = r.asDict()
            out[d[C.AGGREGATED_COLUMN]] = tuple(
                _canon_spark(d[st.dest], kinds[st.dest])
                for st in cfg.functions)
        return out

    with ThreadPoolExecutor(8) as ex:
        array_results = list(ex.map(lambda it: run(it, "array"), configs))
        stream_results = list(ex.map(lambda it: run(it, "stream"), configs))

    con = duckdb.connect()
    con.execute("SET memory_limit='512MB'")
    con.execute("SET threads=2")
    for stmt in (_MACROS + _FOLD_MACROS).split(";"):
        if stmt.strip():
            con.execute(stmt)

    mismatches, n_null, n_val = [], 0, 0
    for (cfg, kinds, stmts), arr_got, stm_got in zip(
            configs, array_results, stream_results):
        dests = [st.dest for st in cfg.functions]
        stmt_trs = []
        for i, st in enumerate(cfg.functions):
            nodes: list = []
            sql, t, _h = _tr_memo(st.expr, kinds, nodes, f"s{i}")
            stmt_trs.append((nodes, sql))
        want = {k: _replay_key(con, dests, stmt_trs, key_rows)
                for k, key_rows in by_key.items()}
        for vals in want.values():
            n_null += sum(v is None for v in vals)
            n_val += sum(v is not None for v in vals)
        for label, got in (("array", arr_got), ("stream", stm_got)):
            if got != want:
                mismatches.append((label, stmts,
                                   {k: (got.get(k), want.get(k))
                                    for k in set(got) | set(want)
                                    if got.get(k) != want.get(k)}))
    assert not mismatches, f"{len(mismatches)} diverging; first 3: " \
                           f"{mismatches[:3]}"
    # the leg must actually exercise poisoning crossings AND live values
    assert n_null >= 40, n_null
    assert n_val >= 40, n_val


def test_decimal_midsequence_overflow_divergence_declared(spark):
    """The DECLARED decomposable divergence (VERDICT r12 #8, r12 finding
    #3's residual): a running decimal memo that crosses |1e10| and
    re-enters range NULL-poisons the sequential fold (the (19,9) memo
    operand try_casts to NULL at the next add) but not the native
    partial-aggregate sum (terms are guarded individually; the TOTAL is
    back in range). Both general-fold paths agree with the reference
    semantics (NULL); the native path returns the re-entered value —
    pinned here as the documented contract (operators/aggregation.py),
    unreachable without |Σ| >= 1e10 crossings."""
    from decimal import Decimal as D

    rows = [("e1", 1, 0, None, None, D("6e9")),
            ("e2", 2, 0, None, None, D("6e9")),
            ("e3", 3, 0, None, None, D("-6e9"))]
    sdf = spark.createDataFrame(rows, _SPARK_SCHEMA)
    cfg = AggregationTransformConfig(
        "src", "k", (parse_statement("s ~ memo.s + w1"),))
    assert aggregation.classify(cfg) is not None  # decomposable sum

    def val(strategy):
        [r] = aggregation.compute_groups(
            cfg, sdf, fold_strategy=strategy).collect()
        return r["s"]

    assert val("array") is None       # fold: poisoned at row 2's add
    assert val("stream") is None      # streaming fold: identical
    assert val("auto") == D("6e9")    # native sum: declared divergence
