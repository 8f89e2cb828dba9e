"""DSL fuzz vs DuckDB (VERDICT r10 #8): ≥10k random well-formed DSL
statements, rendered to source, parsed, compiled to Spark, and compared
against an independent DuckDB translation of the same AST — pinning the
full typed operator surface (int/decimal/string/bool/double arithmetic,
comparisons, boolean logic, the function library, NULL propagation,
overflow-to-NULL) instead of just the committed queries.

Oracle strategy: decimals evaluate in *coefficient space* — every
Decimal-typed subexpression is translated to its scale-18 HUGEINT
coefficient, so the declared decimal(19,9) operand contract (HALF_UP
coercion, overflow ⇒ NULL, the (38,17) product rounding of `*`,
the (38,19)→(38,18) double rounding of `/`)
is replayed with exact integer arithmetic. DuckDB's own decimal ops are
unusable as an oracle here: its decimal÷decimal returns DOUBLE and its
decimal down-cast truncates instead of HALF_UP (probed, round 11).

Declared exclusions (each covered by the pure-Python differential in
test_dsl_properties.py instead):
- `^` (double pow): libm-divergent by 1 ulp across engines — the same
  reason the suite pins every ln()/pow() behind DECIMAL rounding.
- sqrt of negatives: DuckDB errors where Spark yields NaN, so the
  generator wraps sqrt args in abs() (sqrt itself IS fuzzed — IEEE
  requires correctly-rounded sqrt, identical on both engines).
- mixed string/numeric comparisons: outside the declared contract
  (reference types.rs:8-42 defines comparisons per same-kind only).
"""

from __future__ import annotations

import random
from decimal import Decimal

import duckdb
from pyspark.sql import types as T

from reactivedb_spark.errors import ExpressionError
from reactivedb_spark.expr.ast import BinOp, ColumnRef, Expr, FuncCall, Literal
from reactivedb_spark.expr.compiler import compile_expr
from reactivedb_spark.expr.parser import parse_expression

N_EXPRS = 10_000
SEED = 0xD51  # deterministic: green once == green always
CHUNK = 1000  # expressions per Spark/DuckDB select

P9 = 10 ** 9
P18 = 10 ** 18
P19 = 10 ** 19
P38 = 10 ** 38

# -- fixture rows -------------------------------------------------------------
# i* long, d* decimal(38,18) with <=6 places, s* ascii strings, b* bool.
# Values bounded so long arithmetic never overflows at depth <= 3 and
# the decimal overflow boundary (10^10) is reachable via * chains.
_ROWS = [
    # i1,   i2,    d1,             d2,          s1,      s2,     b1,    b2
    (7, -3, Decimal("1.5"), Decimal("-0.25"), "abc", "abd", True, False),
    (0, 5, Decimal("0"), Decimal("99.999999"), "", "abc", False, None),
    (-999, 999, Decimal("-9999.000001"), Decimal("0.000001"), "zz", "", None, True),
    (123, 0, Decimal("41.75"), Decimal("-1"), "a b", "a  b", True, True),
    (None, 4, Decimal("3.141592"), None, None, "x", False, False),
    (812, -17, None, Decimal("2"), "same", "same", None, None),
    (-1, -1, Decimal("-0.5"), Decimal("-0.5"), "Same", "same", True, None),
    (45, 45, Decimal("7000.25"), Decimal("7000.25"), "0", "00", False, True),
    (2, 1000, Decimal("9999.999999"), Decimal("9999.999999"), "y", "Y", None, False),
    (-360, 8, Decimal("-123.456"), Decimal("654.321"), "hello world", "HELLO", True, False),
]
_SPARK_SCHEMA = T.StructType([
    T.StructField("rid", T.LongType()),
    T.StructField("i1", T.LongType()), T.StructField("i2", T.LongType()),
    T.StructField("d1", T.DecimalType(38, 18)),
    T.StructField("d2", T.DecimalType(38, 18)),
    T.StructField("s1", T.StringType()), T.StructField("s2", T.StringType()),
    T.StructField("b1", T.BooleanType()), T.StructField("b2", T.BooleanType()),
])

INT, DEC, DBL, STR, BOOL = "int", "dec", "dbl", "str", "bool"
_COLS = {INT: ["i1", "i2"], DEC: ["d1", "d2"],
         STR: ["s1", "s2"], BOOL: ["b1", "b2"]}


# -- generator ----------------------------------------------------------------

class Gen:
    def __init__(self, rng: random.Random):
        self.r = rng

    def expr(self, t: str, depth: int) -> Expr:
        r = self.r
        if depth <= 0 or r.random() < 0.25:
            return self.leaf(t)
        return {INT: self.int_node, DEC: self.dec_node, DBL: self.dbl_node,
                STR: self.str_node, BOOL: self.bool_node}[t](depth)

    def leaf(self, t: str) -> Expr:
        r = self.r
        if t == DBL:  # doubles only arise from sqrt(int)
            return FuncCall("sqrt", (FuncCall("abs", (self.leaf(INT),)),))
        if r.random() < 0.45 and t in _COLS:
            return ColumnRef(r.choice(_COLS[t]))
        if t == INT:
            return Literal(r.randint(-999, 999))
        if t == DEC:
            return Literal(Decimal(r.randint(-999_999, 999_999)).scaleb(-3))
        if t == STR:
            return Literal("".join(r.choice("abxy Z01") for _ in range(r.randint(0, 5))))
        return Literal(r.random() < 0.5)

    def int_node(self, d: int) -> Expr:
        r = self.r
        pick = r.random()
        if pick < 0.55:
            return BinOp(r.choice("+-*/"), self.expr(INT, d - 1), self.expr(INT, d - 1))
        if pick < 0.7:
            return FuncCall(r.choice(["abs", "floor", "ceil"]), (self.expr(INT, d - 1),))
        if pick < 0.8:
            return FuncCall(r.choice(["floor", "ceil"]),
                            (self.expr(r.choice([DEC, DBL]), d - 1),))
        if pick < 0.9:
            return FuncCall("length", (self.expr(STR, d - 1),))
        return FuncCall("coalesce", tuple(self.expr(INT, d - 1)
                                          for _ in range(r.randint(2, 3))))

    def dec_node(self, d: int) -> Expr:
        r = self.r
        pick = r.random()
        if pick < 0.7:
            # at least one decimal operand, never a double
            sides = [DEC, r.choice([DEC, INT])]
            r.shuffle(sides)
            return BinOp(r.choice("+-*/"),
                         self.expr(sides[0], d - 1), self.expr(sides[1], d - 1))
        if pick < 0.85:
            return FuncCall("abs", (self.expr(DEC, d - 1),))
        # mixed numeric coalesce promotes to Decimal (round-11 fix)
        return FuncCall("coalesce",
                        (self.expr(DEC, d - 1), self.expr(r.choice([DEC, INT]), d - 1)))

    def dbl_node(self, d: int) -> Expr:
        r = self.r
        pick = r.random()
        if pick < 0.35:
            return FuncCall("sqrt", (FuncCall("abs", (self.expr(INT, d - 1),)),))
        if pick < 0.85:
            sides = [DBL, r.choice([DBL, INT])]
            r.shuffle(sides)
            return BinOp(r.choice("+-*/"),
                         self.expr(sides[0], d - 1), self.expr(sides[1], d - 1))
        return FuncCall("abs", (self.expr(DBL, d - 1),))

    def str_node(self, d: int) -> Expr:
        r = self.r
        pick = r.random()
        if pick < 0.4:
            return BinOp("+", self.expr(STR, d - 1), self.expr(STR, d - 1))
        if pick < 0.7:
            return FuncCall(r.choice(["upper", "lower"]), (self.expr(STR, d - 1),))
        if pick < 0.9:
            return FuncCall("concat", tuple(self.expr(STR, d - 1)
                                            for _ in range(r.randint(2, 3))))
        return FuncCall("coalesce", (self.expr(STR, d - 1), self.expr(STR, d - 1)))

    def bool_node(self, d: int) -> Expr:
        r = self.r
        pick = r.random()
        if pick < 0.45:
            kinds = r.choice([[INT, DEC], [INT], [DEC], [DBL, INT], [DBL]])
            lt, rt = r.choice(kinds), r.choice(kinds)
            return BinOp(r.choice(["<", ">", "<=", ">=", "==", "!="]),
                         self.expr(lt, d - 1), self.expr(rt, d - 1))
        if pick < 0.6:
            return BinOp(r.choice(["<", ">", "<=", ">=", "==", "!="]),
                         self.expr(STR, d - 1), self.expr(STR, d - 1))
        if pick < 0.7:
            return BinOp(r.choice(["==", "!="]),
                         self.expr(BOOL, d - 1), self.expr(BOOL, d - 1))
        return BinOp(r.choice(["&&", "||"]),
                     self.expr(BOOL, d - 1), self.expr(BOOL, d - 1))


# -- render to DSL source (parenthesized; the no-precedence split order
# is pinned separately by test_dsl_properties round-trip) ----------------------

def _render(e: Expr) -> str:
    if isinstance(e, Literal):
        v = e.value
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, str):
            return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
        if isinstance(v, Decimal):
            s = f"{v:f}"
            s = s if "." in s else s + ".0"
            return f"({s})" if v < 0 else s
        return f"({v})" if v < 0 else str(v)
    if isinstance(e, ColumnRef):
        return e.name
    if isinstance(e, FuncCall):
        return f"{e.name}({', '.join(_render(a) for a in e.args)})"
    assert isinstance(e, BinOp)
    return f"({_render(e.left)} {e.op} {_render(e.right)})"


# -- DuckDB translation (type-directed, decimals in coefficient space) --------

_MACROS = f"""
CREATE MACRO hu(n, p) AS CASE
  WHEN n IS NULL THEN NULL
  WHEN n < 0 THEN -(((-n) + p // 2) // p)
  ELSE (n + p // 2) // p END;
CREATE MACRO c9(x) AS CASE
  WHEN x IS NULL THEN NULL
  WHEN abs(hu(x, {P9})) >= {P19} THEN NULL
  ELSE hu(x, {P9}) END;
CREATE MACRO i9(x) AS CASE
  WHEN x IS NULL THEN NULL
  WHEN abs(x) >= {P9 * 10} THEN NULL
  ELSE CAST(x AS HUGEINT) * {P9} END;
CREATE MACRO dadd(a, b) AS (a + b) * {P9};
CREATE MACRO dsub(a, b) AS (a - b) * {P9};
CREATE MACRO dmul(a, b) AS hu(a * b, 10) * 10;
CREATE MACRO hud(n, d) AS
  (n // d) + CASE WHEN 2 * (n % d) >= d THEN 1 ELSE 0 END;
CREATE MACRO ddivd(a, b) AS CASE
  WHEN a IS NULL OR b IS NULL OR b = 0 THEN NULL
  WHEN hud(abs(a) * {P19}, abs(b)) >= {P38} THEN NULL
  ELSE hu(CASE WHEN (a < 0) != (b < 0)
               THEN -hud(abs(a) * {P19}, abs(b))
               ELSE hud(abs(a) * {P19}, abs(b)) END, 10) END;
CREATE MACRO idiv(a, b) AS
  CASE WHEN b = 0 THEN NULL ELSE a // b END;
CREATE MACRO ddiv(a, b) AS
  CASE WHEN b = 0 THEN NULL ELSE a / b END;
CREATE MACRO lguard(v) AS CASE
  WHEN v IS NULL THEN NULL
  WHEN v >= {2 ** 63} OR v < -{2 ** 63} THEN NULL
  ELSE v END;
CREATE MACRO fl18(c) AS lguard(CASE
  WHEN c IS NULL THEN NULL
  WHEN c < 0 AND c % {P18} <> 0 THEN c // {P18} - 1
  ELSE c // {P18} END);
CREATE MACRO ce18(c) AS lguard(CASE
  WHEN c IS NULL THEN NULL
  WHEN c > 0 AND c % {P18} <> 0 THEN c // {P18} + 1
  ELSE c // {P18} END);
"""
# lguard (ADVICE r11 #4): the compiler's floor/ceil emit
# try_cast('long') — NULL when |result| >= 2^63. Unreachable at the
# current leaf magnitude bounds (~1e16), but the guard keeps the oracle
# faithful if leaf bounds or expression depth are ever widened.


def _tr(e: Expr, nodes: list, prefix: str) -> tuple[str, str, int]:
    """AST → (DuckDB SQL or column name, type, height); DEC expressions
    are scale-18 HUGEINT coefficients. Every composite node is appended
    to ``nodes`` as (col_name, sql-over-child-columns, height) for a
    height-layered CTE chain — a naive inline translation re-expands
    each macro argument's whole subtree (ddivd references its args ~5×),
    which made DuckDB's planner cost exponential in depth
    (~0.6 s/expression, measured); as column references it is linear."""

    def emit(sql: str, t: str, hs: list) -> tuple[str, str, int]:
        h = max(hs, default=0) + 1
        name = f"{prefix}_{len(nodes)}"
        nodes.append((name, sql, h))
        return name, t, h

    if isinstance(e, Literal):
        v = e.value
        if isinstance(v, bool):
            return ("TRUE" if v else "FALSE"), BOOL, 0
        if isinstance(v, int):
            return f"CAST({v} AS BIGINT)", INT, 0
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'", STR, 0
        return f"CAST({int(v.scaleb(18))} AS HUGEINT)", DEC, 0
    if isinstance(e, ColumnRef):
        n = e.name
        if n in _COLS[DEC]:
            return f"{n}_c", DEC, 0
        t = INT if n in _COLS[INT] else (BOOL if n in _COLS[BOOL] else STR)
        return n, t, 0
    if isinstance(e, BinOp):
        ls, lt, lh = _tr(e.left, nodes, prefix)
        rs, rt, rh = _tr(e.right, nodes, prefix)
        hs = [lh, rh]
        op = e.op
        if op in ("&&", "||"):
            return emit(f"(({ls}) {'AND' if op == '&&' else 'OR'} ({rs}))",
                        BOOL, hs)
        if op in ("<", ">", "<=", ">=", "==", "!="):
            dop = {"==": "=", "!=": "<>"}.get(op, op)
            if DEC in (lt, rt) and DBL not in (lt, rt):
                ls = ls if lt == DEC else f"(CAST({ls} AS HUGEINT) * {P18})"
                rs = rs if rt == DEC else f"(CAST({rs} AS HUGEINT) * {P18})"
            elif DBL in (lt, rt):
                ls, rs = f"CAST({ls} AS DOUBLE)", f"CAST({rs} AS DOUBLE)"
            return emit(f"(({ls}) {dop} ({rs}))", BOOL, hs)
        # arithmetic
        if lt == STR:  # string + string
            return emit(f"(({ls}) || ({rs}))", STR, hs)
        if DBL in (lt, rt):
            ls, rs = f"CAST({ls} AS DOUBLE)", f"CAST({rs} AS DOUBLE)"
            if op == "/":
                return emit(f"ddiv({ls}, {rs})", DBL, hs)
            return emit(f"(({ls}) {op} ({rs}))", DBL, hs)
        if DEC in (lt, rt):
            a = f"c9({ls})" if lt == DEC else f"i9({ls})"
            b = f"c9({rs})" if rt == DEC else f"i9({rs})"
            fn = {"+": "dadd", "-": "dsub", "*": "dmul", "/": "ddivd"}[op]
            return emit(f"{fn}({a}, {b})", DEC, hs)
        if op == "/":
            return emit(f"idiv({ls}, {rs})", INT, hs)
        return emit(f"(({ls}) {op} ({rs}))", INT, hs)
    assert isinstance(e, FuncCall)
    args = [_tr(a, nodes, prefix) for a in e.args]
    hs = [h for _, _, h in args]
    name = e.name
    if name == "abs":
        (s, t, _), = args
        return emit(f"abs({s})", t, hs)
    if name in ("floor", "ceil"):
        (s, t, h), = args
        if t == INT:
            return s, INT, h
        if t == DEC:
            return emit(f"{'fl18' if name == 'floor' else 'ce18'}({s})",
                        INT, hs)
        return emit(f"CAST({name}({s}) AS BIGINT)", INT, hs)
    if name == "sqrt":
        (s, _t, _), = args
        return emit(f"sqrt(CAST({s} AS DOUBLE))", DBL, hs)
    if name == "length":
        (s, _t, _), = args
        return emit(f"CAST(length({s}) AS BIGINT)", INT, hs)
    if name in ("upper", "lower"):
        (s, _t, _), = args
        return emit(f"{name}({s})", STR, hs)
    if name == "concat":
        return emit("(" + " || ".join(s for s, _, _ in args) + ")", STR, hs)
    if name == "coalesce":
        types = {t for _, t, _ in args}
        if len(types) == 1:
            t = args[0][1]
            return emit(
                "COALESCE(" + ", ".join(s for s, _, _ in args) + ")", t, hs)
        # mixed numeric -> promoted (DBL wins over DEC over INT)
        out = DBL if DBL in types else DEC
        parts = []
        for s, t, _ in args:
            if t == out:
                parts.append(s)
            elif out == DEC:
                parts.append(f"(CAST({s} AS HUGEINT) * {P18})")
            else:
                parts.append(f"CAST({s} AS DOUBLE)")
        return emit("COALESCE(" + ", ".join(parts) + ")", out, hs)
    raise AssertionError(f"untranslated function {name}")


def _canon(v, t: str):
    if v is None:
        return None
    if t == DEC:
        if isinstance(v, Decimal):
            return v.scaleb(18).to_integral_value()
        return int(v)  # oracle coefficient
    if t == DBL:
        return float(v)
    return v


def _compile_batch(parsed_asts):
    """(src, ast) pairs → (src, ast, TypedColumn), dropping ill-typed
    statements (ExpressionError — the compiler's typed contract is the
    single arbiter of well-formedness for both fuzz legs). Column
    building is py4j-bound (~25 ms/expr single-threaded); the gateway
    is thread-safe, so compile across threads."""
    from concurrent.futures import ThreadPoolExecutor

    def _compile(item):
        src, ast = item
        try:
            return src, ast, compile_expr(ast, _SPARK_SCHEMA)
        except ExpressionError:
            return None
    with ThreadPoolExecutor(16) as ex:
        return [r for r in ex.map(_compile, parsed_asts) if r is not None]


def _differential(spark, exprs):
    """Evaluate compiled Spark columns vs the DuckDB translation over
    the fixture rows; return the list of divergences."""
    rows = [(i,) + r for i, r in enumerate(_ROWS)]
    sdf = spark.createDataFrame(rows, _SPARK_SCHEMA)

    con = duckdb.connect()
    for stmt in _MACROS.strip().split(";"):
        if stmt.strip():
            con.execute(stmt)
    con.execute("""CREATE TABLE fx (rid BIGINT, i1 BIGINT, i2 BIGINT,
        d1_c HUGEINT, d2_c HUGEINT, s1 VARCHAR, s2 VARCHAR,
        b1 BOOLEAN, b2 BOOLEAN)""")

    # coefficients as SQL literals: duckdb's Python parameter binding
    # routes ints beyond int64 through a double (lossy — probed r11)
    def _sq(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, int):
            return f"CAST('{v}' AS HUGEINT)" if abs(v) > 2**63 - 1 else str(v)
        if isinstance(v, Decimal):
            return f"CAST('{int(v.scaleb(18))}' AS HUGEINT)"
        return "'" + str(v).replace("'", "''") + "'"
    con.execute("INSERT INTO fx VALUES " + ", ".join(
        "(" + ", ".join([str(i)] + [_sq(v) for v in r]) + ")"
        for i, r in enumerate(_ROWS)))

    mismatches = []
    # interpreted projection: 1000-column one-off selects over 10 rows
    # are ~5× faster without whole-stage codegen compilation
    prev_cg = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    for lo in range(0, len(exprs), CHUNK):
        batch = exprs[lo:lo + CHUNK]
        scols = [tc.col.alias(f"e{k}") for k, (_, _, tc) in enumerate(batch)]
        srows = sdf.orderBy("rid").select(*scols).collect()
        # height-layered CTE chain: every AST node is computed once as a
        # named column, so macro arguments are column references and the
        # DuckDB planner cost stays linear (the naive inline form was
        # ~0.6 s/expression from macro-tree re-expansion)
        nodes: list = []
        roots = [(_tr(ast, nodes, "n")[:2]) for _, ast, _ in batch]
        layers: dict[int, list] = {}
        for cname, sql, h in nodes:
            layers.setdefault(h, []).append((cname, sql))
        prev = "fx"
        ctes = []
        for h in sorted(layers):
            cols = ", ".join(f"({sql}) AS {cn}" for cn, sql in layers[h])
            ctes.append(f"t{h} AS (SELECT *, {cols} FROM {prev})")
            prev = f"t{h}"
        dsql = (("WITH " + ", ".join(ctes) + " " if ctes else "")
                + "SELECT "
                + ", ".join(f"({s}) AS e{k}" for k, (s, _) in enumerate(roots))
                + f" FROM {prev} ORDER BY rid")
        drows = con.execute(dsql).fetchall()
        for ri, (sr, dr) in enumerate(zip(srows, drows)):
            for k, (src, _ast, _tc) in enumerate(batch):
                ot = roots[k][1]
                sv, dv = _canon(sr[k], ot), _canon(dr[k], ot)
                if sv != dv and not (sv is None and dv is None):
                    mismatches.append((src, ri, sv, dv))
    spark.conf.set("spark.sql.codegen.wholeStage", prev_cg)
    return mismatches


def test_dsl_fuzz_vs_duckdb(spark):
    rng = random.Random(SEED)
    g = Gen(rng)
    parsed_asts = []
    while len(parsed_asts) < N_EXPRS:
        t = rng.choice([INT, DEC, DBL, STR, BOOL])
        ast = g.expr(t, rng.randint(1, 3))
        src = _render(ast)
        parsed = parse_expression(src)
        assert parsed == ast, f"render/parse drift: {src!r}"
        parsed_asts.append((src, parsed))

    exprs = _compile_batch(parsed_asts)
    assert len(exprs) >= N_EXPRS * 0.95  # the generator is type-directed
    mismatches = _differential(spark, exprs)
    assert not mismatches, (
        f"{len(mismatches)} divergences; first 5: {mismatches[:5]}")


N_FLAT = 3000


def _typeof_flat(e: Expr) -> str:
    """Pure-Python type judgment for parse-order trees (BinOps over
    Literal/ColumnRef leaves only), mirroring the compiler's rules —
    a PREFILTER so the ~2/3 ill-typed random runs never reach the
    py4j-bound compile. False accepts are harmless (compile_expr still
    raises and the batch drops them); the compiler stays the arbiter."""
    if isinstance(e, Literal):
        v = e.value
        if isinstance(v, bool):
            return BOOL
        if isinstance(v, int):
            return INT
        if isinstance(v, str):
            return STR
        return DEC
    if isinstance(e, ColumnRef):
        for t, cols in _COLS.items():
            if e.name in cols:
                return t
        raise ExpressionError(e.name)
    assert isinstance(e, BinOp)
    lt, rt = _typeof_flat(e.left), _typeof_flat(e.right)
    num = (INT, DEC, DBL)
    if e.op in ("&&", "||"):
        if lt == rt == BOOL:
            return BOOL
        raise ExpressionError(e.op)
    if e.op in ("<", ">", "<=", ">=", "==", "!="):
        if (lt in num and rt in num) or (lt == rt == STR):
            return BOOL
        if lt == rt == BOOL and e.op in ("==", "!="):
            return BOOL
        raise ExpressionError(e.op)
    if e.op == "+" and lt == rt == STR:
        return STR
    if lt in num and rt in num:
        if e.op == "^" or DBL in (lt, rt):
            return DBL
        return DEC if DEC in (lt, rt) else INT
    raise ExpressionError(e.op)


def test_dsl_parse_order_fuzz_vs_duckdb(spark):
    """UNPARENTHESIZED statements: flat `leaf op leaf op ...` token
    runs exercise the reference's no-precedence split order (first
    depth-0 comparison/boolean token roots; otherwise the RIGHTMOST
    arithmetic op — parser.py:95-130) END-TO-END: whatever tree the
    parser produces is compiled AND translated, so a parse-order drift
    changes real values against DuckDB, not just an AST shape. The
    compiler's typed contract decides well-formedness (ill-typed runs
    like `a < b < c` → Integer-vs-Bool compare raise ExpressionError
    and are skipped — mixed-kind comparisons are compile errors as of
    r11, matching the reference's typed comparator table)."""
    rng = random.Random(SEED ^ 0xFFFF)
    g = Gen(rng)
    ops = ["+", "-", "*", "/", "<", ">", "<=", ">=", "==", "!=",
           "&&", "||"]

    def flat_leaf():
        t = rng.choice([INT, INT, DEC, STR, BOOL])
        return rng.choice([g.leaf(t), ColumnRef(rng.choice(_COLS[t]))])

    import hashlib

    exprs = []
    first_batch_lines = []
    while len(exprs) < N_FLAT:  # typing prunes random runs; top up
        candidates = []
        while len(candidates) < N_FLAT:
            n = rng.randint(1, 5)
            toks = [_render(flat_leaf())]
            for _ in range(n):
                toks.append(rng.choice(ops))
                toks.append(_render(flat_leaf()))
            candidates.append(" ".join(toks))
        parsed = [(src, parse_expression(src)) for src in candidates]
        if not first_batch_lines:
            first_batch_lines = [
                f"{src} => {_render(ast)}" for src, ast in parsed]
        typed = []
        for src, ast in parsed:
            try:
                _typeof_flat(ast)
            except ExpressionError:
                continue
            typed.append((src, ast))
        exprs.extend(_compile_batch(typed))
    exprs = exprs[:N_FLAT]

    # Golden split-order digest: the differential alone can't pin parse
    # ORDER (its oracle follows whatever tree the parser emits), so the
    # seeded corpus's source→parenthesized-parse mapping is pinned by
    # hash — a precedence change (e.g. accidentally adopting
    # conventional binding) flips it even where both engines would
    # still agree on the new tree's semantics.
    digest = hashlib.sha256(
        "\n".join(first_batch_lines).encode()).hexdigest()
    assert digest == ("ca5214ff6eaaf11a67492a26edc306b9"
                      "8e693dc36c046bf91a70455c2aa065ca"), first_batch_lines[:3]
    mismatches = _differential(spark, exprs)
    assert not mismatches, (
        f"{len(mismatches)} divergences; first 5: {mismatches[:5]}")
