"""Property-based DSL testing.

1. Parser round-trip (hypothesis): render a random AST with explicit
   parens → parse → identical AST. Covers the no-precedence grammar.
2. Differential evaluation (seeded): hundreds of random well-typed
   expressions evaluated by the compiled Spark Column AND by a
   pure-Python interpreter of the declared contract (SURVEY.md §2.4 +
   Appendix A): truncating int division with NULL on zero, decimal(38,18)
   arithmetic with HALF_UP, real string concat, Kleene three-valued
   logic, NULL propagation. One Spark job evaluates the whole batch.
"""

from __future__ import annotations

import random
from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F, types as T

from reactivedb_spark.expr.ast import BinOp, ColumnRef, Expr, Literal
from reactivedb_spark.expr.compiler import compile_expr
from reactivedb_spark.expr.parser import parse_expression

# ---------------------------------------------------------------------------
# 1. parser round-trip
# ---------------------------------------------------------------------------

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True).filter(
    lambda s: s not in ("true", "false")
)
_literal = st.one_of(
    st.integers(-1000, 1000).map(Literal),
    st.booleans().map(Literal),
    st.from_regex(r"[a-zA-Z0-9 _.,-]{0,8}", fullmatch=True).map(Literal),
    st.decimals(allow_nan=False, allow_infinity=False, places=3,
                min_value=-100, max_value=100).map(Literal),
)
_leaf = st.one_of(_literal, _ident.map(ColumnRef))
_ops = st.sampled_from(sorted(["+", "-", "*", "/", "^", "<", ">", "<=", ">=",
                               "==", "!=", "&&", "||"]))
_expr = st.recursive(
    _leaf, lambda inner: st.builds(BinOp, _ops, inner, inner), max_leaves=12
)


def _render(e: Expr) -> str:
    if isinstance(e, Literal):
        v = e.value
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, str):
            return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
        if isinstance(v, Decimal):
            s = f"{v:f}"
            out = s if "." in s else s + ".0"
            return f"({out})" if v < 0 else out
        return f"({v})" if v < 0 else str(v)
    if isinstance(e, ColumnRef):
        return e.name
    assert isinstance(e, BinOp)
    return f"({_render(e.left)} {e.op} {_render(e.right)})"


def _normalize(e: Expr) -> Expr:
    """Negative numeric literals parse as negative literals (the lexer folds
    unary minus); nothing else differs."""
    return e


@given(_expr)
@settings(max_examples=300, deadline=None)
def test_parser_roundtrip(e):
    rendered = _render(e)
    parsed = parse_expression(rendered)
    assert parsed == _normalize(e), f"{rendered!r} -> {parsed!r}"


# ---------------------------------------------------------------------------
# 2. differential evaluation
# ---------------------------------------------------------------------------

Q18 = Decimal("1e-18")


def _q(x: Decimal):
    return x.quantize(Q18, rounding=ROUND_HALF_UP)


def _interp(e: Expr, row: dict):
    """Pure-Python evaluator of the declared contract."""
    if isinstance(e, Literal):
        return e.value
    if isinstance(e, ColumnRef):
        return row[e.name]
    assert isinstance(e, BinOp)
    op = e.op
    l, r = _interp(e.left, row), _interp(e.right, row)
    if op in ("&&", "||"):  # Kleene logic
        if op == "&&":
            if l is False or r is False:
                return False
            if l is None or r is None:
                return None
            return l and r
        if l is True or r is True:
            return True
        if l is None or r is None:
            return None
        return l or r
    if l is None or r is None:
        return None
    if op in ("<", ">", "<=", ">=", "==", "!="):
        import operator

        f = {"<": operator.lt, ">": operator.gt, "<=": operator.le,
             ">=": operator.ge, "==": operator.eq, "!=": operator.ne}[op]
        if isinstance(l, Decimal) or isinstance(r, Decimal):
            l, r = Decimal(l) if not isinstance(l, Decimal) else l, r
            r = Decimal(r) if not isinstance(r, Decimal) else r
        return f(l, r)
    if isinstance(l, str):
        return l + r  # real concat (reference bug fixed)
    if isinstance(l, Decimal) or isinstance(r, Decimal):
        # declared contract (see compiler.py): operands at decimal(19,9)
        q9 = Decimal("1e-9")
        dl = (Decimal(l) if not isinstance(l, Decimal) else l).quantize(
            q9, rounding=ROUND_HALF_UP
        )
        dr = (Decimal(r) if not isinstance(r, Decimal) else r).quantize(
            q9, rounding=ROUND_HALF_UP
        )
        if abs(dl) >= Decimal("1e10") or abs(dr) >= Decimal("1e10"):
            return None  # (19,9) overflow ⇒ NULL
        if op == "+":
            return _q(dl + dr)
        if op == "-":
            return _q(dl - dr)
        if op == "*":
            # (19,9)×(19,9) → (38,17): Spark's p1+p2+1 = 39 caps to
            # precision 38 by shedding one scale digit, so the product
            # rounds HALF_UP at the 17th decimal before widening to the
            # (38,18) storage type (falsified-by-fuzz r11; was "exact")
            return _q((dl * dr).quantize(Decimal("1e-17"),
                                         rounding=ROUND_HALF_UP))
        if op == "/":
            if dr == 0:
                return None
            # quotient carries scale 19 ((19,9)/(19,9) → (38,19)), then
            # widens to the (38,18) storage type
            q19 = (dl / dr).quantize(Decimal("1e-19"), rounding=ROUND_HALF_UP)
            return q19.quantize(Q18, rounding=ROUND_HALF_UP)
    if op == "+":
        return l + r
    if op == "-":
        return l - r
    if op == "*":
        return l * r
    if op == "/":
        if r == 0:
            return None
        q = abs(l) // abs(r)
        return q * (1 if (l >= 0) == (r >= 0) else -1)
    raise AssertionError(op)


SCHEMA = T.StructType(
    [
        T.StructField("i", T.LongType()),
        T.StructField("j", T.LongType()),
        T.StructField("d", T.DecimalType(38, 18)),
        T.StructField("e", T.DecimalType(38, 18)),
        T.StructField("s", T.StringType()),
        T.StructField("t", T.StringType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("c", T.BooleanType()),
    ]
)

_INT_COLS, _DEC_COLS, _STR_COLS, _BOOL_COLS = ["i", "j"], ["d", "e"], ["s", "t"], ["b", "c"]


def _gen_expr(rng: random.Random, kind: str, depth: int) -> Expr:
    if depth <= 0 or rng.random() < 0.35:
        if kind == "int":
            return rng.choice(
                [Literal(rng.randint(-50, 50))] + [ColumnRef(c) for c in _INT_COLS]
            )
        if kind == "dec":
            return rng.choice(
                [Literal(Decimal(rng.randint(-500, 500)) / 10)]
                + [ColumnRef(c) for c in _DEC_COLS]
            )
        if kind == "str":
            return rng.choice(
                [Literal(rng.choice(["", "ab", "Zx", "m"]))]
                + [ColumnRef(c) for c in _STR_COLS]
            )
        return rng.choice(
            [Literal(rng.random() < 0.5)] + [ColumnRef(c) for c in _BOOL_COLS]
        )
    if kind == "bool":
        roll = rng.random()
        if roll < 0.4:
            sub = rng.choice(["int", "dec", "str"])
            op = rng.choice(["<", ">", "<=", ">=", "==", "!="])
            return BinOp(op, _gen_expr(rng, sub, depth - 1), _gen_expr(rng, sub, depth - 1))
        return BinOp(rng.choice(["&&", "||"]),
                     _gen_expr(rng, "bool", depth - 1), _gen_expr(rng, "bool", depth - 1))
    if kind == "str":
        return BinOp("+", _gen_expr(rng, "str", depth - 1), _gen_expr(rng, "str", depth - 1))
    op = rng.choice(["+", "-", "*", "/"])
    if kind == "dec" and rng.random() < 0.4:  # mixed int/dec promotion
        return BinOp(op, _gen_expr(rng, "int", depth - 1), _gen_expr(rng, "dec", depth - 1))
    return BinOp(op, _gen_expr(rng, kind, depth - 1), _gen_expr(rng, kind, depth - 1))


def _rows(rng: random.Random, n: int):
    out = []
    for _ in range(n):
        out.append(
            {
                "i": rng.choice([None, 0, 1, -3, 7, 42]),
                "j": rng.choice([None, 0, 2, -2, 5]),
                "d": rng.choice([None, Decimal("0"), Decimal("1.5"), Decimal("-2.25")]),
                "e": rng.choice([None, Decimal("3"), Decimal("-0.5")]),
                "s": rng.choice([None, "", "ab", "ba"]),
                "t": rng.choice([None, "x", "ab"]),
                "b": rng.choice([None, True, False]),
                "c": rng.choice([None, True, False]),
            }
        )
    return out


@pytest.mark.parametrize("seed", [7, 101])
def test_compiled_eval_matches_interpreter(spark, seed):
    rng = random.Random(seed)
    exprs = []
    for k in range(120):
        kind = rng.choice(["int", "dec", "str", "bool", "bool"])
        exprs.append(_gen_expr(rng, kind, 3))
    rows = _rows(rng, 8)
    df = spark.createDataFrame(rows, SCHEMA)
    cols = [
        compile_expr(e, SCHEMA).col.alias(f"x{k}") for k, e in enumerate(exprs)
    ]
    got = df.select(*cols).collect()
    for ridx, row in enumerate(rows):
        for k, e in enumerate(exprs):
            expected = _interp(e, row)
            actual = got[ridx][f"x{k}"]
            if isinstance(expected, Decimal) and actual is not None:
                assert _q(Decimal(actual)) == _q(expected), (
                    f"seed={seed} expr#{k} row{ridx}: {e} -> {actual} != {expected}"
                )
            else:
                assert actual == expected, (
                    f"seed={seed} expr#{k} row{ridx}: {e} -> {actual!r} != {expected!r}"
                )
