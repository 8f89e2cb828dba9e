"""Compile DSL ASTs to typed pyspark Columns.

Static type inference replaces the reference's insert-time dynamic typing
(storage_manager_table.rs:334-350): because every derived table is produced
by a statically-known transform over a statically-known parent schema, the
output schema is derivable at config-parse time (SURVEY.md §1.3).

Declared semantic contract (SURVEY.md Appendix A):
- integer `/` truncates (Rust isize semantics, config/types.rs:75);
  divide-by-zero yields NULL (declared, the reference panics)
- string `+` really concatenates (reference bug at config/types.rs:89-96
  returned the left operand; we fix it)
- `^` is standard pow returning double (reference used abs(exponent),
  config/types.rs:78; we declare standard semantics)
- comparisons work on Decimal (reference errored, config/types.rs:37-40)
- mixed Integer/Decimal coerces to Decimal (config/types.rs:87-88)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column, functions as F, types as T

from reactivedb_spark.errors import ExpressionError
from reactivedb_spark.expr.ast import (
    ARITH_OPS, BOOL_OPS, CMP_OPS, BinOp, ColumnRef, Expr, FuncCall, Literal, MemoRef,
)
from reactivedb_spark.types import DECIMAL, is_integral, is_numeric, promote


@dataclass
class TypedColumn:
    col: Column
    dtype: T.DataType


# memo_resolver: MemoRef -> TypedColumn (aggregation folds supply this;
# outside aggregations a memo reference is an error, as in the reference
# where `memo.` only exists inside AggregationTransform, transform.rs:248-266)
MemoResolver = Callable[[MemoRef], TypedColumn]

# column_resolver: (name, dtype) -> Column; defaults to F.col. The
# aggregation fold uses it to bind column refs to higher-order-function
# lambda variables instead of top-level columns.
ColumnResolver = Callable[[str, T.DataType], Column]


def field_type(schema: T.StructType, name: str) -> T.DataType:
    parts = name.split(".")
    cur: T.DataType = schema
    for p in parts:
        if not isinstance(cur, T.StructType) or p not in cur.fieldNames():
            raise ExpressionError(f"unknown column {name!r} in schema {schema.simpleString()}")
        cur = cur[p].dataType
    return cur


def _lit(value) -> TypedColumn:
    if isinstance(value, bool):
        return TypedColumn(F.lit(value), T.BooleanType())
    if isinstance(value, int):
        return TypedColumn(F.lit(value).cast("long"), T.LongType())
    if isinstance(value, str):
        return TypedColumn(F.lit(value), T.StringType())
    # decimal.Decimal
    return TypedColumn(F.lit(value).cast(DECIMAL), DECIMAL)


def _trunc_div(left: Column, right: Column) -> Column:
    """Truncating integer division with NULL on zero divisor.

    Computed via exact decimal arithmetic (no double rounding for large
    longs); Spark's Divide returns NULL on zero divisor with ANSI off.
    """
    ld = F.abs(left).cast(T.DecimalType(38, 0))
    rd = F.abs(right).cast(T.DecimalType(38, 0))
    sign = (F.signum(left) * F.signum(right)).cast("long")
    return (F.floor(F.try_divide(ld, rd)).cast("long") * sign).cast("long")


def _arith(op: str, lt: TypedColumn, rt: TypedColumn) -> TypedColumn:
    ldt, rdt = lt.dtype, rt.dtype
    if op == "+" and isinstance(ldt, T.StringType) and isinstance(rdt, T.StringType):
        return TypedColumn(F.concat(lt.col, rt.col), T.StringType())
    if not (is_numeric(ldt) and is_numeric(rdt)):
        raise ExpressionError(f"operator {op!r} not defined for {ldt} and {rdt}")
    if op == "^":
        return TypedColumn(F.pow(lt.col.cast("double"), rt.col.cast("double")), T.DoubleType())
    out = promote(ldt, rdt)
    # Declared decimal-arithmetic contract (found via the differential
    # property tests): operands compute at decimal(19,9) — HALF_UP-rounded
    # to 9 fractional digits, |values| < 10^10 (overflow ⇒ NULL) — because
    # Spark's DecimalPrecision rule would cap products/quotients of full
    # (38,18) operands at scale 6. At (19,9): + - are EXACT ((20,9));
    # * computes at (38,17) (precision p1+p2+1 = 39 caps to 38, shedding
    # one scale digit — the product is HALF_UP-rounded at the 17th
    # decimal; the r11 DuckDB fuzz falsified the earlier "exact (38,18)"
    # claim); / carries scale 19 ((38,19)) then rounds once more to 18.
    # Results widen to the storage type decimal(38,18). rust_decimal
    # carries ~28 flexible digits; this fixed-point contract is the
    # documented divergence.
    OPW = T.DecimalType(19, 9)
    # try_cast, not cast: the declared overflow ⇒ NULL contract must hold
    # under ANSI sessions too (the driver's hostile axis) — a plain cast
    # would THROW there instead of yielding NULL (DSL-fuzz finding, r11).
    if op == "/":
        if is_integral(out):
            return TypedColumn(_trunc_div(lt.col.cast("long"), rt.col.cast("long")), T.LongType())
        if isinstance(out, T.DecimalType):
            return TypedColumn(
                F.try_divide(lt.col.try_cast(OPW), rt.col.try_cast(OPW)).cast(DECIMAL), DECIMAL
            )
        return TypedColumn(
            F.try_divide(lt.col.cast("double"), rt.col.cast("double")), T.DoubleType()
        )
    pairs = {"+": lambda a, b: a + b, "-": lambda a, b: a - b, "*": lambda a, b: a * b}
    fn = pairs[op]
    if isinstance(out, T.DecimalType):
        return TypedColumn(fn(lt.col.try_cast(OPW), rt.col.try_cast(OPW)).cast(DECIMAL), DECIMAL)
    if is_integral(out):
        return TypedColumn(fn(lt.col.cast("long"), rt.col.cast("long")), T.LongType())
    return TypedColumn(fn(lt.col.cast("double"), rt.col.cast("double")), T.DoubleType())


_CMP = {
    "<": lambda a, b: a < b,
    ">": lambda a, b: a > b,
    "<=": lambda a, b: a <= b,
    ">=": lambda a, b: a >= b,
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
}


def _comparable_elems(le: T.DataType, re_: T.DataType) -> bool:
    """Element-type comparability for array comparisons (ADVICE r11 #1):
    both numeric (promotable), or same class — recursing into nested
    arrays so Array(Array(Integer)) vs Array(Array(Str)) also fails at
    compile time rather than as a Spark AnalysisException."""
    if is_numeric(le) and is_numeric(re_):
        return True
    if type(le) is not type(re_):
        return False
    if isinstance(le, T.ArrayType):
        return _comparable_elems(le.elementType, re_.elementType)
    return isinstance(le, (T.StringType, T.BooleanType)) or le == re_


def _compare(op: str, lt: TypedColumn, rt: TypedColumn) -> TypedColumn:
    # Reference defines comparisons for Integer, Str, Array (lexicographic)
    # and ==/!= for Bool (config/types.rs:8-42); we additionally allow
    # Decimal (Appendix A #3) and mixed numerics via promotion. Anything
    # else — mixed kinds (string vs number), bool ordering — is a typed
    # COMPILE error, as in the reference, not whatever Spark's implicit
    # casts would improvise (tightened r11; previously fell through
    # silently, leaving the semantics engine-defined).
    lc, rc = lt.col, rt.col
    if is_numeric(lt.dtype) and is_numeric(rt.dtype):
        out = promote(lt.dtype, rt.dtype)
        if isinstance(out, T.DecimalType):
            lc, rc = lc.cast(DECIMAL), rc.cast(DECIMAL)
        elif is_integral(out):
            lc, rc = lc.cast("long"), rc.cast("long")
        else:
            lc, rc = lc.cast("double"), rc.cast("double")
    elif isinstance(lt.dtype, T.BooleanType) and isinstance(rt.dtype, T.BooleanType):
        if op not in ("==", "!="):
            raise ExpressionError(
                f"operator {op!r} not defined for Bool (only == and !=)")
    elif type(lt.dtype) is not type(rt.dtype) or not isinstance(
            lt.dtype, (T.StringType, T.ArrayType)):
        raise ExpressionError(
            f"operator {op!r} not defined for {lt.dtype.simpleString()} "
            f"and {rt.dtype.simpleString()}")
    elif isinstance(lt.dtype, T.ArrayType) and not _comparable_elems(
            lt.dtype.elementType, rt.dtype.elementType):
        # ADVICE r11 #1: the outer-class check alone let Array(Integer)
        # vs Array(Str) through to a Spark AnalysisException at run time,
        # contradicting the typed-COMPILE-error contract; element types
        # must be comparable too (recursively, for nested arrays).
        raise ExpressionError(
            f"operator {op!r} not defined for {lt.dtype.simpleString()} "
            f"and {rt.dtype.simpleString()} (element types differ)")
    return TypedColumn(_CMP[op](lc, rc), T.BooleanType())


# Scalar function library — a declared extension (the reference parses
# calls but errors at execution, transform.rs:291; its abandoned Python
# prototype shipped ABS, PythonMVP/transforms.py:25,188). Declared error
# contract (tests/test_dsl_function_errors.py): unknown name, wrong
# arity, and argument-type mismatch all raise ExpressionError at COMPILE
# time (config/build time in the engine), never a runtime Spark error.
def _want(fn: str, i: int, ok: bool, need: str, got) -> None:
    if not ok:
        raise ExpressionError(
            f"{fn}() arg {i + 1} must be {need}, got {got.simpleString()}"
        )


def _num(fn):
    def check(a):
        for i, x in enumerate(a):
            _want(fn, i, is_numeric(x.dtype), "numeric", x.dtype)
    return check


def _str(fn):
    def check(a):
        for i, x in enumerate(a):
            _want(fn, i, isinstance(x.dtype, T.StringType), "a string", x.dtype)
    return check


def _str_or_array(fn):
    def check(a):
        for i, x in enumerate(a):
            _want(fn, i, isinstance(x.dtype, (T.StringType, T.ArrayType)),
                  "a string or array", x.dtype)
    return check


def _same_or_numeric(fn):
    def check(a):
        if all(is_numeric(x.dtype) for x in a):
            return
        kinds = {x.dtype.simpleString() for x in a}
        if len(kinds) > 1:
            raise ExpressionError(
                f"{fn}() args must share a type, got {sorted(kinds)}"
            )
    return check


def _coalesce(a: list[TypedColumn]) -> TypedColumn:
    """coalesce() with mixed numeric args promotes to the common numeric
    type and CASTS every arg to it (DSL fuzz finding, round 11: the
    previous ``dtype = a[0].dtype`` lied when args mixed Integer/Decimal
    — Spark coerced the value to the wide type while downstream
    compilation kept planning on the narrow declared type, so e.g. a
    later ``/`` picked truncating-int semantics on a decimal value)."""
    out = a[0].dtype
    if any(x.dtype != out for x in a):
        for x in a[1:]:
            out = promote(out, x.dtype)
        return TypedColumn(
            F.coalesce(*[x.col.cast(out) for x in a]), out)
    return TypedColumn(F.coalesce(*[x.col for x in a]), out)


def _fn_specs():
    return {
        "abs": (1, _num("abs"), lambda a: TypedColumn(F.abs(a[0].col), a[0].dtype)),
        "floor": (1, _num("floor"), lambda a: TypedColumn(F.floor(a[0].col).try_cast("long"), T.LongType())),
        "ceil": (1, _num("ceil"), lambda a: TypedColumn(F.ceil(a[0].col).try_cast("long"), T.LongType())),
        "sqrt": (1, _num("sqrt"), lambda a: TypedColumn(F.sqrt(a[0].col.cast("double")), T.DoubleType())),
        "length": (1, _str_or_array("length"), lambda a: TypedColumn(F.length(a[0].col).cast("long"), T.LongType())),
        "upper": (1, _str("upper"), lambda a: TypedColumn(F.upper(a[0].col), T.StringType())),
        "lower": (1, _str("lower"), lambda a: TypedColumn(F.lower(a[0].col), T.StringType())),
        "concat": (None, _str("concat"), lambda a: TypedColumn(F.concat(*[x.col for x in a]), T.StringType())),
        "coalesce": (None, _same_or_numeric("coalesce"), _coalesce),
    }


def compile_expr(
    expr: Expr,
    schema: T.StructType,
    memo_resolver: Optional[MemoResolver] = None,
    column_resolver: Optional[ColumnResolver] = None,
) -> TypedColumn:
    if isinstance(expr, Literal):
        return _lit(expr.value)
    if isinstance(expr, ColumnRef):
        dtype = field_type(schema, expr.name)
        if column_resolver is not None:
            return TypedColumn(column_resolver(expr.name, dtype), dtype)
        return TypedColumn(F.col(expr.name), dtype)
    if isinstance(expr, MemoRef):
        if memo_resolver is None:
            raise ExpressionError(
                f"memo.{expr.name} only valid inside an Aggregation transform"
            )
        return memo_resolver(expr)
    if isinstance(expr, BinOp):
        lt = compile_expr(expr.left, schema, memo_resolver, column_resolver)
        rt = compile_expr(expr.right, schema, memo_resolver, column_resolver)
        if expr.op in ARITH_OPS:
            return _arith(expr.op, lt, rt)
        if expr.op in CMP_OPS:
            return _compare(expr.op, lt, rt)
        if expr.op in BOOL_OPS:
            if not (isinstance(lt.dtype, T.BooleanType) and isinstance(rt.dtype, T.BooleanType)):
                raise ExpressionError(f"{expr.op!r} requires boolean operands")
            col = (lt.col & rt.col) if expr.op == "&&" else (lt.col | rt.col)
            return TypedColumn(col, T.BooleanType())
        raise ExpressionError(f"unknown operator {expr.op!r}")
    if isinstance(expr, FuncCall):
        if expr.name == "round":
            if len(expr.args) not in (1, 2):
                raise ExpressionError("round() takes 1 or 2 args")
            a0 = compile_expr(expr.args[0], schema, memo_resolver, column_resolver)
            scale = 0
            if len(expr.args) == 2:
                s = expr.args[1]
                if not (isinstance(s, Literal) and isinstance(s.value, int)):
                    raise ExpressionError("round() scale must be an integer literal")
                scale = s.value
            return TypedColumn(F.round(a0.col, scale), a0.dtype)
        specs = _fn_specs()
        if expr.name not in specs:
            raise ExpressionError(f"unknown function {expr.name!r}")
        arity, typecheck, build = specs[expr.name]
        if arity is not None and len(expr.args) != arity:
            raise ExpressionError(f"{expr.name}() takes {arity} args, got {len(expr.args)}")
        if arity is None and not expr.args:
            raise ExpressionError(f"{expr.name}() needs at least one arg")
        args = [compile_expr(a, schema, memo_resolver, column_resolver) for a in expr.args]
        typecheck(args)
        return build(args)
    raise ExpressionError(f"cannot compile {expr!r}")


def infer_type(expr: Expr, schema: T.StructType,
               memo_types: Optional[dict[str, T.DataType]] = None) -> T.DataType:
    """Static output type of an expression — used for derived-table schema
    derivation without touching Spark execution."""

    def resolver(m: MemoRef) -> TypedColumn:
        if memo_types is None or m.name not in memo_types:
            raise ExpressionError(f"unresolved memo.{m.name}")
        return TypedColumn(F.lit(None).cast(memo_types[m.name]), memo_types[m.name])

    return compile_expr(expr, schema, resolver if memo_types is not None else None).dtype
