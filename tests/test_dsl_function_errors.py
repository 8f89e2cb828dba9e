"""DSL function-call error contract (VERDICT r6 #8): the scalar-function
library is a declared extension, so its EDGES are declared too — unknown
function, wrong arity, empty variadic, and argument-type mismatch all
raise ExpressionError at COMPILE time (engine config/build time), never
a runtime Spark analysis error. Property tests mirror
tests/test_dsl_properties.py: random invalid calls over the generator
grammar must all hit the typed error path.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from reactivedb_spark.errors import ExpressionError, ReactiveDBError
from reactivedb_spark.expr.compiler import _fn_specs, compile_expr
from reactivedb_spark.expr.parser import parse_expression

# compile_expr builds pyspark Columns, which require an active context
pytestmark = pytest.mark.usefixtures("spark")

SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("arr", T.ArrayType(T.LongType())),
    ]
)

FNS = sorted(_fn_specs())


def _compile(src: str):
    return compile_expr(parse_expression(src), SCHEMA)


# -- unknown function ---------------------------------------------------------

_unknown_name = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True).filter(
    lambda s: s not in _fn_specs() and s not in ("round", "true", "false")
)


@settings(max_examples=60, deadline=None)
@given(name=_unknown_name)
def test_unknown_function_raises(name):
    with pytest.raises(ExpressionError, match="unknown function"):
        _compile(f"{name}(n)")


# -- wrong arity --------------------------------------------------------------

@pytest.mark.parametrize("fn", [f for f in FNS if _fn_specs()[f][0] == 1])
@pytest.mark.parametrize("nargs", [0, 2, 3])
def test_fixed_arity_enforced(fn, nargs):
    args = ", ".join(["n"] * nargs) if nargs else ""
    with pytest.raises(ExpressionError, match="takes 1 args|at least one"):
        _compile(f"{fn}({args})")


@pytest.mark.parametrize("fn", [f for f in FNS if _fn_specs()[f][0] is None])
def test_variadic_needs_one_arg(fn):
    with pytest.raises(ExpressionError, match="at least one arg"):
        _compile(f"{fn}()")


# -- argument-type mismatch ---------------------------------------------------

@pytest.mark.parametrize(
    "src",
    [
        "abs(s)",          # numeric-only over string
        "floor(s)",
        "ceil(arr)",
        "sqrt(s)",
        "upper(n)",        # string-only over numeric
        "lower(arr)",
        "length(n)",       # string-or-array over numeric
        "length(b)",
        'concat(s, n)',    # string concat over a numeric arg
        "coalesce(s, n)",  # mixed string/numeric
    ],
)
def test_argument_type_mismatch_raises(src):
    with pytest.raises(ExpressionError, match="must be|share a type"):
        _compile(src)


@pytest.mark.parametrize(
    "src",
    [
        "abs(n)", "floor(n)", "ceil(n)", "sqrt(n)",
        "length(s)", "length(arr)", "upper(s)", "lower(s)",
        'concat(s, "x")', "coalesce(n, 0)", "coalesce(s, s)",
    ],
)
def test_well_typed_calls_compile(src):
    assert _compile(src) is not None


# -- round() scale contract (pre-existing special form) -----------------------

def test_round_scale_must_be_int_literal():
    with pytest.raises(ExpressionError, match="scale must be an integer"):
        _compile("round(n, s)")
    with pytest.raises(ExpressionError, match="takes 1 or 2"):
        _compile("round(n, 1, 2)")


# -- errors surface at ENGINE BUILD time (config contract) --------------------

def test_bad_function_fails_engine_build(spark, workspace):
    """A FunctionTransform whose expression calls an unknown function or
    mistypes an argument must fail Engine construction (static schema
    derivation), not the first insert."""
    from reactivedb_spark.engine import Engine

    def cfg(expr):
        return {"tables": [
            {"Source": {"name": "t", "columns": {"x": "Integer", "s": "Str"}}},
            {"Derived": {"name": "d", "transform_definition": {
                "FunctionTransform": {"source_table": "t",
                                      "functions": [expr]}}}},
        ]}

    with pytest.raises(ReactiveDBError):
        Engine(spark, cfg("y ~ nosuchfn(x)"), workspace=workspace)
    with pytest.raises(ReactiveDBError):
        Engine(spark, cfg("y ~ upper(x)"), workspace=workspace)
