"""Expression DSL tests: grammar parity with the reference parser
(expression_parser.rs) and the declared semantic contract (SURVEY.md
Appendix A)."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F, types as T

from reactivedb_spark.errors import ExpressionError
from reactivedb_spark.expr import (
    Assignment,
    BinOp,
    ColumnRef,
    Comparison,
    Literal,
    MemoRef,
    compile_expr,
    infer_type,
    parse_expression,
    parse_statement,
)


class TestParser:
    def test_assignment(self):
        st = parse_statement("newColumn ~ testForIteration + 2")
        assert isinstance(st, Assignment)
        assert st.dest == "newColumn"
        assert st.expr == BinOp("+", ColumnRef("testForIteration"), Literal(2))

    def test_assignment_reversed(self):
        # expression_parser.rs:14-51 accepts expr ~ dest too
        st = parse_statement("testForIteration + 2 ~ newColumn")
        assert isinstance(st, Assignment) and st.dest == "newColumn"

    def test_bare_comparison(self):
        st = parse_statement("(a < 11) && (b > 14)")
        assert isinstance(st, Comparison)
        assert st.expr == BinOp("&&", BinOp("<", ColumnRef("a"), Literal(11)),
                                BinOp(">", ColumnRef("b"), Literal(14)))

    def test_no_precedence_rightmost_splits(self):
        # a + b * c parses as (a + b) * c — reference splitter has no
        # precedence (expression_parser.rs:86-132)
        e = parse_expression("a + b * c")
        assert e == BinOp("*", BinOp("+", ColumnRef("a"), ColumnRef("b")), ColumnRef("c"))

    def test_parens_group(self):
        e = parse_expression("a + (b * c)")
        assert e == BinOp("+", ColumnRef("a"), BinOp("*", ColumnRef("b"), ColumnRef("c")))

    def test_literals(self):
        assert parse_expression("2") == Literal(2)
        assert parse_expression("2.5") == Literal(Decimal("2.5"))
        assert parse_expression('"hi"') == Literal("hi")
        assert parse_expression("true") == Literal(True)
        assert parse_expression("false") == Literal(False)
        assert parse_expression("-3") == Literal(-3)
        e = parse_expression("a - 3")
        assert e == BinOp("-", ColumnRef("a"), Literal(3))

    def test_memo(self):
        assert parse_expression("memo.count") == MemoRef("count")

    def test_decimal_literal_is_decimal(self):
        # '.' => Decimal (expression_parser.rs:160-165)
        assert isinstance(parse_expression("1.0").value, Decimal)

    def test_errors(self):
        with pytest.raises(ExpressionError):
            parse_expression("a +")
        with pytest.raises(ExpressionError):
            parse_expression("(a + b")
        with pytest.raises(ExpressionError):
            parse_statement("a ~ b ~ c")


SCHEMA = T.StructType(
    [
        T.StructField("i", T.LongType()),
        T.StructField("j", T.LongType()),
        T.StructField("d", T.DecimalType(38, 18)),
        T.StructField("s", T.StringType()),
        T.StructField("t", T.StringType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("f", T.DoubleType()),
    ]
)


@pytest.mark.usefixtures("spark")
class TestTypeInference:
    def test_int_int(self):
        assert infer_type(parse_expression("i + j"), SCHEMA) == T.LongType()

    def test_int_decimal_promotes(self):
        assert infer_type(parse_expression("i + d"), SCHEMA) == T.DecimalType(38, 18)

    def test_int_div_is_long(self):
        assert infer_type(parse_expression("i / j"), SCHEMA) == T.LongType()

    def test_pow_is_double(self):
        assert infer_type(parse_expression("i ^ j"), SCHEMA) == T.DoubleType()

    def test_comparison_bool(self):
        assert infer_type(parse_expression("i < j"), SCHEMA) == T.BooleanType()
        # Decimal comparisons allowed (reference gap fixed, Appendix A #3)
        assert infer_type(parse_expression("d >= i"), SCHEMA) == T.BooleanType()

    def test_concat(self):
        assert infer_type(parse_expression("s + t"), SCHEMA) == T.StringType()

    def test_memo_requires_aggregation(self):
        with pytest.raises(ExpressionError):
            infer_type(parse_expression("memo.x + 1"), SCHEMA)


class TestCompiledEval:
    @pytest.fixture(scope="class")
    def df(self, spark):
        return spark.createDataFrame(
            [(7, 2, Decimal("1.5"), "foo", "bar", True, 2.0),
             (-7, 2, Decimal("-1.5"), "a", "b", False, 0.5)],
            schema=SCHEMA,
        )

    def _eval(self, df, src):
        tc = compile_expr(parse_expression(src), df.schema)
        return [r[0] for r in df.select(tc.col).collect()]

    def test_integer_division_truncates(self, df):
        # Rust isize division truncates toward zero (config/types.rs:75)
        assert self._eval(df, "i / j") == [3, -3]

    def test_division_by_zero_null(self, df):
        assert self._eval(df, "i / (j - 2)") == [None, None]

    def test_decimal_arithmetic(self, df):
        assert self._eval(df, "d * 2") == [Decimal("3"), Decimal("-3")]

    def test_string_concat_fixed(self, df):
        # reference bug: returned the left operand (config/types.rs:89-96)
        assert self._eval(df, "s + t") == ["foobar", "ab"]

    def test_pow_standard(self, df):
        assert self._eval(df, "j ^ 3") == [8.0, 8.0]

    def test_bools(self, df):
        assert self._eval(df, "(i > 0) && (j > 0)") == [True, False]
        assert self._eval(df, "(i > 0) || (j > 100)") == [True, False]

    def test_mixed_numeric_compare(self, df):
        assert self._eval(df, "d < i") == [True, False]

    def test_functions_extension(self, df):
        assert self._eval(df, "abs(i)") == [7, 7]
        assert self._eval(df, "length(s)") == [3, 1]
        assert self._eval(df, "upper(s)") == ["FOO", "A"]
        assert self._eval(df, "concat(s, t)") == ["foobar", "ab"]


class TestReferenceSplitterPrecedence:
    """expression_parser.rs:86-132: FIRST depth-0 comparison token splits
    (loop breaks); arithmetic overwrites so the RIGHTMOST one wins."""

    def _shape(self, src):
        from reactivedb_spark.expr.ast import BinOp
        from reactivedb_spark.expr.parser import parse_expression

        def s(e):
            return f"({s(e.left)}{e.op}{s(e.right)})" if isinstance(e, BinOp) else "."
        return s(parse_expression(src))

    def test_boolean_chain_splits_at_first(self):
        assert self._shape("a && b || c") == "(.&&(.||.))"

    def test_comparison_binds_before_arithmetic_on_right(self):
        assert self._shape("x > y + 1") == "(.>(.+.))"

    def test_arithmetic_rightmost(self):
        assert self._shape("a + b * c") == "((.+.)*.)"

    def test_mixed(self):
        assert self._shape("a + b > c * d") == "((.+.)>(.*.))"
        assert self._shape("a == b && c") == "(.==(.&&.))"

    def test_parens_still_group(self):
        assert self._shape("(a && b) || c") == "((.&&.)||.)"
