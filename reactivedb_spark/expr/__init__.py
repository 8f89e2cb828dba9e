"""Expression DSL: the reference's config expression language.

Grammar matched from reactive_db/src/config/expression_parser.rs (lexer at
:196-279, splitter at :83-137): statements are ``dest ~ expr`` assignments
or bare comparison expressions; operators ``+ - * / ^``, comparisons
``< > <= >= == !=``, boolean ``&& ||``; **no precedence** — the right-most
top-level operator splits first, parentheses group.
"""

from reactivedb_spark.expr.parser import (  # noqa: F401
    parse_statement,
    parse_expression,
    Statement,
    Assignment,
    Comparison,
)
from reactivedb_spark.expr.ast import (  # noqa: F401
    Expr, Literal, ColumnRef, MemoRef, BinOp, FuncCall,
)
from reactivedb_spark.expr.compiler import compile_expr, infer_type, TypedColumn  # noqa: F401
