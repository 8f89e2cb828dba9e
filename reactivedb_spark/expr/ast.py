"""AST for the expression DSL (reference IR: nested `Expression` enum,
reactive_db/src/config/types.rs — ours is a plain dataclass tree)."""

from __future__ import annotations

from dataclasses import dataclass
from decimal import Decimal


class Expr:
    """Base expression node."""

    def walk(self):
        yield self


@dataclass(frozen=True)
class Literal(Expr):
    value: object  # int | Decimal | str | bool

    @property
    def kind(self) -> str:
        if isinstance(self.value, bool):
            return "bool"
        if isinstance(self.value, int):
            return "int"
        if isinstance(self.value, Decimal):
            return "decimal"
        return "str"


@dataclass(frozen=True)
class ColumnRef(Expr):
    name: str


@dataclass(frozen=True)
class MemoRef(Expr):
    """`memo.<dest>` — the per-group accumulator inside an Aggregation
    transform (reference: expression_parser.rs:173-181, transform.rs:248-266)."""

    name: str


@dataclass(frozen=True)
class BinOp(Expr):
    op: str
    left: Expr
    right: Expr

    def walk(self):
        yield self
        yield from self.left.walk()
        yield from self.right.walk()


@dataclass(frozen=True)
class FuncCall(Expr):
    """Scalar function call. The reference parses these but errors at
    execution (transform.rs:291 "currently unimplimented"); we implement a
    small library as a declared extension."""

    name: str
    args: tuple[Expr, ...]

    def walk(self):
        yield self
        for a in self.args:
            yield from a.walk()


ARITH_OPS = {"+", "-", "*", "/", "^"}
CMP_OPS = {"<", ">", "<=", ">=", "==", "!="}
BOOL_OPS = {"&&", "||"}
ALL_OPS = ARITH_OPS | CMP_OPS | BOOL_OPS


def has_memo(e: Expr) -> bool:
    return any(isinstance(n, MemoRef) for n in e.walk())


def has_column(e: Expr) -> bool:
    return any(isinstance(n, ColumnRef) for n in e.walk())
