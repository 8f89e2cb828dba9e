"""Lexer + parser for the expression DSL.

Matches the reference grammar (reactive_db/src/config/expression_parser.rs):

- lexer (:196-279): words, int/decimal literals (``.`` ⇒ Decimal), ``"str"``
  literals, ``true``/``false``, operators, parens, ``~``.
- statement (:14-56): ``dest ~ expr`` (or ``expr ~ dest``) is an Assignment;
  a bare expression is a Comparison (used by FilterTransform).
- expression splitter (:83-137): **no conventional precedence** — the FIRST
  comparison/boolean token (``== != <= >= < > && ||``) at paren depth 0
  becomes the root (the reference loop ``break``s on it), otherwise the
  RIGHT-most arithmetic operator does (overwrite without break). So
  ``a + b * c`` ⇒ ``(a + b) * c``, ``x > y + 1`` ⇒ ``x > (y + 1)``,
  ``a && b || c`` ⇒ ``a && (b || c)``. Parentheses group.

Extension beyond the reference: ``name(arg, ...)`` scalar calls parse AND
compile (the reference parses them then errors at execution, transform.rs:291).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from decimal import Decimal

from reactivedb_spark.errors import ExpressionError
from reactivedb_spark.expr.ast import (
    ALL_OPS, BinOp, ColumnRef, Expr, FuncCall, Literal, MemoRef,
)

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>\d+\.\d+|\d+\.|\.\d+|\d+)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)
  | (?P<op><=|>=|==|!=|&&|\|\||[-+*/^<>])
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<tilde>~)
  | (?P<comma>,)
    """,
    re.VERBOSE,
)


@dataclass(frozen=True)
class Token:
    kind: str  # num | str | ident | op | lparen | rparen | tilde | comma
    text: str


def tokenize(src: str) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise ExpressionError(f"cannot tokenize at {src[pos:pos + 20]!r} in {src!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        # Fold unary minus into a numeric literal when it cannot be binary:
        # at expression start, or after an operator / '(' / '~' / ','.
        if (
            kind == "num"
            and tokens
            and tokens[-1].kind == "op"
            and tokens[-1].text == "-"
            and (len(tokens) == 1 or tokens[-2].kind in ("op", "lparen", "tilde", "comma"))
        ):
            tokens.pop()
            text = "-" + text
        tokens.append(Token(kind, text))
    return tokens


class Statement:
    pass


@dataclass(frozen=True)
class Assignment(Statement):
    dest: str
    expr: Expr


@dataclass(frozen=True)
class Comparison(Statement):
    expr: Expr


def parse_statement(src: str) -> Statement:
    """``dest ~ expr`` → Assignment; bare expression → Comparison."""
    tokens = tokenize(src)
    depth = 0
    tilde_at = None
    for i, t in enumerate(tokens):
        if t.kind == "lparen":
            depth += 1
        elif t.kind == "rparen":
            depth -= 1
        elif t.kind == "tilde" and depth == 0:
            if tilde_at is not None:
                raise ExpressionError(f"multiple '~' in statement: {src!r}")
            tilde_at = i
    if tilde_at is None:
        return Comparison(_parse(tokens, src))
    left, right = tokens[:tilde_at], tokens[tilde_at + 1:]
    # The dest is whichever side is a single bare identifier
    # (expression_parser.rs:14-51 accepts both orders).
    if len(left) == 1 and left[0].kind == "ident" and "." not in left[0].text:
        return Assignment(left[0].text, _parse(right, src))
    if len(right) == 1 and right[0].kind == "ident" and "." not in right[0].text:
        return Assignment(right[0].text, _parse(left, src))
    raise ExpressionError(f"one side of '~' must be a bare destination column: {src!r}")


def parse_expression(src: str) -> Expr:
    return _parse(tokenize(src), src)


def _parse(tokens: list[Token], src: str) -> Expr:
    if not tokens:
        raise ExpressionError(f"empty expression in {src!r}")
    # Reference splitter (expression_parser.rs:86-132): the FIRST depth-0
    # comparison/boolean token splits immediately (loop `break`s), while
    # arithmetic operators overwrite, so the RIGHTMOST arithmetic operator
    # before any comparison wins. 'a && b || c' ⇒ a && (b || c);
    # 'x > y + 1' ⇒ x > (y + 1); 'a + b * c' ⇒ (a + b) * c.
    comparisons = {"==", "!=", "<=", ">=", "<", ">", "&&", "||"}
    depth = 0
    split_at = None
    broke_early = False
    for i, t in enumerate(tokens):
        if t.kind == "lparen":
            depth += 1
        elif t.kind == "rparen":
            depth -= 1
            if depth < 0:
                raise ExpressionError(f"unbalanced ')' in {src!r}")
        elif t.kind == "op" and depth == 0:
            if i == 0 or tokens[i - 1].kind == "op":
                raise ExpressionError(f"misplaced operator {t.text!r} in {src!r}")
            split_at = i
            if t.text in comparisons:
                # the recursive parse of the right half re-checks balance
                broke_early = True
                break
    if depth != 0 and not broke_early:
        raise ExpressionError(f"unbalanced '(' in {src!r}")
    if split_at is not None:
        op = tokens[split_at].text
        if op not in ALL_OPS:
            raise ExpressionError(f"unknown operator {op!r} in {src!r}")
        return BinOp(op, _parse(tokens[:split_at], src), _parse(tokens[split_at + 1:], src))
    return _parse_primary(tokens, src)


def _parse_primary(tokens: list[Token], src: str) -> Expr:
    t0 = tokens[0]
    if t0.kind == "lparen":
        if tokens[-1].kind != "rparen":
            raise ExpressionError(f"expected ')' at end of group in {src!r}")
        return _parse(tokens[1:-1], src)
    if len(tokens) == 1:
        if t0.kind == "num":
            if "." in t0.text:
                return Literal(Decimal(t0.text))
            return Literal(int(t0.text))
        if t0.kind == "str":
            body = t0.text[1:-1]
            return Literal(re.sub(r'\\(.)', r"\1", body))
        if t0.kind == "ident":
            if t0.text == "true":
                return Literal(True)
            if t0.text == "false":
                return Literal(False)
            if t0.text.startswith("memo."):
                name = t0.text[len("memo."):]
                if not name or "." in name:
                    raise ExpressionError(f"bad memo reference {t0.text!r}")
                return MemoRef(name)
            if "." in t0.text:
                # struct field access compiles via F.col("a.b")
                return ColumnRef(t0.text)
            return ColumnRef(t0.text)
        raise ExpressionError(f"unexpected token {t0.text!r} in {src!r}")
    # function call: ident ( args )
    if t0.kind == "ident" and tokens[1].kind == "lparen" and tokens[-1].kind == "rparen":
        args: list[Expr] = []
        buf: list[Token] = []
        depth = 0
        for t in tokens[2:-1]:
            if t.kind == "lparen":
                depth += 1
            elif t.kind == "rparen":
                depth -= 1
            if t.kind == "comma" and depth == 0:
                args.append(_parse(buf, src))
                buf = []
            else:
                buf.append(t)
        if buf:
            args.append(_parse(buf, src))
        elif args:
            raise ExpressionError(f"trailing comma in call in {src!r}")
        return FuncCall(t0.text.lower(), tuple(args))
    raise ExpressionError(f"cannot parse {' '.join(t.text for t in tokens)!r} in {src!r}")
