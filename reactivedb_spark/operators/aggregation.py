"""AggregationTransform — per-key fold with a `memo.*` accumulator.

Reference semantics (transform.rs:83-102,229-275): on each parent insert,
re-scan the whole group (``get_all(source, agg_col, value)``,
transform.rs:239) and fold the assignment expressions left-to-right over
the group's rows; the accumulator ``memo.<dest>`` starts at ``Integer(0)``
(transform.rs:250,255 — quirk kept, SURVEY.md Appendix A #9). The result
row replaces the previous group row (Update on ``aggregatedColumn``).
Canonical configs: ``count ~ memo.count + 1``, ``sum ~ memo.sum + x``,
``average ~ memo.sum / memo.count`` (README.md:60-71).

Spark expression — two compilation strategies, chosen statically:

- **Decomposable** (every dest is sum-like ``memo.d + E``, post-only
  (memo refs only), or memo-free): native ``groupBy(...).agg(sum/…)``
  with map-side partial aggregation — one shuffle, whole-stage codegen,
  scales to any group size.
- **General fold**: ``aggregate(array_sort(collect_list(struct(_seq, …))),
  init, step)`` — an ordered left fold per group, exactly the reference's
  sequential semantics. Groups must fit in executor memory; documented
  limitation of non-decomposable folds (the reference has the same O(group)
  behavior per insert, only worse).

The engine re-aggregates only *affected* keys per batch (semi-join on the
delta's keys), mirroring the reference's per-key re-scan but batched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from reactivedb_spark import constants as C
from reactivedb_spark.config import AggregationTransformConfig
from reactivedb_spark.errors import ConfigError
from reactivedb_spark.expr.ast import (
    BinOp, ColumnRef, Expr, Literal, MemoRef, has_column, has_memo,
)
from reactivedb_spark.expr.compiler import TypedColumn, compile_expr, field_type, infer_type


def memo_types(cfg: AggregationTransformConfig, parent: T.StructType) -> dict[str, T.DataType]:
    """Fixpoint memo typing: init Integer(0) ⇒ LongType, then widen through
    the assignment expressions until stable (e.g. ``memo.count + 1.0``
    widens count to Decimal)."""
    types: dict[str, T.DataType] = {st.dest: T.LongType() for st in cfg.functions}
    for _ in range(5):
        changed = False
        for st in cfg.functions:
            t = infer_type(st.expr, parent, memo_types=types)
            if types[st.dest] != t:
                types[st.dest] = t
                changed = True
        if not changed:
            return types
    raise ConfigError(f"memo types did not converge for {list(types)}")


def _sum_term(st) -> Expr | None:
    """``dest ~ memo.dest + E`` (either side) or ``dest ~ memo.dest - E``
    (memo left only — ``E - memo.dest`` alternates sign per row and is NOT
    a sum) with E memo-free → the per-row summand (negated via ``0 - E``
    for the minus fold)."""
    e = st.expr
    if isinstance(e, BinOp) and e.op == "+":
        if isinstance(e.left, MemoRef) and e.left.name == st.dest and not has_memo(e.right):
            return e.right
        if isinstance(e.right, MemoRef) and e.right.name == st.dest and not has_memo(e.left):
            return e.left
    if isinstance(e, BinOp) and e.op == "-":
        if isinstance(e.left, MemoRef) and e.left.name == st.dest and not has_memo(e.right):
            return BinOp("-", Literal(0), e.right)
    return None


def classify(cfg: AggregationTransformConfig):
    """Return {dest: ("sum", term) | ("post", expr) | ("last", expr)} if the
    whole transform is decomposable, else None (→ general fold)."""
    plan = {}
    sum_or_last = set()
    for st in cfg.functions:
        term = _sum_term(st)
        if term is not None:
            plan[st.dest] = ("sum", term)
            sum_or_last.add(st.dest)
            continue
        if not has_memo(st.expr):
            plan[st.dest] = ("last", st.expr)
            sum_or_last.add(st.dest)
            continue
        if not has_column(st.expr):
            refs = {n.name for n in st.expr.walk() if isinstance(n, MemoRef)}
            if refs <= sum_or_last:
                plan[st.dest] = ("post", st.expr)
                continue
        return None
    return plan


def output_schema(cfg: AggregationTransformConfig, parent: T.StructType) -> T.StructType:
    mtypes = memo_types(cfg, parent)
    fields = [
        T.StructField(C.ENTRY_ID, T.StringType(), False),
        T.StructField(C.SOURCE_ENTRY_ID, T.StringType(), True),
        T.StructField(C.SEQ, T.LongType(), False),
        T.StructField(C.AGGREGATED_COLUMN, field_type(parent, cfg.aggregated_column), True),
    ]
    fields += [T.StructField(st.dest, mtypes[st.dest], True) for st in cfg.functions]
    return T.StructType(fields)


def _last_agg(value: Column) -> Column:
    """Value carried by the group's highest ``_seq``."""
    return F.max(F.struct(F.col(C.SEQ).alias("s"), value.alias("v")))["v"]


def merge_with_state(
    cfg: AggregationTransformConfig,
    state_rows: DataFrame,
    delta_groups: DataFrame,
    parent_schema: T.StructType,
) -> DataFrame:
    """Incremental state merge for decomposable plans (insert-only delta):
    new_sum = old_sum + delta_sum, last = delta's (strictly newer), posts
    recomputed — **no parent re-scan**. This is the map-side-combine /
    partial-aggregate pattern applied across batches; at cluster scale it
    is the difference between O(delta) and O(affected groups × group
    size) per micro-batch.
    """
    plan = classify(cfg)
    assert plan is not None, "merge_with_state requires a decomposable plan"
    mtypes = memo_types(cfg, parent_schema)
    o = state_rows.select(
        F.col(C.AGGREGATED_COLUMN).alias("_k"),
        F.lit(True).alias("_matched"),
        *[F.col(st.dest).alias(f"_o_{st.dest}") for st in cfg.functions],
    )
    merged = delta_groups.join(o, delta_groups[C.AGGREGATED_COLUMN] == o["_k"], "left")
    cur: dict[str, Column] = {}
    for st in cfg.functions:
        kind, _term = plan[st.dest]
        if kind == "sum":
            # _matched (never-null marker), NOT coalesce on the value:
            # a NULL in prior state means the fold is poisoned and must
            # STAY NULL (r12 fold-fuzz finding); only a join miss (no
            # prior group row) initializes at 0. Internal columns are
            # referenced through the `o` handle, never by bare name —
            # config.py additionally rejects colliding dests (ADVICE r12).
            old = F.when(o["_matched"].isNull(),
                         F.lit(0).cast(mtypes[st.dest])
                         ).otherwise(o[f"_o_{st.dest}"])
            new = F.col(st.dest)
            if isinstance(mtypes[st.dest], T.DecimalType):
                # Per-add operand coercion parity with compute_groups
                # (ADVICE r12): the fold contract coerces BOTH add
                # operands to decimal(19,9) HALF_UP, NULLing on
                # |value| >= 1e10 — so the merge's old+delta add applies
                # the same guard to each operand. Residual declared
                # divergence (same class as compute_groups): delta_sum
                # is an aggregated addend, so a mid-DELTA |memo| >= 1e10
                # crossing that re-enters range NULLs the true sequential
                # fold but not this merge; the general fold path remains
                # the exact-semantics fallback.
                old = old.try_cast(T.DecimalType(19, 9))
                new = new.try_cast(T.DecimalType(19, 9))
            cur[st.dest] = (old + new).cast(mtypes[st.dest])
        elif kind == "last":
            cur[st.dest] = F.col(st.dest)  # delta rows are strictly newer
    for st in cfg.functions:
        if plan[st.dest][0] == "post":
            def resolver(m: MemoRef) -> TypedColumn:
                return TypedColumn(cur[m.name], mtypes[m.name])

            tc = compile_expr(st.expr, parent_schema, memo_resolver=resolver)
            cur[st.dest] = tc.col.cast(mtypes[st.dest])
    return merged.select(
        F.col(C.SOURCE_ENTRY_ID),
        F.col(C.SEQ),
        F.col(C.AGGREGATED_COLUMN),
        *[cur[st.dest].alias(st.dest) for st in cfg.functions],
    )


def compute_groups(cfg: AggregationTransformConfig, parent_rows: DataFrame) -> DataFrame:
    """Aggregate ``parent_rows`` (already filtered to affected keys by the
    engine) into one output row per key."""
    schema = parent_rows.schema
    mtypes = memo_types(cfg, schema)
    plan = classify(cfg)
    base = [
        _last_agg(F.col(C.ENTRY_ID)).alias(C.SOURCE_ENTRY_ID),
        F.max(C.SEQ).alias(C.SEQ),
    ]
    if plan is not None:
        aggs, posts = list(base), []
        for st in cfg.functions:
            kind, term = plan[st.dest]
            if kind == "sum":
                tc = compile_expr(term, schema)
                col = tc.col
                if isinstance(mtypes[st.dest], T.DecimalType):
                    # Per-add operand coercion parity (r12 fold-fuzz
                    # finding #3): the fold computes memo + term with BOTH
                    # operands HALF_UP-coerced to decimal(19,9) (the DSL's
                    # declared operand contract, expr/compiler.py) — so
                    # each TERM rounds to 9 fractional digits before it
                    # accumulates, and the running value stays scale-9
                    # exact. A bare F.sum of the full-scale (38,18) terms
                    # kept low-order digits the fold had already shed.
                    # try_cast: term |value| >= 1e10 coerces to NULL in
                    # the fold too. Residual declared divergence: a
                    # mid-sequence |memo| >= 1e10 that RE-ENTERS range
                    # NULLs the fold but not this sum — unreachable
                    # without |Σ| >= 1e10 crossings, and the general fold
                    # path remains the exact-semantics fallback.
                    col = col.try_cast(T.DecimalType(19, 9))
                # NULL-poisoning parity (r12 fold-fuzz finding): the
                # reference fold computes memo + term sequentially, so ONE
                # NULL term makes the memo NULL for the rest of the group;
                # a bare F.sum would SKIP null terms and diverge. count()
                # counts all rows, count(term) non-null terms — any gap
                # means the fold would have poisoned the accumulator.
                aggs.append(
                    F.when(F.count(F.lit(1)) == F.count(col),
                           F.sum(col))
                    .cast(mtypes[st.dest]).alias(st.dest))
            elif kind == "last":
                tc = compile_expr(term, schema)
                aggs.append(_last_agg(tc.col).cast(mtypes[st.dest]).alias(st.dest))
            else:
                posts.append(st)
        out = parent_rows.groupBy(
            F.col(cfg.aggregated_column).alias(C.AGGREGATED_COLUMN)
        ).agg(*aggs)
        for st in posts:
            def resolver(m: MemoRef) -> TypedColumn:
                return TypedColumn(F.col(m.name).cast(mtypes[m.name]), mtypes[m.name])

            tc = compile_expr(st.expr, schema, memo_resolver=resolver)
            out = out.withColumn(st.dest, tc.col.cast(mtypes[st.dest]))
        ordered = [C.SOURCE_ENTRY_ID, C.SEQ, C.AGGREGATED_COLUMN] + [st.dest for st in cfg.functions]
        return out.select(*ordered)

    # General ordered fold (reference-exact sequential semantics).
    needed = sorted(
        {n.name for st in cfg.functions for n in st.expr.walk() if isinstance(n, ColumnRef)}
    )
    row_struct = F.struct(
        F.col(C.SEQ).alias("_s"), *[F.col(c).alias(c) for c in needed]
    )
    arr = F.array_sort(F.collect_list(row_struct))
    # NULL-safe accumulator encoding (r12 fold-fuzz finding): Spark's
    # aggregate() with a STRUCT accumulator silently rewrites a NULL
    # field to the field's zero value when materializing the struct
    # (reproduced in both the Column and SQL forms on 4.1.x; a SCALAR
    # accumulator propagates NULL correctly). A memo poisoned by a NULL
    # term therefore "recovered" to 0 mid-fold. Each memo field is
    # stored as a never-NULL pair — `<d>__n` (is-null flag) + `<d>__v`
    # (value, 0 when null) — so the struct never carries a NULL field;
    # memo refs decode the pair, the final projection re-encodes NULL.
    init = F.struct(
        *[c for st in cfg.functions for c in (
            F.lit(False).alias(f"{st.dest}__n"),
            F.lit(0).cast(mtypes[st.dest]).alias(f"{st.dest}__v"))]
    )

    def step(acc: Column, x: Column) -> Column:
        # Left-to-right per-row assignment updates, each seeing the memo
        # values already updated by earlier assignments on the same row
        # (transform.rs:250-266).
        cur: dict[str, Column] = {
            st.dest: F.when(acc[f"{st.dest}__n"],
                            F.lit(None).cast(mtypes[st.dest])
                            ).otherwise(acc[f"{st.dest}__v"])
            for st in cfg.functions
        }

        def resolver(m: MemoRef) -> TypedColumn:
            if m.name not in cur:
                raise ConfigError(f"unknown memo.{m.name}")
            return TypedColumn(cur[m.name], mtypes[m.name])

        for st in cfg.functions:
            tc = compile_expr(
                st.expr,
                parent_rows.schema,
                memo_resolver=resolver,
                column_resolver=lambda name, _dt: x[name],
            )
            cur[st.dest] = tc.col.cast(mtypes[st.dest])
        return F.struct(*[c for st in cfg.functions for c in (
            cur[st.dest].isNull().alias(f"{st.dest}__n"),
            F.coalesce(cur[st.dest], F.lit(0).cast(mtypes[st.dest]))
            .alias(f"{st.dest}__v"))])

    folded = F.aggregate(arr, init, step).alias("_m")
    out = parent_rows.groupBy(
        F.col(cfg.aggregated_column).alias(C.AGGREGATED_COLUMN)
    ).agg(*base, folded)
    cols = [C.SOURCE_ENTRY_ID, C.SEQ, C.AGGREGATED_COLUMN] + [
        F.when(F.col("_m")[f"{st.dest}__n"],
               F.lit(None).cast(mtypes[st.dest]))
        .otherwise(F.col("_m")[f"{st.dest}__v"]).alias(st.dest)
        for st in cfg.functions
    ]
    return out.select(*cols)
