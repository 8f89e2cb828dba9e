"""JoinTransform — incrementally maintained INNER equi-join derived
table (extension; the reference's only multi-parent operator is the
LWW UnionTransform, transform.rs:41-58).

Spark-first shape: each delta application is ONE equi-join of the
(small, file-backed) delta against the other parent's committed state —
AQE sizes the build side at runtime, so a tiny reactive delta rides a
broadcast join while a bulk ``insert_df`` backfill gets a shuffle join.
Cost is O(Δ ⋈ other-state) per commit, never O(L×R): the classic
incremental view maintenance decomposition Δ(L⋈R) = ΔL⋈R_new ∪
(L_new−ΔL)⋈ΔR, applied once per propagation wave with both parents'
deltas in hand so shared-ancestry diamonds never double-count ΔL×ΔR
(wave mechanics on ``Engine._apply_join_wave``; exactness conditions on
:class:`~reactivedb_spark.config.JoinTransformConfig`).

Provenance: every join row carries BOTH origins —
``_sourceEntryId`` (left parent row) and ``_sourceEntryId2`` (right
parent row) — so a delete on either parent cascades by a provenance
semi-join, the same bucket-scoped rewrite path every other transform
uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from reactivedb_spark import constants as C
from reactivedb_spark.config import JoinTransformConfig
from reactivedb_spark.errors import ConfigError


def _data_fields(schema: T.StructType) -> list:
    return [f for f in schema.fields if f.name not in C.SYSTEM_COLUMNS]


def output_schema(cfg: JoinTransformConfig, left: T.StructType,
                  right: T.StructType) -> T.StructType:
    """Left data columns + right data columns (minus the right join key —
    it duplicates the left one); name collisions are a config error."""
    lf = _data_fields(left)
    rf = [f for f in _data_fields(right) if f.name != cfg.right_on]
    if cfg.left_on not in {f.name for f in lf}:
        raise ConfigError(f"JoinTransform: unknown left_on {cfg.left_on!r}")
    if cfg.right_on not in {f.name for f in _data_fields(right)}:
        raise ConfigError(f"JoinTransform: unknown right_on {cfg.right_on!r}")
    # Key TYPE compatibility is a config-time error (ADVICE r7), matching
    # the DSL's compile-time error contract — an Integer-vs-Str join must
    # fail here, not surface later as Spark's implicit-cast semantics
    # (silent empty/partial joins).
    ltype = next(f.dataType for f in lf if f.name == cfg.left_on)
    rtype = next(
        f.dataType for f in _data_fields(right) if f.name == cfg.right_on
    )
    if ltype != rtype:
        raise ConfigError(
            f"JoinTransform: join key type mismatch — left_on "
            f"{cfg.left_on!r} is {ltype.simpleString()}, right_on "
            f"{cfg.right_on!r} is {rtype.simpleString()}; cast upstream "
            "(e.g. via a FunctionTransform) so both keys are identically "
            "typed"
        )
    overlap = {f.name for f in lf} & {f.name for f in rf}
    if overlap:
        raise ConfigError(
            f"JoinTransform: column collision {sorted(overlap)} — rename "
            "upstream (e.g. via a FunctionTransform)"
        )
    fields = [
        T.StructField(C.ENTRY_ID, T.StringType(), False),
        T.StructField(C.SOURCE_ENTRY_ID, T.StringType(), True),
        T.StructField(C.SOURCE_ENTRY_ID2, T.StringType(), True),
        T.StructField(C.SEQ, T.LongType(), False),
    ]
    return T.StructType(fields + lf + rf)


def delta_join(cfg: JoinTransformConfig, delta: DataFrame, other: DataFrame,
               delta_is_left: bool) -> DataFrame:
    """Join the triggering parent's delta against the other parent's
    committed state; emit rows in the child's column layout (the
    engine's commit path assigns the new ``_entryId``)."""
    if delta_is_left:
        l, r = delta, other
    else:
        l, r = other, delta
    ldata = [f.name for f in _data_fields(l.schema)]
    rdata = [f.name for f in _data_fields(r.schema) if f.name != cfg.right_on]
    lhs = l.select(
        F.col(C.ENTRY_ID).alias(C.SOURCE_ENTRY_ID),
        F.col(C.SEQ).alias("_lseq"),
        *[F.col(c) for c in ldata],
    )
    rhs = r.select(
        F.col(C.ENTRY_ID).alias(C.SOURCE_ENTRY_ID2),
        F.col(C.SEQ).alias("_rseq"),
        F.col(cfg.right_on).alias("_rk"),
        *[F.col(c) for c in rdata],
    )
    joined = lhs.join(rhs, F.col(cfg.left_on) == F.col("_rk"), "inner")
    # the commit seq of the TRIGGERING side stamps the derived rows
    seq = F.col("_lseq") if delta_is_left else F.col("_rseq")
    return joined.select(
        C.SOURCE_ENTRY_ID, C.SOURCE_ENTRY_ID2, seq.alias(C.SEQ),
        *[F.col(c) for c in ldata + rdata],
    )
