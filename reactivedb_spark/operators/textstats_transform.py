"""TextStatsTransform — per-document text metrics as a reactive derived
table (extension transform #4 in the reference's YAML surface, after
Dedup/Sample/Chunk; no reference analogue).

Config::

    Derived:
      name: doc_stats
      transform_definition:
        TextStatsTransform: {source_table: documents, text_column: body}

Every source row derives one stats row: token count, character count,
alpha ratio, composite quality score, n-gram language guess, and the
normalization fingerprint — the per-document half of a corpus-quality
dashboard (functions/text.py), attached to the reactive DAG so inserts
keep it current and deletes cascade by provenance. Stateless rowwise:
pure JVM column expressions over the delta, no UDF, no state read —
the cheapest possible transform class in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from reactivedb_spark import constants as C
from reactivedb_spark.config import TextStatsTransformConfig
from reactivedb_spark.errors import ConfigError
from reactivedb_spark.functions import text as TX


def passthrough_fields(cfg: TextStatsTransformConfig,
                       schema: T.StructType) -> list[T.StructField]:
    return [
        f for f in schema.fields
        if f.name not in C.SYSTEM_COLUMNS and f.name != cfg.text_column
    ]


STAT_FIELDS = [
    T.StructField("n_tokens", T.LongType(), False),
    T.StructField("n_chars", T.LongType(), False),
    T.StructField("alpha_ratio", T.DoubleType(), True),
    T.StructField("quality", T.DoubleType(), True),
    T.StructField("lang_guess", T.StringType(), True),
    T.StructField("fingerprint", T.StringType(), True),
]


def output_schema(cfg: TextStatsTransformConfig, parent: T.StructType) -> T.StructType:
    if cfg.text_column not in parent.fieldNames() or cfg.text_column in C.SYSTEM_COLUMNS:
        raise ConfigError(
            f"TextStatsTransform: text column {cfg.text_column!r} not in parent schema"
        )
    if not isinstance(parent[cfg.text_column].dataType, T.StringType):
        raise ConfigError(
            f"TextStatsTransform: text column {cfg.text_column!r} must be Str, "
            f"got {parent[cfg.text_column].dataType.simpleString()}"
        )
    derived = tuple(f.name for f in STAT_FIELDS)
    clash = [f.name for f in passthrough_fields(cfg, parent) if f.name in derived]
    if clash:
        raise ConfigError(
            f"TextStatsTransform: parent columns {clash} collide with derived "
            f"stat columns {list(derived)}"
        )
    fields = [
        T.StructField(C.ENTRY_ID, T.StringType(), False),
        T.StructField(C.SOURCE_ENTRY_ID, T.StringType(), True),
        T.StructField(C.SEQ, T.LongType(), False),
    ] + passthrough_fields(cfg, parent) + list(STAT_FIELDS)
    return T.StructType(fields)


def apply_delta(cfg: TextStatsTransformConfig, delta: DataFrame) -> DataFrame:
    t = F.col(cfg.text_column)
    return delta.select(
        F.col(C.ENTRY_ID).alias(C.SOURCE_ENTRY_ID),
        F.col(C.SEQ),
        *[F.col(f.name) for f in passthrough_fields(cfg, delta.schema)],
        F.coalesce(TX.token_count(t).cast("long"), F.lit(0)).alias("n_tokens"),
        F.length(F.coalesce(t, F.lit(""))).cast("long").alias("n_chars"),
        TX.alpha_ratio(t).alias("alpha_ratio"),
        TX.quality_score(t).alias("quality"),
        TX.lang_id(t).alias("lang_guess"),
        TX.fingerprint(t).alias("fingerprint"),
    )
