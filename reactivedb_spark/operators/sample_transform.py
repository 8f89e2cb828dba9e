"""SampleTransform — deterministic hash sampling as a reactive derived
table (extension transform #2 in the reference's YAML surface, after
DedupTransform; no reference analogue).

Config::

    Derived:
      name: docs_sample
      transform_definition:
        SampleTransform: {source_table: documents, key: doc_id, rate_pct: 10}

Keeps a row iff ``md5(key) mod 100 < rate_pct`` — the same portable
hash-gate as ``operators/sampling.hash_sample``, so the sample is
repeatable across engines/reruns and JOIN-CONSISTENT: any table sampled
on the same key keeps the same entities. Stateless and rowwise (the
engine's provenance machinery handles delete cascades), so inserts are
a narrow filter over the delta — no state read at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from reactivedb_spark import constants as C
from reactivedb_spark.config import SampleTransformConfig
from reactivedb_spark.errors import ConfigError
from reactivedb_spark.operators.sampling import _hash64


def business_fields(schema: T.StructType) -> list[T.StructField]:
    return [f for f in schema.fields if f.name not in C.SYSTEM_COLUMNS]


def output_schema(cfg: SampleTransformConfig, parent: T.StructType) -> T.StructType:
    if cfg.key not in parent.fieldNames() or cfg.key in C.SYSTEM_COLUMNS:
        raise ConfigError(
            f"SampleTransform: key column {cfg.key!r} not in parent schema"
        )
    if not 0 <= cfg.rate_pct <= 100:
        raise ConfigError(
            f"SampleTransform: rate_pct must be in [0, 100], got {cfg.rate_pct}"
        )
    fields = [
        T.StructField(C.ENTRY_ID, T.StringType(), False),
        T.StructField(C.SOURCE_ENTRY_ID, T.StringType(), True),
        T.StructField(C.SEQ, T.LongType(), False),
    ] + business_fields(parent)
    return T.StructType(fields)


def apply_delta(cfg: SampleTransformConfig, delta: DataFrame) -> DataFrame:
    kept = delta.filter(_hash64(F.col(cfg.key)) % 100 < cfg.rate_pct)
    cols = [F.col(C.ENTRY_ID).alias(C.SOURCE_ENTRY_ID), F.col(C.SEQ)]
    cols += [F.col(f.name) for f in business_fields(delta.schema)]
    return kept.select(*cols)
