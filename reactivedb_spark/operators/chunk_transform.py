"""ChunkTransform — context-window chunking as a reactive derived table
(extension transform #3 in the reference's YAML surface, after
DedupTransform and SampleTransform; no reference analogue).

Config::

    Derived:
      name: doc_chunks
      transform_definition:
        ChunkTransform: {source_table: documents, text_column: body,
                         chunk_size: 64, overlap: 16}

Each source row derives its fixed-size token chunks (stride =
chunk_size − overlap, trailing short chunk kept, empty text → no
chunks) via the same pure-column plan as ``packing.chunk_tokens``.
Rowwise and stateless: inserts are a narrow explode over the delta
(chunk counts bounded by token counts — no state read), and because
every chunk row carries its parent's ``_sourceEntryId``, the engine's
generic provenance machinery cascades deletes without any
chunk-specific code.

The derived schema replaces the text column with (chunk_no,
n_chunk_tokens, chunk_text); every other business column passes
through unchanged (chunk rows stay joinable to their document's
metadata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from reactivedb_spark import constants as C
from reactivedb_spark.config import ChunkTransformConfig
from reactivedb_spark.errors import ConfigError
from reactivedb_spark.operators.packing import chunk_tokens


def passthrough_fields(cfg: ChunkTransformConfig,
                       schema: T.StructType) -> list[T.StructField]:
    return [
        f for f in schema.fields
        if f.name not in C.SYSTEM_COLUMNS and f.name != cfg.text_column
    ]


def output_schema(cfg: ChunkTransformConfig, parent: T.StructType) -> T.StructType:
    if cfg.text_column not in parent.fieldNames() or cfg.text_column in C.SYSTEM_COLUMNS:
        raise ConfigError(
            f"ChunkTransform: text column {cfg.text_column!r} not in parent schema"
        )
    if not isinstance(parent[cfg.text_column].dataType, T.StringType):
        raise ConfigError(
            f"ChunkTransform: text column {cfg.text_column!r} must be Str, "
            f"got {parent[cfg.text_column].dataType.simpleString()}"
        )
    if not 0 <= cfg.overlap < cfg.chunk_size:
        raise ConfigError(
            "ChunkTransform: need 0 <= overlap < chunk_size, got "
            f"{cfg.overlap}/{cfg.chunk_size}"
        )
    derived = ("chunk_no", "n_chunk_tokens", "chunk_text")
    clash = [f.name for f in passthrough_fields(cfg, parent) if f.name in derived]
    if clash:
        raise ConfigError(
            f"ChunkTransform: parent columns {clash} collide with derived "
            f"output columns {list(derived)}"
        )
    fields = [
        T.StructField(C.ENTRY_ID, T.StringType(), False),
        T.StructField(C.SOURCE_ENTRY_ID, T.StringType(), True),
        T.StructField(C.SEQ, T.LongType(), False),
    ] + passthrough_fields(cfg, parent) + [
        T.StructField("chunk_no", T.LongType(), False),
        T.StructField("n_chunk_tokens", T.LongType(), False),
        T.StructField("chunk_text", T.StringType(), False),
    ]
    return T.StructType(fields)


def apply_delta(cfg: ChunkTransformConfig, delta: DataFrame) -> DataFrame:
    chunks = chunk_tokens(
        delta, C.ENTRY_ID, cfg.text_column,
        chunk_size=cfg.chunk_size, overlap=cfg.overlap,
    ).select(
        F.col(C.ENTRY_ID),
        F.col("chunk_no").cast("long").alias("chunk_no"),
        F.col("n_tokens").cast("long").alias("n_chunk_tokens"),
        F.col("chunk_text"),
    )
    # delta-sized equi-join to re-attach passthrough columns + provenance
    # (chunk_tokens is a narrow projection that drops them)
    meta = delta.select(
        F.col(C.ENTRY_ID),
        F.col(C.SEQ),
        *[F.col(f.name) for f in passthrough_fields(cfg, delta.schema)],
    )
    joined = chunks.join(meta, C.ENTRY_ID)
    return joined.select(
        F.col(C.ENTRY_ID).alias(C.SOURCE_ENTRY_ID),
        F.col(C.SEQ),
        *[F.col(f.name) for f in passthrough_fields(cfg, delta.schema)],
        "chunk_no", "n_chunk_tokens", "chunk_text",
    )
