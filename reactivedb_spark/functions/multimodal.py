"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (per the build spec): image/audio/video payloads are opaque
``BinaryType`` columns; decode / feature-extraction / resize / frame-
sampling run as Arrow-batched Pandas UDFs over ``mapInPandas`` so the
bytes never take the row-at-a-time Python path. The actual codec calls
are **stubbed** (no image/audio libraries in this container): decoding is
a clearly-marked deterministic fake over the byte content, while all the
Spark-side plumbing — schema, batch iteration, partitioning behavior —
is real and tested.

At 100 TB the payload column dominates I/O: keep payloads in their own
parquet column (column pruning skips them unless referenced), partition
by content type/date, and never collect them to the driver.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

def _register_self_by_value() -> None:
    """Worker processes may not have this package on sys.path (the driver
    controls cwd/sys.path); registering this module for cloudpickle
    by-value serialization makes the mapInPandas closures self-contained."""
    import sys

    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

_FORMATS = ["png", "jpeg", "webp"]


def fake_decode_bytes(payload: bytes) -> dict:
    """STUB decoder: deterministic pseudo-metadata from the byte content.

    A real deployment replaces this with PIL/ffmpeg/etc. behind the same
    signature; everything around it (Arrow batching, schema, partition
    behavior) is production-shaped.
    """
    n = len(payload)
    first = payload[0] if n else 0
    return {
        "width": 64 + (n % 512),
        "height": 64 + ((n * 31 + first) % 512),
        "format": _FORMATS[n % len(_FORMATS)],
        "n_bytes": n,
    }


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture helper: fabricate a binary payload column from text (the
    fixtures carry no true binary column)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_metadata(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """mapInPandas 'decode': (id, width, height, format, n_bytes)."""
    out_schema = T.StructType(
        [df.schema[id_col]] + list(DECODED_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            metas = [fake_decode_bytes(b) for b in pdf[payload_col]]
            out = pd.DataFrame(metas)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    _register_self_by_value()
    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def resize(df: DataFrame, id_col: str, payload_col: str = "payload",
           target: int = 64) -> DataFrame:
    """STUB resize: returns (id, payload) with the payload downsampled by
    taking every k-th byte so the output is ≤ ``target``² bytes — a real
    pipeline swaps in PIL/opencv behind the same mapInPandas shape.
    Exercises binary-in/binary-out Arrow batching."""
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("payload", T.BinaryType())]
    )
    limit = target * target

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            outs = []
            for b in pdf[payload_col]:
                b = b or b""
                step = max(1, (len(b) + limit - 1) // limit)
                outs.append(bytes(b[::step]))
            yield pd.DataFrame({id_col: pdf[id_col].values, "payload": outs})

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def extract_features(df: DataFrame, id_col: str, payload_col: str = "payload",
                     dim: int = 8) -> DataFrame:
    """STUB feature extractor: deterministic ``dim``-float vector from byte
    histograms (bucket means / 255) — the embedding-column producer shape;
    a real deployment runs a vision/audio model per Arrow batch here."""
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for b in pdf[payload_col]:
                b = b or b""
                buckets = [0.0] * dim
                counts = [0] * dim
                for i, byte in enumerate(b):
                    buckets[i % dim] += byte
                    counts[i % dim] += 1
                feats.append(
                    [float(buckets[i] / counts[i] / 255.0) if counts[i] else 0.0
                     for i in range(dim)]
                )
            yield pd.DataFrame({id_col: pdf[id_col].values, "features": feats})

    _register_self_by_value()
    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def sample_frames(df: DataFrame, id_col: str, payload_col: str = "payload",
                  every_n: int = 100) -> DataFrame:
    """STUB frame sampler: emits (id, frame_no, frame_bytes) rows taking
    every ``every_n``-th byte-window as a fake 'frame' — exercises the
    one-to-many mapInPandas shape a real video pipeline needs."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("frame_no", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = payload or b""
                for k, off in enumerate(range(0, len(payload), every_n)):
                    rows.append((rid, k, payload[off:off + every_n]))
            if rows:
                yield pd.DataFrame(rows, columns=[id_col, "frame_no", "frame"])

    _register_self_by_value()
    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)
