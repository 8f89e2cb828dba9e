"""Table storage: versioned parquet snapshots.

Replaces the reference's block-chained row files + per-column B+trees
(storage_manager_v2.rs:20-24,77-125 — deliberately NOT ported, SURVEY.md
§1.4): columnar parquet gives scan pushdown/pruning instead of indexes.

Layout: ``<root>/<table>/v<k>/part-*.parquet``. Appends add files to the
current version dir; mutations (merge/delete) write the next version dir
and flip the pointer — a poor-man's Delta-style snapshot isolation that is
atomic per commit and keeps readers of the old version valid. On a real
cluster this layer is Delta Lake/Iceberg (``MERGE INTO`` + CDF); the
engine's API is shaped so only this module would change.

Every write goes through a staged parquet round-trip, which **pins
nondeterministic values** (``uuid()`` entry ids) before anything
downstream references them — re-evaluating a lazy plan would otherwise
regenerate them (SURVEY.md §7 hard-problem #1 neighbor).
"""

from __future__ import annotations

import os
import shutil
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession, types as T


class ParquetSnapshotStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._schemas: dict[str, T.StructType] = {}
        self._versions: dict[str, int] = {}
        os.makedirs(root, exist_ok=True)

    # -- lifecycle ---------------------------------------------------------
    def init_table(self, name: str, schema: T.StructType) -> None:
        self._schemas[name] = schema
        self._versions[name] = 0

    def _dir(self, name: str, version: int | None = None) -> str:
        v = self._versions[name] if version is None else version
        return os.path.join(self.root, name, f"v{v:06d}")

    def _has_files(self, path: str) -> bool:
        return os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        )

    # -- reads -------------------------------------------------------------
    def read(self, name: str) -> DataFrame:
        path = self._dir(name)
        schema = self._schemas[name]
        if not self._has_files(path):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(path)

    # -- writes ------------------------------------------------------------
    def stage(self, name: str, df: DataFrame) -> DataFrame:
        """Materialize a delta to scratch parquet and read it back (pins
        uuids / nondeterministic expressions)."""
        path = os.path.join(self.root, "_staging", name, _uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.schema(self._schemas[name]).parquet(path)

    def append(self, name: str, materialized: DataFrame) -> None:
        materialized.write.mode("append").parquet(self._dir(name))

    def replace(self, name: str, df: DataFrame) -> None:
        nxt = self._versions[name] + 1
        df.write.mode("overwrite").parquet(self._dir(name, nxt))
        self._versions[name] = nxt
        old = self._dir(name, nxt - 2)
        if os.path.isdir(old):  # keep one back-version for in-flight readers
            shutil.rmtree(old, ignore_errors=True)

    def cleanup(self) -> None:
        shutil.rmtree(os.path.join(self.root, "_staging"), ignore_errors=True)
