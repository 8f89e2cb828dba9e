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
    def __init__(self, spark: SparkSession, root: str, compact_threshold: int = 64):
        self.spark = spark
        self.root = root
        self.compact_threshold = compact_threshold
        self._schemas: dict[str, T.StructType] = {}
        self._versions: dict[str, int] = {}
        self._epochs: dict[str, int] = {}
        self._read_cache: dict[tuple, DataFrame] = {}
        os.makedirs(root, exist_ok=True)
        self._load_meta()

    # -- restart/recovery --------------------------------------------------
    # The reference persists tables and re-opens them on start
    # (storage_manager_table.rs:262-293 re-infers schema from stored rows;
    # we re-derive schemas statically from config instead and only persist
    # the version pointers).
    def _meta_path(self) -> str:
        return os.path.join(self.root, "meta.json")

    def _load_meta(self) -> None:
        import json

        try:
            with open(self._meta_path()) as f:
                meta = json.load(f)
            self._versions.update({k: int(v) for k, v in meta.get("versions", {}).items()})
            self._epochs.update({k: int(v) for k, v in meta.get("epochs", {}).items()})
            self._recover(meta.get("files", {}))
        except (FileNotFoundError, ValueError):
            pass

    def _list_rel(self, path: str) -> set[str]:
        """Relative paths of every parquet file under ``path`` (covers
        partitioned layouts: ``col=v/part-*.parquet``)."""
        out: set[str] = set()
        if not os.path.isdir(path):
            return out
        for root, _dirs, files in os.walk(path):
            rel = os.path.relpath(root, path)
            for f in files:
                if f.endswith(".parquet"):
                    out.add(f if rel == "." else os.path.join(rel, f))
        return out

    def _recover(self, manifests: dict) -> None:
        """Crash recovery (VERDICT r11 #4). The commit protocol is:
        (1) stage/append/replace writes land on disk, (2) ``end_commit``
        flips the durable pointer by atomically rewriting ``meta.json``
        (``os.replace``). A process killed between (1) and (2) leaves
        orphans the old meta does not reference:

        - version dirs NEWER than the committed pointer (a crashed
          ``replace``/``replace_partitions`` flip) — also dirs older
          than ``current-1`` whose deferred ``pending_rm`` never ran;
        - parquet files appended into the CURRENT version dir
          (``append_delta`` writes in place; without the manifest a
          fresh engine would read the half-committed delta);
        - the ``_staging`` scratch tree.

        All are reaped here, restoring the exact pre-commit snapshot for
        every table. Runs once, on open, BEFORE any read; opening a
        workspace while another live engine is mid-commit is undefined
        (single-writer ownership, as in the reference server). Tables
        absent from the manifest (legacy meta) keep their files — only
        positively-identified orphans are deleted."""
        for name, version in self._versions.items():
            tdir = os.path.join(self.root, name)
            if os.path.isdir(tdir):
                keep = {f"v{version:06d}", f"v{version - 1:06d}"}
                for d in os.listdir(tdir):
                    if (d.startswith("v") and d[1:].isdigit()
                            and d not in keep):
                        shutil.rmtree(os.path.join(tdir, d),
                                      ignore_errors=True)
            if name not in manifests:
                continue
            cur = self._dir(name, version)
            committed = set(manifests[name])
            for rel in self._list_rel(cur) - committed:
                try:
                    os.remove(os.path.join(cur, rel))
                except OSError:
                    pass
        shutil.rmtree(os.path.join(self.root, "_staging"), ignore_errors=True)

    def save_meta(self) -> None:
        import json

        # The per-table committed-file manifest is recomputed from disk at
        # every commit point (tables are few and file counts are bounded by
        # auto-compaction, so the walk is microseconds): whatever is in the
        # current version dir NOW is, by definition, the committed state
        # this meta describes. _recover() deletes anything beyond it.
        files = {name: sorted(self._list_rel(self._dir(name)))
                 for name in self._versions}
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"versions": self._versions, "epochs": self._epochs,
                       "files": files}, f)
        os.replace(tmp, self._meta_path())

    # -- streaming epoch ledger (the Delta txnAppId/txnVersion analogue:
    # an epoch recorded here was committed atomically with its data, so a
    # checkpoint replay of the same epoch can be skipped) -----------------
    def last_epoch(self, key: str) -> int | None:
        return self._epochs.get(key)

    def note_epoch(self, key: str, epoch: int) -> None:
        """Stage the epoch; it persists with the surrounding commit's
        save_meta (rollback discards it with the rest of the commit)."""
        self._epochs[key] = int(epoch)

    @property
    def recovered_tables(self) -> set:
        return set(self._versions)

    # -- lifecycle ---------------------------------------------------------
    def init_table(self, name: str, schema: T.StructType) -> None:
        self._schemas[name] = schema
        self._versions.setdefault(name, 0)

    def _dir(self, name: str, version: int | None = None) -> str:
        v = self._versions[name] if version is None else version
        return os.path.join(self.root, name, f"v{v:06d}")

    def _has_files(self, path: str) -> bool:
        if not os.path.isdir(path):
            return False
        for _root, _dirs, files in os.walk(path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def is_empty(self, name: str) -> bool:
        """No committed files for ``name`` — answered from the filesystem,
        no Spark job."""
        return not self._has_files(self._dir(name))

    # -- reads -------------------------------------------------------------
    def read(self, name: str) -> DataFrame:
        """Current state as a DataFrame. Memoized per (table, version,
        file-count): repeated point lookups reuse one DataFrame instead of
        re-listing and re-inferring per call (~every find_one). Appends
        into the current version change the file set without bumping the
        version, so the file count participates in the key."""
        path = self._dir(name)
        schema = self._schemas[name]
        n_files = sum(
            1 for _r, _d, fs in os.walk(path) for f in fs if f.endswith(".parquet")
        ) if os.path.isdir(path) else 0
        if n_files == 0:
            return self.spark.createDataFrame([], schema)
        key = (name, self._versions[name], n_files)
        df = self._read_cache.get(key)
        if df is None:
            df = self.spark.read.schema(schema).parquet(path)
            self._read_cache = {
                k: v for k, v in self._read_cache.items() if k[0] != name
            }
            self._read_cache[key] = df
        return df

    def current_version(self, name: str) -> int:
        return self._versions[name]

    def read_at(self, name: str, version: int) -> DataFrame:
        """Snapshot (time-travel) read of a specific table version.

        The store retains exactly one generation behind the current
        pointer (``_flip`` keeps it for in-flight readers), so valid
        versions are ``current`` and ``current - 1`` — the same
        single-generation time travel a vacuumed Delta table offers.
        Older versions raise: their dirs are gone."""
        if version == self._versions[name]:
            return self.read(name)
        path = self._dir(name, version)
        if not self._has_files(path):
            raise ValueError(
                f"version {version} of table {name!r} is not retained "
                f"(current={self._versions[name]}; one back-version is kept)"
            )
        return self.spark.read.schema(self._schemas[name]).parquet(path)

    # -- writes ------------------------------------------------------------
    def stage(self, name: str, df: DataFrame) -> DataFrame:
        """Materialize a delta to scratch parquet and read it back (pins
        uuids / nondeterministic expressions)."""
        path = os.path.join(self.root, "_staging", name, _uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.schema(self._schemas[name]).parquet(path)

    def stage_count(self, path_or_df) -> int:
        """Row count of a staged delta from parquet footers — no Spark job."""
        import pyarrow.parquet as pq

        files = getattr(path_or_df, "inputFiles", None)
        paths = [p.replace("file:", "") for p in path_or_df.inputFiles()] if files else [path_or_df]
        total = 0
        for p in paths:
            if os.path.isdir(p):
                for f in os.listdir(p):
                    if f.endswith(".parquet"):
                        total += pq.read_metadata(os.path.join(p, f)).num_rows
            elif p.endswith(".parquet"):
                total += pq.read_metadata(p).num_rows
        return total

    def append_rows(self, name: str, tbl) -> tuple[DataFrame | None, int]:
        """Append a driver-side pyarrow Table as one parquet file in the
        current version dir — ZERO Spark jobs for the write (the file
        lands via ``pyarrow.parquet.write_table``; entry ids / ``_seq``
        were generated driver-side, so there is no nondeterminism to
        pin). The returned delta DataFrame reads exactly the new file,
        same contract as :meth:`append_delta`. Row-list ``insert()``
        commits are driver-latency-bound (a one-row commit paid a full
        Spark write job, ~0.3-0.5 s); this is the per-row write path's
        fixed-overhead fix (guide §2.1) — bulk ``insert_df`` stays on
        :meth:`append_delta`."""
        if tbl.num_rows == 0:
            return None, 0
        path = self._dir(name)
        os.makedirs(path, exist_ok=True)
        import pyarrow.parquet as pq

        # write outside the version dir, then rename in: a failed write
        # must not leave a half-file that a fallback append would
        # double-count (readers glob *.parquet in the version dir)
        fname = f"part-pa-{_uuid.uuid4().hex}.parquet"
        tmp = os.path.join(path, fname + ".tmp")
        try:
            pq.write_table(tbl, tmp)
        except Exception:
            try:
                os.remove(tmp)
            except OSError:
                pass
            raise
        os.replace(tmp, os.path.join(path, fname))
        delta = self.spark.read.schema(self._schemas[name]).parquet(
            os.path.join(path, fname)
        )
        n_files = sum(
            1 for f in os.listdir(path) if f.endswith(".parquet")
        )
        if n_files > self.compact_threshold:
            if self._txn is None:
                self.replace(name, self.read(name).coalesce(
                    max(1, n_files // 32)))
            else:
                self._txn["compact"].add(name)
        return delta, tbl.num_rows

    def append_delta(self, name: str, df: DataFrame) -> tuple[DataFrame | None, int]:
        """Write a delta directly into the table's current version dir (one
        write job — no staging double-write) and return (materialized
        delta over exactly the new files, row count). Returns (None, 0)
        for an empty delta; the count comes from parquet footers, not a
        Spark job."""
        path = self._dir(name)
        os.makedirs(path, exist_ok=True)
        before = {f for f in os.listdir(path) if f.endswith(".parquet")}
        df.select(*self._schemas[name].fieldNames()).write.mode("append").parquet(path)
        new_files = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet") and f not in before
        ]
        if not new_files:
            return None, 0
        import pyarrow.parquet as pq

        n = sum(pq.read_metadata(f).num_rows for f in new_files)
        if n == 0:
            return None, 0
        delta = self.spark.read.schema(self._schemas[name]).parquet(*new_files)
        # auto-compaction (the Delta OPTIMIZE analogue): many small commits
        # accumulate files and degrade every later scan. Never compact
        # mid-commit: a later replace() in the same commit would queue the
        # pre-compaction dir (holding these delta files) in pending_rm and
        # end_commit would delete it under the returned DataFrame. Defer to
        # end_commit, which compacts only tables not version-flipped during
        # the commit — keeping returned deltas one retained generation away
        # from any deletion.
        all_files = before | {os.path.basename(f) for f in new_files}
        if len(all_files) > self.compact_threshold:
            if self._txn is None:
                self.replace(name, self.read(name).coalesce(max(1, len(all_files) // 32)))
            else:
                self._txn["compact"].add(name)
        return delta, n

    # INVARIANT: every path that lands files in a table's CURRENT version
    # dir must be followed by save_meta() (normally via end_commit) before
    # the engine is considered quiescent — _recover() deletes any file in
    # the current dir that the meta.json manifest does not list. There is
    # deliberately no bare append() here (ADVICE r12): a non-transactional
    # in-place write would be silently reaped on the next open.

    def replace(self, name: str, df: DataFrame, partition_by: list | None = None) -> None:
        nxt = self._versions[name] + 1
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._dir(name, nxt))
        self._flip(name, nxt)

    def replace_partitions(self, name: str, df: DataFrame,
                           partition_by: list, values: list) -> None:
        """Rewrite ONLY the partition dirs named by ``values`` (single
        partition column); every other partition of the current version is
        hardlinked into the next version dir — zero data I/O for untouched
        buckets, while keeping full snapshot isolation and rollback (the
        old version dir stays intact one generation back). This is the
        reference's per-key upsert economics (storage_manager_table.rs:
        26-64) at Spark scale; on a real cluster this layer is Delta
        ``MERGE``/``replaceWhere``, which is the same partition-scoped
        commit expressed as table-format metadata.

        ``df`` must contain only rows belonging to the affected
        partitions."""
        col = partition_by[0]
        nxt = self._versions[name] + 1
        new_dir = self._dir(name, nxt)
        old_dir = self._dir(name)
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(new_dir)
        affected = {f"{col}={v}" for v in values}
        if os.path.isdir(old_dir):
            for d in os.listdir(old_dir):
                src = os.path.join(old_dir, d)
                if d in affected or "=" not in d or not os.path.isdir(src):
                    continue
                dst = os.path.join(new_dir, d)
                os.makedirs(dst, exist_ok=True)
                for f in os.listdir(src):
                    if f.endswith(".parquet") and not os.path.exists(os.path.join(dst, f)):
                        os.link(os.path.join(src, f), os.path.join(dst, f))
        self._flip(name, nxt)

    def _flip(self, name: str, nxt: int) -> None:
        self._versions[name] = nxt
        old = self._dir(name, nxt - 2)
        if os.path.isdir(old):  # keep one back-version for in-flight readers
            if self._txn is not None:
                # inside a commit: defer cleanup so rollback can restore
                self._txn["pending_rm"].append(old)
            else:
                shutil.rmtree(old, ignore_errors=True)

    # -- commit/rollback (the reference's invert-edit walk-back,
    # database.rs:317-327,345-396, expressed as version-pointer restore) --
    _txn = None

    def begin_commit(self) -> None:
        files = {}
        for name in self._versions:
            path = self._dir(name)
            files[name] = (
                {f for f in os.listdir(path) if f.endswith(".parquet")}
                if os.path.isdir(path)
                else set()
            )
        self._txn = {
            "versions": dict(self._versions),
            "epochs": dict(self._epochs),
            "files": files,
            "pending_rm": [],
            "compact": set(),
        }

    def end_commit(self) -> None:
        if self._txn is None:
            return
        txn = self._txn
        try:
            # deferred compaction: only for tables whose version pointer did
            # not move during the commit, so the appended delta files stay
            # one retained generation away from replace()'s cleanup. Runs
            # while the txn is still registered, so replace()'s _flip
            # defers its back-version cleanup into pending_rm below.
            for name in txn["compact"]:
                if self._versions[name] != txn["versions"].get(name):
                    continue
                path = self._dir(name)
                if not os.path.isdir(path):
                    continue
                n_files = sum(
                    1 for _r, _d, fs in os.walk(path) for f in fs if f.endswith(".parquet")
                )
                part_cols = sorted(
                    {d.split("=")[0] for d in os.listdir(path)
                     if "=" in d and os.path.isdir(os.path.join(path, d))}
                )
                if n_files > self.compact_threshold:
                    self.replace(
                        name,
                        self.read(name).coalesce(max(1, n_files // 32)),
                        partition_by=part_cols or None,
                    )
        finally:
            self._txn = None
        self.save_meta()
        # Nothing is deleted until AFTER the atomic pointer flip above
        # (ADVICE r12): a crash anywhere earlier leaves every pre-commit
        # dir intact — exact rollback AND the read_at(current-1) time
        # travel window both survive. A crash between save_meta and these
        # removals leaves orphan back-version dirs, which _recover()
        # positively identifies (outside {v, v-1}) and reaps on next open.
        for path in txn["pending_rm"]:
            shutil.rmtree(path, ignore_errors=True)

    def rollback(self) -> None:
        """Restore every table to its pre-commit snapshot: version pointers
        flip back (replaced dirs were retained) and files appended to kept
        dirs are removed."""
        if self._txn is None:
            return
        txn, self._txn = self._txn, None
        self._epochs = dict(txn["epochs"])
        # The read memo keys on (table, version, file-count); rollback is the
        # one path that can recreate an already-seen key over a DIFFERENT
        # file set (delete appended files, then re-append the same number),
        # which would leave a cached InMemoryFileIndex listing dead files.
        self._read_cache.clear()
        for name, version in txn["versions"].items():
            newer = self._versions[name]
            self._versions[name] = version
            for v in range(version + 1, newer + 1):
                shutil.rmtree(self._dir(name, v), ignore_errors=True)
            path = self._dir(name, version)
            if os.path.isdir(path):
                for f in os.listdir(path):
                    if f.endswith(".parquet") and f not in txn["files"][name]:
                        os.remove(os.path.join(path, f))

    def cleanup(self) -> None:
        shutil.rmtree(os.path.join(self.root, "_staging"), ignore_errors=True)
