"""Cheap driver-side size estimates for plan-shape decisions.

The recurring question at 100 TB is "may this relation be broadcast /
does this scan need widening?" — answered here from the source files'
byte size (no job, no plan compile, no row count). File size is the same
signal Catalyst's own statistics use for scan relations; when the
estimate is unavailable (non-file source, cluster storage we can't
stat), callers fall back to a conservative default and let AQE make the
runtime call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def parse_bytes(v: str) -> int:
    """'134217728', '134217728b', '128m'/'128MB' → bytes."""
    s = str(v).strip().lower()
    mult = 1
    for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                      ("b", 1)):
        if s.endswith(suffix):
            s = s[: -len(suffix)]
            mult = m
            break
    return int(float(s)) * mult


def scan_size_bytes(df: DataFrame) -> int | None:
    """Total byte size of the scan's source files, or None when the
    relation isn't backed by stat-able local files."""
    import os
    from urllib.parse import urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("", "file"):
            return None
        try:
            total += os.path.getsize(u.path or f)
        except OSError:
            return None
    return total


DIM_BROADCAST_LIMIT = 64 << 20  # source bytes; parquet expands ~2-5x in memory


def broadcast_if_small(df: DataFrame, limit: int = DIM_BROADCAST_LIMIT) -> DataFrame:
    """Broadcast hint only when the relation's source files fit ``limit``.

    For data-sized tables (anything that grows with the corpus — e.g.
    TPC-H ``customer``, which is NOT a constant dimension) an
    unconditional hint becomes an OOM at scale; above the gate the
    relation is returned unhinted and AQE decides from runtime stats.
    Unknown size (non-file source) is treated as too big — the safe
    default."""
    sz = scan_size_bytes(df)
    if sz is not None and sz <= limit:
        return F.broadcast(df)
    return df
