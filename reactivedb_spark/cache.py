"""Scoped cache accounting — unpersist-after-materialize for operators.

Several operators persist intermediate relations that feed multiple plan
branches (token sets, signatures, LSH buckets). The persist is load-
bearing for performance, but the operator itself cannot unpersist: it
returns a lazy DataFrame, and the cached blocks must live until the
caller materializes it. Left alone, a long-lived engine session
accumulates cached blocks until LRU eviction pressure.

The contract here: operators call :func:`pin` instead of
``df.persist()``. ``pin`` persists and, when a :func:`cache_scope` is
active on this thread, registers the DataFrame with the innermost scope;
the scope unpersists everything it collected on exit. Callers that
materialize results (bench harnesses, the engine's propagation loop,
tests) wrap the compute+collect in ``with cache_scope(): ...`` and get
deterministic release; callers that don't still fall back to Spark's
ContextCleaner GC behavior, no worse than before.

``pin`` never mutates a DataFrame the caller handed in — operators that
receive a possibly-shared frame pin a fresh projection of it (see
``dedup.simhash_pairs``), so the caller's own cache state is untouched.
"""

from __future__ import annotations

import contextlib
import threading

from pyspark.sql import DataFrame

_tls = threading.local()


def pin(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it with the innermost active
    :func:`cache_scope` (no-op registration when no scope is active)."""
    df.persist()
    scopes = getattr(_tls, "scopes", None)
    if scopes:
        scopes[-1].append(df)
    return df


@contextlib.contextmanager
def cache_scope():
    """Unpersist every relation :func:`pin`-ned inside the block on exit
    (blocking=False — release is async on the executors). Scopes nest;
    each releases only its own pins."""
    scopes = getattr(_tls, "scopes", None)
    if scopes is None:
        scopes = _tls.scopes = []
    pinned: list[DataFrame] = []
    scopes.append(pinned)
    try:
        yield pinned
    finally:
        scopes.pop()
        for df in reversed(pinned):
            try:
                df.unpersist()
            except Exception:
                pass
