"""Declared query suite: every implemented operator (SURVEY.md §2 +
training-data extensions) as a (Spark query, DuckDB oracle SQL) pair.

Contract (driver verify): each ``QUERIES[name](spark, sf_dir)`` returns a
DataFrame whose row count, schema, and order-insensitive value hash match
``ORACLES[name]`` run by DuckDB over the same parquet fixtures. Column
names/aliases are kept identical on both sides; engine-specific
nondeterminism (FP summation order, uuids, timestamps below µs) is
designed out — see the determinism notes in each module.
"""

from reactivedb_spark.suite import analytics, core, olap, scale

# Registration order is part of the external contract: the driver's
# correctness gate checks the FIRST 50 registered queries. Newest /
# least-recently-verified families register first (analytics, olap,
# the never-driver-checked round-4 scale additions, then the §2 core
# parity set); the long-green dedup / similarity / multimodal scale
# family fills the tail. dict.update on an existing key keeps its
# original position, so pre-seeding names here pins them inside the
# window even though they live in scale.QUERIES.
_PRIORITY = (
    "sessionize",
    "chunk_windows",
    "source_orc",
    "embedding_clusters",
    "dedup_transform",
    "sample_transform",
)


def all_queries():
    q = {}
    q.update(analytics.QUERIES)
    q.update(olap.QUERIES)
    for name in _PRIORITY:
        q[name] = scale.QUERIES[name]
    q.update(core.QUERIES)
    q.update(scale.QUERIES)
    return q


def all_oracles():
    o = {}
    o.update(analytics.ORACLES)
    o.update(olap.ORACLES)
    for name in _PRIORITY:
        if name in scale.ORACLES:
            o[name] = scale.ORACLES[name]
    o.update(core.ORACLES)
    o.update(scale.ORACLES)
    return o
