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


def all_queries():
    q = {}
    q.update(core.QUERIES)
    q.update(scale.QUERIES)
    q.update(olap.QUERIES)
    q.update(analytics.QUERIES)
    return q


def all_oracles():
    o = {}
    o.update(core.ORACLES)
    o.update(scale.ORACLES)
    o.update(olap.ORACLES)
    o.update(analytics.ORACLES)
    return o
