"""reactivedb_spark — a PySpark-native reactive analytics engine.

A brand-new engine with the query and data-processing capabilities of
aep000/ReactiveDB (the reference at /root/reference, Rust), re-expressed
Spark-first:

- Source tables + derived tables (Function / Filter / Union / Aggregation /
  Action transforms) declared in YAML, evaluated as DataFrame plans.
- Six query verbs (find_one / get_all / less_than / greater_than / insert /
  delete) as thin DataFrame filters with the reference's declared semantics
  (strict ``<``, inclusive ``>=``; see SURVEY.md §2.2).
- Listen = per-table change callbacks (batch) / Structured Streaming (stream).
- Plus large-scale training-data operators the reference lacks: dedup
  (exact/MinHash-LSH/SimHash/Jaccard/embedding), similarity search, text
  analysis, multimodal column plumbing.

Everything is built on the public PySpark DataFrame/SQL API; Catalyst does
the optimization. No code is copied from the reference — citations in
docstrings point at reference behavior being matched, not code reused.
"""

# Lazy top-level attributes (PEP 562): importing ANY submodule executes
# this __init__, and Python WORKERS import the codec submodules
# (functions/multimodal, functions/jpeg) when unpickling mapInPandas
# closures — an eager `from .engine import Engine` here would drag the
# whole engine/networking import graph into every fresh worker process
# (~1-2 s each, round-8 measurement). Driver-side `from reactivedb_spark
# import Engine` still works, resolved on first access.

__version__ = "0.1.0"

_LAZY = {
    "get_spark": ("reactivedb_spark.session", "get_spark"),
    "Engine": ("reactivedb_spark.engine", "Engine"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'reactivedb_spark' has no attribute {name!r}")
