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

from reactivedb_spark.session import get_spark  # noqa: F401
from reactivedb_spark.engine import Engine  # noqa: F401

__version__ = "0.1.0"
