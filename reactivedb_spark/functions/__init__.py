"""Scalar/column function library: text analysis, hashing helpers, and
multimodal column plumbing — the training-data-pipeline surface that the
reference lacks entirely (SURVEY.md §2.4 "absent operator classes";
extensions mandated by the build spec)."""

from reactivedb_spark.functions import multimodal, text  # noqa: F401
