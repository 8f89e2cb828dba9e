"""Write-path operators (SURVEY.md §2.1): the five transform types that
define derived tables, each expressed as a native DataFrame plan so
Catalyst/Tungsten pick the physical strategy."""

from reactivedb_spark.operators import (  # noqa: F401
    action,
    aggregation,
    filter as filter_op,
    function,
    union,
)
