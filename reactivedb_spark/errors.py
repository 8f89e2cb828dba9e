"""Engine error types.

The reference signals errors with string messages over the wire
(reactive_db/src/types.rs DBError-ish strings, e.g. "Missmatched Input" at
storage_manager_table.rs:56). We use typed exceptions with equivalent
trigger conditions.
"""

from __future__ import annotations


class ReactiveDBError(Exception):
    """Base class for engine errors."""


class ConfigError(ReactiveDBError):
    """Invalid YAML config / transform definition."""


class ExpressionError(ReactiveDBError):
    """Expression DSL parse or type error."""


class SchemaMismatchError(ReactiveDBError):
    """Insert with columns not in the source-table schema.

    Mirrors the reference's "Missmatched Input" error
    (storage_manager_table.rs:56).
    """


class UnknownTableError(ReactiveDBError):
    """Query/insert against an undeclared table."""


class UnknownColumnError(ReactiveDBError):
    """Query against a column that does not exist on the table."""
