"""Engine type contract (SURVEY.md §1.2).

Reference `DataType` (reactive_db/src/types.rs:12-21) maps to Spark types:

| Reference      | Spark                 | Notes                                   |
|----------------|-----------------------|-----------------------------------------|
| Integer(isize) | LongType              | 64-bit signed                           |
| Decimal        | DecimalType(38, 18)   | fixed contract (rust_decimal is         |
|                |                       | scale-flexible; we declare 38,18)       |
| Str            | StringType            |                                         |
| Bool           | BooleanType           |                                         |
| ID             | StringType            | UUIDv4 text, generated per row          |
| Array(T)       | ArrayType(T)          |                                         |
| Map([(n,T)])   | StructType            | named ordered fields => struct          |
| Float          | DoubleType            | dead type in reference (types.rs:28);   |
|                |                       | fully supported here                    |

Declared semantic contract (Appendix A of SURVEY.md):
- integer `/` is truncating integer division; divide-by-zero yields NULL
- string `+` is real concatenation (reference bug fixed)
- `^` is standard pow (returns double)
- comparisons are defined for Decimal (reference gap fixed)
"""

from __future__ import annotations

from pyspark.sql import types as T

from reactivedb_spark.errors import ConfigError

DECIMAL = T.DecimalType(38, 18)

_NAME_TO_SPARK: dict[str, T.DataType] = {
    "Integer": T.LongType(),
    "Decimal": DECIMAL,
    "Str": T.StringType(),
    "Bool": T.BooleanType(),
    "ID": T.StringType(),
    "Float": T.DoubleType(),
}


def parse_type(name) -> T.DataType:
    """Parse a YAML config type name into a Spark type.

    Accepts the reference's names (config_reader.rs:21-24 YAML values) plus
    nested forms: ``{Array: Integer}`` and ``{Map: {field: Type, ...}}``.
    """
    if isinstance(name, str):
        if name in _NAME_TO_SPARK:
            return _NAME_TO_SPARK[name]
        raise ConfigError(f"unknown type name: {name!r}")
    if isinstance(name, dict) and len(name) == 1:
        (kind, inner), = name.items()
        if kind == "Array":
            return T.ArrayType(parse_type(inner))
        if kind == "Map":
            if not isinstance(inner, dict):
                raise ConfigError(f"Map type needs a field dict, got {inner!r}")
            return T.StructType(
                [T.StructField(fname, parse_type(ftype)) for fname, ftype in inner.items()]
            )
    raise ConfigError(f"unknown type spec: {name!r}")


def is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType,
                           T.DoubleType, T.FloatType, T.DecimalType))


def is_integral(dt: T.DataType) -> bool:
    return isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType))


def promote(a: T.DataType, b: T.DataType) -> T.DataType:
    """Numeric promotion: int⊕int→long, decimal involved→decimal(38,18),
    double/float involved→double (mirrors reference coercion at
    config/types.rs:87-88, extended to Float which the reference never
    materializes)."""
    if isinstance(a, (T.DoubleType, T.FloatType)) or isinstance(b, (T.DoubleType, T.FloatType)):
        return T.DoubleType()
    if isinstance(a, T.DecimalType) or isinstance(b, T.DecimalType):
        return DECIMAL
    if is_integral(a) and is_integral(b):
        return T.LongType()
    raise ConfigError(f"cannot promote types {a} and {b}")
