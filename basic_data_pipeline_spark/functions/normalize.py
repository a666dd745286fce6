"""Value-normalization expression library.

Re-expresses the reference consumer's ``normalize_value`` /
``infer_clickhouse_type`` / ``ensure_table`` heuristics
(/root/reference/consumer_to_file.py:88-141) as pure Spark column
expressions — vectorized, codegen'd, zero Python in the hot path. The
reference applies these row-at-a-time in Python to every message; at 100 TB
that is the difference between a JVM-side projection and a serde cliff.

Faithfully reproduced semantics (documented quirks included):
- null → ''               (nulls are ERASED to empty string, :90-91)
- numeric > 1e12 → //1000 (epoch-millis→seconds heuristic applied to ANY
                           large number, not just timestamps, :92-93)
- bool → 1/0              (:94-95)
- JSON object/array strings pass through as strings (:100-107)
- nested struct/array/map → JSON string (:108-109)
- anything else → string  (:110-111)

Deliberately NOT reproduced (reference bugs, see SURVEY.md §7):
- the DLQ retry NameError (:229) and the delete-by-wrong-key-name (:241).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Columns forced to String regardless of inferred type
# (consumer_to_file.py:134-136).
FORCED_STRING_COLUMNS = frozenset({"value", "source_params", "child_config", "config"})

# Column-name suffix whose large numeric values are epoch-millis
# (consumer_to_file.py:137-138).
EPOCH_SUFFIX = "_on"

# Primary-key candidate order (consumer_to_file.py:57,143).
PK_CANDIDATES = ("uuid", "id", "pk", "employee_id", "record_id")

EPOCH_MS_THRESHOLD = 1_000_000_000_000  # 1e12


def pick_primary_key(columns: list[str]) -> str:
    """First PK candidate present, else the first column."""
    for cand in PK_CANDIDATES:
        if cand in columns:
            return cand
    return columns[0]


def _is_numeric_string(c: Column) -> Column:
    return c.rlike(r"^-?\d+(\.\d+)?$")


def is_json_container(c: Column) -> Column:
    """String that parses as a JSON object/array (the passthrough rule,
    consumer_to_file.py:100-107). get_json_object returns null on malformed
    input, giving us a codegen'd validity probe."""
    t = F.trim(c)
    return (t.startswith("{") | t.startswith("[")) & F.get_json_object(
        t, "$"
    ).isNotNull()


def normalize_string_value(c: Column) -> Column:
    """Normalize one string-typed value column (the post-envelope shape:
    Debezium JSON with converter schemas off gives every field as text).

    Mirrors normalize_value's branch order: null → '' ; booleans → 1/0 ;
    big numerics → //1000 ; everything else (numbers, JSON containers,
    plain text) passes through unchanged.
    """
    lower = F.lower(F.trim(c))
    big_number = _is_numeric_string(F.trim(c)) & (
        F.trim(c).try_cast("double") > F.lit(float(EPOCH_MS_THRESHOLD))
    )
    return (
        F.when(c.isNull(), F.lit(""))
        .when(lower == "true", F.lit("1"))
        .when(lower == "false", F.lit("0"))
        .when(
            big_number,
            F.floor(F.trim(c).try_cast("decimal(38,6)") / 1000)
            .cast("long")
            .cast("string"),
        )
        .otherwise(c)
    )


def normalize_typed_value(c: Column, dtype: T.DataType) -> Column:
    """Normalize a typed column per the same rules, keeping native types
    where safe (our analytics layer) and stringifying containers.

    - null stays null for numeric/timestamp columns in typed mode (the
      null→'' erasure only applies to the faithful string sink mode);
    - bool → int;
    - long/double > 1e12 → //1000 (epoch heuristic);
    - struct/array/map → JSON string;
    - binary → UTF-8 with replacement (decode semantics of :98-99).
    """
    if isinstance(dtype, T.BooleanType):
        return c.cast("int")
    if isinstance(dtype, (T.LongType, T.IntegerType, T.DoubleType, T.FloatType)):
        return F.when(
            c.cast("double") > F.lit(float(EPOCH_MS_THRESHOLD)),
            F.floor(c.cast("decimal(38,6)") / 1000).cast(dtype),
        ).otherwise(c)
    if isinstance(dtype, (T.StructType, T.ArrayType, T.MapType)):
        return F.to_json(c)
    if isinstance(dtype, T.BinaryType):
        return F.decode(c, "UTF-8")
    return c


def epoch_heuristic_timestamp(c: Column, name: str) -> Column | None:
    """ensure_table's `*_on` override: numeric columns named ``*_on`` whose
    values exceed 1e12 are epoch-millis → TimestampType
    (consumer_to_file.py:137-138). Returns None when the rule doesn't apply.
    """
    if not name.endswith(EPOCH_SUFFIX):
        return None
    return F.when(
        c.cast("string").try_cast("double") > F.lit(float(EPOCH_MS_THRESHOLD)),
        F.timestamp_seconds(
            F.floor(c.cast("string").try_cast("decimal(38,6)") / 1000).cast("long")
        ),
    ).otherwise(F.lit(None).cast("timestamp"))


def infer_sink_type(colname: str, inferred: T.DataType) -> T.DataType:
    """Map a batch-inferred Spark type to the sink type, applying the
    reference's declared MySQL→sink mapping collapsed to Spark types
    (SURVEY.md §1.2): ints stay integral, decimal demotes to double,
    containers/json/uuid/enum/binary → string, plus the forced-string
    column-name override."""
    if colname in FORCED_STRING_COLUMNS:
        return T.StringType()
    if isinstance(inferred, T.DecimalType):
        return T.DoubleType()
    if isinstance(inferred, (T.StructType, T.ArrayType, T.MapType, T.BinaryType)):
        return T.StringType()
    if isinstance(inferred, T.BooleanType):
        return T.IntegerType()
    if isinstance(inferred, T.NullType):
        return T.StringType()
    return inferred


def normalize_to_sink_string(c: Column) -> Column:
    """Faithful sink mode: the reference stores everything it can't type as
    String and erases nulls to '' — one expression, applied post-typing."""
    return F.coalesce(c.cast("string"), F.lit(""))
