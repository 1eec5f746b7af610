"""VSON legacy-schema ingestion (SURVEY §1.2 disposition).

The reference's oldest stores declare schemas in VSON, a JSON-shaped type
language predating its Avro adoption; new-store creation still accepts VSON
strings and converts them to Avro
(internal/venice-client-common/src/main/java/com/linkedin/venice/schema/vson/
VsonAvroSchemaAdapter.java:28-105, VsonTypes.java:8-9). This module is the
Spark twin: VSON schema string → Spark DataType, so legacy batch-input dirs
declared with VSON schemas read straight into the push pipeline.

Semantics mirrored from the reference adapter:

- primitives: boolean, string, int8, int16, int32, int64, float32, float64,
  bytes; `date` is REJECTED (VsonAvroSchemaAdapter.readPrimitive throws for
  DATE — it was never convertible).
- a JSON object is a record; a JSON array must have exactly ONE entry (the
  element type) — AbstractVsonSchemaAdapter.fromVsonObjects enforces this.
- every field/type is nullable ("from Vson's point of view, all fields can
  be optional" — VsonAvroSchemaAdapter.nullableUnion wraps every schema).
- int8/int16 map to Spark's native ByteType/ShortType. The reference wraps
  them in single-byte Avro `fixed` types only because Avro has no byte or
  short primitive (BYTE_WRAPPER/SHORT_WRAPPER); Spark has both, so the
  wrapper indirection is dropped rather than ported.
- VSON schema strings in the wild use single-quoted JSON
  ("{'member_id':'int32'}" — VsonReader accepts both quote styles); the
  parser here does too.

The VSON binary wire format (VsonAvroSerializer's custom byte codec) is a
non-goal: batch inputs in this engine are columnar files, so only the
schema language needs an adapter, not the row codec (SURVEY §2.7).
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
)


class VsonSchemaError(ValueError):
    """Invalid VSON schema string or unsupported VSON type."""


_PRIMITIVES: dict[str, DataType] = {
    "boolean": BooleanType(),
    "string": StringType(),
    "int8": ByteType(),
    "int16": ShortType(),
    "int32": IntegerType(),
    "int64": LongType(),
    "float32": FloatType(),
    "float64": DoubleType(),
    "bytes": BinaryType(),
}

def parse_vson_schema_str(vson_schema_str: str):
    """Parse the JSON-shaped schema text (both quote styles) to Python
    objects — the VsonReader stage. Single-quoted (and mixed-quote) text
    goes through ast.literal_eval, which handles quoting properly — the
    naive quote-swap regex corrupted double-quoted names containing
    apostrophes (code-review r4)."""
    import ast

    if vson_schema_str is None:
        raise VsonSchemaError("Vson schema string cannot be null")
    s = vson_schema_str.strip()
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        pass
    try:
        obj = ast.literal_eval(s)
    except (ValueError, SyntaxError) as e:
        raise VsonSchemaError(f"not a parseable VSON schema: {s!r}") from e
    if not isinstance(obj, (dict, list, str)):
        raise VsonSchemaError(f"not a parseable VSON schema: {s!r}")
    return obj


def _from_vson(obj) -> DataType:
    if isinstance(obj, dict):
        return StructType(
            [StructField(k, _from_vson(v), nullable=True) for k, v in obj.items()]
        )
    if isinstance(obj, list):
        if len(obj) != 1:
            raise VsonSchemaError(
                "List type must have a single entry specifying entry type"
            )
        return ArrayType(_from_vson(obj[0]), containsNull=True)
    if isinstance(obj, str):
        if obj == "date":
            # the reference refuses date at the Avro boundary too
            raise VsonSchemaError("Vson type 'date' is not supported")
        try:
            return _PRIMITIVES[obj]
        except KeyError:
            raise VsonSchemaError(f"{obj!r} is not a valid Vson type string") from None
    raise VsonSchemaError(
        f"schema element {obj!r} is not a string, an array, or an object"
    )


def vson_to_spark_type(vson_schema_str: str) -> DataType:
    """VSON schema string → Spark DataType (the VsonAvroSchemaAdapter.parse
    twin). A top-level object yields a StructType; a bare primitive string
    yields that primitive (VSON key schemas are often just "'string'")."""
    return _from_vson(parse_vson_schema_str(vson_schema_str))


def vson_struct(vson_schema_str: str) -> StructType:
    """Like vson_to_spark_type but requires a record at the top level — the
    shape a batch-input value schema must have."""
    t = vson_to_spark_type(vson_schema_str)
    if not isinstance(t, StructType):
        raise VsonSchemaError(
            f"expected a record (object) schema at the top level, got {t.simpleString()}"
        )
    return t


def read_vson_input(
    spark: SparkSession,
    path: str,
    value_schema: str,
    fmt: str = "json",
    key_field: str | None = None,
    value_fields: list[str] | None = None,
    **options,
) -> DataFrame:
    """I1 for VSON-declared legacy inputs: read a batch dir with the schema
    the VSON string derives (no sampling-based inference — the declared
    types win, exactly as the reference trusts the store's VSON schema) and
    project key/value fields like read_input.

    Typed formats (parquet/orc) are cast to the declared types instead of
    schema-on-read, so an int64 file column declared int32 fails loudly in
    the cast rather than silently truncating downstream — EVEN when the
    session runs with ANSI off (Spark 3.x default, or a compatibility
    override): with ANSI disabled the loud cast is rebuilt from try_cast
    plus an explicit raise on any value the cast would have wrapped.
    """
    struct = vson_struct(value_schema)
    if fmt in ("json", "csv"):
        # FAILFAST: the default PERMISSIVE mode reads overflow/malformed
        # values back as NULL — the exact silent corruption this module
        # promises to reject for typed formats below (ADVICE r4). Callers
        # may still override mode explicitly via **options.
        opts = {"mode": "FAILFAST", **options}
        df = spark.read.schema(struct).format(fmt).options(**opts).load(path)
    else:
        df = spark.read.format(fmt).options(**options).load(path)
        # column resolution follows the session's case-sensitivity (Spark
        # resolves case-insensitively by default) — a casing difference
        # must not reject an input spark.read itself would serve
        case_sensitive = (
            str(spark.conf.get("spark.sql.caseSensitive", "false")).lower() == "true"
        )
        have = set(df.columns) if case_sensitive else {c.lower() for c in df.columns}
        missing = [
            f.name
            for f in struct.fields
            if (f.name if case_sensitive else f.name.lower()) not in have
        ]
        if missing:
            raise VsonSchemaError(
                f"input at {path!r} lacks declared VSON fields {missing}"
            )
        ansi = str(spark.conf.get("spark.sql.ansi.enabled", "false")).lower() == "true"
        if not ansi:
            # try_cast NULLs what a wrapping cast would corrupt; any row
            # where the source was non-null but the cast came back null is
            # an overflow/parse failure — surface it loudly
            checked = df.select(
                *[
                    F.when(
                        df[f.name].isNotNull()
                        & df[f.name].try_cast(f.dataType).isNull(),
                        F.lit(f.name),
                    ).alias(f"__bad_{i}")
                    for i, f in enumerate(struct.fields)
                ]
            )
            bad = checked.select(
                F.coalesce(*[F.col(c) for c in checked.columns]).alias("f")
            ).filter(F.col("f").isNotNull()).limit(1).collect()
            if bad:
                raise VsonSchemaError(
                    f"input at {path!r}: values in field {bad[0]['f']!r} do not "
                    f"fit its declared VSON type (overflow or parse failure) — "
                    "the non-ANSI cast would silently wrap them"
                )
        df = df.select(
            *[df[f.name].cast(f.dataType).alias(f.name) for f in struct.fields]
        )
    from venice_spark.sources.inputs import project_key_value

    return project_key_value(df, key_field, value_fields)
