"""Replication-metadata (RMD) schema derivation and RMD column helpers.

Reference: each value schema gets a generated RMD schema holding the
per-field write timestamps DCR needs — either one value-level long or a
per-field record; collection fields get an extended timestamp record
{topLevelFieldTimestamp, topLevelColoID, putOnlyPartLength,
activeElementsTimestamps[], deletedElementsIdentities[],
deletedElementsTimestamps[]}
(schema/rmd/v1/RmdSchemaGeneratorV1.java:1,
schema/rmd/v1/CollectionRmdTimestamp.java:26-45).

Spark-first mapping: RMD rides as sibling columns of the value columns in
the same row — `_rmd_ts_<field>` long for scalars, a struct for
collections. Columnar parquet makes "sibling columns" free to prune when a
query doesn't touch them, which is strictly better than the reference's
separate RMD blob (always deserialized alongside the value).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

RMD_PREFIX = "_rmd_ts_"
RMD_VALUE_LEVEL = "_rmd_ts"


def collection_rmd_type(element_type: T.DataType) -> T.StructType:
    """StructType twin of CollectionRmdTimestamp (CollectionRmdTimestamp.java:26-45)."""
    return T.StructType(
        [
            T.StructField("top_level_ts", T.LongType(), False),
            T.StructField("top_level_colo_id", T.IntegerType(), False),
            T.StructField("put_only_part_length", T.IntegerType(), False),
            T.StructField("active_elements_ts", T.ArrayType(T.LongType()), False),
            T.StructField("deleted_elements_identities", T.ArrayType(element_type), False),
            T.StructField("deleted_elements_ts", T.ArrayType(T.LongType()), False),
        ]
    )


def derive_rmd_schema(
    value_schema: T.StructType,
    key_fields: list[str],
    per_field: bool = True,
    ts_col: str | None = "ts",
) -> T.StructType:
    """RMD schema for a value schema (RmdSchemaGeneratorV1.java:1).

    per_field=False -> single value-level `_rmd_ts` long (record-level DCR).
    per_field=True  -> `_rmd_ts_<f>` long per scalar field; collection
    fields get the CollectionRmdTimestamp struct.

    `ts_col` names the op-timestamp column to EXCLUDE — the same exclusion
    attach_rmd applies, so a schema derived from the very frame being
    stamped matches the stamped output (it used to emit a spurious
    `_rmd_ts_ts`). Already-stamped RMD columns are never value fields.
    """
    if not per_field:
        return T.StructType([T.StructField(RMD_VALUE_LEVEL, T.LongType(), False)])
    skip = set(rmd_columns(value_schema))
    out = []
    for f_ in value_schema.fields:
        if f_.name in key_fields or f_.name == ts_col or f_.name in skip:
            continue
        if isinstance(f_.dataType, T.ArrayType):
            out.append(
                T.StructField(RMD_PREFIX + f_.name, collection_rmd_type(f_.dataType.elementType), True)
            )
        elif isinstance(f_.dataType, T.MapType):
            out.append(
                T.StructField(RMD_PREFIX + f_.name, collection_rmd_type(f_.dataType.keyType), True)
            )
        else:
            out.append(T.StructField(RMD_PREFIX + f_.name, T.LongType(), True))
    return T.StructType(out)


def attach_rmd(df: DataFrame, key_fields: list[str], ts_col: str = "ts") -> DataFrame:
    """Stamp per-field RMD columns onto a full-put DataFrame: every value
    field was written at the put's timestamp (the state a fresh batch push
    produces; MergeConflictResolver reads exactly this shape back). Scalar
    fields get `_rmd_ts_<f>` = ts; collection fields get a put-only
    CollectionRmd (all elements in the put-only prefix, no deletes).

    Idempotence guard: a frame read back from a store already carries
    `_rmd_ts_*` columns — those are never value fields, so re-stamping
    skips them instead of minting `_rmd_ts__rmd_ts_<f>` doubles. All
    stamps land in ONE select (a withColumn per field stacks a Project
    node each — quadratic analysis cost on wide schemas)."""
    already = set(rmd_columns(df.schema))
    value_fields = [
        f_
        for f_ in df.schema.fields
        if f_.name not in key_fields
        and f_.name != ts_col
        and f_.name not in already             # an RMD column is not a value
        and (RMD_PREFIX + f_.name) not in already  # field already stamped
    ]
    stamps = []
    for f_ in value_fields:
        name = RMD_PREFIX + f_.name
        if isinstance(f_.dataType, (T.ArrayType, T.MapType)):
            n = F.size(F.coalesce(F.col(f_.name), F.array() if isinstance(f_.dataType, T.ArrayType) else F.map_from_arrays(F.array(), F.array())))
            elem_t = (
                f_.dataType.elementType
                if isinstance(f_.dataType, T.ArrayType)
                else f_.dataType.keyType
            )
            stamps.append(
                F.struct(
                    F.col(ts_col).cast("long").alias("top_level_ts"),
                    F.lit(0).alias("top_level_colo_id"),
                    n.cast("int").alias("put_only_part_length"),
                    F.array().cast(T.ArrayType(T.LongType())).alias("active_elements_ts"),
                    F.array().cast(T.ArrayType(elem_t)).alias("deleted_elements_identities"),
                    F.array().cast(T.ArrayType(T.LongType())).alias("deleted_elements_ts"),
                ).alias(name)
            )
        else:
            stamps.append(F.col(ts_col).cast("long").alias(name))
    return df.select("*", *stamps)


def rmd_columns(schema: T.StructType) -> list[str]:
    return [f_.name for f_ in schema.fields if f_.name.startswith(RMD_PREFIX) or f_.name == RMD_VALUE_LEVEL]
