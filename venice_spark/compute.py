"""Read-compute DSL: the engine's query-builder API (R4-R13).

Mirrors the reference's client builder 1:1
(clients/venice-thin-client/src/main/java/com/linkedin/venice/client/store/ComputeRequestBuilder.java:22-106,
impl AbstractAvroComputeRequestBuilder.java:123-520) but lowers to Catalyst
Column expressions instead of an Avro ComputeRequest — Catalyst *is* the IR.

    store.compute()
         .project("name")
         .dot_product("embedding", weights, "score")
         .cosine_similarity("embedding", weights, "cos")
         .count("tags", "tag_count")
         .execute(keys)                       # batchGet + compute (R2+R4-8)
         .execute_with_filter(pred)           # partial-key prefix scan (R10)

Every computed field also feeds the __veniceComputationError__ map channel
(R9, ComputeUtils.java:69-143).

Scale: execute(keys) broadcasts the key set when small (the common case —
the reference's whole protocol is designed around bounded key batches);
execute_with_filter relies on predicate pushdown + sorted-by-key parquet for
rowgroup pruning, the moral equivalent of RocksDB prefix iteration
(RocksDBStoragePartition.java:808).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field as dc_field
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from venice_spark.functions import vectors

ERROR_FIELD = "__veniceComputationError__"


@dataclass
class _Op:
    kind: str
    field: str
    result_name: str
    param: Sequence[float] | None = None


@dataclass
class ComputeRequestBuilder:
    df: DataFrame
    key_fields: list[str]
    projections: list[str] = dc_field(default_factory=list)
    ops: list[_Op] = dc_field(default_factory=list)
    with_error_channel: bool = False
    # StoreHandle.compute() plugs in batch_get here so execute(keys) rides
    # the store's (partition_id, key) routing — directory pruning instead of
    # a full-store scan for a bounded key batch
    key_batch_source: Any = None

    # ---- builder surface (ComputeRequestBuilder.java:22-106) ----
    def project(self, *fields: str) -> "ComputeRequestBuilder":
        self.projections.extend(fields)
        return self

    def dot_product(self, field: str, param: Sequence[float], result_name: str):
        self.ops.append(_Op("dot_product", field, result_name, list(param)))
        return self

    def cosine_similarity(self, field: str, param: Sequence[float], result_name: str):
        self.ops.append(_Op("cosine_similarity", field, result_name, list(param)))
        return self

    def hadamard_product(self, field: str, param: Sequence[float], result_name: str):
        self.ops.append(_Op("hadamard_product", field, result_name, list(param)))
        return self

    def count(self, field: str, result_name: str):
        self.ops.append(_Op("count", field, result_name))
        return self

    def error_channel(self, enabled: bool = True) -> "ComputeRequestBuilder":
        self.with_error_channel = enabled
        return self

    # ---- lowering ----
    def _result_columns(self) -> list[Column]:
        cols: list[Column] = [F.col(k) for k in self.key_fields]
        cols += [F.col(p) for p in self.projections if p not in self.key_fields]
        for op in self.ops:
            if op.kind == "dot_product":
                c = vectors.dot_product(op.field, op.param)
            elif op.kind == "cosine_similarity":
                c = vectors.cosine_similarity(op.field, op.param)
            elif op.kind == "hadamard_product":
                c = vectors.hadamard_product(op.field, op.param)
            elif op.kind == "count":
                c = vectors.collection_count(op.field)
            else:  # pragma: no cover
                raise ValueError(op.kind)
            cols.append(c.alias(op.result_name))
        if self.with_error_channel:
            err = F.create_map().cast("map<string,string>")
            for op in self.ops:
                # EVERY computed field feeds the error channel, count
                # included — the reference's CountOperator emits -1 + an
                # error entry for a null collection (code-review r4: the
                # old vector-ops-only loop made count-of-null silently
                # indistinguishable from a clean 0). `is not None` not
                # truthiness: an explicit empty param list must still
                # produce the null-field entry.
                entry = vectors.compute_error_entries(
                    op.field,
                    op.field,
                    len(op.param) if op.param is not None else None,
                    key_name=op.result_name,
                )
                err = F.map_concat(err, entry)
            cols.append(err.alias(ERROR_FIELD))
        return cols

    def plan(self) -> DataFrame:
        """Lower to a DataFrame over the whole store (no key restriction)."""
        return self.df.select(*self._result_columns())

    def execute(
        self,
        spark_or_keys: "SparkSession | Sequence[Any] | None" = None,
        keys: Sequence[Any] | None = None,
    ) -> DataFrame:
        """Compute over a batch of keys (R2 join + compute). Missing keys are
        absent from the result, matching batchGet semantics
        (AvroGenericStoreClient.java:58).

        Call as .execute(keys) — the documented builder shape; the session
        comes from the frame. The legacy .execute(spark, keys) still works.

        Built via StoreHandle.compute(), the key batch routes through
        batch_get so partition ids prune version directories; a builder
        constructed over a bare frame falls back to a broadcast key join."""
        if keys is None:
            keys = spark_or_keys  # .execute(keys) shape
        if self.key_batch_source is not None:
            joined = self.key_batch_source(keys)
        else:
            spark = self.df.sparkSession
            # explicit schema from the store frame: with only field NAMES an
            # empty key batch has nothing to infer types from and
            # createDataFrame raises CANNOT_INFER_EMPTY_SCHEMA — batchGet
            # semantics say an empty batch is an empty result, not a crash
            # (code-review r4)
            key_schema = self.df.select(*self.key_fields).schema
            if len(self.key_fields) == 1:
                kdf = spark.createDataFrame([(k,) for k in keys], schema=key_schema)
            else:
                kdf = spark.createDataFrame(list(keys), schema=key_schema)
            joined = self.df.join(F.broadcast(kdf), on=self.key_fields, how="inner")
        return ComputeRequestBuilder(
            joined, self.key_fields, self.projections, self.ops, self.with_error_channel
        ).plan()

    def execute_with_filter(self, predicate: Column) -> DataFrame:
        """R10: compute over all rows whose leading key fields satisfy the
        predicate (AvroComputeRequestBuilderV4.java:33-75). Pushdown replaces
        RocksDB prefix iteration."""
        return ComputeRequestBuilder(
            self.df.filter(predicate),
            self.key_fields,
            self.projections,
            self.ops,
            self.with_error_channel,
        ).plan()

    def partial_key_lookup(self, **field_values: Any) -> DataFrame:
        """R10 with the reference's key-prefix contract: equality on a
        *leading prefix* of the composite key's fields; anything else is an
        error, mirroring the client-side validation
        (AvroComputeRequestBuilderV4.java:33-75 — prefix serialization only
        works for leading fields; DaVinciComputeTest exercises the failure).
        Leading-prefix equality + key-sorted rowgroups = the RocksDB prefix
        iteration access path."""
        # set comparison: the prefix contract is about WHICH fields are
        # constrained, not Python kwargs ordering — passing a complete key
        # as (second=, first=) is still a valid leading prefix
        # (code-review r4)
        given = set(field_values)
        prefix = self.key_fields[: len(given)]
        if given != set(prefix):
            raise ValueError(
                f"partial-key lookup must specify a leading prefix of the key "
                f"fields {self.key_fields}; got {sorted(given)}"
            )
        pred = F.lit(True)
        for name, v in field_values.items():
            pred = pred & (F.col(name) == F.lit(v))
        return self.execute_with_filter(pred)


@dataclass
class ComputeAggregationBuilder:
    """Facet aggregations (R11/R12) —
    clients/venice-thin-client/.../ComputeAggregationRequestBuilder.java:16-31.
    The reference counts client-side over returned records
    (FacetCountingUtils.java:30); here the cluster does it: groupBy/count
    with map-side partial aggregation."""

    df: DataFrame
    key_fields: list[str]

    def count_group_by_value(self, top_k: int, *fields: str) -> dict[str, DataFrame]:
        """Top-K most frequent values per field. Deterministic order:
        count desc, then value asc (ties)."""
        out = {}
        for f_name in fields:
            out[f_name] = (
                self.df.groupBy(F.col(f_name).alias("value"))
                .agg(F.count("*").alias("count"))
                .orderBy(F.col("count").desc(), F.col("value").asc())
                .limit(top_k)
            )
        return out

    def count_group_by_bucket(self, buckets: dict[str, Column]) -> DataFrame:
        """Named predicate buckets -> one row of counts
        (AvroComputeAggregationRequestBuilder.java:109)."""
        aggs = [
            F.count(F.when(pred, F.lit(1))).alias(name) for name, pred in buckets.items()
        ]
        return self.df.agg(*aggs)
