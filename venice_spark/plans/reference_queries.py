"""Query registry: every implemented operator from SURVEY.md §2 as a
(spark_fn, oracle_sql) pair over the driver testdata tables.

Each spark_fn takes (spark, sf_dir) and returns a DataFrame; the oracle is
ANSI SQL DuckDB runs on the same parquet (views pre-registered). Column
names are aliased identically on both sides; float math is written with
identical association so doubles match bit-for-bit.

Operator numbering (R*/W*/I*) follows SURVEY.md §2 which cites the
reference implementation file:line for each.
"""

from __future__ import annotations

import math
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from venice_spark.compute import ComputeAggregationBuilder, ComputeRequestBuilder
from venice_spark.functions import vectors

# deterministic 64-dim weight vector used by all vector-compute queries
DIM = 64
W64 = [round(math.sin(i + 1), 6) for i in range(DIM)]
_W64_SQL_LIST = "list_value(" + ", ".join(repr(float(v)) for v in W64) + ")"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is TIMESTAMP(NANOS); Spark maps it to long nanoseconds.
        # Set at read time because the driver owns the SparkSession.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------- read path

@register(
    "r1_single_get",
    "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment "
    "FROM customer WHERE c_custkey = 42",
)
def r1_single_get(spark, sf_dir):
    """R1: point lookup (AvroGenericStoreClient.get; StorageReadRequestHandler.java:539)."""
    return _t(spark, sf_dir, "customer").filter(F.col("c_custkey") == 42)


_R2_KEYS = [1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 10**9]  # last one missing

@register(
    "r2_batch_get",
    "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer "
    f"WHERE c_custkey IN ({', '.join(map(str, _R2_KEYS))})",
)
def r2_batch_get(spark, sf_dir):
    """R2: multi-key lookup; missing keys absent (AvroGenericStoreClient.java:58).
    Broadcast hash join — at 100 TB the key set is still tiny, so this stays
    a broadcast, no shuffle of the big side."""
    df = _t(spark, sf_dir, "customer")
    keys = spark.createDataFrame([(k,) for k in _R2_KEYS], "c_custkey bigint")
    return df.join(F.broadcast(keys), "c_custkey", "inner")


@register(
    "r4_project",
    "SELECT p_partkey, p_name, p_retailprice FROM part",
)
def r4_project(spark, sf_dir):
    """R4: projection (ComputeRequestBuilder.project) — column pruning reaches
    the parquet scan (check ReadSchema in .explain)."""
    return _t(spark, sf_dir, "part").select("p_partkey", "p_name", "p_retailprice")


@register(
    "r5_dot_product",
    f"SELECT vec_id, {vectors.oracle_dot_sql('embedding', W64)} AS dot FROM embeddings",
)
def r5_dot_product(spark, sf_dir):
    """R5: dot product over array<float> (DotProductOperator.java:11-74).
    JVM-side fold expression — no Python in the plan."""
    df = _t(spark, sf_dir, "embeddings")
    return df.select("vec_id", vectors.dot_product("embedding", W64).alias("dot"))


_B_NORM = vectors.param_l2_norm(W64)

@register(
    "r6_cosine_similarity",
    f"SELECT vec_id, ({vectors.oracle_dot_sql('embedding', W64)}) / "
    f"(sqrt({vectors.oracle_sq_norm_sql('embedding', DIM)}) * {_B_NORM!r}) AS cos "
    "FROM embeddings",
)
def r6_cosine_similarity(spark, sf_dir):
    """R6: cosine similarity; param L2 norm precomputed driver-side once —
    the same per-request caching as CosineSimilarityOperator.java:46-62."""
    df = _t(spark, sf_dir, "embeddings")
    return df.select("vec_id", vectors.cosine_similarity("embedding", W64).alias("cos"))


@register(
    "r7_hadamard_product",
    "SELECT vec_id, r.range - 1 AS pos, "
    f"CAST(embedding[r.range] AS DOUBLE) * {_W64_SQL_LIST}[r.range] AS val "
    f"FROM embeddings, range(1, {DIM + 1}) r",
)
def r7_hadamard_product(spark, sf_dir):
    """R7: element-wise product (HadamardProductOperator.java:1-70), exploded
    to rows for order-insensitive comparison."""
    df = _t(spark, sf_dir, "embeddings")
    had = vectors.hadamard_product("embedding", W64)
    return df.select("vec_id", F.posexplode(had).alias("pos", "val"))


@register(
    "r8_count_array",
    "SELECT vec_id, len(embedding) AS n FROM embeddings",
)
def r8_count_array(spark, sf_dir):
    """R8: collection size (CountOperator.java:12-68)."""
    df = _t(spark, sf_dir, "embeddings")
    return df.select("vec_id", vectors.collection_count("embedding").alias("n"))


@register(
    "r8_count_map",
    "SELECT event_id, len(json_keys(props)) AS n FROM events",
)
def r8_count_map(spark, sf_dir):
    """R8 on a map field: events.props JSON decoded to map<string,int>."""
    df = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return df.select("event_id", vectors.collection_count(m).alias("n"))


@register(
    "r10_filter_compute",
    "SELECT l_orderkey, l_linenumber, l_quantity, "
    "l_extendedprice * (1.0 - l_discount) AS revenue "
    "FROM lineitem WHERE l_orderkey >= 100 AND l_orderkey <= 120",
)
def r10_filter_compute(spark, sf_dir):
    """R10: executeWithFilter — compute over rows whose leading key fields
    match a predicate (AvroComputeRequestBuilderV4.java:33-75). Predicate
    pushdown + sorted-by-key rowgroups replace RocksDB prefix iteration."""
    df = _t(spark, sf_dir, "lineitem")
    builder = ComputeRequestBuilder(df, ["l_orderkey", "l_linenumber"])
    builder.project("l_quantity", "l_extendedprice", "l_discount")
    out = builder.execute_with_filter(
        (F.col("l_orderkey") >= 100) & (F.col("l_orderkey") <= 120)
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("revenue"),
    )


@register(
    "r11_count_group_by_value",
    "SELECT value, count FROM (SELECT c_mktsegment AS value, count(*) AS count "
    "FROM customer GROUP BY 1 ORDER BY count DESC, value ASC LIMIT 3)",
)
def r11_count_group_by_value(spark, sf_dir):
    """R11: top-K facet counting (ComputeAggregationRequestBuilder.countGroupByValue;
    client-side counting in FacetCountingUtils.java:30 becomes a distributed
    partial-agg groupBy)."""
    df = _t(spark, sf_dir, "customer")
    agg = ComputeAggregationBuilder(df, ["c_custkey"])
    return agg.count_group_by_value(3, "c_mktsegment")["c_mktsegment"]


@register(
    "r12_count_group_by_bucket",
    "SELECT count(CASE WHEN o_totalprice < 10000 THEN 1 END) AS low, "
    "count(CASE WHEN o_totalprice >= 10000 AND o_totalprice < 100000 THEN 1 END) AS mid, "
    "count(CASE WHEN o_totalprice >= 100000 THEN 1 END) AS high FROM orders",
)
def r12_count_group_by_bucket(spark, sf_dir):
    """R12: named predicate buckets (AvroComputeAggregationRequestBuilder.java:109)."""
    df = _t(spark, sf_dir, "orders")
    agg = ComputeAggregationBuilder(df, ["o_orderkey"])
    return agg.count_group_by_bucket(
        {
            "low": F.col("o_totalprice") < 10000,
            "mid": (F.col("o_totalprice") >= 10000) & (F.col("o_totalprice") < 100000),
            "high": F.col("o_totalprice") >= 100000,
        }
    )


@register(
    "r13_predicate_algebra",
    "SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM part "
    "WHERE (p_size >= 25 AND p_brand IN ('Brand#1', 'Brand#2')) OR p_retailprice < 1000",
)
def r13_predicate_algebra(spark, sf_dir):
    """R13: and/or/anyOf/comparisons lower 1:1 to Column expressions
    (client/store/predicate/*.java)."""
    from venice_spark import predicates as P

    df = _t(spark, sf_dir, "part")
    pred = P.or_(
        P.and_(P.greater_or_equals("p_size", 25), P.any_of("p_brand", "Brand#1", "Brand#2")),
        P.lower_than("p_retailprice", 1000),
    )
    return df.filter(pred)


@register(
    "r16_unique_keys",
    "SELECT count(DISTINCT c_custkey) AS uniq FROM customer",
)
def r16_unique_keys(spark, sf_dir):
    """R16 exact twin: distinct ingested keys. (HLL variant below is
    rows-only — sketch estimates differ across implementations.)"""
    df = _t(spark, sf_dir, "customer")
    return df.agg(F.countDistinct("c_custkey").alias("uniq"))


@register("r16_hll_approx")  # rows-only: HLL++ estimate is impl-specific
def r16_hll_approx(spark, sf_dir):
    """R16: HLL distinct-key estimate (StoreIngestionTask.java:2901-2907 uses
    datasketches; Spark uses HLL++ — same sketch family, impl-specific value)."""
    df = _t(spark, sf_dir, "customer")
    return df.agg(F.approx_count_distinct("c_custkey", 0.02).alias("uniq_approx"))


# ---------------------------------------------------------------- write path

@register(
    "w1_put_latest_wins",
    "SELECT user_id, event_type, event_id, value FROM ("
    "  SELECT user_id, event_type, event_id, value, "
    "  row_number() OVER (PARTITION BY user_id, event_type "
    "                     ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn FROM events"
    ") WHERE rn = 1",
)
def w1_put_latest_wins(spark, sf_dir):
    """W1: put = full-value upsert; replay of an update log keeps the
    highest-timestamp write per key (VeniceWriter put + latest-wins,
    docs/getting-started/learn-venice/merging-batch-and-rt-data.md:57-66).
    Single shuffle on the key; at scale this is the compaction pattern."""
    df = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


@register(
    "w3_partial_update_set_field",
    "SELECT c.c_custkey, c.c_name, "
    "coalesce(u.new_bal, c.c_acctbal) AS acctbal FROM customer c LEFT JOIN ("
    "  SELECT o_custkey, o_totalprice AS new_bal FROM ("
    "    SELECT o_custkey, o_totalprice, row_number() OVER ("
    "      PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn "
    "    FROM orders) WHERE rn = 1"
    ") u ON c.c_custkey = u.o_custkey",
)
def w3_partial_update_set_field(spark, sf_dir):
    """W3: partial update setNewFieldValue — update rows override one field,
    others keep old values: coalesce(update.f, old.f)
    (UpdateBuilder.java:33, WriteComputeHandlerV1.java:27)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    updates = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("o_totalprice").alias("new_bal"))
    )
    return cust.join(updates, cust.c_custkey == updates.o_custkey, "left").select(
        "c_custkey",
        "c_name",
        F.coalesce("new_bal", "c_acctbal").alias("acctbal"),
    )


@register(
    "w11_ttl_filter",
    "SELECT event_id, user_id, event_type, value, epoch_ns(ts) // 1000 AS ts_us "
    "FROM events WHERE epoch_ns(ts) >= 1705276800000000000",
)
def w11_ttl_filter(spark, sf_dir):
    """W11: TTL repush filter — drop records older than now-ttl
    (SparkKafkaInputTTLFilter, wiring AbstractDataWriterSparkJob.java:523-530).
    ts is long nanos; cutoff = 2024-01-15T00:00:00Z."""
    df = _t(spark, sf_dir, "events")
    return df.filter(F.col("ts") >= F.lit(1705276800000000000)).select(
        "event_id", "user_id", "event_type", "value",
        F.expr("ts div 1000").alias("ts_us"),
    )


@register(
    "w15_materialized_view",
    "SELECT c_custkey, c_name, c_mktsegment FROM customer",
)
def w15_materialized_view(spark, sf_dir):
    """W15: materialized view = re-partitioned projection co-written at push
    time (MaterializedView.java:33-70). Content equals the projection; the
    repartition is physical only."""
    df = _t(spark, sf_dir, "customer")
    return df.select("c_custkey", "c_name", "c_mktsegment").repartition(8, "c_custkey")


@register(
    "w2_delete_tombstone",
    "SELECT user_id, event_type, value FROM ("
    "  SELECT user_id, event_type, value, "
    "  CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'PUT' END AS op, "
    "  row_number() OVER (PARTITION BY user_id, event_type "
    "                     ORDER BY event_id DESC) AS rn FROM events"
    ") WHERE rn = 1 AND op <> 'DELETE'",
)
def w2_delete_tombstone(spark, sf_dir):
    """W2: delete = tombstone row filtered at compaction; latest op per key
    wins and a winning DELETE removes the key
    (VeniceProducer.delete; AbstractMerge.java:48-66)."""
    df = _t(spark, sf_dir, "events")
    ops = df.withColumn(
        "op", F.when(F.col("event_type") == "error", F.lit("DELETE")).otherwise(F.lit("PUT"))
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(F.col("event_id").desc())
    return (
        ops.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "DELETE"))
        .select("user_id", "event_type", "value")
    )


@register(
    "w4_w5_list_ops",
    "SELECT c_custkey, unnest(list_sort(list_distinct(list_filter("
    "  list_concat("
    "    [c_mktsegment, 'T' || CAST(c_custkey % 3 AS VARCHAR)], "
    "    ['NEW' || CAST(c_custkey % 2 AS VARCHAR)]), "
    "  x -> x <> 'T1')))) AS tag "
    "FROM customer",
)
def w4_w5_list_ops(spark, sf_dir):
    """W4/W5: list setUnion + setDiff as sorted-set expressions
    (UpdateBuilder.setElementsToAddToListField/...RemoveFromListField,
    WriteComputeOperation.java:41-48)."""
    from venice_spark.updates import merged_list

    df = _t(spark, sf_dir, "customer")
    old = F.array(
        F.col("c_mktsegment"),
        F.concat(F.lit("T"), (F.col("c_custkey") % 3).cast("string")),
    )
    add = F.array(F.concat(F.lit("NEW"), (F.col("c_custkey") % 2).cast("string")))
    rem = F.array(F.lit("T1"))
    return df.select("c_custkey", F.explode(merged_list(old, add, rem)).alias("tag"))


@register(
    "w6_map_ops",
    "SELECT c_custkey, c_mktsegment AS mk, 'base' AS mv FROM customer "
    "UNION ALL "
    "SELECT c_custkey, 'K' || CAST(c_custkey % 5 AS VARCHAR), 'old' FROM customer "
    "WHERE (c_custkey % 5) NOT IN (0, 1) "
    "UNION ALL "
    "SELECT c_custkey, 'K0', 'newv' FROM customer",
)
def w6_map_ops(spark, sf_dir):
    """W6: mapUnion (update wins per key) + mapDiff (drop keys)
    (UpdateBuilder.java:69,81; WriteComputeOperation.java:50-66). Result
    exploded to entry rows; oracle derives the surviving entries directly."""
    from venice_spark.updates import merged_map

    df = _t(spark, sf_dir, "customer")
    old = F.create_map(
        F.col("c_mktsegment"), F.lit("base"),
        F.concat(F.lit("K"), (F.col("c_custkey") % 5).cast("string")), F.lit("old"),
    )
    mapadd = F.create_map(F.lit("K0"), F.lit("newv"))
    maprem = F.array(F.lit("K1"))
    merged = merged_map(old, mapadd, maprem)
    return df.select("c_custkey", F.explode(merged).alias("mk", "mv"))


@register(
    "w7_dcr_merge",
    "SELECT user_id, value FROM ("
    "  SELECT user_id, value, event_type, "
    "  row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn "
    "  FROM events"
    ") WHERE rn = 1 AND event_type <> 'error'",
)
def w7_dcr_merge(spark, sf_dir):
    """W7: timestamp conflict resolution through the commutative merge kernel
    (MergeConflictResolver.java:45-751 semantics; see venice_spark/merge/dcr.py).
    Op log: every event is a PUT of {value}, 'error' events are DELETEs;
    logical ts = event_id (unique total order). The kernel folds per key in
    an applyInPandas stage; the oracle is an independent SQL latest-wins
    formulation — agreement validates the kernel's record-level path."""
    from venice_spark.merge.dcr import merge_op_log

    df = _t(spark, sf_dir, "events")
    op_log = df.select(
        "user_id",
        F.when(F.col("event_type") == "error", F.lit("DELETE"))
        .otherwise(F.lit("PUT"))
        .alias("op"),
        F.col("event_id").alias("ts"),
        F.lit(0).alias("colo"),
        "value",
    )
    return merge_op_log(op_log, ["user_id"], "user_id bigint, value double")


# ----------------------------------------------------- ingestion dataflow

@register(
    "i6_duplicate_key_check",
    "SELECT user_id, event_type, distinct_values FROM ("
    "  SELECT user_id, event_type, count(DISTINCT (event_id, value)) AS distinct_values "
    "  FROM events GROUP BY 1, 2) WHERE distinct_values > 1",
)
def i6_duplicate_key_check(spark, sf_dir):
    """I6: duplicate-key conflict report — keys that appear with more than one
    distinct value row (AbstractPartitionWriter 'allow.duplicate.key')."""
    df = _t(spark, sf_dir, "events")
    return (
        df.groupBy("user_id", "event_type")
        .agg(F.countDistinct(F.struct("event_id", "value")).alias("distinct_values"))
        .filter(F.col("distinct_values") > 1)
    )


@register(
    "i9_consistency_check",
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice >= 2000 "
    "EXCEPT ALL "
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus <> 'X'",
)
def i9_consistency_check(spark, sf_dir):
    """I9: cross-region consistency diff — exceptAll between two replicas
    (spark/consistency/VTConsistencyCheckerJob.java:1). Here: two derived
    frames of the same table; result = rows only in replica A."""
    df = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    a = df.filter(F.col("o_totalprice") >= 2000).drop("o_orderstatus")
    b = df.filter(F.col("o_orderstatus") != "X").drop("o_orderstatus")
    return a.exceptAll(b)
