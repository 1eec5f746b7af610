"""Input sources for the push pipeline (stages I1/I2).

Reference: the push job reads HDFS Avro/VSON dirs through a custom
DataSource with configured key/value field extraction
(clients/venice-push-job/.../spark/input/hdfs/, VenicePushJobConstants
key.field/value.field) and Kafka topics for repush
(spark/input/kafka/, chunk assembly + TTL filtering).

Spark-first: plain `spark.read.<fmt>` + a key/value field projection; the
chunk-assembly machinery is a non-goal (parquet has no 1 MB cell limit —
SURVEY §1.4). Kafka batch read is wired but gated: no broker in this
environment (spark-sql-kafka jar also ships separately) — the code path is
the documented production configuration.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def project_key_value(
    df: DataFrame, key_field: str | None, value_fields: list[str] | None
) -> DataFrame:
    """The shared key/value projection contract for every batch-input
    reader (read_input, vson.read_vson_input): no-op when nothing is
    specified; value_fields=None defaults to all non-key columns;
    value_fields=[] is a deliberate key-only projection."""
    if key_field is None and value_fields is None:
        return df
    cols = []
    if key_field:
        cols.append(key_field)
    if value_fields is None:
        value_fields = [c for c in df.columns if c != key_field]
    cols.extend(value_fields)
    return df.select(*cols)


def read_input(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    key_field: str | None = None,
    value_fields: list[str] | None = None,
    **options,
) -> DataFrame:
    """I1: read a batch input dir and project key/value fields.

    fmt: parquet (native) | avro (needs spark-avro jar) | json | csv | orc.
    """
    if fmt == "avro":
        try:
            df = spark.read.format("avro").options(**options).load(path)
        except Exception as e:  # pragma: no cover - jar-dependent
            raise RuntimeError(
                "avro input requires the spark-avro package "
                "(--packages org.apache.spark:spark-avro_2.13:<spark-version>)"
            ) from e
    else:
        df = spark.read.format(fmt).options(**options).load(path)
    return project_key_value(df, key_field, value_fields)


# Kafka's fixed wire schema: what `format("kafka")` (and our file-based
# test-double) yields per message.
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def kafka_source_options(
    bootstrap_servers: str,
    topic: str | None = None,
    subscribe_pattern: str | None = None,
    starting_timestamp_ms: int | None = None,
    starting_offsets_by_timestamp: "dict[int, int] | None" = None,
    starting_offsets: str | None = None,
) -> dict[str, str]:
    """The exact option dict `format("kafka")` receives, as a pure function
    so rewind/seek construction is testable without a broker (the one
    untestable sliver of I2/W12 in this environment is the broker itself).

    Rewind variants, in reference terms (HybridStoreConfigImpl.
    rewindTimeInSeconds; VeniceChangelogConsumer per-partition seeks):
    - starting_timestamp_ms → `startingTimestamp` (all partitions rewind to
      one wall-clock point — the hybrid-store rewind window);
    - starting_offsets_by_timestamp {partition: ts_ms} →
      `startingOffsetsByTimestamp` JSON keyed by topic then partition
      (per-partition resume, seekToTimestamps);
    - starting_offsets "earliest"/"latest" → `startingOffsets`
      (seekToBeginningOfPush/seekToTail analogue).
    Exactly one subscription form: `subscribe` (one topic) or
    `subscribePattern` (version-rollover topic families like store_v.*).
    """
    if (topic is None) == (subscribe_pattern is None):
        raise ValueError("exactly one of topic / subscribe_pattern is required")
    starts = [
        starting_timestamp_ms is not None,
        starting_offsets_by_timestamp is not None,
        starting_offsets is not None,
    ]
    if sum(starts) > 1:
        raise ValueError(
            "at most one of starting_timestamp_ms / "
            "starting_offsets_by_timestamp / starting_offsets"
        )
    opts = {"kafka.bootstrap.servers": bootstrap_servers}
    if topic is not None:
        opts["subscribe"] = topic
    else:
        opts["subscribePattern"] = subscribe_pattern
    if starting_timestamp_ms is not None:
        opts["startingTimestamp"] = str(starting_timestamp_ms)
    elif starting_offsets_by_timestamp is not None:
        if topic is None:
            raise ValueError(
                "per-partition timestamps need a concrete topic, not a pattern"
            )
        import json

        opts["startingOffsetsByTimestamp"] = json.dumps(
            {topic: {str(p): int(ts) for p, ts in sorted(starting_offsets_by_timestamp.items())}}
        )
    elif starting_offsets is not None:
        if starting_offsets not in ("earliest", "latest"):
            raise ValueError("starting_offsets must be 'earliest' or 'latest'")
        opts["startingOffsets"] = starting_offsets
    return opts


def read_kafka_topic(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str | None = None,
    starting_timestamp_ms: int | None = None,
    streaming: bool = False,
    source_format: str = "kafka",
    source_path: str | None = None,
    subscribe_pattern: str | None = None,
    starting_offsets_by_timestamp: "dict[int, int] | None" = None,
    starting_offsets: str | None = None,
) -> DataFrame:
    """I2 / RT source: Kafka topic as batch (repush) or stream (hybrid).
    Rewind maps to startingTimestamp (HybridStoreConfigImpl.rewindTimeInSeconds);
    see kafka_source_options for the per-partition and earliest/latest
    variants.

    Production (`source_format="kafka"`) requires a broker + the
    spark-sql-kafka package. Tests run the SAME code path against a
    file-backed stand-in (`source_format="parquet"`, `source_path=dir`)
    whose rows carry KAFKA_WIRE_SCHEMA — only the format/option lines
    differ, the returned frame is wire-identical, and everything downstream
    (decode_kafka_updates, HybridReplay) is byte-for-byte the production
    pipeline.
    """
    reader = spark.readStream if streaming else spark.read
    # option construction doubles as argument validation for BOTH paths:
    # the stand-in must reject exactly what the kafka path rejects, or
    # pipelines validated against it diverge in production (code-review r4)
    opts = kafka_source_options(
        bootstrap_servers,
        topic,
        subscribe_pattern,
        starting_timestamp_ms,
        starting_offsets_by_timestamp,
        starting_offsets,
    )
    if source_format == "kafka":
        r = reader.format("kafka").options(**opts)
        try:
            return r.load()
        except Exception as e:  # pragma: no cover - env-dependent
            raise RuntimeError(
                "kafka source requires a broker and the spark-sql-kafka package"
            ) from e
    # File-backed stand-in: same wire schema, same downstream pipeline, and
    # the same seek semantics applied as filters on the wire columns:
    # - subscribe -> topic equality; subscribePattern -> Java-regex match
    #   (full-match, like Kafka's pattern subscription);
    # - startingTimestamp -> broker-timestamp lower bound on ALL partitions;
    # - startingOffsetsByTimestamp -> per-partition lower bounds (partitions
    #   absent from the map replay from the beginning);
    # - startingOffsets earliest -> everything; latest -> empty batch (a
    #   batch read strictly after the log's tail sees no rows).
    if source_path is None:
        raise ValueError("non-kafka source_format requires source_path")
    if streaming:
        df = reader.schema(KAFKA_WIRE_SCHEMA).format(source_format).load(source_path)
    else:
        df = reader.format(source_format).load(source_path)
    if topic is not None:
        df = df.filter(F.col("topic") == F.lit(topic))
    else:
        df = df.filter(F.col("topic").rlike(f"^(?:{subscribe_pattern})$"))
    if starting_timestamp_ms is not None:
        df = df.filter(
            F.unix_millis(F.col("timestamp")) >= F.lit(starting_timestamp_ms)
        )
    elif starting_offsets_by_timestamp is not None:
        cond = None
        for p, ts in starting_offsets_by_timestamp.items():
            c = (F.col("partition") == F.lit(int(p))) & (
                F.unix_millis(F.col("timestamp")) >= F.lit(int(ts))
            )
            cond = c if cond is None else (cond | c)
        listed = [int(p) for p in starting_offsets_by_timestamp]
        cond = cond | ~F.col("partition").isin(listed)
        df = df.filter(cond)
    elif starting_offsets == "latest":
        if streaming:
            # real Kafka streaming 'latest' starts at the tail and sees only
            # NEW messages; a file stream replays every existing file as its
            # first batch — silently emitting the whole history would make a
            # locally-validated pipeline double-apply data production skips
            # (code-review r4). No faithful emulation exists: fail loudly.
            raise ValueError(
                "the file-backed stand-in cannot emulate streaming "
                "startingOffsets='latest' (a file stream always replays "
                "existing files); rewind to a timestamp instead"
            )
        df = df.filter(F.lit(False))
    return df


def decode_kafka_updates(
    wire: DataFrame,
    value_schema: str,
    key_schema: str | None = None,
    ts_from_payload: str | None = None,
) -> DataFrame:
    """Decode Kafka wire rows into update-log rows for HybridReplay.

    The reference's RT envelope carries an Avro-encoded key and a
    KafkaMessageEnvelope whose payload is the value plus an optional logical
    timestamp (VeniceObjectWithTimestamp — integrations/venice-samza/.../
    VeniceObjectWithTimestamp.java); our wire values are JSON-encoded
    update rows (key fields, value columns, optional op/ts), decoded with
    `from_json` — a pure JVM expression, no Python in the path.

    ts precedence: a `ts` field inside the payload (logical write
    timestamp) wins; otherwise the broker timestamp in epoch millis —
    exactly the producer-timestamp fallback the reference applies when no
    logical ts is attached.
    """
    payload = F.from_json(F.col("value").cast("string"), value_schema)
    out = wire.select(
        F.col("timestamp").alias("__broker_ts"),
        payload.alias("__p"),
    ).select("__p.*", "__broker_ts")
    ts_col = ts_from_payload or "ts"
    if ts_col in out.columns:
        out = out.withColumn(
            ts_col,
            F.coalesce(F.col(ts_col), F.unix_millis(F.col("__broker_ts"))),
        )
    else:
        out = out.withColumn(ts_col, F.unix_millis(F.col("__broker_ts")))
    return out.drop("__broker_ts")
