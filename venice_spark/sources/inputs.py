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

from pyspark.sql import DataFrame, SparkSession


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
    if key_field is None and value_fields is None:
        return df
    cols = []
    if key_field:
        cols.append(key_field)
    cols.extend(value_fields or [c for c in df.columns if c != key_field])
    return df.select(*cols)


def read_kafka_topic(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_timestamp_ms: int | None = None,
    streaming: bool = False,
) -> DataFrame:
    """I2 / RT source: Kafka topic as batch (repush) or stream (hybrid).
    Rewind maps to startingTimestamp (HybridStoreConfigImpl.rewindTimeInSeconds).
    Gated: requires a broker + the spark-sql-kafka package."""
    reader = spark.readStream if streaming else spark.read
    r = (
        reader.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
    )
    if starting_timestamp_ms is not None:
        r = r.option("startingTimestamp", str(starting_timestamp_ms))
    try:
        return r.load()
    except Exception as e:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "kafka source requires a broker and the spark-sql-kafka package"
        ) from e
