"""SparkSession factory with scale-oriented defaults.

Defaults are tuned so the same code runs on local[32] for tests and on a
1000-executor cluster unchanged: AQE on (runtime coalesce + skew-join),
adaptive shuffle partitions, arrow for pandas interchange, zstd parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle partitions: on a real cluster you want 2-3x total cores and AQE
# coalescing down; locally 32 keeps task overhead sane at sf<=0.1.
_DEFAULT_LOCAL_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "venice_spark", master: str | None = None) -> SparkSession:
    """Return (or create) a SparkSession with engine defaults applied."""
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", _DEFAULT_LOCAL_CPUS)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.parquet.filterPushdown", "true")
        # count()/min/max over parquet resolve from footer statistics
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # bucketed saveAsTable targets (local runs must not litter the cwd;
        # clusters override with a real warehouse path)
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/venice_spark_warehouse"),
        )
    )
    env_master = os.environ.get("SPARK_MASTER")
    if master is not None:
        builder = builder.master(master)
    elif env_master:
        # honor the env var's VALUE — Spark itself does not read
        # SPARK_MASTER outside spark-submit, so merely skipping the local
        # default would fail with 'A master URL must be set'
        builder = builder.master(env_master)
    else:
        builder = builder.master(f"local[{_DEFAULT_LOCAL_CPUS}]")
    return builder.getOrCreate()
