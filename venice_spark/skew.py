"""Skew-handling utilities: salted two-level aggregation.

AQE's skew-join splitting covers joins; aggregations over pathologically hot
keys (one key = billions of rows) still funnel one key's rows to one
reducer. The classic fix: salt the key, partial-aggregate per (key, salt),
then combine. Works for any algebraic aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_count(df: DataFrame, key_cols: list[str], salt_buckets: int = 64) -> DataFrame:
    """count(*) per key, skew-safe: two shuffles, but the first spreads each
    hot key over `salt_buckets` reducers and the second sees at most
    `salt_buckets` rows per key."""
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets)))
    partial = salted.groupBy(*key_cols, "__salt").agg(F.count("*").alias("__c"))
    return partial.groupBy(*key_cols).agg(F.sum("__c").alias("count"))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_buckets: int = 64,
) -> DataFrame:
    """General two-level aggregation: `partial_aggs` run per (key, salt),
    `final_aggs` combine the partials (e.g. sum of counts, sum of sums,
    min of mins)."""
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets)))
    partial = salted.groupBy(*key_cols, "__salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)


def topk_per_key(
    df: DataFrame, key_cols: list[str], order_col: str, k: int, salt_buckets: int = 64
) -> DataFrame:
    """Skew-safe top-k per key: per-(key, salt) top-k first (bounded), then
    global top-k over k·salt_buckets candidates per key. Equivalent to the
    WindowGroupLimit optimization, expressed manually for cases the
    optimizer can't prove."""
    from pyspark.sql import Window

    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets)))
    w1 = Window.partitionBy(*key_cols, "__salt").orderBy(F.col(order_col).desc())
    stage1 = salted.withColumn("__r", F.row_number().over(w1)).filter(F.col("__r") <= k)
    w2 = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    return (
        stage1.withColumn("__r2", F.row_number().over(w2))
        .filter(F.col("__r2") <= k)
        .drop("__salt", "__r", "__r2")
    )
