"""Co-located (bucketed) joins: pre-bucketing both sides on the join key
removes the shuffle entirely — the 100 TB pattern for repeated store⋈store
joins (e.g. view maintenance against a dimension). Spark persists bucket
metadata via saveAsTable; the join plan must contain no Exchange."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def warehouse_spark(spark, tmp_path_factory):
    # bucketing requires a table catalog; the session's in-memory catalog
    # writes to spark.sql.warehouse.dir (set per-session at startup)
    return spark


def test_bucketed_join_has_no_shuffle(warehouse_spark, sf_dir, tmp_path):
    spark = warehouse_spark
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = 8
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")
    (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .write.bucketBy(n, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        cust.select("c_custkey", "c_acctbal")
        .write.bucketBy(n, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("b_cust")
    )
    a = spark.table("b_orders")
    b = spark.table("b_cust")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a.o_custkey == b.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: no shuffle on either side
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")
