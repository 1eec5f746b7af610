"""Input sources (I1) + skew-safe aggregation utilities."""

import pyspark.sql.functions as F

from venice_spark.skew import salted_agg, salted_count, topk_per_key
from venice_spark.sources.inputs import read_input


def test_read_input_projection(spark, sf_dir):
    df = read_input(
        spark, f"{sf_dir}/customer.parquet", key_field="c_custkey", value_fields=["c_name"]
    )
    assert df.columns == ["c_custkey", "c_name"]
    assert df.count() > 0


def test_salted_count_matches_plain(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plain = {
        r["o_orderpriority"]: r["count"]
        for r in df.groupBy("o_orderpriority").count().collect()
    }
    salted = {
        r["o_orderpriority"]: r["count"]
        for r in salted_count(df, ["o_orderpriority"]).collect()
    }
    assert salted == plain


def test_salted_agg_sum(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plain = {
        r["o_orderpriority"]: round(r["s"], 6)
        for r in df.groupBy("o_orderpriority").agg(F.sum("o_totalprice").alias("s")).collect()
    }
    salted = {
        r["o_orderpriority"]: round(r["s"], 6)
        for r in salted_agg(
            df,
            ["o_orderpriority"],
            partial_aggs=[F.sum("o_totalprice").alias("__s")],
            final_aggs=[F.sum("__s").alias("s")],
        ).collect()
    }
    assert salted == plain


def test_topk_per_key_matches_window(spark, sf_dir):
    from pyspark.sql import Window

    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    plain = {
        (r["o_orderpriority"], r["o_orderkey"])
        for r in df.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= 3).collect()
    }
    salted = {
        (r["o_orderpriority"], r["o_orderkey"])
        for r in topk_per_key(df, ["o_orderpriority"], "o_totalprice", 3).collect()
    }
    assert salted == plain
