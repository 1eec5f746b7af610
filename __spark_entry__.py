"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in venice_spark/plans/reference_queries.py; this file
is the thin driver-facing shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: read-compute over the
    embeddings store — project + dotProduct + cosineSimilarity + count with
    the error channel, the reference's signature server-side query shape
    (ComputeRequestBuilder.java:22-106)."""
    from venice_spark.compute import ComputeRequestBuilder
    from venice_spark.plans.reference_queries import W64

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    builder = ComputeRequestBuilder(df, ["vec_id"])
    return (
        builder.project("label")
        .dot_product("embedding", W64, "score")
        .cosine_similarity("embedding", W64, "cos")
        .count("embedding", "dim")
        .error_channel()
        .plan()
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from venice_spark.plans.reference_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from venice_spark.plans.reference_queries import ORACLES

    return dict(ORACLES)
