"""F2 schema-evolution shapes under read-compute
(DaVinciComputeTest.java:87-125): missing field, nullable list, swapped
field order — parquet mergeSchema + by-name resolution give Avro
reader/writer semantics; compute on absent/null vectors yields NULL plus
an error-channel entry instead of failing."""

import pyspark.sql.functions as F

from venice_spark.compute import ERROR_FIELD, ComputeRequestBuilder

W4 = [1.0, 2.0, 3.0, 4.0]


def _write_evolved(spark, tmp_path):
    d = str(tmp_path / "store")
    spark.createDataFrame(
        [("a", [1.0, 0.0, 0.0, 0.0], "n1")],
        "id string, member_feature array<float>, name string",
    ).write.mode("append").parquet(d)
    # evolved writer: no member_feature column (missing field), columns in
    # different order (swapped) — resolution is by name, as Avro reader schema
    spark.createDataFrame(
        [("n2", "b")], "name string, id string"
    ).write.mode("append").parquet(d)
    return spark.read.option("mergeSchema", "true").parquet(d)


def test_missing_field_compute_null_plus_error(spark, tmp_path):
    df = _write_evolved(spark, tmp_path)
    out = (
        ComputeRequestBuilder(df, ["id"])
        .project("name")
        .dot_product("member_feature", W4, "score")
        .error_channel()
        .plan()
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows["a"]["score"] is not None
    assert rows["b"]["score"] is None  # missing field -> NULL result, no crash
    errs = rows["b"][ERROR_FIELD] or {}
    assert "score" in errs  # keyed by the COMPUTED field (no dup-key abort)
    assert "member_feature" in errs["score"]  # message names the input field
    assert rows["b"]["name"] == "n2"  # swapped order resolved by name


def test_nullable_list_compute(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 2.0, 3.0, 4.0]), ("b", None)],
        "id string, member_feature array<float>",
    )
    out = (
        ComputeRequestBuilder(df, ["id"])
        .dot_product("member_feature", W4, "score")
        .cosine_similarity("member_feature", W4, "cos")
        .plan()
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows["b"]["score"] is None and rows["b"]["cos"] is None
    assert abs(rows["a"]["score"] - sum(x * w for x, w in zip([1, 2, 3, 4], W4))) < 1e-6


def test_length_mismatch_error_entry(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 2.0])], "id string, member_feature array<float>"
    )
    out = (
        ComputeRequestBuilder(df, ["id"])
        .dot_product("member_feature", W4, "score")
        .error_channel()
        .plan()
    ).first()
    assert out["score"] is None
    assert "score" in out[ERROR_FIELD]
    assert "member_feature" in out[ERROR_FIELD]["score"]
