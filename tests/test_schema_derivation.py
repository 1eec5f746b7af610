"""Derived-schema generation: write-compute update schema (§1.2,
WriteComputeSchemaConverter.java:43-120) and RMD schema
(RmdSchemaGeneratorV1.java) — plus round-trip through the update machinery."""

import pyspark.sql.functions as F
import pyspark.sql.types as T

from venice_spark.merge.rmd import attach_rmd, derive_rmd_schema, rmd_columns
from venice_spark.updates import (
    UpdateBuilder,
    apply_update_log,
    derive_update_schema,
    field_specs_from_schema,
)

VALUE = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("props", T.MapType(T.StringType(), T.IntegerType()), True),
    ]
)


def test_derive_update_schema_shape():
    s = derive_update_schema(VALUE, ["id"])
    names = [f.name for f in s.fields]
    assert names == [
        "id", "ts",
        "set_name",
        "set_tags", "add_tags", "rem_tags",
        "set_props", "mapadd_props", "maprem_props",
    ]
    assert s["set_name"].dataType == T.StringType()
    assert s["add_tags"].dataType == T.ArrayType(T.StringType())
    assert s["maprem_props"].dataType == T.ArrayType(T.StringType())
    assert all(f.nullable for f in s.fields if f.name not in ("id", "ts"))


def test_field_specs_from_schema():
    specs = field_specs_from_schema(VALUE, ["id"])
    assert [(sp.name, sp.kind) for sp in specs] == [
        ("name", "scalar"), ("tags", "list"), ("props", "map"),
    ]


def test_update_builder_rows_fit_derived_schema(spark):
    schema = derive_update_schema(VALUE, ["id"])
    row = (
        UpdateBuilder({"id": 1}, ts=10)
        .set_field("name", "x")
        .add_to_list("tags", "a", "b")
        .remove_map_keys("props", "k")
        .build()
    )
    df = spark.createDataFrame([{f.name: row.get(f.name) for f in schema.fields}], schema)
    base = spark.createDataFrame(
        [(1, "old", ["z"], {"k": 1, "j": 2})], VALUE
    )
    out = apply_update_log(base, df, ["id"], field_specs_from_schema(VALUE, ["id"])).first()
    assert out["name"] == "x"
    assert sorted(out["tags"]) == ["a", "b", "z"]
    assert out["props"] == {"j": 2}


def test_derive_rmd_schema_per_field():
    s = derive_rmd_schema(VALUE, ["id"])
    names = [f.name for f in s.fields]
    assert names == ["_rmd_ts_name", "_rmd_ts_tags", "_rmd_ts_props"]
    assert s["_rmd_ts_name"].dataType == T.LongType()
    coll = s["_rmd_ts_tags"].dataType
    assert isinstance(coll, T.StructType)
    assert [f.name for f in coll.fields] == [
        "top_level_ts", "top_level_colo_id", "put_only_part_length",
        "active_elements_ts", "deleted_elements_identities", "deleted_elements_ts",
    ]
    assert coll["deleted_elements_identities"].dataType == T.ArrayType(T.StringType())


def test_derive_rmd_schema_value_level():
    s = derive_rmd_schema(VALUE, ["id"], per_field=False)
    assert [f.name for f in s.fields] == ["_rmd_ts"]


def test_attach_rmd_stamps_put(spark):
    df = spark.createDataFrame(
        [(1, "a", ["x", "y"], {"k": 1}, 7)],
        "id long, name string, tags array<string>, props map<string,int>, ts long",
    )
    out = attach_rmd(df, ["id"]).first()
    assert out["_rmd_ts_name"] == 7
    assert out["_rmd_ts_tags"]["top_level_ts"] == 7
    assert out["_rmd_ts_tags"]["put_only_part_length"] == 2
    assert out["_rmd_ts_props"]["put_only_part_length"] == 1
    assert out["_rmd_ts_tags"]["active_elements_ts"] == []
    got = attach_rmd(df, ["id"]).schema
    assert set(rmd_columns(got)) == {"_rmd_ts_name", "_rmd_ts_tags", "_rmd_ts_props"}


def test_update_log_folds_map_ops(spark):
    base = spark.createDataFrame(
        [(1, "a", None, {"k": 1, "j": 2})], VALUE
    )
    schema = derive_update_schema(VALUE, ["id"])
    rows = [
        UpdateBuilder({"id": 1}, ts=1).put_map_entries("props", {"x": 10, "k": 9}).build(),
        UpdateBuilder({"id": 1}, ts=2).remove_map_keys("props", "k", "j").build(),
        UpdateBuilder({"id": 1}, ts=3).put_map_entries("props", {"j": 7}).build(),
    ]
    log = spark.createDataFrame(
        [{f.name: r.get(f.name) for f in schema.fields} for r in rows], schema
    )
    out = apply_update_log(base, log, ["id"], field_specs_from_schema(VALUE, ["id"])).first()
    # k: added@1 then removed@2 -> gone; j: removed@2 then re-added@3 -> 7; x: added@1 -> 10
    assert out["props"] == {"x": 10, "j": 7}


def test_update_log_whole_set_supersedes_older_element_ops(spark):
    base = spark.createDataFrame([(1, "a", ["z"], None)], VALUE)
    schema = derive_update_schema(VALUE, ["id"])
    rows = [
        UpdateBuilder({"id": 1}, ts=1).add_to_list("tags", "old1").build(),
        {**UpdateBuilder({"id": 1}, ts=5).build(), "set_tags": ["s1", "s2"]},
        UpdateBuilder({"id": 1}, ts=7).add_to_list("tags", "new1").remove_from_list("tags", "s2").build(),
    ]
    log = spark.createDataFrame(
        [{f.name: r.get(f.name) for f in schema.fields} for r in rows], schema
    )
    out = apply_update_log(base, log, ["id"], field_specs_from_schema(VALUE, ["id"])).first()
    # set@5 wipes base ["z"] and add@1; ops @7 apply on top of ["s1","s2"]
    assert sorted(out["tags"]) == ["new1", "s1"]


def test_attach_rmd_is_idempotent_and_single_projection(spark):
    """Re-stamping a frame read back from a store (already carrying
    _rmd_ts_* columns) must be a no-op, never mint _rmd_ts__rmd_ts_<f>."""
    df = spark.createDataFrame(
        [(1, "a", [1, 2], 100)], "id long, name string, tags array<int>, ts long"
    )
    once = attach_rmd(df, ["id"])
    twice = attach_rmd(once, ["id"])
    assert twice.columns == once.columns
    assert not [c for c in twice.columns if c.startswith("_rmd_ts__rmd_ts")]


def test_derive_rmd_schema_excludes_ts_and_matches_attach(spark):
    """The schema derived from the frame being stamped matches the stamped
    output exactly (no spurious _rmd_ts_ts)."""
    df = spark.createDataFrame(
        [(1, "a", 100)], "id long, name string, ts long"
    )
    derived = {f.name for f in derive_rmd_schema(df.schema, ["id"]).fields}
    stamped = {c for c in attach_rmd(df, ["id"]).columns if c.startswith("_rmd_ts")}
    assert derived == stamped == {"_rmd_ts_name"}
