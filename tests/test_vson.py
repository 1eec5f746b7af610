"""VSON legacy-schema adapter (sources/vson.py) vs the reference's
VsonAvroSchemaAdapter semantics (schema/vson/VsonAvroSchemaAdapter.java)."""

import pytest
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
)

from venice_spark.sources.vson import (
    VsonSchemaError,
    read_vson_input,
    vson_struct,
    vson_to_spark_type,
)


def test_primitive_mapping():
    expect = {
        "boolean": BooleanType(),
        "string": StringType(),
        "int8": ByteType(),
        "int16": ShortType(),
        "int32": IntegerType(),
        "int64": LongType(),
        "float32": FloatType(),
        "float64": DoubleType(),
        "bytes": BinaryType(),
    }
    for vson, spark_t in expect.items():
        assert vson_to_spark_type(f'"{vson}"') == spark_t


def test_record_list_and_nesting():
    t = vson_to_spark_type(
        '{"member_id": "int32", "name": "string", '
        '"scores": ["float32"], '
        '"address": {"city": "string", "zip": "int32"}}'
    )
    assert isinstance(t, StructType)
    assert [f.name for f in t.fields] == ["member_id", "name", "scores", "address"]
    assert all(f.nullable for f in t.fields)  # every VSON field is optional
    scores = t["scores"].dataType
    assert isinstance(scores, ArrayType) and scores.elementType == FloatType()
    assert scores.containsNull
    addr = t["address"].dataType
    assert isinstance(addr, StructType) and addr["zip"].dataType == IntegerType()


def test_single_quoted_schema_strings():
    # the common wild form: VsonReader accepts single quotes
    t = vson_to_spark_type("{'member_id':'int32', 'name':'string'}")
    assert isinstance(t, StructType) and t["member_id"].dataType == IntegerType()
    assert vson_to_spark_type("'string'") == StringType()


def test_rejections_match_reference():
    with pytest.raises(VsonSchemaError, match="single entry"):
        vson_to_spark_type('["int32", "int64"]')  # multi-entry list
    with pytest.raises(VsonSchemaError, match="date"):
        vson_to_spark_type('"date"')  # reference throws for DATE too
    with pytest.raises(VsonSchemaError, match="not a valid Vson type"):
        vson_to_spark_type('"int128"')
    with pytest.raises(VsonSchemaError, match="not a parseable"):
        vson_to_spark_type("{{{{")
    with pytest.raises(VsonSchemaError, match="record"):
        vson_struct('"int32"')  # value schemas must be records


def test_read_vson_input_json(spark, tmp_path):
    p = str(tmp_path / "in")
    with open(tmp_path / "rows.json", "w") as f:
        f.write('{"id": 1, "name": "a", "score": 1.5}\n')
        f.write('{"id": 2, "name": "b"}\n')  # missing field -> null, not error
    import shutil

    import os
    os.makedirs(p)
    shutil.move(str(tmp_path / "rows.json"), os.path.join(p, "rows.json"))
    df = read_vson_input(
        spark, p, '{"id": "int64", "name": "string", "score": "float64"}'
    )
    assert df.schema["id"].dataType == LongType()
    rows = {r["id"]: (r["name"], r["score"]) for r in df.collect()}
    assert rows == {1: ("a", 1.5), 2: ("b", None)}


def test_read_vson_input_parquet_casts_and_projects(spark, tmp_path):
    p = str(tmp_path / "pq")
    src = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, name string, v long"
    )
    src.write.parquet(p)
    # declared int32 narrows the stored long via explicit cast
    df = read_vson_input(
        spark,
        p,
        '{"id": "int64", "name": "string", "v": "int32"}',
        fmt="parquet",
        key_field="id",
        value_fields=["v"],
    )
    assert df.columns == ["id", "v"]
    assert df.schema["v"].dataType == IntegerType()
    assert {r["id"]: r["v"] for r in df.collect()} == {1: 10, 2: 20}
    # a declared field absent from the files fails loudly
    with pytest.raises(VsonSchemaError, match="lacks declared"):
        read_vson_input(spark, p, '{"id": "int64", "ghost": "string"}', fmt="parquet")


def test_vson_store_end_to_end(spark, tmp_path):
    """A legacy VSON-declared input pushes into a store and serves reads —
    the switch-over path a reference user with VSON stores needs."""
    from venice_spark.engine import VeniceSparkEngine

    p = str(tmp_path / "legacy")
    spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0)], "member_id long, name string, score double"
    ).write.parquet(p)
    df = read_vson_input(
        spark,
        p,
        "{'member_id':'int64','name':'string','score':'float64'}",
        fmt="parquet",
    )
    eng = VeniceSparkEngine(spark, str(tmp_path / "root"))
    eng.create_store("legacy", key_fields=["member_id"], partition_count=2)
    eng.push("legacy", df)
    assert eng.store("legacy").get(2)["name"] == "y"


# ------------------------------------------------------- property testing


def test_vson_property_arbitrary_schema_trees():
    """Hypothesis: any well-formed VSON schema tree (primitives, records,
    single-entry lists, arbitrary nesting) maps to a Spark type with the
    reference invariants — every struct field nullable, every array
    containsNull, structure preserved — and both JSON quote styles parse
    to the identical type."""
    import json

    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql.types import ArrayType, StructType

    prims = st.sampled_from(
        ["boolean", "string", "int8", "int16", "int32", "int64",
         "float32", "float64", "bytes"]
    )
    names = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8
    )
    trees = st.recursive(
        prims,
        lambda kids: st.one_of(
            st.lists(kids, min_size=1, max_size=1),  # VSON list: single entry
            st.dictionaries(names, kids, min_size=1, max_size=4),
        ),
        max_leaves=12,
    )

    def check(node, spark_t):
        if isinstance(node, dict):
            assert isinstance(spark_t, StructType)
            assert [f.name for f in spark_t.fields] == list(node.keys())
            for f in spark_t.fields:
                assert f.nullable
                check(node[f.name], f.dataType)
        elif isinstance(node, list):
            assert isinstance(spark_t, ArrayType) and spark_t.containsNull
            check(node[0], spark_t.elementType)
        else:
            from venice_spark.sources.vson import _PRIMITIVES

            assert spark_t == _PRIMITIVES[node]

    @settings(max_examples=200, deadline=None)
    @given(trees)
    def run(tree):
        s = json.dumps(tree)
        t = vson_to_spark_type(s)
        check(tree, t)
        # single-quote edition parses identically
        assert vson_to_spark_type(s.replace('"', "'")) == t

    run()


def test_mixed_quote_schema_with_apostrophe():
    """code-review r4: a double-quoted field name containing an apostrophe
    must survive single-quote tolerance (the old quote-swap regex corrupted
    it)."""
    t = vson_to_spark_type('{"it\'s": \'string\', \'n\': \'int32\'}')
    assert isinstance(t, StructType)
    assert t["it's"].dataType == StringType()
    assert t["n"].dataType == IntegerType()


def test_read_vson_input_loud_overflow_without_ansi(spark, tmp_path):
    """The 'fails loudly instead of silently truncating' guarantee must
    hold with ANSI off (Spark 3.x default / compat overrides): overflowing
    values raise VsonSchemaError instead of wrapping."""
    import pytest

    from venice_spark.sources.vson import VsonSchemaError, read_vson_input

    p = f"{tmp_path}/in"
    spark.createDataFrame([(1, 2**40)], "k long, big long").write.parquet(p)
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(VsonSchemaError, match="do not fit"):
            read_vson_input(
                spark, p, "{'k':'int64','big':'int32'}", fmt="parquet"
            ).collect()
        # in-range values read fine with the same declared schema
        p2 = f"{tmp_path}/ok"
        spark.createDataFrame([(1, 42)], "k long, big long").write.parquet(p2)
        out = read_vson_input(spark, p2, "{'k':'int64','big':'int32'}", fmt="parquet")
        assert out.count() == 1
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_read_vson_input_case_insensitive_columns(spark, tmp_path):
    """Column resolution follows the session default (case-insensitive): a
    casing difference must not reject an input spark.read would serve."""
    from venice_spark.sources.vson import read_vson_input

    p = f"{tmp_path}/cased"
    spark.createDataFrame([(7,)], "Member_Id long").write.parquet(p)
    out = read_vson_input(spark, p, "{'member_id':'int64'}", fmt="parquet")
    assert out.count() == 1


def test_read_vson_input_json_malformed_fails_loudly(spark, tmp_path):
    """ADVICE r4: the json/csv branch read under Spark's default PERMISSIVE
    mode, so overflow/malformed values silently came back NULL — the exact
    corruption the module promises to reject. FAILFAST must surface them."""
    import pytest
    from py4j.protocol import Py4JJavaError

    p = tmp_path / "in"
    p.mkdir()
    # int32-declared field with an overflowing value + a malformed line
    (p / "a.json").write_text('{"k": 1, "n": 4294967296}\n{"k": 2, "n": not-json}\n')
    df = read_vson_input(spark, str(p), "{'k':'int64','n':'int32'}", fmt="json")
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)
    # clean input still reads fine
    p2 = tmp_path / "ok"
    p2.mkdir()
    (p2 / "a.json").write_text('{"k": 1, "n": 42}\n')
    out = read_vson_input(spark, str(p2), "{'k':'int64','n':'int32'}", fmt="json")
    assert [(r["k"], r["n"]) for r in out.collect()] == [(1, 42)]


def test_read_vson_input_csv_malformed_fails_loudly(spark, tmp_path):
    """CSV twin of the FAILFAST guarantee: a value that doesn't fit its
    declared VSON type fails loudly on every format."""
    import pytest

    p = tmp_path / "csv_in"
    p.mkdir()
    (p / "a.csv").write_text("1,notanumber\n")
    df = read_vson_input(spark, str(p), "{'k':'int64','n':'int32'}", fmt="csv")
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)
