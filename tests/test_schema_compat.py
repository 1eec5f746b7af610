"""Avro-style reader/writer schema resolution (schema_compat.py) — the
registry-side twin of SchemaCompatibility.java:1, exercised through both
the pure checker and StoreCatalog.add_value_schema. Case shapes follow the
reference's evolution tests (DaVinciComputeTest.java:87-125: missing
field, swapped field order, nullable collections)."""

import pytest
from pyspark.sql import types as T

from venice_spark.catalog import SchemaIncompatibleError, StoreCatalog
from venice_spark.schema_compat import (
    backward_incompatibilities,
    check_reader_writer,
    forward_incompatibilities,
    full_incompatibilities,
    incompatibilities_for_level,
)


def S(*fields):
    return T.StructType(list(fields))


def f(name, dtype, nullable=True, **metadata):
    return T.StructField(name, dtype, nullable, metadata or None)


STR, INT, LNG, FLT, DBL, BIN = (
    T.StringType(), T.IntegerType(), T.LongType(), T.FloatType(),
    T.DoubleType(), T.BinaryType(),
)


# ---- field resolution by name ----

def test_swapped_field_order_is_compatible():
    a = S(f("name", STR), f("age", INT))
    b = S(f("age", INT), f("name", STR))
    assert not check_reader_writer(b, a)
    assert not check_reader_writer(a, b)


def test_writer_only_fields_are_projected_away():
    writer = S(f("name", STR), f("extra", STR))
    reader = S(f("name", STR))
    assert not check_reader_writer(reader, writer)


def test_reader_field_missing_from_writer_needs_default():
    writer = S(f("name", STR))
    ok_reader = S(f("name", STR), f("added", STR, nullable=True))
    assert not check_reader_writer(ok_reader, writer)
    # non-nullable without metadata default -> incompatible
    bad_reader = S(f("name", STR), f("added", STR, nullable=False))
    probs = check_reader_writer(bad_reader, writer)
    assert probs and "no default" in probs[0].reason
    # explicit metadata default rescues a non-nullable add
    dflt_reader = S(f("name", STR), f("added", STR, nullable=False, default="x"))
    assert not check_reader_writer(dflt_reader, writer)


# ---- numeric / string-bytes promotion ----

@pytest.mark.parametrize(
    "writer,reader,ok",
    [
        (INT, LNG, True), (INT, FLT, True), (INT, DBL, True),
        (LNG, DBL, True), (FLT, DBL, True),
        (LNG, INT, False), (DBL, FLT, False), (FLT, LNG, False),
        (STR, BIN, True), (BIN, STR, True), (STR, INT, False),
    ],
)
def test_promotion_lattice(writer, reader, ok):
    probs = check_reader_writer(S(f("x", reader)), S(f("x", writer)))
    assert (not probs) == ok


# ---- union-with-null branch coverage ----

def test_nullable_writer_needs_nullable_reader():
    writer = S(f("x", STR, nullable=True))
    reader = S(f("x", STR, nullable=False))
    probs = check_reader_writer(reader, writer)
    assert probs and "null" in probs[0].reason
    # the other direction (non-null writer, nullable reader) is fine
    assert not check_reader_writer(writer, reader)


# ---- nested resolution ----

def test_nested_struct_array_map_resolution():
    writer = S(
        f("rec", S(f("a", INT), f("b", STR))),
        f("xs", T.ArrayType(INT, containsNull=False)),
        f("mp", T.MapType(STR, INT, valueContainsNull=False)),
    )
    reader = S(
        f("rec", S(f("b", STR), f("a", LNG), f("c", STR, nullable=True))),
        f("xs", T.ArrayType(DBL, containsNull=True)),
        f("mp", T.MapType(STR, LNG, valueContainsNull=True)),
    )
    assert not check_reader_writer(reader, writer)
    # array element narrowing is rejected with the path recorded
    narrow = S(f("xs", T.ArrayType(INT)))
    wide = S(f("xs", T.ArrayType(DBL)))
    probs = check_reader_writer(narrow, wide)
    assert probs and probs[0].path == "$.xs[]"


# ---- directional wrappers ----

def test_backward_vs_forward_direction():
    old = S(f("name", STR))
    new = S(f("name", STR), f("age", INT, nullable=False))
    # new reader on old data: age has no default -> backward-incompatible
    assert backward_incompatibilities(old, new)
    # old reader on new data: extra field projected away -> forward-compatible
    assert not forward_incompatibilities(old, new)
    # nullable add is compatible both ways
    new_ok = S(f("name", STR), f("age", INT, nullable=True))
    assert not full_incompatibilities(old, new_ok)


def test_transitive_checks_every_prior_schema():
    v1 = S(f("a", INT))
    v2 = S(f("a", INT), f("b", STR))
    # v3 promotes a to long: v2->v3 full-compatible is False (old reader
    # can't hold long in int) but backward holds against both priors
    v3 = S(f("a", LNG), f("b", STR))
    assert not incompatibilities_for_level("backward_transitive", [v1, v2], v3)
    assert incompatibilities_for_level("full", [v1, v2], v3)
    with pytest.raises(ValueError):
        incompatibilities_for_level("sideways", [v1], v2)


# ---- catalog integration ----

def test_catalog_full_compat_default(tmp_root):
    catalog = StoreCatalog(tmp_root)
    v1 = S(f("name", STR), f("age", INT))
    catalog.create_store("s", key_fields=["key"], value_schema=v1)
    # nullable add: full-compatible
    v2 = S(f("age", INT), f("name", STR), f("email", STR, nullable=True))
    assert catalog.add_value_schema("s", v2) == 2
    # promotion int->long is backward-only: rejected under default full
    v3 = S(f("age", LNG), f("name", STR), f("email", STR))
    with pytest.raises(SchemaIncompatibleError):
        catalog.add_value_schema("s", v3)
    # dropping a non-defaulted field or retyping is always rejected
    with pytest.raises(SchemaIncompatibleError):
        catalog.add_value_schema("s", S(f("name", INT)))


def test_catalog_backward_level_allows_promotion(tmp_root):
    catalog = StoreCatalog(tmp_root)
    v1 = S(f("count", INT))
    catalog.create_store("s", key_fields=["key"], value_schema=v1,
                         schema_compat="backward")
    v2 = S(f("count", LNG))
    assert catalog.add_value_schema("s", v2) == 2
    with pytest.raises(SchemaIncompatibleError):
        catalog.add_value_schema("s", S(f("count", INT)))  # narrowing
