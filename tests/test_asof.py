"""As-of join semantics: inclusive boundary, nulls before first right row,
per-key isolation."""

from venice_spark.operators.asof import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("u1", 5), ("u1", 10), ("u1", 15), ("u2", 10), ("u3", 99)],
        "k string, lts long",
    )
    right = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 12, "b"), ("u2", 1, "c")],
        "k string, rts long, payload string",
    )
    out = {
        (r["k"], r["lts"]): r["payload"]
        for r in asof_join(left, right, ["k"], "lts", "rts", ["payload"]).collect()
    }
    assert out == {
        ("u1", 5): None,    # nothing at or before 5
        ("u1", 10): "a",    # inclusive boundary
        ("u1", 15): "b",    # latest preceding
        ("u2", 10): "c",
        ("u3", 99): None,   # key with no right rows
    }
    ex = {
        (r["k"], r["lts"]): r["payload"]
        for r in asof_join(
            left, right, ["k"], "lts", "rts", ["payload"], inclusive=False
        ).collect()
    }
    assert ex[("u1", 10)] is None  # strict: same-ts right row excluded
    assert ex[("u1", 15)] == "b"


def test_asof_join_rejects_column_collision(spark):
    import pytest

    left = spark.createDataFrame([("u1", 5, "mine")], "k string, lts long, payload string")
    right = spark.createDataFrame([("u1", 1, "theirs")], "k string, rts long, payload string")
    with pytest.raises(ValueError, match="payload"):
        asof_join(left, right, ["k"], "lts", "rts", ["payload"])


def test_asof_join_null_right_value_is_matched(spark):
    """A right row with a NULL payload is still the match — its NULL is
    carried (DuckDB/pandas ASOF semantics), not skipped for an older
    non-null row."""
    left = spark.createDataFrame([("u1", 20)], "k string, lts long")
    right = spark.createDataFrame(
        [("u1", 5, "old"), ("u1", 15, None)], "k string, rts long, payload string"
    )
    rows = asof_join(left, right, ["k"], "lts", "rts", ["payload"]).collect()
    assert rows[0]["payload"] is None


def test_range_join_semantics(spark):
    from venice_spark.operators.asof import range_join

    pts = spark.createDataFrame(
        [("u1", 5), ("u1", 15), ("u1", 25), ("u2", 15)], "k string, ts long"
    )
    ivs = spark.createDataFrame(
        [("u1", 0, 10, "A"), ("u1", 10, 20, "B"), ("u2", 100, 200, "C")],
        "k string, s long, e long, name string",
    )
    # tiny bucket width forces multi-bucket intervals; results must not dup
    out = sorted(
        (r["k"], r["ts"], r["name"])
        for r in range_join(pts, ivs, ["k"], "ts", "s", "e", bucket_width=3).collect()
    )
    assert out == [("u1", 5, "A"), ("u1", 15, "B")]


def test_asof_null_semantics_match_sql(spark):
    """NULL right timestamps and NULL keys never match (DuckDB/SQL ASOF):
    an ascending window puts NULL ts first, so unfiltered a NULL-ts right
    row would serve as everyone's 'earliest predecessor'."""
    from venice_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 1, "l1"), (1, 9, "l9"), (None, 5, "lnull")],
        "id int, ts int, tag string",
    )
    right = spark.createDataFrame(
        [(1, None, "NULLTS"), (1, 8, "r8"), (None, 2, "rnull")],
        "id int, rts int, val string",
    )
    got = {
        r["tag"]: r["val"]
        for r in asof_join(left, right, ["id"], "ts", "rts", ["val"]).collect()
    }
    assert got["l1"] is None      # no true predecessor: NULL, not 'NULLTS'
    assert got["l9"] == "r8"
    assert got["lnull"] is None   # NULL key matches nothing


def test_asof_rejects_reserved_temp_columns(spark):
    import pytest

    from venice_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 1, 0)], "id int, ts int, __ats int")
    right = spark.createDataFrame([(1, 1, "x")], "id int, rts int, val string")
    with pytest.raises(ValueError, match="__ats"):
        asof_join(left, right, ["id"], "ts", "rts", ["val"])
