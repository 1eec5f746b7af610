"""Write-compute expression library (W3-W6) + batch DCR via applyInPandas."""

import pyspark.sql.functions as F

from venice_spark.merge.dcr import merge_op_log
from venice_spark.updates import FieldSpec, UpdateBuilder, apply_update_columns, apply_update_log

FIELDS = [
    FieldSpec("first", "scalar"),
    FieldSpec("score", "scalar"),
    FieldSpec("tags", "list"),
    FieldSpec("props", "map"),
]


def _base(spark):
    return spark.createDataFrame(
        [
            ("k1", "A", 1, ["a", "b"], {"x": "1"}),
            ("k2", "B", 2, [], {}),
        ],
        schema="key string, first string, score int, tags array<string>, props map<string,string>",
    )


def test_apply_single_update(spark):
    base = _base(spark)
    upd = spark.createDataFrame(
        [("k1", "Z", None, ["c"], ["a"], {"x": "9", "y": "2"}, ["zz"])],
        schema="key string, set_first string, set_score int, add_tags array<string>, "
        "rem_tags array<string>, mapadd_props map<string,string>, maprem_props array<string>",
    )
    out = apply_update_columns(base, upd, ["key"], FIELDS)
    rows = {r["key"]: r for r in out.collect()}
    assert rows["k1"]["first"] == "Z"
    assert rows["k1"]["score"] == 1  # NoOp preserved
    assert rows["k1"]["tags"] == ["b", "c"]
    assert rows["k1"]["props"] == {"x": "9", "y": "2"}
    # untouched row passes through
    assert rows["k2"]["first"] == "B" and rows["k2"]["tags"] == []


def test_upsert_new_key(spark):
    base = _base(spark)
    upd = spark.createDataFrame(
        [("k9", "NEW", ["t1"])],
        schema="key string, set_first string, add_tags array<string>",
    )
    out = apply_update_columns(base, upd, ["key"], FIELDS)
    rows = {r["key"]: r for r in out.collect()}
    assert rows["k9"]["first"] == "NEW"
    assert rows["k9"]["tags"] == ["t1"]
    assert rows["k9"]["score"] is None


def test_update_builder_roundtrip(spark):
    row = (
        UpdateBuilder({"key": "k1"}, ts=5)
        .set_field("first", "Q")
        .add_to_list("tags", "n1", "n2")
        .remove_from_list("tags", "a")
        .put_map_entries("props", {"p": "1"})
        .build()
    )
    assert row == {
        "key": "k1",
        "ts": 5,
        "set_first": "Q",
        "add_tags": ["n1", "n2"],
        "rem_tags": ["a"],
        "mapadd_props": {"p": "1"},
    }


def test_apply_update_log_fold(spark):
    base = _base(spark)
    log = spark.createDataFrame(
        [
            ("k1", 1, "M", ["c"], None),
            ("k1", 2, None, None, ["c"]),   # remove c after adding it
            ("k1", 3, "N", ["d"], ["a"]),   # final: set first=N, add d, rem a
        ],
        schema="key string, ts long, set_first string, add_tags array<string>, rem_tags array<string>",
    )
    out = apply_update_log(base, log, ["key"], FIELDS[:3])
    rows = {r["key"]: r for r in out.collect()}
    assert rows["k1"]["first"] == "N"
    assert rows["k1"]["tags"] == ["b", "d"]


def test_merge_op_log_spark(spark):
    """Full op-log DCR through applyInPandas (PUT/UPDATE/DELETE mixed)."""
    log = spark.createDataFrame(
        [
            ("k1", "PUT", 10, 0, "A", ["a"], None, None),
            ("k1", "UPDATE", 20, 0, None, None, ["b"], None),
            ("k2", "PUT", 10, 0, "B", ["x"], None, None),
            ("k2", "DELETE", 20, 0, None, None, None, None),
            ("k3", "PUT", 10, 1, "C", [], None, None),
            ("k3", "UPDATE", 15, 0, None, None, None, "Cv2"),
        ],
        schema="key string, op string, ts long, colo int, first string, "
        "tags array<string>, add_tags array<string>, set_first string",
    )
    out = merge_op_log(
        log,
        ["key"],
        output_schema="key string, first string, tags array<string>",
        list_fields={"tags"},
    )
    rows = {r["key"]: r for r in out.collect()}
    assert set(rows) == {"k1", "k3"}  # k2 deleted
    assert rows["k1"]["first"] == "A" and rows["k1"]["tags"] == ["a", "b"]
    assert rows["k3"]["first"] == "Cv2"


def test_merge_op_log_pre_combine_matches_direct(spark):
    """Map-side pre-combine path ≡ direct per-key fold, across partition
    layouts (the combiner must be layout-invariant)."""
    rows = []
    for k in range(20):
        rows.append((f"k{k}", "PUT", 10 + k % 3, 0, f"v{k}", ["a", "b"], None, None))
        rows.append((f"k{k}", "UPDATE", 20, 1, None, None, ["c"], None))
        if k % 4 == 0:
            rows.append((f"k{k}", "DELETE", 25, 0, None, None, None, None))
        if k % 4 == 1:
            rows.append((f"k{k}", "UPDATE", 30, 2, None, None, None, f"w{k}"))
    schema = (
        "key string, op string, ts long, colo int, first string, "
        "tags array<string>, add_tags array<string>, set_first string"
    )
    out_schema = "key string, first string, tags array<string>"
    for nparts in (1, 7):
        log = spark.createDataFrame(rows, schema=schema).repartition(nparts)
        direct = merge_op_log(log, ["key"], out_schema, list_fields={"tags"})
        combined = merge_op_log(
            log, ["key"], out_schema, list_fields={"tags"}, pre_combine=True
        )
        fast = merge_op_log(
            log, ["key"], out_schema, list_fields={"tags"}, num_partitions=5
        )
        d = {r["key"]: (r["first"], r["tags"]) for r in direct.collect()}
        c = {r["key"]: (r["first"], r["tags"]) for r in combined.collect()}
        f = {r["key"]: (r["first"], r["tags"]) for r in fast.collect()}
        assert d == c == f
        assert "k0" not in d  # deleted keys emit no row on any path


def test_equal_ts_add_rem_tie_matches_dcr_kernel(spark):
    """Review regression: add and remove of the same element at the SAME
    timestamp must resolve identically in apply_update_log and the DCR
    kernel — Venice's delete-wins-ties convention (Merge.java:27-38)."""
    from venice_spark.merge.dcr import merge_ops
    from venice_spark.updates import FieldSpec, apply_update_log

    base = spark.createDataFrame([("k1", [])], "key string, tags array<string>")
    log = spark.createDataFrame(
        [("k1", 5, ["x"], None), ("k1", 5, None, ["x"]), ("k1", 1, ["keep"], None)],
        "key string, ts long, add_tags array<string>, rem_tags array<string>",
    )
    out = apply_update_log(
        base, log, ["key"], [FieldSpec("tags", "list")], ts_col="ts"
    ).collect()
    got = sorted(out[0]["tags"])
    assert got == ["keep"]  # 'x' removed: delete wins the tie
    dcr = merge_ops(
        [
            {"op": "UPDATE", "ts": 5, "update": {"add_tags": ["x"]}},
            {"op": "UPDATE", "ts": 5, "update": {"rem_tags": ["x"]}},
            {"op": "UPDATE", "ts": 1, "update": {"add_tags": ["keep"]}},
        ],
        list_fields={"tags"},
    )
    assert sorted(dcr["tags"]) == got


def test_untouched_list_rows_pass_through_verbatim(spark):
    """apply_update_columns contract: base rows with no update keep their
    list fields byte-identical — order and duplicates included (the
    sorted-set canonicalization is scoped to touched rows)."""
    from venice_spark.updates import FieldSpec, apply_update_columns

    base = spark.createDataFrame(
        [("k1", ["b", "a", "a"]), ("k2", ["z", "y"]), ("k3", ["q"])],
        "key string, tags array<string>",
    )
    ups = spark.createDataFrame(
        [("k2", ["new"], None, None), ("k3", None, None, ["d", "c", "c"])],
        "key string, add_tags array<string>, rem_tags array<string>, "
        "set_tags array<string>",
    )
    out = {
        r["key"]: r["tags"]
        for r in apply_update_columns(
            base, ups, ["key"], [FieldSpec("tags", "list")]
        ).collect()
    }
    assert out["k1"] == ["b", "a", "a"]        # untouched: verbatim
    assert out["k2"] == ["new", "y", "z"]      # touched: sorted set
    assert out["k3"] == ["c", "d"]             # whole-list set canonicalizes too
