"""Property test: apply_update_log (SQL fold) ≡ sequential per-row
application of the same update log in timestamp order — the write-compute
contract (WriteComputeHandlerV1 applies updates one at a time; our fold
must be observationally identical for any log)."""

import pytest
import pyspark.sql.types as T
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from venice_spark.updates import (
    FieldSpec,
    apply_update_log,
    derive_update_schema,
)

VALUE = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("s", T.StringType(), True),
        T.StructField("lst", T.ArrayType(T.StringType()), True),
        T.StructField("mp", T.MapType(T.StringType(), T.LongType()), True),
    ]
)
FIELDS = [FieldSpec("s", "scalar"), FieldSpec("lst", "list"), FieldSpec("mp", "map")]
ELEMS = ["a", "b", "c"]

op_st = st.one_of(
    st.tuples(st.just("set_s"), st.sampled_from(["x", "y", "z"])),
    st.tuples(st.just("add_lst"), st.lists(st.sampled_from(ELEMS), min_size=1, max_size=2)),
    st.tuples(st.just("rem_lst"), st.lists(st.sampled_from(ELEMS), min_size=1, max_size=2)),
    st.tuples(st.just("set_lst"), st.lists(st.sampled_from(ELEMS), max_size=3)),
    st.tuples(
        st.just("mapadd_mp"),
        st.dictionaries(st.sampled_from(ELEMS), st.integers(0, 9), min_size=1, max_size=2),
    ),
    st.tuples(st.just("maprem_mp"), st.lists(st.sampled_from(ELEMS), min_size=1, max_size=2)),
)


def _sequential(base: dict, log: list[dict]) -> dict:
    """Reference semantics: apply updates one at a time in ts order.
    List behaves as a sorted set (documented deviation); map entries
    overwrite; whole-collection set replaces."""
    cur = dict(base)
    for row in sorted(log, key=lambda r: r["ts"]):
        if row.get("set_s") is not None:
            cur["s"] = row["set_s"]
        if row.get("set_lst") is not None:
            cur["lst"] = list(row["set_lst"])
        if row.get("add_lst") or row.get("rem_lst"):
            s = set(cur["lst"] or [])
            s |= set(row.get("add_lst") or [])
            s -= set(row.get("rem_lst") or [])
            cur["lst"] = sorted(s)
        if row.get("mapadd_mp") or row.get("maprem_mp"):
            m = dict(cur["mp"] or {})
            for k in row.get("maprem_mp") or []:
                m.pop(k, None)
            m.update(row.get("mapadd_mp") or {})
            cur["mp"] = m
    cur["lst"] = sorted(set(cur["lst"] or []))
    return cur


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(ops=st.lists(op_st, min_size=1, max_size=6))
def test_fold_matches_sequential(spark, ops):
    base_row = {"k": 1, "s": "init", "lst": ["a"], "mp": {"a": 0}}
    base = spark.createDataFrame([base_row], VALUE)
    schema = derive_update_schema(VALUE, ["k"])
    log = []
    for i, (col, val) in enumerate(ops):
        # one op per row, distinct ascending timestamps (ties are resolved by
        # DCR rules, not the write-compute fold — out of scope here)
        log.append({"k": 1, "ts": i + 1, col: val})
    ldf = spark.createDataFrame(
        [{f.name: r.get(f.name) for f in schema.fields} for r in log], schema
    )
    got = apply_update_log(base, ldf, ["k"], FIELDS).first().asDict()
    got["lst"] = sorted(got["lst"] or [])
    exp = _sequential(base_row, log)
    assert got["s"] == exp["s"]
    assert got["lst"] == exp["lst"]
    assert (got["mp"] or {}) == (exp["mp"] or {})
