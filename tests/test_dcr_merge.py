"""DCR merge kernel tests: reference-shaped cases (FIXTURES.md F6) +
the determinism property (Merge.java:27-38): any arrival order of the same
op set yields the identical final state."""

import random

from hypothesis import given, settings, strategies as st

from venice_spark.merge.dcr import merge_ops

LF = {"tags"}
MF = {"props"}


def put(ts, colo=0, **value):
    return {"op": "PUT", "ts": ts, "colo": colo, "value": value}


def delete(ts, colo=0):
    return {"op": "DELETE", "ts": ts, "colo": colo}


def update(ts, colo=0, **u):
    return {"op": "UPDATE", "ts": ts, "colo": colo, "update": u}


# ---- record-level rules (AbstractMerge.java:17-80) ----

def test_higher_ts_wins():
    out = merge_ops([put(1, score=1), put(5, score=2), put(3, score=3)])
    assert out == {"score": 2}


def test_delete_wins_ties():
    assert merge_ops([put(5, score=1), delete(5)]) is None
    assert merge_ops([delete(5), put(5, score=1)]) is None
    # put strictly after delete survives
    assert merge_ops([delete(5), put(6, score=1)]) == {"score": 1}


def test_put_put_tie_deterministic_value_comparison():
    a = merge_ops([put(5, score=1), put(5, score=2)])
    b = merge_ops([put(5, score=2), put(5, score=1)])
    assert a == b == {"score": 2}  # larger canonical value wins


def test_field_level_timestamps():
    # fields merge independently: later update of one field doesn't clobber others
    out = merge_ops(
        [put(10, first="A", last="B"), update(20, set_first="C"), update(15, set_last="D")]
    )
    assert out == {"first": "C", "last": "D"}


def test_delete_then_partial_update_resurrects_field():
    out = merge_ops([put(10, first="A", last="B"), delete(15), update(20, set_first="Z")])
    assert out == {"first": "Z"}


# ---- collection rules (SortBasedCollectionFieldOpHandler semantics) ----

def test_list_set_union_diff():
    out = merge_ops(
        [
            put(10, tags=["a", "b"]),
            update(11, add_tags=["c"]),
            update(12, rem_tags=["a"]),
        ],
        list_fields=LF,
    )
    assert out["tags"] == ["b", "c"]


def test_remove_wins_tie_on_element():
    out = merge_ops(
        [put(10, tags=["a"]), update(11, add_tags=["x"]), update(11, rem_tags=["x"])],
        list_fields=LF,
    )
    assert out["tags"] == ["a"]


def test_whole_put_dominates_older_element_ops():
    out = merge_ops(
        [update(5, add_tags=["old"]), put(10, tags=["new"]), update(15, add_tags=["newer"])],
        list_fields=LF,
    )
    assert out["tags"] == ["new", "newer"]


def test_observed_remove_readd():
    out = merge_ops(
        [put(10, tags=["a"]), update(12, rem_tags=["a"]), update(14, add_tags=["a"])],
        list_fields=LF,
    )
    assert out["tags"] == ["a"]


def test_map_union_diff():
    out = merge_ops(
        [
            put(10, props={"k1": "v1", "k2": "v2"}),
            update(11, mapadd_props={"k2": "v2x", "k3": "v3"}),
            update(12, maprem_props=["k1"]),
        ],
        map_fields=MF,
    )
    assert out["props"] == {"k2": "v2x", "k3": "v3"}


def test_tombstone_suppresses_collection():
    out = merge_ops(
        [put(10, tags=["a"], score=1), delete(15), update(20, add_tags=["z"])],
        list_fields=LF,
    )
    assert out == {"tags": ["z"]}


# ---- whole-collection vs element-op tie fixtures ----
# (SortBasedCollectionFieldOpHandler.java:411,762: elements with ts <= the
# collection put's ts fold into the put-only prefix — the whole put wins a
# ts tie against an add; a remove whose ts ties the put still blocks.)

def test_whole_put_wins_tie_against_element_add():
    # add of a NEW element at the same ts as the whole put: put-only prefix
    # semantics — the element does not survive
    out = merge_ops(
        [put(10, tags=["a", "b"]), update(10, add_tags=["c"])], list_fields=LF
    )
    assert out["tags"] == ["a", "b"]
    # ... in either arrival order
    out = merge_ops(
        [update(10, add_tags=["c"]), put(10, tags=["a", "b"])], list_fields=LF
    )
    assert out["tags"] == ["a", "b"]


def test_element_remove_wins_tie_against_whole_put():
    # deleted-element ts == whole-put ts: the tombstone blocks the element
    out = merge_ops(
        [put(10, tags=["a", "b"]), update(10, rem_tags=["a"])], list_fields=LF
    )
    assert out["tags"] == ["b"]
    out = merge_ops(
        [update(10, rem_tags=["a"]), put(10, tags=["a", "b"])], list_fields=LF
    )
    assert out["tags"] == ["b"]


def test_whole_delete_wins_tie_against_element_add():
    # record DELETE at ts == element add ts: delete wins ties at every level
    out = merge_ops(
        [put(5, tags=["a"], score=1), update(10, add_tags=["z"]), delete(10)],
        list_fields=LF,
    )
    assert out is None


def test_put_only_prefix_map_semantics():
    # map twin: mapadd at the whole put's ts does not override the put's
    # entry, but a strictly later mapadd does
    out = merge_ops(
        [
            put(10, props={"k": "put"}),
            update(10, mapadd_props={"k": "tie", "new": "tie"}),
            update(11, mapadd_props={"k2": "later"}),
        ],
        map_fields=MF,
    )
    assert out["props"] == {"k": "put", "k2": "later"}


# ---- map-side pre-combine algebra (merge_states) ----

from venice_spark.merge.dcr import (  # noqa: E402
    RecordState,
    merge_states,
    record_state_from_json,
    record_state_to_json,
)


def _fold_state(ops):
    st = RecordState()
    for op in ops:
        if op["op"] == "PUT":
            st.apply_put(op["value"], op["ts"], op["colo"], LF, MF)
        elif op["op"] == "DELETE":
            st.apply_delete(op["ts"], op["colo"])
        else:
            st.apply_update(op["update"], op["ts"], op["colo"])
    return st


# ---- determinism property ----

_ops_strategy = st.lists(
    st.one_of(
        st.builds(
            lambda ts, colo, v: put(ts, colo, score=v),
            st.integers(0, 20), st.integers(0, 2), st.integers(0, 5),
        ),
        st.builds(
            lambda ts, colo, tags: put(ts, colo, tags=tags),
            st.integers(0, 20), st.integers(0, 2),
            st.lists(st.sampled_from("abcd"), max_size=3),
        ),
        st.builds(delete, st.integers(0, 20), st.integers(0, 2)),
        st.builds(
            lambda ts, colo, e: update(ts, colo, add_tags=[e]),
            st.integers(0, 20), st.integers(0, 2), st.sampled_from("abcd"),
        ),
        st.builds(
            lambda ts, colo, e: update(ts, colo, rem_tags=[e]),
            st.integers(0, 20), st.integers(0, 2), st.sampled_from("abcd"),
        ),
        st.builds(
            lambda ts, colo, k, v: update(ts, colo, mapadd_props={k: v}),
            st.integers(0, 20), st.integers(0, 2),
            st.sampled_from("xyz"), st.integers(0, 3),
        ),
        st.builds(
            lambda ts, colo, k: update(ts, colo, maprem_props=[k]),
            st.integers(0, 20), st.integers(0, 2), st.sampled_from("xyz"),
        ),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=300, deadline=None)
@given(ops=_ops_strategy, seed=st.integers(0, 10**6))
def test_any_arrival_order_same_state(ops, seed):
    expected = merge_ops(ops, LF, MF)
    shuffled = ops[:]
    random.Random(seed).shuffle(shuffled)
    assert merge_ops(shuffled, LF, MF) == expected


@settings(max_examples=300, deadline=None)
@given(ops=_ops_strategy, cut=st.integers(0, 12), seed=st.integers(0, 10**6))
def test_partial_fold_then_merge_states_equals_full_fold(ops, cut, seed):
    """The pre-combine contract: fold any partition of the op set into
    partial states (with the JSON round-trip the shuffle imposes), merge
    the partials — result identical to folding everything in one pass."""
    expected = merge_ops(ops, LF, MF)
    shuffled = ops[:]
    random.Random(seed).shuffle(shuffled)
    cut = min(cut, len(shuffled))
    a = _fold_state(shuffled[:cut])
    b = _fold_state(shuffled[cut:])
    a = record_state_from_json(record_state_to_json(a))
    b = record_state_from_json(record_state_to_json(b))
    merged = merge_states(RecordState(), a)
    merged = merge_states(merged, b)
    assert merged.finalize(LF, MF) == expected


# ---- state serialization properties (streaming DCR correctness) ----

from hypothesis import given, settings
from hypothesis import strategies as st_

_elem = st_.sampled_from(["a", "b", "c"])
_op = st_.one_of(
    st_.builds(
        lambda ts, colo, v, tags: {"op": "PUT", "ts": ts, "colo": colo,
                                   "value": {"v": v, "tags": tags}},
        st_.integers(1, 20), st_.integers(0, 2), st_.integers(0, 9),
        st_.lists(_elem, max_size=3),
    ),
    st_.builds(
        lambda ts, colo: {"op": "DELETE", "ts": ts, "colo": colo},
        st_.integers(1, 20), st_.integers(0, 2),
    ),
    st_.builds(
        lambda ts, colo, add, rem: {"op": "UPDATE", "ts": ts, "colo": colo,
                                    "update": {"add_tags": add or None, "rem_tags": rem or None}},
        st_.integers(1, 20), st_.integers(0, 2),
        st_.lists(_elem, max_size=2), st_.lists(_elem, max_size=2),
    ),
)


@settings(max_examples=200, deadline=None)
@given(ops=st_.lists(_op, min_size=1, max_size=10), cut=st_.integers(0, 10))
def test_state_json_roundtrip_mid_fold_preserves_result(ops, cut):
    """Streaming DCR serializes state between triggers; folding ops with a
    JSON round-trip at ANY split point must equal the uninterrupted fold."""
    from venice_spark.merge.dcr import (
        RecordState, merge_ops, record_state_from_json, record_state_to_json,
    )

    cut = min(cut, len(ops))
    lf = {"tags"}

    def apply(st, op):
        if op["op"] == "PUT":
            st.apply_put(op["value"], op["ts"], op["colo"], lf, set())
        elif op["op"] == "DELETE":
            st.apply_delete(op["ts"], op["colo"])
        else:
            st.apply_update(op["update"], op["ts"], op["colo"])

    st = RecordState()
    for op in ops[:cut]:
        apply(st, op)
    st = record_state_from_json(record_state_to_json(st))
    for op in ops[cut:]:
        apply(st, op)
    assert st.finalize(lf, set()) == merge_ops(ops, lf, set())


# ---- vectorized scalar fast path (merge_op_log scalar_only branch) ----

_scalar_op = st_.one_of(
    st_.builds(
        lambda ts, colo, a, b: {"op": "PUT", "ts": ts, "colo": colo,
                                "value": {"a": a, "b": b}},
        st_.integers(1, 6), st_.integers(0, 2),
        st_.one_of(st_.none(), st_.integers(-3, 3), st_.floats(-2, 2, allow_nan=False)),
        st_.one_of(st_.none(), st_.text("xy", max_size=2)),
    ),
    st_.builds(
        lambda ts, colo: {"op": "DELETE", "ts": ts, "colo": colo},
        st_.integers(1, 6), st_.integers(0, 2),
    ),
)


@settings(max_examples=300, deadline=None)
@given(
    logs=st_.dictionaries(
        st_.integers(0, 3), st_.lists(_scalar_op, min_size=1, max_size=8),
        min_size=1, max_size=4,
    ),
    seed=st_.integers(0, 1000),
)
def test_scalar_fast_path_matches_general_kernel(logs, seed):
    """_fold_scalar_pdf must agree with merge_ops on every key for arbitrary
    scalar PUT/DELETE logs — including ts ties (delete-wins-ties, value-rank
    PUT ties), None values, and shuffled arrival order. The small ts domain
    forces frequent ties, the interesting case."""
    import random

    import pandas as pd

    from venice_spark.merge.dcr import _fold_scalar_pdf, merge_ops

    rows = []
    for k, ops in logs.items():
        for op in ops:
            v = op.get("value", {})
            rows.append(
                {"k": k, "op": op["op"], "ts": op["ts"], "colo": op["colo"],
                 "a": v.get("a"), "b": v.get("b")}
            )
    random.Random(seed).shuffle(rows)
    pdf = pd.DataFrame(rows)

    out = _fold_scalar_pdf(pdf, ["k"], ["a", "b"])
    got = {}
    for r in out.to_dict("records"):
        a, b = r["a"], r["b"]
        a = None if (isinstance(a, float) and a != a) else a
        b = None if (isinstance(b, float) and b != b) else b
        got[r["k"]] = {"a": a, "b": b}

    for k, ops in logs.items():
        expect = merge_ops(ops)
        if expect is None:
            assert k not in got, (k, got.get(k))
        else:
            norm = {c: expect.get(c) for c in ("a", "b")}
            # int/float unification: pandas may upcast ints in mixed columns
            for c in ("a", "b"):
                g, e = got[k][c], norm[c]
                if isinstance(g, float) and isinstance(e, int):
                    g = int(g) if g == int(g) else g
                assert g == e or (g is None and e is None), (k, c, got[k], norm)


def test_merge_op_log_scalar_fast_path_spark(spark):
    """End-to-end through merge_op_log: the scalar_only branch (events-style
    PUT/DELETE log) returns the same result as the general applyInPandas
    path on the same log."""
    import pyspark.sql.functions as F

    from venice_spark.merge.dcr import merge_op_log

    rows = [
        (1, "PUT", 10, 0, 1.0), (1, "PUT", 20, 0, 2.0), (1, "DELETE", 20, 0, None),
        (2, "PUT", 5, 0, 9.0), (2, "DELETE", 4, 0, None),
        (3, "DELETE", 9, 0, None), (3, "PUT", 9, 1, 7.0),
        (4, "PUT", 1, 0, None),
    ]
    log = spark.createDataFrame(rows, "k long, op string, ts long, colo int, v double")
    fast = merge_op_log(log, ["k"], "k long, v double", num_partitions=4)
    general = merge_op_log(log, ["k"], "k long, v double")
    f = {r["k"]: r["v"] for r in fast.collect()}
    g = {r["k"]: r["v"] for r in general.collect()}
    assert f == g
    # ts-tie semantics: key 1 deleted (DELETE ties PUT@20 and wins); key 2
    # survives (delete older); key 3 deleted (tie); key 4 = NULL-value put
    assert set(f) == {2, 4} and f[2] == 9.0 and f[4] is None


def test_record_liveness_property():
    """Liveness law (review regression): a merged record is None iff the
    dominating operation at the record level is a DELETE — collection
    emptiness never deletes a record on its own. Checked over randomized
    op logs in shuffled arrival order."""
    import random

    from venice_spark.merge.dcr import merge_ops

    rng = random.Random(11)
    for trial in range(60):
        n_ops = rng.randint(1, 6)
        ops = []
        for i in range(n_ops):
            ts = rng.randint(1, 5)
            kind = rng.choice(["PUT", "DELETE", "UPDATE"])
            if kind == "PUT":
                val = {"tags": rng.sample(["a", "b", "c"], rng.randint(0, 2))}
                ops.append({"op": "PUT", "ts": ts, "value": val})
            elif kind == "DELETE":
                ops.append({"op": "DELETE", "ts": ts})
            else:
                upd = {}
                if rng.random() < 0.7:
                    upd["add_tags"] = rng.sample(["a", "b", "c"], 1)
                else:
                    upd["rem_tags"] = rng.sample(["a", "b", "c"], 1)
                ops.append({"op": "UPDATE", "ts": ts, "update": upd})
        shuffled = ops[:]
        rng.shuffle(shuffled)
        out = merge_ops(shuffled, list_fields={"tags"})
        # model: record dead iff a DELETE dominates every PUT (higher ts,
        # or equal ts — delete wins ties) AND no UPDATE creates state that
        # outlives it. A PUT at ts > all deletes => alive, whatever its
        # content (including empty tags).
        max_del = max((o["ts"] for o in ops if o["op"] == "DELETE"), default=None)
        put_alive = any(
            o["op"] == "PUT" and (max_del is None or o["ts"] > max_del)
            for o in ops
        )
        if put_alive:
            assert out is not None, (trial, ops)
        if out is None:
            assert not put_alive, (trial, ops)
        # determinism across arrival orders
        assert out == merge_ops(ops, list_fields={"tags"}), (trial, ops)


# -------------------------------------------- r4 review regressions


def test_merge_op_log_null_numeric_key_single_row(spark):
    """code-review r4: the num_partitions fast path keyed states on raw
    pandas group keys — each Arrow batch makes a FRESH NaN for a null
    numeric key (NaN != NaN), splitting one key's ops across states."""
    from venice_spark.merge.dcr import merge_op_log

    rows = []
    # enough rows that the partition folds across several Arrow batches
    for i in range(50):
        rows.append((None, "PUT", 10 + i, 0, f"v{i}"))
    rows.append((7, "PUT", 5, 0, "seven"))
    log = spark.createDataFrame(
        rows, "k long, op string, ts long, colo int, name string"
    )
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
        out = merge_op_log(
            log, ["k"], "k long, name string", num_partitions=1
        ).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r["name"])
    assert len(by_key.get(None, [])) == 1, f"null key split: {by_key}"
    assert by_key[None] == ["v49"]  # highest ts wins across ALL batches
    assert by_key[7] == ["seven"]


def test_collection_merge_with_struct_elements(spark):
    """code-review r4: list elements that are structs (array<struct>) made
    CollectionState._present raise TypeError: unhashable type — a plain
    whole-collection PUT of such a field must merge fine."""
    from venice_spark.merge.dcr import merge_op_log

    log = spark.createDataFrame(
        [
            ("k1", "PUT", 10, 0, [{"t": "a", "n": 1}]),
            ("k1", "PUT", 20, 1, [{"t": "b", "n": 2}, {"t": "c", "n": 3}]),
        ],
        "k string, op string, ts long, colo int, events array<struct<t string, n long>>",
    )
    out = merge_op_log(
        log, ["k"], "k string, events array<struct<t string, n long>>",
        list_fields={"events"},
    ).collect()
    assert len(out) == 1
    got = sorted((e["t"], e["n"]) for e in out[0]["events"])
    assert got == [("b", 2), ("c", 3)]  # ts=20 whole-put wins


def test_record_state_json_roundtrip_with_struct_elements():
    """Struct elements survive the state-JSON round trip (the stateful DCR
    operator persists RecordState between triggers)."""
    from venice_spark.merge.dcr import (
        RecordState,
        record_state_from_json,
        record_state_to_json,
    )

    st = RecordState()
    cs = st._coll("events", is_map=False)
    cs.add({"t": "a", "n": 1}, None, ts=5, colo=0)
    cs.put_whole([{"t": "b", "n": 2}], ts=3, colo=0)
    rt = record_state_from_json(record_state_to_json(st))
    assert rt.finalize({"events"}, set()) == st.finalize({"events"}, set())
