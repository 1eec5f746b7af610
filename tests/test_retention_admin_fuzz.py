"""Crash-schedule sweeps over the r7-new protocol seams (VERDICT r7 #7):
the committed lifecycle fuzzers predate the RT schema sidecar, RT-log
retention (truncate_rt), and the admin recover/--gc path, so their seeded
schedules never land on those mutations. Two sweeps close that:

1. producer flush + truncate-rt + serve lifecycle — crashes land on the
   RT sidecar replace (flush's only python-level mutation) and on
   truncation's file unlinks; after every crash the buffer/flush retry and
   the next serve must stay model-exact.
2. `admin recover --gc --clean-staging` invoked while a compact is
   crash-stranded mid-protocol — the ops entry must heal whatever state
   the schedule left (partial staged moves, missing manifest, mid-GC)
   without content drift, and a subsequent compact must complete.

Same either/or model contract as tests/_crash_schedule.py."""

import importlib.util
import os
import random
import sys

import pytest

from venice_spark.engine import VeniceSparkEngine

from _crash_schedule import assert_seed_coverage, fuzz_seeds, run_with_crash# noqa: E402

pytestmark = pytest.mark.slow  # release-gate battery: run with SPARK_GRAFT_SLOW=1

_SPEC = importlib.util.spec_from_file_location(
    "admin_cli_fuzz",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "admin.py",
    ),
)
admin = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(admin)


def _model(base: dict, ops: list[tuple]) -> dict:
    best = {}
    for k, ts, kind, v in ops:
        cur = best.get(k)
        if cur is None or (ts, kind == "DELETE") > (cur[0], cur[1] == "DELETE"):
            best[k] = (ts, kind, v)
    out = dict(base)
    for k, (_ts, kind, v) in best.items():
        if kind == "DELETE":
            out.pop(k, None)
        else:
            out[k] = v
    return out


@pytest.mark.parametrize("seed", fuzz_seeds([7, 29]))
def test_rt_retention_lifecycle_fuzz_with_scheduled_crashes(spark, tmp_root, seed):
    """Sweep scheduled crashes through producer flushes (the RT sidecar's
    write-ahead replace) and truncate_rt (file-granular unlinks behind the
    consumer-safety guard). Contract: a crashed flush leaves the buffer
    intact (ops simply pending — the data write happens after the sidecar
    replace), a crashed truncation deletes only files the serve already
    committed (content unaffected), and every subsequent serve matches the
    pure-Python model."""
    rng = random.Random(seed)
    eng = VeniceSparkEngine(spark, tmp_root + f"_rtfz{seed}")
    eng.create_store("h", key_fields=["k"], partition_count=2, hybrid=True)
    base = {i: f"b{i}" for i in range(4)}
    eng.push("h", spark.createDataFrame(list(base.items()), "k long, v string"))
    st = eng.store("h")
    p = st.producer()

    ops: list[tuple] = []
    pending: list[tuple] = []
    next_ts = 1000
    outcomes = set()
    served_max_ts = 0

    def flush_pending():
        nonlocal pending
        for k, ts, kind, v in pending:
            if kind == "DELETE":
                p.delete(k, ts=ts)
            else:
                p.put(k, {"v": v}, ts=ts)
        batch, pending = list(pending), []
        res = run_with_crash(
            lambda: p.flush(schema="k long, op string, ts long, colo int, v string"),
            nth=rng.randint(1, 2),
            path_filter="rt",
        )
        outcomes.add(res)
        if res == "crashed":
            # flush's one python-level mutation is the sidecar replace,
            # which precedes the data write: nothing landed, buffer intact
            assert p._buffer, f"seed {seed}: crashed flush lost the buffer"
            p.flush(schema="k long, op string, ts long, colo int, v string")
        assert not p._buffer
        ops.extend(batch)

    for step in range(10):
        action = rng.choice(["op", "op", "op", "flush_serve", "truncate"])
        if action == "op":
            k = rng.randrange(0, 8)
            ts = next_ts
            next_ts += rng.randrange(1, 5)
            if rng.random() < 0.2:
                pending.append((k, ts, "DELETE", None))
            else:
                pending.append((k, ts, "PUT", f"v{ts}"))
        elif action == "flush_serve":
            if pending:
                flush_pending()
            live = st.hybrid_serve()
            served_max_ts = max([served_max_ts] + [t for _, t, _, _ in ops])
            got = {r["k"]: r["v"] for r in live.read().collect()}
            assert got == _model(base, ops), f"seed {seed} step {step} serve"
        elif action == "truncate":
            # guard-safe cutoff: everything below it was served (committed)
            cutoff = served_max_ts + 1
            res = run_with_crash(
                lambda: st.truncate_rt(before_ts=cutoff),
                nth=rng.randint(1, 3),
                path_filter="rt",
            )
            outcomes.add(res)
            got = {r["k"]: r["v"] for r in st.hybrid_serve().read().collect()}
            assert got == _model(base, ops), (
                f"seed {seed} step {step} post-truncate serve diverged"
            )

    if pending:
        flush_pending()
        st.hybrid_serve()
    final = {r["k"]: r["v"] for r in st.hybrid_serve().read().collect()}
    assert final == _model(base, ops), f"seed {seed} final"
    # the sweep must exercise both schedule outcomes or it silently
    # stopped covering the op's tail
    assert_seed_coverage(
        outcomes == {"crashed", "completed"},
        f"seed {seed} stopped covering both schedule outcomes: {outcomes}",
    )


@pytest.mark.parametrize("seed", fuzz_seeds([5, 43]))
def test_admin_recover_gc_heals_scheduled_compact_crashes(
    spark, tmp_root, seed, capsys
):
    """Sweep scheduled crashes through compact() and hand the wreckage to
    the OPS entry (`admin recover --gc --clean-staging`) instead of the
    library healers the crash-atomicity tests already exercise: whatever
    state the schedule leaves — partial staged moves, orphaned __compact_*
    staging, missing GC manifest, mid-GC unlinks — the admin command must
    exit 0, remove every crashed-compact orphan, and leave the next serve
    and the next compact model-exact."""
    import glob

    rng = random.Random(seed)
    root = tmp_root + f"_agfz{seed}"
    eng = VeniceSparkEngine(spark, root)
    eng.create_store("h", key_fields=["k"], partition_count=2, hybrid=True)
    base = {i: f"b{i}" for i in range(4)}
    eng.push("h", spark.createDataFrame(list(base.items()), "k long, v string"))
    st = eng.store("h")
    p = st.producer()

    ops: list[tuple] = []
    next_ts = 1000
    outcomes = set()
    serving_dir = os.path.join(eng.catalog.store_dir("h"), "serving")

    for round_no in range(4):
        for _ in range(rng.randint(1, 3)):
            k = rng.randrange(0, 8)
            ts = next_ts
            next_ts += rng.randrange(1, 5)
            kind = "DELETE" if rng.random() < 0.2 else "PUT"
            v = None if kind == "DELETE" else f"v{ts}"
            if kind == "DELETE":
                p.delete(k, ts=ts)
            else:
                p.put(k, {"v": v}, ts=ts)
            ops.append((k, ts, kind, v))
        p.flush(schema="k long, op string, ts long, colo int, v string")
        replay = st.hybrid_serve()

        # nth mixes in-protocol points with one far beyond the mutation
        # count (a compact stages up to shuffle-partitions part files, so
        # small nth values always land): the completed tail must stay in
        # the sweep's accounting
        res = run_with_crash(
            replay.compact,
            nth=rng.choice([1, 2, 3, 4, 5, 6, 200]),
            path_filter="serving",
        )
        outcomes.add(res)
        assert admin.main([root, "recover", "h", "--gc", "--clean-staging"]) == 0
        capsys.readouterr()
        assert glob.glob(serving_dir + "__compact_*") == [], (
            f"seed {seed} round {round_no}: admin left a compact orphan"
        )
        got = {r["k"]: r["v"] for r in st.hybrid_serve().read().collect()}
        assert got == _model(base, ops), (
            f"seed {seed} round {round_no} post-recover serve diverged"
        )
        # and a clean compact completes on top of the healed state
        replay = st.hybrid_serve()
        replay.compact()
        got = {r["k"]: r["v"] for r in replay.read().collect()}
        assert got == _model(base, ops), (
            f"seed {seed} round {round_no} post-recover compact diverged"
        )

    assert_seed_coverage(
        outcomes == {"crashed", "completed"},
        f"seed {seed} stopped covering both schedule outcomes: {outcomes}",
    )
