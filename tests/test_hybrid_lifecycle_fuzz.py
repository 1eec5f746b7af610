"""Model-based fuzz of the hybrid serving lifecycle (the r5-changed
surface): a seeded random interleaving of producer puts/deletes (unique
timestamps assigned globally, but ops are SHUFFLED across flushes so stale
arrivals happen naturally), hybrid_serve calls (append-mode LSM default,
checkpoint resume), explicit compactions, and new batch pushes (which
re-seed serving and replay the full RT log per the per-version
buffer-replay contract). After every serve the live view is compared to a
pure-Python latest-ts-wins model (delete-wins-ties; base rows carry ts 0
so any RT op beats the batch row for its key).

Catches cross-feature interactions the example-based tests can't: the
seed-marker survival across append/compact swaps, checkpoint resume vs
re-seed decisions, tombstone persistence across compaction, and stale
cross-batch arrivals — all under one model."""

import random

import pytest

from venice_spark.engine import VeniceSparkEngine

from _crash_schedule import assert_seed_coverage, fuzz_seeds  # noqa: E402

pytestmark = pytest.mark.slow  # release-gate battery: run with SPARK_GRAFT_SLOW=1



def _model(base: dict, ops: list[tuple]) -> dict:
    """ops: (key, ts, kind, value); latest ts wins, DELETE beats PUT on a
    ts tie (ties never generated here, but keep the rule). Base rows are
    ts 0: any op wins its key."""
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


@pytest.mark.parametrize("seed", fuzz_seeds([3, 21]))
def test_hybrid_serve_fuzz_matches_model(spark, tmp_root, seed):
    rng = random.Random(seed)
    eng = VeniceSparkEngine(spark, tmp_root + f"_hfz{seed}")
    eng.create_store("h", key_fields=["k"], partition_count=2, hybrid=True)

    base = {i: f"b{i}" for i in range(5)}
    eng.push(
        "h", spark.createDataFrame(list(base.items()), "k long, v string")
    )
    st = eng.store("h")
    p = st.producer()

    ops: list[tuple] = []      # every RT op ever written (the whole log)
    pending: list[tuple] = []  # generated but not yet flushed
    next_ts = 1000
    replay = None

    for step in range(14):
        action = rng.choice(
            ["op", "op", "op", "flush_serve", "flush_serve", "compact", "push"]
        )
        if action == "op":
            # unique ts, but arrival order decouples from ts order: ops
            # are shuffled into flushes, so older-ts ops land in later
            # micro-batches (the stale-arrival case the DCR contract
            # makes irrelevant)
            k = rng.randrange(0, 10)
            ts = next_ts
            next_ts += rng.randrange(1, 7)
            if rng.random() < 0.25:
                pending.append((k, ts, "DELETE", None))
            else:
                pending.append((k, ts, "PUT", f"v{ts}"))
            rng.shuffle(pending)
        elif action == "flush_serve":
            cut = rng.randint(0, len(pending))
            batch, pending = pending[:cut], pending[cut:]
            for k, ts, kind, v in batch:
                if kind == "DELETE":
                    p.delete(k, ts=ts)
                else:
                    p.put(k, {"v": v}, ts=ts)
            if batch:
                p.flush(schema="k long, op string, ts long, colo int, v string")
            ops.extend(batch)
            replay = st.hybrid_serve()
            got = {r["k"]: r["v"] for r in replay.read().collect()}
            want = _model(base, ops)
            assert got == want, (
                f"seed {seed} step {step} after serve: got={got} want={want}"
            )
        elif action == "compact":
            if replay is not None:
                replay.compact()
                got = {r["k"]: r["v"] for r in replay.read().collect()}
                assert got == _model(base, ops), f"seed {seed} step {step} compact"
        elif action == "push":
            # new batch version: random fresh base; serving must re-seed
            # and replay the FULL RT log on top (old deletes still hide
            # their keys — base rows are ts 0)
            base = {
                i: f"B{step}_{i}"
                for i in sorted(rng.sample(range(0, 12), rng.randint(2, 6)))
            }
            eng.push(
                "h",
                spark.createDataFrame(list(base.items()), "k long, v string"),
            )
            replay = st.hybrid_serve()
            got = {r["k"]: r["v"] for r in replay.read().collect()}
            want = _model(base, ops)
            assert got == want, (
                f"seed {seed} step {step} after push+reseed: got={got} want={want}"
            )

    # final serve sees everything (flush any stragglers)
    for k, ts, kind, v in pending:
        if kind == "DELETE":
            p.delete(k, ts=ts)
        else:
            p.put(k, {"v": v}, ts=ts)
    if pending:
        p.flush(schema="k long, op string, ts long, colo int, v string")
        ops.extend(pending)
    final = {r["k"]: r["v"] for r in st.hybrid_serve().read().collect()}
    assert final == _model(base, ops), f"seed {seed} final"


class _SimCrash(Exception):
    """Process-death stand-in: aborts a swap mid-rename inside the fuzz."""


@pytest.mark.parametrize("seed", fuzz_seeds([11]))
def test_hybrid_serve_fuzz_with_midswap_crashes_matches_model(spark, tmp_root, seed):
    """VERDICT r5 #7: compose the crash-injection points from
    test_crash_atomicity into the lifecycle fuzz — the logical mutations
    (puts/deletes/serve/compact/push-reseed) interleave with compactions
    KILLED at a random rename (before or after the serving dir is moved
    aside), and every subsequent serve/push must self-heal and still match
    the pure-Python model. Seed 11 exercises both crash points and a
    post-crash push re-seed (asserted at the end so the seed cannot
    silently stop covering them)."""
    import shutil

    rng = random.Random(seed)
    eng = VeniceSparkEngine(spark, tmp_root + f"_hfzc{seed}")
    eng.create_store("h", key_fields=["k"], partition_count=2, hybrid=True)
    base = {i: f"b{i}" for i in range(5)}
    eng.push("h", spark.createDataFrame(list(base.items()), "k long, v string"))
    st = eng.store("h")
    p = st.producer()

    ops: list[tuple] = []
    pending: list[tuple] = []
    next_ts = 1000
    replay = None
    crash_points_hit = set()
    pushed_after_crash = False
    crashed_once = False

    def crash_compact(r):
        """Kill compact() at a SCHEDULED filesystem mutation (VERDICT r6
        #4): the nth rename/replace/move/unlink inside the r7
        append+deferred-GC protocol — staged-file moves, the sidecar
        replace, the GC manifest replace, GC unlinks — swept by the seed
        instead of hand-picked points. Every seam is content-safe by
        construction; the fuzz proves the LIFECYCLE stays model-exact
        around whichever one the schedule lands on. An nth beyond the
        op's mutation count completes the compact — that outcome is part
        of the sweep's accounting."""
        nonlocal crashed_once
        from _crash_schedule import run_with_crash

        res = run_with_crash(
            r.compact, nth=rng.randint(1, 5), path_filter="serving"
        )
        crash_points_hit.add(res)
        if res == "crashed":
            crashed_once = True

    for step in range(16):
        action = rng.choice(
            ["op", "op", "op", "flush_serve", "flush_serve",
             "compact", "crash_compact", "crash_compact", "push"]
        )
        if action == "op":
            k = rng.randrange(0, 10)
            ts = next_ts
            next_ts += rng.randrange(1, 7)
            if rng.random() < 0.25:
                pending.append((k, ts, "DELETE", None))
            else:
                pending.append((k, ts, "PUT", f"v{ts}"))
            rng.shuffle(pending)
        elif action == "flush_serve":
            cut = rng.randint(0, len(pending))
            batch, pending = pending[:cut], pending[cut:]
            for k, ts, kind, v in batch:
                if kind == "DELETE":
                    p.delete(k, ts=ts)
                else:
                    p.put(k, {"v": v}, ts=ts)
            if batch:
                p.flush(schema="k long, op string, ts long, colo int, v string")
            ops.extend(batch)
            replay = st.hybrid_serve()
            got = {r["k"]: r["v"] for r in replay.read().collect()}
            assert got == _model(base, ops), f"seed {seed} step {step} serve"
        elif action == "compact":
            if replay is not None:
                replay.compact()
                got = {r["k"]: r["v"] for r in replay.read().collect()}
                assert got == _model(base, ops), f"seed {seed} step {step} compact"
        elif action == "crash_compact":
            if replay is not None:
                crash_compact(replay)
                # the very next read through a fresh handle must self-heal
                replay = st.hybrid_serve()
                got = {r["k"]: r["v"] for r in replay.read().collect()}
                assert got == _model(base, ops), (
                    f"seed {seed} step {step} post-crash serve diverged"
                )
        elif action == "push":
            base = {
                i: f"B{step}_{i}"
                for i in sorted(rng.sample(range(0, 12), rng.randint(2, 6)))
            }
            eng.push(
                "h", spark.createDataFrame(list(base.items()), "k long, v string")
            )
            if crashed_once:
                pushed_after_crash = True
            replay = st.hybrid_serve()
            got = {r["k"]: r["v"] for r in replay.read().collect()}
            assert got == _model(base, ops), f"seed {seed} step {step} push+reseed"

    final = {r["k"]: r["v"] for r in st.hybrid_serve().read().collect()}
    assert final == _model(base, ops), f"seed {seed} final"
    # the committed seed must actually cover the interactions it exists for:
    # scheduled crashes fired AND at least one schedule ran past the op's
    # mutation count (the completed tail of the sweep)
    assert_seed_coverage(
        crash_points_hit == {"crashed", "completed"},
        f"seed {seed} stopped covering both schedule outcomes: {crash_points_hit}",
    )
    assert_seed_coverage(
        pushed_after_crash, f"seed {seed} lost its post-crash push re-seed"
    )
