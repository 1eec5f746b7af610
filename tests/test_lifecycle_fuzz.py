"""Model-based lifecycle fuzz: a seeded random sequence of version-machinery
operations (full push, eager + lazy incremental push, compact, repush,
rollback, empty push) is checked after every step against a pure-Python
model of the expected key->value state. Catches cross-feature interactions
(e.g. a lazy delta surviving a rollback, or repush resurrecting dropped
keys) that single-feature tests never exercise."""

import random

import pytest

from venice_spark.engine import VeniceSparkEngine


def _read_state(eng, store):
    return {
        r["k"]: (r["v"], r["_rmd_ts"])
        for r in eng.store(store).df().select("k", "v", "_rmd_ts").collect()
    }


@pytest.mark.parametrize("seed", [7, 23])
def test_lifecycle_fuzz_matches_model(spark, tmp_root, seed):
    rng = random.Random(seed)
    eng = VeniceSparkEngine(spark, tmp_root + f"_fuzz{seed}")
    eng.create_store("s", key_fields=["k"], partition_count=2)

    def mkdf(kvs):
        return spark.createDataFrame(
            [(k, v, ts) for k, (v, ts) in kvs.items()],
            "k long, v double, _rmd_ts long",
        )

    # model: current state + per-version history (for rollback)
    now = 1000
    state = {k: (float(k), now) for k in range(8)}
    eng.push("s", mkdf(state))
    history = {eng.catalog.current_version("s"): dict(state)}

    for step in range(14):
        now += 10
        op = rng.choice(
            ["incr_eager", "incr_lazy", "compact", "repush", "rollback", "empty", "full"]
        )
        if op == "full":
            state = {
                k: (rng.random(), now) for k in rng.sample(range(20), rng.randint(1, 8))
            }
            eng.push("s", mkdf(state))
        elif op == "incr_eager":
            delta = {
                k: (rng.random(), now) for k in rng.sample(range(20), rng.randint(1, 5))
            }
            eng.incremental_push("s", mkdf(delta))
            state = {**state, **delta}
        elif op == "incr_lazy":
            delta = {
                k: (rng.random(), now) for k in rng.sample(range(20), rng.randint(1, 5))
            }
            eng.incremental_push("s", mkdf(delta), eager=False)
            state = {**state, **delta}
        elif op == "compact":
            eng.compact("s")
        elif op == "repush":
            eng.repush("s")
        elif op == "empty":
            eng.empty_push("s")
            state = {}
        elif op == "rollback":
            versions = sorted(history)
            cur = eng.catalog.current_version("s")
            prior = [v for v in versions if v < cur]
            if not prior:
                continue
            eng.rollback("s", prior[-1])
            state = dict(history[prior[-1]])
        got = _read_state(eng, "s")
        assert got == state, f"step {step} op {op}: {got} != {state}"
        history[eng.catalog.current_version("s")] = dict(state)
        # point reads agree with the model too
        probe = rng.randrange(20)
        row = eng.store("s").get(probe)
        if probe in state:
            assert row is not None and (row["v"], row["_rmd_ts"]) == state[probe]
        else:
            assert row is None
