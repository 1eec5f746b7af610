"""Hypothesis property tests for the late-round-3 operators: invariants on
arbitrary corpora for duplicate-span coverage, document chunking, and fuzzy
key matching — each checked against an independent pure-Python model."""

import string

import pytest
from hypothesis import given, settings, strategies as st

# small vocabulary forces real window collisions across random docs
_WORDS = ["alpha", "beta", "gamma", "delta", "eps"]
docs_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)

keys_strategy = st.lists(
    st.text(alphabet="abc", min_size=4, max_size=7), min_size=2, max_size=10
)


def _model_spans(texts, w):
    """Pure-Python model of dup_ngram_spans: window multiset -> dup starts ->
    merged interval coverage."""
    # Python str.split() drops all empties — matching TX.tokens after the
    # r4 boundary-empty fix (token-less text has ZERO tokens, not [""])
    toks = {i: t.split() for i, t in enumerate(texts)}
    from collections import Counter

    wins = Counter()
    per_doc = {}
    for i, ts in toks.items():
        starts = []
        for s in range(0, max(len(ts) - w + 1, 0)):
            key = " ".join(ts[s : s + w])
            wins[key] += 1
            starts.append((s, key))
        per_doc[i] = starts
    out = {}
    for i, ts in toks.items():
        dup_starts = sorted(s for s, key in per_doc[i] if wins[key] >= 2)
        covered = set()
        for s in dup_starts:
            covered.update(range(s, s + w))
        out[i] = (len(ts), dup_starts, len(covered))
    return out


@settings(max_examples=10, deadline=None)
@given(docs_strategy)
def test_dup_ngram_spans_matches_python_model(spark, texts):
    from venice_spark.dedup import dup_ngram_spans

    w = 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], list(r["dup_starts"]), r["covered"])
        for r in dup_ngram_spans(df, window=w, hash_windows=False).collect()
    }
    model = _model_spans(texts, w)
    for i in range(len(texts)):
        assert got[i] == model[i], (texts[i], got[i], model[i])


@settings(max_examples=10, deadline=None)
@given(docs_strategy, st.integers(2, 5), st.integers(1, 5))
def test_chunk_documents_reassembles(spark, texts, w, s):
    """Disjoint chunks concatenate back to the normalized text; strided
    chunk starts follow the arithmetic; token counts add up."""
    from venice_spark.dedup import chunk_documents

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = chunk_documents(df, max_tokens=w, stride=w).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        toks = t.split()  # r4 fix: token-less docs chunk to NOTHING
        if not toks:
            assert i not in by_doc
            continue
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        rebuilt = " ".join(c["chunk_text"] for c in chunks)
        assert rebuilt == " ".join(toks)
        assert sum(c["chunk_tokens"] for c in chunks) == len(toks)


def _model_hamming_pairs(keys, d):
    out = set()
    for i, a in enumerate(keys):
        for j in range(i + 1, len(keys)):
            b = keys[j]
            if len(a) == len(b):
                dist = sum(1 for x, y in zip(a, b) if x != y)
                if dist <= d:
                    out.add((i, j, dist))
    return out


@settings(max_examples=10, deadline=None)
@given(keys_strategy, st.integers(1, 2))
def test_fuzzy_key_pairs_matches_brute_force(spark, keys, d):
    from venice_spark.dedup import fuzzy_key_pairs

    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "id long, k string"
    )
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_key_pairs(df, "k", "id", max_subs=d).collect()
    }
    assert got == _model_hamming_pairs(keys, d)


def _hash64_py(s: str) -> int:
    """Pure-Python model of functions/text.hash64: first 15 md5 hex digits."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=60, unique=True),
    st.integers(min_value=0, max_value=99),
    st.integers(min_value=1, max_value=8),
)
def test_shard_plan_matches_python_model(spark, ids, seed, n_shards):
    from venice_spark.pipeline import shard_plan

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: (r["shard"], r["shuffle_key"])
        for r in shard_plan(df, "doc_id", seed=seed, n_shards=n_shards).collect()
    }
    for i in ids:
        key = _hash64_py(f"{seed}:{i}")
        assert got[i] == (key % n_shards, key)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=40, unique=True),
    st.sampled_from([0.0, 0.3, 1.0, 1.5, 2.0, 2.7]),
)
def test_stratified_resample_matches_python_model(spark, ids, rate):
    """Each id independently yields floor(rate) copies + 1 iff the seeded
    per-copy hash clears the fractional remainder — modeled exactly."""
    import math as m

    from venice_spark.pipeline import stratified_resample

    df = spark.createDataFrame([(i, "s") for i in ids], "doc_id long, dom string")
    got = sorted(
        (r["doc_id"], r["copy"])
        for r in stratified_resample(df, "dom", {"s": rate}, "doc_id").collect()
    )
    precision = 1_000_000
    scaled = int(round(rate * precision))
    expect = []
    for i in ids:
        for c in range(int(m.ceil(rate)) if rate > 0 else 0):
            if (c + 1) * precision <= scaled:
                expect.append((i, c))
            elif c * precision < scaled:
                # seed=14: the resample purpose salt (decorrelates copy-0
                # survival from assign_splits/shard_plan seed-0 hashes)
                if _hash64_py(f"14:{c}:{i}") % precision < scaled % precision:
                    expect.append((i, c))
    assert got == sorted(expect)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.text(alphabet="xyz", min_size=1, max_size=6), min_size=1, max_size=40),
    st.integers(min_value=0, max_value=50),
)
def test_assign_splits_matches_python_model(spark, keys, seed):
    from venice_spark.pipeline import assign_splits

    rows = [(i, k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    weights = {"train": 0.6, "val": 0.2, "test": 0.2}
    got = {
        r["doc_id"]: r["split"]
        for r in assign_splits(df, "doc_id", weights=weights, by_col="grp", seed=seed).collect()
    }
    precision = 1_000_000
    for i, kkey in rows:
        b = _hash64_py(f"{seed}:{kkey}") % precision
        want = "train" if b < 600000 else ("val" if b < 800000 else "test")
        assert got[i] == want
