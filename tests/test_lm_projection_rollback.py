"""Unit tests for the late-round-3 additions: unigram-LM quality scoring,
Johnson-Lindenstrauss random projection, and version rollback/set-version.
Expectations are hand-computed on tiny inline data (the DuckDB oracles check
the same ops at testdata scale)."""

import math

import pytest

from venice_spark import VeniceSparkEngine
from venice_spark.functions import vectors as VV
from venice_spark.pipeline import unigram_logprob


# ------------------------------------------------------------- unigram LM


def test_unigram_logprob_hand_computed(spark):
    # corpus: "a a b" + "c" -> tf: a=2, b=1, c=1; N=4
    df = spark.createDataFrame([(1, "a a b"), (2, "c")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in unigram_logprob(df, "text", "doc_id").collect()}
    exp1 = (math.log(2 / 4) + math.log(2 / 4) + math.log(1 / 4)) / 3
    assert out[1]["lm_logprob"] == pytest.approx(exp1, abs=1e-5)
    assert out[1]["n_tokens"] == 3
    assert out[2]["lm_logprob"] == pytest.approx(math.log(1 / 4), abs=1e-5)
    assert out[2]["n_tokens"] == 1


def test_unigram_logprob_ranks_garbage_below_mode(spark):
    # a document of corpus-common tokens must outscore one of hapaxes
    common = " ".join(["the quick brown fox"] * 5)
    rows = [(i, common) for i in range(10)] + [(99, "zxq1 vbn2 plm3 wkj4")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["lm_logprob"] for r in unigram_logprob(df, "text", "doc_id").collect()}
    assert out[99] < out[0]


# ------------------------------------------------------- random projection


def test_rademacher_matrix_deterministic_and_pm1():
    m1 = VV.rademacher_matrix(8, 4, seed=7)
    m2 = VV.rademacher_matrix(8, 4, seed=7)
    assert m1 == m2
    assert len(m1) == 4 and all(len(r) == 8 for r in m1)
    assert all(v in (-1.0, 1.0) for r in m1 for v in r)
    assert VV.rademacher_matrix(8, 4, seed=8) != m1


def test_random_projection_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    vecs = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(20)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    mat = VV.rademacher_matrix(16, 4, seed=3)
    out = {
        r["vec_id"]: r["proj"]
        for r in df.select(
            "vec_id", VV.random_projection("embedding", mat).alias("proj")
        ).collect()
    }
    m = np.asarray(mat)
    scale = 1.0 / math.sqrt(4)
    for vid, vec in vecs:
        exp = (m @ np.asarray(vec)) * scale
        assert out[vid] == pytest.approx(exp.tolist(), rel=1e-12)


def test_random_projection_preserves_distances_statistically(spark):
    # JL property: squared distances preserved in expectation; with k=32 of
    # d=64 the empirical distortion over 100 gaussian pairs stays modest
    import numpy as np

    rng = np.random.default_rng(42)
    n, d, k = 100, 64, 32
    X = rng.normal(size=(n, d))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)], ["vec_id", "embedding"]
    )
    mat = VV.rademacher_matrix(d, k, seed=5)
    out = df.select("vec_id", VV.random_projection("embedding", mat).alias("p")).collect()
    P = np.zeros((n, k))
    for r in out:
        P[r["vec_id"]] = r["p"]
    pairs = [(i, (i * 7 + 13) % n) for i in range(0, n, 5) if i != (i * 7 + 13) % n]
    ratios = []
    for i, j in pairs:
        d2 = float(np.sum((X[i] - X[j]) ** 2))
        p2 = float(np.sum((P[i] - P[j]) ** 2))
        ratios.append(p2 / d2)
    mean_ratio = sum(ratios) / len(ratios)
    assert 0.8 < mean_ratio < 1.2
    assert all(0.4 < r < 1.9 for r in ratios)


# ------------------------------------------------------------ rollback ops


def test_rollback_and_set_version(spark, tmp_path):
    eng = VeniceSparkEngine(spark, str(tmp_path))
    eng.create_store("s", key_fields=["k"], partition_count=2)
    eng.push("s", spark.createDataFrame([(1, "v1")], ["k", "val"]))
    eng.push("s", spark.createDataFrame([(1, "v2")], ["k", "val"]))
    st = eng.store("s")
    assert st.get(1)["val"] == "v2"

    # rollback -> previous version serves, O(1) pointer flip
    v = eng.rollback("s")
    assert v == eng.catalog.current_version("s")
    assert st.get(1)["val"] == "v1"

    # roll forward again via set-version
    eng.set_version("s", v + 1)
    assert st.get(1)["val"] == "v2"


def test_rollback_errors(spark, tmp_path):
    eng = VeniceSparkEngine(spark, str(tmp_path))
    eng.create_store("s", key_fields=["k"], partition_count=2)
    eng.push("s", spark.createDataFrame([(1, "v1")], ["k", "val"]))
    with pytest.raises(ValueError, match="no version older"):
        eng.rollback("s")
    with pytest.raises(ValueError, match="no version v9"):
        eng.set_version("s", 9)


def test_rollback_explicit_version_after_retire(spark, tmp_path):
    eng = VeniceSparkEngine(spark, str(tmp_path))
    eng.create_store("s", key_fields=["k"], partition_count=2)
    for i in range(1, 4):
        eng.push("s", spark.createDataFrame([(1, f"v{i}")], ["k", "val"]))
    assert eng.store("s").get(1)["val"] == "v3"
    eng.rollback("s", to_version=1)
    assert eng.store("s").get(1)["val"] == "v1"


# ------------------------------------------------------ importance sampling


def test_importance_sample_weight_semantics(spark):
    from venice_spark.pipeline import importance_sample

    rows = [(i, 1.0 if i < 100 else 0.0) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    kept = {r["doc_id"] for r in importance_sample(df, "w", "doc_id").collect()}
    # weight 1 always survives, weight 0 never
    assert kept == set(range(100))


def test_importance_sample_monotone_in_weight(spark):
    from venice_spark.pipeline import importance_sample

    ids = list(range(500))
    lo = spark.createDataFrame([(i, 0.3) for i in ids], ["doc_id", "w"])
    hi = spark.createDataFrame([(i, 0.7) for i in ids], ["doc_id", "w"])
    kept_lo = {r["doc_id"] for r in importance_sample(lo, "w", "doc_id").collect()}
    kept_hi = {r["doc_id"] for r in importance_sample(hi, "w", "doc_id").collect()}
    # raising weights only adds rows; rates land near the weights
    assert kept_lo.issubset(kept_hi)
    assert 0.2 < len(kept_lo) / 500 < 0.4
    assert 0.6 < len(kept_hi) / 500 < 0.8


# ---------------------------------------------------------- update-store


def test_update_store_mutable_and_config(spark, tmp_path):
    from venice_spark.catalog import StoreCatalog

    cat = StoreCatalog(str(tmp_path))
    cat.create_store("s", key_fields=["k"], partition_count=4)
    meta = cat.update_store("s", hybrid=True, rewind_seconds=600, compression="gzip")
    assert meta.hybrid is True and meta.rewind_seconds == 600
    assert meta.config["compression"] == "gzip"
    # persisted
    again = cat.get_store("s")
    assert again.hybrid is True and again.config["compression"] == "gzip"
    # partition_count applies from the next push
    cat.update_store("s", partition_count=8)
    assert cat.get_store("s").partition_count == 8


def test_update_store_rejects_immutable(spark, tmp_path):
    from venice_spark.catalog import StoreCatalog

    cat = StoreCatalog(str(tmp_path))
    cat.create_store("s", key_fields=["k"])
    import pytest as _pt

    with _pt.raises(ValueError, match="cannot be changed"):
        cat.update_store("s", key_fields=["other"])
    with _pt.raises(ValueError, match="cannot be changed"):
        cat.update_store("s", current_version=5)


# ------------------------------------------------- prepare_corpus new gates


def test_prepare_corpus_dup_ngram_gate(spark):
    from venice_spark.pipeline import CorpusPrepConfig, prepare_corpus

    boiler = " ".join(f"b{i}" for i in range(12))
    filler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        # boilerplate-dominated: duplicated window covers most tokens
        (1, f"{boiler} x"),
        (2, f"{boiler} y"),
        # clean docs
        (3, f"{filler} one"),
        (4, f"{filler.replace('quick', 'slow')} two unique ending here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    cfg = CorpusPrepConfig(
        min_tokens=1, min_stopword_ratio=0.0, max_dup_ngram_frac=0.5,
        dup_ngram_window=12,
    )
    kept = {r["doc_id"] for r in prepare_corpus(df, config=cfg).collect()}
    assert 1 not in kept and 2 not in kept
    assert 3 in kept and 4 in kept


def test_prepare_corpus_lm_weight_sampling(spark):
    from venice_spark.pipeline import CorpusPrepConfig, prepare_corpus

    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common) for i in range(50)] + [(99, "qqq www eee rrr ttt yyy")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # weights: common docs score near the mode -> weight ~1; the hapax doc
    # scores far below lm_weight_lo -> weight 0, always dropped
    cfg = CorpusPrepConfig(min_tokens=1, min_stopword_ratio=0.0,
                           lm_weight_lo=-4.0, lm_weight_hi=-2.0)
    # note: prepare_corpus dedups exact text first; use distinct suffixes
    rows = [(i, f"{common} v{i}") for i in range(50)] + [(99, "qqq www eee rrr ttt yyy")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = {r["doc_id"] for r in prepare_corpus(df, config=cfg).collect()}
    assert 99 not in kept
    # common docs carry high (not full — each has one hapax v{i} token)
    # weights, so a clear majority survives while the garbage doc never does
    assert len(kept) >= 25
