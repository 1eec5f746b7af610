"""Hypothesis property tests for the text-quality kernels: invariants that
must hold on arbitrary (including adversarial) text, checked via a single
batched Spark round-trip per example set for speed."""

import string

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings, strategies as st

from venice_spark import pipeline as P
from venice_spark.functions import text as TX

# text alphabet that exercises tokenizer boundaries: words, digits,
# whitespace (incl. newlines), punctuation, @ and dots for the PII regexes
_ALPHA = string.ascii_letters + string.digits + " \n\t.@-+()%_,"
texts = st.lists(
    st.text(alphabet=_ALPHA, min_size=0, max_size=120), min_size=1, max_size=8
)


@pytest.mark.slow
@settings(max_examples=12, deadline=None)
@given(texts)
def test_fraction_metrics_bounded(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    rows = df.select(
        TX.dup_line_fraction("text").alias("dlf"),
        TX.top_bigram_fraction("text").alias("tbf"),
        TX.email_count("text").alias("em"),
        TX.phone_count("text").alias("ph"),
    ).collect()
    for r in rows:
        assert 0.0 <= r["dlf"] < 1.0  # strictly <1: one line always survives dedup
        assert 0.0 <= r["tbf"] <= 1.0
        assert r["em"] >= 0 and r["ph"] >= 0


@pytest.mark.slow
@settings(max_examples=12, deadline=None)
@given(texts)
def test_redaction_idempotent_and_clean(spark, docs):
    """redact(redact(x)) == redact(x), and a redacted text matches no PII
    pattern — the placeholder tokens must never re-trigger either regex."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    rows = df.select(
        TX.redact_pii("text").alias("once"),
        TX.redact_pii(TX.redact_pii("text")).alias("twice"),
        TX.email_count(TX.redact_pii("text")).alias("em_after"),
        TX.phone_count(TX.redact_pii("text")).alias("ph_after"),
    ).collect()
    for r in rows:
        assert r["once"] == r["twice"]
        assert r["em_after"] == 0
        assert r["ph_after"] == 0


def test_prepare_corpus_repetition_gates(spark):
    """The new repetition knobs drop boilerplate docs; the same corpus with
    gates off keeps them (filters compose narrowly, no shuffle added)."""
    good = "the quick brown fox jumps over the lazy dog and runs far away home"
    boiler = "\n".join(["menu home about contact the"] * 8)
    loops = " ".join(["the same the same"] * 10)
    df = spark.createDataFrame(
        [(1, good), (2, boiler), (3, loops)], "doc_id long, text string"
    )
    cfg_off = P.CorpusPrepConfig(min_tokens=3, min_stopword_ratio=0.0)
    ids_off = {r["doc_id"] for r in P.prepare_corpus(df, config=cfg_off).collect()}
    assert ids_off == {1, 2, 3}

    cfg_on = P.CorpusPrepConfig(
        min_tokens=3,
        min_stopword_ratio=0.0,
        max_dup_line_frac=0.5,
        max_top_bigram_frac=0.3,
    )
    ids_on = {r["doc_id"] for r in P.prepare_corpus(df, config=cfg_on).collect()}
    assert ids_on == {1}


def test_temperature_rates_rebalance(spark):
    """alpha<1 boosts rare strata relative to common ones; alpha=1 keeps
    natural proportions (all rates equal); rates always in (0, max_rate]."""
    from venice_spark.pipeline import stratified_sample, temperature_rates

    rows = [("web",)] * 900 + [("code",)] * 90 + [("rare",)] * 10
    df = spark.createDataFrame(rows, ["domain"]).withColumn(
        "id", F.monotonically_increasing_id()
    )

    flat = temperature_rates(df, "domain", alpha=1.0)
    assert all(abs(v - 1.0) < 1e-9 for v in flat.values()), flat

    temp = temperature_rates(df, "domain", alpha=0.5)
    assert temp["rare"] == 1.0  # most-boosted stratum keeps everything
    assert temp["rare"] > temp["code"] > temp["web"] > 0
    # composes with the deterministic sampler
    kept = stratified_sample(df, "domain", temp, "id").groupBy("domain").count()
    got = {r["domain"]: r["count"] for r in kept.collect()}
    assert got["rare"] == 10
    assert got["web"] < 900


def test_feature_hash_vector_properties(spark):
    """Hashing-trick vector: sums to token count, deterministic across
    calls, identical text -> identical vector, dimension respected."""
    import pyspark.sql.functions as F

    from venice_spark.functions.text import feature_hash_vector

    rows = [(1, "a b c d e"), (2, "a b c d e"), (3, "z z z"), (4, "")]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {
        r["id"]: r["v"]
        for r in df.select("id", feature_hash_vector("text", dim=16).alias("v")).collect()
    }
    assert len(out[1]) == 16
    assert sum(out[1]) == 5
    assert out[1] == out[2]               # same text, same vector
    assert sum(out[3]) == 3
    assert max(out[3]) == 3               # all three tokens share one bucket
    assert sum(out[4]) == 0               # empty text -> no tokens (r4 fix)


def test_rebalance_corpus_upsamples_rare_domain(spark):
    """With max_rate > 1 the rare stratum gets real repetition (copy > 0
    rows) while the dominant stratum is hash-downsampled — output shares
    move toward the count^alpha target, deterministically."""
    from venice_spark.pipeline import rebalance_corpus

    rows = [(i, "web" if i < 9000 else "wiki") for i in range(10_000)]
    df = spark.createDataFrame(rows, ["doc_id", "domain"])
    out = rebalance_corpus(df, "domain", "doc_id", alpha=0.3, max_rate=3.0).collect()
    from collections import Counter

    n = Counter(r["domain"] for r in out)
    # natural shares: 90/10 -> rebalanced shares must move toward parity
    assert n["wiki"] / (n["wiki"] + n["web"]) > 0.25
    # rare domain actually repeated (upsampling produced copy >= 1)
    assert any(r["copy"] >= 1 for r in out if r["domain"] == "wiki")
    # dominant domain downsampled, never repeated
    assert n["web"] < 9000
    assert all(r["copy"] == 0 for r in out if r["domain"] == "web")
    # deterministic
    again = rebalance_corpus(df, "domain", "doc_id", alpha=0.3, max_rate=3.0).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


# -------------------------------------------- r4 review regressions


def test_tokens_drop_boundary_whitespace_empties(spark):
    """code-review r4: F.trim strips only spaces, so 'hello world\\n' used
    to tokenize with a phantom '' third token, poisoning every
    token-derived metric."""
    from venice_spark.functions import text as TX

    df = spark.createDataFrame(
        [(1, "hello world\n"), (2, "\n\n"), (3, ""), (4, "\xa0a b\t"),
         (5, "plain text")],
        "id long, text string",
    )
    out = {
        r["id"]: (r["t"], r["n"])
        for r in df.select(
            "id", TX.tokens("text").alias("t"), TX.token_count("text").alias("n")
        ).collect()
    }
    assert out[1] == (["hello", "world"], 2)
    assert out[2] == ([], 0) and out[3] == ([], 0)
    # Java \s is ASCII-only, so the NBSP glues to its token — consistent
    # with the tokenizer module's documented ASCII whitespace regime
    assert out[4] == (["\xa0a", "b"], 2)
    assert out[5] == (["plain", "text"], 2)


def test_ratio_kernels_survive_degenerate_docs(spark):
    """code-review r4: under default ANSI mode the unguarded 0/0 in
    punct/stopword/avg-len ratios was a job-aborting DIVIDE_BY_ZERO for
    empty or whitespace-only documents."""
    from venice_spark.functions import text as TX

    df = spark.createDataFrame([(1, ""), (2, "\n"), (3, "  ")], "id long, text string")
    rows = df.select(
        TX.punct_ratio("text").alias("p"),
        TX.stopword_ratio("text").alias("s"),
        TX.avg_token_len("text").alias("a"),
        TX.quality_score("text").alias("q"),
    ).collect()
    for r in rows:
        assert r["p"] == 0.0 and r["s"] == 0.0 and r["a"] == 0.0
        assert r["q"] is not None


def test_cosine_zero_norm_is_null_not_crash(spark):
    """code-review r4: a zero-norm vector made cosine 0/0 — ANSI
    DIVIDE_BY_ZERO aborts the job; it must degrade to NULL."""
    from venice_spark.functions import vectors as VX

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])], "id long, v array<double>"
    )
    out = {r["id"]: r["c"] for r in df.select(
        "id", VX.cosine_similarity("v", [1.0, 1.0]).alias("c")
    ).collect()}
    assert out[1] is None
    assert abs(out[2] - (1.0 / (2 ** 0.5))) < 1e-12
    # zero-norm PARAM likewise
    assert df.select(VX.cosine_similarity("v", [0.0, 0.0]).alias("c")).collect()[0]["c"] is None


def test_nbsp_word_split_matches_spark_regime():
    """code-review r4: the BPE encoder's Python splitter must not strip
    Unicode whitespace the Spark-side word counter keeps attached."""
    from venice_spark.tokenizer import _split_words

    assert _split_words("\xa0hello world") == ["\xa0hello", "world"]
    assert _split_words("  hello\tworld\n") == ["hello", "world"]
