"""Unit tests for the corpus-statistics / quality operators added in round 3:
repetition metrics, PII scrub, n-gram counts, inverted index, top-k per
group. Expectations are hand-computed on tiny inline corpora (independent of
the DuckDB oracles, which check the same ops at testdata scale)."""

import pytest
import pyspark.sql.functions as F

from venice_spark import pipeline as P
from venice_spark.functions import text as TX


@pytest.fixture()
def docs(spark):
    rows = [
        # 4 non-empty lines, "dup dup" repeated -> 3 distinct of 4 lines
        (1, "dup dup\ndup dup\n\nuniq one\nother line"),
        # bigrams: "a b","b a","a b" -> top bigram "a b" 2/3
        (2, "a b a b"),
        (3, "single"),
        (4, "mail me at bob.smith@example.com or call +1 555-123-4567 now"),
        (5, "no pii here, just words and more words here"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_repetition_metrics(spark, docs):
    out = {
        r["doc_id"]: r
        for r in P.repetition_metrics(docs, "text", "doc_id").collect()
    }
    assert out[1]["dup_line_frac"] == pytest.approx(1 - 3 / 4)
    assert out[2]["dup_line_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == pytest.approx(2 / 3)
    # no bigrams -> defined as 0, not null/NaN
    assert out[3]["top_bigram_frac"] == 0.0
    assert out[3]["dup_line_frac"] == 0.0


def test_pii_scrub_counts_and_redaction(spark, docs):
    out = {r["doc_id"]: r for r in P.pii_scrub(docs, "text", "doc_id").collect()}
    assert out[4]["emails"] == 1
    assert out[4]["phones"] == 1
    assert "<EMAIL>" in out[4]["redacted"]
    assert "<PHONE>" in out[4]["redacted"]
    assert "example.com" not in out[4]["redacted"]
    assert "555" not in out[4]["redacted"]
    assert out[5]["emails"] == 0 and out[5]["phones"] == 0


def test_pii_redaction_is_noop_without_pii(spark, docs):
    row = (
        P.pii_scrub(docs, "text", "doc_id")
        .filter(F.col("doc_id") == 5)
        .collect()[0]
    )
    clean = docs.filter(F.col("doc_id") == 5).collect()[0]["text"]
    assert row["redacted"] == clean


def test_ngram_counts_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "x y x y"), (2, "x y z")], ["doc_id", "text"]
    )
    # bigrams: doc1: "x y","y x","x y"; doc2: "x y","y z" -> x y:3, y x:1, y z:1
    rows = P.ngram_counts(df, "text", n=2, top_k=10).collect()
    got = {r["gram"]: r["n"] for r in rows}
    assert got == {"x y": 3, "y x": 1, "y z": 1}
    # ordering: count desc then gram asc
    assert [r["gram"] for r in rows] == ["x y", "y x", "y z"]


def test_ngram_counts_trigrams(spark):
    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    got = {r["gram"]: r["n"] for r in P.ngram_counts(df, "text", n=3).collect()}
    assert got == {"a b c": 1, "b c d": 1}


def test_inverted_index_band_and_ordering(spark):
    df = spark.createDataFrame(
        [
            (3, "apple banana"),
            (1, "apple cherry"),
            (2, "apple banana banana"),  # within-doc repeat counts once
        ],
        ["doc_id", "text"],
    )
    rows = P.inverted_index(df, "text", "doc_id", min_df=2, max_df=2).collect()
    got = {r["token"]: (r["df"], r["postings"]) for r in rows}
    # apple df=3 excluded by max_df; cherry df=1 excluded by min_df
    assert got == {"banana": (2, [2, 3])}


def test_topk_per_group_window_limit(spark):
    df = spark.createDataFrame(
        [
            ("en", 1, 100),
            ("en", 2, 300),
            ("en", 3, 300),  # tie with doc 2 -> doc 2 ranks first
            ("en", 4, 50),
            ("fr", 5, 10),
        ],
        ["lang", "doc_id", "n_chars"],
    )
    out = P.topk_per_group(df, ["lang"], "n_chars", "doc_id", k=2)
    rows = sorted(
        [(r["lang"], r["rk"], r["doc_id"]) for r in out.collect()]
    )
    assert rows == [("en", 1, 2), ("en", 2, 3), ("fr", 1, 5)]


def test_topk_per_group_plans_window_group_limit(spark):
    df = spark.range(100).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("v"), F.col("id").alias("t")
    )
    plan = (
        P.topk_per_group(df, ["g"], "v", "t", k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_text_kernels_edge_cases(spark):
    # NOTE: trim() strips spaces only (both Spark and DuckDB), so a
    # newline-only doc tokenizes to empty-string tokens — a degenerate-input
    # artifact shared with the SQL oracle, pinned here so a tokenizer change
    # that silently breaks oracle parity fails a unit test first.
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "\n\n\n"), (4, "one")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            TX.dup_line_fraction("text").alias("dlf"),
            TX.top_bigram_fraction("text").alias("tbf"),
            TX.email_count("text").alias("em"),
        ).collect()
    }
    for r in out.values():
        assert r["dlf"] == 0.0
        assert r["em"] == 0
    assert out[1]["tbf"] == 0.0
    assert out[2]["tbf"] == 0.0
    assert out[4]["tbf"] == 0.0
    assert out[3]["tbf"] == 0.0  # token-less doc: no bigrams at all (r4 fix)


def test_label_centroids_hand_computed(spark):
    from venice_spark.functions.vectors import label_centroids

    df = spark.createDataFrame(
        [
            (0, [1.0, 2.0]),
            (0, [3.0, 6.0]),
            (1, [10.0, 0.0]),
        ],
        "label int, embedding array<float>",
    )
    rows = {r["label"]: r["centroid"] for r in label_centroids(df, "embedding", "label").collect()}
    assert rows[0] == [2.0, 4.0]
    assert rows[1] == [10.0, 0.0]


def test_clean_lines_c4_style(spark):
    """Line-level cleaning keeps only sentence-like lines (>=3 words,
    terminal punctuation) — boilerplate lines vanish WITHIN the doc.
    Pytest-only: the driver corpus is single-line/punctuation-free, so a
    registry oracle over it would be degenerate."""
    doc = "\n".join(
        [
            "Home | About | Contact",          # no terminal punct
            "This is a real sentence.",         # kept
            "Buy now!",                         # < 3 words
            "Another proper sentence here?",    # kept
            "",                                  # empty
            "footer",                            # 1 word, no punct
        ]
    )
    df = spark.createDataFrame([(1, doc), (2, "no structure at all")], ["doc_id", "text"])
    out = {r["doc_id"]: r["c"] for r in df.select(
        "doc_id", TX.clean_lines("text").alias("c")).collect()}
    assert out[1] == "This is a real sentence.\nAnother proper sentence here?"
    assert out[2] == ""


def test_drop_common_lines_removes_cross_doc_boilerplate(spark):
    banner = "accept all cookies to continue reading"
    rows = [
        (1, f"{banner}\nunique insight number one here.\nmore real content."),
        (2, f"{banner}\ncompletely different article body."),
        (3, "standalone document with no boilerplate at all."),
        (4, banner),  # boilerplate-only doc -> empty after cleaning
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["clean_text"] for r in P.drop_common_lines(df).collect()}
    assert out[1] == "unique insight number one here.\nmore real content."
    assert out[2] == "completely different article body."
    assert out[3] == "standalone document with no boilerplate at all."
    assert out[4] == ""
    # in-doc repetition alone does not trigger removal (distinct-doc count)
    df2 = spark.createDataFrame(
        [(1, "same line repeated here\nsame line repeated here"), (2, "other text entirely")],
        ["doc_id", "text"],
    )
    out2 = {r["doc_id"]: r["clean_text"] for r in P.drop_common_lines(df2).collect()}
    assert out2[1] == "same line repeated here\nsame line repeated here"


def test_drop_common_lines_min_chars_guard(spark):
    # short ubiquitous lines (e.g. "ok") are below min_line_chars and kept
    rows = [(1, "ok\nreal content sentence here."), (2, "ok\nanother body.")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["clean_text"] for r in P.drop_common_lines(df).collect()}
    assert out[1].startswith("ok\n") and out[2].startswith("ok\n")


def test_tfidf_top_terms_hand_computed(spark):
    import math

    # 3 docs; "rare" appears only in doc 1 (twice), "the" in all
    rows = [
        (1, "the rare rare word"),
        (2, "the common text"),
        (3, "the common stuff"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = P.tfidf_top_terms(df, "text", "doc_id", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    top1 = by_doc[1][0]
    assert top1["tok"] == "rare" and top1["tf"] == 2 and top1["df"] == 1
    assert top1["score"] == pytest.approx(2 * math.log(3 / 1), abs=1e-5)
    # "the" has df=3 -> idf 0 -> score 0, never beats any distinctive term
    assert all(r["tok"] != "the" or r["score"] == 0.0 for r in out)
    # ranks are 1..k and deterministic
    assert [r["rank"] for r in sorted(by_doc[1], key=lambda r: r["rank"])] == [1, 2]


def test_prepare_corpus_line_cleaning_stage(spark):
    """Stage 0: boilerplate lines are removed BEFORE quality gates, so a doc
    that is boilerplate + thin content gets judged (and dropped) on its real
    content, while substantive docs survive with cleaned text."""
    from venice_spark.pipeline import CorpusPrepConfig, prepare_corpus

    banner = "subscribe to our newsletter today please thanks"
    body = "the quick brown fox jumps over the lazy dog repeatedly all day"
    rows = [
        (1, f"{banner}\n{body}"),
        (2, f"{banner}\nshort"),            # real content under min_tokens
        (3, f"{banner}\n{body} variation"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    cfg = CorpusPrepConfig(
        min_tokens=5, min_stopword_ratio=0.0, drop_common_lines_min_docs=2
    )
    out = {r["doc_id"]: r["text"] for r in prepare_corpus(df, config=cfg).collect()}
    assert set(out) == {1, 3}
    assert banner not in out[1] and out[1].startswith("the quick")


def test_shard_plan_deterministic_and_uniform(spark):
    """shard_plan: same seed -> identical assignment; different seed -> a
    different permutation; shards cover the row set exactly once."""
    from venice_spark.pipeline import shard_plan

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = shard_plan(df, "doc_id", seed=1, n_shards=8).collect()
    b = shard_plan(df, "doc_id", seed=1, n_shards=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = {r["doc_id"]: r["shuffle_key"] for r in
         shard_plan(df, "doc_id", seed=2, n_shards=8).collect()}
    a_keys = {r["doc_id"]: r["shuffle_key"] for r in a}
    assert any(a_keys[k] != c[k] for k in a_keys)  # new seed reshuffles
    # every row lands in exactly one shard, shards roughly balanced
    shards = {}
    for r in a:
        shards.setdefault(r["shard"], set()).add(r["doc_id"])
    assert sum(len(s) for s in shards.values()) == 2000
    assert set().union(*shards.values()) == set(range(2000))
    sizes = [len(s) for s in shards.values()]
    assert min(sizes) > 2000 / 8 * 0.6 and max(sizes) < 2000 / 8 * 1.4


def test_export_training_shards_round_trip(spark, tmp_path):
    """export_training_shards: shard=N dirs, seeded order inside each shard,
    byte-identical re-run, max_records_per_file honored, no global sort in
    the plan (the shuffle is a hash repartition on shard)."""
    import os

    from venice_spark.pipeline import export_training_shards, shard_plan

    df = spark.range(500).selectExpr(
        "id AS doc_id", "repeat('x', CAST(id % 7 AS INT)) AS text"
    )
    out = str(tmp_path / "shards")
    export_training_shards(
        df, out, id_col="doc_id", seed=3, n_shards=4, max_records_per_file=40
    )
    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(shard_dirs) == 4
    # a shard's files, read in filename order, yield ascending shuffle_key
    back = spark.read.parquet(out)
    assert back.count() == 500
    assert set(r["doc_id"] for r in back.select("doc_id").collect()) == set(range(500))
    expected = shard_plan(df, "doc_id", seed=3, n_shards=4)
    exp_map = {r["doc_id"]: (r["shard"], r["shuffle_key"]) for r in expected.collect()}
    for r in back.select("doc_id", "shard", "shuffle_key").collect():
        assert exp_map[r["doc_id"]] == (r["shard"], r["shuffle_key"])
    # file-size bound: no parquet part exceeds max_records_per_file rows
    for d in shard_dirs:
        for f in os.listdir(os.path.join(out, d)):
            if f.endswith(".parquet"):
                n = spark.read.parquet(os.path.join(out, d, f)).count()
                assert n <= 40
    # intra-shard order is the seeded permutation: per-file key ranges are
    # disjoint and ascending in filename order (Spark writes the sorted
    # stream sequentially)
    d0 = os.path.join(out, shard_dirs[0])
    files = sorted(f for f in os.listdir(d0) if f.endswith(".parquet"))
    last_max = -1
    for f in files:
        keys = [r["shuffle_key"] for r in
                spark.read.parquet(os.path.join(d0, f)).collect()]
        assert keys == sorted(keys)
        assert keys[0] > last_max
        last_max = keys[-1]


def test_stratified_resample_copy_counts(spark):
    """rate 3.0 -> exactly 3 copies of every row; rate 0.0 -> none;
    fractional rate keeps ~frac of the extra copy, deterministically."""
    from venice_spark.pipeline import stratified_resample

    rows = [(i, "a" if i < 100 else ("b" if i < 200 else "c"))
            for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "dom"])
    out = stratified_resample(
        df, "dom", {"a": 3.0, "b": 0.0, "c": 1.5}, "doc_id"
    ).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["dom"], []).append((r["doc_id"], r["copy"]))
    assert len(by_dom["a"]) == 300  # 3 full copies
    assert sorted(c for i, c in by_dom["a"] if i == 0) == [0, 1, 2]
    assert "b" not in by_dom
    # c: 800 rows at 1.5 -> 800 full + ~400 fractional
    n_c = len(by_dom["c"])
    assert 800 + 250 < n_c < 800 + 550
    assert all(c in (0, 1) for _, c in by_dom["c"])
    # determinism
    again = stratified_resample(
        df, "dom", {"a": 3.0, "b": 0.0, "c": 1.5}, "doc_id"
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # moving ANOTHER stratum's rate never changes c's kept set
    moved = stratified_resample(
        df, "dom", {"a": 0.25, "b": 1.0, "c": 1.5}, "doc_id"
    ).collect()
    c_before = sorted((i, c) for i, c in by_dom["c"])
    c_after = sorted((r["doc_id"], r["copy"]) for r in moved if r["dom"] == "c")
    assert c_before == c_after


def test_assign_splits_weights_and_cluster_cohesion(spark):
    """Splits cover every row with ~weight proportions; keying on a cluster
    column puts all members of a cluster on the same side (the near-dup
    leakage guard); assignment is deterministic and seed-sensitive."""
    from venice_spark.pipeline import assign_splits

    df = spark.range(5000).selectExpr(
        "id AS doc_id", "CAST(id % 500 AS STRING) AS cluster"
    )
    out = assign_splits(
        df, "doc_id", weights={"train": 0.8, "val": 0.1, "test": 0.1},
        by_col="cluster", seed=4,
    ).collect()
    assert len(out) == 5000 and all(r["split"] in ("train", "val", "test") for r in out)
    # cohesion: a cluster never straddles splits
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    # proportions at the cluster level ~ 80/10/10
    from collections import Counter
    c = Counter(next(iter(s)) for s in by_cluster.values())
    assert 0.7 < c["train"] / 500 < 0.9
    # same seed reproduces; another seed moves some clusters
    again = assign_splits(
        df, "doc_id", weights={"train": 0.8, "val": 0.1, "test": 0.1},
        by_col="cluster", seed=4,
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = assign_splits(
        df, "doc_id", weights={"train": 0.8, "val": 0.1, "test": 0.1},
        by_col="cluster", seed=5,
    ).collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))


def test_corpus_report_rollup_totals(spark):
    """Per-group rows sum to the NULL-group total row; PII docs counted."""
    from venice_spark.pipeline import corpus_report

    rows = [
        (1, "the quick brown fox jumps", "en"),
        (2, "contact me at bob@example.com please thanks", "en"),
        (3, "uno dos tres cuatro cinco seis", "es"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r["grp"]: r for r in corpus_report(df, "text", group_col="lang").collect()}
    assert set(out) == {"en", "es", None}
    assert out[None]["n_docs"] == 3
    assert out["en"]["n_docs"] == 2 and out["es"]["n_docs"] == 1
    assert out[None]["total_tokens"] == out["en"]["total_tokens"] + out["es"]["total_tokens"]
    assert out["en"]["pii_docs"] == 1 and out["es"]["pii_docs"] == 0
    assert out["es"]["p50_tokens"] == 6.0
    # global single-row report without a group column
    g = corpus_report(df, "text").collect()
    assert len(g) == 1 and g[0]["n_docs"] == 3


def test_url_extraction_and_domain_stats(spark):
    from venice_spark.pipeline import domain_stats

    rows = [
        (1, "see https://Example.COM/page?a=1 and http://sub.other.org:8080/x y"),
        (2, "again https://example.com/else plain text"),
        (3, "no links here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["domain"]: (r["n_urls"], r["n_docs"]) for r in domain_stats(df).collect()}
    assert out == {"example.com": (2, 2), "sub.other.org": (1, 1)}


def test_blocklist_hits_and_prep_gate(spark):
    from venice_spark.functions import text as TX
    from venice_spark.pipeline import CorpusPrepConfig, prepare_corpus

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the BADWORD quick brown fox jumps over the badword dog"),
        (3, "the badword quick brown fox jumps over the lazy dog"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    hits = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", TX.blocklist_hits("text", ["badword"]).alias("h")
        ).collect()
    }
    assert hits == {1: 0, 2: 2, 3: 1}  # case-insensitive
    cfg = CorpusPrepConfig(
        min_tokens=3, min_stopword_ratio=0.0,
        blocklist_terms=["badword"], blocklist_max_hits=1,
    )
    kept = {r["doc_id"] for r in prepare_corpus(df, config=cfg).collect()}
    assert kept == {1, 3}  # doc 2 over the hit budget


def test_strip_markup_and_split_sentences(spark):
    from venice_spark.functions import text as TX

    rows = [
        (1, "<html><b>Hello</b> world &amp; friends.<br/>Next &#39;line&#x27;s&#39; here!</html>"),
        (2, "no markup. just two sentences? yes!"),
        (3, "<p></p>"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["clean"] for r in
           df.select("doc_id", TX.strip_markup("text").alias("clean")).collect()}
    assert out[1] == "Hello world friends. Next line s here!"  # hex entity &#x27; stripped too
    assert out[2] == "no markup. just two sentences? yes!"
    assert out[3] == ""
    sents = {r["doc_id"]: r["s"] for r in
             df.select("doc_id", TX.split_sentences(TX.strip_markup("text")).alias("s")).collect()}
    assert sents[1] == ["Hello world friends.", "Next line s here!"]
    assert sents[2] == ["no markup.", "just two sentences?", "yes!"]
    assert sents[3] == []
    # plan purity: no Python stage
    plan = df.select(TX.split_sentences("text"))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_prepare_corpus_equal_lm_bounds_is_hard_threshold(spark):
    """lm_weight_lo == lm_weight_hi must act as a hard threshold, not a
    0/0 division that silently empties the corpus."""
    from venice_spark.pipeline import CorpusPrepConfig, prepare_corpus, unigram_logprob

    rows = [(i, "the quick brown fox jumps over the lazy dog again") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    lp = unigram_logprob(df, "text", "doc_id").first()["lm_logprob"]
    cfg = CorpusPrepConfig(
        min_tokens=3, min_stopword_ratio=0.0,
        lm_weight_lo=lp - 0.1, lm_weight_hi=lp - 0.1,  # all docs above bound
    )
    kept = prepare_corpus(df, config=cfg)
    assert kept.count() == 1  # identical texts dedup to one survivor, kept
    cfg2 = CorpusPrepConfig(
        min_tokens=3, min_stopword_ratio=0.0,
        lm_weight_lo=lp + 0.1, lm_weight_hi=lp + 0.1,  # all docs below bound
    )
    assert prepare_corpus(df, config=cfg2).count() == 0


def test_bigram_logprob_ranks_order_salad_low(spark):
    """Docs sharing the corpus-common word ORDER outscore a doc with the
    same unigrams scrambled — the signal unigram LM cannot see — and
    sub-2-token docs get a null score with n_bigrams=0."""
    from venice_spark.pipeline import bigram_logprob

    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common) for i in range(5)]
    rows.append((10, "dog lazy the over jumps fox brown quick the"))  # scrambled
    rows.append((11, "single"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_logprob(df, "text", "doc_id").collect()}
    for i in range(5):
        assert out[i]["lm2_logprob"] > out[10]["lm2_logprob"]
    assert out[11]["lm2_logprob"] is None and out[11]["n_bigrams"] == 0
    assert out[0]["n_bigrams"] == 8


def test_prepare_corpus_best_quality_survivor(spark):
    from venice_spark.functions import text as TX
    from venice_spark.pipeline import CorpusPrepConfig, prepare_corpus

    # two docs differing in ONE mid-text word (J≈0.85, LSH-paired
    # deterministically); doc 11's variant word is a stopword, so its
    # stopword-ratio quality term is higher — best_quality must keep the
    # HIGHER id, while the default min_id policy keeps doc 10
    words = (
        "granite river maple falcon copper meadow lantern harbor violet "
        "thunder orchid saddle timber quartz willow ember canyon marble "
        "juniper beacon cedar raven summit prairie garnet hollow bramble "
        "drift anchor crystal forge pebble twilight mesa ridge cobalt "
        "aspen flint harvest sable"
    ).split()
    w10, w11 = list(words), list(words)
    w10[20], w11[20] = "purple", "the"
    rows = [
        (10, " ".join(w10)),
        (11, " ".join(w11)),
        (20, "a completely different text about spark plans and shuffles here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    q = {
        r["doc_id"]: r["q"]
        for r in df.select("doc_id", TX.quality_score("text").alias("q")).collect()
    }
    assert q[11] > q[10]  # precondition for the policy to differ

    base = dict(min_tokens=3, min_stopword_ratio=0.0, near_dup_jaccard=0.5)
    kept_min = {
        r["doc_id"]
        for r in prepare_corpus(df, config=CorpusPrepConfig(**base)).collect()
    }
    assert kept_min == {10, 20}
    kept_best = {
        r["doc_id"]
        for r in prepare_corpus(
            df, config=CorpusPrepConfig(**base, near_dup_keep="best_quality")
        ).collect()
    }
    assert kept_best == {11, 20}

    import pytest

    with pytest.raises(ValueError, match="near_dup_keep"):
        prepare_corpus(df, config=CorpusPrepConfig(**base, near_dup_keep="oops"))


def test_resample_survivors_decorrelated_from_splits(spark):
    """Purpose-salt regression: stratified_resample's copy-0 hash must NOT
    equal assign_splits' seed=0 hash, or every survivor of a downsampled
    stratum lands in 'train' and val/test drain to empty."""
    from venice_spark.pipeline import assign_splits, stratified_resample

    df = spark.createDataFrame(
        [(f"d{i}", "web") for i in range(4000)], "doc_id string, dom string"
    )
    kept = stratified_resample(df, "dom", {"web": 0.5}, "doc_id")
    split = assign_splits(kept, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    by = {r["split"]: r["n"] for r in split.groupBy("split").agg(
        F.count("*").alias("n")
    ).collect()}
    assert by.get("val", 0) > 0 and by.get("test", 0) > 0, by


def test_resample_explode_is_per_row_rate_bounded(spark):
    """A 0.2x stratum next to a 10x stratum must not materialize 10 copies
    per low-rate row: the explode is sized by each row's own rate."""
    import pyspark.sql.functions as F

    from venice_spark.pipeline import stratified_resample

    df = spark.createDataFrame(
        [(f"r{i}", "rare") for i in range(20)]
        + [(f"w{i}", "web") for i in range(2000)],
        "doc_id string, dom string",
    )
    out = stratified_resample(df, "dom", {"rare": 10.0, "web": 0.2}, "doc_id")
    copies = out.filter(F.col("dom") == "web").select("copy").distinct().collect()
    assert {r["copy"] for r in copies} == {0}
    n_rare = out.filter(F.col("dom") == "rare").count()
    assert n_rare == 200  # exactly 10 full copies of 20 rows
    n_web = out.filter(F.col("dom") == "web").count()
    assert 300 < n_web < 500  # ~20% of 2000


def test_corpus_report_total_flag_distinguishes_null_group(spark):
    """A genuine NULL-valued group and the rollup grand total both show
    grp=NULL; is_total tells them apart."""
    from venice_spark.pipeline import corpus_report

    df = spark.createDataFrame(
        [("a", "short text here ok", "en"), ("b", "more text here too", None)],
        "doc_id string, text string, lang string",
    )
    rows = corpus_report(df, "text", group_col="lang").collect()
    nulls = [r for r in rows if r["grp"] is None]
    assert len(nulls) == 2
    flags = sorted(r["is_total"] for r in nulls)
    assert flags == [0, 1]
    total = next(r for r in nulls if r["is_total"] == 1)
    assert total["n_docs"] == 2


def test_decontaminate_spans_composes_with_prepare_corpus(spark):
    """prepare_corpus output carries n_tokens; the span report must not
    duplicate it (AMBIGUOUS_REFERENCE on any later select)."""
    from venice_spark.pipeline import CorpusPrepConfig, decontaminate_spans, prepare_corpus

    docs = spark.createDataFrame(
        [(f"d{i}", "tok" + " tok".join(str(j) for j in range(i, i + 40))) for i in range(8)],
        "doc_id string, text string",
    )
    train = prepare_corpus(docs, config=CorpusPrepConfig(min_tokens=1))
    ev = spark.createDataFrame([(docs.first()["text"],)], "text string")
    out = decontaminate_spans(train, ev, window=10)
    assert out.columns.count("n_tokens") == 1
    out.select("n_tokens").collect()  # would raise on a duplicate


def test_temperature_rates_empty_corpus(spark):
    from venice_spark.pipeline import temperature_rates

    df = spark.createDataFrame([], "doc_id string, dom string")
    assert temperature_rates(df, "dom") == {}


def test_prepare_corpus_validates_lm_bounds_eagerly(spark):
    import pytest

    from venice_spark.pipeline import CorpusPrepConfig, prepare_corpus

    df = spark.createDataFrame([("a", "hello world")], "doc_id string, text string")
    with pytest.raises(ValueError, match="set together"):
        prepare_corpus(df, config=CorpusPrepConfig(lm_weight_lo=-7.0))
    with pytest.raises(ValueError, match="lm_weight_lo must be <="):
        prepare_corpus(
            df, config=CorpusPrepConfig(lm_weight_lo=-5.0, lm_weight_hi=-7.0)
        )


def test_random_projection_null_on_short_vector(spark):
    """A truncated/empty embedding NULLs its row instead of aborting the
    job with ANSI INVALID_ARRAY_INDEX."""
    from venice_spark.functions.vectors import random_projection, random_projection_cols

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [1.0]), (3, [])],
        "id long, vec array<double>",
    )
    m = [[1.0, 0.0, 1.0], [0.0, 1.0, 0.0]]
    rows = {r["id"]: r for r in df.select(
        "id", random_projection("vec", m).alias("proj"),
        *random_projection_cols("vec", m)
    ).collect()}
    assert rows[1]["proj"][0] is not None and rows[1]["p0"] is not None
    assert rows[2]["proj"][0] is None and rows[2]["p0"] is None
    assert rows[3]["proj"][0] is None


def test_mixture_rates_realizes_target_shares(spark):
    """The solver's rates, realized through stratified_resample, hit the
    requested token mixture and budget within hash-sampling noise."""
    from venice_spark.pipeline import mixture_rates, stratified_resample

    rows = (
        [(f"w{i}", "web", "tok " * 40) for i in range(400)]
        + [(f"k{i}", "wiki", "tok " * 40) for i in range(100)]
    )
    df = spark.createDataFrame(rows, "doc_id string, dom string, text string")
    # corpus: web 16000 tokens, wiki 4000. Ask 50/50 at 6000 total.
    rates = mixture_rates(df, "dom", {"web": 1.0, "wiki": 1.0}, token_budget=6000)
    assert abs(rates["web"] - 3000 / 16000) < 1e-9
    assert abs(rates["wiki"] - 3000 / 4000) < 1e-9
    out = stratified_resample(df, "dom", rates, "doc_id", default_rate=0.0)
    toks = {
        r["dom"]: r["n"] * 40
        for r in out.groupBy("dom").agg(F.count("*").alias("n")).collect()
    }
    assert abs(toks["web"] - 3000) < 600      # hash-threshold noise
    assert abs(toks["wiki"] - 3000) < 600

    # budget=None: binding stratum (wiki at 50%) pins rate 1.0
    r2 = mixture_rates(df, "dom", {"web": 1.0, "wiki": 1.0})
    assert r2["wiki"] == 1.0
    assert abs(r2["web"] - 4000 / 16000) < 1e-9

    # max_rate caps repetition
    r3 = mixture_rates(
        df, "dom", {"web": 1.0, "wiki": 1.0}, token_budget=16000, max_rate=1.5
    )
    assert r3["wiki"] == 1.5  # uncapped would be 2.0

    import pytest

    with pytest.raises(ValueError, match="unrealizable"):
        mixture_rates(df, "dom", {"web": 1.0, "code": 1.0})
    with pytest.raises(ValueError, match="non-negative"):
        mixture_rates(df, "dom", {"web": -1.0})
