"""BPE tokenizer: distributed vocabulary learning + Arrow-batched encoding.

Learning is checked on the classic Sennrich et al. word-frequency example
(hand-traceable merges) and against invariants on arbitrary corpora;
encoding is checked for round-trip losslessness and learn/encode coherence.
"""

import pytest
from hypothesis import given, settings, strategies as st

from venice_spark.tokenizer import (
    END,
    bpe_encode,
    bpe_learn,
    bpe_token_count,
    encode_word,
    learn_from_counts,
)


def test_learn_from_counts_classic_example():
    # Sennrich et al. 2016 fig. 1 vocabulary
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_from_counts(counts, num_merges=4)
    # pair frequencies round 1: ('e','s') = 6 + 3 = 9 is the unique max
    assert merges[0] == ("e", "s")
    # round 2: ('es','t') = 9 stays the max (t always follows es)
    assert merges[1] == ("es", "t")
    # round 3: ('est','</w>') = 9
    assert merges[2] == ("est", END)


def test_encode_word_greedy_and_roundtrip():
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_from_counts(counts, num_merges=10)
    ranks = {m: i for i, m in enumerate(merges)}
    toks = encode_word("lowest", ranks)
    # 'est</w>' was learned from newest/widest; 'lo'/'low' from low/lower
    assert "".join(toks) == "lowest" + END  # lossless
    assert "est" + END in toks
    # unseen characters fall back to single symbols
    toks2 = encode_word("xyz", ranks)
    assert "".join(toks2) == "xyz" + END


def test_bpe_learn_distributed_matches_local(spark):
    rows = [(1, "low low low low low lower lower"),
            (2, "newest newest newest newest newest newest"),
            (3, "widest widest widest")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_learn(df, "text", num_merges=5)
    # identical to learning from the aggregated counts directly
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    assert merges == learn_from_counts(counts, num_merges=5)


def test_bpe_encode_dataframe_and_count(spark):
    rows = [(1, "low lower"), (2, "newest"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = learn_from_counts(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)], 10
    )
    out = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_encode(df, "text", merges).collect()}
    ranks = {m: i for i, m in enumerate(merges)}
    assert out[1] == encode_word("low", ranks) + encode_word("lower", ranks)
    assert out[2] == encode_word("newest", ranks)
    assert out[3] is None
    cnt = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_token_count(df, "text", merges).collect()}
    assert cnt[1] == len(out[1]) and cnt[2] == len(out[2])
    # original columns preserved
    assert set(bpe_encode(df, "text", merges).columns) == {"doc_id", "text", "bpe_tokens"}


@settings(max_examples=15, deadline=None)
@given(st.lists(
    st.tuples(st.text(alphabet="abcd", min_size=1, max_size=6),
              st.integers(min_value=1, max_value=20)),
    min_size=1, max_size=12))
def test_learn_invariants(word_counts):
    # dedupe words (counts tables have unique words)
    seen = {}
    for w, c in word_counts:
        seen[w] = seen.get(w, 0) + c
    wc = sorted(seen.items())
    merges = learn_from_counts(wc, num_merges=8)
    ranks = {m: i for i, m in enumerate(merges)}
    # every encoded word round-trips; token count never increases with
    # more merges
    for w, _ in wc:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + END
        fewer = encode_word(w, {m: i for i, m in enumerate(merges[:2])})
        assert len(toks) <= len(fewer) <= len(w) + 1
    # determinism
    assert merges == learn_from_counts(wc, num_merges=8)


def test_learning_compresses_real_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    merges = bpe_learn(docs, "text", num_merges=80, max_word_types=5000)
    assert len(merges) > 20
    enc = bpe_token_count(docs, "text", merges)
    base = bpe_token_count(docs, "text", [])
    joined = enc.select("doc_id", "n_bpe_tokens").join(
        base.select("doc_id", base.n_bpe_tokens.alias("n_chars_toks")), "doc_id"
    ).collect()
    # learned merges strictly compress vs character tokenization
    assert all(r["n_bpe_tokens"] <= r["n_chars_toks"] for r in joined)
    assert sum(r["n_bpe_tokens"] for r in joined) < 0.8 * sum(
        r["n_chars_toks"] for r in joined
    )


def test_roundtrip_gate_formula_survives_literal_end_marker(spark):
    """The certification gate compares token-join WITH sentinels against the
    expected words+sentinel string; a document containing the literal text
    '</w>' must not false-fail (stripping END from the join would also
    delete the text's own '</w>' — code-review r4 continuation)."""
    import pyspark.sql.functions as F

    from venice_spark.tokenizer import END, bpe_encode, bpe_learn

    df = spark.createDataFrame(
        [(1, "a</w>b c"), (2, "plain words"), (3, None), (4, "   ")],
        "doc_id int, text string",
    )
    merges = bpe_learn(df, "text", num_merges=10, max_word_types=100)
    enc = bpe_encode(df, "text", merges, out_col="__toks")
    ws = "[ \\t\\n\\u000B\\f\\r]"
    joined = F.array_join(F.col("__toks"), "")
    trimmed = F.regexp_replace(F.col("text"), f"^{ws}+|{ws}+$", "")
    expected = F.when(F.length(trimmed) == 0, F.lit("")).otherwise(
        F.concat(F.regexp_replace(trimmed, f"{ws}+", END), F.lit(END))
    )
    ok = F.col("text").isNull() | (joined == expected)
    assert enc.filter(~ok).count() == 0
