"""Byte-pair-encoding tokenizer: distributed vocabulary learning + encoding.

The missing piece between raw text and token-budget operators
(pack_sequences / chunk_documents count whitespace-or-regex tokens; real
pipelines count TOKENIZER tokens). Design follows Sennrich et al. 2016
("Neural Machine Translation of Rare Words with Subword Units"):

- **Learning needs only word-type counts, not documents.** `bpe_learn`
  aggregates (word, count) with ONE distributed explode + count shuffle;
  only the top `max_word_types` word TYPES (bounded, like IVF's k-means
  sample — vocabulary follows Zipf, so the captured mass is near-total)
  collect to the driver, where the merge loop runs on aggregated counts.
  The result is exact BPE over the captured types: the merge loop's input
  is precisely the word-frequency table, so shipping counts instead of
  text loses nothing but the truncated tail.
- **Encoding is embarrassingly parallel.** `bpe_encode` broadcasts the
  merge ranks and applies greedy lowest-rank-first merging per word inside
  an Arrow-batched mapInPandas, memoizing per distinct word per batch
  (natural text repeats words heavily, so the memo turns per-token work
  into per-type work). No shuffle; scales with the corpus scan.

Determinism: pair ties break lexicographically, so the learned merge list
is a pure function of the word-count multiset — identical across runs,
partitionings, and cluster sizes.
"""

from __future__ import annotations

import re
from collections import Counter

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from venice_spark.functions import text as TX

END = "</w>"


# ONE whitespace regime for learning AND encoding: Java \s (the Spark
# split below) is ASCII-only, so the Python-side encoder must split on the
# same class — str.split() would also break on Unicode whitespace (\xa0 in
# HTML-derived text), making encode disagree with the learned word stats.
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _split_words(text: str) -> list[str]:
    # strip ONLY the ASCII class: str.strip() also removes Unicode
    # whitespace (\xa0 etc.) the _WS regime keeps attached, so learn and
    # encode would disagree on word boundaries for NBSP-prefixed text —
    # the exact invariant the module header states (code-review r4)
    return [w for w in _WS.split(text.strip(" \t\n\x0b\f\r")) if w]


def _word_counts_df(df: DataFrame, text_col: str, max_word_types: int) -> DataFrame:
    """Distributed (word, count) top-K plan: explode → partial-agg count →
    orderBy+limit. The orderBy+limit pair MUST plan as TakeOrderedAndProject
    (per-partition heaps, driver merges K items) — a global Sort here would
    be the only driver-side scale risk in the tokenizer (plan-pinned in
    test_plan_shapes)."""
    return (
        df.select(F.explode(TX.tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(max_word_types)
    )


def _word_counts(df: DataFrame, text_col: str, max_word_types: int):
    """Top word types by count (ties: lexicographic), collected bounded."""
    wc = _word_counts_df(df, text_col, max_word_types)
    return [(r["w"], r["c"]) for r in wc.collect()]


def learn_from_counts(
    word_counts: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Pure-Python BPE merge learning on an aggregated word-frequency table
    (driver-side; the distributed part is producing the table). Returns
    merges in rank order."""
    vocab = {tuple(w) + (END,): c for w, c in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        # most frequent pair; deterministic lexicographic tie-break
        top = max(pairs.values())
        if top < 2:
            break
        best_pair = min(p for p, c in pairs.items() if c == top)
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        new_vocab = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_word_types: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn a BPE merge list from a corpus. One explode+count shuffle;
    only the bounded word-type table reaches the driver."""
    return learn_from_counts(_word_counts(df, text_col, max_word_types), num_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE: repeatedly merge the lowest-rank adjacent pair."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize `text_col` with a learned merge list; appends `out_col`
    (array<string> of subword tokens, `</w>` marking word ends). Broadcast
    ranks + per-batch word memo inside Arrow-batched mapInPandas — no
    shuffle, linear in corpus size."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast({tuple(m): i for i, m in enumerate(merges)})
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(StringType()))]
    )
    cols = [f.name for f in df.schema.fields]

    def run(batches):
        import pandas as pd

        ranks = bc.value
        for pdf in batches:
            # per-batch memo (bounded by the batch's distinct word types;
            # a task-lifetime memo grows without bound on high-cardinality
            # text like URLs/IDs)
            memo: dict[str, list[str]] = {}
            toks = []
            for text in pdf[text_col]:
                if text is None:
                    toks.append(None)
                    continue
                out: list[str] = []
                for w in _split_words(str(text)):
                    got = memo.get(w)
                    if got is None:
                        got = encode_word(w, ranks)
                        memo[w] = got
                    out.extend(got)
                toks.append(out)
            pdf = pdf.copy()
            pdf[out_col] = toks
            yield pdf[cols + [out_col]]

    return df.mapInPandas(run, schema=out_schema)


def bpe_token_count(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Per-row tokenizer-accurate token count — the budget unit
    pack_sequences/chunk_documents should use when a vocabulary exists."""
    enc = bpe_encode(df, text_col, merges, out_col="__bpe")
    return enc.withColumn(out_col, F.size("__bpe")).drop("__bpe")
