"""Composable corpus-preparation pipeline (north-star surface).

The canonical 100 TB training-data prep job as a reusable library call:

    quality filter -> exact dedup -> (optional) near-dup removal ->
    token accounting -> sequence packing

Each stage is the operator defined elsewhere in the package (functions/
text.py, dedup.py); this module only wires them with the right barriers.
Plan shape: narrow filter -> one dedup shuffle -> optional LSH stage ->
one window per shard. No Python in any hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from venice_spark import dedup as DD
from venice_spark.functions import text as TX


@dataclass
class CorpusPrepConfig:
    min_tokens: int = 5
    max_tokens: int = 100_000
    min_stopword_ratio: float = 0.05
    near_dup_jaccard: float | None = None  # None = skip the MinHash stage
    pack_budget: int | None = None         # None = skip sequence packing
    n_shards: int = 32


def prepare_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    config: CorpusPrepConfig | None = None,
) -> DataFrame:
    """Run the prep pipeline; returns surviving documents with `n_tokens`
    (and `shard`/`pack_id` when packing is enabled). Deterministic: the
    lowest id in each duplicate group survives."""
    cfg = config or CorpusPrepConfig()

    # 1. quality filter — narrow, no shuffle
    qual = df.filter(
        TX.token_count(text_col).between(cfg.min_tokens, cfg.max_tokens)
        & (TX.stopword_ratio(text_col) >= cfg.min_stopword_ratio)
    ).withColumn("n_tokens", TX.token_count(text_col))

    # 2. exact dedup — keep lowest id per fingerprint (one shuffle)
    from pyspark.sql import Window

    w = Window.partitionBy(TX.fingerprint(text_col)).orderBy(id_col)
    kept = (
        qual.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    # 3. optional near-dup removal: drop the higher id of each LSH pair
    if cfg.near_dup_jaccard is not None:
        pairs = DD.minhash_lsh_pairs(
            kept, text_col, id_col, threshold=cfg.near_dup_jaccard
        )
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        kept = kept.join(losers, on=id_col, how="left_anti")

    # 4. optional sequence packing
    if cfg.pack_budget is not None:
        kept = DD.pack_sequences(
            kept, "n_tokens", id_col, cfg.pack_budget, cfg.n_shards
        )
    return kept


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: drop training documents sharing ANY token
    n-gram with an evaluation corpus (the standard guard against test-set
    leakage in pretraining data).

    Scale shape: the eval side (benchmark suites — thousands of docs, not
    billions) collapses to a distinct n-gram set and BROADCASTS, so the
    training corpus is never shuffled: explode (narrow) → broadcast hash
    join → distinct contaminated ids (small) → broadcast left-anti. At
    100 TB the only shuffle is over the contaminated-id set."""
    ev = (
        eval_df.select(F.explode(TX.shingles(text_col, ngram_n)).alias("__ng"))
        .distinct()
    )
    tr = train.select(
        F.col(id_col), F.explode(TX.shingles(text_col, ngram_n)).alias("__ng")
    )
    contaminated = tr.join(F.broadcast(ev), "__ng").select(id_col).distinct()
    return train.join(F.broadcast(contaminated), id_col, "left_anti")


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 0.0,
    precision: int = 1_000_000,
) -> DataFrame:
    """Deterministic per-stratum hash sampling — the domain-mixing primitive
    (e.g. keep 100% of a rare domain, 20% of web crawl). A row survives iff
    hash64(id) mod precision < rate(stratum) * precision: no RNG, identical
    output on every run and engine (md5-based hash64 reruns in any SQL
    dialect — the oracle re-derives it), and rows never move between strata
    samples when rates change, only in or out. Pure per-row expression: no
    shuffle, no Python."""
    bucket = F.pmod(TX.hash64(F.col(id_col).cast("string")), F.lit(precision))
    threshold = F.lit(int(round(default_rate * precision)))
    for s, r in rates.items():
        threshold = F.when(
            F.col(stratum_col) == s, F.lit(int(round(r * precision)))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)
