"""FastText-style quality classifier for corpus filtering.

The GPT-3 / LLaMA data recipe: train a cheap linear classifier to tell a
high-quality seed corpus (Wikipedia/books) from raw crawl, then score every
crawl document and keep the high-probability ones (optionally with
probability-proportional sampling). This module implements that loop
Spark-first:

- **Features**: the existing hashing-trick vector
  (functions/text.feature_hash_vector — pure JVM expressions, no
  vocabulary), L1-normalized by token count so long documents don't
  dominate the margin.
- **Training**: `pyspark.ml` LogisticRegression on pos ∪ neg. Seed sets
  are small by definition (curated corpora), so training cost is bounded
  regardless of crawl size; the model is a dim+1 coefficient vector.
- **Scoring**: the model is applied as a closed-form expression — a
  dot-product fold over the feature array plus a sigmoid — NOT
  model.transform, so the 100 TB scoring pass stays inside whole-stage
  codegen with zero Python and zero MLlib overhead per row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from venice_spark.functions import text as TX


def _features(text_col: str, dim: int):
    """L1-normalized hashed count vector (array<double>).

    The token count is bound ONCE via array_repeat/zip_with: Spark does no
    CSE inside lambda bodies, so referencing the tokenize chain in a
    transform() lambda re-evaluates it per output dim — the measured
    O(dim^2) trap quantize_int8/feature_hash_vector document."""
    counts = TX.feature_hash_vector(text_col, dim=dim)
    n = F.greatest(TX.token_count(text_col), F.lit(1)).cast("double")
    return F.zip_with(
        counts, F.array_repeat(n, dim), lambda c, nn: c.cast("double") / nn
    )


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    dim: int = 256,
    max_iter: int = 50,
    reg_param: float = 1e-4,
) -> dict:
    """Fit the seed classifier; returns a plain dict
    {"weights": [...], "intercept": float, "dim": int} — engine-agnostic,
    JSON-serializable (store it in a catalog config or ship it anywhere)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    data = (
        positive.select(_features(text_col, dim).alias("__f"))
        .withColumn("label", F.lit(1.0))
        .unionByName(
            negative.select(_features(text_col, dim).alias("__f")).withColumn(
                "label", F.lit(0.0)
            )
        )
        .select(array_to_vector("__f").alias("features"), "label")
    )
    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param)
    model = lr.fit(data)
    return {
        "weights": [float(w) for w in model.coefficients],
        "intercept": float(model.intercept),
        "dim": dim,
    }


def quality_prob_col(model: dict, text_col: str = "text"):
    """P(high quality) as a standalone Column expression — usable directly
    in any filter/select, including streaming stage-1 gates
    (streaming_corpus_prep(extra_gate=quality_prob_col(m) >= 0.9))."""
    w = F.array(*[F.lit(float(x)) for x in model["weights"]])
    feats = _features(text_col, model["dim"])
    margin = F.aggregate(
        F.zip_with(feats, w, lambda a, b: a * b),
        F.lit(float(model["intercept"])),
        lambda acc, x: acc + x,
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))


def score_quality(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Append P(high quality) per document. The linear model evaluates as a
    zip_with dot product + sigmoid — one pure expression chain, no Python,
    no shuffle; at 100 TB this is a narrow map over the scan."""
    return df.withColumn(out_col, quality_prob_col(model, text_col))


def quality_filter(
    df: DataFrame,
    model: dict,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    pareto_alpha: float | None = None,
    precision: int = 1_000_000,
) -> DataFrame:
    """Keep documents the classifier likes. threshold mode keeps
    quality_prob >= threshold; with `pareto_alpha` set, keep instead by the
    GPT-3 paper's probabilistic rule — keep iff
    Pareto(alpha) > 1 - quality_prob, i.e. with probability
    (2 - quality_prob)^(-alpha) — which retains a long tail of
    lower-scored documents for diversity (alpha=9 in the paper). The
    Pareto draw is inverted deterministically from the md5 hash of the id
    (keep iff hash_uniform(id) < (2 - prob)^(-alpha)), never an RNG."""
    scored = score_quality(df, model, text_col)
    if pareto_alpha is None:
        return scored.filter(F.col("quality_prob") >= threshold)
    u = (
        F.pmod(TX.hash64(F.col(id_col).cast("string"), seed=13), F.lit(precision))
        .cast("double")
        / precision
    )
    # P(Pareto(alpha) > x) = (1 + x)^(-alpha) for x >= 0, with x = 1 - prob
    keep_p = F.pow(F.lit(2.0) - F.col("quality_prob"), F.lit(-float(pareto_alpha)))
    return scored.filter(u < keep_p)
