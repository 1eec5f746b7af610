"""Certification-gate sensitivity: a gate that cannot fail certifies
nothing. These tests run the gates' verdict formulas against deliberately
broken implementations/configurations and assert the verdict flips — so a
regression in the underlying operator family would turn the driver row
red instead of passing vacuously."""

import pyspark.sql.functions as F

from venice_spark.plans.reference_queries import W64
from venice_spark.similarity import brute_force_topk, lsh_topk


def test_lsh_recall_gate_fails_on_broken_index(spark, sf_dir):
    """Probing with a wrong plane seed / no multi-probe yields (near-)zero
    candidate overlap — the recall verdict must flip to False."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {r.vec_id for r in brute_force_topk(emb, W64, "embedding", "vec_id", k=10).collect()}
    broken = {
        r.vec_id
        for r in lsh_topk(
            emb, W64, "embedding", "vec_id", k=10,
            n_planes=8, tables=1, probe_hamming=0, seed=999_999,
        ).collect()
    }
    hits = len(exact & broken)
    assert hits < 6, f"broken index still clears the gate ({hits}/10)"


def test_hll_gate_envelope_is_tight_but_nonvacuous(spark):
    """At half a million distinct keys the HLL++ estimate is genuinely
    approximate: the shipped 3x-rsd (6%) envelope holds, but a 1% envelope
    would fail — i.e. the within_tol verdict measures something real and
    would catch a sketch regression that inflates error past the rsd
    contract."""
    df = spark.range(500_000)
    row = df.agg(
        F.countDistinct("id").alias("e"),
        F.approx_count_distinct("id", 0.02).alias("a"),
    ).collect()[0]
    err = abs(row.a - row.e) / row.e
    # the floor only asserts NON-vacuity (a 0.1% envelope would fail) —
    # kept far below any plausible HLL++ accuracy at rsd=0.02 so a Spark
    # upgrade improving the sketch cannot spuriously redden this test
    assert 0.001 < err <= 0.06, err


def test_quality_gate_fails_on_untrained_model(spark, sf_dir):
    """Scoring with a zeroed weight vector predicts 0.5 everywhere — the
    0.9 training-accuracy verdict must flip to False."""
    from venice_spark.quality import score_quality

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pos = docs.filter(F.col("doc_id") % 10 < 5)
    neg = docs.filter(F.col("doc_id") % 10 >= 5).withColumn("text", F.upper(F.col("text")))
    zero = {"weights": [0.0] * 64, "intercept": 0.0, "dim": 64}
    labeled = pos.withColumn("y", F.lit(1)).unionByName(neg.withColumn("y", F.lit(0)))
    scored = score_quality(labeled, zero)
    correct = ((F.col("quality_prob") >= 0.5) == (F.col("y") == 1)).cast("double")
    acc = scored.agg(F.avg(correct)).collect()[0][0]
    assert acc < 0.9, acc


def test_frame_gate_fails_on_degenerate_hash():
    """x_frame_dedup_gate's n_hashes == n_groups verdict is non-vacuous: a
    degenerate hash config (grid=1 -> a single self-compared bit, always 0)
    collapses every planted group to one hash, so the data-derived oracle
    equality would go red. The real grid=8 keeps all 16 planted patterns
    distinct."""
    import hashlib

    import numpy as np

    from venice_spark import multimodal as MM

    imgs = []
    for g in range(8):
        for fi in range(2):
            dig = hashlib.md5(f"frame:{g}:{fi}".encode()).digest()
            bits = np.unpackbits(np.frombuffer(dig[:8], dtype=np.uint8)).reshape(8, 8)
            imgs.append(
                np.kron((bits * 255).astype(np.uint8), np.ones((4, 4), dtype=np.uint8))[
                    :, :, None
                ]
            )
    real = {MM.ahash(im, grid=8) for im in imgs}
    assert len(real) == 16, "the 16 planted patterns must stay separated"
    broken = {MM.ahash(im, grid=1) for im in imgs}
    assert len(broken) == 1, "grid=1 must collapse (the verdict then flips)"


def test_ivfpq_gate_fails_on_wrong_probe_lists(spark, sf_dir):
    """Composed IVF-PQ gate sensitivity: probing the FARTHEST nprobe lists
    (inverted coarse ranking) removes the true neighbors' lists from the
    scan — the composed recall verdict must flip to False even though the
    PQ/ADC stage is intact."""
    from venice_spark.similarity import (
        ivf_assign,
        ivf_pq_topk,
        ivf_probe_lists,
        pq_encode,
        pq_train,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {r.vec_id for r in brute_force_topk(emb, W64, "embedding", "vec_id", k=10).collect()}
    cents = train_ivf_centroids(emb, "embedding", n_centroids=8, sample_fraction=1.0)
    books = pq_train(emb, "embedding", m=16, k=16, sample_fraction=1.0, seed=7)
    coded = emb.withColumn("ivf_list", ivf_assign("embedding", cents)).withColumn(
        "code", pq_encode("embedding", books)
    )
    good = set(ivf_probe_lists(W64, cents, 5))
    far = [i for i in range(8) if i not in good][:3]  # the never-probed lists
    broken = {
        r.vec_id
        for r in ivf_pq_topk(
            coded.filter(F.col("ivf_list").isin(far)), W64, "code", "vec_id",
            cents, books, k=10, nprobe=8,  # full probe of a wrongly-pruned corpus
            refine=50, vec_col="embedding", refine_metric="cosine",
        ).collect()
    }
    hits = len(exact & broken)
    assert hits < 6, f"wrong-list probe still clears the gate ({hits}/10)"


def test_audio_gate_fails_on_band_misattribution(spark):
    """Audio tone gate sensitivity: the gate's verdict formula must flip
    when the DSP pipeline misattributes spectral energy — simulated by
    planting the tone one band away from the expected one."""
    import numpy as np

    from venice_spark.multimodal import audio_features, decode_wav, encode_wav

    rate, n = 8000, 2048
    n_bins = n // 2 + 1
    t = np.arange(n) / rate
    for b in range(8):
        wrong = (b + 1) % 8
        kb = int(round((wrong + 0.5) * n_bins / 8))
        wav = encode_wav(0.5 * np.sin(2 * np.pi * (kb * rate / n) * t), rate)
        samples, r = decode_wav(wav)
        feats = audio_features(samples, r, n_bands=8)
        dominant = int(np.argmax(feats[4:12]))
        assert dominant == wrong != b  # verdict would be False for band b
