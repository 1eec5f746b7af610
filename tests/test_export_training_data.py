"""export_training_data: versioned store -> training-ready sharded parquet
(decontaminate -> mix -> leakage-safe splits -> shuffle/pack -> one file
per (split, shard), manifest sidecar)."""

import glob
import json
import os

import pyspark.sql.functions as F
import pytest

from venice_spark.engine import VeniceSparkEngine
from venice_spark.pipeline import export_training_data


def _doc(i):
    return f"document {i} body " + " ".join(f"t{i}x{j}" for j in range(12))


@pytest.fixture()
def engine(spark, tmp_root):
    eng = VeniceSparkEngine(spark, tmp_root)
    eng.create_store("corpus", key_fields=["doc_id"], partition_count=2)
    df = spark.createDataFrame(
        [(i, _doc(i), "web" if i % 3 else "wiki") for i in range(300)],
        "doc_id long, text string, source string",
    )
    eng.push("corpus", df)
    return eng


def test_export_layout_counts_and_manifest(engine, spark, tmp_path):
    out = str(tmp_path / "export")
    man = export_training_data(
        engine, "corpus", out,
        split_weights={"train": 0.8, "val": 0.1, "test": 0.1},
        n_shards=4,
    )
    assert man["version"] == 1 and man["n_shards"] == 4
    total = sum(s["rows"] for s in man["splits"].values())
    assert total == 300
    assert man["splits"]["train"]["rows"] > man["splits"]["val"]["rows"]
    # exactly one parquet file per (split, shard) directory
    for d in glob.glob(f"{out}/split=*/shard=*"):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d
    back = spark.read.parquet(out)
    assert back.count() == 300
    assert {r["split"] for r in back.select("split").distinct().collect()} == {
        "train", "val", "test",
    }
    sidecar = json.load(open(f"{out}/_export_manifest.json"))
    assert sidecar["splits"] == man["splits"]
    # deterministic: re-export produces identical split totals
    man2 = export_training_data(
        engine, "corpus", out,
        split_weights={"train": 0.8, "val": 0.1, "test": 0.1},
        n_shards=4,
    )
    assert man2["splits"] == man["splits"]


def test_export_packs_never_mix_splits(engine, spark, tmp_path):
    out = str(tmp_path / "packed")
    export_training_data(
        engine, "corpus", out,
        split_weights={"train": 0.7, "val": 0.3},
        pack_budget=64, n_shards=2,
    )
    back = spark.read.parquet(out)
    assert "pack_id" in back.columns
    # each (split, shard, pack_id) batch holds exactly one split by layout;
    # assert no pack budget overflow for multi-doc packs
    sizes = (
        back.withColumn("nt", F.size(F.split(F.trim("text"), r"\s+")))
        .groupBy("split", "shard", "pack_id")
        .agg(F.sum("nt").alias("tot"), F.count("*").alias("n"))
    )
    bad = sizes.filter((F.col("tot") > 64) & (F.col("n") > 1)).count()
    assert bad == 0


def test_export_mixing_and_leak_guard(engine, spark, tmp_path):
    out = str(tmp_path / "mixed")
    man = export_training_data(
        engine, "corpus", out,
        rates={"wiki": 2.0, "web": 0.5}, stratum_col="source",
        split_by_col="source",  # crude leakage guard: whole domain per side
        split_weights={"train": 0.5, "val": 0.5},
        n_shards=2,
    )
    back = spark.read.parquet(out)
    # wiki doubled (100 -> 200), web halved-ish (200 -> ~100)
    by_src = {
        r["source"]: r["n"]
        for r in back.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src["wiki"] == 200
    assert 70 <= by_src["web"] <= 130
    # leak guard: each source lands wholly on one split side
    sides = back.groupBy("source").agg(F.countDistinct("split").alias("k")).collect()
    assert all(r["k"] == 1 for r in sides)
    assert man["rates"] == {"wiki": 2.0, "web": 0.5}


def test_export_validation(engine, tmp_path, spark):
    with pytest.raises(ValueError, match="must differ"):
        export_training_data(
            engine, "corpus", str(tmp_path / "x"), split_seed=3, shard_seed=3
        )
    with pytest.raises(ValueError, match="together"):
        export_training_data(
            engine, "corpus", str(tmp_path / "y"), rates={"a": 1.0}
        )
    eng2 = VeniceSparkEngine(spark, str(tmp_path / "root2"))
    eng2.create_store("empty", key_fields=["k"])
    with pytest.raises(ValueError, match="no version"):
        export_training_data(eng2, "empty", str(tmp_path / "z"))


def test_upsampled_copies_never_straddle_splits(engine, spark, tmp_path):
    """Leakage regression: without split_by_col, every COPY of an
    upsampled document must land in the same split (independent per-copy
    hashes would put identical text in both train and val)."""
    out = str(tmp_path / "copies")
    export_training_data(
        engine, "corpus", out,
        rates={"wiki": 3.0, "web": 1.0}, stratum_col="source",
        split_weights={"train": 0.5, "val": 0.5},
        n_shards=2,
    )
    back = spark.read.parquet(out)
    straddlers = (
        back.groupBy("doc_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddlers == 0
    # and the copies still exist as distinct examples
    assert back.filter(F.col("copy") > 0).count() > 0


def test_null_guard_values_fall_back_to_id(engine, spark, tmp_path):
    """A NULL split_by_col value must not produce a NULL split (which
    would crash the manifest and hide rows under the hive default dir)."""
    eng = VeniceSparkEngine(spark, str(tmp_path / "root3"))
    eng.create_store("c2", key_fields=["doc_id"], partition_count=2)
    df = spark.createDataFrame(
        [(i, _doc(i), None if i % 2 else "dom") for i in range(40)],
        "doc_id long, text string, grp string",
    )
    eng.push("c2", df)
    out = str(tmp_path / "nullguard")
    man = export_training_data(
        eng, "c2", out, split_by_col="grp",
        split_weights={"train": 0.5, "val": 0.5}, n_shards=2,
    )
    assert None not in man["splits"]
    assert sum(s["rows"] for s in man["splits"].values()) == 40
    back = spark.read.parquet(out)
    assert back.filter(F.col("split").isNull()).count() == 0
