"""Declarative data validation: single-pass rule evaluation and the
pre-push gate."""

import pytest

from venice_spark import VeniceSparkEngine
from venice_spark.validation import (
    InRange,
    Matches,
    NotNull,
    RowCountBetween,
    Unique,
    ValidationError,
    enforce,
    validate,
)


@pytest.fixture()
def frame(spark):
    rows = [
        (1, "a@x.com", 0.5),
        (2, "b@y.org", 0.9),
        (3, None, 1.5),          # null email, score out of range
        (3, "dup@key.io", 0.1),  # duplicate key
    ]
    return spark.createDataFrame(rows, "k long, email string, score double")


def test_validate_reports_each_rule(frame):
    report = validate(
        frame,
        [
            NotNull("email"),
            NotNull("email", max_null_frac=0.5),
            Unique(["k"]),
            InRange("score", 0.0, 1.0),
            Matches("email", "@"),
            RowCountBetween(2, 10),
            RowCountBetween(100, None),
        ],
    )
    by = {(r["rule"], r["target"], r["detail"]): r["ok"] for r in report}
    oks = [r["ok"] for r in report]
    # strict NotNull fails, tolerant one passes
    assert oks == [False, True, False, False, True, True, False]


def test_enforce_raises_with_all_failures(frame):
    with pytest.raises(ValidationError) as ei:
        enforce(frame, [NotNull("email"), Unique(["k"]), InRange("score", 0, 1)])
    rules = {f["rule"] for f in ei.value.failures}
    assert rules == {"NotNull", "Unique", "InRange"}


def test_enforce_passes_clean_frame(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    report = enforce(df, [NotNull("v"), Unique(["k"]), RowCountBetween(1, 10)])
    assert all(r["ok"] for r in report)


def test_push_gate_blocks_bad_data(spark, tmp_path):
    eng = VeniceSparkEngine(spark, str(tmp_path))
    eng.create_store("s", key_fields=["k"], partition_count=2)
    bad = spark.createDataFrame([(1, None), (2, "x")], "k long, v string")
    with pytest.raises(ValidationError):
        eng.push("s", bad, validations=[NotNull("v")])
    # nothing landed
    assert eng.catalog.current_version("s") == 0
    # clean data passes the same gate
    good = spark.createDataFrame([(1, "a"), (2, "x")], "k long, v string")
    eng.push("s", good, validations=[NotNull("v"), Unique(["k"])])
    assert eng.store("s").get(1)["v"] == "a"
