"""Declarative data validation — the pre-push quality gate.

A 100 TB push that lands garbage costs a full re-push (the reference's
answer is operational: rollback to the backup version, Command.java:259).
Cheaper to gate before the write: declare expectations, evaluate them ALL
in ONE aggregation pass over the input (a single job — each rule lowers to
a conditional aggregate, so 20 rules cost one scan, not 20), and fail the
push before any bytes move.

Usage:
    rules = [NotNull("key"), Unique(["key"]), InRange("score", 0, 1),
             Matches("email", r"@"), RowCountBetween(1000, None)]
    report = validate(df, rules)          # one row per rule, pass/fail
    enforce(df, rules)                    # raises ValidationError on failure
    eng.push(store, df, validations=rules)  # gate wired into the push job
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


class ValidationError(ValueError):
    def __init__(self, failures: list[dict]):
        self.failures = failures
        msgs = "; ".join(
            f"{f['rule']}({f['target']}): {f['detail']}" for f in failures
        )
        super().__init__(f"validation failed: {msgs}")


@dataclass
class NotNull:
    """At most `max_null_frac` of rows may be null in `col`."""

    col: str
    max_null_frac: float = 0.0


@dataclass
class Unique:
    """`cols` must be unique across rows (0 duplicate groups)."""

    cols: list[str]


@dataclass
class InRange:
    """Non-null values of `col` must lie in [lo, hi]; at most
    `max_violation_frac` of rows may violate."""

    col: str
    lo: float | None = None
    hi: float | None = None
    max_violation_frac: float = 0.0


@dataclass
class Matches:
    """Non-null values of `col` must match regex `pattern` (RE2-safe
    subset); at most `max_violation_frac` may violate."""

    col: str
    pattern: str
    max_violation_frac: float = 0.0


@dataclass
class RowCountBetween:
    """Total row count within [lo, hi] (None = unbounded) — catches the
    classic truncated-upstream-extract push."""

    lo: int | None = None
    hi: int | None = None


def validate(df: DataFrame, rules: list) -> list[dict]:
    """Evaluate every rule in ONE aggregation job (plus one distinct-count
    job per Unique rule — those need a shuffle the scalar aggregates
    don't). Returns one dict per rule: {rule, target, ok, detail}."""
    # reject unknown rule types BEFORE the scan: the aggregation loop below
    # skips anything it doesn't recognize, and discovering the typo only in
    # the report loop would waste the full (100 TB) validation pass
    known = (NotNull, Unique, InRange, Matches, RowCountBetween)
    for r in rules:
        if not isinstance(r, known):
            raise TypeError(f"unknown validation rule: {r!r}")
    aggs = [F.count("*").alias("__n")]
    for i, r in enumerate(rules):
        if isinstance(r, NotNull):
            aggs.append(
                F.count(F.when(F.col(r.col).isNull(), 1)).alias(f"__r{i}")
            )
        elif isinstance(r, InRange):
            cond = F.lit(False)
            if r.lo is not None:
                cond = cond | (F.col(r.col) < r.lo)
            if r.hi is not None:
                cond = cond | (F.col(r.col) > r.hi)
            aggs.append(F.count(F.when(cond, 1)).alias(f"__r{i}"))
        elif isinstance(r, Matches):
            aggs.append(
                F.count(
                    F.when(
                        F.col(r.col).isNotNull()
                        & ~F.col(r.col).rlike(r.pattern),
                        1,
                    )
                ).alias(f"__r{i}")
            )
    row = df.agg(*aggs).collect()[0]
    n = row["__n"]

    out: list[dict] = []
    for i, r in enumerate(rules):
        if isinstance(r, NotNull):
            bad = row[f"__r{i}"]
            frac = bad / n if n else 0.0
            out.append(
                {
                    "rule": "NotNull",
                    "target": r.col,
                    "ok": frac <= r.max_null_frac,
                    "detail": f"{bad}/{n} null ({frac:.4f} > {r.max_null_frac})"
                    if frac > r.max_null_frac
                    else f"{bad}/{n} null",
                }
            )
        elif isinstance(r, InRange):
            bad = row[f"__r{i}"]
            frac = bad / n if n else 0.0
            out.append(
                {
                    "rule": "InRange",
                    "target": r.col,
                    "ok": frac <= r.max_violation_frac,
                    "detail": f"{bad}/{n} outside [{r.lo}, {r.hi}]",
                }
            )
        elif isinstance(r, Matches):
            bad = row[f"__r{i}"]
            frac = bad / n if n else 0.0
            out.append(
                {
                    "rule": "Matches",
                    "target": r.col,
                    "ok": frac <= r.max_violation_frac,
                    "detail": f"{bad}/{n} not matching {r.pattern!r}",
                }
            )
        elif isinstance(r, RowCountBetween):
            ok = (r.lo is None or n >= r.lo) and (r.hi is None or n <= r.hi)
            out.append(
                {
                    "rule": "RowCountBetween",
                    "target": "*",
                    "ok": ok,
                    "detail": f"count={n}, bounds=[{r.lo}, {r.hi}]",
                }
            )
        elif isinstance(r, Unique):
            dups = (
                df.groupBy(*r.cols)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .count()
            )
            out.append(
                {
                    "rule": "Unique",
                    "target": ",".join(r.cols),
                    "ok": dups == 0,
                    "detail": "duplicate groups exist" if dups else "unique",
                }
            )
        else:
            raise TypeError(f"unknown validation rule: {r!r}")
    return out


def enforce(df: DataFrame, rules: list) -> list[dict]:
    """validate() and raise ValidationError listing every failed rule."""
    report = validate(df, rules)
    failures = [r for r in report if not r["ok"]]
    if failures:
        raise ValidationError(failures)
    return report
