"""Predicate algebra (R13) — 1:1 with the reference's typed predicate tree
(clients/venice-thin-client/src/main/java/com/linkedin/venice/client/store/predicate/:
Predicate.java, AndPredicate, OrPredicate, AnyOfPredicate, 24 typed
comparison classes, RecordFieldProjectionEqualsPredicate).

Spark-first: each predicate lowers to a Column expression, so Catalyst
pushes it into the parquet scan (check .explain for PushedFilters).
"""

from __future__ import annotations

from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import Column


def and_(*preds: Column) -> Column:
    """Conjunction; empty input is the identity TRUE (matches
    Predicate.and() over zero predicates — select everything)."""
    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def or_(*preds: Column) -> Column:
    """Disjunction; empty input is the identity FALSE (select nothing)."""
    if not preds:
        return F.lit(False)
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def any_of(field: str | Column, *values: Any) -> Column:
    """A None among the values matches NULL fields (the reference's
    predicate tree compares with Objects.equals-style null handling);
    Spark's bare isin would never match NULL under three-valued logic."""
    c = F.col(field) if isinstance(field, str) else field
    nonnull = [v for v in values if v is not None]
    out = c.isin(nonnull) if nonnull else F.lit(False)
    if len(nonnull) != len(values):
        out = out | c.isNull()
    return out


def equal_to(field: str | Column, value: Any) -> Column:
    """Null-safe equality (<=>): equal_to(f, None) selects NULL fields,
    matching Objects.equals semantics; still pushes down to the scan
    (EqualNullSafe is a supported parquet filter)."""
    c = F.col(field) if isinstance(field, str) else field
    return c.eqNullSafe(F.lit(value))


def greater_than(field: str | Column, value: Any) -> Column:
    c = F.col(field) if isinstance(field, str) else field
    return c > F.lit(value)


def greater_or_equals(field: str | Column, value: Any) -> Column:
    c = F.col(field) if isinstance(field, str) else field
    return c >= F.lit(value)


def lower_than(field: str | Column, value: Any) -> Column:
    c = F.col(field) if isinstance(field, str) else field
    return c < F.lit(value)


def lower_or_equals(field: str | Column, value: Any) -> Column:
    c = F.col(field) if isinstance(field, str) else field
    return c <= F.lit(value)
