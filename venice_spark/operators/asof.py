"""As-of join: for each left row, the most recent right row at or before
its timestamp, per key — the point-in-time lookup every feature/training
pipeline needs (label events joined to the latest snapshot/dimension).

Spark has no ASOF JOIN operator; the naive range join explodes to
O(left × right) per key. The scale-safe formulation is the union-tag
trick: interleave both sides sorted by (key, ts), carry the right side's
columns forward with last(ignorenulls) over an unbounded-preceding window,
then keep only left rows. One shuffle on the key, linear work — the same
plan shape as latest-wins compaction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """Left as-of join: output = left columns + `right_cols` from the most
    recent right row with right_ts <= left_ts (or < when inclusive=False),
    same key; NULLs when no right row precedes. Right rows should be unique
    per (key, right_ts) — pre-aggregate otherwise (ambiguous as-of).

    `right_cols` must not already exist on `left` (raises): left rows'
    own values would otherwise be indistinguishable from right-side values
    in the carry-forward. Right values ride in one struct per right row, so
    a right row whose column is NULL still *matches* (the NULL is carried,
    like DuckDB/pandas ASOF) instead of being skipped for an older value.

    NULL semantics match SQL/DuckDB ASOF: right rows with a NULL timestamp
    or a NULL key component never match anything (an ascending window puts
    NULL timestamps FIRST, so unfiltered they would serve as everyone's
    'earliest predecessor'), and a NULL-key left row gets NULL right
    values — NULL never equals NULL."""
    reserved = ("__ats", "__side", "__rvals")
    clash = [c for c in (*right_cols, *reserved) if c in left.columns]
    if clash:
        raise ValueError(
            f"columns {clash} already exist on the left frame "
            f"(right_cols and the internal temps {reserved} are reserved); "
            "rename them first"
        )
    key_ok = F.lit(True)
    for k in key_cols:
        key_ok = key_ok & F.col(k).isNotNull()
    lt = left.withColumn("__ats", F.col(left_ts)).withColumn(
        "__side", F.lit(1 if inclusive else 0)
    )
    rt = right.filter(F.col(right_ts).isNotNull() & key_ok).select(
        *key_cols,
        F.col(right_ts).alias("__ats"),
        F.lit(0 if inclusive else 1).alias("__side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__rvals"),
    )
    both = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__ats", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = both.withColumn("__rvals", F.last("__rvals", ignorenulls=True).over(w))
    # NULL-key left rows share one window partition with the filtered-out
    # NULL-key right rows, so their carry-forward is already NULL — only
    # the field projection remains. ONE select, not a withColumn chain
    # (quadratic plan growth on wide right schemas).
    carried = F.when(key_ok, F.col("__rvals"))
    out = out.select(
        *[c for c in out.columns if c not in ("__rvals",)],
        *[carried.getField(c).alias(c) for c in right_cols],
    )
    return out.filter(F.col("__side") == (1 if inclusive else 0)).drop(
        "__ats", "__side"
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Point-in-interval join without the O(points × intervals) per-key
    blowup: both sides map to coarse time buckets of `bucket_width`
    (intervals explode to every bucket they overlap, points to exactly
    one), the join runs on (key, bucket) equality — hash join, AQE
    skew-split applies — and the exact start <= ts <= end predicate filters
    the survivors. Each (point, interval) pair meets in exactly one bucket
    (the point's), so no dedup is needed.

    Pick bucket_width near the typical interval length: the interval
    explosion factor is len/width + 1, the bucket collision factor is
    width-proportional — the usual space/selectivity tradeoff."""
    p = points.withColumn("__b", F.floor(F.col(ts_col) / bucket_width))
    i = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width),
                F.floor(F.col(end_col) / bucket_width),
            )
        ),
    )
    return (
        p.join(i, on=[*key_cols, "__b"])
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)))
        .drop("__b")
    )
