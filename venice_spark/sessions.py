"""Event sessionization: gap-based session assignment over an event log.

The batch twin of Structured Streaming's session windows
(`F.session_window`), expressed with plain window functions so the same
logic is oracle-checkable and runs on any stored event table:

  new_session = ts - lag(ts) > gap   (per user, ts order)
  session_seq = running sum of new_session

Scale: one shuffle on the user key; the windows are per-user sequential
scans — exactly the access pattern the event table is sorted for. Skewed
users (bots) are the salting candidates; cap session length downstream.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: int,
) -> DataFrame:
    """Assign `session_seq` (0-based per user) to each event: a new session
    starts when the time since the previous event exceeds `gap` (same units
    as ts_col)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    new_s = (
        F.when(F.col(ts_col) - F.lag(ts_col).over(w) > gap, 1)
        .otherwise(0)
    )
    return df.withColumn(
        "session_seq",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: int,
) -> DataFrame:
    """Per-session rollup: event count, start/end, duration."""
    s = sessionize(df, user_col, ts_col, gap)
    return s.groupBy(user_col, "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration"),
    )
