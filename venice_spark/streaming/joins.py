"""Stream-stream event-time joins — the nearline edition of the batch
range join (operators/asof.range_join).

The canonical shape is attribution: every event within a time window after
an anchor event of the same key (purchase -> views within the next hour).
Structured Streaming executes this as a watermarked stream-stream inner
join: both sides buffer state only inside their watermark horizons, and the
event-time range condition lets Spark expire buffered rows deterministically
— bounded state for an unbounded firehose, the property a 100 TB/day
pipeline needs.

Venice itself has no joins (SURVEY §2.7) — north-star extension, same
family as streaming/windows.py. Batch/stream parity is the test contract:
the same call on batch frames must produce exactly the rows of
range_join's oracle-checked output.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _event_time(df: DataFrame, ts_col: str, out: str) -> DataFrame:
    """Shared epoch-nanos-long -> timestamp convention (also used by
    windows.py and corpus.py — keep the conversion in ONE place)."""
    ts = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) in ("bigint", "long"):
        # epoch-nanos long (the events-table convention) -> timestamp.
        # INTEGER division: `/` on bigints is double division, and nano
        # timestamps (~1.7e18) exceed double's 53-bit mantissa — the
        # rounded quotient can be off by ±1 µs, moving boundary events
        # across windows/join edges (code-review r4)
        ts = F.timestamp_micros(F.expr(f"`{ts_col}` div 1000"))
    return df.withColumn(out, ts)


def attribution_join(
    probes: DataFrame,
    anchors: DataFrame,
    key_cols: list[str],
    probe_ts: str,
    anchor_ts: str,
    window_seconds: int,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Inner-join each probe event to every anchor of the same key whose
    event time precedes it by at most `window_seconds` (anchor <= probe <=
    anchor + window). Works on two streams (watermarked stream-stream join,
    state bounded by watermark + range), a stream and a static frame, or
    two batch frames (plain range predicate — the plan range_join also
    produces).

    Column conventions: probe columns keep their names; anchor columns are
    prefixed `anchor_`. Returns probes ⋈ anchors with both event times.
    """
    p = _event_time(probes, probe_ts, "_p_time")
    a = _event_time(anchors, anchor_ts, "_a_time")
    if p.isStreaming:
        p = p.withWatermark("_p_time", watermark_delay)
    if a.isStreaming:
        a = a.withWatermark("_a_time", watermark_delay)
    a = a.select(
        *[F.col(k).alias(f"anchor_{k}") for k in key_cols],
        *[
            F.col(c).alias(f"anchor_{c}")
            for c in a.columns
            if c not in key_cols and c != "_a_time"
        ],
        F.col("_a_time"),
    )
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(k) == F.col(f"anchor_{k}"))
    cond = (
        cond
        & (F.col("_p_time") >= F.col("_a_time"))
        & (F.col("_p_time") <= F.col("_a_time") + F.expr(f"INTERVAL {window_seconds} SECOND"))
    )
    joined = p.join(a, cond, "inner")
    return joined.drop(*[f"anchor_{k}" for k in key_cols])
