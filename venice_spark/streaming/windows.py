"""Windowed streaming aggregation with watermarked late-data handling.

The reference has NO windowed aggregation (SURVEY §2.5: Venice resolves
late/out-of-order data by DCR timestamps, never by windows) — this module is
a north-star extension: the nearline rollup a training-data pipeline runs
over its event firehose (impressions/actions per key per window) before the
result is pushed into a serving store.

Design (Structured Streaming):
- event-time tumbling/sliding windows via the built-in `window()` expression
  → Spark maintains per-window partial aggregates in the state store, one
  shuffle on (window, keys), map-side partial aggregation before it;
- `withWatermark` bounds state: windows older than the watermark are
  finalized and evicted, and later-arriving rows for them are dropped —
  the explicit, bounded-state trade the reference sidesteps by being
  KV-only (its RT replay keeps per-key state forever; a per-window rollup
  at 100 TB/day cannot);
- `available_now` trigger gives batch-equivalent replays of a bounded log —
  the property pinned by tests: a stream replay of the events table equals
  the batch `groupBy(window(...))` of the same table (when no row is later
  than the watermark relative to the stream's max event time).

At cluster scale the sink is a store partition (foreachBatch into an
incremental push); here the query returns the in-memory/file sink handle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def windowed_rollup(
    events: DataFrame,
    ts_col: str,
    group_cols: list[str],
    agg_exprs: dict[str, str],
    window_duration: str = "1 hour",
    slide_duration: str | None = None,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Event-time windowed aggregation; works on BOTH a streaming and a
    batch DataFrame (the same plan, which is what makes the replay
    equivalence testable).

    agg_exprs: {output_name: SQL aggregate over input columns}, e.g.
    {"n": "count(*)", "total": "sum(value)"}.

    Returns window_start, window_end, *group_cols, *agg outputs.
    """
    from venice_spark.streaming.joins import _event_time

    with_ts = _event_time(events, ts_col, "_event_time")
    if events.isStreaming:
        with_ts = with_ts.withWatermark("_event_time", watermark_delay)
    win = (
        F.window("_event_time", window_duration, slide_duration)
        if slide_duration
        else F.window("_event_time", window_duration)
    )
    aggs = [F.expr(sql).alias(name) for name, sql in agg_exprs.items()]
    out = with_ts.groupBy(win.alias("_w"), *group_cols).agg(*aggs)
    return out.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        *group_cols,
        *[F.col(n) for n in agg_exprs],
    )


def run_rollup_to_sink(
    rollup: DataFrame,
    checkpoint_dir: str,
    sink_dir: str,
    available_now: bool = True,
):
    """Drive a streaming rollup into a parquet sink in append mode (only
    watermark-finalized windows are emitted — each window is written exactly
    once, so the sink is safe to incremental-push into a serving store).
    Returns the StreamingQuery; caller awaits termination."""
    writer = (
        rollup.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def session_rollup(
    events: DataFrame,
    ts_col: str,
    group_cols: list[str],
    agg_exprs: dict[str, str],
    gap_duration: str = "30 minutes",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows (the streaming twin of sessions.sessionize,
    which is the batch lag-over-window formulation): a session closes when
    no event arrives for `gap_duration`. Built on `session_window`, whose
    state store merges overlapping candidate sessions per key; the watermark
    finalizes sessions whose end precedes it, so state stays bounded by the
    live-session population rather than history.

    Returns session_start, session_end, *group_cols, *agg outputs.
    """
    from venice_spark.streaming.joins import _event_time

    with_ts = _event_time(events, ts_col, "_event_time")
    if events.isStreaming:
        with_ts = with_ts.withWatermark("_event_time", watermark_delay)
    aggs = [F.expr(sql).alias(name) for name, sql in agg_exprs.items()]
    out = with_ts.groupBy(
        F.session_window("_event_time", gap_duration).alias("_w"), *group_cols
    ).agg(*aggs)
    return out.select(
        F.col("_w.start").alias("session_start"),
        F.col("_w.end").alias("session_end"),
        *group_cols,
        *[F.col(n) for n in agg_exprs],
    )


def run_rollup_to_store(
    rollup: DataFrame,
    engine,
    store: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Drive a streaming rollup INTO a store: each micro-batch of
    watermark-finalized windows is applied as an incremental push, so the
    serving table always holds every closed window exactly once and swaps
    atomically per batch. Append mode guarantees a window appears in
    exactly one batch — the push never overwrites a previously-served
    window with partial data. The store's key fields must equal the
    rollup's (window/session start + group columns)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # a fresh store has no current version yet — incremental_push
        # requires one, so the first non-empty batch bootstraps with a
        # full push (same guard as corpus.run_corpus_ingest_to_store)
        if engine.catalog.current_version(store) == 0:
            engine.push(store, batch_df, allow_duplicate_key=True)
        else:
            engine.incremental_push(store, batch_df)

    writer = (
        rollup.writeStream.outputMode("append")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
