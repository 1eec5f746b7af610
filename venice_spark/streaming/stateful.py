"""Custom stateful streaming operators via applyInPandasWithState.

The foreachBatch path in hybrid.py rewrites the serving table per
micro-batch — correct, but at 100 TB the per-batch merge touches the full
table. This module keeps the *current value per key* as streaming state
instead, so each micro-batch only shuffles its own rows to their key's
state partition and emits the keys whose resolved value changed — the
moral equivalent of the reference's leader ingestion keeping resolved
records in RocksDB while producing deltas downstream
(clients/da-vinci-client/.../kafka/consumer/ActiveActiveStoreIngestionTask.java:615,640).

Semantics match hybrid.latest_wins / merge.dcr: per-key highest (ts,
tiebreak) wins, DELETE tombstones drop the key (kept in state so a stale
put can't resurrect it), and arrival order is irrelevant by design
(Merge.java:27-31 determinism contract).

State bounding: by default state (including DELETE tombstones, which are
deliberately retained so stale puts cannot resurrect keys) lives forever —
correct, but unbounded on key-churning streams. Pass `state_ttl_minutes`
to expire idle keys via a processing-time timeout (code-review r4): an
expired key forgets its tombstone, so choose a TTL beyond the maximum
expected op lateness — the same trade a watermark makes.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def latest_wins_stateful(
    updates,
    key_fields: list[str],
    value_schema: T.StructType,
    ts_col: str = "ts",
    op_col: str = "op",
    state_ttl_minutes: int | None = None,
):
    """Streaming latest-wins resolution with per-key state.

    `updates` is a streaming DataFrame of put/delete rows (key fields +
    value fields + ts + op). Output stream: one row per key per trigger
    *when its resolved value changed*, with the resolved value columns —
    i.e. the store's change stream, deduplicated and conflict-resolved.

    State per key: (ts, is_delete, value fields) — O(1) per key, no
    history. A DELETE with ts >= current wins and is remembered; a PUT
    older than the stored ts (or than a stored tombstone) is dropped.
    """
    val_fields = [f.name for f in value_schema.fields if f.name not in key_fields]
    out_schema = T.StructType(
        [f for f in value_schema.fields]
        + [T.StructField(ts_col, T.LongType(), False)]
    )
    state_schema = T.StructType(
        [T.StructField("ts", T.LongType(), False), T.StructField("deleted", T.BooleanType(), False)]
        + [f for f in value_schema.fields if f.name in val_fields]
    )

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state_ttl_minutes is not None:
            if state.hasTimedOut:
                state.remove()
                return
            state.setTimeoutDuration(state_ttl_minutes * 60_000)
        if state.exists:
            st = dict(zip([f.name for f in state_schema.fields], state.get))
        else:
            st = None
        changed = False
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="stable")
            for row in pdf.itertuples(index=False):
                r = row._asdict()
                ts = int(r[ts_col])
                is_del = op_col in r and r[op_col] == "DELETE"
                if st is not None:
                    # delete wins ties (AbstractMerge.java:48-66); puts must
                    # strictly beat a tombstone's ts to resurrect
                    if is_del:
                        if ts < st["ts"]:
                            continue
                    else:
                        if ts < st["ts"] or (ts == st["ts"] and st["deleted"]):
                            continue
                        if ts == st["ts"]:
                            # PUT vs PUT ts tie: deterministic value-rank
                            # tiebreak (same total order as merge/dcr._rank,
                            # AbstractMerge.java:17-80 compareAndReturn) so
                            # the winner is arrival-order independent
                            from venice_spark.merge.dcr import _rank

                            new_v = {f: r.get(f) for f in val_fields}
                            old_v = {f: st.get(f) for f in val_fields}
                            if _rank(new_v) <= _rank(old_v):
                                continue
                st = {
                    "ts": ts,
                    "deleted": is_del,
                    **{f: r.get(f) for f in val_fields},
                }
                changed = True
        if changed:
            state.update(tuple(st[f.name] for f in state_schema.fields))
            if not st["deleted"]:
                yield pd.DataFrame(
                    [
                        {
                            **dict(zip(key_fields, key)),
                            **{f: st[f] for f in val_fields},
                            ts_col: st["ts"],
                        }
                    ]
                )

    return updates.groupBy(*key_fields).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl_minutes is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def dcr_stateful(
    updates,
    key_fields: list[str],
    value_schema: T.StructType,
    list_fields: set | None = None,
    map_fields: set | None = None,
    ts_col: str = "ts",
    op_col: str = "op",
    state_ttl_minutes: int | None = None,
):
    """Streaming active-active DCR: the full field-level merge kernel
    (merge/dcr.py — per-field timestamps, collection element registers,
    delete-wins-ties, deterministic tie-break) with per-key state carried
    across triggers as serialized RecordState. This is the leader-ingestion
    loop of the reference (ActiveActiveStoreIngestionTask.java:615,640:
    read stored value+RMD, resolve, produce resolved record) as a
    Structured Streaming operator.

    `updates` rows: key fields + op (PUT/DELETE/UPDATE) + ts + colo + value
    columns (PUT) and/or set_/add_/rem_/mapadd_/maprem_ columns (UPDATE).
    Output: one resolved row per key per trigger in which its state
    changed; deleted keys emit no row (tombstone stays in state so stale
    ops cannot resurrect)."""
    from venice_spark.merge.dcr import (
        RecordState,
        _is_update_col,
        apply_pdf,
        record_state_from_json,
        record_state_to_json,
    )

    lf = set(list_fields or set())
    mf = set(map_fields or set())
    val_fields = [f.name for f in value_schema.fields if f.name not in key_fields]
    out_schema = T.StructType(list(value_schema.fields))
    state_schema = T.StructType([T.StructField("state_json", T.StringType(), True)])

    def fold(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state_ttl_minutes is not None:
            if state.hasTimedOut:
                state.remove()
                return
            state.setTimeoutDuration(state_ttl_minutes * 60_000)
        before_json = state.get[0] if state.exists and state.get[0] else None
        st = record_state_from_json(before_json) if before_json else RecordState()
        saw = False
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            saw = True
            vcols = [c for c in pdf.columns if c in val_fields and not _is_update_col(c)]
            ucols = [c for c in pdf.columns if _is_update_col(c)]
            apply_pdf(st, pdf, vcols, ucols, lf, mf, op_col=op_col, ts_col=ts_col)
        if saw:
            after_json = record_state_to_json(st)
            # emit (and rewrite state) only when the resolved state actually
            # CHANGED — the documented contract. A replay of stale ops used
            # to re-emit every touched key each trigger, turning N stale
            # rows into N spurious downstream store writes (code-review r4).
            if after_json == before_json:
                return
            state.update((after_json,))
            merged = st.finalize(lf, mf)
            if merged is not None:
                yield pd.DataFrame(
                    [{**dict(zip(key_fields, key)), **{c: merged.get(c) for c in val_fields}}]
                )

    return updates.groupBy(*key_fields).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl_minutes is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
