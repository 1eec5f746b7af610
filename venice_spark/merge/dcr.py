"""Timestamp-based deterministic conflict resolution (W7) — the
active-active merge kernel.

Reference semantics (re-derived from the documented contract, not ported):
  - Merge.java:27-38 — determinism contract: the final state must be
    identical for ANY arrival order of the same set of operations.
  - AbstractMerge.java:17-80 — record-level rules: higher timestamp wins;
    on a timestamp tie DELETE beats PUT ("delete wins ties"); PUT vs PUT
    ties resolve by deterministic value comparison.
  - MergeConflictResolver.java:45-751 — field-level path: per-field
    timestamps; an UPDATE touches only its fields.
  - CollectionRmdTimestamp / SortBasedCollectionFieldOpHandler — collections
    merge per-element with observed-remove semantics (active element
    timestamps + deleted-element tombstone timestamps) layered under
    whole-collection puts.

Design: everything is a *pointwise max over a total order*, which makes the
fold commutative and associative by construction — determinism is then a
theorem, not a hope (property-tested with shuffled arrival orders anyway):

  op tuple  T = (ts, kind, value_rank, colo)   kind: DELETE/remove=1 > PUT/add=0
  - each scalar field keeps the max of its set/put ops and the record delete
    ops; field exists iff the max is a put/set.
  - each collection keeps (a) the max whole-collection op (PUT of the full
    collection, or record DELETE == PUT of empty) and (b) per element the
    max add/remove op. An element is present iff:
      * its element op out-ties the whole op -> present iff it's an add
      * otherwise -> present iff the whole op contains it.

Spark application: `merge_op_log` groups the op log by key and folds each
group in an `applyInPandas` stage — one shuffle on the key, bounded per-key
state. Python is justified here: genuinely imperative per-record logic with
no Catalyst equivalent (SURVEY §4 custom-work item 1).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from typing import Any

PUT_KIND = 0
DELETE_KIND = 1


def _rank(value: Any) -> str:
    """Deterministic total-order key for tie-breaking equal timestamps —
    the moral equivalent of the reference's byte-wise value comparison
    (MergeByteBuffer.java): canonical JSON, larger wins."""
    return json.dumps(value, sort_keys=True, default=str)


def _tuple(ts: int, kind: int, value: Any, colo: int) -> tuple:
    return (ts, kind, _rank(value), colo)


@dataclass
class _Reg:
    """Last-writer-wins register: keeps the max op tuple + its payload."""

    t: tuple | None = None
    value: Any = None

    def offer(self, t: tuple, value: Any = None) -> None:
        if self.t is None or t > self.t:
            self.t, self.value = t, value

    @property
    def is_put(self) -> bool:
        return self.t is not None and self.t[1] == PUT_KIND


@dataclass
class CollectionState:
    """Whole-collection LWW register + per-element LWW registers."""

    whole: _Reg = dc_field(default_factory=_Reg)  # value: list | dict
    elems: dict = dc_field(default_factory=dict)  # elem identity -> _Reg(value=entry val)
    is_map: bool = False

    def put_whole(self, collection, ts: int, colo: int) -> None:
        self.whole.offer(_tuple(ts, PUT_KIND, collection, colo), collection)

    def delete_whole(self, ts: int, colo: int) -> None:
        self.whole.offer(_tuple(ts, DELETE_KIND, None, colo), None)

    def add(self, elem, val, ts: int, colo: int) -> None:
        self.elems.setdefault(elem, _Reg()).offer(_tuple(ts, PUT_KIND, val, colo), val)

    def remove(self, elem, ts: int, colo: int) -> None:
        self.elems.setdefault(elem, _Reg()).offer(_tuple(ts, DELETE_KIND, None, colo), None)

    def _present(self) -> dict:
        base = self.whole.value if self.whole.is_put else ([] if not self.is_map else {})
        base_items = dict(base) if self.is_map else {e: None for e in (base or [])}
        whole_t = self.whole.t
        out = {}
        for e, v in base_items.items():
            # element survives unless an element op out-ties the whole op AND
            # that op is a remove (or overwrites the value for maps)
            reg = self.elems.get(e)
            if reg is not None and whole_t is not None and reg.t > whole_t:
                if reg.is_put:
                    out[e] = reg.value
                # else removed
            else:
                out[e] = v
        for e, reg in self.elems.items():
            if e in out:
                continue
            if (whole_t is None or reg.t > whole_t) and reg.is_put:
                out[e] = reg.value
        return out

    def as_list(self) -> list:
        return sorted(self._present().keys(), key=_rank)

    def as_map(self) -> dict:
        return dict(sorted(self._present().items(), key=lambda kv: _rank(kv[0])))

    def has_elements(self) -> bool:
        return bool(self._present())


@dataclass
class RecordState:
    """Per-key merge state: per-field LWW registers + collection states."""

    scalars: dict = dc_field(default_factory=dict)  # name -> _Reg
    collections: dict = dc_field(default_factory=dict)  # name -> CollectionState

    def _scalar(self, name: str) -> _Reg:
        return self.scalars.setdefault(name, _Reg())

    def _coll(self, name: str, is_map: bool) -> CollectionState:
        cs = self.collections.setdefault(name, CollectionState(is_map=is_map))
        cs.is_map = cs.is_map or is_map
        return cs

    def apply_put(self, value: dict, ts: int, colo: int, list_fields: set, map_fields: set) -> None:
        for name, v in value.items():
            if name in list_fields:
                self._coll(name, False).put_whole(list(v or []), ts, colo)
            elif name in map_fields:
                self._coll(name, True).put_whole(dict(v or {}), ts, colo)
            else:
                self._scalar(name).offer(_tuple(ts, PUT_KIND, v, colo), v)

    def apply_delete(self, ts: int, colo: int) -> None:
        t = _tuple(ts, DELETE_KIND, None, colo)
        for reg in self.scalars.values():
            reg.offer(t)
        for cs in self.collections.values():
            cs.delete_whole(ts, colo)
        # a delete must also dominate fields it hasn't seen yet: record it
        self._scalar("__record__").offer(t)

    def apply_update(self, update: dict, ts: int, colo: int) -> None:
        for k, v in update.items():
            if v is None:
                continue
            if k.startswith("set_"):
                self._scalar(k[4:]).offer(_tuple(ts, PUT_KIND, v, colo), v)
            elif k.startswith("add_"):
                cs = self._coll(k[4:], False)
                for e in v:
                    cs.add(e, None, ts, colo)
            elif k.startswith("rem_"):
                cs = self._coll(k[4:], False)
                for e in v:
                    cs.remove(e, ts, colo)
            elif k.startswith("mapadd_"):
                cs = self._coll(k[7:], True)
                for ek, ev in v.items():
                    cs.add(ek, ev, ts, colo)
            elif k.startswith("maprem_"):
                cs = self._coll(k[7:], True)
                for ek in v:
                    cs.remove(ek, ts, colo)

    def finalize(self, list_fields: set, map_fields: set) -> dict | None:
        """Final record, or None when deleted. The record-level tombstone
        (max delete op) suppresses any scalar/collection state it dominates."""
        tomb = self.scalars.get("__record__")
        tomb_t = tomb.t if tomb is not None else None
        out = {}
        alive = False
        for name, reg in self.scalars.items():
            if name == "__record__":
                continue
            t = reg.t
            if t is None or not reg.is_put:
                continue
            if tomb_t is not None and t <= tomb_t:
                continue
            out[name] = reg.value
            alive = True
        for name, cs in self.collections.items():
            if tomb_t is not None and (cs.whole.t is None or cs.whole.t < tomb_t):
                cs.delete_whole(tomb_t[0], tomb_t[3])
            present = cs.has_elements()
            out[name] = cs.as_map() if (cs.is_map or name in map_fields) else cs.as_list()
            alive = alive or present
        return out if alive else None


def merge_ops(
    ops: list[dict],
    list_fields: set[str] | None = None,
    map_fields: set[str] | None = None,
) -> dict | None:
    """Fold an op list (ANY order) to the final record, or None if deleted."""
    list_fields = list_fields or set()
    map_fields = map_fields or set()
    st = RecordState()
    for op in ops:
        kind = op["op"]
        ts, colo = int(op["ts"]), int(op.get("colo", 0))
        if kind == "PUT":
            st.apply_put(op["value"], ts, colo, list_fields, map_fields)
        elif kind == "DELETE":
            st.apply_delete(ts, colo)
        elif kind == "UPDATE":
            st.apply_update(op["update"], ts, colo)
        else:  # pragma: no cover
            raise ValueError(kind)
    return st.finalize(list_fields, map_fields)


def merge_op_log(
    op_log,
    key_fields: list[str],
    output_schema: str,
    list_fields: set[str] | None = None,
    map_fields: set[str] | None = None,
):
    """Batch DCR over a Spark op-log DataFrame: one shuffle on the key, fold
    per key with the commutative kernel, deleted keys emit no row.

    op_log columns: key_fields + op + ts + colo + one column per value field
    (for PUT rows) and/or update columns set_/add_/rem_/mapadd_/maprem_
    (for UPDATE rows).
    """
    import pandas as pd

    non_key = [c for c in op_log.columns if c not in key_fields + ["op", "ts", "colo"]]
    value_cols = [c for c in non_key if not _is_update_col(c)]
    lf = set(list_fields or set())
    mf = set(map_fields or set())

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = {k: pdf.iloc[0][k] for k in key_fields}
        ops = []
        for _, row in pdf.iterrows():
            kind = row["op"]
            colo = row["colo"] if "colo" in row else 0
            if kind == "PUT":
                value = {c: _from_pandas(row[c]) for c in value_cols}
                ops.append({"op": "PUT", "ts": row["ts"], "colo": colo, "value": value})
            elif kind == "DELETE":
                ops.append({"op": "DELETE", "ts": row["ts"], "colo": colo})
            else:
                update = {c: _from_pandas(row[c]) for c in non_key if _is_update_col(c)}
                ops.append({"op": "UPDATE", "ts": row["ts"], "colo": colo, "update": update})
        merged = merge_ops(ops, lf, mf)
        if merged is None:
            return pd.DataFrame(columns=list(keys) + value_cols)
        return pd.DataFrame([{**keys, **{c: merged.get(c) for c in value_cols}}])

    return op_log.groupBy(*key_fields).applyInPandas(fold, schema=output_schema)


def _is_update_col(c: str) -> bool:
    return c.startswith(("set_", "add_", "rem_", "mapadd_", "maprem_"))


def _from_pandas(v):
    import numpy as np

    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, dict):
        return dict(v)
    if v is None:
        return None
    if isinstance(v, float) and v != v:  # NaN -> missing
        return None
    return v


# ---- state serialization (for streaming DCR: state rides in GroupState) ----

def _reg_to_dict(r: _Reg) -> dict:
    return {"t": list(r.t) if r.t is not None else None, "value": r.value}


def _reg_from_dict(d: dict) -> _Reg:
    return _Reg(t=tuple(d["t"]) if d["t"] is not None else None, value=d["value"])


def record_state_to_json(st: RecordState) -> str:
    return json.dumps(
        {
            "scalars": {k: _reg_to_dict(r) for k, r in st.scalars.items()},
            "collections": {
                k: {
                    "whole": _reg_to_dict(cs.whole),
                    "elems": [[e, _reg_to_dict(r)] for e, r in cs.elems.items()],
                    "is_map": cs.is_map,
                }
                for k, cs in st.collections.items()
            },
        },
        default=str,
    )


def record_state_from_json(s: str) -> RecordState:
    d = json.loads(s)
    st = RecordState()
    st.scalars = {k: _reg_from_dict(r) for k, r in d["scalars"].items()}
    for k, cd in d["collections"].items():
        cs = CollectionState(is_map=cd["is_map"])
        cs.whole = _reg_from_dict(cd["whole"])
        # JSON turns list elements into lists; element identities are
        # scalars in practice (strings/numbers) so this round-trips exactly
        cs.elems = {e if not isinstance(e, list) else tuple(e): _reg_from_dict(r) for e, r in cd["elems"]}
        st.collections[k] = cs
    return st
