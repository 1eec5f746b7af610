"""Write-compute: partial-update construction and application (W3-W6).

Reference model: each value schema gets a derived "write compute" schema —
per-field union of NoOp | newValue, plus ListOps{setUnion,setDiff} for
arrays and MapOps{mapUnion,mapDiff} for maps
(schema/writecompute/WriteComputeSchemaConverter.java:43-120,
WriteComputeOperation.java:23-66); updates are applied field-wise onto the
stored record (WriteComputeHandlerV1.java:27-).

Spark-first mapping: an *update DataFrame* carries, per value field `f`:
    set_<f>       nullable column — NULL means NoOp, else overwrite
    add_<f>       array column  — elements to add   (list setUnion)
    rem_<f>       array column  — elements to remove (list setDiff)
    mapadd_<f>    map column    — entries to add/overwrite (mapUnion)
    maprem_<f>    array column  — keys to remove            (mapDiff)

`apply_update_columns` merges one update row per key onto the base with pure
Column expressions (no UDF, stays in whole-stage codegen); multi-update logs
are folded with `apply_update_log`, which reduces updates per key in
timestamp order before a single merge join.

Semantics notes:
  - list fields behave as *sorted sets* after union/diff (the reference
    dedups on setUnion; we additionally canonicalize order so results are
    deterministic for oracle comparison — documented deviation from
    insertion-ordered lists).
  - mapUnion: update entries win over existing keys
  - scalar set: coalesce(update, old) == NoOp-preserving overwrite
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


@dataclass
class UpdateBuilder:
    """Imperative builder mirroring
    internal/venice-common/.../writer/update/UpdateBuilder.java:33-81.
    Produces a dict suitable for spark.createDataFrame rows."""

    key: dict
    ts: int = 0
    _row: dict = dc_field(default_factory=dict)

    def set_field(self, name: str, value) -> "UpdateBuilder":
        self._row[f"set_{name}"] = value
        return self

    def add_to_list(self, name: str, *elems) -> "UpdateBuilder":
        self._row.setdefault(f"add_{name}", []).extend(elems)
        return self

    def remove_from_list(self, name: str, *elems) -> "UpdateBuilder":
        self._row.setdefault(f"rem_{name}", []).extend(elems)
        return self

    def put_map_entries(self, name: str, entries: dict) -> "UpdateBuilder":
        self._row.setdefault(f"mapadd_{name}", {}).update(entries)
        return self

    def remove_map_keys(self, name: str, *keys) -> "UpdateBuilder":
        self._row.setdefault(f"maprem_{name}", []).extend(keys)
        return self

    def build(self) -> dict:
        return {**self.key, "ts": self.ts, **self._row}


# ---- expression library ----

def merged_scalar(old: Column, set_col: Column | None) -> Column:
    """W3 setNewFieldValue: NULL update = NoOp."""
    if set_col is None:
        return old
    return F.coalesce(set_col, old)


def merged_list(old: Column, add_col: Column | None, rem_col: Column | None) -> Column:
    """W4 setUnion + W5 setDiff as a sorted set.

    Typed empty arrays are built as array_except(x, x) so the expression works
    for any element type without schema introspection."""
    cands = [c for c in (old, add_col, rem_col) if c is not None]
    any_arr = F.coalesce(*cands) if len(cands) > 1 else cands[0]
    empty = F.array_except(any_arr, any_arr)
    out = F.coalesce(old, empty)
    if add_col is not None:
        out = F.concat(out, F.coalesce(add_col, empty))
    if rem_col is not None:
        out = F.array_except(out, F.coalesce(rem_col, empty))
    return F.array_sort(F.array_distinct(out))


def merged_map(old: Column, mapadd: Column | None, maprem: Column | None) -> Column:
    """W6 mapUnion (update wins per key) + mapDiff (drop keys)."""
    cands = [c for c in (old, mapadd) if c is not None]
    any_map = F.coalesce(*cands) if len(cands) > 1 else cands[0]
    empty = F.map_filter(any_map, lambda k, v: F.lit(False))
    out = F.coalesce(old, empty)
    if mapadd is not None:
        add = F.coalesce(mapadd, empty)
        kept = F.map_filter(out, lambda k, _: ~F.map_contains_key(add, k))
        out = F.map_concat(kept, add)
    if maprem is not None:
        out = F.when(maprem.isNull(), out).otherwise(
            F.map_filter(out, lambda k, _: ~F.array_contains(maprem, k))
        )
    return out


@dataclass
class FieldSpec:
    name: str
    kind: str = "scalar"  # scalar | list | map


def apply_update_columns(
    base: DataFrame,
    updates: DataFrame,
    key_fields: list[str],
    fields: list[FieldSpec],
) -> DataFrame:
    """Merge one update row per key onto base. Updates for absent keys insert
    new rows (upsert); base rows without updates pass through."""
    joined = base.alias("b").join(updates.alias("u"), on=key_fields, how="full_outer")
    cols: list[Column] = [F.col(k) for k in key_fields]
    for f_ in fields:
        old = F.col(f"b.{f_.name}")
        if f_.kind == "scalar":
            c = merged_scalar(old, _opt(updates, f"set_{f_.name}"))
        elif f_.kind == "list":
            c = merged_list(old, _opt(updates, f"add_{f_.name}"), _opt(updates, f"rem_{f_.name}"))
        elif f_.kind == "map":
            c = merged_map(old, _opt(updates, f"mapadd_{f_.name}"), _opt(updates, f"maprem_{f_.name}"))
        else:  # pragma: no cover
            raise ValueError(f_.kind)
        cols.append(c.alias(f_.name))
    return joined.select(*cols)


def _opt(updates: DataFrame, name: str) -> Column | None:
    return F.col(f"u.{name}") if name in updates.columns else None


def apply_update_log(
    base: DataFrame,
    update_log: DataFrame,
    key_fields: list[str],
    fields: list[FieldSpec],
    ts_col: str = "ts",
) -> DataFrame:
    """Fold a multi-row update log (per-key, ts-ascending) down to one
    effective update per key with aggregate expressions, then apply once.

    Reduction rules per key (matching sequential application):
      set_f     -> last non-null set wins (max_by over ts)
      add_f     -> union of all adds minus later removes is NOT order-free in
                   general; for set semantics (dedup) the fold reduces to:
                   adds = all added elements whose last op wasn't a remove,
                   rems = all removed elements whose last op wasn't an add.
    We compute per-element last-op with explode + window — one shuffle on
    (key, element), scale-safe for 100 TB logs.
    """
    reduced = None
    scalar_aggs = []
    for f_ in fields:
        set_c = f"set_{f_.name}"
        if f_.kind == "scalar" and set_c in update_log.columns:
            # last non-NoOp set wins: max_by over ts restricted to non-null sets
            scalar_aggs.append(
                F.max_by(
                    F.col(set_c),
                    F.when(F.col(set_c).isNotNull(), F.col(ts_col)),
                ).alias(set_c)
            )
    if scalar_aggs:
        reduced = update_log.groupBy(*key_fields).agg(*scalar_aggs)

    elem_frames = []
    for f_ in fields:
        if f_.kind != "list":
            continue
        add_c, rem_c = f"add_{f_.name}", f"rem_{f_.name}"
        ops = []
        if add_c in update_log.columns:
            ops.append(
                update_log.select(
                    *key_fields, ts_col, F.explode_outer(add_c).alias("elem")
                ).withColumn("op", F.lit("add"))
            )
        if rem_c in update_log.columns:
            ops.append(
                update_log.select(
                    *key_fields, ts_col, F.explode_outer(rem_c).alias("elem")
                ).withColumn("op", F.lit("rem"))
            )
        if not ops:
            continue
        all_ops = ops[0]
        for o in ops[1:]:
            all_ops = all_ops.unionByName(o)
        we = Window.partitionBy(*key_fields, "elem").orderBy(F.col(ts_col).desc())
        last = (
            all_ops.filter(F.col("elem").isNotNull())
            .withColumn("__rn", F.row_number().over(we))
            .filter(F.col("__rn") == 1)
        )
        folded = last.groupBy(*key_fields).agg(
            F.array_sort(
                F.collect_list(F.when(F.col("op") == "add", F.col("elem")))
            ).alias(add_c),
            F.array_sort(
                F.collect_list(F.when(F.col("op") == "rem", F.col("elem")))
            ).alias(rem_c),
        )
        elem_frames.append(folded)

    eff = reduced
    for fr in elem_frames:
        eff = fr if eff is None else eff.join(fr, on=key_fields, how="full_outer")
    if eff is None:
        return base
    return apply_update_columns(base, eff, key_fields, fields)
