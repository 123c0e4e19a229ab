"""Pure-Python sequential replay oracle (the "upstream table" analog).

Replays ALL change events into a dict in global
(commit_ts, start_ts, op_order) order — the reference's total event order
(cdc/model/mounter.go:163-186, delete<update<insert at equal ts) — applying
schema casts at each DDL barrier (events AT barrier_ts use the old schema,
cdc/entry/mounter.go:158-160). Identity-changing updates are applied as
delete(old key) + insert(new key) (cdc/model/sink.go:1284-1318).

Deliberately slow and simple: row-at-a-time dict, no Ray, no Arrow compute.
Everything the engine produces is judged against this (SURVEY.md §5).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from .model import OP_DELETE, OP_INSERT, OP_UPDATE
from .stages.schema_evo import SchemaRegistry


def load_base_rows(root: str) -> dict[str, dict]:
    rows: dict[str, dict] = {}
    for f in sorted(glob.glob(os.path.join(root, "base", "part=*", "*.parquet"))):
        t = pq.read_table(f)
        for r in t.to_pylist():
            rows[r["doc_id"]] = r
    return rows


def load_wal_events(root: str, max_watermark: int | None = None) -> list[dict]:
    evs: list[dict] = []
    for f in sorted(glob.glob(os.path.join(root, "wal", "seq=*.parquet"))):
        for r in pq.read_table(f).to_pylist():
            if max_watermark is None or r["commit_ts"] <= max_watermark:
                evs.append(r)
    return evs


def _cast_rows(rows: dict[str, dict], registry: SchemaRegistry,
               from_ver: int, to_ver: int) -> None:
    if from_ver == to_ver:
        return
    if registry.truncated_between(from_ver, to_ver):
        rows.clear()        # TRUNCATE barrier: every pre-truncate row dies
        return
    target = [f.name for f in registry.schema(to_ver)]
    defaults = registry.defaults(to_ver)
    src = {c: registry.source_name(c, from_ver, to_ver) for c in target}
    for doc_id, r in rows.items():
        rows[doc_id] = {c: r.get(src[c], defaults.get(c)) for c in target}


def _image_of(ev: dict, registry: SchemaRegistry, ver: int) -> dict:
    cols = [f.name for f in registry.schema(ver)]
    img = {c: ev.get(c) for c in cols}
    img["doc_id"] = ev["doc_id"]
    return img


def replay(root: str, registry: SchemaRegistry,
           max_watermark: int | None = None,
           collation: str = "binary",
           trust_stamped_ver: bool = True) -> dict[str, dict]:
    """Sequential replay → final table state as {key: row_dict} under the
    schema version in force at max_watermark (or the final version).
    `collation` selects the handle-key comparison form (ci = lower-cased
    dict key); row images keep their own spelling.
    `trust_stamped_ver=False` drops the fixture-consistency assert that
    each event's stamped schema_ver equals the registry walk — required
    when replaying under an error-operator-patched registry
    (stages/handle_error.py), where upstream stamps are stale by
    definition; the walk's cur_ver is authoritative either way."""
    def k(doc_id):
        if collation == "ai_ci":
            import unicodedata
            folded = "".join(
                c for c in unicodedata.normalize("NFKD", doc_id)
                if unicodedata.category(c) != "Mn")
            return folded.lower()
        return doc_id.lower() if collation == "ci" else doc_id

    rows = {k(d): r for d, r in load_base_rows(root).items()}
    events = load_wal_events(root, max_watermark)
    # global total order; doc_id as final key only for cross-doc determinism
    events.sort(key=lambda e: (e["commit_ts"], e["start_ts"], e["op"], e["doc_id"]))

    cur_ver = 1
    barriers = [(d.barrier_ts, d.schema_ver) for d in registry.ddls]

    for ev in events:
        ev_ver = ev["schema_ver"]
        # cross any barrier whose ts < this event's commit_ts
        while barriers and barriers[0][0] < ev["commit_ts"]:
            bts, ver = barriers.pop(0)
            _cast_rows(rows, registry, cur_ver, ver)
            cur_ver = ver
        assert ev_ver == cur_ver or not trust_stamped_ver, (ev, cur_ver)
        op = ev["op"]
        if op == OP_DELETE:
            rows.pop(k(ev["doc_id"]), None)
        elif op == OP_INSERT:
            rows[k(ev["doc_id"])] = _image_of(ev, registry, cur_ver)
        elif op == OP_UPDATE:
            img = _image_of(ev, registry, cur_ver)
            if ev.get("new_doc_id"):
                # identity change: delete old key, insert under new key
                rows.pop(k(ev["doc_id"]), None)
                img["doc_id"] = ev["new_doc_id"]
                rows[k(img["doc_id"])] = img
            else:
                rows[k(ev["doc_id"])] = img
        else:
            raise ValueError(f"bad op {op}")

    # cross remaining barriers at/below the watermark
    for bts, ver in barriers:
        if max_watermark is None or bts <= max_watermark:
            _cast_rows(rows, registry, cur_ver, ver)
            cur_ver = ver
    return rows


def replay_optimistic(base_root: str, shard_wal_dirs: list[str],
                      shard_regs: list[SchemaRegistry],
                      merged_reg: SchemaRegistry,
                      max_watermark: int | None = None) -> dict[str, dict]:
    """Sequential oracle for OPTIMISTIC shard-merge (dm/pkg/shardddl/optimism
    semantics): shards evolve schemas at their own barriers; the target
    follows the synthesized (merged) schedule. An event's image is decoded
    under its shard's OWN version at that ts — a column the merged schema
    already has but the shard has not added yet backfills the merged
    default (deletes carry no image). Independent of the engine's remount
    path: row-at-a-time dict replay, judged against, never derived from."""
    rows = load_base_rows(base_root)
    events: list[tuple[dict, int]] = []
    for si, d in enumerate(shard_wal_dirs):
        for f in sorted(glob.glob(os.path.join(d, "seq=*.parquet"))):
            for r in pq.read_table(f).to_pylist():
                if max_watermark is None or r["commit_ts"] <= max_watermark:
                    events.append((r, si))
    events.sort(key=lambda e: (e[0]["commit_ts"], e[0]["start_ts"],
                               e[0]["op"], e[0]["doc_id"]))

    cur_ver = 1
    barriers = [(d.barrier_ts, d.schema_ver) for d in merged_reg.ddls]

    def image(ev: dict, shard: int) -> dict:
        sreg = shard_regs[shard]
        shard_cols = set(sreg.schema(sreg.version_at(ev["commit_ts"])).names)
        defaults = merged_reg.defaults(cur_ver)
        img = {}
        for f in merged_reg.schema(cur_ver):
            img[f.name] = (ev.get(f.name) if f.name in shard_cols
                           else defaults.get(f.name))
        img["doc_id"] = ev["doc_id"]
        return img

    for ev, shard in events:
        while barriers and barriers[0][0] < ev["commit_ts"]:
            _, ver = barriers.pop(0)
            _cast_rows(rows, merged_reg, cur_ver, ver)
            cur_ver = ver
        op = ev["op"]
        if op == OP_DELETE:
            rows.pop(ev["doc_id"], None)
        elif op == OP_INSERT:
            rows[ev["doc_id"]] = image(ev, shard)
        elif op == OP_UPDATE:
            img = image(ev, shard)
            if ev.get("new_doc_id"):
                rows.pop(ev["doc_id"], None)
                img["doc_id"] = ev["new_doc_id"]
                rows[img["doc_id"]] = img
            else:
                rows[ev["doc_id"]] = img
        else:
            raise ValueError(f"bad op {op}")

    for bts, ver in barriers:
        if max_watermark is None or bts <= max_watermark:
            _cast_rows(rows, merged_reg, cur_ver, ver)
            cur_ver = ver
    return rows


def replay_optimistic_to_table(base_root: str, shard_wal_dirs: list[str],
                               shard_regs: list[SchemaRegistry],
                               merged_reg: SchemaRegistry,
                               max_watermark: int | None = None) -> pa.Table:
    rows = replay_optimistic(base_root, shard_wal_dirs, shard_regs,
                             merged_reg, max_watermark)
    final_ver = (merged_reg.max_ver if max_watermark is None
                 else merged_reg.version_at(max_watermark + 1))
    schema = merged_reg.schema(final_ver)
    out = sorted(rows.values(), key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(out, schema=schema)


def replay_to_table(root: str, registry: SchemaRegistry,
                    max_watermark: int | None = None,
                    collation: str = "binary",
                    trust_stamped_ver: bool = True) -> pa.Table:
    rows = replay(root, registry, max_watermark, collation,
                  trust_stamped_ver)
    final_ver = registry.max_ver if max_watermark is None else registry.version_at(max_watermark + 1)
    schema = registry.schema(final_ver)
    out = sorted(rows.values(), key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(out, schema=schema)
