"""DM error-operator handling — dmctl `binlog skip | replace | inject |
list | revert` (dm/syncer/handle_error.go + the streamer controller's
per-position operator store).

DM's shape: when a DDL fails downstream, the operator registers a
patch at that binlog position — skip it, replace it with corrected
SQL(s), or inject extra DDL(s); `list` shows pending operators and
`revert` removes one; operators behind the flushed checkpoint are
outdated and dropped (handle_error.go:54, streamerController
RemoveOutdated). The stream applies the operator when it reaches the
position.

Ray-Data-first re-expression: the position is a DDL barrier_ts; the
operator store is a durable `_error_ops.json` next to the WAL's
ddl.json, and `load_registry` applies it when (re)building the
schedule — so a `tail_replay` loop picks a freshly-registered operator
up on its next iteration, exactly like dmctl against a running task.
Patching happens at the RAW spec level (before SchemaRegistry
validation), because the whole point is to get past a schedule the
engine cannot execute; schema versions are renumbered after the patch
(only not-yet-applied epochs see them — outdated operators are
refused).

A skipped DDL keeps its barrier (version++ with no schema change — the
epoch still cuts exactly at the reference's barrier-ts) via the
`skipped_by_operator` ddl_type, and the skip is visible in `list` and
in the registry itself, never silent.
"""

from __future__ import annotations

import json
import os

from .schema_evo import OPERATOR_SKIP_DDL as SKIP_TYPE

OPS_FILE = "_error_ops.json"


def _ops_path(wal_dir: str) -> str:
    return os.path.join(wal_dir, OPS_FILE)


def _key(at_ts: int, table: str | None) -> str:
    """Operator-store key: positions are per (table, barrier_ts) in a
    multi-table changefeed, plain barrier_ts in a single-table one."""
    return f"{table}@{at_ts}" if table else str(at_ts)


def _key_ts(k: str) -> int:
    return int(k.rsplit("@", 1)[-1])


def _key_table(k: str) -> str | None:
    return k.rsplit("@", 1)[0] if "@" in k else None


def load_ops(wal_dir: str) -> dict[str, dict]:
    p = _ops_path(wal_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def _write_ops(wal_dir: str, ops: dict[str, dict]) -> None:
    p = _ops_path(wal_dir)
    tmp = f"{p}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(ops, f, indent=1)
    os.replace(tmp, p)


def handle_error(wal_dir: str, op: str, at_ts: int | None = None,
                 ddls: list[dict] | None = None,
                 lake_dir: str | None = None,
                 table: str | None = None):
    """Register / inspect / remove an error operator (the dmctl verbs).

    op: "skip" | "replace" | "inject" | "list" | "revert".
    `ddls`: replacement/injection specs, each
    {"ddl_type": ..., "column": ..., "default": ...} (schema_ver is
    assigned by renumbering — positions own versions, operators don't).
    `table`: scopes the operator to one table of a multi-table
    changefeed (tables.json schedules); None targets the single-table
    ddl.json schedule.
    `lake_dir`: when given, the lake's committed watermark is the
    flushed checkpoint — operators at/behind it are outdated: existing
    ones are swept, and registering a new one there is refused
    (handle_error.go RemoveOutdated semantics)."""
    assert op in ("skip", "replace", "inject", "list", "revert"), op
    ops = load_ops(wal_dir)
    watermark = 0
    if lake_dir is not None:
        from ..state.checkpoint import LakeState
        m = LakeState(lake_dir).latest()
        if m is not None:
            watermark = m.watermark_ts
    if watermark:
        ops = {k: v for k, v in ops.items() if _key_ts(k) > watermark}

    if op == "list":
        out = [{"at_ts": _key_ts(k),
                **({"table": _key_table(k)} if _key_table(k) else {}),
                **v}
               for k, v in sorted(ops.items(),
                                  key=lambda kv: (_key_ts(kv[0]), kv[0]))]
        return [o for o in out
                if (at_ts is None or o["at_ts"] >= at_ts)
                and (table is None or o.get("table") == table)]

    assert at_ts is not None, f"{op} needs at_ts (the DDL barrier_ts)"
    key = _key(at_ts, table)
    if watermark and at_ts <= watermark:
        raise ValueError(
            f"position {at_ts} is at/behind the lake checkpoint "
            f"{watermark} — already-applied history cannot be patched")
    if op == "revert":
        if key not in ops:
            raise ValueError(f"no operator registered at {key}")
        del ops[key]
    elif op == "skip":
        ops[key] = {"op": "skip"}
    else:                                   # replace | inject
        assert ddls, f"{op} needs at least one DDL spec"
        for d in ddls:
            assert "ddl_type" in d and "column" in d, d
        ops[key] = {"op": op,
                    "ddls": [{"ddl_type": d["ddl_type"],
                              "column": d["column"],
                              "default": d.get("default")}
                             for d in ddls]}
    _write_ops(wal_dir, ops)
    return {"at_ts": at_ts, "op": op, "pending": len(ops),
            **({"table": table} if table else {})}


def apply_error_ops(raw_ddls: list[dict], ops: dict[str, dict],
                    table: str | None = None) -> list[dict]:
    """Patch a raw ddl.json spec list with the registered operators and
    renumber schema versions (2, 3, ... in barrier order). Pure: returns
    the patched spec list; callers build the SchemaRegistry from it.
    `table` selects which operators apply: table-scoped ones for that
    table of a multi-table changefeed, plain ones when None.

    - skip: every DDL at the position becomes a `skipped_by_operator`
      no-op barrier (schema unchanged, version++ preserved).
    - replace: the DDLs at the position are swapped for the operator's
      specs (the position must exist — replacing nothing is an error).
    - inject: the operator's specs are added at the position (which may
      be barrier-free before the injection)."""
    ops = {k: v for k, v in ops.items() if _key_table(k) == table}
    if not ops:
        return raw_ddls
    by_ts: dict[int, list[dict]] = {}
    for d in raw_ddls:
        by_ts.setdefault(int(d["barrier_ts"]), []).append(dict(d))
    for k_s, o in ops.items():
        ts = _key_ts(k_s)
        if o["op"] == "skip":
            if ts not in by_ts:
                raise ValueError(f"skip at {ts}: no DDL at that position")
            for d in by_ts[ts]:
                d["ddl_type"] = SKIP_TYPE
                d["default"] = None
        elif o["op"] == "replace":
            if ts not in by_ts:
                raise ValueError(
                    f"replace at {ts}: no DDL at that position")
            by_ts[ts] = [{"barrier_ts": ts, **d} for d in o["ddls"]]
        else:                               # inject
            by_ts.setdefault(ts, []).extend(
                {"barrier_ts": ts, **d} for d in o["ddls"])
    out = []
    ver = 2
    for ts in sorted(by_ts):
        for d in by_ts[ts]:
            d["barrier_ts"] = ts
            d["schema_ver"] = ver
            ver += 1
            out.append(d)
    return out
