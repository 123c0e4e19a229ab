"""WAL change-file codecs: csv and canal-json encode/decode (M9/M10).

Mirrors the reference's codec semantics, not its code:

- csv (pkg/sink/codec/csv/csv_message.go:91-140 field conventions): first
  field is the op letter I/U/D, then commit-ts; strings are double-quoted
  with internal quotes doubled; NULL is the unquoted token \\N; token
  arrays render as space-separated ints inside quotes. Like the reference,
  files carry NO header row — the column order travels in the segment meta
  (the schema-file mechanism of the storage sink,
  pkg/sink/cloudstorage/table_definition.go).
- canal-json (pkg/sink/codec/canal/canal_json_message.go op mapping): one
  JSON object per line with type INSERT/UPDATE/DELETE, es=commit_ts,
  ts=start_ts, pkNames, and `data`/`old` row objects whose values are ALL
  STRINGS (canal's convention); DELETE carries the key in `data` with null
  image columns.

Production replay stays on Parquet (predicate pushdown, zero-copy); these
codecs exist so reference-shaped change files replay bit-identically
(storage-consumer direction, S6) and are exercised at test scale.
"""

from __future__ import annotations

import hashlib
import json
import re
import struct
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..model import OP_DELETE, OP_INSERT, OP_UPDATE

CSV_NULL = "\\N"
_OP_CHAR = {OP_DELETE: "D", OP_UPDATE: "U", OP_INSERT: "I"}
_CHAR_OP = {v: k for k, v in _OP_CHAR.items()}

#: canonical event-column types the decoders restore
_KEY_TYPES = {
    "op": pa.uint8(), "commit_ts": pa.uint64(), "start_ts": pa.uint64(),
    "doc_id": pa.string(), "new_doc_id": pa.string(),
    "schema_ver": pa.int32(),
}
_LIST_COLS = {"tokens", "pre_tokens"}
_INT_COLS = {"n_tok"}


def _cell_to_text(v, col: str) -> str:
    """One value → csv cell (reference quoting: strings quoted, \\N null)."""
    if v is None:
        return CSV_NULL
    if col == "op":
        return _OP_CHAR[int(v)]
    if col in _LIST_COLS:
        return '"' + " ".join(str(int(x)) for x in v) + '"'
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    # Escape backslash FIRST, then newlines: decode reads the change file
    # via read_text/splitlines, so an embedded '\n' would split a record
    # mid-row. Every backslash in the encoded cell is an escape prefix.
    s = (str(v).replace("\\", "\\\\").replace("\n", "\\n")
         .replace("\r", "\\r"))
    return '"' + s.replace('"', '""') + '"'


def _text_to_value(s: str, col: str):
    if s == CSV_NULL:
        return None
    if col == "op":
        return _CHAR_OP[s.strip('"')]
    if col in _LIST_COLS:
        body = s[1:-1] if s.startswith('"') else s
        return [int(x) for x in body.split()] if body else []
    if s.startswith('"'):
        body = s[1:-1].replace('""', '"')
        if "\\" in body:
            body = re.sub(r"\\(.)",
                          lambda m: {"n": "\n", "r": "\r",
                                     "\\": "\\"}.get(m.group(1), m.group(0)),
                          body)
        return body
    return int(s)


def _typed_column(vals: list, col: str) -> pa.Array:
    if col in _KEY_TYPES:
        return pa.array(vals, _KEY_TYPES[col])
    if col in _LIST_COLS:
        return pa.array(vals, pa.list_(pa.int32()))
    if col in _INT_COLS:
        return pa.array(vals, pa.int32())
    return pa.array([None if v is None else str(v) for v in vals], pa.string())


# ---------------------------------------------------------------------------
# csv
# ---------------------------------------------------------------------------

def encode_csv(t: pa.Table) -> tuple[str, list[str]]:
    """Event table → (csv text, column order). No header line; the column
    order is returned for the segment meta."""
    cols = list(t.column_names)
    data = {c: t[c].to_pylist() for c in cols}
    lines = []
    for i in range(t.num_rows):
        lines.append(",".join(_cell_to_text(data[c][i], c) for c in cols))
    return "\n".join(lines) + ("\n" if lines else ""), cols


def _split_csv_line(line: str) -> list[str]:
    """Split one encoded line on commas OUTSIDE double quotes (cells keep
    their quotes for _text_to_value)."""
    out, buf, inq = [], [], False
    for ch in line:
        if ch == '"':
            inq = not inq
            buf.append(ch)
        elif ch == "," and not inq:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    out.append("".join(buf))
    return out


def decode_csv_lines(lines: list[str], columns: list[str]) -> pa.Table:
    """csv text lines + meta column order → typed event table."""
    cells = [_split_csv_line(ln) for ln in lines if ln]
    cols = {c: [] for c in columns}
    for row in cells:
        for c, cell in zip(columns, row):
            cols[c].append(_text_to_value(cell, c))
    return pa.table({c: _typed_column(v, c) for c, v in cols.items()})


# ---------------------------------------------------------------------------
# canal-json
# ---------------------------------------------------------------------------

def encode_canal_json(t: pa.Table, database: str = "tiflow",
                      table: str = "documents") -> str:
    """Event table → canal-json lines. All data values are STRINGS (canal
    convention); token arrays are space-separated."""
    rows = t.to_pylist()
    lines = []
    for r in rows:
        op = int(r["op"])
        typ = {OP_INSERT: "INSERT", OP_UPDATE: "UPDATE",
               OP_DELETE: "DELETE"}[op]
        data: dict[str, str | None] = {}
        old: dict[str, str | None] = {}
        for c, v in r.items():
            if c in ("op", "commit_ts", "start_ts", "schema_ver"):
                continue
            if c == "pre_tokens":
                old["tokens"] = None if v is None else " ".join(map(str, v))
                continue
            if v is None:
                data[c] = None
            elif c in _LIST_COLS:
                data[c] = " ".join(str(int(x)) for x in v)
            else:
                data[c] = str(v)
        obj = {"database": database, "table": table, "pkNames": ["doc_id"],
               "isDdl": False, "type": typ, "es": int(r["commit_ts"]),
               "ts": int(r["start_ts"]), "schemaVer": int(r["schema_ver"]),
               "data": [data],
               # explicit None check: an empty-but-present pre_tokens list
               # ("") must round-trip as [], not collapse to no-old → None
               "old": [old] if old.get("tokens") is not None else None}
        lines.append(json.dumps(obj, separators=(",", ":")))
    return "\n".join(lines) + ("\n" if lines else "")


def decode_canal_lines(lines: list[str], columns: list[str]) -> pa.Table:
    """canal-json lines → typed event table with the given column order."""
    cols = {c: [] for c in columns}
    for ln in lines:
        if not ln:
            continue
        obj = json.loads(ln)
        op = {"INSERT": OP_INSERT, "UPDATE": OP_UPDATE,
              "DELETE": OP_DELETE}[obj["type"]]
        data = obj["data"][0] if obj.get("data") else {}
        old = obj["old"][0] if obj.get("old") else {}
        for c in columns:
            if c == "op":
                v = op
            elif c == "commit_ts":
                v = int(obj["es"])
            elif c == "start_ts":
                v = int(obj["ts"])
            elif c == "schema_ver":
                v = int(obj.get("schemaVer", 1))
            elif c == "pre_tokens":
                pv = old.get("tokens")
                v = None if pv is None else [int(x) for x in pv.split()] \
                    if pv else []
            elif c in _LIST_COLS:
                dv = data.get(c)
                v = None if dv is None else [int(x) for x in dv.split()] \
                    if dv else []
            elif c in _INT_COLS:
                dv = data.get(c)
                v = None if dv is None else int(dv)
            else:
                v = data.get(c)
            cols[c].append(v)
    return pa.table({c: _typed_column(v, c) for c, v in cols.items()})


# ---------------------------------------------------------------------------
# DDL messages (canal-json isDdl=true — the MQ DDL sink, cdc/sink/ddlsink/mq:
# DDL events are encoded as their SQL text and BROADCAST to every partition
# so each partition's consumer observes the barrier; canal-json DDL envelope
# per pkg/sink/codec/canal/canal_json_message.go)
# ---------------------------------------------------------------------------

def ddl_to_sql(d, table: str = "documents") -> str:
    """DDL record → its SQL text (the form the reference's DDL sink ships).
    Inverse of sql_to_ddl. Type specs are this engine's spec strings
    (string/int64/list<int32>/enum('a','b')/…) — the dialect the lake's
    schema files use, played straight as the DDL column type."""
    if d.ddl_type == "add_column":
        sql = f"ALTER TABLE {table} ADD COLUMN {d.col_name} {d.type_spec}"
        if d.default is not None:
            sql += " DEFAULT '" + str(d.default).replace("'", "''") + "'"
        return sql
    if d.ddl_type == "drop_column":
        return f"ALTER TABLE {table} DROP COLUMN {d.column}"
    if d.ddl_type == "modify_column":
        return f"ALTER TABLE {table} MODIFY COLUMN {d.col_name} {d.type_spec}"
    if d.ddl_type == "rename_column":
        old, new = d.rename_pair
        return f"ALTER TABLE {table} RENAME COLUMN {old} TO {new}"
    if d.ddl_type == "truncate":
        return f"TRUNCATE TABLE {table}"
    raise ValueError(f"unknown ddl_type {d.ddl_type}")


_DDL_RES = [
    ("add_column", re.compile(
        r"^ALTER TABLE \S+ ADD COLUMN (\w+) (.+?)"
        r"(?: DEFAULT '((?:[^']|'')*)')?$")),
    ("rename_column", re.compile(
        r"^ALTER TABLE \S+ RENAME COLUMN (\w+) TO (\w+)$")),
    ("modify_column", re.compile(
        r"^ALTER TABLE \S+ MODIFY COLUMN (\w+) (.+)$")),
    ("drop_column", re.compile(r"^ALTER TABLE \S+ DROP COLUMN (\w+)$")),
    ("truncate", re.compile(r"^TRUNCATE TABLE \S+$")),
]


def sql_to_ddl(sql: str, barrier_ts: int, schema_ver: int):
    """SQL text → DDL record (the consumer's mini DDL parser — the analog
    of the reference consumer feeding DDL query text to the downstream)."""
    from ..stages.schema_evo import DDL
    for kind, rx in _DDL_RES:
        m = rx.match(sql.strip())
        if m is None:
            continue
        g = m.groups()
        if kind == "add_column":
            name, spec, dflt = g
            return DDL(barrier_ts, kind, f"{name}:{spec}",
                       None if dflt is None else dflt.replace("''", "'"),
                       schema_ver)
        if kind == "rename_column":
            return DDL(barrier_ts, kind, f"{g[0]}>{g[1]}", None, schema_ver)
        if kind == "modify_column":
            return DDL(barrier_ts, kind, f"{g[0]}:{g[1]}", None, schema_ver)
        if kind == "drop_column":
            return DDL(barrier_ts, kind, g[0], None, schema_ver)
        return DDL(barrier_ts, "truncate", "*", None, schema_ver)
    raise ValueError(f"unparseable DDL sql: {sql!r}")


def encode_canal_ddl(registry, database: str = "tiflow",
                     table: str = "documents") -> str:
    """SchemaRegistry → canal-json DDL message lines (isDdl=true, sql
    text, es=barrier ts), in barrier order."""
    lines = []
    for d in registry.ddls:
        obj = {"database": database, "table": table, "pkNames": None,
               "isDdl": True,
               "type": "TRUNCATE" if d.ddl_type == "truncate" else "ALTER",
               "es": int(d.barrier_ts), "ts": int(d.barrier_ts),
               "sql": ddl_to_sql(d, table), "data": None, "old": None}
        lines.append(json.dumps(obj, separators=(",", ":")))
    return "\n".join(lines) + ("\n" if lines else "")


def encode_canal_watermark(ts: int, database: str = "tiflow",
                           table: str = "documents") -> str:
    """Resolved-ts watermark message (the canal-json TiDB extension's
    TIDB_WATERMARK event, pkg/sink/codec/canal canal_json_message.go —
    TiCDC broadcasts resolved events in-band so consumers can advance
    safely): es carries the resolved ts, no row data."""
    return json.dumps({"database": database, "table": table,
                       "pkNames": None, "isDdl": False,
                       "type": "TIDB_WATERMARK", "es": int(ts), "ts": 0,
                       "data": None, "old": None},
                      separators=(",", ":"))


def decode_canal_watermark(line: str) -> int:
    obj = json.loads(line)
    assert obj.get("type") == "TIDB_WATERMARK", obj
    return int(obj["es"])


def decode_canal_ddl_lines(lines: list[str]):
    """canal-json DDL lines → SchemaRegistry (versions renumbered dense in
    barrier order, matching the registry contract)."""
    from ..stages.schema_evo import SchemaRegistry
    objs = [json.loads(ln) for ln in lines if ln]
    assert all(o.get("isDdl") for o in objs), "non-DDL line in DDL stream"
    objs.sort(key=lambda o: int(o["es"]))
    return SchemaRegistry([sql_to_ddl(o["sql"], int(o["es"]), i + 2)
                           for i, o in enumerate(objs)])


# ---------------------------------------------------------------------------
# open-protocol (TiCDC's native MQ protocol)
# ---------------------------------------------------------------------------

def encode_open_protocol(t: pa.Table, database: str = "tiflow",
                         table: str = "documents") -> str:
    """Event table → open-protocol key/value lines (pkg/sink/codec/open
    conventions): one JSON object per line holding the message `key`
    ({ts, scm, tbl, t:1}) and `value` — `u` (upsert row image) or `d`
    (delete, key columns only), column values wrapped as {t: type-ish,
    v: value}. On the wire key/value ride separate kafka fields; the file
    form carries them as one envelope per line."""
    lines = []
    for r in t.to_pylist():
        op = int(r["op"])
        key = {"ts": int(r["commit_ts"]), "scm": database, "tbl": table,
               "t": 1, "sts": int(r["start_ts"]),
               "sv": int(r["schema_ver"])}
        def wrap(c, v):
            if v is None:
                return {"t": 6, "v": None}
            if c in _LIST_COLS:
                return {"t": 245, "v": " ".join(str(int(x)) for x in v)}
            if isinstance(v, int):
                return {"t": 3, "v": v}
            return {"t": 15, "v": str(v)}
        if op == OP_DELETE:
            value = {"d": {"doc_id": wrap("doc_id", r["doc_id"])}}
        else:
            img = {c: wrap(c, v) for c, v in r.items()
                   if c not in ("op", "commit_ts", "start_ts", "schema_ver",
                                "pre_tokens")}
            value = {"u": img}
            if r.get("pre_tokens") is not None:
                value["p"] = {"tokens": wrap("tokens", r["pre_tokens"])}
            if op == OP_INSERT:
                value["ins"] = 1   # distinguish insert from update
        lines.append(json.dumps({"key": key, "value": value},
                                separators=(",", ":")))
    return "\n".join(lines) + ("\n" if lines else "")


def decode_open_protocol_lines(lines: list[str],
                               columns: list[str]) -> pa.Table:
    cols = {c: [] for c in columns}
    for ln in lines:
        if not ln:
            continue
        obj = json.loads(ln)
        key, value = obj["key"], obj["value"]
        if "d" in value:
            op, img, pre = OP_DELETE, value["d"], None
        else:
            op = OP_INSERT if value.get("ins") else OP_UPDATE
            img = value["u"]
            pre = value.get("p")

        def unwrap(c, w):
            if w is None or w["v"] is None:
                return None
            if c in _LIST_COLS:
                return [int(x) for x in w["v"].split()] if w["v"] else []
            if c in _INT_COLS:
                return int(w["v"])
            return w["v"]
        for c in columns:
            if c == "op":
                v = op
            elif c == "commit_ts":
                v = int(key["ts"])
            elif c == "start_ts":
                v = int(key["sts"])
            elif c == "schema_ver":
                v = int(key.get("sv", 1))
            elif c == "pre_tokens":
                v = unwrap("tokens", pre.get("tokens")) if pre else None
            else:
                v = unwrap(c, img.get(c))
            cols[c].append(v)
    return pa.table({c: _typed_column(v, c) for c, v in cols.items()})


# ---------------------------------------------------------------------------
# debezium-json
# ---------------------------------------------------------------------------

def encode_debezium(t: pa.Table, database: str = "tiflow",
                    table: str = "documents") -> str:
    """Event table → debezium-envelope lines (pkg/sink/codec/debezium
    flavor): op c/u/d, before/after row images with NATIVE JSON types
    (unlike canal's all-strings), and the TiCDC-specific source fields
    carrying the exact commit_ts/start_ts."""
    lines = []
    for r in t.to_pylist():
        op = int(r["op"])
        img = {c: v for c, v in r.items()
               if c not in ("op", "commit_ts", "start_ts", "schema_ver",
                            "pre_tokens")}
        before = None
        if r.get("pre_tokens") is not None:
            before = {"doc_id": r["doc_id"], "tokens": list(r["pre_tokens"])}
        payload = {
            "op": {OP_INSERT: "c", OP_UPDATE: "u", OP_DELETE: "d"}[op],
            "before": ({"doc_id": r["doc_id"]} if op == OP_DELETE else before),
            "after": None if op == OP_DELETE else img,
            "source": {"db": database, "table": table,
                       "commit_ts": int(r["commit_ts"]),
                       "start_ts": int(r["start_ts"]),
                       "schema_ver": int(r["schema_ver"])},
            "ts_ms": int(r["commit_ts"]) // 1000,
        }
        lines.append(json.dumps({"payload": payload},
                                separators=(",", ":")))
    return "\n".join(lines) + ("\n" if lines else "")


def decode_debezium_lines(lines: list[str], columns: list[str]) -> pa.Table:
    cols = {c: [] for c in columns}
    for ln in lines:
        if not ln:
            continue
        p = json.loads(ln)["payload"]
        op = {"c": OP_INSERT, "u": OP_UPDATE, "d": OP_DELETE}[p["op"]]
        img = p.get("after") or {}
        before = p.get("before") or {}
        src = p["source"]
        for c in columns:
            if c == "op":
                v = op
            elif c == "commit_ts":
                v = int(src["commit_ts"])
            elif c == "start_ts":
                v = int(src["start_ts"])
            elif c == "schema_ver":
                v = int(src.get("schema_ver", 1))
            elif c == "pre_tokens":
                v = before.get("tokens") if op != OP_DELETE else None
            elif c == "doc_id":
                v = img.get("doc_id") or before.get("doc_id")
            else:
                v = img.get(c)
            cols[c].append(v)
    return pa.table({c: _typed_column(v, c) for c, v in cols.items()})


def encode_maxwell(t: pa.Table, database: str = "tiflow",
                   table: str = "documents") -> str:
    """Event table → maxwell lines (pkg/sink/codec/maxwell/
    maxwell_message.go:29-44 message shape): type insert/update/delete,
    ts in SECONDS of the commit physical time, native-JSON `data` image,
    `old` carrying the pre image on updates. Maxwell's second-precision ts
    cannot round-trip commit_ts exactly, so — like real maxwell identifies
    the event by its binlog position — the exact
    `commit_ts:start_ts:schema_ver` rides in `position` and `xid` carries
    start_ts for consumers that only read ints."""
    lines = []
    for r in t.to_pylist():
        op = int(r["op"])
        typ = {OP_INSERT: "insert", OP_UPDATE: "update",
               OP_DELETE: "delete"}[op]
        data = {c: v for c, v in r.items()
                if c not in ("op", "commit_ts", "start_ts", "schema_ver",
                             "pre_tokens")}
        if op == OP_DELETE:
            data = {"doc_id": r["doc_id"]}
        old = None
        if op == OP_UPDATE and r.get("pre_tokens") is not None:
            old = {"tokens": list(r["pre_tokens"])}
        obj = {"database": database, "table": table, "type": typ,
               "ts": int(r["commit_ts"]) // 1_000_000,
               "xid": int(r["start_ts"]),
               "position": f"{int(r['commit_ts'])}:{int(r['start_ts'])}:"
                           f"{int(r['schema_ver'])}",
               "data": data}
        if old is not None:
            obj["old"] = old
        lines.append(json.dumps(obj, separators=(",", ":")))
    return "\n".join(lines) + ("\n" if lines else "")


def decode_maxwell_lines(lines: list[str], columns: list[str]) -> pa.Table:
    cols = {c: [] for c in columns}
    for ln in lines:
        if not ln:
            continue
        obj = json.loads(ln)
        op = {"insert": OP_INSERT, "update": OP_UPDATE,
              "delete": OP_DELETE}[obj["type"]]
        cts, sts, sver = (int(x) for x in obj["position"].split(":"))
        data = obj.get("data") or {}
        old = obj.get("old") or {}
        for c in columns:
            if c == "op":
                v = op
            elif c == "commit_ts":
                v = cts
            elif c == "start_ts":
                v = sts
            elif c == "schema_ver":
                v = sver
            elif c == "pre_tokens":
                v = old.get("tokens")
            else:
                v = data.get(c)
            cols[c].append(v)
    return pa.table({c: _typed_column(v, c) for c, v in cols.items()})


def encode_simple(t: pa.Table, database: str = "tiflow",
                  table: str = "documents") -> str:
    """Event table → simple-protocol DML lines (pkg/sink/codec/simple/
    message.go:470-501 field shape): version, type INSERT/UPDATE/DELETE,
    commitTs (exact uint64), schemaVersion, native-JSON data/old. The
    reference's buildTs is an encode-time wall clock; the file form reuses
    it to carry start_ts so the LWW tiebreaker survives the round-trip
    (documented deviation — simple has no other int64 slot for it)."""
    lines = []
    for r in t.to_pylist():
        op = int(r["op"])
        typ = {OP_INSERT: "INSERT", OP_UPDATE: "UPDATE",
               OP_DELETE: "DELETE"}[op]
        data = {c: v for c, v in r.items()
                if c not in ("op", "commit_ts", "start_ts", "schema_ver",
                             "pre_tokens")}
        if op == OP_DELETE:
            data = {"doc_id": r["doc_id"]}
        obj = {"version": 1, "database": database, "table": table,
               "type": typ, "commitTs": int(r["commit_ts"]),
               "buildTs": int(r["start_ts"]),
               "schemaVersion": int(r["schema_ver"]),
               "data": data}
        if op == OP_UPDATE and r.get("pre_tokens") is not None:
            obj["old"] = {"tokens": list(r["pre_tokens"])}
        lines.append(json.dumps(obj, separators=(",", ":")))
    return "\n".join(lines) + ("\n" if lines else "")


def decode_simple_lines(lines: list[str], columns: list[str]) -> pa.Table:
    cols = {c: [] for c in columns}
    for ln in lines:
        if not ln:
            continue
        obj = json.loads(ln)
        op = {"INSERT": OP_INSERT, "UPDATE": OP_UPDATE,
              "DELETE": OP_DELETE}[obj["type"]]
        data = obj.get("data") or {}
        old = obj.get("old") or {}
        for c in columns:
            if c == "op":
                v = op
            elif c == "commit_ts":
                v = int(obj["commitTs"])
            elif c == "start_ts":
                v = int(obj["buildTs"])
            elif c == "schema_ver":
                v = int(obj.get("schemaVersion", 1))
            elif c == "pre_tokens":
                v = old.get("tokens")
            else:
                v = data.get(c)
            cols[c].append(v)
    return pa.table({c: _typed_column(v, c) for c, v in cols.items()})


# ---------------------------------------------------------------------------
# avro (Object Container File, self-contained — no avro library in sandbox)
# ---------------------------------------------------------------------------

_AVRO_MAGIC = b"Obj\x01"


def _avro_zigzag_write(buf: bytearray, n: int) -> None:
    """Avro long: zigzag + base-128 varint (Avro 1.11 spec, 'Binary
    encoding / primitive types' — public spec, not reference code)."""
    z = (n << 1) ^ (n >> 63)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _avro_zigzag_read(data: bytes, pos: int) -> tuple[int, int]:
    shift = z = 0
    while True:
        b = data[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


def _avro_field_type(col: str, arrow_type: pa.DataType | None) -> object:
    """Column → avro schema type. Key columns fixed; others inferred from
    the arrow type (matching _typed_column's decode contract)."""
    if col == "op":
        return "int"
    if col in ("commit_ts", "start_ts"):
        return "long"
    if col == "schema_ver":
        return "int"
    if col in _LIST_COLS:
        return ["null", {"type": "array", "items": "int"}]
    if col in _INT_COLS:
        return ["null", "long"]
    # everything else travels as nullable string — the same canonical
    # contract _typed_column applies on every decode path
    return ["null", "string"]


def _avro_schema_json(columns: list[str], schema: pa.Schema | None) -> str:
    fields = []
    for c in columns:
        at = schema.field(c).type if schema is not None else None
        fields.append({"name": c, "type": _avro_field_type(c, at)})
    return json.dumps({"type": "record", "name": "ChangeEvent",
                       "namespace": "tiflow_ray", "fields": fields},
                      sort_keys=True)


def _avro_datum_write(block: bytearray, row: dict, ftypes: list) -> None:
    """Binary-encode ONE record against its avro schema field list
    (Avro 1.11 spec record encoding — fields in order, no framing)."""
    for c, ft in ftypes:
        v = row.get(c)
        if ft == "int" or ft == "long":
            _avro_zigzag_write(block, int(v))
        elif isinstance(ft, list):            # ["null", T]
            if v is None:
                block.append(0)               # union branch 0 = null
                continue
            _avro_zigzag_write(block, 1)      # union branch 1
            inner = ft[1]
            if inner == "long" or inner == "int":
                _avro_zigzag_write(block, int(v))
            elif inner == "string":
                sb = str(v).encode()
                _avro_zigzag_write(block, len(sb)); block += sb
            else:                             # array<int>
                if len(v):
                    _avro_zigzag_write(block, len(v))
                    for x in v:
                        _avro_zigzag_write(block, int(x))
                block.append(0)               # array terminator
        else:
            raise AssertionError(f"unhandled avro type {ft}")


def _avro_datum_read(data: bytes, pos: int,
                     fields: list) -> tuple[dict, int]:
    """Decode ONE record (inverse of _avro_datum_write)."""
    row = {}
    for name, ft in fields:
        if ft == "int" or ft == "long":
            v, pos = _avro_zigzag_read(data, pos)
        else:                                 # ["null", T] union
            branch, pos = _avro_zigzag_read(data, pos)
            if branch == 0:
                v = None
            else:
                inner = ft[1]
                if inner in ("long", "int"):
                    v, pos = _avro_zigzag_read(data, pos)
                elif inner == "string":
                    ln, pos = _avro_zigzag_read(data, pos)
                    v = data[pos:pos + ln].decode(); pos += ln
                else:                         # array<int>
                    v = []
                    while True:
                        bc, pos = _avro_zigzag_read(data, pos)
                        if bc == 0:
                            break
                        if bc < 0:            # block size present
                            _, pos = _avro_zigzag_read(data, pos)
                            bc = -bc
                        for _i in range(bc):
                            x, pos = _avro_zigzag_read(data, pos)
                            v.append(x)
        row[name] = v
    return row, pos


def encode_avro(t: pa.Table, block_rows: int = 4096) -> bytes:
    """Event table → one Avro Object Container File (null codec).

    Mirrors the reference's avro protocol slot
    (pkg/sink/codec/avro/avro.go; protocol enum
    pkg/config/sink_protocol.go:33-42) at the format level: self-describing
    binary change file whose schema travels in the file header — the
    schema-registry mechanism collapsed to the embedded-writer-schema form
    the OCF spec defines. Byte layout follows the PUBLIC Avro 1.11 spec
    only. The sync marker is derived deterministically from the schema so
    encode is reproducible."""
    import hashlib

    cols = list(t.column_names)
    schema_json = _avro_schema_json(cols, t.schema)
    sync = hashlib.md5(schema_json.encode()).digest()

    out = bytearray()
    out += _AVRO_MAGIC
    # file metadata: map<string, bytes> — one block of 2 entries, then 0
    meta = {"avro.schema": schema_json.encode(),
            "avro.codec": b"null"}
    _avro_zigzag_write(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _avro_zigzag_write(out, len(kb)); out += kb
        _avro_zigzag_write(out, len(v)); out += v
    out.append(0)            # end of metadata map
    out += sync

    rows = t.to_pylist()
    ftypes = [(c, _avro_field_type(c, t.schema.field(c).type))
              for c in cols]
    for a in range(0, len(rows) or 1, block_rows):
        chunk = rows[a:a + block_rows]
        if not chunk:
            break
        block = bytearray()
        for row in chunk:
            _avro_datum_write(block, row, ftypes)
        _avro_zigzag_write(out, len(chunk))
        _avro_zigzag_write(out, len(block))
        out += block
        out += sync
    return bytes(out)


def _avro_header(data: bytes) -> tuple[str, bytes, int]:
    """Parse the OCF header → (writer schema json, sync marker, body
    offset). Shared by the whole-file decoder and the block splitter."""
    assert data[:4] == _AVRO_MAGIC, "not an avro object container file"
    pos = 4
    meta = {}
    while True:
        n, pos = _avro_zigzag_read(data, pos)
        if n == 0:
            break
        for _ in range(abs(n)):
            if n < 0:                   # negative block count: skip size
                _, pos = _avro_zigzag_read(data, pos)
            kl, pos = _avro_zigzag_read(data, pos)
            k = data[pos:pos + kl].decode(); pos += kl
            vl, pos = _avro_zigzag_read(data, pos)
            meta[k] = data[pos:pos + vl]; pos += vl
    assert meta.get("avro.codec", b"null") == b"null", "only null codec"
    schema_json = meta["avro.schema"].decode()
    sync = data[pos:pos + 16]; pos += 16
    return schema_json, sync, pos


def _decode_avro_body(data: bytes, schema_json: str, sync: bytes,
                      pos: int = 0) -> pa.Table:
    """Decode a run of OCF data blocks ([count][size][payload][sync]...)
    under an already-parsed writer schema — the unit a block-level split
    hands to one task."""
    schema = json.loads(schema_json)
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    cols = {name: [] for name, _ in fields}
    while pos < len(data):
        count, pos = _avro_zigzag_read(data, pos)
        _size, pos = _avro_zigzag_read(data, pos)
        for _ in range(count):
            row, pos = _avro_datum_read(data, pos, fields)
            for name, v in row.items():
                cols[name].append(v)
        assert data[pos:pos + 16] == sync, "sync marker mismatch"
        pos += 16
    return pa.table({c: _typed_column(v, c) for c, v in cols.items()})


def decode_avro(data: bytes, columns: list[str] | None = None) -> pa.Table:
    """Avro OCF bytes → canonical typed event table. Self-describing: the
    writer schema in the header drives field order/types; `columns`, when
    given (segment meta), must agree — the schema-file consistency check."""
    schema_json, sync, pos = _avro_header(data)
    if columns:
        fcols = [f["name"] for f in json.loads(schema_json)["fields"]]
        assert list(columns) == fcols, \
            f"segment meta columns {columns} != avro writer schema {fcols}"
    return _decode_avro_body(data, schema_json, sync, pos)


def avro_block_ranges(data: bytes) -> list[tuple[int, int, int]]:
    """Exact OCF block boundaries [(start, end, nrows)]: a varint walk over
    the block headers (count, size → skip payload → verify sync). O(#blocks)
    work, no datum decode — the splitter never touches row payloads, unlike
    a byte-scan for sync markers it can never false-positive."""
    _schema_json, sync, pos = _avro_header(data)
    out = []
    n = len(data)
    while pos < n:
        start = pos
        count, pos = _avro_zigzag_read(data, pos)
        size, pos = _avro_zigzag_read(data, pos)
        pos += size
        assert data[pos:pos + 16] == sync, "sync marker mismatch"
        pos += 16
        out.append((start, pos, count))
    return out


def plan_avro_splits(paths: list[str], columns: list[str] | None,
                     target_bytes: int = 8 << 20) -> list[dict]:
    """Block-level split planning for OCF WAL segments (r3 verdict #8):
    ONE remote index task per file parses block boundaries (varint walk)
    and coalesces consecutive blocks into ~target_bytes ranges, so decode
    parallelism is block-granular — a single 512 MB segment fans out to
    ~64 ranges instead of one task. The driver only ever holds the O(#
    ranges) split descriptors."""
    import ray as _ray

    @_ray.remote
    def _index(path: str) -> list[dict]:
        with open(path, "rb") as f:
            data = f.read()
        schema_json, sync, _pos = _avro_header(data)
        if columns:
            fcols = [f["name"] for f in json.loads(schema_json)["fields"]]
            assert list(columns) == fcols, \
                f"{path}: meta columns {columns} != writer schema {fcols}"
        ranges = avro_block_ranges(data)
        out, lo, hi = [], None, None
        for (s, e, _cnt) in ranges:
            if lo is None:
                lo, hi = s, e
            elif e - lo > target_bytes:
                out.append({"path": path, "start": lo, "end": hi,
                            "schema": schema_json, "sync": sync.hex()})
                lo, hi = s, e
            else:
                hi = e
        if lo is not None:
            out.append({"path": path, "start": lo, "end": hi,
                        "schema": schema_json, "sync": sync.hex()})
        return out

    nested = _ray.get([_index.remote(p) for p in paths])
    return [item for sub in nested for item in sub]


class AvroRangeDecoder:
    """map_batches callable over plan_avro_splits items: each row names a
    (path, byte-range) of whole OCF blocks; the task seeks, reads ONLY its
    range and decodes — block-granular parallelism with zero driver bytes."""

    def __init__(self, columns: list[str]):
        self.columns = list(columns)

    def __call__(self, t: pa.Table) -> pa.Table:
        tables = []
        for row in t.to_pylist():
            with open(row["path"], "rb") as f:
                f.seek(row["start"])
                data = f.read(row["end"] - row["start"])
            tables.append(_decode_avro_body(
                data, row["schema"], bytes.fromhex(row["sync"])))
        if tables:
            return pa.concat_tables(tables)
        return pa.table({c: _typed_column([], c) for c in self.columns})


# ---------------------------------------------------------------------------
# craft (binary columnar change-file format — the craft protocol slot)
# ---------------------------------------------------------------------------
#
# Mirrors the reference craft format's DESIGN, not its code
# (pkg/sink/codec/craft/model.go, message_encoder.go, message_decoder.go;
# protocol enum pkg/config/sink_protocol.go): a versioned binary message
# whose payload is COLUMNAR chunks (delta-zigzag-varint timestamp chunks,
# uvarint op chunk, length-prefixed nullable value chunks), repeated
# strings interned in a TERM DICTIONARY (craft dicts schema/table/column
# names — here: column names), and SIZE TABLES written at the TAIL with a
# reversed-uvarint total length so a decoder can locate every region
# without scanning the body (craft's encodeSizeTables /
# encodeUvarintReversed signature move, message_encoder.go:167-176).
# Varints are protobuf-style; signed values use zigzag (identical to
# craft's encodeVarint) — the avro helpers above implement the same
# public encoding and are reused.

_CRAFT_VERSION = 1
#: per-column payload encodings
_CRAFT_STR, _CRAFT_INT, _CRAFT_LIST = 0, 1, 2


def _uvarint_write(buf: bytearray, n: int) -> None:
    while n >= 0x80:
        buf.append((n & 0x7F) | 0x80)
        n >>= 7
    buf.append(n)


def _uvarint_read(data: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not (b & 0x80):
            return n, pos
        shift += 7


def _uvarint_write_reversed(buf: bytearray, n: int) -> None:
    """Varint with its bytes in reverse order, so it can be READ BACKWARD
    from the end of the message (the craft tail-length trick)."""
    tmp = bytearray()
    _uvarint_write(tmp, n)
    buf.extend(reversed(tmp))


def _uvarint_read_from_tail(data: bytes, end: int) -> tuple[int, int]:
    """Read a reversed uvarint ending at `end` (exclusive), walking
    backward; returns (value, n_bytes_consumed)."""
    n = shift = used = 0
    pos = end - 1
    while True:
        b = data[pos]
        n |= (b & 0x7F) << shift
        used += 1
        if not (b & 0x80):
            return n, used
        shift += 7
        pos -= 1


def _delta_zigzag_write(buf: bytearray, vals) -> None:
    """Craft's encodeDeltaVarintChunk: first value, then successive
    zigzag-varint deltas (timestamps compress to ~1 byte each)."""
    last = 0
    for v in vals:
        v = int(v)
        _avro_zigzag_write(buf, v - last)
        last = v


def _delta_zigzag_read(data: bytes, pos: int, n: int) -> tuple[list, int]:
    out, last = [], 0
    for _ in range(n):
        d, pos = _avro_zigzag_read(data, pos)
        last += d
        out.append(last)
    return out, pos


def _craft_type_code(col: str) -> int:
    if col in _LIST_COLS:
        return _CRAFT_LIST
    if col in _INT_COLS or col == "schema_ver":
        return _CRAFT_INT
    return _CRAFT_STR


def encode_craft(t: pa.Table) -> bytes:
    """Event table → one craft-style binary change file.

    Regions: [H: version, N, commit_ts/start_ts delta chunks, op chunk,
    column metas] [B: per-column nullable value chunks] [D: term
    dictionary] [size tables + reversed-uvarint tables-length]."""
    cols = list(t.column_names)
    body_cols = [c for c in cols if c not in ("op", "commit_ts", "start_ts")]
    n = t.num_rows
    terms: dict[str, int] = {}

    def intern(s: str) -> int:
        if s not in terms:
            terms[s] = len(terms)
        return terms[s]

    out = bytearray()
    # --- H: header region -------------------------------------------------
    _uvarint_write(out, _CRAFT_VERSION)
    _uvarint_write(out, n)
    _delta_zigzag_write(out, t["commit_ts"].to_pylist())
    _delta_zigzag_write(out, t["start_ts"].to_pylist())
    for v in t["op"].to_pylist():
        _uvarint_write(out, int(v))
    _uvarint_write(out, len(body_cols))
    for c in body_cols:
        _uvarint_write(out, intern(c))
        out.append(_craft_type_code(c))
    h_size = len(out)

    # --- B: one nullable value chunk per column (lengths then payloads,
    # craft's encodeNullableBytesChunk shape; -1 length = NULL) -----------
    for c in body_cols:
        code = _craft_type_code(c)
        vals = t[c].to_pylist()
        lengths, payload = [], bytearray()
        for v in vals:
            if v is None:
                lengths.append(-1)
                continue
            cell = bytearray()
            if code == _CRAFT_STR:
                cell = bytearray(str(v).encode())
            elif code == _CRAFT_INT:
                _avro_zigzag_write(cell, int(v))
            else:                       # list<int32>: count, then elements
                _uvarint_write(cell, len(v))
                for x in v:
                    _avro_zigzag_write(cell, int(x))
            lengths.append(len(cell))
            payload += cell
        for ln in lengths:
            _avro_zigzag_write(out, ln)
        out += payload
    b_size = len(out) - h_size

    # --- D: term dictionary ------------------------------------------------
    _uvarint_write(out, len(terms))
    for s in terms:                     # insertion order = id order
        sb = s.encode()
        _uvarint_write(out, len(sb))
        out += sb
    d_size = len(out) - h_size - b_size

    # --- size tables at the tail -------------------------------------------
    st_start = len(out)
    _uvarint_write(out, 3)
    _delta_zigzag_write(out, [h_size, b_size, d_size])
    _uvarint_write_reversed(out, len(out) - st_start)
    return bytes(out)


def decode_craft(data: bytes, columns: list[str] | None = None) -> pa.Table:
    """Craft bytes → canonical typed event table. Tail-first like the
    reference decoder: reversed-uvarint tables length → size tables →
    term dictionary → header chunks → value chunks."""
    st_len, tail = _uvarint_read_from_tail(data, len(data))
    st_pos = len(data) - tail - st_len
    cnt, p = _uvarint_read(data, st_pos)
    assert cnt == 3, f"bad craft size-table count {cnt}"
    (h_size, b_size, d_size), _ = _delta_zigzag_read(data, p, cnt)
    assert h_size + b_size + d_size == st_pos, "craft size tables corrupt"

    # term dictionary (decoded FIRST — ids in the header resolve against it)
    pos = h_size + b_size
    nterms, pos = _uvarint_read(data, pos)
    terms = []
    for _ in range(nterms):
        ln, pos = _uvarint_read(data, pos)
        terms.append(data[pos:pos + ln].decode())
        pos += ln

    # header region
    pos = 0
    ver, pos = _uvarint_read(data, pos)
    assert ver == _CRAFT_VERSION, f"unsupported craft version {ver}"
    n, pos = _uvarint_read(data, pos)
    commit_ts, pos = _delta_zigzag_read(data, pos, n)
    start_ts, pos = _delta_zigzag_read(data, pos, n)
    ops = []
    for _ in range(n):
        v, pos = _uvarint_read(data, pos)
        ops.append(v)
    ncols, pos = _uvarint_read(data, pos)
    metas = []
    for _ in range(ncols):
        tid, pos = _uvarint_read(data, pos)
        metas.append((terms[tid], data[pos]))
        pos += 1
    assert pos == h_size, "craft header size mismatch"

    # body: per-column chunks
    cols = {"op": ops, "commit_ts": commit_ts, "start_ts": start_ts}
    for name, code in metas:
        lengths = []
        for _ in range(n):
            ln, pos = _avro_zigzag_read(data, pos)
            lengths.append(ln)
        vals = []
        for ln in lengths:
            if ln < 0:
                vals.append(None)
                continue
            cell_end = pos + ln
            if code == _CRAFT_STR:
                vals.append(data[pos:cell_end].decode())
            elif code == _CRAFT_INT:
                v, pos = _avro_zigzag_read(data, pos)
            else:
                k, pos = _uvarint_read(data, pos)
                v = []
                for _ in range(k):
                    x, pos = _avro_zigzag_read(data, pos)
                    v.append(x)
            if code != _CRAFT_STR:
                vals.append(v)
                assert pos == cell_end, f"craft cell overrun in {name}"
            pos = cell_end
        cols[name] = vals

    fcols = list(cols)
    if columns:
        assert list(columns) == fcols, \
            f"segment meta columns {columns} != craft columns {fcols}"
    return pa.table({c: _typed_column(cols[c], c) for c in fcols})


# ---------------------------------------------------------------------------
# mysql binlog (binary-log v4 FILE format — the DM binlog-reader/relay slot)
# ---------------------------------------------------------------------------
#
# Self-contained writer + reader for the PUBLIC MySQL binary-log v4 file
# layout (MySQL Internals manual, "Binary Log"; libbinlogevents). The
# reference consumes the same bytes via go-mysql in `dm/pkg/binlog/reader`
# and relays raw event streams in `dm/relay/relay.go` — this codec is that
# pipeline's format-level essence, closing the S4 gap at the layer the
# sandbox allows (no MySQL endpoint exists here, so the WIRE protocol
# stays out of scope; the FILE format is fully real). Implemented
# end-to-end, every byte verified on decode:
#
#   * file magic 0xfe 'b' 'i' 'n' + FORMAT_DESCRIPTION_EVENT: binlog
#     version 4, 19-byte common headers, the post-header-length table
#   * CRC32 event checksums (binlog_checksum=CRC32): algorithm byte at
#     the FDE tail, 4 trailing CRC bytes on EVERY event, checked on read
#   * transactions in stream order, grouped by commit_ts: QUERY "BEGIN"
#     → TABLE_MAP → ROWS events (one per consecutive same-op run) → XID
#     (xid = the transaction's commit_ts)
#   * TABLE_MAP optional-metadata TLVs (binlog_row_metadata=FULL, MySQL
#     8.0): SIGNEDNESS (MSB-first bit per numeric column),
#     DEFAULT_CHARSET (collation id — utf8mb4/latin1/gbk supported), and
#     COLUMN_NAME — the stream is self-describing, and decode performs
#     the mounter's charset conversion (cdc/entry/mounter.go charset
#     handling) from the DECLARED collation, never an assumption
#   * ROWS_EVENT v2 (WRITE=30 / UPDATE=31 / DELETE=32): present bitmaps,
#     LSB-first per-row null bitmaps, little-endian LONGLONG/LONG cells,
#     length-prefixed BLOB cells; UPDATE carries a MINIMAL before-image
#     (pk doc_id + old tokens → pre_tokens), the binlog_row_image=MINIMAL
#     shape, plus a full after-image
#
# `op` maps to the rows-event type and pre_tokens to the before-image, so
# neither is a table column; every other canonical event column rides in
# the row image (commit_ts/start_ts as unsigned LONGLONG — the storage
# sink writes commit-ts as a column the same way). Token lists ride as
# BLOB cells of packed little-endian int32 (MySQL has no array type; the
# column is named in COLUMN_NAME metadata and re-typed by the shared
# _LIST_COLS rule, exactly like every text codec above).

_BINLOG_MAGIC = b"\xfebin"
_EV_QUERY, _EV_ROTATE, _EV_FDE, _EV_XID, _EV_TABLE_MAP = 2, 4, 15, 16, 19
_EV_WRITE_V2, _EV_UPDATE_V2, _EV_DELETE_V2 = 30, 31, 32
_EV_GTID, _EV_PREV_GTIDS = 33, 35
#: the stream's source UUID (server_uuid analog) — deterministic so the
#: same WAL always carries the same GTID identity
_GTID_SID = hashlib.md5(b"tiflow-ray-binlog-source-1").digest()
_ROWS_OP = {_EV_WRITE_V2: OP_INSERT, _EV_UPDATE_V2: OP_UPDATE,
            _EV_DELETE_V2: OP_DELETE}
_OP_ROWS = {v: k for k, v in _ROWS_OP.items()}
_MYSQL_LONG, _MYSQL_LONGLONG, _MYSQL_BLOB = 3, 8, 252
#: charset name → (MySQL default collation id, python codec)
_BINLOG_CHARSETS = {"utf8mb4": (255, "utf-8"), "latin1": (8, "latin-1"),
                    "gbk": (28, "gbk"), "gb18030": (248, "gb18030")}
_COLLATION_CODEC = {cid: py for cid, py in _BINLOG_CHARSETS.values()}
_BINLOG_TABLE_ID = 1000
_BINLOG_SERVER_ID = 1
#: TABLE_MAP optional-metadata TLV type codes (MySQL 8.0)
_TLV_SIGNEDNESS, _TLV_DEFAULT_CHARSET, _TLV_COLUMN_NAME = 1, 2, 4


def _lenenc_write(buf: bytearray, n: int) -> None:
    """MySQL length-encoded integer."""
    if n < 251:
        buf.append(n)
    elif n < 1 << 16:
        buf += b"\xfc" + struct.pack("<H", n)
    elif n < 1 << 24:
        buf += b"\xfd" + struct.pack("<I", n)[:3]
    else:
        buf += b"\xfe" + struct.pack("<Q", n)


def _lenenc_read(data: bytes, pos: int) -> tuple[int, int]:
    b = data[pos]
    if b < 251:
        return b, pos + 1
    if b == 0xFC:
        return struct.unpack_from("<H", data, pos + 1)[0], pos + 3
    if b == 0xFD:
        return int.from_bytes(data[pos + 1:pos + 4], "little"), pos + 4
    return struct.unpack_from("<Q", data, pos + 1)[0], pos + 9


def _bitmap_lsb(bits: list[bool]) -> bytes:
    """LSB-first bitmap (rows-event present/null bitmap bit order)."""
    out = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        if b:
            out[i >> 3] |= 1 << (i & 7)
    return bytes(out)


def _binlog_col_spec(col: str) -> tuple[int, bytes, bool]:
    """event column → (mysql type code, table-map metadata, unsigned)."""
    at = _KEY_TYPES.get(col)
    if at == pa.uint64():
        return _MYSQL_LONGLONG, b"", True
    if col in _INT_COLS or at == pa.int32():
        return _MYSQL_LONG, b"", False
    return _MYSQL_BLOB, b"\x04", False   # 4-byte length prefix (LONGBLOB)


def _binlog_event(out: bytearray, type_code: int, body: bytes,
                  ts32: int) -> None:
    """Frame one event: v4 common header (timestamp, type, server_id,
    event_size, log_pos = end offset, flags) + body + CRC32 trailer."""
    size = 19 + len(body) + 4
    hdr = struct.pack("<IBIIIH", ts32 & 0xFFFFFFFF, type_code,
                      _BINLOG_SERVER_ID, size,
                      (len(out) + size) & 0xFFFFFFFF, 0)
    out += hdr + body
    out += struct.pack("<I", zlib.crc32(hdr + body) & 0xFFFFFFFF)


def _binlog_fde(out: bytearray) -> None:
    post = bytearray()
    post += struct.pack("<H", 4)                        # binlog version
    post += b"5.7.44-tiflow-ray".ljust(50, b"\x00")     # server version
    post += struct.pack("<I", 0)                        # create timestamp
    post.append(19)                                     # common header len
    phl = bytearray(38)           # post-header lengths for types 1..38
    phl[_EV_QUERY - 1] = 13
    phl[_EV_ROTATE - 1] = 8
    phl[_EV_FDE - 1] = 95         # 2 + 50 + 4 + 1 + 38
    phl[_EV_TABLE_MAP - 1] = 8
    for tc in (_EV_WRITE_V2, _EV_UPDATE_V2, _EV_DELETE_V2):
        phl[tc - 1] = 10
    phl[_EV_GTID - 1] = 42        # flags+sid+gno+lc pair (5.7 layout)
    phl[_EV_PREV_GTIDS - 1] = 0   # body IS the gtid set
    post += phl
    post.append(1)                                      # checksum alg: CRC32
    _binlog_event(out, _EV_FDE, bytes(post), 0)


# --- GTID sets (dm/pkg/gtid + go-mysql mysql.GTIDSet analog) -----------
# Canonical python form: {sid_hex: [(lo, hi)]} with inclusive, merged,
# sorted intervals. The binary layout is MySQL's (PREVIOUS_GTIDS body and
# COM_BINLOG_DUMP_GTID payload): n_sids u64le, then per sid 16 raw bytes
# + n_intervals u64le + per interval start u64le, stop u64le (exclusive).

def gtid_set_normalize(s: dict) -> dict:
    out = {}
    for sid, ivs in s.items():
        ivs = sorted((int(a), int(b)) for a, b in ivs if a <= b)
        merged: list[tuple[int, int]] = []
        for a, b in ivs:
            if merged and a <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], b))
            else:
                merged.append((a, b))
        if merged:
            out[sid] = merged
    return out


def gtid_set_union(a: dict, b: dict) -> dict:
    out = {sid: list(ivs) for sid, ivs in a.items()}
    for sid, ivs in b.items():
        out.setdefault(sid, []).extend(ivs)
    return gtid_set_normalize(out)


def gtid_set_contains(a: dict, b: dict) -> bool:
    """b ⊆ a."""
    a = gtid_set_normalize(a)
    for sid, ivs in gtid_set_normalize(b).items():
        have = a.get(sid, [])
        for lo, hi in ivs:
            if not any(x <= lo and hi <= y for x, y in have):
                return False
    return True


def gtid_set_str(s: dict) -> str:
    """'sid:1-5:7,sid2:1-3' — the SHOW MASTER STATUS / relay.meta form."""
    parts = []
    for sid in sorted(s):
        ivs = ":".join(f"{a}-{b}" if a != b else f"{a}"
                       for a, b in gtid_set_normalize({sid: s[sid]})[sid])
        parts.append(f"{sid}:{ivs}")
    return ",".join(parts)


def gtid_set_parse(text: str) -> dict:
    out: dict = {}
    for chunk in filter(None, (c.strip() for c in text.split(","))):
        sid, *ivs = chunk.split(":")
        out.setdefault(sid, [])
        for iv in ivs:
            a, _, b = iv.partition("-")
            out[sid].append((int(a), int(b or a)))
    return gtid_set_normalize(out)


def gtid_set_encode(s: dict) -> bytes:
    s = gtid_set_normalize(s)
    out = bytearray(struct.pack("<Q", len(s)))
    for sid in sorted(s):
        out += bytes.fromhex(sid)
        out += struct.pack("<Q", len(s[sid]))
        for lo, hi in s[sid]:
            out += struct.pack("<QQ", lo, hi + 1)       # stop exclusive
    return bytes(out)


def gtid_set_decode(data: bytes, pos: int = 0) -> tuple[dict, int]:
    (n_sids,) = struct.unpack_from("<Q", data, pos)
    pos += 8
    out: dict = {}
    for _ in range(n_sids):
        sid = data[pos:pos + 16].hex()
        pos += 16
        (n_iv,) = struct.unpack_from("<Q", data, pos)
        pos += 8
        ivs = []
        for _ in range(n_iv):
            lo, stop = struct.unpack_from("<QQ", data, pos)
            pos += 16
            ivs.append((lo, stop - 1))
        out[sid] = ivs
    return gtid_set_normalize(out), pos


def _binlog_prev_gtids(out: bytearray, executed: dict) -> None:
    """PREVIOUS_GTIDS_LOG_EVENT: the set executed before this file — how
    a GTID dump locates its start file without decoding row events."""
    _binlog_event(out, _EV_PREV_GTIDS, gtid_set_encode(executed), 0)


def _binlog_gtid(out: bytearray, gno: int, seq_in_file: int,
                 ts32: int) -> None:
    """GTID_LOG_EVENT (42-byte post-header, 5.7 layout): commit flag,
    sid, gno, then the logical-clock pair (last_committed /
    sequence_number) that MTS schedulers read."""
    body = b"\x01" + _GTID_SID + struct.pack("<q", gno) \
        + b"\x02" + struct.pack("<qq", seq_in_file - 1, seq_in_file)
    _binlog_event(out, _EV_GTID, body, ts32)


def binlog_gtid_info(data: bytes) -> tuple[dict | None, dict]:
    """binlog file bytes → (previous_gtids set or None, executed set =
    previous ∪ this file's GTID events). Headers-only walk plus the two
    tiny GTID payload shapes — no row decode."""
    assert data[:4] == _BINLOG_MAGIC, "not a MySQL binlog file"
    pos, n = 4, len(data)
    prev, gnos = None, []
    while pos + 19 <= n:                     # tolerate a torn tail: the
        tc = data[pos + 4]                   # caller truncates/refetches
        size = struct.unpack_from("<I", data, pos + 9)[0]
        if size < 23 or pos + size > n:
            break
        if tc == _EV_PREV_GTIDS:
            prev, _ = gtid_set_decode(data, pos + 19)
        elif tc == _EV_GTID:
            sid = data[pos + 20:pos + 36].hex()
            (gno,) = struct.unpack_from("<q", data, pos + 36)
            gnos.append((sid, gno))
        pos += size
    executed = dict(prev) if prev else {}
    for sid, gno in gnos:
        executed = gtid_set_union(executed, {sid: [(gno, gno)]})
    return prev, executed


def _binlog_query(out: bytearray, sql: str, ts32: int,
                  schema: bytes) -> None:
    """QUERY_EVENT: 13-byte post-header (thread id, exec time, schema len,
    error code, status-vars len) + schema name + NUL + query text."""
    body = struct.pack("<IIBHH", 1, 0, len(schema), 0, 0)
    body += schema + b"\x00" + sql.encode()
    _binlog_event(out, _EV_QUERY, body, ts32)


def _binlog_table_map(out: bytearray, tbl_cols: list[str],
                      specs: list[tuple], coll_id: int, ts32: int,
                      schema: bytes, table: bytes) -> None:
    body = bytearray()
    body += _BINLOG_TABLE_ID.to_bytes(6, "little") + struct.pack("<H", 1)
    body.append(len(schema))
    body += schema + b"\x00"
    body.append(len(table))
    body += table + b"\x00"
    _lenenc_write(body, len(tbl_cols))
    body += bytes(s[0] for s in specs)                  # column types
    meta = b"".join(s[1] for s in specs)
    _lenenc_write(body, len(meta))
    body += meta
    body += _bitmap_lsb([True] * len(tbl_cols))         # nullability
    # optional metadata TLVs (binlog_row_metadata=FULL)
    unsigned = [s[2] for s in specs
                if s[0] in (_MYSQL_LONG, _MYSQL_LONGLONG)]
    if unsigned:
        sign = bytearray((len(unsigned) + 7) // 8)
        for i, u in enumerate(unsigned):                # MSB-first per spec
            if u:
                sign[i >> 3] |= 0x80 >> (i & 7)
        body.append(_TLV_SIGNEDNESS)
        _lenenc_write(body, len(sign))
        body += sign
    cs = bytearray()
    _lenenc_write(cs, coll_id)
    body.append(_TLV_DEFAULT_CHARSET)
    _lenenc_write(body, len(cs))
    body += cs
    names = bytearray()
    for c in tbl_cols:
        nb = c.encode()
        _lenenc_write(names, len(nb))
        names += nb
    body.append(_TLV_COLUMN_NAME)
    _lenenc_write(body, len(names))
    body += names
    _binlog_event(out, _EV_TABLE_MAP, bytes(body), ts32)


def _binlog_image(buf: bytearray, vals: list, present_idx: list[int],
                  tbl_cols: list[str], specs: list[tuple],
                  codec: str) -> None:
    """One row image: null bitmap over present columns, then cells."""
    nulls = [vals[i] is None for i in present_idx]
    buf += _bitmap_lsb(nulls)
    for i, isnull in zip(present_idx, nulls):
        if isnull:
            continue
        v, tc = vals[i], specs[i][0]
        if tc == _MYSQL_LONGLONG:
            buf += struct.pack("<Q", int(v) & 0xFFFFFFFFFFFFFFFF)
        elif tc == _MYSQL_LONG:
            buf += struct.pack("<i", int(v))
        elif tbl_cols[i] in _LIST_COLS:
            payload = np.asarray(v, dtype="<i4").tobytes()
            buf += struct.pack("<I", len(payload)) + payload
        else:
            payload = str(v).encode(codec)
            buf += struct.pack("<I", len(payload)) + payload


def encode_mysql_binlog(t: pa.Table, charset: str = "utf8mb4",
                        registry=None, schema: str = "tiflow",
                        table: str = "documents",
                        gtid_start: int | None = None) -> bytes:
    """Event table → MySQL binlog v4 file bytes. `registry` (optional
    SchemaRegistry) interleaves each DDL as an auto-commit QUERY event at
    its barrier position in commit_ts order — DDL travels IN the binlog,
    where MySQL puts it (dm/syncer consumes DDL from the same stream); the
    barrier ts rides a TiDB-style trailing comment because the v4 header
    timestamp is 32-bit seconds.

    `gtid_start` (the count of transactions executed BEFORE this file)
    turns on GTID mode: a PREVIOUS_GTIDS event after the FDE carries the
    prior executed set, and every transaction — row txns AND auto-commit
    DDLs, exactly like MySQL — gets a GTID event with a dense gno
    (gtid_start+1, gtid_start+2, …). Returns via binlog_txn_count how
    many gnos a table consumes so multi-file writers can chain files."""
    cols_all = list(t.column_names)
    assert "op" in cols_all and "commit_ts" in cols_all \
        and "doc_id" in cols_all, cols_all
    tbl_cols = [c for c in cols_all if c not in ("op", "pre_tokens")]
    has_pre = "pre_tokens" in cols_all
    assert not has_pre or "tokens" in tbl_cols, \
        "pre_tokens requires a tokens column to carry the before-image"
    coll_id, codec = _BINLOG_CHARSETS[charset]
    specs = [_binlog_col_spec(c) for c in tbl_cols]
    col_pos = {c: i for i, c in enumerate(tbl_cols)}
    ncols = len(tbl_cols)
    all_idx = list(range(ncols))
    before_idx = sorted({col_pos["doc_id"]} |
                        ({col_pos["tokens"]} if has_pre else set())) \
        if "doc_id" in col_pos else all_idx
    schema_b, table_b = schema.encode(), table.encode()
    ddls = sorted(registry.ddls, key=lambda d: d.barrier_ts) \
        if registry is not None else []
    di = 0

    rows = t.to_pylist()
    out = bytearray(_BINLOG_MAGIC)
    _binlog_fde(out)
    seq = 0

    def _next_gtid(ts32: int) -> None:
        nonlocal seq
        seq += 1
        if gtid_start is not None:
            _binlog_gtid(out, gtid_start + seq, seq, ts32)

    if gtid_start is not None:
        _binlog_prev_gtids(
            out, {_GTID_SID.hex(): [(1, gtid_start)]} if gtid_start else {})
    i, n = 0, len(rows)
    while i < n:
        j, cts = i, rows[i]["commit_ts"]
        while j < n and rows[j]["commit_ts"] == cts:
            j += 1
        ts32 = int(cts) & 0xFFFFFFFF
        while di < len(ddls) and ddls[di].barrier_ts < int(cts):
            d = ddls[di]
            _next_gtid(d.barrier_ts & 0xFFFFFFFF)
            _binlog_query(out, ddl_to_sql(d, table) +
                          f" /* barrier_ts={d.barrier_ts} */",
                          d.barrier_ts & 0xFFFFFFFF, schema_b)
            di += 1
        _next_gtid(ts32)
        _binlog_query(out, "BEGIN", ts32, schema_b)
        _binlog_table_map(out, tbl_cols, specs, coll_id, ts32,
                          schema_b, table_b)
        k = i
        while k < j:
            m, op = k, int(rows[k]["op"])
            while m < j and int(rows[m]["op"]) == op:
                m += 1
            body = bytearray()
            body += _BINLOG_TABLE_ID.to_bytes(6, "little")
            body += struct.pack("<H", 1)
            body += struct.pack("<H", 2)     # v2 extra-data len (empty)
            _lenenc_write(body, ncols)
            if op == OP_UPDATE:
                body += _bitmap_lsb([x in before_idx for x in all_idx])
                body += _bitmap_lsb([True] * ncols)
                for r in rows[k:m]:
                    before = [None] * ncols
                    before[col_pos["doc_id"]] = r["doc_id"]
                    if has_pre:
                        before[col_pos["tokens"]] = r.get("pre_tokens")
                    _binlog_image(body, before, before_idx, tbl_cols,
                                  specs, codec)
                    _binlog_image(body, [r[c] for c in tbl_cols], all_idx,
                                  tbl_cols, specs, codec)
            else:
                body += _bitmap_lsb([True] * ncols)
                for r in rows[k:m]:
                    _binlog_image(body, [r[c] for c in tbl_cols], all_idx,
                                  tbl_cols, specs, codec)
            _binlog_event(out, _OP_ROWS[op], bytes(body), ts32)
            k = m
        _binlog_event(out, _EV_XID,
                      struct.pack("<Q", int(cts) & 0xFFFFFFFFFFFFFFFF), ts32)
        i = j
    while di < len(ddls):                    # barriers past the last txn
        d = ddls[di]
        _next_gtid(d.barrier_ts & 0xFFFFFFFF)
        _binlog_query(out, ddl_to_sql(d, table) +
                      f" /* barrier_ts={d.barrier_ts} */",
                      d.barrier_ts & 0xFFFFFFFF, schema_b)
        di += 1
    return bytes(out)


def binlog_txn_count(t: pa.Table, registry=None) -> int:
    """How many gnos encode_mysql_binlog will consume for this table:
    one per CONSECUTIVE commit_ts run (the encoder's txn grouping — the
    stream keeps the segment's row order, which is not necessarily
    commit_ts-monotonic) + interleaved DDLs — lets a multi-file writer
    chain gtid_start across segments without encoding twice."""
    n = 0
    if t.num_rows:
        cts = t["commit_ts"].to_numpy(zero_copy_only=False)
        n = 1 + int(np.sum(cts[1:] != cts[:-1]))
    return n + (len(registry.ddls) if registry is not None else 0)


class _BinlogTableMap:
    __slots__ = ("cols", "types", "metas", "unsigned", "codec")

    def __init__(self, cols, types, metas, unsigned, codec):
        self.cols, self.types, self.metas = cols, types, metas
        self.unsigned, self.codec = unsigned, codec


def _parse_table_map(data: bytes, pos: int, bend: int) -> _BinlogTableMap:
    pos += 8                                  # table_id(6) + flags(2)
    slen = data[pos]
    pos += 1 + slen + 1
    tlen = data[pos]
    pos += 1 + tlen + 1
    ncols, pos = _lenenc_read(data, pos)
    types = list(data[pos:pos + ncols])
    pos += ncols
    mlen, pos = _lenenc_read(data, pos)
    metas, mend = [0] * ncols, pos + mlen
    for ci, tc in enumerate(types):
        if tc == _MYSQL_BLOB:
            metas[ci] = data[pos]
            pos += 1
    assert pos == mend, "table-map metadata overrun"
    pos += (ncols + 7) // 8                   # nullability bitmap
    unsigned, coll, names = [False] * ncols, 255, None
    while pos < bend:                         # optional metadata TLVs
        ttype = data[pos]
        pos += 1
        tl, pos = _lenenc_read(data, pos)
        val = data[pos:pos + tl]
        pos += tl
        if ttype == _TLV_SIGNEDNESS:
            numeric = [ci for ci, tc in enumerate(types)
                       if tc in (_MYSQL_LONG, _MYSQL_LONGLONG)]
            for bi, ci in enumerate(numeric):
                unsigned[ci] = bool(val[bi >> 3] & (0x80 >> (bi & 7)))
        elif ttype == _TLV_DEFAULT_CHARSET:
            coll, _ = _lenenc_read(val, 0)
        elif ttype == _TLV_COLUMN_NAME:
            names, p2 = [], 0
            while p2 < len(val):
                ln, p2 = _lenenc_read(val, p2)
                names.append(val[p2:p2 + ln].decode())
                p2 += ln
    assert names is not None and len(names) == ncols, \
        "binlog TABLE_MAP lacks COLUMN_NAME metadata"
    return _BinlogTableMap(names, types, metas, unsigned,
                           _COLLATION_CODEC[coll])


def _read_binlog_image(data: bytes, pos: int, tmap: _BinlogTableMap,
                       present_idx: list[int]) -> tuple[dict, int]:
    nb = (len(present_idx) + 7) // 8
    nulls = data[pos:pos + nb]
    pos += nb
    vals = {}
    for bi, ci in enumerate(present_idx):
        col = tmap.cols[ci]
        if nulls[bi >> 3] >> (bi & 7) & 1:
            vals[col] = None
            continue
        tc = tmap.types[ci]
        if tc == _MYSQL_LONGLONG:
            u = struct.unpack_from("<Q", data, pos)[0]
            pos += 8
            vals[col] = u if tmap.unsigned[ci] else \
                (u - (1 << 64) if u >= 1 << 63 else u)
        elif tc == _MYSQL_LONG:
            vals[col] = struct.unpack_from(
                "<I" if tmap.unsigned[ci] else "<i", data, pos)[0]
            pos += 4
        else:
            lb = tmap.metas[ci]
            ln = int.from_bytes(data[pos:pos + lb], "little")
            pos += lb
            raw = data[pos:pos + ln]
            pos += ln
            vals[col] = np.frombuffer(raw, dtype="<i4").tolist() \
                if col in _LIST_COLS else raw.decode(tmap.codec)
    return vals, pos


def _decode_binlog_body(data: bytes, columns: list[str] | None,
                        ddl_sink: list | None = None) -> pa.Table:
    """Decode a run of whole binlog events (no file magic): every event's
    CRC32 is verified; rows come back as the canonical typed event table.
    Non-BEGIN QUERY events (DDL) are appended to `ddl_sink` when given."""
    pos, n = 0, len(data)
    tmap, recs, saw_update = None, [], False
    exp_set = {c for c in columns if c not in ("op", "pre_tokens")} \
        if columns is not None else None
    inferred: list[str] = []
    while pos < n:
        _ts, tc_ev, _sid, size, _logpos, _flags = \
            struct.unpack_from("<IBIIIH", data, pos)
        end = pos + size
        assert end <= n, "truncated binlog event"
        crc = struct.unpack_from("<I", data, end - 4)[0]
        assert crc == zlib.crc32(data[pos:end - 4]) & 0xFFFFFFFF, \
            f"binlog CRC mismatch in event type {tc_ev} at {pos}"
        bpos, bend = pos + 19, end - 4
        if tc_ev == _EV_FDE:
            assert data[bpos:bpos + 2] == b"\x04\x00", "not binlog v4"
            assert data[bend - 1] == 1, "unsupported checksum algorithm"
        elif tc_ev == _EV_TABLE_MAP:
            tmap = _parse_table_map(data, bpos, bend)
            # name-keyed projection (COLUMN_NAME TLV makes the stream
            # self-describing): a WAL segment straddling a DDL barrier
            # legitimately carries BOTH schemas (one TABLE_MAP per txn),
            # and the epoch reader range-filters the other side's rows —
            # so require comparability, not equality; disjoint schemas
            # still fail loudly
            if exp_set is not None:
                got = set(tmap.cols)
                assert exp_set <= got or got <= exp_set, \
                    f"TABLE_MAP columns {tmap.cols} incompatible with " \
                    f"requested {sorted(exp_set)}"
            for c in tmap.cols:
                if c not in inferred:
                    inferred.append(c)
        elif tc_ev in _ROWS_OP:
            assert tmap is not None, "ROWS event before TABLE_MAP"
            op = _ROWS_OP[tc_ev]
            p = bpos + 8                      # table_id + flags
            extra = struct.unpack_from("<H", data, p)[0]
            p += extra                        # extra-data (len incl. itself)
            ncols, p = _lenenc_read(data, p)
            assert ncols == len(tmap.cols), "rows/table-map column mismatch"
            nb = (ncols + 7) // 8
            bm1 = data[p:p + nb]
            p += nb
            pres1 = [ci for ci in range(ncols)
                     if bm1[ci >> 3] >> (ci & 7) & 1]
            if op == OP_UPDATE:
                bm2 = data[p:p + nb]
                p += nb
                pres2 = [ci for ci in range(ncols)
                         if bm2[ci >> 3] >> (ci & 7) & 1]
                saw_update = True
            while p < bend:
                img1, p = _read_binlog_image(data, p, tmap, pres1)
                if op == OP_UPDATE:
                    img2, p = _read_binlog_image(data, p, tmap, pres2)
                    rec = dict(img2)
                    rec["pre_tokens"] = img1.get("tokens")
                else:
                    rec = dict(img1)
                    rec["pre_tokens"] = None
                rec["op"] = op
                recs.append(rec)
            assert p == bend, "rows event overrun"
        elif tc_ev == _EV_QUERY and ddl_sink is not None:
            p = bpos
            _tid, _exec, slen, _err, svlen = struct.unpack_from("<IIBHH",
                                                                data, p)
            p += 13 + svlen + slen + 1
            sql = data[p:bend].decode()
            if sql != "BEGIN":
                ddl_sink.append(sql)
        pos = end
    assert pos == n, "trailing garbage after last binlog event"

    if columns is None:
        assert tmap is not None, "empty binlog needs an explicit column list"
        columns = ["op"] + inferred + (["pre_tokens"] if saw_update else [])
    cols = {c: [r.get(c) for r in recs] for c in columns}
    return pa.table({c: _typed_column(cols[c], c) for c in columns})


def decode_mysql_binlog(data: bytes,
                        columns: list[str] | None = None) -> pa.Table:
    """binlog file bytes → typed event table (CRC-verified)."""
    assert data[:4] == _BINLOG_MAGIC, "not a MySQL binlog file"
    return _decode_binlog_body(data[4:], columns)


def binlog_ddl_pairs(data: bytes) -> list[tuple[int, str]]:
    """binlog file bytes → [(barrier_ts, sql)] from its DDL QUERY events,
    sorted by barrier. The multi-file form of decode_binlog_ddls: a relay
    dir spreads DDLs across segment files, so registry reconstruction
    collects pairs per file, dedupes on barrier_ts, and renumbers once."""
    assert data[:4] == _BINLOG_MAGIC, "not a MySQL binlog file"
    sqls: list[str] = []
    _decode_binlog_body(data[4:], None, ddl_sink=sqls)
    parsed = []
    for sql in sqls:
        m = re.search(r"/\* barrier_ts=(\d+) \*/\s*$", sql)
        assert m, f"DDL query lacks barrier comment: {sql!r}"
        parsed.append((int(m.group(1)), sql[:m.start()].strip()))
    return sorted(parsed, key=lambda x: x[0])


def registry_from_ddl_pairs(pairs: list[tuple[int, str]]):
    """Deduped (barrier_ts, sql) pairs → SchemaRegistry (versions
    renumbered dense in barrier order, the registry contract)."""
    from ..stages.schema_evo import SchemaRegistry
    uniq: dict[int, str] = {}
    for bts, sql in pairs:
        prev = uniq.setdefault(bts, sql)
        assert prev == sql, f"conflicting DDLs at barrier {bts}"
    ordered = sorted(uniq.items())
    return SchemaRegistry([sql_to_ddl(sql, bts, i + 2)
                           for i, (bts, sql) in enumerate(ordered)])


def decode_binlog_ddls(data: bytes):
    """binlog file bytes → SchemaRegistry from its DDL QUERY events
    (versions renumbered dense in barrier order, the registry contract —
    same shape as decode_canal_ddl_lines)."""
    return registry_from_ddl_pairs(binlog_ddl_pairs(data))


def binlog_txn_ranges(data: bytes) -> list[tuple[int, int]]:
    """[(start, end)] byte ranges of whole transactions (QUERY BEGIN …
    XID) plus any auto-commit DDL QUERY events between them — a
    headers-only walk (event_size hops, no row decode), the binlog analog
    of avro_block_ranges. Ranges start AFTER the magic+FDE prologue; each
    is self-contained because every transaction re-announces its
    TABLE_MAP."""
    assert data[:4] == _BINLOG_MAGIC, "not a MySQL binlog file"
    pos, n, out, run_start = 4, len(data), [], None
    while pos < n:
        tc = data[pos + 4]
        size = struct.unpack_from("<I", data, pos + 9)[0]
        if run_start is None and tc != _EV_FDE:
            run_start = pos
        if tc == _EV_XID:
            out.append((run_start, pos + size))
            run_start = None
        pos += size
    assert pos == n, "truncated binlog"
    if run_start is not None:                 # trailing DDL-only run
        out.append((run_start, n))
    return out


def plan_binlog_splits(paths: list[str], columns: list[str] | None,
                       target_bytes: int = 8 << 20) -> list[dict]:
    """Transaction-level split planning for binlog WAL segments: ONE
    remote index task per file walks event headers and coalesces
    consecutive transactions into ~target_bytes ranges, so decode
    parallelism is txn-granular — one large binlog fans out instead of
    one-task-per-file (same shape as plan_avro_splits)."""
    import ray as _ray

    @_ray.remote
    def _index(path: str) -> list[dict]:
        with open(path, "rb") as f:
            data = f.read()
        if columns:
            # schema-file consistency, avro-planner parity: the first
            # TABLE_MAP's COLUMN_NAME set must be comparable to the meta
            # columns (subset/superset allowed — barrier straddlers)
            exp = {c for c in columns if c not in ("op", "pre_tokens")}
            pos = 4
            while pos < len(data):
                tc = data[pos + 4]
                size = struct.unpack_from("<I", data, pos + 9)[0]
                if tc == _EV_TABLE_MAP:
                    tm = _parse_table_map(data, pos + 19, pos + size - 4)
                    got = set(tm.cols)
                    assert exp <= got or got <= exp, \
                        f"{path}: TABLE_MAP columns {tm.cols} " \
                        f"incompatible with meta {sorted(exp)}"
                    break
                pos += size
        out, lo, hi = [], None, None
        for (s, e) in binlog_txn_ranges(data):
            if lo is None:
                lo, hi = s, e
            elif e - lo > target_bytes:
                out.append({"path": path, "start": lo, "end": hi})
                lo, hi = s, e
            else:
                hi = e
        if lo is not None:
            out.append({"path": path, "start": lo, "end": hi})
        return out

    nested = _ray.get([_index.remote(p) for p in paths])
    return [item for sub in nested for item in sub]


class BinlogRangeDecoder:
    """map_batches callable over plan_binlog_splits items: each row names
    a (path, byte-range) of whole transactions; the task seeks, reads ONLY
    its range and decodes — txn-granular parallelism, zero driver bytes."""

    def __init__(self, columns: list[str]):
        self.columns = list(columns)

    def __call__(self, t: pa.Table) -> pa.Table:
        tables = []
        for row in t.to_pylist():
            with open(row["path"], "rb") as f:
                f.seek(row["start"])
                data = f.read(row["end"] - row["start"])
            tables.append(_decode_binlog_body(data, self.columns))
        if tables:
            return pa.concat_tables(tables)
        return pa.table({c: _typed_column([], c) for c in self.columns})


class BinaryFileDecoder:
    """map_batches callable over `read_binary_files` batches (one WAL
    segment file per row): decode each binary payload (avro OCF or craft
    message) and concat. Consumes PYARROW batches — binary payloads must
    not round-trip through pandas (the repo's multimodal rule); the single
    bytes() per row below is the unavoidable copy the byte-walking decoder
    needs, not a format conversion of the whole batch."""

    _DECODERS = {"avro": decode_avro, "craft": decode_craft,
                 "mysql_binlog": decode_mysql_binlog}

    def __init__(self, fmt: str, columns: list[str]):
        assert fmt in self._DECODERS, fmt
        self.fmt, self.columns = fmt, list(columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        dec = self._DECODERS[self.fmt]
        tables = [dec(v.as_py(), self.columns) for v in batch["bytes"]]
        if tables:
            return pa.concat_tables(tables)
        return pa.table({c: _typed_column([], c) for c in self.columns})


class AvroFileDecoder(BinaryFileDecoder):
    """Back-compat alias: avro-only binary decoder."""

    def __init__(self, columns: list[str]):
        super().__init__("avro", columns)


class ChangeFileDecoder:
    """map_batches callable over `read_text` batches: decode csv/canal-json
    lines into the canonical typed event table. Constructed per epoch with
    the column order from the segment meta (the schema-file mechanism)."""

    _DECODERS = {
        "csv": decode_csv_lines,
        "canal_json": decode_canal_lines,
        "debezium": decode_debezium_lines,
        "open_protocol": decode_open_protocol_lines,
        "maxwell": decode_maxwell_lines,
        "simple": decode_simple_lines,
    }

    def __init__(self, fmt: str, columns: list[str]):
        assert fmt in self._DECODERS, fmt
        self.fmt, self.columns = fmt, list(columns)

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        return self._DECODERS[self.fmt](batch["text"].tolist(), self.columns)
