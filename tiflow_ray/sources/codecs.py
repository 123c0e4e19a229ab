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

import json
import re

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
