"""File-backed Avro schema registry + Confluent wire format.

The reference's avro MQ protocol registers key/value schemas with an
external Confluent-compatible schema registry and frames every Kafka
message with the PUBLIC Confluent wire format — one magic byte ``0x00``
followed by the big-endian uint32 schema id, then the bare avro binary
datum (cdc/pkg/sink/codec/avro/avro.go + schema registry client in
pkg/sink/codec/avro/schema_registry.go; wire format is Confluent's
published spec, not reference code). The sandbox has no registry
service, so the registry collapses to its storage essence: a directory
on the shared lake filesystem holding versioned subjects and globally
unique schema ids.

Layout (all writes atomic, safe for concurrent actor-side registration):

    <root>/ids/{id:08d}.json              {"subject", "version", "schema"}
    <root>/subjects/{subject}/v{ver:05d}.json   {"id": N}

Registration is idempotent: re-registering a subject's existing schema
(canonical-JSON compare) returns the already-assigned id, matching the
registry semantics the reference's schemaManager caches rely on.
"""

from __future__ import annotations

import json
import os
import struct
import threading
import time

import pyarrow as pa

_MAGIC = b"\x00"


def _canon(schema_json: str) -> str:
    return json.dumps(json.loads(schema_json), sort_keys=True,
                      separators=(",", ":"))


def _load_json_retry(path: str, attempts: int = 200) -> dict:
    """Read a registry file that a concurrent writer may have O_EXCL-
    created but not yet filled (the claim→fill window is a few µs; the
    claim file is the arbitration, so the content follows immediately).
    Retries JSON parse briefly instead of failing the scan."""
    for i in range(attempts):
        try:
            with open(path) as f:
                return json.load(f)
        except (json.JSONDecodeError, ValueError):
            time.sleep(0.001 * min(i + 1, 10))
    raise ValueError(f"registry file {path} never became parsable")


class AvroSchemaRegistry:
    """Minimal Confluent-registry analog over a shared directory."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "ids"), exist_ok=True)
        os.makedirs(os.path.join(root, "subjects"), exist_ok=True)
        self._by_id: dict[int, str] = {}      # id -> canonical schema json
        self._reg_lock = threading.Lock()     # in-process serialization

    # -- lookups ----------------------------------------------------------
    def schema_by_id(self, schema_id: int) -> str:
        if schema_id not in self._by_id:
            p = os.path.join(self.root, "ids", f"{schema_id:08d}.json")
            if not os.path.exists(p):
                raise FileNotFoundError(p)
            self._by_id[schema_id] = _load_json_retry(p)["schema"]
        return self._by_id[schema_id]

    def versions(self, subject: str) -> list[int]:
        d = os.path.join(self.root, "subjects", subject)
        if not os.path.isdir(d):
            return []
        return sorted(int(n[1:-5]) for n in os.listdir(d)
                      if n.startswith("v") and n.endswith(".json"))

    def latest(self, subject: str) -> tuple[int, str] | None:
        vs = self.versions(subject)
        if not vs:
            return None
        d = os.path.join(self.root, "subjects", subject)
        sid = _load_json_retry(os.path.join(d, f"v{vs[-1]:05d}.json"))["id"]
        return sid, self.schema_by_id(sid)

    # -- registration -----------------------------------------------------
    def register(self, subject: str, schema_json: str) -> int:
        """Idempotent register: the schema's existing id under `subject`
        if already present, else a fresh global id + next subject version.
        Concurrency-safe across processes without locks: O_EXCL creates
        arbitrate version slots, and the winner re-checks the versions
        BELOW its slot for the same canonical schema — a racer that
        registered the schema between our scan and our slot win is
        detected and its id reused (one id per canonical schema, always).
        An in-process lock additionally serializes threads sharing one
        instance (the registry HTTP service)."""
        with self._reg_lock:
            return self._register_locked(subject, schema_json)

    def _register_locked(self, subject: str, schema_json: str) -> int:
        canon = _canon(schema_json)
        sdir = os.path.join(self.root, "subjects", subject)
        os.makedirs(sdir, exist_ok=True)
        while True:
            found = self._find_canon(subject, canon)
            if found is not None:
                return found
            ver = (self.versions(subject) or [0])[-1] + 1
            try:
                fd = os.open(os.path.join(sdir, f"v{ver:05d}.json"),
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                continue    # another writer took this version: rescan
            # we own slot `ver`; a concurrent writer may have registered
            # this same schema in a version that landed after our scan —
            # only versions < ver can exist, so rescan them and reuse
            prior = self._find_canon(subject, canon, below=ver)
            sid = prior if prior is not None \
                else self._alloc_id(subject, canon)
            with os.fdopen(fd, "w") as f:
                json.dump({"id": sid}, f)
            return sid

    def _find_canon(self, subject: str, canon: str,
                    below: int | None = None) -> int | None:
        sdir = os.path.join(self.root, "subjects", subject)
        for v in self.versions(subject):
            if below is not None and v >= below:
                continue
            sid = _load_json_retry(
                os.path.join(sdir, f"v{v:05d}.json"))["id"]
            if self.schema_by_id(sid) == canon:
                return sid
        return None

    def _alloc_id(self, subject: str, canon: str) -> int:
        ids_dir = os.path.join(self.root, "ids")
        while True:
            taken = [int(n[:-5]) for n in os.listdir(ids_dir)
                     if n.endswith(".json")]
            sid = (max(taken) + 1) if taken else 1
            try:
                fd = os.open(os.path.join(ids_dir, f"{sid:08d}.json"),
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                continue    # raced: try the next id
            with os.fdopen(fd, "w") as f:
                json.dump({"subject": subject,
                           "version": len(self.versions(subject)) + 1,
                           "schema": canon}, f)
            self._by_id[sid] = canon
            return sid


# -- Confluent wire format ------------------------------------------------

def frame_message(schema_id: int, datum: bytes) -> bytes:
    """magic 0x00 + big-endian uint32 schema id + avro binary datum."""
    return _MAGIC + struct.pack(">I", schema_id) + datum


def unframe_message(msg: bytes) -> tuple[int, bytes]:
    assert msg[:1] == _MAGIC, "not a Confluent-framed avro message"
    return struct.unpack(">I", msg[1:5])[0], msg[5:]


def encode_avro_messages(t: pa.Table, schema_id: int,
                         schema_json: str) -> list[bytes]:
    """One Confluent-framed avro binary message per event row, encoded
    against the REGISTERED schema (field order from the registry, not
    the local table)."""
    from ..sources.codecs import _avro_datum_write
    fields = [(f["name"], f["type"])
              for f in json.loads(schema_json)["fields"]]
    out = []
    for row in t.to_pylist():
        buf = bytearray()
        _avro_datum_write(buf, row, fields)
        out.append(frame_message(schema_id, bytes(buf)))
    return out


class AvroMessageDecoder:
    """map_batches callable decoding Confluent-framed message payloads
    back to the canonical typed event table. Holds a registry handle and
    a per-actor id→fields cache (the reference schemaManager's cache) —
    construct once per actor, decode per batch."""

    def __init__(self, registry_root: str, columns: list[str]):
        # registry_root is a spec: http:// URL → REST client, else a
        # shared-directory root (see schema_registry_http.open_registry)
        from .schema_registry_http import open_registry
        self.registry = open_registry(registry_root)
        self.columns = list(columns)
        self._fields: dict[int, list] = {}

    def _fields_for(self, sid: int) -> list:
        if sid not in self._fields:
            sch = json.loads(self.registry.schema_by_id(sid))
            self._fields[sid] = [(f["name"], f["type"])
                                 for f in sch["fields"]]
        return self._fields[sid]

    def decode(self, payloads: list[bytes]) -> pa.Table:
        from ..sources.codecs import _avro_datum_read, _typed_column
        cols: dict[str, list] = {c: [] for c in self.columns}
        for msg in payloads:
            sid, datum = unframe_message(msg)
            row, _ = _avro_datum_read(datum, 0, self._fields_for(sid))
            for c in self.columns:
                cols[c].append(row.get(c))
        return pa.table({c: _typed_column(v, c) for c, v in cols.items()})
