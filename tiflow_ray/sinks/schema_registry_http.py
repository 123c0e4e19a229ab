"""Confluent-compatible Schema Registry over loopback HTTP.

The reference's avro codec talks to a Confluent Schema Registry through
its PUBLIC REST API (pkg/sink/codec/avro/schema_registry.go: POST
/subjects/{subject}-value/versions to register, GET /schemas/ids/{id}
to resolve — the API is Confluent's published spec, not reference
code). The sandbox has no external registry service, so — like the
MySQL replication wire (sources/repl_protocol.py) and the Kafka wire
(sinks/kafka_wire.py) — the protocol layer is implemented here over
loopback TCP, backed by the same directory store the file-backed
`AvroSchemaRegistry` uses. Both access paths observe ONE registry: a
producer can register over HTTP and a consumer resolve via the shared
directory, or vice versa.

Endpoints (Content-Type application/vnd.schemaregistry.v1+json):

    POST /subjects/{subject}/versions   {"schema": s}   -> {"id": N}
    POST /subjects/{subject}            {"schema": s}   -> {subject,
                                          version, id, schema} | 40403
    GET  /schemas/ids/{id}                              -> {"schema": s}
    GET  /subjects                                      -> [subject, ...]
    GET  /subjects/{subject}/versions                   -> [1, 2, ...]
    GET  /subjects/{subject}/versions/latest            -> {subject,
                                                version, id, schema}
    GET  /subjects/{subject}/versions/{n}               -> same, at n

Error bodies follow the published convention: 40401 subject not found,
40402 version not found, 40403 schema not found, 42201 invalid schema.
Registration is idempotent and concurrency-safe: the directory store
arbitrates with O_EXCL creates, so racing registrations of the same
schema converge on one id (across threads, processes, and access
paths).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.error import HTTPError
from urllib.request import Request, urlopen

from .avro_registry import AvroSchemaRegistry, _canon

CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"


def open_registry(spec: str):
    """Registry handle from a spec: an ``http://`` URL opens the REST
    client, anything else is a shared-directory root."""
    if spec.startswith("http://") or spec.startswith("https://"):
        return HttpSchemaRegistry(spec)
    return AvroSchemaRegistry(spec)


# --------------------------------------------------------------------------
# server


class _Handler(BaseHTTPRequestHandler):
    # the backing store is set on the server object by SchemaRegistryServer
    protocol_version = "HTTP/1.1"

    # -- plumbing ----------------------------------------------------------
    def log_message(self, fmt, *args):      # no stderr chatter per request
        pass

    def _reply(self, code: int, body) -> None:
        data = json.dumps(body).encode()
        self.send_response(code)
        self.send_header("Content-Type", CONTENT_TYPE)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _err(self, http_code: int, error_code: int, msg: str) -> None:
        self._reply(http_code, {"error_code": error_code, "message": msg})

    def _store(self) -> AvroSchemaRegistry:
        return self.server.store                    # type: ignore[attr-defined]

    def _body_schema(self) -> str | None:
        n = int(self.headers.get("Content-Length", 0))
        try:
            doc = json.loads(self.rfile.read(n))
            schema = doc["schema"]
            json.loads(schema)                      # must parse as JSON
            return schema
        except (ValueError, KeyError, TypeError):
            self._err(422, 42201, "Invalid schema")
            return None

    def _version_body(self, subject: str, ver: int) -> dict | None:
        store = self._store()
        vs = store.versions(subject)
        if not vs:
            self._err(404, 40401, f"Subject '{subject}' not found.")
            return None
        if ver == -1:                               # latest
            ver = vs[-1]
        if ver not in vs:
            self._err(404, 40402, f"Version {ver} not found.")
            return None
        import os

        from .avro_registry import _load_json_retry
        sdir = os.path.join(store.root, "subjects", subject)
        sid = _load_json_retry(os.path.join(sdir, f"v{ver:05d}.json"))["id"]
        return {"subject": subject, "version": ver, "id": sid,
                "schema": store.schema_by_id(sid)}

    # -- routes ------------------------------------------------------------
    def do_GET(self):                               # noqa: N802 (http API)
        parts = [p for p in self.path.split("/") if p]
        store = self._store()
        if parts == ["subjects"]:
            import os
            d = os.path.join(store.root, "subjects")
            subs = sorted(os.listdir(d)) if os.path.isdir(d) else []
            return self._reply(200, subs)
        if len(parts) == 3 and parts[:2] == ["schemas", "ids"]:
            try:
                return self._reply(
                    200, {"schema": store.schema_by_id(int(parts[2]))})
            except (FileNotFoundError, ValueError):
                return self._err(404, 40403, "Schema not found")
        if len(parts) == 3 and parts[0] == "subjects" \
                and parts[2] == "versions":
            vs = store.versions(parts[1])
            if not vs:
                return self._err(404, 40401,
                                 f"Subject '{parts[1]}' not found.")
            return self._reply(200, vs)
        if len(parts) == 4 and parts[0] == "subjects" \
                and parts[2] == "versions":
            ver = -1 if parts[3] == "latest" else int(parts[3])
            body = self._version_body(parts[1], ver)
            if body is not None:
                self._reply(200, body)
            return
        return self._err(404, 40401, f"no route {self.path}")

    def do_POST(self):                              # noqa: N802 (http API)
        parts = [p for p in self.path.split("/") if p]
        store = self._store()
        if len(parts) == 3 and parts[0] == "subjects" \
                and parts[2] == "versions":         # register
            schema = self._body_schema()
            if schema is not None:
                self._reply(200, {"id": store.register(parts[1], schema)})
            return
        if len(parts) == 2 and parts[0] == "subjects":   # check/lookup
            schema = self._body_schema()
            if schema is None:
                return
            canon = _canon(schema)
            subject = parts[1]
            vs = store.versions(subject)
            if not vs:
                return self._err(404, 40401,
                                 f"Subject '{subject}' not found.")
            for v in vs:
                body = self._version_body(subject, v)
                if body and body["schema"] == canon:
                    return self._reply(200, body)
            return self._err(404, 40403, "Schema not found")
        return self._err(404, 40401, f"no route {self.path}")


class SchemaRegistryServer:
    """Loopback registry service over a shared directory store.

    Context manager:

        with SchemaRegistryServer(root) as srv:
            reg = HttpSchemaRegistry(srv.url)
    """

    def __init__(self, root: str, host: str = "127.0.0.1", port: int = 0):
        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self._httpd.daemon_threads = True
        self._httpd.store = AvroSchemaRegistry(root)    # type: ignore
        self.host, self.port = self._httpd.server_address[:2]
        self.url = f"http://{self.host}:{self.port}"
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# --------------------------------------------------------------------------
# client


class HttpSchemaRegistry:
    """REST client with the same surface as the file-backed
    `AvroSchemaRegistry` (register / schema_by_id / versions / latest),
    so `MqSinkStage` and `AvroMessageDecoder` take either interchangeably.
    Resolved ids are cached per instance — ids are immutable, so the
    cache never invalidates (the reference schemaManager caches the same
    way)."""

    def __init__(self, url: str):
        self.url = url.rstrip("/")
        self._by_id: dict[int, str] = {}

    def _call(self, method: str, path: str, body: dict | None = None):
        data = json.dumps(body).encode() if body is not None else None
        req = Request(self.url + path, data=data, method=method,
                      headers={"Content-Type": CONTENT_TYPE})
        with urlopen(req, timeout=30) as resp:
            return json.loads(resp.read())

    def register(self, subject: str, schema_json: str) -> int:
        return int(self._call(
            "POST", f"/subjects/{subject}/versions",
            {"schema": schema_json})["id"])

    def schema_by_id(self, schema_id: int) -> str:
        if schema_id not in self._by_id:
            try:
                doc = self._call("GET", f"/schemas/ids/{schema_id}")
            except HTTPError as e:
                raise FileNotFoundError(
                    f"schema id {schema_id} not in registry") from e
            self._by_id[schema_id] = doc["schema"]
        return self._by_id[schema_id]

    def versions(self, subject: str) -> list[int]:
        try:
            return [int(v) for v in
                    self._call("GET", f"/subjects/{subject}/versions")]
        except HTTPError as e:
            if e.code == 404:
                return []
            raise

    def latest(self, subject: str) -> tuple[int, str] | None:
        try:
            doc = self._call("GET",
                             f"/subjects/{subject}/versions/latest")
        except HTTPError as e:
            if e.code == 404:
                return None
            raise
        return int(doc["id"]), doc["schema"]
