# Kafka wire protocol over loopback TCP — the MQ sink's real transport.
# The reference produces through sarama to a Kafka cluster
# (`cdc/sink/dmlsink/mq/manager/kafka_manager.go`,
# `cdc/sink/dmlsink/mq/dmlproducer/kafka_dml_producer.go`) and consumes
# with `cmd/kafka-consumer/main.go`. This module is that wire hop,
# self-contained on the PUBLIC Kafka protocol spec (all integers
# big-endian; request = int32 size + [api_key int16, api_version int16,
# correlation_id int32, client_id nullable-string] + body; response =
# int32 size + correlation_id + body):
#
#   KafkaLiteBroker — single-node broker over an append-only on-disk log
#     (offset-dense records per (topic, partition), an .idx of byte
#     positions for O(1) seeks). Serves ApiVersions(18) v0, Metadata(3)
#     v0, Produce(0) v0, Fetch(1) v0 and ListOffsets(2) v0 with v0
#     message sets (CRC32-verified: crc covers magic..value).
#   KafkaLiteClient — produce / fetch / metadata / list_offsets speaking
#     the same frames; every Ray sink task opens its own connection (the
#     per-worker producer shape).
#
# Scale note: one broker partition = one append stream, exactly Kafka's
# contract; parallelism comes from partition count, and the pipeline
# glue (pipelines/mq.py) produces each partition from its own Ray task
# and fetches partitions independently. Broker memory is one request at
# a time; the log is the disk.

from __future__ import annotations

import os
import socket
import struct
import threading
import zlib

_API_PRODUCE, _API_FETCH, _API_LIST_OFFSETS = 0, 1, 2
_API_METADATA, _API_VERSIONS = 3, 18
_ERR_NONE, _ERR_OFFSET_OUT_OF_RANGE, _ERR_CORRUPT = 0, 1, 2
_ERR_UNKNOWN_TOPIC_OR_PARTITION = 3
_SUPPORTED = {_API_PRODUCE: (0, 0), _API_FETCH: (0, 0),
              _API_LIST_OFFSETS: (0, 0), _API_METADATA: (0, 0),
              _API_VERSIONS: (0, 0)}


# ------------------------------------------------------------ primitives

def _w_str(buf: bytearray, s: str | None) -> None:
    if s is None:
        buf += struct.pack(">h", -1)
    else:
        b = s.encode()
        buf += struct.pack(">h", len(b)) + b


def _r_str(data: bytes, pos: int) -> tuple[str | None, int]:
    (n,) = struct.unpack_from(">h", data, pos)
    pos += 2
    if n < 0:
        return None, pos
    return data[pos:pos + n].decode(), pos + n


def _w_bytes(buf: bytearray, b: bytes | None) -> None:
    if b is None:
        buf += struct.pack(">i", -1)
    else:
        buf += struct.pack(">i", len(b)) + b


def _r_bytes(data: bytes, pos: int) -> tuple[bytes | None, int]:
    (n,) = struct.unpack_from(">i", data, pos)
    pos += 4
    if n < 0:
        return None, pos
    return data[pos:pos + n], pos + n


def _message_v0(key: bytes | None, value: bytes | None) -> bytes:
    """One v0 Message: crc int32 over [magic, attributes, key, value]."""
    body = bytearray(b"\x00\x00")               # magic 0, attributes 0
    _w_bytes(body, key)
    _w_bytes(body, value)
    return struct.pack(">I", zlib.crc32(bytes(body)) & 0xFFFFFFFF) + bytes(body)


def encode_message_set(records: list[tuple[bytes | None, bytes | None]],
                       base_offset: int = 0) -> bytes:
    """v0 MessageSet: repeated [offset int64][size int32][message]."""
    out = bytearray()
    for i, (k, v) in enumerate(records):
        msg = _message_v0(k, v)
        out += struct.pack(">qi", base_offset + i, len(msg)) + msg
    return bytes(out)


def decode_message_set(data: bytes) -> list[tuple[int, bytes | None,
                                                  bytes | None]]:
    """[(offset, key, value)]; CRC-verified; a trailing partial message
    (Kafka truncates sets at max_bytes) is dropped, as consumers must."""
    out, pos, n = [], 0, len(data)
    while pos + 12 <= n:
        offset, size = struct.unpack_from(">qi", data, pos)
        if pos + 12 + size > n:
            break                                # partial trailing message
        msg = data[pos + 12:pos + 12 + size]
        (crc,) = struct.unpack_from(">I", msg, 0)
        if crc != zlib.crc32(msg[4:]) & 0xFFFFFFFF:
            raise ValueError(f"CRC mismatch at offset {offset}")
        assert msg[4] == 0, "only v0 messages supported"
        key, p = _r_bytes(msg, 6)
        value, p = _r_bytes(msg, p)
        out.append((offset, key, value))
        pos += 12 + size
    return out


def _send_frame(sock: socket.socket, payload: bytes) -> None:
    sock.sendall(struct.pack(">i", len(payload)) + payload)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        part = sock.recv(n - len(buf))
        if not part:
            raise ConnectionError("peer closed mid-frame")
        buf += part
    return bytes(buf)


def _recv_frame(sock: socket.socket) -> bytes:
    (n,) = struct.unpack(">i", _recv_exact(sock, 4))
    return _recv_exact(sock, n)


# ----------------------------------------------------------------- broker

class _PartitionLog:
    """Append-only record log + byte-position index. Records are the v0
    message bytes; the index file holds one int64 byte position per
    offset, so Fetch(offset) is one seek. Appends lock; reads don't (the
    log is append-only and readers bound themselves by the index)."""

    def __init__(self, path: str):
        self.log_path, self.idx_path = path + ".log", path + ".idx"
        self.lock = threading.Lock()
        if not os.path.exists(self.log_path):
            open(self.log_path, "ab").close()
            open(self.idx_path, "ab").close()

    def high_water(self) -> int:
        return os.path.getsize(self.idx_path) // 8

    def append(self, records: list[tuple[bytes | None, bytes | None]]) -> int:
        with self.lock:
            base = self.high_water()
            pos = os.path.getsize(self.log_path)
            idx = bytearray()
            blob = bytearray()
            for i, (k, v) in enumerate(records):
                msg = _message_v0(k, v)
                idx += struct.pack(">q", pos + len(blob))
                blob += struct.pack(">qi", base + i, len(msg)) + msg
            with open(self.log_path, "ab") as f:
                f.write(blob)
                f.flush()
            with open(self.idx_path, "ab") as f:
                f.write(idx)
                f.flush()
            return base

    def read(self, offset: int, max_bytes: int) -> bytes:
        hw = self.high_water()
        if offset >= hw:
            return b""
        with open(self.idx_path, "rb") as f:
            f.seek(offset * 8)
            (start,) = struct.unpack(">q", f.read(8))
        with open(self.log_path, "rb") as f:
            f.seek(start)
            return f.read(max_bytes)


class KafkaLiteBroker:
    """Single-node Kafka-wire broker over `log_dir`. Topics/partitions
    auto-create on first produce (the reference's kafka_manager creates
    the changefeed topic the same way)."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._logs: dict[tuple[str, int], _PartitionLog] = {}
        self._logs_lock = threading.Lock()
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._sock: socket.socket | None = None
        self.host, self.port = "127.0.0.1", 0

    # -- lifecycle (same shape as repl_protocol.BinlogDumpServer)
    def start(self) -> tuple[str, int]:
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind((self.host, 0))
        s.listen(32)
        s.settimeout(0.1)
        self._sock = s
        self.port = s.getsockname()[1]
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)
        return self.host, self.port

    def stop(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=5)
        if self._sock is not None:
            self._sock.close()

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    # -- storage
    def _log(self, topic: str, part: int, create: bool) -> _PartitionLog | None:
        with self._logs_lock:
            lp = self._logs.get((topic, part))
            if lp is None:
                d = os.path.join(self.log_dir, topic)
                path = os.path.join(d, f"p{part:05d}")
                if not create and not os.path.exists(path + ".log"):
                    return None
                os.makedirs(d, exist_ok=True)
                lp = _PartitionLog(path)
                self._logs[(topic, part)] = lp
            return lp

    def _topics(self) -> dict[str, list[int]]:
        out: dict[str, list[int]] = {}
        if os.path.isdir(self.log_dir):
            for t in sorted(os.listdir(self.log_dir)):
                d = os.path.join(self.log_dir, t)
                if os.path.isdir(d):
                    parts = sorted(int(f[1:-4]) for f in os.listdir(d)
                                   if f.endswith(".log"))
                    out[t] = parts
        return out

    # -- wire
    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            t = threading.Thread(target=self._serve_conn, args=(conn,),
                                 daemon=True)
            t.start()
            self._threads.append(t)

    def _serve_conn(self, conn: socket.socket) -> None:
        try:
            conn.settimeout(0.2)
            while not self._stop.is_set():
                try:
                    req = _recv_frame(conn)
                except socket.timeout:
                    continue
                except (ConnectionError, OSError):
                    return
                api, ver, corr = struct.unpack_from(">hhi", req, 0)
                _cid, pos = _r_str(req, 8)
                body = req[pos:]
                lo, hi = _SUPPORTED.get(api, (1, 0))
                if not lo <= ver <= hi:
                    resp = struct.pack(">h", 35)   # UNSUPPORTED_VERSION
                elif api == _API_VERSIONS:
                    resp = self._api_versions()
                elif api == _API_METADATA:
                    resp = self._metadata(body)
                elif api == _API_PRODUCE:
                    resp = self._produce(body)
                elif api == _API_FETCH:
                    resp = self._fetch(body)
                else:
                    resp = self._list_offsets(body)
                _send_frame(conn, struct.pack(">i", corr) + resp)
        except (OSError, ConnectionError):
            pass
        finally:
            conn.close()

    def _api_versions(self) -> bytes:
        out = bytearray(struct.pack(">h", _ERR_NONE))
        out += struct.pack(">i", len(_SUPPORTED))
        for k, (lo, hi) in sorted(_SUPPORTED.items()):
            out += struct.pack(">hhh", k, lo, hi)
        return bytes(out)

    def _metadata(self, body: bytes) -> bytes:
        (ntopics,) = struct.unpack_from(">i", body, 0)
        pos, want = 4, []
        for _ in range(max(ntopics, 0)):
            t, pos = _r_str(body, pos)
            want.append(t)
        topics = self._topics()
        names = want if want else sorted(topics)
        out = bytearray(struct.pack(">i", 1))      # brokers
        out += struct.pack(">i", 0)                # node_id
        _w_str(out, self.host)
        out += struct.pack(">i", self.port)
        out += struct.pack(">i", len(names))
        for t in names:
            parts = topics.get(t)
            out += struct.pack(">h", _ERR_NONE if parts is not None
                               else _ERR_UNKNOWN_TOPIC_OR_PARTITION)
            _w_str(out, t)
            parts = parts or []
            out += struct.pack(">i", len(parts))
            for p in parts:
                out += struct.pack(">hiii", _ERR_NONE, p, 0, 1)  # leader 0
                out += struct.pack(">i", 0)        # replicas
                out += struct.pack(">ii", 1, 0)    # isr = [0]
        return bytes(out)

    def _produce(self, body: bytes) -> bytes:
        _acks, _timeout, ntopics = struct.unpack_from(">hii", body, 0)
        pos = 10
        out = bytearray(struct.pack(">i", ntopics))
        for _ in range(ntopics):
            topic, pos = _r_str(body, pos)
            (nparts,) = struct.unpack_from(">i", body, pos)
            pos += 4
            _w_str(out, topic)
            out += struct.pack(">i", nparts)
            for _ in range(nparts):
                part, mss = struct.unpack_from(">ii", body, pos)
                pos += 8
                mset = body[pos:pos + mss]
                pos += mss
                try:
                    records = [(k, v) for _o, k, v in
                               decode_message_set(mset)]
                except ValueError:
                    out += struct.pack(">ihq", part, _ERR_CORRUPT, -1)
                    continue
                base = self._log(topic, part, create=True).append(records)
                out += struct.pack(">ihq", part, _ERR_NONE, base)
        return bytes(out)

    def _fetch(self, body: bytes) -> bytes:
        _replica, _max_wait, _min_bytes, ntopics = \
            struct.unpack_from(">iiii", body, 0)
        pos = 16
        out = bytearray(struct.pack(">i", ntopics))
        for _ in range(ntopics):
            topic, pos = _r_str(body, pos)
            (nparts,) = struct.unpack_from(">i", body, pos)
            pos += 4
            _w_str(out, topic)
            out += struct.pack(">i", nparts)
            for _ in range(nparts):
                part, offset, max_bytes = struct.unpack_from(">iqi", body,
                                                             pos)
                pos += 16
                lp = self._log(topic, part, create=False)
                if lp is None:
                    out += struct.pack(">ihqi", part,
                                       _ERR_UNKNOWN_TOPIC_OR_PARTITION,
                                       -1, 0)
                    continue
                hw = lp.high_water()
                if offset > hw:
                    out += struct.pack(">ihqi", part,
                                       _ERR_OFFSET_OUT_OF_RANGE, hw, 0)
                    continue
                mset = lp.read(offset, max_bytes)
                out += struct.pack(">ihqi", part, _ERR_NONE, hw, len(mset))
                out += mset
        return bytes(out)

    def _list_offsets(self, body: bytes) -> bytes:
        _replica, ntopics = struct.unpack_from(">ii", body, 0)
        pos = 8
        out = bytearray(struct.pack(">i", ntopics))
        for _ in range(ntopics):
            topic, pos = _r_str(body, pos)
            (nparts,) = struct.unpack_from(">i", body, pos)
            pos += 4
            _w_str(out, topic)
            out += struct.pack(">i", nparts)
            for _ in range(nparts):
                part, ts, _maxn = struct.unpack_from(">iqi", body, pos)
                pos += 16
                lp = self._log(topic, part, create=False)
                if lp is None:
                    out += struct.pack(">ihi", part,
                                       _ERR_UNKNOWN_TOPIC_OR_PARTITION, 0)
                    continue
                off = 0 if ts == -2 else lp.high_water()
                out += struct.pack(">ihi", part, _ERR_NONE, 1)
                out += struct.pack(">q", off)
        return bytes(out)


# ----------------------------------------------------------------- client

class KafkaLiteClient:
    """One connection, sequential correlation ids (the protocol permits
    pipelining; the sink tasks don't need it)."""

    def __init__(self, host: str, port: int, client_id: str = "tiflow-ray"):
        self.sock = socket.create_connection((host, port), timeout=30)
        self.client_id = client_id
        self._corr = 0

    def close(self) -> None:
        self.sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _call(self, api: int, ver: int, body: bytes) -> bytes:
        self._corr += 1
        req = bytearray(struct.pack(">hhi", api, ver, self._corr))
        _w_str(req, self.client_id)
        req += body
        _send_frame(self.sock, bytes(req))
        resp = _recv_frame(self.sock)
        (corr,) = struct.unpack_from(">i", resp, 0)
        assert corr == self._corr, f"correlation mismatch {corr}"
        return resp[4:]

    def api_versions(self) -> dict[int, tuple[int, int]]:
        r = self._call(_API_VERSIONS, 0, b"")
        (err, n) = struct.unpack_from(">hi", r, 0)
        assert err == 0, err
        out, pos = {}, 6
        for _ in range(n):
            k, lo, hi = struct.unpack_from(">hhh", r, pos)
            out[k] = (lo, hi)
            pos += 6
        return out

    def metadata(self, topics: list[str] | None = None) \
            -> dict[str, list[int]]:
        body = bytearray(struct.pack(">i", len(topics or [])))
        for t in topics or []:
            _w_str(body, t)
        r = self._call(_API_METADATA, 0, bytes(body))
        (nbrokers,) = struct.unpack_from(">i", r, 0)
        pos = 4
        for _ in range(nbrokers):
            pos += 4
            _host, pos = _r_str(r, pos)
            pos += 4
        (ntopics,) = struct.unpack_from(">i", r, pos)
        pos += 4
        out: dict[str, list[int]] = {}
        for _ in range(ntopics):
            (terr,) = struct.unpack_from(">h", r, pos)
            pos += 2
            name, pos = _r_str(r, pos)
            (nparts,) = struct.unpack_from(">i", r, pos)
            pos += 4
            parts = []
            for _ in range(nparts):
                _perr, part, _leader, _nrep = struct.unpack_from(
                    ">hiii", r, pos)
                pos += 14
                (nrep,) = struct.unpack_from(">i", r, pos - 4)
                pos += 4 * nrep
                (nisr,) = struct.unpack_from(">i", r, pos)
                pos += 4 + 4 * nisr
                parts.append(part)
            if terr == 0:
                out[name] = parts
        return out

    def produce(self, topic: str, partition: int,
                records: list[tuple[bytes | None, bytes | None]]) -> int:
        """Append records; returns the base offset assigned."""
        body = bytearray(struct.pack(">hii", 1, 30000, 1))   # acks=1
        _w_str(body, topic)
        mset = encode_message_set(records)
        body += struct.pack(">ii", 1, partition)
        body += struct.pack(">i", len(mset)) + mset
        r = self._call(_API_PRODUCE, 0, bytes(body))
        pos = 4
        _t, pos = _r_str(r, pos)
        pos += 4
        part, err, base = struct.unpack_from(">ihq", r, pos)
        if err:
            raise RuntimeError(f"produce to {topic}/{part} failed: "
                               f"error {err}")
        return base

    def fetch(self, topic: str, partition: int, offset: int,
              max_bytes: int = 1 << 22) \
            -> tuple[int, list[tuple[int, bytes | None, bytes | None]]]:
        """(high_water, [(offset, key, value)]) from `offset`. Raises on
        OFFSET_OUT_OF_RANGE (offset past the high-water mark)."""
        body = bytearray(struct.pack(">iiii", -1, 100, 1, 1))
        _w_str(body, topic)
        body += struct.pack(">iiqi", 1, partition, offset, max_bytes)
        r = self._call(_API_FETCH, 0, bytes(body))
        pos = 4
        _t, pos = _r_str(r, pos)
        pos += 4
        part, err, hw, mss = struct.unpack_from(">ihqi", r, pos)
        pos += 18
        if err == _ERR_OFFSET_OUT_OF_RANGE:
            raise IndexError(f"offset {offset} past high water {hw} on "
                             f"{topic}/{part}")
        if err:
            raise RuntimeError(f"fetch {topic}/{part} failed: error {err}")
        return hw, decode_message_set(r[pos:pos + mss])

    def fetch_all(self, topic: str, partition: int, offset: int = 0) \
            -> list[tuple[int, bytes | None, bytes | None]]:
        """Drain a partition from `offset` to the current high water,
        doubling max_bytes when a single message exceeds it (the
        fetch.max.bytes bump every Kafka consumer implements)."""
        out: list[tuple[int, bytes | None, bytes | None]] = []
        max_bytes = 1 << 22
        while True:
            hw, recs = self.fetch(topic, partition, offset, max_bytes)
            out.extend(recs)
            if recs:
                offset = recs[-1][0] + 1
            elif offset < hw:
                max_bytes *= 2
                continue
            if offset >= hw:
                return out

    def list_offsets(self, topic: str, partition: int,
                     earliest: bool = False) -> int:
        body = bytearray(struct.pack(">ii", -1, 1))
        _w_str(body, topic)
        body += struct.pack(">iiqi", 1, partition,
                            -2 if earliest else -1, 1)
        r = self._call(_API_LIST_OFFSETS, 0, bytes(body))
        pos = 4
        _t, pos = _r_str(r, pos)
        pos += 4
        part, err, n = struct.unpack_from(">ihi", r, pos)
        pos += 10
        if err:
            raise RuntimeError(f"list_offsets {topic}/{part}: error {err}")
        assert n == 1
        return struct.unpack_from(">q", r, pos)[0]
