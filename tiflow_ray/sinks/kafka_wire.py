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
#     v0, Produce(0) v0+v3, Fetch(1) v0+v4 and ListOffsets(2) v0. Two
#     payload formats: v0 message sets (CRC32 over magic..value) and the
#     modern magic-2 RECORD BATCHES (Produce v3 / Fetch v4: zigzag
#     varints, relative offsets, CRC32C over attributes..records) that
#     every post-0.11 client speaks. Storage is format-v0 at rest; the
#     broker up-converts on Fetch v4 and down-converts on Fetch v0, the
#     same conversion path a real broker runs for old consumers.
#   KafkaLiteClient — produce / fetch / metadata / list_offsets speaking
#     the same frames (fmt="v2" by default, fmt="v0" for the legacy
#     path); every Ray sink task opens its own connection (the
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
import time
import zlib

_API_PRODUCE, _API_FETCH, _API_LIST_OFFSETS = 0, 1, 2
_API_METADATA, _API_VERSIONS = 3, 18
_API_OFFSET_COMMIT, _API_OFFSET_FETCH = 8, 9
_API_JOIN_GROUP, _API_HEARTBEAT = 11, 12
_API_LEAVE_GROUP, _API_SYNC_GROUP = 13, 14
_ERR_NONE, _ERR_OFFSET_OUT_OF_RANGE, _ERR_CORRUPT = 0, 1, 2
_ERR_UNKNOWN_TOPIC_OR_PARTITION = 3
_ERR_ILLEGAL_GENERATION, _ERR_UNKNOWN_MEMBER = 22, 25
_ERR_REBALANCE_IN_PROGRESS = 27
_SUPPORTED = {_API_PRODUCE: (0, 3), _API_FETCH: (0, 4),
              _API_LIST_OFFSETS: (0, 0), _API_METADATA: (0, 0),
              _API_OFFSET_COMMIT: (0, 0), _API_OFFSET_FETCH: (0, 0),
              _API_JOIN_GROUP: (0, 0), _API_HEARTBEAT: (0, 0),
              _API_LEAVE_GROUP: (0, 0), _API_SYNC_GROUP: (0, 0),
              _API_VERSIONS: (0, 0)}
# versions actually dispatched (the advertised range is contiguous, as
# the protocol requires; middle versions answer UNSUPPORTED_VERSION)
_DISPATCH = {_API_PRODUCE: (0, 3), _API_FETCH: (0, 4)}


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


# ------------------------------------------- magic-2 record batches (v2)
# The modern Kafka payload (KIP-98 message format v2, public spec):
# batches of zigzag-varint-framed records with relative offsets, guarded
# by CRC32C (Castagnoli) over attributes..records — a different
# polynomial than the v0 sets' CRC32, so it needs its own kernel.

_CRC32C_TABLES: list[list[int]] | None = None


def _crc32c_make_tables() -> list[list[int]]:
    poly = 0x82F63B78                     # Castagnoli, reflected
    t0 = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ (poly if c & 1 else 0)
        t0.append(c)
    tables = [t0]
    for _ in range(7):
        prev = tables[-1]
        tables.append([(prev[i] >> 8) ^ t0[prev[i] & 0xFF]
                       for i in range(256)])
    return tables


def crc32c(data: bytes) -> int:
    """CRC32C (slicing-by-8). Plenty for wire-test scale; a real
    deployment would bind a native kernel here."""
    global _CRC32C_TABLES
    if _CRC32C_TABLES is None:
        _CRC32C_TABLES = _crc32c_make_tables()
    t0, t1, t2, t3, t4, t5, t6, t7 = _CRC32C_TABLES
    crc = 0xFFFFFFFF
    n8 = len(data) & ~7
    i = 0
    while i < n8:
        b0, b1, b2, b3, b4, b5, b6, b7 = data[i:i + 8]
        crc ^= b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
        crc = (t7[crc & 0xFF] ^ t6[(crc >> 8) & 0xFF]
               ^ t5[(crc >> 16) & 0xFF] ^ t4[crc >> 24]
               ^ t3[b4] ^ t2[b5] ^ t1[b6] ^ t0[b7])
        i += 8
    for b in data[n8:]:
        crc = (crc >> 8) ^ t0[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _w_varint(buf: bytearray, v: int) -> None:
    """Zigzag varint (protobuf wire shape, as the v2 record format)."""
    z = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _r_varint(data: bytes, pos: int) -> tuple[int, int]:
    z = shift = 0
    while True:
        b = data[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


def encode_record_batch(records: list[tuple[bytes | None, bytes | None]],
                        base_offset: int = 0,
                        compression: str | None = None) -> bytes:
    """One magic-2 RecordBatch. Deterministic: timestamps are -1 ("no
    timestamp"), producer id/epoch/sequence -1 (no idempotent producer —
    same honesty note as the v0 path). `compression="gzip"` sets codec
    bits 0-2 = 1 and gzip-compresses the records section (header fields
    stay clear, CRC32C covers the compressed bytes — the published v2
    layout)."""
    assert compression in (None, "gzip"), compression
    recs = bytearray()
    for i, (k, v) in enumerate(records):
        rec = bytearray()
        rec.append(0)                               # record attributes
        _w_varint(rec, 0)                           # timestampDelta
        _w_varint(rec, i)                           # offsetDelta
        if k is None:
            _w_varint(rec, -1)
        else:
            _w_varint(rec, len(k))
            rec += k
        if v is None:
            _w_varint(rec, -1)
        else:
            _w_varint(rec, len(v))
            rec += v
        _w_varint(rec, 0)                           # headers
        _w_varint(recs, len(rec))
        recs += rec
    if compression == "gzip":
        import gzip
        recs = gzip.compress(bytes(recs), mtime=0)  # deterministic bytes
    body = bytearray()
    body += struct.pack(">h", 1 if compression == "gzip" else 0)
    body += struct.pack(">i", max(len(records) - 1, 0))  # lastOffsetDelta
    body += struct.pack(">qq", -1, -1)              # base/max timestamp
    body += struct.pack(">qhi", -1, -1, -1)         # pid, epoch, baseSeq
    body += struct.pack(">i", len(records))
    body += recs
    crc = crc32c(bytes(body))
    out = bytearray(struct.pack(">qi", base_offset, 4 + 1 + 4 + len(body)))
    out += struct.pack(">i", 0)                     # partitionLeaderEpoch
    out.append(2)                                   # magic
    out += struct.pack(">I", crc)
    out += body
    return bytes(out)


def decode_record_batches(data: bytes) -> list[tuple[int, bytes | None,
                                                     bytes | None]]:
    """[(offset, key, value)] across the concatenated batches in `data`;
    CRC32C-verified per batch; a partial trailing batch is dropped, as
    consumers must (the broker truncates fetch responses at max_bytes)."""
    out: list[tuple[int, bytes | None, bytes | None]] = []
    pos, n = 0, len(data)
    while pos + 12 <= n:
        base_offset, batch_len = struct.unpack_from(">qi", data, pos)
        if pos + 12 + batch_len > n:
            break                                    # partial trailing batch
        magic = data[pos + 16]
        if magic != 2:
            raise ValueError(f"unexpected magic {magic} in record batch")
        (crc,) = struct.unpack_from(">I", data, pos + 17)
        body = data[pos + 21:pos + 12 + batch_len]
        if crc != crc32c(body):
            raise ValueError(f"CRC32C mismatch at base offset {base_offset}")
        (attrs,) = struct.unpack_from(">h", body, 0)
        codec = attrs & 0x7
        (count,) = struct.unpack_from(">i", body, 36)
        if codec == 1:                               # gzip records section
            import gzip
            body = body[:40] + gzip.decompress(bytes(body[40:]))
        elif codec:
            raise ValueError(f"unsupported compression codec {codec}")
        p = 40
        for _ in range(count):
            rec_len, p = _r_varint(body, p)
            end = p + rec_len
            p += 1                                   # record attributes
            _tsd, p = _r_varint(body, p)
            odelta, p = _r_varint(body, p)
            klen, p = _r_varint(body, p)
            if klen < 0:
                key = None
            else:
                key = bytes(body[p:p + klen])
                p += klen
            vlen, p = _r_varint(body, p)
            if vlen < 0:
                value = None
            else:
                value = bytes(body[p:p + vlen])
                p += vlen
            out.append((base_offset + odelta, key, value))
            p = end                                  # skip headers
        pos += 12 + batch_len
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


class _GroupState:
    """One consumer group's coordinator state (the GroupCoordinator slot,
    in-memory like Kafka's — membership is ephemeral, offsets persist).

    Rebalance protocol: the first JoinGroup of a round opens a join
    window; every member that joins inside it lands in the same
    generation. The leader (lowest member id) computes assignments and
    SyncGroup distributes them. Heartbeats answer
    REBALANCE_IN_PROGRESS while a new round is open."""

    def __init__(self, rebalance_wait: float):
        self.cond = threading.Condition()
        self.rebalance_wait = rebalance_wait
        self.generation = 0
        self.state = "Empty"        # Empty | Joining | AwaitingSync | Stable
        self.joining: dict[str, bytes] = {}
        self.members: dict[str, bytes] = {}
        self.leader: str | None = None
        self.protocol = ""
        self.assignments: dict[str, bytes] = {}
        self.join_deadline = 0.0
        self.next_id = 0


class KafkaLiteBroker:
    """Single-node Kafka-wire broker over `log_dir`. Topics/partitions
    auto-create on first produce (the reference's kafka_manager creates
    the changefeed topic the same way). Group coordination (JoinGroup/
    SyncGroup/Heartbeat/LeaveGroup v0) and committed offsets
    (OffsetCommit/OffsetFetch v0, persisted under __groups/) carry the
    cmd/kafka-consumer consumer-group shape."""

    def __init__(self, log_dir: str, rebalance_wait: float = 0.2):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._logs: dict[tuple[str, int], _PartitionLog] = {}
        self._logs_lock = threading.Lock()
        self._groups: dict[str, _GroupState] = {}
        self._groups_lock = threading.Lock()
        self.rebalance_wait = rebalance_wait
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
                ok = lo <= ver <= hi and \
                    ver in _DISPATCH.get(api, (0,))  # only v0 + the
                if not ok:                           # record-batch version
                    resp = struct.pack(">h", 35)   # UNSUPPORTED_VERSION
                elif api == _API_VERSIONS:
                    resp = self._api_versions()
                elif api == _API_METADATA:
                    resp = self._metadata(body)
                elif api == _API_PRODUCE:
                    resp = self._produce(body, ver)
                elif api == _API_FETCH:
                    resp = self._fetch(body, ver)
                elif api == _API_LIST_OFFSETS:
                    resp = self._list_offsets(body)
                elif api == _API_OFFSET_COMMIT:
                    resp = self._offset_commit(body)
                elif api == _API_OFFSET_FETCH:
                    resp = self._offset_fetch(body)
                elif api == _API_JOIN_GROUP:
                    resp = self._join_group(body)
                elif api == _API_SYNC_GROUP:
                    resp = self._sync_group(body)
                elif api == _API_HEARTBEAT:
                    resp = self._heartbeat(body)
                else:
                    resp = self._leave_group(body)
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

    def _produce(self, body: bytes, ver: int = 0) -> bytes:
        """v0: message sets. v3 (record batches): a transactional_id
        leads the request, partition responses gain log_append_time and
        the response ends with throttle_time — both per the public
        request/response schemas."""
        pos = 0
        if ver >= 3:
            _txn, pos = _r_str(body, pos)
        _acks, _timeout, ntopics = struct.unpack_from(">hii", body, pos)
        pos += 10
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
                    decoded = decode_record_batches(mset) if ver >= 3 \
                        else decode_message_set(mset)
                    records = [(k, v) for _o, k, v in decoded]
                except ValueError:
                    out += struct.pack(">ihq", part, _ERR_CORRUPT, -1)
                    if ver >= 3:
                        out += struct.pack(">q", -1)
                    continue
                base = self._log(topic, part, create=True).append(records)
                out += struct.pack(">ihq", part, _ERR_NONE, base)
                if ver >= 3:
                    out += struct.pack(">q", -1)    # log_append_time
        if ver >= 3:
            out += struct.pack(">i", 0)             # throttle_time_ms
        return bytes(out)

    def _fetch(self, body: bytes, ver: int = 0) -> bytes:
        """v0: raw stored message-set bytes. v4: the response leads with
        throttle_time, partitions gain last_stable_offset + aborted-txn
        array, and the payload is an UP-CONVERTED magic-2 record batch —
        storage stays format-v0 at rest, the conversion happens on read
        exactly like a real broker serving a modern consumer from an old
        segment."""
        pos = 0
        if ver >= 4:
            _replica, _max_wait, _min_bytes, _max_total, _iso, ntopics = \
                struct.unpack_from(">iiiibi", body, 0)
            pos = 21
        else:
            _replica, _max_wait, _min_bytes, ntopics = \
                struct.unpack_from(">iiii", body, 0)
            pos = 16
        out = bytearray()
        if ver >= 4:
            out += struct.pack(">i", 0)             # throttle_time_ms
        out += struct.pack(">i", ntopics)
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

                def phdr(err: int, hw: int) -> bytes:
                    h = struct.pack(">ihq", part, err, hw)
                    if ver >= 4:                    # last_stable_offset +
                        h += struct.pack(">qi", hw, 0)  # no aborted txns
                    return h

                lp = self._log(topic, part, create=False)
                if lp is None:
                    out += phdr(_ERR_UNKNOWN_TOPIC_OR_PARTITION, -1)
                    out += struct.pack(">i", 0)
                    continue
                hw = lp.high_water()
                if offset > hw:
                    out += phdr(_ERR_OFFSET_OUT_OF_RANGE, hw)
                    out += struct.pack(">i", 0)
                    continue
                mset = lp.read(offset, max_bytes)
                if ver >= 4:
                    recs = decode_message_set(mset)
                    mset = encode_record_batch(
                        [(k, v) for _o, k, v in recs],
                        base_offset=recs[0][0]) if recs else b""
                out += phdr(_ERR_NONE, hw)
                out += struct.pack(">i", len(mset))
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


    # -- group coordination
    def _group(self, name: str) -> _GroupState:
        with self._groups_lock:
            g = self._groups.get(name)
            if g is None:
                g = self._groups[name] = _GroupState(self.rebalance_wait)
            return g

    def _offsets_path(self, group: str) -> str:
        d = os.path.join(self.log_dir, "__groups")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{group}.offsets.json")

    def _join_group(self, body: bytes) -> bytes:
        import json as _json
        group, pos = _r_str(body, 0)
        (_session_timeout,) = struct.unpack_from(">i", body, pos)
        pos += 4
        member, pos = _r_str(body, pos)
        _ptype, pos = _r_str(body, pos)
        (nproto,) = struct.unpack_from(">i", body, pos)
        pos += 4
        proto_name, meta = "", b""
        for i in range(nproto):
            nm, pos = _r_str(body, pos)
            mb, pos = _r_bytes(body, pos)
            if i == 0:
                proto_name, meta = nm, mb or b""
        g = self._group(group)
        with g.cond:
            if not member:
                g.next_id += 1
                member = f"member-{g.next_id}"
            if g.state in ("Empty", "Stable", "AwaitingSync"):
                g.state = "Joining"
                g.joining = {}
                g.join_deadline = time.monotonic() + g.rebalance_wait
                g.cond.notify_all()
            g.joining[member] = meta
            g.protocol = proto_name
            target = g.generation + 1
            while not self._stop.is_set():
                now = time.monotonic()
                if g.state == "Joining" and g.generation < target \
                        and now >= g.join_deadline:
                    g.generation = target
                    g.members = dict(g.joining)
                    g.leader = min(g.members)
                    g.assignments = {}
                    g.state = "AwaitingSync"
                    g.cond.notify_all()
                if g.generation >= target and g.state != "Joining":
                    break
                g.cond.wait(timeout=0.05)
            out = bytearray(struct.pack(">hi", _ERR_NONE, g.generation))
            _w_str(out, g.protocol)
            _w_str(out, g.leader)
            _w_str(out, member)
            mems = sorted(g.members.items()) if member == g.leader else []
            out += struct.pack(">i", len(mems))
            for mid, mmeta in mems:
                _w_str(out, mid)
                _w_bytes(out, mmeta)
            return bytes(out)

    def _sync_group(self, body: bytes) -> bytes:
        group, pos = _r_str(body, 0)
        (generation,) = struct.unpack_from(">i", body, pos)
        pos += 4
        member, pos = _r_str(body, pos)
        (nassign,) = struct.unpack_from(">i", body, pos)
        pos += 4
        given: dict[str, bytes] = {}
        for _ in range(nassign):
            mid, pos = _r_str(body, pos)
            ab, pos = _r_bytes(body, pos)
            given[mid] = ab or b""
        g = self._group(group)
        with g.cond:
            if member not in g.members:
                return struct.pack(">h", _ERR_UNKNOWN_MEMBER) + \
                    struct.pack(">i", -1)
            if generation != g.generation:
                return struct.pack(">h", _ERR_ILLEGAL_GENERATION) + \
                    struct.pack(">i", -1)
            if member == g.leader and given and g.state == "AwaitingSync":
                # a leader syncing into a round that a newcomer already
                # reopened must NOT flip the group Stable — it gets
                # REBALANCE_IN_PROGRESS below and rejoins instead
                g.assignments = given
                g.state = "Stable"
                g.cond.notify_all()
            while member not in g.assignments and g.state != "Joining" \
                    and not self._stop.is_set():
                g.cond.wait(timeout=0.05)
            if member not in g.assignments:
                return struct.pack(">h", _ERR_REBALANCE_IN_PROGRESS) + \
                    struct.pack(">i", -1)
            out = bytearray(struct.pack(">h", _ERR_NONE))
            _w_bytes(out, g.assignments[member])
            return bytes(out)

    def _heartbeat(self, body: bytes) -> bytes:
        group, pos = _r_str(body, 0)
        (generation,) = struct.unpack_from(">i", body, pos)
        pos += 4
        member, pos = _r_str(body, pos)
        g = self._group(group)
        with g.cond:
            if g.state == "Joining":
                return struct.pack(">h", _ERR_REBALANCE_IN_PROGRESS)
            if member not in g.members:
                return struct.pack(">h", _ERR_UNKNOWN_MEMBER)
            if generation != g.generation:
                return struct.pack(">h", _ERR_ILLEGAL_GENERATION)
            return struct.pack(">h", _ERR_NONE)

    def _leave_group(self, body: bytes) -> bytes:
        group, pos = _r_str(body, 0)
        member, pos = _r_str(body, pos)
        g = self._group(group)
        with g.cond:
            g.members.pop(member, None)
            g.joining.pop(member, None)
            g.assignments.pop(member, None)
            if not g.members:
                g.state = "Empty"
            else:
                # remaining members must rebalance (they learn via
                # REBALANCE_IN_PROGRESS on their next heartbeat)
                g.state = "Joining"
                g.joining = {}
                g.join_deadline = time.monotonic() + g.rebalance_wait
            g.cond.notify_all()
        return struct.pack(">h", _ERR_NONE)

    def _offset_commit(self, body: bytes) -> bytes:
        import json as _json
        group, pos = _r_str(body, 0)
        (ntopics,) = struct.unpack_from(">i", body, pos)
        pos += 4
        path = self._offsets_path(group)
        with self._groups_lock:
            stored = {}
            if os.path.exists(path):
                with open(path) as f:
                    stored = _json.load(f)
            out = bytearray(struct.pack(">i", ntopics))
            for _ in range(ntopics):
                topic, pos = _r_str(body, pos)
                (nparts,) = struct.unpack_from(">i", body, pos)
                pos += 4
                _w_str(out, topic)
                out += struct.pack(">i", nparts)
                for _ in range(nparts):
                    part, offset = struct.unpack_from(">iq", body, pos)
                    pos += 12
                    _meta, pos = _r_str(body, pos)
                    stored.setdefault(topic, {})[str(part)] = offset
                    out += struct.pack(">ih", part, _ERR_NONE)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                _json.dump(stored, f)
            os.replace(tmp, path)
        return bytes(out)

    def _offset_fetch(self, body: bytes) -> bytes:
        import json as _json
        group, pos = _r_str(body, 0)
        (ntopics,) = struct.unpack_from(">i", body, pos)
        pos += 4
        path = self._offsets_path(group)
        stored = {}
        if os.path.exists(path):
            with open(path) as f:
                stored = _json.load(f)
        out = bytearray(struct.pack(">i", ntopics))
        for _ in range(ntopics):
            topic, pos = _r_str(body, pos)
            (nparts,) = struct.unpack_from(">i", body, pos)
            pos += 4
            _w_str(out, topic)
            out += struct.pack(">i", nparts)
            for _ in range(nparts):
                (part,) = struct.unpack_from(">i", body, pos)
                pos += 4
                off = stored.get(topic, {}).get(str(part), -1)
                out += struct.pack(">iq", part, off)
                _w_str(out, "")
                out += struct.pack(">h", _ERR_NONE)
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
                records: list[tuple[bytes | None, bytes | None]],
                fmt: str = "v2", compression: str | None = None) -> int:
        """Append records; returns the base offset assigned. fmt="v2"
        (default) speaks Produce v3 with magic-2 record batches — what
        every modern client sends; fmt="v0" keeps the legacy message-set
        path. compression="gzip" (v2 only) compresses the records
        section, the sarama compression.codec knob."""
        assert fmt in ("v0", "v2"), fmt
        assert compression is None or fmt == "v2", \
            "compression is a record-batch (v2) option"
        body = bytearray()
        if fmt == "v2":
            _w_str(body, None)                      # transactional_id
        body += struct.pack(">hii", 1, 30000, 1)    # acks=1
        _w_str(body, topic)
        mset = encode_record_batch(records, compression=compression) \
            if fmt == "v2" else encode_message_set(records)
        body += struct.pack(">ii", 1, partition)
        body += struct.pack(">i", len(mset)) + mset
        r = self._call(_API_PRODUCE, 3 if fmt == "v2" else 0, bytes(body))
        pos = 4
        _t, pos = _r_str(r, pos)
        pos += 4
        part, err, base = struct.unpack_from(">ihq", r, pos)
        if err:
            raise RuntimeError(f"produce to {topic}/{part} failed: "
                               f"error {err}")
        return base

    def fetch(self, topic: str, partition: int, offset: int,
              max_bytes: int = 1 << 22, fmt: str = "v2") \
            -> tuple[int, list[tuple[int, bytes | None, bytes | None]]]:
        """(high_water, [(offset, key, value)]) from `offset`. Raises on
        OFFSET_OUT_OF_RANGE (offset past the high-water mark). fmt="v2"
        (default) speaks Fetch v4 and decodes magic-2 record batches."""
        assert fmt in ("v0", "v2"), fmt
        body = bytearray()
        if fmt == "v2":
            body += struct.pack(">iiiib", -1, 100, 1, max_bytes, 0)
        else:
            body += struct.pack(">iii", -1, 100, 1)
        body += struct.pack(">i", 1)
        _w_str(body, topic)
        body += struct.pack(">iiqi", 1, partition, offset, max_bytes)
        r = self._call(_API_FETCH, 4 if fmt == "v2" else 0, bytes(body))
        pos = 4
        if fmt == "v2":
            pos += 4                                # throttle_time_ms
        _t, pos = _r_str(r, pos)
        pos += 4
        part, err, hw = struct.unpack_from(">ihq", r, pos)
        pos += 14
        if fmt == "v2":
            pos += 8                                # last_stable_offset
            (naborted,) = struct.unpack_from(">i", r, pos)
            pos += 4 + 16 * max(naborted, 0)
        (mss,) = struct.unpack_from(">i", r, pos)
        pos += 4
        if err == _ERR_OFFSET_OUT_OF_RANGE:
            raise IndexError(f"offset {offset} past high water {hw} on "
                             f"{topic}/{part}")
        if err:
            raise RuntimeError(f"fetch {topic}/{part} failed: error {err}")
        payload = r[pos:pos + mss]
        recs = decode_record_batches(payload) if fmt == "v2" \
            else decode_message_set(payload)
        # a record batch decodes whole: drop records below the asked
        # offset (a v0-storage up-conversion starts at the stored record)
        return hw, [rec for rec in recs if rec[0] >= offset]

    def fetch_all(self, topic: str, partition: int, offset: int = 0,
                  fmt: str = "v2") \
            -> list[tuple[int, bytes | None, bytes | None]]:
        """Drain a partition from `offset` to the current high water,
        doubling max_bytes when a single message exceeds it (the
        fetch.max.bytes bump every Kafka consumer implements)."""
        out: list[tuple[int, bytes | None, bytes | None]] = []
        max_bytes = 1 << 22
        while True:
            hw, recs = self.fetch(topic, partition, offset, max_bytes, fmt)
            out.extend(recs)
            if recs:
                offset = recs[-1][0] + 1
            elif offset < hw:
                max_bytes *= 2
                continue
            if offset >= hw:
                return out

    # -- consumer groups
    def join_group(self, group: str, topics: list[str],
                   member_id: str = "",
                   session_timeout: int = 30000) \
            -> tuple[int, str, str, dict[str, bytes]]:
        """(generation, member_id, leader_id, members) — members is
        non-empty only for the leader (who must compute assignments)."""
        body = bytearray()
        _w_str(body, group)
        body += struct.pack(">i", session_timeout)
        _w_str(body, member_id)
        _w_str(body, "consumer")
        body += struct.pack(">i", 1)
        _w_str(body, "range")
        _w_bytes(body, _consumer_meta(topics))
        r = self._call(_API_JOIN_GROUP, 0, bytes(body))
        err, generation = struct.unpack_from(">hi", r, 0)
        if err:
            raise RuntimeError(f"join_group failed: error {err}")
        pos = 6
        _proto, pos = _r_str(r, pos)
        leader, pos = _r_str(r, pos)
        me, pos = _r_str(r, pos)
        (nmem,) = struct.unpack_from(">i", r, pos)
        pos += 4
        members: dict[str, bytes] = {}
        for _ in range(nmem):
            mid, pos = _r_str(r, pos)
            meta, pos = _r_bytes(r, pos)
            members[mid] = meta or b""
        return generation, me, leader, members

    def sync_group(self, group: str, generation: int, member_id: str,
                   assignments: dict[str, bytes] | None = None) -> bytes:
        body = bytearray()
        _w_str(body, group)
        body += struct.pack(">i", generation)
        _w_str(body, member_id)
        items = sorted((assignments or {}).items())
        body += struct.pack(">i", len(items))
        for mid, blob in items:
            _w_str(body, mid)
            _w_bytes(body, blob)
        r = self._call(_API_SYNC_GROUP, 0, bytes(body))
        (err,) = struct.unpack_from(">h", r, 0)
        if err:
            raise RuntimeError(f"sync_group failed: error {err}")
        blob, _ = _r_bytes(r, 2)
        return blob or b""

    def heartbeat(self, group: str, generation: int,
                  member_id: str) -> int:
        """Returns the error code (0 ok, 27 rebalance in progress, ...)."""
        body = bytearray()
        _w_str(body, group)
        body += struct.pack(">i", generation)
        _w_str(body, member_id)
        r = self._call(_API_HEARTBEAT, 0, bytes(body))
        return struct.unpack_from(">h", r, 0)[0]

    def leave_group(self, group: str, member_id: str) -> None:
        body = bytearray()
        _w_str(body, group)
        _w_str(body, member_id)
        self._call(_API_LEAVE_GROUP, 0, bytes(body))

    def offset_commit(self, group: str, topic: str,
                      offsets: dict[int, int]) -> None:
        body = bytearray()
        _w_str(body, group)
        body += struct.pack(">i", 1)
        _w_str(body, topic)
        body += struct.pack(">i", len(offsets))
        for part, off in sorted(offsets.items()):
            body += struct.pack(">iq", part, off)
            _w_str(body, "")
        r = self._call(_API_OFFSET_COMMIT, 0, bytes(body))
        pos = 4
        _t, pos = _r_str(r, pos)
        (nparts,) = struct.unpack_from(">i", r, pos)
        pos += 4
        for _ in range(nparts):
            part, err = struct.unpack_from(">ih", r, pos)
            pos += 6
            if err:
                raise RuntimeError(f"offset commit {topic}/{part}: {err}")

    def offset_fetch(self, group: str, topic: str,
                     partitions: list[int]) -> dict[int, int]:
        """Committed offsets; -1 where the group never committed."""
        body = bytearray()
        _w_str(body, group)
        body += struct.pack(">i", 1)
        _w_str(body, topic)
        body += struct.pack(">i", len(partitions))
        for p in partitions:
            body += struct.pack(">i", p)
        r = self._call(_API_OFFSET_FETCH, 0, bytes(body))
        pos = 4
        _t, pos = _r_str(r, pos)
        (nparts,) = struct.unpack_from(">i", r, pos)
        pos += 4
        out: dict[int, int] = {}
        for _ in range(nparts):
            part, off = struct.unpack_from(">iq", r, pos)
            pos += 12
            _meta, pos = _r_str(r, pos)
            (err,) = struct.unpack_from(">h", r, pos)
            pos += 2
            assert err == 0, err
            out[part] = off
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


# ------------------------------------------------- consumer protocol blobs

def _consumer_meta(topics: list[str]) -> bytes:
    """ConsumerProtocolSubscription v0: version, topic array, userdata."""
    out = bytearray(struct.pack(">h", 0))
    out += struct.pack(">i", len(topics))
    for t in topics:
        _w_str(out, t)
    _w_bytes(out, b"")
    return bytes(out)


def _consumer_meta_topics(blob: bytes) -> list[str]:
    (n,) = struct.unpack_from(">i", blob, 2)
    pos, out = 6, []
    for _ in range(n):
        t, pos = _r_str(blob, pos)
        out.append(t)
    return out


def _consumer_assignment(parts: dict[str, list[int]]) -> bytes:
    """ConsumerProtocolAssignment v0: version, [topic, partition array],
    userdata."""
    out = bytearray(struct.pack(">h", 0))
    out += struct.pack(">i", len(parts))
    for t in sorted(parts):
        _w_str(out, t)
        out += struct.pack(">i", len(parts[t]))
        for p in parts[t]:
            out += struct.pack(">i", p)
    _w_bytes(out, b"")
    return bytes(out)


def _consumer_assignment_parts(blob: bytes) -> dict[str, list[int]]:
    (n,) = struct.unpack_from(">i", blob, 2)
    pos, out = 6, {}
    for _ in range(n):
        t, pos = _r_str(blob, pos)
        (k,) = struct.unpack_from(">i", blob, pos)
        pos += 4
        out[t] = list(struct.unpack_from(f">{k}i", blob, pos))
        pos += 4 * k
    return out


def join_consumer_group(client: KafkaLiteClient, group: str,
                        topic: str) -> tuple[int, str, list[int]]:
    """Full join→(leader assigns)→sync round: returns (generation,
    member_id, assigned partitions). The leader runs the RANGE assignor
    (contiguous partition spans over sorted members — Kafka's default),
    everyone else syncs empty and receives its slice. A sync rejected
    with REBALANCE_IN_PROGRESS / ILLEGAL_GENERATION (a newcomer reopened
    the round) rejoins, keeping the member id — exactly the client loop
    every Kafka consumer runs."""
    me = ""
    while True:
        generation, me, leader, members = client.join_group(
            group, [topic], member_id=me)
        assignments = None
        if me == leader:
            parts = sorted(client.metadata([topic]).get(topic, []))
            mids = sorted(members)
            assert mids, "leader sees no members"
            span = (len(parts) + len(mids) - 1) // len(mids)
            per = {mid: parts[i * span:(i + 1) * span]
                   for i, mid in enumerate(mids)}
            assignments = {mid: _consumer_assignment({topic: ps})
                           for mid, ps in per.items()}
        try:
            blob = client.sync_group(group, generation, me, assignments)
        except RuntimeError as e:
            if "error 27" in str(e) or "error 22" in str(e):
                continue
            raise
        return generation, me, \
            _consumer_assignment_parts(blob).get(topic, [])
