"""MySQL wire protocol for the txn sink — K3 closed at the wire layer.

The reference's MySQL sink opens a pool of real connections and executes
the generated DML over COM_QUERY (cdc/sink/dmlsink/txn/mysql/mysql.go;
DM's dml_worker does the same per causality queue). The sandbox has no
MySQL server, so — like the replication master (sources/repl_protocol)
and the Kafka broker (sinks/kafka_wire) — the endpoint itself is
implemented here over loopback TCP on the PUBLIC client/server protocol:

  MySqlLiteServer — handshake v10 + mysql_native_password (the shared
    server_handshake — genuine ERR 1045 on bad credentials), then the
    text command phase: COM_QUERY executes against an embedded DuckDB
    (statements serialized under one lock — the single-writer engine
    slot), answering OK packets for DML/DDL and full text resultsets
    (lenenc column definitions + EOF + lenenc rows + EOF) for SELECTs;
    COM_PING / COM_INIT_DB answer OK; COM_QUIT ends the session. SQL
    errors come back as real ERR packets with the engine's message.
  MySqlWireClient — query() over an authenticated socket, parsing OK /
    ERR / resultset frames exactly as a driver does.

The engine's per-partition statement streams (sinks/sqlgen.py) apply
through CONCURRENT wire connections — one per partition group, the
reference's dmlWorker-pool shape; hash co-partitioning (the causality
detector) guarantees the workers touch disjoint keys.
"""

from __future__ import annotations

import socket
import struct
import threading

from ..sources.repl_protocol import (_err_packet, _recv_packet,
                                     _send_packet, client_handshake,
                                     server_handshake)

_COM_QUIT, _COM_INIT_DB, _COM_QUERY, _COM_PING = 0x01, 0x02, 0x03, 0x0E
_RESULT_PREFIXES = ("SELECT", "SHOW", "DESCRIBE", "WITH", "PRAGMA",
                    "EXPLAIN", "FROM", "VALUES")


# ------------------------------------------------------------- primitives

def _lenenc(n: int) -> bytes:
    if n < 251:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + struct.pack("<H", n)
    if n < 1 << 24:
        return b"\xfd" + struct.pack("<I", n)[:3]
    return b"\xfe" + struct.pack("<Q", n)


def _r_lenenc(data: bytes, pos: int) -> tuple[int, int]:
    b = data[pos]
    if b < 251:
        return b, pos + 1
    if b == 0xFC:
        return struct.unpack_from("<H", data, pos + 1)[0], pos + 3
    if b == 0xFD:
        return int.from_bytes(data[pos + 1:pos + 4], "little"), pos + 4
    return struct.unpack_from("<Q", data, pos + 1)[0], pos + 9


def _lenenc_str(b: bytes) -> bytes:
    return _lenenc(len(b)) + b


def _ok(affected: int = 0) -> bytes:
    return b"\x00" + _lenenc(affected) + _lenenc(0) \
        + struct.pack("<HH", 2, 0)       # status: autocommit; warnings 0


def _eof() -> bytes:
    return b"\xfe" + struct.pack("<HH", 0, 2)


def _coldef(name: str) -> bytes:
    """Column definition 4.1: every value travels as the text protocol's
    VAR_STRING (type 0xFD) — clients type by column metadata they were
    given elsewhere, exactly how this engine's reader re-types rows."""
    out = bytearray()
    out += _lenenc_str(b"def")
    out += _lenenc_str(b"")              # schema
    out += _lenenc_str(b"")              # table
    out += _lenenc_str(b"")              # org_table
    out += _lenenc_str(name.encode())
    out += _lenenc_str(name.encode())    # org_name
    out += bytes([0x0C])                 # fixed-length fields
    out += struct.pack("<H", 255)        # charset utf8mb4
    out += struct.pack("<I", 1 << 16)    # column length
    out += bytes([0xFD])                 # MYSQL_TYPE_VAR_STRING
    out += struct.pack("<H", 0)          # flags
    out += bytes([0x1F])                 # decimals
    out += b"\x00\x00"                   # filler
    return bytes(out)


# ----------------------------------------------------------------- server

class MySqlLiteServer:
    """Loopback MySQL-wire endpoint over an embedded DuckDB database."""

    def __init__(self, db_path: str | None = None, user: str = "sink",
                 password: str = "sink"):
        import duckdb
        self.user, self.password = user, password
        self.con = duckdb.connect(db_path or ":memory:")
        self._db_lock = threading.Lock()
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._sock: socket.socket | None = None
        self.host, self.port = "127.0.0.1", 0

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

    def execute(self, sql: str):
        """Driver-side convenience (setup/verification), same lock as the
        wire path."""
        with self._db_lock:
            return self.con.execute(sql).fetchall()

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
            if not server_handshake(conn, self.user, self.password,
                                    self._stop):
                return
            while not self._stop.is_set():
                try:
                    _seq, payload = _recv_packet(conn)
                except socket.timeout:
                    continue
                except (ConnectionError, OSError):
                    return
                cmd = payload[0]
                if cmd == _COM_QUIT:
                    return
                if cmd in (_COM_PING, _COM_INIT_DB):
                    _send_packet(conn, 1, _ok())
                    continue
                if cmd != _COM_QUERY:
                    _send_packet(conn, 1, _err_packet(
                        1047, f"unsupported command {cmd:#x}"))
                    continue
                self._query(conn, payload[1:].decode())
        except (OSError, ConnectionError):
            pass
        finally:
            conn.close()

    def _query(self, conn: socket.socket, sql: str) -> None:
        is_result = sql.lstrip().upper().startswith(_RESULT_PREFIXES)
        try:
            with self._db_lock:
                cur = self.con.execute(sql)
                rows = cur.fetchall() if is_result else None
                cols = [d[0] for d in cur.description] if is_result else []
        except Exception as e:              # engine error → real ERR packet
            _send_packet(conn, 1, _err_packet(1064, str(e)[:400]))
            return
        if not is_result:
            _send_packet(conn, 1, _ok())
            return
        seq = 1
        seq = _send_packet(conn, seq, _lenenc(len(cols)))
        for c in cols:
            seq = _send_packet(conn, seq, _coldef(c))
        seq = _send_packet(conn, seq, _eof())
        for r in rows:
            out = bytearray()
            for v in r:
                if v is None:
                    out += b"\xfb"
                else:
                    out += _lenenc_str(str(v).encode())
            seq = _send_packet(conn, seq, bytes(out))
        _send_packet(conn, seq, _eof())


# ----------------------------------------------------------------- client

class MySqlWireClient:
    """query() over one authenticated connection — the driver shape every
    sink worker holds (one connection per dmlWorker)."""

    def __init__(self, host: str, port: int, user: str = "sink",
                 password: str = "sink"):
        self.sock = client_handshake(host, port, user, password)

    def close(self) -> None:
        try:
            _send_packet(self.sock, 0, bytes([_COM_QUIT]))
        except OSError:
            pass
        self.sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def query(self, sql: str):
        """DML/DDL → affected-rows int; SELECT → (columns, rows) with
        every value a str or None (the text protocol's contract)."""
        _send_packet(self.sock, 0, bytes([_COM_QUERY]) + sql.encode())
        _seq, first = _recv_packet(self.sock)
        if first[:1] == b"\xff":
            code = struct.unpack_from("<H", first, 1)[0]
            raise RuntimeError(
                f"query failed ({code}): "
                f"{first[9:].decode(errors='replace')}")
        if first[:1] == b"\x00":
            affected, _pos = _r_lenenc(first, 1)
            return affected
        ncols, _pos = _r_lenenc(first, 0)
        cols = []
        for _ in range(ncols):
            _seq, cd = _recv_packet(self.sock)
            pos = 0
            for _f in range(4):              # def, schema, table, org_table
                n, pos = _r_lenenc(cd, pos)
                pos += n
            n, pos = _r_lenenc(cd, pos)
            cols.append(cd[pos:pos + n].decode())
        _seq, eof = _recv_packet(self.sock)
        assert eof[:1] == b"\xfe", "expected EOF after column definitions"
        rows = []
        while True:
            _seq, pkt = _recv_packet(self.sock)
            if pkt[:1] == b"\xfe" and len(pkt) < 9:
                return cols, rows
            if pkt[:1] == b"\xff":
                code = struct.unpack_from("<H", pkt, 1)[0]
                raise RuntimeError(f"query failed mid-rows ({code})")
            vals, pos = [], 0
            for _ in range(ncols):
                if pkt[pos:pos + 1] == b"\xfb":
                    vals.append(None)
                    pos += 1
                else:
                    n, pos = _r_lenenc(pkt, pos)
                    vals.append(pkt[pos:pos + n].decode())
                    pos += n
            rows.append(tuple(vals))


def apply_statement_stream(host: str, port: int, stmts: list[str],
                           user: str = "sink", password: str = "sink",
                           retries: int = 3) -> int:
    """One partition's statement stream over one connection, in order —
    the dmlWorker loop. Statements are safe-mode idempotent, so
    transient engine conflicts simply retry (mysql.go's retry loop
    relies on exactly this idempotence)."""
    applied = 0
    with MySqlWireClient(host, port, user, password) as c:
        for s in stmts:
            for attempt in range(retries):
                try:
                    c.query(s)
                    applied += 1
                    break
                except RuntimeError:
                    if attempt == retries - 1:
                        raise
    return applied
