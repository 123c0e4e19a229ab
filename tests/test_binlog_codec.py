"""MySQL binlog v4 file-format codec (the DM binlog-reader/relay slot, S4):
byte-level framing, CRC verification, charset TLVs, txn-granular splits,
in-stream DDL, and end-to-end replay parity (dm/pkg/binlog/reader +
dm/relay/relay.go consume the same public layout via go-mysql)."""

import numpy as np
import pyarrow as pa
import pytest

from tiflow_ray.sources.codecs import (BinlogRangeDecoder, _BINLOG_MAGIC,
                                       binlog_txn_ranges, decode_binlog_ddls,
                                       decode_mysql_binlog,
                                       encode_mysql_binlog,
                                       plan_binlog_splits)


def _sample_table() -> pa.Table:
    return pa.table({
        "op": pa.array([3, 1, 2, 2, 3], pa.uint8()),
        "commit_ts": pa.array([10, 10, 12, 12, 13], pa.uint64()),
        "start_ts": pa.array([9, 8, 11, 11, 12], pa.uint64()),
        "doc_id": pa.array(['d"q', "dx", "d2", "d3", "zz"]),
        "tokens": pa.array([[1, -2, 3], None, [], [5], None],
                           pa.list_(pa.int32())),
        "pre_tokens": pa.array([None, None, [7, 8], None, None],
                               pa.list_(pa.int32())),
        "n_tok": pa.array([3, None, 0, 1, -4], pa.int32()),
        "source": pa.array(["web", None, "x\ny", "é汉🙂", ""]),
        "schema_ver": pa.array([1, 1, 2, 2, 2], pa.int32()),
    })


def test_binlog_roundtrip_bit_exact():
    """Magic + FDE + per-txn BEGIN/TABLE_MAP/ROWS/XID framing round-trips
    the canonical typed event table bit-exactly: multi-row txns, op runs,
    minimal update before-images (pre_tokens None vs [] vs values), nulls,
    negative ints, unicode, embedded newlines."""
    t = _sample_table()
    blob = encode_mysql_binlog(t)
    assert blob[:4] == _BINLOG_MAGIC
    got = decode_mysql_binlog(blob, list(t.column_names))
    assert got.equals(t)
    # self-describing: column order is recoverable without the meta
    inferred = decode_mysql_binlog(blob)
    assert set(inferred.column_names) == set(t.column_names)
    # projection is by NAME (COLUMN_NAME TLV), so any requested order
    # decodes correctly — but an incompatible schema fails loudly
    reordered = decode_mysql_binlog(blob, list(reversed(t.column_names)))
    assert reordered.select(t.column_names).equals(t)
    with pytest.raises(AssertionError, match="incompatible"):
        decode_mysql_binlog(blob, ["op", "commit_ts", "wrong_col",
                                   "other_col"])


def test_binlog_crc_detects_corruption():
    """binlog_checksum=CRC32: flipping any payload byte fails decode."""
    blob = bytearray(encode_mysql_binlog(_sample_table()))
    blob[len(blob) // 2] ^= 0xFF
    with pytest.raises(AssertionError, match="CRC"):
        decode_mysql_binlog(bytes(blob), None)


def test_binlog_charset_tlv_declared_not_assumed():
    """DEFAULT_CHARSET TLV (mounter charset conversion, cdc/entry/
    mounter.go charset handling): gbk payload bytes on disk differ from
    utf-8, decode recovers the identical table from the DECLARED
    collation; latin1 strictly rejects unencodable text."""
    t = pa.table({
        "op": pa.array([3, 3], pa.uint8()),
        "commit_ts": pa.array([10, 11], pa.uint64()),
        "start_ts": pa.array([1, 2], pa.uint64()),
        "doc_id": pa.array(["a", "b"]),
        "source": pa.array(["汉字测试", "ascii"]),
        "schema_ver": pa.array([1, 1], pa.int32()),
    })
    utf8 = encode_mysql_binlog(t, charset="utf8mb4")
    gbk = encode_mysql_binlog(t, charset="gbk")
    gb18030 = encode_mysql_binlog(t, charset="gb18030")
    assert "汉字测试".encode("gbk") in gbk
    assert "汉字测试".encode("gbk") not in utf8
    for blob in (utf8, gbk, gb18030):
        assert decode_mysql_binlog(blob, list(t.column_names)).equals(t)
    with pytest.raises(UnicodeEncodeError):
        encode_mysql_binlog(t, charset="latin1")


def test_binlog_ddl_rides_the_stream():
    """DDL travels IN the binlog as auto-commit QUERY events at their
    barrier positions (dm/syncer consumes DDL from the same stream);
    decode_binlog_ddls rebuilds the registry — same consumer shape as
    decode_canal_ddl_lines."""
    from tiflow_ray.stages.schema_evo import DDL, SchemaRegistry
    t = _sample_table()
    reg = SchemaRegistry([DDL(10, "add_column", "lang:string", "und", 2),
                          DDL(12, "drop_column", "source", None, 3)])
    blob = encode_mysql_binlog(t, registry=reg)
    assert decode_binlog_ddls(blob).to_json() == reg.to_json()
    # rows are untouched by the interleaved DDL events
    assert decode_mysql_binlog(blob, list(t.column_names)).equals(t)
    # barrier semantics: the barrier-10 DDL sits AFTER the commit_ts=10
    # txn (epochs are (lo, hi] — ts==barrier is pre-barrier)
    q10 = blob.index(b"BEGIN")
    ddl10 = blob.index(b"barrier_ts=10")
    assert ddl10 > q10


def test_binlog_txn_splits_parallel_decode(tmp_path):
    """One binlog segment fans out TRANSACTION-granular: the planner walks
    event headers only (event_size hops), groups whole txns into byte
    ranges, and the range-decode pipeline reassembles the exact table the
    whole-file decoder produces (the avro block-splitter shape)."""
    import ray
    import ray.data

    n = 3000
    t = pa.table({
        "op": pa.array(np.full(n, 3, np.uint8)),
        "commit_ts": pa.array(np.arange(1, n + 1, dtype=np.uint64)),
        "start_ts": pa.array(np.arange(n, dtype=np.uint64)),
        "doc_id": pa.array([f"doc{i:07d}" for i in range(n)]),
        "tokens": pa.array([[i % 100, i % 7] for i in range(n)],
                           pa.list_(pa.int32())),
        "n_tok": pa.array(np.full(n, 2, np.int32)),
        "schema_ver": pa.array(np.ones(n, np.int32)),
    })
    blob = encode_mysql_binlog(t)
    assert len(binlog_txn_ranges(blob)) == n     # distinct commit_ts → txns
    path = str(tmp_path / "seg.binlog")
    with open(path, "wb") as f:
        f.write(blob)
    items = plan_binlog_splits([path], list(t.column_names),
                               target_bytes=len(blob) // 16)
    assert len(items) >= 8, f"only {len(items)} ranges for one segment"
    got = pa.concat_tables(
        ray.data.from_items(items, override_num_blocks=len(items))
        .map_batches(BinlogRangeDecoder(list(t.column_names)),
                     batch_format="pyarrow", batch_size=1)
        .iter_batches(batch_format="pyarrow", batch_size=None))
    got = got.take(pa.compute.sort_indices(
        got, sort_keys=[("commit_ts", "ascending")]))
    assert got.equals(t)


def test_binlog_relay_tail(t1_fixture, tmp_path):
    """The relay loop (dm/relay/relay.go): a writer appends binlog
    segments while tail_replay follows — the continuous consumer decodes
    each new binlog file as it is published and converges to the
    sequential oracle across the DDL barriers."""
    import os
    import shutil
    import threading
    import time

    from tiflow_ray import oracle
    from tiflow_ray.config import ReplayConfig
    from tiflow_ray.fixtures import transcode_wal
    from tiflow_ray.pipelines import replay as rp
    from tiflow_ray.sources.wal import list_segments

    root, reg, *_ = t1_fixture
    staged = str(tmp_path / "wal_binlog_staged")
    transcode_wal(os.path.join(root, "wal"), staged, "mysql_binlog")
    segs = list_segments(staged)
    live = str(tmp_path / "wal_binlog_live")
    os.makedirs(live)
    shutil.copy(os.path.join(staged, "ddl.json"), live)

    def publish(s):
        # data file first, meta last — the meta is the publish marker
        shutil.copy(s.path, live)
        shutil.copy(os.path.join(staged, f"seq={s.seq:05d}.meta.json"), live)

    publish(segs[0])

    def writer():
        for s in segs[1:]:
            time.sleep(0.4)
            publish(s)

    th = threading.Thread(target=writer)
    cfg = ReplayConfig(wal_dir=live, lake_dir=str(tmp_path / "lake_relay"),
                       num_partitions=8, max_segments_per_epoch=1)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    th.start()
    try:
        res = rp.tail_replay(cfg, poll_secs=0.1, idle_timeout=3.0)
    finally:
        th.join()
    assert len(res.epochs) >= len(segs)
    got = rp.lake_to_table(cfg.lake_dir, live)
    assert got.equals(oracle.replay_to_table(root, reg))


def test_cli_transcode_then_replay(t1_noddl_fixture, tmp_path):
    """§2.10 surface: `tiflow_ray.cli transcode` relays a parquet WAL into
    binlog files from the command line; the transcoded WAL then replays
    in-process to the oracle lake."""
    import json
    import os
    import subprocess
    import sys

    from tiflow_ray import oracle
    from tiflow_ray.config import ReplayConfig
    from tiflow_ray.pipelines import replay as rp

    root, reg, *_ = t1_noddl_fixture
    dst = str(tmp_path / "wal_binlog_cli")
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    out = subprocess.run(
        [sys.executable, "-m", "tiflow_ray.cli", "transcode",
         "--src", f"{root}/wal", "--dst", dst, "--fmt", "mysql_binlog",
         "--charset", "gbk"],
        capture_output=True, text=True, env=env, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["segments"] >= 3 and res["fmt"] == "mysql_binlog"
    cfg = ReplayConfig(wal_dir=dst, lake_dir=str(tmp_path / "lake_cli_bl"),
                       num_partitions=8)
    rp.bootstrap(cfg, base_dir=f"{root}/base")
    rp.run_replay(cfg)
    got = rp.lake_to_table(cfg.lake_dir, dst)
    assert got.equals(oracle.replay_to_table(root, reg))


def test_binlog_wal_replays_with_ddl_barrier(t1_fixture, tmp_path):
    """End-to-end S4: the DDL-tier WAL re-encoded as binlog segments
    (schema evolution mid-stream → heterogeneous per-segment columns)
    replays through read_codec_epoch to the exact lake the parquet WAL
    produces — epoch cutting, registry barriers and update-split all ride
    the binlog decode path."""
    from tiflow_ray import oracle
    from tiflow_ray.config import ReplayConfig
    from tiflow_ray.pipelines import replay as rp

    from tiflow_ray.fixtures import transcode_wal

    root, reg, *_ = t1_fixture
    froot = str(tmp_path / "binlog_fixture")
    # relay-style per-segment re-encode: watermarks and per-segment column
    # sets (segments straddle the DDL barriers in this tier) are preserved
    transcode_wal(f"{root}/wal", f"{froot}/wal", "mysql_binlog")
    cfg = ReplayConfig(wal_dir=f"{froot}/wal",
                       lake_dir=str(tmp_path / "lake_binlog"),
                       num_partitions=8, validate=True)
    rp.bootstrap(cfg, base_dir=f"{root}/base")
    rp.run_replay(cfg)
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    assert got.equals(oracle.replay_to_table(root, reg))
