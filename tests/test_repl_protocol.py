# The MySQL replication wire loop (sources/repl_protocol.py): a
# BinlogDumpServer masters a dir of binlog v4 files; relay_binlog speaks
# handshake v10 + mysql_native_password + COM_REGISTER_SLAVE +
# COM_BINLOG_DUMP and persists the stream 1:1 (dm/relay/relay.go +
# dm/pkg/binlog/reader/tcp.go shape); index_binlog_dir rebuilds metas +
# ddl.json purely from the stream.
import glob
import json
import os
import socket
import struct
import threading
import time

import pytest

from tiflow_ray import fixtures
from tiflow_ray.sources.repl_protocol import (BinlogDumpServer, _recv_packet,
                                              _send_packet, index_binlog_dir,
                                              relay_binlog)
from tiflow_ray.sources.wal import load_registry


@pytest.fixture(scope="module")
def master_dir(t1_fixture):
    """t1's parquet WAL transcoded to a binlog-v4 master dir (in-stream
    DDL QUERY events included by the per-segment slicer)."""
    root, reg, metas, info = t1_fixture
    bdir = os.path.join(root, "binlog_master")
    if not os.path.exists(bdir):
        fixtures.transcode_wal(os.path.join(root, "wal"), bdir,
                               "mysql_binlog")
    return root, reg, bdir


def _files_equal(a_dir: str, b_dir: str) -> bool:
    names = sorted(os.path.basename(p)
                   for p in glob.glob(os.path.join(a_dir, "*.binlog")))
    for n in names:
        with open(os.path.join(a_dir, n), "rb") as f:
            a = f.read()
        with open(os.path.join(b_dir, n), "rb") as f:
            b = f.read()
        if a != b:
            return False
    return bool(names)


def test_relay_is_byte_identical_and_self_describing(master_dir, tmp_path):
    root, reg, bdir = master_dir
    rdir = str(tmp_path / "relay")
    with BinlogDumpServer(bdir, user="repl", password="s3cret") as srv:
        touched = relay_binlog(srv.host, srv.port, rdir,
                               user="repl", password="s3cret")
    assert touched == sorted(os.path.basename(p) for p in
                             glob.glob(os.path.join(bdir, "*.binlog")))
    assert _files_equal(bdir, rdir)
    metas = index_binlog_dir(rdir)
    # metas rebuilt from the stream == the master's side-band metas
    for m in metas:
        with open(os.path.join(bdir, f"seq={m['seq']:05d}.meta.json")) as f:
            src = json.load(f)
        assert (m["watermark_ts"], m["min_ts"], m["max_ts"], m["rows"]) == \
               (src["watermark_ts"], src["min_ts"], src["max_ts"],
                src["rows"])
    # the DDL schedule rides in-stream: registry reconstructed exactly
    assert load_registry(rdir).to_json() == reg.to_json()


def test_relay_dir_replays_to_oracle_lake(master_dir, tmp_path):
    from tiflow_ray import oracle
    from tiflow_ray.config import ReplayConfig
    from tiflow_ray.pipelines import replay as rp

    root, reg, bdir = master_dir
    rdir = str(tmp_path / "relay")
    with BinlogDumpServer(bdir, user="repl", password="s3cret") as srv:
        relay_binlog(srv.host, srv.port, rdir,
                     user="repl", password="s3cret")
    index_binlog_dir(rdir)
    cfg = ReplayConfig(wal_dir=rdir, lake_dir=str(tmp_path / "lake"),
                       num_partitions=8)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg)
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    exp = oracle.replay_to_table(root, reg)
    assert got.equals(exp)


def test_auth_rejected_with_1045(master_dir, tmp_path):
    _root, _reg, bdir = master_dir
    with BinlogDumpServer(bdir, user="repl", password="s3cret") as srv:
        with pytest.raises(PermissionError, match="1045"):
            relay_binlog(srv.host, srv.port, str(tmp_path / "r"),
                         user="repl", password="wrong")
        with pytest.raises(PermissionError, match="1045"):
            relay_binlog(srv.host, srv.port, str(tmp_path / "r"),
                         user="intruder", password="s3cret")


def test_resume_mid_file_and_missing_file(master_dir, tmp_path):
    """Kill the relay mid-file (truncate at an event boundary): the next
    relay call appends only the missing bytes — the server re-announces
    the FDE on a mid-file resume and the client skips the duplicate.
    Then lose the newest file entirely: the next call re-fetches it
    whole (relay.meta = the filesystem)."""
    _root, _reg, bdir = master_dir
    rdir = str(tmp_path / "relay")
    with BinlogDumpServer(bdir, user="repl", password="s3cret") as srv:
        relay_binlog(srv.host, srv.port, rdir,
                     user="repl", password="s3cret")
        names = sorted(os.path.basename(p) for p in
                       glob.glob(os.path.join(rdir, "*.binlog")))
        last = os.path.join(rdir, names[-1])
        with open(last, "rb") as f:
            data = f.read()
        # cut after the second event (magic + FDE + one event survive)
        pos, cut = 4, []
        while pos < len(data):
            size = struct.unpack_from("<I", data, pos + 9)[0]
            cut.append(pos + size)
            pos += size
        assert len(cut) >= 2
        with open(last, "wb") as f:
            f.write(data[:cut[1]])
        touched = relay_binlog(srv.host, srv.port, rdir,
                               user="repl", password="s3cret")
        with open(last, "rb") as f:
            assert f.read() == data            # healed in place, no dup FDE
        assert names[-1] in touched

        os.remove(last)
        touched = relay_binlog(srv.host, srv.port, rdir,
                               user="repl", password="s3cret")
        assert names[-1] in touched
    assert _files_equal(bdir, rdir)


def test_live_tail_follow_picks_up_new_segment(t1_fixture, tmp_path):
    """Blocking dump: a new master segment appears while the replica is
    connected; the rotate event carries it over without reconnecting."""
    import pyarrow.parquet as pq

    root, reg, metas, info = t1_fixture
    from tiflow_ray.sources.wal import list_segments
    segs = list_segments(os.path.join(root, "wal"))
    bdir = str(tmp_path / "master")
    os.makedirs(bdir)
    # master starts with all but the final segment
    keep, held_back = segs[:-1], segs[-1]
    srcdir = os.path.join(root, "wal")
    tmpwal = str(tmp_path / "srcwal")
    os.makedirs(tmpwal)
    import shutil
    for s in keep:
        shutil.copy(s.path, tmpwal)
        shutil.copy(s.path.replace(".parquet", ".meta.json"), tmpwal)
    shutil.copy(os.path.join(srcdir, "ddl.json"), tmpwal)
    fixtures.transcode_wal(tmpwal, bdir, "mysql_binlog")
    n_initial = len(glob.glob(os.path.join(bdir, "*.binlog")))

    rdir = str(tmp_path / "relay")
    stop = threading.Event()
    done: list = []
    with BinlogDumpServer(bdir, user="repl", password="s3cret",
                          poll=0.01, heartbeat=0.05) as srv:
        th = threading.Thread(
            target=lambda: done.append(relay_binlog(
                srv.host, srv.port, rdir, user="repl", password="s3cret",
                follow=True, stop_event=stop)), daemon=True)
        th.start()
        deadline = time.monotonic() + 20
        while len(glob.glob(os.path.join(rdir, "*.binlog"))) < n_initial:
            assert time.monotonic() < deadline, "initial relay stalled"
            time.sleep(0.02)
        time.sleep(0.2)     # sit idle long enough to exercise heartbeats
        # the master sink commits a new segment (tmp→rename contract)
        seg = pq.read_table(held_back.path)
        from tiflow_ray.sources import codecs as CC
        blob = CC.encode_mysql_binlog(seg)
        tmpf = os.path.join(bdir, ".tmp.newseg")
        with open(tmpf, "wb") as f:
            f.write(blob)
        final = os.path.join(bdir, f"seq={held_back.seq:05d}.binlog")
        os.rename(tmpf, final)
        target = os.path.basename(final)
        while not (os.path.exists(os.path.join(rdir, target))
                   and os.path.getsize(os.path.join(rdir, target))
                   == os.path.getsize(final)):
            assert time.monotonic() < deadline, "tail never saw new segment"
            time.sleep(0.02)
        stop.set()
        th.join(timeout=10)
    assert done and target in done[0]
    assert _files_equal(bdir, rdir)


def test_packet_layer_splits_16mb_payloads():
    """Events ≥ 16MB-1 must split across wire packets and reassemble
    (the protocol's 0xFFFFFF payload cap + empty-terminator rule)."""
    a, b = socket.socketpair()
    try:
        payload = bytes(range(256)) * 66000        # ≈16.9 MB
        got: list = []
        th = threading.Thread(target=lambda: got.append(_recv_packet(b)))
        th.start()
        nxt = _send_packet(a, 0, payload)
        th.join(timeout=30)
        assert got and got[0][1] == payload
        assert nxt == 2                             # two wire packets
    finally:
        a.close()
        b.close()


def test_live_wire_to_lake_tail_replay(t1_fixture, tmp_path):
    """The full DM topology live, over real sockets: the master commits
    binlog segments over time → a follow-mode relay persists them →
    on_rotate incrementally indexes each final file (metas + the
    _ddl_pairs sidecar) → tail_replay continuously applies to the lake.
    Final lake == the sequential oracle."""
    import pyarrow.parquet as pq

    from tiflow_ray import oracle
    from tiflow_ray.config import ReplayConfig
    from tiflow_ray.pipelines import replay as rp
    from tiflow_ray.sources import codecs as CC
    from tiflow_ray.sources.wal import list_segments

    root, reg, metas, info = t1_fixture
    segs = list_segments(os.path.join(root, "wal"))
    bdir = str(tmp_path / "master")
    os.makedirs(bdir)

    def commit_segment(i: int) -> None:
        """Master-side sink: encode segment i with ITS DDL slice and
        tmp→rename it into the binlog dir."""
        s = segs[i]
        lo = segs[i - 1].watermark_ts if i else None
        ddls = [d for d in reg.ddls
                if (lo is None or d.barrier_ts > lo)
                and (i == len(segs) - 1 or d.barrier_ts <= s.watermark_ts)]
        import types
        blob = CC.encode_mysql_binlog(
            pq.read_table(s.path), registry=types.SimpleNamespace(ddls=ddls))
        tmpf = os.path.join(bdir, f".tmp.{s.seq}")
        with open(tmpf, "wb") as f:
            f.write(blob)
        os.rename(tmpf, os.path.join(bdir, f"seq={s.seq:05d}.binlog"))

    commit_segment(0)
    rdir = str(tmp_path / "relay")
    stop = threading.Event()
    with BinlogDumpServer(bdir, poll=0.01, heartbeat=0.05) as srv:
        th = threading.Thread(
            target=lambda: relay_binlog(
                srv.host, srv.port, rdir, follow=True, stop_event=stop,
                on_rotate=lambda f: index_binlog_dir(rdir, paths=[f])),
            daemon=True)
        th.start()

        def feeder():
            for i in range(1, len(segs)):
                time.sleep(0.3)
                commit_segment(i)
        ft = threading.Thread(target=feeder, daemon=True)
        ft.start()

        cfg = ReplayConfig(wal_dir=rdir, lake_dir=str(tmp_path / "lake"),
                           num_partitions=8)
        rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
        res = rp.tail_replay(cfg, poll_secs=0.1, idle_timeout=4.0)
        ft.join(timeout=10)
        # drain: the final file only becomes final when the relay rotates
        # away, which never happens — index the remainder explicitly and
        # finish the tail (the operator's stop-changefeed step)
        deadline = time.monotonic() + 20
        final = os.path.join(bdir, f"seq={segs[-1].seq:05d}.binlog")
        while not (os.path.exists(os.path.join(rdir, os.path.basename(final)))
                   and os.path.getsize(os.path.join(
                       rdir, os.path.basename(final)))
                   == os.path.getsize(final)):
            assert time.monotonic() < deadline, "relay never caught up"
            time.sleep(0.05)
        stop.set()
        th.join(timeout=10)
    index_binlog_dir(rdir)
    res2 = rp.tail_replay(cfg, poll_secs=0.05, idle_timeout=0.5)
    assert len(res.epochs) + len(res2.epochs) >= 1
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    assert got.equals(oracle.replay_to_table(root, reg))


# ------------------------------------------------------------------ GTID

@pytest.fixture(scope="module")
def gtid_master_dir(t1_fixture):
    """t1 transcoded with GTID mode on: PREVIOUS_GTIDS chains + one GTID
    event per transaction (row txns AND auto-commit DDLs)."""
    from tiflow_ray.sources import codecs as CC
    root, reg, metas, info = t1_fixture
    bdir = os.path.join(root, "binlog_gtid_master")
    if not os.path.exists(bdir):
        fixtures.transcode_wal(os.path.join(root, "wal"), bdir,
                               "mysql_binlog", codec_opts={"gtid": True})
    return root, reg, bdir


def test_gtid_set_primitives():
    from tiflow_ray.sources import codecs as CC
    sid = "ab" * 16
    s = CC.gtid_set_parse(f"{sid}:1-5:7")
    assert CC.gtid_set_str(s) == f"{sid}:1-5:7"
    rt, _ = CC.gtid_set_decode(CC.gtid_set_encode(s))
    assert rt == s
    assert CC.gtid_set_contains(s, {sid: [(2, 4), (7, 7)]})
    assert not CC.gtid_set_contains(s, {sid: [(5, 6)]})
    assert not CC.gtid_set_contains(s, {"cd" * 16: [(1, 1)]})
    # adjacent intervals merge; union is commutative
    u = CC.gtid_set_union(s, {sid: [(6, 6)]})
    assert CC.gtid_set_str(u) == f"{sid}:1-7"
    assert CC.gtid_set_union({}, s) == s


def test_gtid_chain_prev_equals_prior_executed(gtid_master_dir):
    """Each file's PREVIOUS_GTIDS == the executed set after its
    predecessor; gnos are dense from 1 (MySQL's invariant — how a GTID
    dump locates its start file without row decode)."""
    from tiflow_ray.sources import codecs as CC
    _root, _reg, bdir = gtid_master_dir
    prev_exec: dict = {}
    for p in sorted(glob.glob(os.path.join(bdir, "*.binlog"))):
        with open(p, "rb") as f:
            prev, executed = CC.binlog_gtid_info(f.read())
        assert prev == prev_exec
        prev_exec = executed
    sid = CC._GTID_SID.hex()
    assert len(prev_exec[sid]) == 1 and prev_exec[sid][0][0] == 1


def test_gtid_wal_replays_identically(gtid_master_dir, tmp_path):
    """GTID events are transparent to the decode path: a GTID-enabled
    binlog WAL replays to the same oracle lake (ranges include the GTID
    framing; the row decoder ignores types 33/35)."""
    from tiflow_ray import oracle
    from tiflow_ray.config import ReplayConfig
    from tiflow_ray.pipelines import replay as rp

    root, reg, bdir = gtid_master_dir
    cfg = ReplayConfig(wal_dir=bdir, lake_dir=str(tmp_path / "lake"),
                       num_partitions=8)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg)
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    assert got.equals(oracle.replay_to_table(root, reg))


def test_gtid_relay_resume_modes(gtid_master_dir, tmp_path):
    """COM_BINLOG_DUMP_GTID resume: fresh replica gets everything;
    caught-up replica gets nothing new; a lost newest file is re-fetched
    whole; a tail torn MID-TRANSACTION (clean event boundary!) is
    discarded and re-fetched — its last gno named an incomplete txn and
    must not count as executed. relay.meta.json tracks the set."""
    from tiflow_ray.sources import codecs as CC
    from tiflow_ray.sources.repl_protocol import (_file_is_txn_clean,
                                                  executed_gtid_set)
    _root, _reg, bdir = gtid_master_dir
    files = sorted(glob.glob(os.path.join(bdir, "*.binlog")))
    rdir = str(tmp_path / "relay")

    def same() -> bool:
        return all(
            open(p, "rb").read() ==
            open(os.path.join(rdir, os.path.basename(p)), "rb").read()
            for p in files)

    with BinlogDumpServer(bdir) as srv:
        relay_binlog(srv.host, srv.port, rdir, gtid=True)
        assert same()
        with open(os.path.join(rdir, "relay.meta.json")) as f:
            meta = json.load(f)
        assert meta["gtid_set"] == CC.gtid_set_str(executed_gtid_set(bdir))

        before = {p: os.path.getmtime(p) for p in
                  glob.glob(os.path.join(rdir, "*.binlog"))}
        relay_binlog(srv.host, srv.port, rdir, gtid=True)
        assert same()                       # caught-up: no duplicates

        last = sorted(glob.glob(os.path.join(rdir, "*.binlog")))[-1]
        os.remove(last)
        touched = relay_binlog(srv.host, srv.port, rdir, gtid=True)
        assert os.path.basename(last) in touched and same()

        # tear the tail mid-transaction but ON an event boundary
        with open(last, "rb") as f:
            data = f.read()
        pos, cut = 4, None
        while pos < len(data):
            size = struct.unpack_from("<I", data, pos + 9)[0]
            if data[pos + 4] == CC._EV_TABLE_MAP:
                cut = pos + size
                break
            pos += size
        assert cut is not None
        with open(last, "wb") as f:
            f.write(data[:cut])
        assert not _file_is_txn_clean(data[:cut])
        relay_binlog(srv.host, srv.port, rdir, gtid=True)
        with open(last, "rb") as f:
            assert f.read() == data         # refetched whole
        assert same()


def test_gtid_dump_rejected_on_gtid_free_binlog(master_dir, tmp_path):
    """A GTID dump against a binlog dir without GTID events must fail
    loudly (error 1236), not silently fall back to file/pos."""
    _root, _reg, bdir = master_dir
    with BinlogDumpServer(bdir, user="repl", password="s3cret") as srv:
        with pytest.raises(RuntimeError, match="1236"):
            relay_binlog(srv.host, srv.port, str(tmp_path / "r"),
                         user="repl", password="s3cret", gtid=True)
