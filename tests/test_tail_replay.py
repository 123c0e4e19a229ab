"""Continuous tailing (changefeed daemon loop): a writer thread appends
WAL segments while tail_replay consumes them; checkpoints advance epoch by
epoch and the final state equals the sequential oracle. Also covers the
stop-file (pause changefeed) and idle-timeout exits."""

import os
import threading
import time

from tiflow_ray import oracle
from tiflow_ray.config import ReplayConfig
from tiflow_ray.pipelines import replay as rp
from tiflow_ray.sources.wal import list_segments


def test_tail_replay_consumes_live_writer(t1_fixture, tmp_path):
    root, reg, *_ = t1_fixture
    src_wal = os.path.join(root, "wal")
    segs = list_segments(src_wal)
    assert len(segs) >= 3
    live = str(tmp_path / "wal_live")
    os.makedirs(live)
    import shutil
    shutil.copy(os.path.join(src_wal, "ddl.json"), live)

    def copy_seg(s):
        # data file first, meta last — the meta is the publish marker,
        # matching how list_segments discovers segments
        shutil.copy(s.path, live)
        shutil.copy(os.path.join(src_wal,
                                 f"seq={s.seq:05d}.meta.json"), live)

    copy_seg(segs[0])                      # one segment exists at start

    def writer():
        for s in segs[1:]:
            time.sleep(0.4)
            copy_seg(s)

    th = threading.Thread(target=writer)
    cfg = ReplayConfig(wal_dir=live, lake_dir=str(tmp_path / "lake"),
                       num_partitions=8, max_segments_per_epoch=1)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    th.start()
    try:
        res = rp.tail_replay(cfg, poll_secs=0.1, idle_timeout=3.0)
    finally:
        th.join()
    assert len(res.epochs) >= len(segs)    # consumed every segment's work
    got = rp.lake_to_table(cfg.lake_dir, live)
    exp = oracle.replay_to_table(root, reg)
    assert got.equals(exp)


def test_tail_replay_stop_file(t1_fixture, tmp_path):
    root, reg, *_ = t1_fixture
    stop = str(tmp_path / "STOP")
    open(stop, "w").close()                # pre-armed pause signal
    cfg = ReplayConfig(wal_dir=os.path.join(root, "wal"),
                       lake_dir=str(tmp_path / "lake2"), num_partitions=8)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    res = rp.tail_replay(cfg, poll_secs=0.05, stop_file=stop)
    assert res.epochs == []                # paused before any work
    os.remove(stop)
    res = rp.tail_replay(cfg, poll_secs=0.05, idle_timeout=0.5)
    assert res.epochs                      # resumed and caught up
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    assert got.equals(oracle.replay_to_table(root, reg))
