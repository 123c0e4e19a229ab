"""FIXTURES.md t2 correctness tier: 250k events, 50k docs, 16 segments,
2 DDL barriers, resume-mid-stream — the full-size oracle equality gate."""

import tempfile

from tiflow_ray import fixtures, oracle
from tiflow_ray.config import ReplayConfig
from tiflow_ray.pipelines import replay as rp


def test_t2_resume_mid_stream_matches_oracle(tmp_path):
    root = str(tmp_path / "t2")
    reg, metas, info = fixtures.generate_tier(root, "t2")
    cfg = ReplayConfig(wal_dir=f"{root}/wal", lake_dir=str(tmp_path / "lake"),
                       num_partitions=16, max_segments_per_epoch=4)
    rp.bootstrap(cfg, base_dir=f"{root}/base")
    r1 = rp.run_replay(cfg, max_epochs=3)   # kill mid-stream
    r2 = rp.run_replay(cfg)                 # resume from checkpoint
    assert r1.epochs and r2.epochs
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    exp = oracle.replay_to_table(root, reg)
    assert got.num_rows == exp.num_rows
    assert got.equals(exp)
