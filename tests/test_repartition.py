"""Lake repartitioning (keyspan split/merge scale-out analog): an offline
job re-lays the lake out with a different partition count between epochs;
replay resumes under the new P and still converges to the sequential
oracle. Covers the shuffle-free split (P→k·P) and merge (P→P/k) fast paths
and the general re-hash, plus crash-atomicity of the manifest commit."""

import os

import pytest

from tiflow_ray import oracle
from tiflow_ray.config import ReplayConfig
from tiflow_ray.pipelines import replay as rp
from tiflow_ray.state.checkpoint import LakeState


def _cfg(root, tmp_path, p, name="lake"):
    return ReplayConfig(wal_dir=os.path.join(root, "wal"),
                        lake_dir=str(tmp_path / name),
                        num_partitions=p, max_segments_per_epoch=1,
                        validate=True)


@pytest.mark.parametrize("new_p", [16, 4, 6])   # split / merge / re-hash
def test_repartition_mid_replay_converges(t1_fixture, tmp_path, new_p):
    root, reg, *_ = t1_fixture
    cfg = _cfg(root, tmp_path, 8)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg, max_epochs=2)               # prefix under P=8

    # old P is now rejected-on-mismatch both ways
    res = rp.repartition_lake(cfg.lake_dir, new_p)
    assert res["num_partitions"] == new_p
    with pytest.raises(ValueError, match="repartition"):
        rp.run_replay(cfg)                         # stale config P=8

    cfg2 = _cfg(root, tmp_path, new_p)
    rp.run_replay(cfg2)                            # resume under new P
    got = rp.lake_to_table(cfg2.lake_dir, cfg2.wal_dir)
    exp = oracle.replay_to_table(root, reg)
    assert got.equals(exp), f"repartition to P={new_p} diverged from oracle"

    # layout really is new_p-wide and self-consistent
    m = LakeState(cfg2.lake_dir).latest()
    assert m.num_partitions == new_p
    assert all(0 <= int(p) < new_p for p in m.parts)


def test_repartition_noop_and_crash_atomicity(t1_fixture, tmp_path):
    root, reg, *_ = t1_fixture
    cfg = _cfg(root, tmp_path, 8)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg)
    m0 = LakeState(cfg.lake_dir).latest()

    assert rp.repartition_lake(cfg.lake_dir, 8)["epoch"] == m0.epoch  # no-op

    # crash AFTER data files were written but BEFORE the manifest commit:
    # delete the new manifest — the lake must still read as the old layout
    rp.repartition_lake(cfg.lake_dir, 16)
    lake = LakeState(cfg.lake_dir)
    last = lake.committed_epochs()[-1]
    os.remove(os.path.join(cfg.lake_dir, "_manifest",
                           f"epoch-{last:06d}.json"))
    assert LakeState(cfg.lake_dir).latest().num_partitions == 8
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    exp = oracle.replay_to_table(root, reg)
    assert got.equals(exp)

    # rerun is idempotent onto the same deterministic file names
    rp.repartition_lake(cfg.lake_dir, 16)
    assert LakeState(cfg.lake_dir).latest().num_partitions == 16
    assert rp.lake_to_table(cfg.lake_dir, cfg.wal_dir).equals(exp)
