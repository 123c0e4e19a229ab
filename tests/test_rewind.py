"""Point-in-time rewind (changefeed rollback): LakeState.rewind makes an
earlier committed epoch the head again; replay then rebuilds the removed
span through the normal resume path. Safety rails: refuse GC'd targets and
refuse when the WAL span above the target is gone."""

import os

import pytest

from tiflow_ray import oracle
from tiflow_ray.config import ReplayConfig
from tiflow_ray.pipelines import replay as rp
from tiflow_ray.state.checkpoint import LakeState


def mkcfg(root, tmp_path, name="lake"):
    return ReplayConfig(wal_dir=os.path.join(root, "wal"),
                        lake_dir=str(tmp_path / name),
                        num_partitions=8, max_segments_per_epoch=1,
                        validate=True)


def test_rewind_then_replay_converges(t1_fixture, tmp_path):
    root, reg, *_ = t1_fixture
    cfg = mkcfg(root, tmp_path)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg)
    lake = LakeState(cfg.lake_dir)
    epochs = lake.committed_epochs()
    assert len(epochs) >= 3
    target = epochs[1]

    out = lake.rewind(target, wal_dir=cfg.wal_dir)
    assert out["manifests_removed"] == len(epochs) - 2
    assert lake.committed_epochs() == epochs[:2]
    # the rewound head is exactly the state replay had at that epoch:
    # a fresh replay continues from its watermark and converges again
    r = rp.run_replay(cfg)
    assert len(r.epochs) == len(epochs) - 2
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    exp = oracle.replay_to_table(root, reg)
    assert got.equals(exp)


def test_rewind_across_folds_converges(t1_fixture, tmp_path):
    """compact_every=1 folds every epoch (fresh base file per epoch, no
    chains): rewind must land on the folded snapshot and replay forward."""
    root, reg, *_ = t1_fixture
    cfg = ReplayConfig(wal_dir=os.path.join(root, "wal"),
                       lake_dir=str(tmp_path / "lake"),
                       num_partitions=8, max_segments_per_epoch=1,
                       compact_every=1, validate=True)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg)
    lake = LakeState(cfg.lake_dir)
    target = lake.committed_epochs()[1]
    lake.rewind(target, wal_dir=cfg.wal_dir)
    rp.run_replay(cfg)
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    exp = oracle.replay_to_table(root, reg)
    assert got.equals(exp)


def test_rewind_refuses_uncommitted_and_gcd_targets(t1_fixture, tmp_path):
    root, reg, *_ = t1_fixture
    cfg = mkcfg(root, tmp_path)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg)
    lake = LakeState(cfg.lake_dir)
    with pytest.raises(ValueError, match="not committed"):
        lake.rewind(9999)
    first = lake.committed_epochs()[0]
    lake.gc(keep_epochs=1)            # drops every manifest but the head
    with pytest.raises(ValueError, match="not committed"):
        lake.rewind(first)


def test_rewind_refuses_when_wal_span_gcd(t1_fixture, tmp_path):
    """gc_wal after full replay removes applied segments; rewinding below
    them must fail loudly instead of silently losing the span."""
    import shutil
    root, reg, *_ = t1_fixture
    wal_copy = str(tmp_path / "wal")
    shutil.copytree(os.path.join(root, "wal"), wal_copy)
    cfg = ReplayConfig(wal_dir=wal_copy, lake_dir=str(tmp_path / "lake"),
                       num_partitions=8, max_segments_per_epoch=1,
                       validate=True)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg)
    lake = LakeState(cfg.lake_dir)
    target = lake.committed_epochs()[1]
    gc = rp.gc_wal(wal_copy, cfg.lake_dir)
    assert gc["segments_removed"] > 0
    with pytest.raises(ValueError, match="GC'd"):
        lake.rewind(target, wal_dir=wal_copy)
    # without the WAL guard the lake-side rewind itself still works; the
    # caller owns the consequence (documented)
    lake.rewind(target)


def test_rewind_across_repartition_restores_old_layout(t1_fixture, tmp_path):
    """Rewind past a repartition commit: the target manifest carries the
    OLD partition count, so replay resumes under the old layout and still
    converges (manifests are self-describing)."""
    root, reg, *_ = t1_fixture
    cfg = mkcfg(root, tmp_path)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg, max_epochs=2)
    lake = LakeState(cfg.lake_dir)
    pre_repart_head = lake.committed_epochs()[-1]
    rp.repartition_lake(cfg.lake_dir, 16)            # 8 → 16 split commit
    assert lake.latest().num_partitions == 16

    lake.rewind(pre_repart_head, wal_dir=cfg.wal_dir)
    assert lake.latest().num_partitions == 8
    rp.run_replay(cfg)                               # resumes at P=8
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    exp = oracle.replay_to_table(root, reg)
    assert got.equals(exp)


def test_rewind_crash_midway_leaves_consistent_head(t1_fixture, tmp_path):
    """Manifests are removed newest-first: simulate the crash by removing
    only the newest manifest (what a half-done rewind leaves) — latest()
    is still a committed epoch and replay converges."""
    root, reg, *_ = t1_fixture
    cfg = mkcfg(root, tmp_path)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg)
    lake = LakeState(cfg.lake_dir)
    head = lake.committed_epochs()[-1]
    os.remove(os.path.join(cfg.lake_dir, "_manifest",
                           f"epoch-{head:06d}.json"))
    assert lake.latest().epoch == head - 1
    rp.run_replay(cfg)
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    exp = oracle.replay_to_table(root, reg)
    assert got.equals(exp)
