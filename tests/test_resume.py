"""Exactly-once / resume semantics — the analog of the reference's redo-apply
recovery tests (tests/integration_tests/consistent_replicate_storage_file) and
DM safe-mode idempotency (dm/syncer/safe_mode.go §2.9)."""

import glob
import os

from tiflow_ray import oracle
from tiflow_ray.config import ReplayConfig
from tiflow_ray.pipelines import replay as rp
from tiflow_ray.state.checkpoint import LakeState


def mkcfg(root, tmp_path, name="lake"):
    return ReplayConfig(wal_dir=os.path.join(root, "wal"),
                        lake_dir=str(tmp_path / name),
                        num_partitions=8, max_segments_per_epoch=1,
                        validate=True)


def test_stop_and_resume(t1_fixture, tmp_path):
    """Run a prefix of epochs, stop, resume in a fresh call → same final
    state as one continuous run."""
    root, reg, *_ = t1_fixture
    cfg = mkcfg(root, tmp_path)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    r1 = rp.run_replay(cfg, max_epochs=2)
    assert len(r1.epochs) == 2
    r2 = rp.run_replay(cfg)          # resumes from checkpoint
    assert r2.epochs[0].epoch == 3   # dense epoch numbering continues
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    exp = oracle.replay_to_table(root, reg)
    assert got.equals(exp)


def test_crash_before_commit_is_invisible(t1_fixture, tmp_path):
    """Simulate a crash AFTER data files were written but BEFORE the manifest
    commit: delete the last manifest; the rerun must redo that epoch onto the
    same deterministic file names and converge (two-phase sink,
    dml_worker.go:209-231 analog)."""
    root, reg, *_ = t1_fixture
    cfg = mkcfg(root, tmp_path)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg, max_epochs=3)
    lake = LakeState(cfg.lake_dir)
    last = lake.committed_epochs()[-1]
    os.remove(os.path.join(cfg.lake_dir, "_manifest", f"epoch-{last:06d}.json"))
    # data files of the uncommitted epoch still exist on disk — inert garbage
    # (a base file under cow/fold, a delta file under MoR)
    assert glob.glob(os.path.join(cfg.lake_dir, "data", "part=*",
                                  f"*-{last:06d}.parquet"))
    rp.run_replay(cfg)  # re-plans from the surviving checkpoint
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    exp = oracle.replay_to_table(root, reg)
    assert got.equals(exp)


def test_replay_is_idempotent_per_epoch(t1_noddl_fixture, tmp_path):
    """Re-running with everything already applied is a no-op (safe-mode:
    re-applying an applied prefix never changes the table)."""
    root, reg, *_ = t1_noddl_fixture
    cfg = mkcfg(root, tmp_path)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg)
    before = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    res = rp.run_replay(cfg)
    assert res.epochs == []          # nothing beyond the checkpoint
    after = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    assert before.equals(after)


def test_lineage_metrics_in_manifest(t1_fixture, tmp_path):
    root, reg, *_ = t1_fixture
    cfg = mkcfg(root, tmp_path)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg)
    lake = LakeState(cfg.lake_dir)
    m = lake.latest()
    assert m.stats["events"] >= 0 and m.stats["parts_touched"] >= 1
    # per-partition lineage: every part records its applied watermark + rows
    for meta in m.parts.values():
        assert {"path", "schema_ver", "rows", "watermark_ts"} <= set(meta)
    # the global checkpoint is the min over per-partition watermarks of parts
    # touched at the final epoch (frontier analog, A1/A2)
    assert m.watermark_ts == max(meta["watermark_ts"] for meta in m.parts.values())


def test_gc_keeps_lake_readable(t1_fixture, tmp_path):
    """GC removes superseded manifests + unreferenced data files; the lake
    state after GC is unchanged, and resume still works."""
    import glob as _glob
    root, reg, *_ = t1_fixture
    cfg = mkcfg(root, tmp_path, "lake_gc")
    cfg = ReplayConfig(**{**cfg.__dict__, "sink_mode": "cow"})  # cow: many obsolete files
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg, max_epochs=4)
    before = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    lake = LakeState(cfg.lake_dir)
    n_files_before = len(_glob.glob(os.path.join(cfg.lake_dir, "data", "part=*", "*.parquet")))
    out = lake.gc(keep_epochs=1)
    assert out["files_removed"] > 0 and out["manifests_removed"] > 0
    n_files_after = len(_glob.glob(os.path.join(cfg.lake_dir, "data", "part=*", "*.parquet")))
    assert n_files_after < n_files_before
    after = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    assert before.equals(after)
    # resume continues cleanly after GC
    rp.run_replay(cfg)
    final = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    from tiflow_ray import oracle as _o
    assert final.equals(_o.replay_to_table(root, reg))


def test_gc_preserves_mor_delta_chains(t1_noddl_fixture, tmp_path):
    """GC on an MoR lake must keep every delta file referenced by the
    retained manifest's chains."""
    root, reg, *_ = t1_noddl_fixture
    cfg = ReplayConfig(wal_dir=os.path.join(root, "wal"),
                       lake_dir=str(tmp_path / "lake_morgc"),
                       num_partitions=8, max_segments_per_epoch=1,
                       sink_mode="mor", compact_every=100)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg)
    before = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    out = LakeState(cfg.lake_dir).gc(keep_epochs=1)
    assert out["manifests_removed"] > 0
    after = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    assert before.equals(after)


def test_online_validation_detects_corruption(t1_noddl_fixture, tmp_path):
    """Incremental online validator (data_validator.go analog): committed
    files carry md5s in the manifest; a partition file corrupted BETWEEN
    commits must fail the next epoch's merge loudly — and an uncorrupted
    lake must replay clean end-to-end with validation on."""
    import pytest
    root, reg, *_ = t1_noddl_fixture
    cfg = ReplayConfig(wal_dir=os.path.join(root, "wal"),
                       lake_dir=str(tmp_path / "lake_ov"),
                       num_partitions=8, max_segments_per_epoch=1,
                       online_validate=True)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg, max_epochs=2)
    m = LakeState(cfg.lake_dir).latest()
    files = [d["path"] for meta in m.parts.values()
             for d in meta.get("deltas", [])]
    assert files, "epochs must have committed delta files"
    # every committed file carries its checksum
    for meta in m.parts.values():
        for d in meta.get("deltas", []):
            assert d.get("checksum")
    # corrupt one committed file in place (same size, flipped bytes)
    victim = sorted(files)[0]
    with open(victim, "r+b") as f:
        f.seek(4)
        f.write(b"\x00\xff\x00\xff")
    with pytest.raises(Exception, match="online validation failed"):
        rp.run_replay(cfg)


def test_online_validation_clean_run_matches_oracle(t1_noddl_fixture, tmp_path):
    root, reg, *_ = t1_noddl_fixture
    cfg = ReplayConfig(wal_dir=os.path.join(root, "wal"),
                       lake_dir=str(tmp_path / "lake_ovc"),
                       num_partitions=8, max_segments_per_epoch=1,
                       online_validate=True)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg, max_epochs=2)
    rp.run_replay(cfg)              # resume re-verifies touched chains
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    assert got.equals(oracle.replay_to_table(root, reg))
