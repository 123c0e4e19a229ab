"""Randomized-matrix property tests (SURVEY.md §5c): across seeds and
workload knobs, replay == oracle; resume at ANY epoch boundary == replay
once. Small fixtures so the whole matrix stays fast."""

import os

import pytest

from tiflow_ray import fixtures, oracle
from tiflow_ray.config import ReplayConfig
from tiflow_ray.pipelines import replay as rp
from tiflow_ray.sources.wal import list_segments, load_registry, plan_epochs


@pytest.mark.parametrize("seed,mode,knobs", [
    (7, "mor", {}),
    (13, "cow", {}),
    (99, "mor", {"salt_shuffle": 5}),
    (31, "mor", {"replay_mode": "two_pass"}),
    (57, "cow", {"precompact": False, "salt_shuffle": 3}),
])
def test_replay_matches_oracle_across_seeds(tmp_path, seed, mode, knobs):
    root = str(tmp_path / f"fx{seed}")
    reg, metas, info = fixtures.generate_tier(
        root, "t1_noddl", seed=seed, n_docs=400, n_events=2_000,
        n_segments=3, num_partitions=4)
    cfg = ReplayConfig(wal_dir=f"{root}/wal", lake_dir=str(tmp_path / "lake"),
                       num_partitions=4, sink_mode=mode, validate=True,
                       **knobs)
    rp.bootstrap(cfg, base_dir=f"{root}/base")
    rp.run_replay(cfg)
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    assert got.equals(oracle.replay_to_table(root, reg))


def test_resume_at_every_epoch_boundary(tmp_path):
    """Stop+resume at EACH possible epoch boundary ⇒ identical final state
    (redo-applier property: resume ≡ next epoch, any split point)."""
    root = str(tmp_path / "fx")
    reg, metas, info = fixtures.generate_tier(
        root, "t1", seed=21, n_docs=400, n_events=2_500, n_segments=4,
        num_partitions=4)
    segs = list_segments(f"{root}/wal")
    epochs = plan_epochs(segs, load_registry(f"{root}/wal"), 0,
                         max_segments_per_epoch=1)
    expected = oracle.replay_to_table(root, reg)
    for cut in range(1, len(epochs)):
        lake = str(tmp_path / f"lake_cut{cut}")
        cfg = ReplayConfig(wal_dir=f"{root}/wal", lake_dir=lake,
                           num_partitions=4, max_segments_per_epoch=1)
        rp.bootstrap(cfg, base_dir=f"{root}/base")
        rp.run_replay(cfg, max_epochs=cut)     # stop mid-stream
        rp.run_replay(cfg)                     # fresh call resumes
        got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
        assert got.equals(expected), f"cut at epoch {cut}"
