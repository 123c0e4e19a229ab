"""Shard-merge DDL coordination (dm/syncer/shardddl pessimist analog):
N upstream WALs merge into one table; a DDL barrier may only apply once
EVERY shard has delivered up to it; divergent shard DDL schedules are
rejected upfront."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from tiflow_ray import fixtures
from tiflow_ray.config import ReplayConfig
from tiflow_ray.pipelines import replay as rp
from tiflow_ray.stages.schema_evo import DDL, SchemaRegistry
from tiflow_ray.state.checkpoint import LakeState

BARRIER = 5_000
N_PER_SHARD = 20


def _shard_wal(root: str, shard: int, registry: SchemaRegistry,
               hi_ts: int) -> None:
    """Shard `shard` owns docs [shard*N, shard*N+N); each doc gets one
    pre-barrier and one post-barrier update (post ones only if <= hi_ts)."""
    docs = np.arange(shard * N_PER_SHARD, (shard + 1) * N_PER_SHARD)
    rows = []
    # all shards end at the SAME watermark (the merged frontier is the MIN
    # over shard watermarks — a shard whose stream ends earlier would hold
    # the frontier back forever, which is correct but not this scenario)
    for d in docs:
        rows.append((d, 1_000 + int(d) % N_PER_SHARD, 1))            # pre
        rows.append((d, BARRIER + 1_000 + int(d) % N_PER_SHARD, 2))  # post
    rows = [r for r in rows if r[1] <= hi_ts]
    n = len(rows)
    cts = np.array([r[1] for r in rows], np.uint64)
    dnum = np.array([r[0] for r in rows], np.int64)
    ver = np.array([1 if r[1] <= BARRIER else 2 for r in rows], np.int32)
    wal = pa.table({
        "op": pa.array(np.full(n, 2, np.uint8)),
        "commit_ts": pa.array(cts),
        "start_ts": pa.array(np.arange(n, dtype=np.uint64) + shard * 10_000),
        "doc_id": pa.array(fixtures.doc_name(dnum)),
        "tokens": pa.array([[int(r[0]) * 10 + r[2]] for r in rows],
                           pa.list_(pa.int32())),
        "n_tok": pa.array(np.ones(n, np.int32)),
        "source": pa.array(["bank"] * n),
        "lang": pa.array([None if v == 1 else "xx" for v in ver], pa.string()),
        "pre_tokens": pa.nulls(n, pa.list_(pa.int32())),
        "new_doc_id": pa.nulls(n, pa.string()),
        "schema_ver": pa.array(ver),
    })
    fixtures.write_wal_segments(wal, os.path.join(root, f"wal_s{shard}"), 2,
                                registry)


def _setup(tmp_path):
    root = str(tmp_path / "shards")
    os.makedirs(root, exist_ok=True)
    registry = SchemaRegistry([DDL(BARRIER, "add_column", "lang:string",
                                   "und", 2)])
    n_docs = 3 * N_PER_SHARD
    dnum = np.arange(n_docs, dtype=np.int64)
    base = pa.table({
        "doc_id": pa.array(fixtures.doc_name(dnum)),
        "tokens": pa.array([[0]] * n_docs, pa.list_(pa.int32())),
        "n_tok": pa.array(np.ones(n_docs, np.int32)),
        "source": pa.array(["bank"] * n_docs),
    })
    fixtures.write_base_partitioned(base, root, 8)
    return root, registry


def test_lagging_shard_holds_barrier_then_catches_up(tmp_path):
    root, registry = _setup(tmp_path)
    # shards 0,1 deliver everything; shard 2 lags BEFORE the barrier
    _shard_wal(root, 0, registry, hi_ts=10**9)
    _shard_wal(root, 1, registry, hi_ts=10**9)
    lag_hi = 1_000 + N_PER_SHARD - 1               # covers shard2 pre rows only
    full = str(tmp_path / "full_s2")
    os.makedirs(full)
    _shard_wal(full, 2, registry, hi_ts=10**9)     # staged full stream
    _shard_wal(root, 2, registry, hi_ts=lag_hi)    # live: lagging prefix

    wal_dirs = [os.path.join(root, f"wal_s{s}") for s in range(3)]
    cfg = ReplayConfig(wal_dir=wal_dirs[0],
                       lake_dir=os.path.join(root, "lake"), num_partitions=8)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))

    rp.run_replay_sharded(cfg, wal_dirs)
    m1 = LakeState(cfg.lake_dir).latest()
    # frontier = lagging shard's watermark < barrier ⇒ DDL NOT applied yet
    assert m1.watermark_ts < BARRIER
    assert m1.schema_ver == 1
    t1 = rp.lake_to_table(cfg.lake_dir)
    assert "lang" not in t1.column_names

    # shard 2 catches up: its full segments replace the lagging prefix
    shutil.rmtree(wal_dirs[2])
    shutil.copytree(os.path.join(full, "wal_s2"), wal_dirs[2])
    rp.run_replay_sharded(cfg, wal_dirs)
    m2 = LakeState(cfg.lake_dir).latest()
    assert m2.schema_ver == 2
    final = rp.lake_to_table(cfg.lake_dir)
    got = {d: (t[0], lg) for d, t, lg in zip(final["doc_id"].to_pylist(),
                                             final["tokens"].to_pylist(),
                                             final["lang"].to_pylist())}
    assert len(got) == 3 * N_PER_SHARD
    for d in range(3 * N_PER_SHARD):
        name = f"doc-{d:012d}"
        assert got[name] == (d * 10 + 2, "xx"), name   # post-barrier image won


def test_empty_shard_holds_frontier(tmp_path):
    """A declared shard with ZERO delivered segments must hold the merged
    frontier at nothing-committed — committing past it would silently lose
    its (later-arriving) pre-watermark events to the from_ts predicate."""
    root, registry = _setup(tmp_path)
    _shard_wal(root, 0, registry, hi_ts=10**9)
    _shard_wal(root, 1, registry, hi_ts=10**9)
    # shard 2 declared (dir + DDL schedule present) but nothing delivered
    empty = os.path.join(root, "wal_s2")
    os.makedirs(empty)
    shutil.copy(os.path.join(root, "wal_s0", "ddl.json"),
                os.path.join(empty, "ddl.json"))

    wal_dirs = [os.path.join(root, f"wal_s{s}") for s in range(3)]
    cfg = ReplayConfig(wal_dir=wal_dirs[0],
                       lake_dir=os.path.join(root, "lake"), num_partitions=8)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    watermark0 = LakeState(cfg.lake_dir).latest().watermark_ts

    res = rp.run_replay_sharded(cfg, wal_dirs)
    assert res.epochs == []                        # nothing committed
    assert LakeState(cfg.lake_dir).latest().watermark_ts == watermark0

    # shard 2 delivers → everything replays, nothing was lost
    _shard_wal(root, 2, registry, hi_ts=10**9)
    rp.run_replay_sharded(cfg, wal_dirs)
    final = rp.lake_to_table(cfg.lake_dir)
    got = {d: t[0] for d, t in zip(final["doc_id"].to_pylist(),
                                   final["tokens"].to_pylist())}
    for d in range(3 * N_PER_SHARD):
        assert got[f"doc-{d:012d}"] == d * 10 + 2


def test_divergent_shard_ddl_schedule_rejected(tmp_path):
    root, registry = _setup(tmp_path)
    _shard_wal(root, 0, registry, hi_ts=10**9)
    other = SchemaRegistry([DDL(BARRIER + 7, "add_column", "lang:string",
                                "und", 2)])
    _shard_wal(root, 1, other, hi_ts=10**9)
    wal_dirs = [os.path.join(root, f"wal_s{s}") for s in range(2)]
    cfg = ReplayConfig(wal_dir=wal_dirs[0],
                       lake_dir=os.path.join(root, "lake"), num_partitions=8)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    with pytest.raises(ValueError, match="DDL schedule"):
        rp.run_replay_sharded(cfg, wal_dirs)
