"""TRUNCATE TABLE DDL (cdc/model DDL job; the sink wipes all rows at the
barrier): a truncate barrier cuts an epoch like any DDL, every row and
every pre-truncate upsert image dies crossing it, and post-truncate events
rebuild the table — verified against the sequential oracle, across MoR
delta chains and stop/resume."""

import os

import numpy as np
import pyarrow as pa

from tiflow_ray import fixtures, oracle
from tiflow_ray.config import ReplayConfig
from tiflow_ray.pipelines import replay as rp
from tiflow_ray.stages.schema_evo import DDL, SchemaRegistry

BAR = 5_000
N_DOCS = 60


def _setup(tmp_path):
    root = str(tmp_path / "trunc")
    os.makedirs(root, exist_ok=True)
    registry = SchemaRegistry([DDL(BAR, "truncate", "", None, 2)])
    dnum = np.arange(N_DOCS, dtype=np.int64)
    base = pa.table({
        "doc_id": pa.array(fixtures.doc_name(dnum)),
        "tokens": pa.array([[0]] * N_DOCS, pa.list_(pa.int32())),
        "n_tok": pa.array(np.ones(N_DOCS, np.int32)),
        "source": pa.array(["seed"] * N_DOCS),
    })
    fixtures.write_base_partitioned(base, root, 8)

    # pre-truncate: every doc updated; post-truncate: only every 3rd doc
    # re-inserted (the rest must be GONE, incl. their base rows)
    rows = [(d, 1_000 + int(d), 2) for d in dnum]
    rows += [(d, BAR, 2) for d in dnum if d % 5 == 0]   # AT barrier = pre
    rows += [(d, BAR + 1_000 + int(d), 3) for d in dnum if d % 3 == 0]
    rows.sort(key=lambda r: r[1])
    n = len(rows)
    cts = np.array([r[1] for r in rows], np.uint64)
    wal = pa.table({
        "op": pa.array(np.array([r[2] if r[1] > BAR else 2 for r in rows],
                                np.uint8)),
        "commit_ts": pa.array(cts),
        "start_ts": pa.array(np.arange(n, dtype=np.uint64)),
        "doc_id": pa.array(fixtures.doc_name(
            np.array([r[0] for r in rows], np.int64))),
        "tokens": pa.array([[int(r[0]) * 100 + r[1] % 97] for r in rows],
                           pa.list_(pa.int32())),
        "n_tok": pa.array(np.ones(n, np.int32)),
        "source": pa.array(["wal"] * n),
        "pre_tokens": pa.nulls(n, pa.list_(pa.int32())),
        "new_doc_id": pa.nulls(n, pa.string()),
        "schema_ver": pa.array(np.where(cts > BAR, 2, 1).astype(np.int32)),
    })
    fixtures.write_wal_segments(wal, os.path.join(root, "wal"), 4, registry)
    return root, registry


def test_truncate_barrier_wipes_and_rebuilds(tmp_path):
    root, reg = _setup(tmp_path)
    cfg = ReplayConfig(wal_dir=os.path.join(root, "wal"),
                       lake_dir=os.path.join(root, "lake"),
                       num_partitions=8, max_segments_per_epoch=1,
                       validate=True)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg)
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    exp = oracle.replay_to_table(root, reg)
    assert got.equals(exp)
    # only the re-inserted third survive; base and pre-barrier rows died
    ids = got["doc_id"].to_pylist()
    assert len(ids) == len([d for d in range(N_DOCS) if d % 3 == 0])
    assert all(int(i.rsplit("-", 1)[-1]) % 3 == 0 for i in ids)
    assert set(got["source"].to_pylist()) == {"wal"}


def test_truncate_with_stop_resume_and_compaction(tmp_path):
    """Stop BEFORE the truncate barrier, resume across it, then compact —
    the wipe must happen exactly once and fold to the same state."""
    root, reg = _setup(tmp_path)
    cfg = ReplayConfig(wal_dir=os.path.join(root, "wal"),
                       lake_dir=os.path.join(root, "lake2"),
                       num_partitions=8, max_segments_per_epoch=1,
                       validate=True, compact_every=10**9)   # force MoR chains
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg, upto_ts=BAR - 1)           # stop pre-barrier
    mid = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    assert mid.num_rows == N_DOCS                 # nothing wiped yet
    rp.run_replay(cfg)                            # resume across truncate
    exp = oracle.replay_to_table(root, reg)
    assert rp.lake_to_table(cfg.lake_dir, cfg.wal_dir).equals(exp)
    rp.compact_lake(cfg.lake_dir)                 # fold the delta chains
    assert rp.lake_to_table(cfg.lake_dir, cfg.wal_dir).equals(exp)


# ---------------------------------------------------------------------------
# rename_column DDL (pure-metadata rename; mounter column-ID → name analog)
# ---------------------------------------------------------------------------

def test_rename_column_unit():
    import pyarrow as pa

    reg = SchemaRegistry([DDL(100, "rename_column", "source>origin", None, 2)])
    assert reg.schema(1).names == ["doc_id", "tokens", "n_tok", "source"]
    assert reg.schema(2).names == ["doc_id", "tokens", "n_tok", "origin"]
    t = pa.table({"doc_id": ["a"], "tokens": pa.array([[1]], pa.list_(pa.int32())),
                  "n_tok": pa.array([1], pa.int32()), "source": ["web"]})
    out = reg.cast_table(t, 1, 2)
    assert out.column_names == ["doc_id", "tokens", "n_tok", "origin"]
    assert out["origin"].to_pylist() == ["web"]     # values carried over
    assert reg.source_name("origin", 1, 2) == "source"
    assert reg.source_name("origin", 2, 2) == "origin"
    # reusing a renamed-away name is ambiguous — rejected loudly
    import pytest
    with pytest.raises(AssertionError, match="renamed-away"):
        SchemaRegistry([DDL(100, "rename_column", "source>origin", None, 2),
                        DDL(200, "add_column", "source:string", "x", 3)])


def test_rename_column_replay_matches_oracle(tmp_path):
    """Rename `source` → `origin` mid-stream: pre-rename events carry the
    old name, post-rename events the new one (superset physical schema);
    the final lake is under the new name with old values carried across."""
    root = str(tmp_path / "ren")
    os.makedirs(root, exist_ok=True)
    registry = SchemaRegistry([DDL(BAR, "rename_column", "source>origin",
                                   None, 2)])
    dnum = np.arange(N_DOCS, dtype=np.int64)
    base = pa.table({
        "doc_id": pa.array(fixtures.doc_name(dnum)),
        "tokens": pa.array([[0]] * N_DOCS, pa.list_(pa.int32())),
        "n_tok": pa.array(np.ones(N_DOCS, np.int32)),
        "source": pa.array(["seed"] * N_DOCS),
    })
    fixtures.write_base_partitioned(base, root, 8)

    # every doc updated pre-rename; every 2nd doc updated again post-rename
    rows = [(d, 1_000 + int(d), "pre") for d in dnum]
    rows += [(d, BAR + 1_000 + int(d), "post") for d in dnum if d % 2 == 0]
    rows.sort(key=lambda r: r[1])
    n = len(rows)
    cts = np.array([r[1] for r in rows], np.uint64)
    post = cts > BAR
    srcvals = np.array([r[2] for r in rows], object)
    wal = pa.table({
        "op": pa.array(np.full(n, 2, np.uint8)),
        "commit_ts": pa.array(cts),
        "start_ts": pa.array(np.arange(n, dtype=np.uint64)),
        "doc_id": pa.array(fixtures.doc_name(
            np.array([r[0] for r in rows], np.int64))),
        "tokens": pa.array([[int(r[0])] for r in rows], pa.list_(pa.int32())),
        "n_tok": pa.array(np.ones(n, np.int32)),
        "source": pa.array(np.where(~post, srcvals, None), pa.string()),
        "origin": pa.array(np.where(post, srcvals, None), pa.string()),
        "pre_tokens": pa.nulls(n, pa.list_(pa.int32())),
        "new_doc_id": pa.nulls(n, pa.string()),
        "schema_ver": pa.array(np.where(post, 2, 1).astype(np.int32)),
    })
    fixtures.write_wal_segments(wal, os.path.join(root, "wal"), 4, registry)

    cfg = ReplayConfig(wal_dir=os.path.join(root, "wal"),
                       lake_dir=os.path.join(root, "lake"),
                       num_partitions=8, max_segments_per_epoch=1,
                       validate=True)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg)
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    exp = oracle.replay_to_table(root, registry)
    assert got.equals(exp)
    assert "origin" in got.column_names and "source" not in got.column_names
    by_doc = dict(zip(got["doc_id"].to_pylist(), got["origin"].to_pylist()))
    assert by_doc[f"doc-{0:012d}"] == "post"     # updated after rename
    assert by_doc[f"doc-{1:012d}"] == "pre"      # old value carried across
