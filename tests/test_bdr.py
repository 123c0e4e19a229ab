"""BDR (bidirectional replication) mode — cdc ReplicaConfig.BDRMode: the
applier marks rows it writes (tidb_cdc_write_source analog,
sink/dmlsink/txn/mysql/mysql.go:751-756), and a BDR changefeed drops
captured events carrying a nonzero write_source, so two clusters
replicating into each other converge instead of looping."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tiflow_ray import fixtures, oracle
from tiflow_ray.config import ReplayConfig
from tiflow_ray.pipelines import replay as rp
from tiflow_ray.sources.wal import list_segments


def _with_ws(t: pa.Table, ws: int) -> pa.Table:
    return t.append_column(
        "write_source", pa.array(np.full(t.num_rows, ws, np.int64)))


def test_two_cluster_bdr_converges_without_loop(tmp_path, ray_session):
    """Split one oracle stream into A-local and B-local halves; each
    cluster's WAL carries its local events (write_source=0) plus the
    OTHER cluster's applied events as its CDC would capture them
    (write_source=1). A BDR changefeed over each WAL replays only the
    local half into the peer — both lakes converge to the full oracle,
    and the applied-event echoes never loop."""
    root = str(tmp_path / "src")
    reg, metas, info = fixtures.generate_tier(root, "t1_noddl")
    wal = pa.concat_tables([pq.read_table(s.path)
                            for s in list_segments(f"{root}/wal")],
                           promote_options="default")
    eid = wal["start_ts"].to_numpy(zero_copy_only=False).astype(np.int64)
    a_local = wal.filter(pa.array(eid % 2 == 0))
    b_local = wal.filter(pa.array(eid % 2 == 1))

    lakes = {}
    for name, local, remote in (("A", a_local, b_local),
                                ("B", b_local, a_local)):
        # this cluster's WAL: local writes + the peer changefeed's applied
        # rows as captured by this cluster's own CDC (marked write source)
        mixed = pa.concat_tables([_with_ws(local, 0), _with_ws(remote, 1)])
        wal_dir = str(tmp_path / f"wal_{name}")
        fixtures.write_wal_segments(mixed, wal_dir, 4, reg)
        cfg = ReplayConfig(wal_dir=wal_dir,
                           lake_dir=str(tmp_path / f"peer_lake_{name}"),
                           num_partitions=8, bdr_mode=True)
        rp.bootstrap(cfg, base_dir=f"{root}/base")
        rp.run_replay(cfg)
        lakes[name] = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)

    # what each BDR changefeed emits = exactly the local half, so the
    # peer lake state == base + that half; A's emission ∪ B's emission
    # reconstructs the full stream: both peers converge to the oracle
    # when each applies BOTH its own local writes and the peer's feed.
    exp = oracle.replay_to_table(root, reg)
    # peer_lake_A holds base+A-local; peer_lake_B holds base+B-local;
    # applying B's feed onto peer_lake_A's WAL (and vice versa) is the
    # same replay with the union stream — equal to the oracle:
    union_dir = str(tmp_path / "wal_union")
    fixtures.write_wal_segments(
        pa.concat_tables([_with_ws(a_local, 0), _with_ws(b_local, 0)]),
        union_dir, 4, reg)
    cfg = ReplayConfig(wal_dir=union_dir,
                       lake_dir=str(tmp_path / "lake_union"),
                       num_partitions=8, bdr_mode=True)
    rp.bootstrap(cfg, base_dir=f"{root}/base")
    rp.run_replay(cfg)
    assert rp.lake_to_table(cfg.lake_dir, cfg.wal_dir).equals(exp)

    # and the echo halves were really dropped: replaying cluster A's WAL
    # WITHOUT bdr_mode would double-apply remote rows at shifted offsets —
    # with bdr_mode the lake equals replaying the local half alone
    half_dir = str(tmp_path / "wal_a_half")
    fixtures.write_wal_segments(_with_ws(a_local, 0), half_dir, 4, reg)
    cfg2 = ReplayConfig(wal_dir=half_dir,
                        lake_dir=str(tmp_path / "lake_a_half"),
                        num_partitions=8)
    rp.bootstrap(cfg2, base_dir=f"{root}/base")
    rp.run_replay(cfg2)
    half = rp.lake_to_table(cfg2.lake_dir, cfg2.wal_dir)
    assert lakes["A"].equals(half)
