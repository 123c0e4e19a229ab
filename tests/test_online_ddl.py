"""Online-DDL (gh-ost / pt-osc) shadow-table handling — the
dm/syncer/online-ddl-tools/online_ddl.go RealOnlinePlugin semantics:
classification (TableType/RealName, default rules subtask.go:59-60),
the Apply decision table (442-523), and the engine integration (ghost
DML dropped at Normalize, recorded alters folding out at the swap)."""

import numpy as np
import pyarrow as pa
import pytest

from tiflow_ray.stages.online_ddl import (OnlineDDLPlugin, TableStmt,
                                          registry_from_binlog)


def _stmt(kind, table, ts=0, to=None, payload=None):
    return TableStmt(kind, "db", table, ts, to_table=to, payload=payload)


def test_classification_and_real_name():
    p = OnlineDDLPlugin()
    # gh-ost
    assert p.table_type("_users_gho") == "ghost"
    assert p.table_type("_users_ghc") == "trash"
    assert p.table_type("_users_del") == "trash"
    # pt-osc
    assert p.table_type("_users_new") == "ghost"
    assert p.table_type("_users_old") == "trash"
    assert p.table_type("users") == "real"
    assert p.table_type("users_new") == "real"      # anchored: needs _ prefix
    for t in ("_users_gho", "_users_ghc", "_users_del", "_users_new",
              "_users_old"):
        assert p.real_name(t) == "users"
    assert p.real_name("users") == "users"


def test_ghost_migration_folds_recorded_alters_at_swap():
    p = OnlineDDLPlugin()
    assert p.apply(_stmt("create_table", "_t_gho", 1)) == []
    assert p.apply(_stmt("alter", "_t_gho", 2,
                         payload=("add_column", "lang:string", "und"))) == []
    assert p.apply(_stmt("alter", "_t_gho", 3,
                         payload=("drop_column", "n_tok", None))) == []
    # swap leg 1: real -> trash is swallowed
    assert p.apply(_stmt("rename_table", "t", 9, to="_t_del")) == []
    # swap leg 2: ghost -> real emits the recorded alters on the real table
    out = p.apply(_stmt("rename_table", "_t_gho", 9, to="t"))
    assert [(s.kind, s.table, s.barrier_ts, s.payload) for s in out] == [
        ("alter", "t", 9, ("add_column", "lang:string", "und")),
        ("alter", "t", 9, ("drop_column", "n_tok", None))]
    assert p.storage == {}                           # Finish semantics


def test_real_table_ddl_passes_through_and_trash_is_ignored():
    p = OnlineDDLPlugin()
    s = _stmt("alter", "t", 5, payload=("add_column", "x:int32", "0"))
    assert p.apply(s) == [s]
    assert p.apply(_stmt("drop_table", "_t_del", 6)) == []
    assert p.apply(_stmt("alter", "_t_ghc", 7,
                         payload=("add_column", "y:int32", "0"))) == []


def test_rejected_rename_shapes():
    p = OnlineDDLPlugin()
    with pytest.raises(ValueError):                  # real -> ghost
        p.apply(_stmt("rename_table", "t", 1, to="_t_gho"))
    with pytest.raises(ValueError):                  # trash -> ghost
        p.apply(_stmt("rename_table", "_t_del", 1, to="_t_gho"))
    p.apply(_stmt("alter", "_t_gho", 1, payload=("add_column", "a", None)))
    with pytest.raises(ValueError):                  # ghost -> ghost
        p.apply(_stmt("rename_table", "_t_gho", 2, to="_t_new"))
    with pytest.raises(ValueError):                  # swap with nothing stored
        OnlineDDLPlugin().apply(_stmt("rename_table", "_t_gho", 2, to="t"))


def test_create_drop_ghost_resets_recording():
    p = OnlineDDLPlugin()
    p.apply(_stmt("alter", "_t_gho", 1, payload=("add_column", "a", None)))
    p.apply(_stmt("create_table", "_t_gho", 2))      # migration restarted
    assert p.storage == {}
    p.apply(_stmt("alter", "_t_gho", 3, payload=("add_column", "b", None)))
    p.apply(_stmt("drop_table", "_t_gho", 4))        # migration aborted
    assert p.storage == {}
    # ghost -> trash also clears (gh-ost cut-over failure path)
    p.apply(_stmt("alter", "_t_gho", 5, payload=("add_column", "c", None)))
    p.apply(_stmt("rename_table", "_t_gho", 6, to="_t_del"))
    assert p.storage == {}


def test_registry_from_binlog_matches_direct_ddl():
    from tiflow_ray.stages.schema_evo import DDL, SchemaRegistry
    stmts = [
        _stmt("create_table", "_documents_gho", 10),
        _stmt("alter", "_documents_gho", 11,
              payload=("add_column", "lang:string", "und")),
        _stmt("rename_table", "documents", 50, to="_documents_del"),
        _stmt("rename_table", "_documents_gho", 50, to="documents"),
    ]
    reg = registry_from_binlog(stmts, "documents")
    want = SchemaRegistry([DDL(50, "add_column", "lang:string", "und", 2)])
    assert reg.to_json() == want.to_json()


def test_dml_mask_vectorized_and_tolerates_missing_column():
    p = OnlineDDLPlugin()
    rng = np.random.default_rng(7)
    names = np.array(["users", "_users_gho", "_users_ghc", "_users_del",
                      "archive"])[rng.integers(0, 5, 500)]
    t = pa.table({"table_name": pa.array(names, pa.string())})
    got = np.asarray(p.dml_mask(t))
    want = np.array([p.table_type(n) == "real" for n in names])
    assert (got == want).all()
    bare = pa.table({"doc_id": pa.array(["a", "b"])})
    assert np.asarray(p.dml_mask(bare)).all()


def test_toml_online_ddl_surface(tmp_path):
    """DM task-config surface: online-ddl = true (+ optional custom
    shadow/trash rules, subtask.go ShadowTableRules/TrashTableRules)."""
    from tiflow_ray.config import load_config
    toml = tmp_path / "task.toml"
    toml.write_text("""
wal_dir = "/dev/null"
online_ddl = true
shadow_table_rules = ["^_(.+)_shadow$"]
""")
    cfg = load_config(str(toml))
    assert cfg.online_ddl is not None
    assert cfg.online_ddl.table_type("_users_shadow") == "ghost"
    assert cfg.online_ddl.table_type("_users_gho") == "real"   # overridden
    assert cfg.online_ddl.table_type("_users_del") == "trash"  # default kept

    off = tmp_path / "off.toml"
    off.write_text('wal_dir = "/dev/null"\nonline_ddl = false\n')
    assert load_config(str(off)).online_ddl is None


def test_replay_with_ghost_traffic_matches_clean_oracle(tmp_path, ray_session):
    """Engine e2e: a t1 WAL polluted with winning-ts ghost row-copy clones
    replays to the clean oracle ONLY because cfg.online_ddl drops them."""
    import pyarrow.parquet as pq

    from tiflow_ray import fixtures, oracle
    from tiflow_ray.config import ReplayConfig
    from tiflow_ray.pipelines import replay as rp
    from tiflow_ray.sources.wal import list_segments

    root = str(tmp_path / "src")
    reg, metas, info = fixtures.generate_tier(root, "t1")
    wal = pa.concat_tables([pq.read_table(s.path)
                            for s in list_segments(f"{root}/wal")],
                           promote_options="default")
    real = wal.append_column("table_name",
                             pa.array(np.full(wal.num_rows, "documents"),
                                      pa.string()))
    junk = wal.filter(pa.array(np.arange(wal.num_rows) % 4 == 0))
    junk = junk.set_column(
        junk.column_names.index("commit_ts"), "commit_ts",
        pa.array(junk["commit_ts"].to_numpy(zero_copy_only=False) + 1,
                 pa.uint64()))
    junk = junk.append_column(
        "table_name", pa.array(np.full(junk.num_rows, "_documents_gho"),
                               pa.string()))
    polluted = str(tmp_path / "polluted_wal")
    fixtures.write_wal_segments(pa.concat_tables([real, junk]), polluted,
                                4, reg)

    from tiflow_ray.stages.online_ddl import OnlineDDLPlugin
    cfg = ReplayConfig(wal_dir=polluted, lake_dir=str(tmp_path / "lake"),
                       num_partitions=8, online_ddl=OnlineDDLPlugin())
    rp.bootstrap(cfg, base_dir=f"{root}/base")
    rp.run_replay(cfg)
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    exp = oracle.replay_to_table(root, reg)
    assert got.equals(exp)
