# DM error-operator handling (stages/handle_error.py — dmctl `binlog
# skip | replace | inject | list | revert`, dm/syncer/handle_error.go):
# a corrupted/unexecutable DDL schedule stops replay loudly; a
# registered operator patches the schedule at its barrier position and
# replay proceeds, matching the sequential oracle under the patched
# registry. Operators behind the lake checkpoint are outdated.
import json
import os
import shutil

import pytest

from tiflow_ray import oracle
from tiflow_ray.config import ReplayConfig
from tiflow_ray.pipelines import replay as rp
from tiflow_ray.sources.wal import load_registry
from tiflow_ray.stages.handle_error import (apply_error_ops, handle_error,
                                            load_ops)
from tiflow_ray.stages.schema_evo import OPERATOR_SKIP_DDL, SchemaRegistry


def _clone_fixture(t1_fixture, tmp_path, name):
    src_root, reg, _metas, _info = t1_fixture
    root = str(tmp_path / name)
    os.makedirs(root)
    for d in ("wal", "base"):
        shutil.copytree(os.path.join(src_root, d), os.path.join(root, d))
    return root, reg


def _corrupt_first_ddl(wal_dir) -> int:
    """Rewrite the first DDL's type to something the engine cannot
    execute (the 'DDL fails downstream' trigger); returns its ts."""
    p = os.path.join(wal_dir, "ddl.json")
    with open(p) as f:
        raw = json.load(f)
    assert raw, "fixture has no DDLs"
    orig = dict(raw[0])
    raw[0]["ddl_type"] = "change_charset"
    with open(p, "w") as f:
        json.dump(raw, f)
    return int(orig["barrier_ts"]), orig


def _cfg(root):
    return ReplayConfig(wal_dir=os.path.join(root, "wal"),
                        lake_dir=os.path.join(root, "lake"),
                        num_partitions=8, max_segments_per_epoch=2)


def test_replace_restores_the_original_stream(t1_fixture, tmp_path):
    """Corrupt a DDL → replay refuses loudly; `replace` it with the
    correct spec → the lake is byte-identical to the never-corrupted
    replay (the dmctl `binlog replace` happy path)."""
    root, reg = _clone_fixture(t1_fixture, tmp_path, "repl")
    wal = os.path.join(root, "wal")
    ts, orig = _corrupt_first_ddl(wal)
    with pytest.raises(ValueError, match="unknown ddl_type"):
        load_registry(wal)
    r = handle_error(wal, "replace", at_ts=ts,
                     ddls=[{"ddl_type": orig["ddl_type"],
                            "column": orig["column"],
                            "default": orig["default"]}])
    assert r["pending"] == 1
    assert load_registry(wal).to_json() == reg.to_json()
    cfg = _cfg(root)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg)
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    assert got.equals(oracle.replay_to_table(root, reg))


def test_skip_neutralizes_the_ddl_but_keeps_its_barrier(t1_fixture,
                                                        tmp_path):
    root, _reg = _clone_fixture(t1_fixture, tmp_path, "skip")
    wal = os.path.join(root, "wal")
    ts, _orig = _corrupt_first_ddl(wal)
    handle_error(wal, "skip", at_ts=ts)
    patched = load_registry(wal)
    d0 = patched.ddls[0]
    assert d0.ddl_type == OPERATOR_SKIP_DDL and d0.barrier_ts == ts
    # barrier kept: version++ with no schema change
    assert patched.schema(2).equals(patched.schema(1))
    assert ts in patched.barriers()
    cfg = _cfg(root)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    res = rp.run_replay(cfg)
    assert res.epochs
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    assert got.equals(oracle.replay_to_table(root, patched))
    # the skip is auditable in a committed manifest, never silent
    from tiflow_ray.state.checkpoint import LakeState
    lake = LakeState(cfg.lake_dir)
    notes = [lake.load(e.epoch).stats.get("ddl_skipped")
             for e in res.epochs]
    assert any(n for n in notes if n), notes


def test_inject_adds_a_fresh_barrier(t1_fixture, tmp_path):
    """Inject a drop_column at a barrier-free position past the existing
    schedule (dmctl `binlog inject`): the new DDL cuts an epoch and the
    lake matches the oracle under the injected registry."""
    root, reg = _clone_fixture(t1_fixture, tmp_path, "inj")
    wal = os.path.join(root, "wal")
    inject_ts = max(reg.barriers()) + 77
    handle_error(wal, "inject", at_ts=inject_ts,
                 ddls=[{"ddl_type": "drop_column", "column": "source"}])
    patched = load_registry(wal)
    assert patched.max_ver == reg.max_ver + 1
    assert inject_ts in patched.barriers()
    assert "source" not in [f.name for f in patched.schema(patched.max_ver)]
    cfg = _cfg(root)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg)
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    assert "source" not in got.column_names
    # stamped per-event schema_vers predate the injection — the oracle
    # walks the patched barrier schedule instead of trusting them
    assert got.equals(oracle.replay_to_table(root, patched,
                                             trust_stamped_ver=False))


def test_list_revert_and_spec_errors(t1_fixture, tmp_path):
    root, reg = _clone_fixture(t1_fixture, tmp_path, "lst")
    wal = os.path.join(root, "wal")
    b = reg.barriers()
    handle_error(wal, "skip", at_ts=b[0])
    handle_error(wal, "inject", at_ts=b[-1] + 5,
                 ddls=[{"ddl_type": "drop_column", "column": "source"}])
    ops = handle_error(wal, "list")
    assert [o["at_ts"] for o in ops] == [b[0], b[-1] + 5]
    assert ops[0]["op"] == "skip" and ops[1]["op"] == "inject"
    # ListEqualAndAfter: position filter
    assert [o["at_ts"] for o in handle_error(wal, "list", at_ts=b[0] + 1)] \
        == [b[-1] + 5]
    handle_error(wal, "revert", at_ts=b[0])
    assert [o["at_ts"] for o in handle_error(wal, "list")] == [b[-1] + 5]
    with pytest.raises(ValueError, match="no operator registered"):
        handle_error(wal, "revert", at_ts=b[0])
    # skip/replace need an existing position
    with pytest.raises(ValueError, match="no DDL at that position"):
        apply_error_ops([], {"999": {"op": "skip"}})
    with pytest.raises(ValueError, match="no DDL at that position"):
        apply_error_ops([], {"999": {"op": "replace", "ddls": [
            {"ddl_type": "drop_column", "column": "source"}]}})


def test_outdated_operators_swept_and_refused(t1_fixture, tmp_path):
    """Once the lake checkpoint passes a position, operators there are
    history: registering is refused, stale entries are swept
    (handle_error.go RemoveOutdated)."""
    root, reg = _clone_fixture(t1_fixture, tmp_path, "outd")
    wal = os.path.join(root, "wal")
    cfg = _cfg(root)
    rp.bootstrap(cfg, base_dir=os.path.join(root, "base"))
    rp.run_replay(cfg)
    lake = cfg.lake_dir
    old_ts = reg.barriers()[0]
    with pytest.raises(ValueError, match="behind the lake checkpoint"):
        handle_error(wal, "skip", at_ts=old_ts, lake_dir=lake)
    # a stale op registered WITHOUT the lake view is swept on the next
    # lake-aware call
    handle_error(wal, "skip", at_ts=old_ts)
    assert handle_error(wal, "list", lake_dir=lake) == []


def test_cli_handle_error(t1_fixture, tmp_path, capsys):
    from tiflow_ray.cli import main
    root, reg = _clone_fixture(t1_fixture, tmp_path, "cli")
    wal = os.path.join(root, "wal")
    ts, orig = _corrupt_first_ddl(wal)
    main(["handle-error", "--wal", wal, "--op", "replace",
          "--ts", str(ts),
          "--ddl", f"{orig['ddl_type']} {orig['column']} "
                   f"{orig['default']}"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["pending"] == 1
    assert load_registry(wal).to_json() == reg.to_json()
    main(["handle-error", "--wal", wal, "--op", "list"])
    listed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert listed[0]["at_ts"] == ts


def test_table_scoped_operator_in_multitable_changefeed(tmp_path):
    """A table-scoped skip (dmctl with a table filter) patches ONLY that
    table's schedule in a multi-table changefeed: the broken table
    replays under the neutralized barrier, the others are untouched."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_multitable import _expected, _setup

    from tiflow_ray.pipelines import multitable as mt

    root, regs, base_dirs, wal_dir = _setup(tmp_path)
    # corrupt tb's only DDL (add_column lang) into an unexecutable type
    p = os.path.join(wal_dir, "tables.json")
    with open(p) as f:
        raw = json.load(f)
    tb_specs = json.loads(raw["tb"])
    ts = int(tb_specs[0]["barrier_ts"])
    tb_specs[0]["ddl_type"] = "change_charset"
    raw["tb"] = json.dumps(tb_specs)
    with open(p, "w") as f:
        json.dump(raw, f)
    with pytest.raises(ValueError, match="unknown ddl_type"):
        mt.load_multitable_registries(wal_dir)

    handle_error(wal_dir, "skip", at_ts=ts, table="tb")
    regs2, _ = mt.load_multitable_registries(wal_dir)
    assert regs2["tb"].ddls[0].ddl_type == OPERATOR_SKIP_DDL
    assert regs2["ta"].to_json() == regs["ta"].to_json()   # untouched
    assert regs2["tc"].to_json() == regs["tc"].to_json()

    cfg = ReplayConfig(wal_dir=wal_dir,
                       lake_dir=os.path.join(root, "lake_he"),
                       num_partitions=8, max_segments_per_epoch=2)
    mt.bootstrap_multitable(cfg, regs2, base_dirs)
    mt.run_replay_multitable(cfg)
    for t in ("ta", "tc"):
        got = mt.multitable_lake_to_table(cfg.lake_dir, t)
        assert got.equals(_expected(root, regs, t)), t
    got_tb = mt.multitable_lake_to_table(cfg.lake_dir, "tb")
    from tiflow_ray import oracle as _oracle
    exp_tb = _oracle.replay_to_table(os.path.join(root, "oracle_tb"),
                                     regs2["tb"])
    assert got_tb.equals(exp_tb)
    assert "lang" not in got_tb.column_names   # the skip really skipped
    # list shows the table scope; single-table listing doesn't see it
    ops = handle_error(wal_dir, "list")
    assert ops == [{"at_ts": ts, "table": "tb", "op": "skip"}]
    assert handle_error(wal_dir, "list", table="ta") == []
