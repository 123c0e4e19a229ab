"""JSONL WAL codec, event-predicate hook, diff validator, CLI, skew."""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from tiflow_ray import fixtures, oracle
from tiflow_ray.config import ReplayConfig
from tiflow_ray.pipelines import replay as rp


def _wal_as_jsonl(src_root, dst_root, reg):
    """Rewrite a generated parquet WAL as JSONL segments (same events)."""
    from tiflow_ray.sources.wal import list_segments
    os.makedirs(f"{dst_root}/wal", exist_ok=True)
    tables = [pq.read_table(s.path) for s in list_segments(f"{src_root}/wal")]
    t = pa.concat_tables(tables, promote_options="default")
    fixtures.write_wal_segments(t, f"{dst_root}/wal", len(tables), reg,
                                fmt="jsonl")


def test_jsonl_wal_matches_parquet_wal(t1_noddl_fixture, tmp_path):
    root, reg, *_ = t1_noddl_fixture
    jroot = str(tmp_path / "jsonl_fixture")
    _wal_as_jsonl(root, jroot, reg)

    cfgs = {}
    for tag, wal in [("pq", f"{root}/wal"), ("js", f"{jroot}/wal")]:
        cfg = ReplayConfig(wal_dir=wal, lake_dir=str(tmp_path / f"lake_{tag}"),
                           num_partitions=8, validate=True)
        rp.bootstrap(cfg, base_dir=f"{root}/base")
        rp.run_replay(cfg)
        cfgs[tag] = cfg
    tp = rp.lake_to_table(cfgs["pq"].lake_dir, cfgs["pq"].wal_dir)
    tj = rp.lake_to_table(cfgs["js"].lake_dir, cfgs["js"].wal_dir)
    assert tp.equals(tj)
    assert tp.equals(oracle.replay_to_table(root, reg))


def test_event_predicate_hook(t1_noddl_fixture, tmp_path):
    """M6/§2.10: user predicate drops events by image content; deletes with
    null images must survive the mask semantics explicitly."""
    root, reg, *_ = t1_noddl_fixture

    def keep_short(t: pa.Table):
        # keep deletes plus events with < 40 tokens
        short = pc.fill_null(pc.less(pc.list_value_length(t["tokens"]), 40), True)
        return short

    cfg = ReplayConfig(wal_dir=f"{root}/wal", lake_dir=str(tmp_path / "lake"),
                       num_partitions=8, event_predicate=keep_short)
    rp.bootstrap(cfg, base_dir=f"{root}/base")
    rp.run_replay(cfg)
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    # python-side oracle with the same filter
    rows = oracle.load_base_rows(root)
    evs = [e for e in oracle.load_wal_events(root)
           if e["tokens"] is None or len(e["tokens"]) < 40]
    evs.sort(key=lambda e: (e["commit_ts"], e["start_ts"], e["op"]))
    for e in evs:
        if e["op"] == 1:
            rows.pop(e["doc_id"], None)
        else:
            doc = e["new_doc_id"] if (e["op"] == 2 and e.get("new_doc_id")) else e["doc_id"]
            if e["op"] == 2 and e.get("new_doc_id"):
                rows.pop(e["doc_id"], None)
            rows[doc] = {"doc_id": doc, "tokens": e["tokens"],
                         "n_tok": e["n_tok"], "source": e["source"]}
    assert got.num_rows == len(rows)
    got_map = {r["doc_id"]: r["tokens"] for r in got.to_pylist()}
    for k, v in rows.items():
        assert got_map[k] == v["tokens"], k


def test_diff_validator_finds_planted_differences(t1_noddl_fixture, tmp_path):
    import ray.data
    from tiflow_ray.functions.diff import diff_tables
    root, reg, *_ = t1_noddl_fixture
    cfg = ReplayConfig(wal_dir=f"{root}/wal", lake_dir=str(tmp_path / "lake"),
                       num_partitions=8)
    rp.bootstrap(cfg, base_dir=f"{root}/base")
    rp.run_replay(cfg)
    t = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)

    same = diff_tables(ray.data.from_arrow(t), ray.data.from_arrow(t), "doc_id")
    assert same["equal"]

    # plant: drop one row, mutate one row's n_tok
    mutated = t.slice(1)  # drops row 0
    nt = mutated["n_tok"].to_numpy(zero_copy_only=False).copy()
    nt[0] = nt[0] + 1
    mutated = mutated.set_column(mutated.schema.get_field_index("n_tok"),
                                 "n_tok", pa.array(nt, pa.int32()))
    d = diff_tables(ray.data.from_arrow(t), ray.data.from_arrow(mutated), "doc_id")
    assert not d["equal"]
    dropped = t["doc_id"][0].as_py()
    changed = t["doc_id"][1].as_py()
    assert dropped in d["left_only"]
    assert changed in d["value_diff"]


def test_extreme_hot_key_skew(tmp_path):
    """90% of events on ~3 docs: combiner + partition sort must still give
    the exact oracle state."""
    root = str(tmp_path / "hot")
    reg, metas, info = fixtures.generate_tier(
        root, "t1_noddl", hot_frac=0.002, hot_share=0.9)
    cfg = ReplayConfig(wal_dir=f"{root}/wal", lake_dir=str(tmp_path / "lake"),
                       num_partitions=8, validate=True)
    rp.bootstrap(cfg, base_dir=f"{root}/base")
    rp.run_replay(cfg)
    got = rp.lake_to_table(cfg.lake_dir, cfg.wal_dir)
    assert got.equals(oracle.replay_to_table(root, reg))


def test_cli_end_to_end(t1_noddl_fixture, tmp_path):
    """Drive the CLI as a user would (fresh process owning its Ray session)."""
    root, reg, *_ = t1_noddl_fixture
    lake = str(tmp_path / "lake_cli")
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), RAY_ADDRESS="local")
    out = subprocess.run(
        [sys.executable, "-m", "tiflow_ray.cli", "--num-cpus", "4",
         "replay", "--wal", f"{root}/wal", "--lake", lake, "-P", "8"],
        capture_output=True, text=True, env=env, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    # bootstrap-less lake (insert-only semantics): every doc came from WAL
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["epochs"] >= 1
    show = subprocess.run(
        [sys.executable, "-m", "tiflow_ray.cli", "show", "--lake", lake],
        capture_output=True, text=True, env=env, timeout=60)
    assert show.returncode == 0
    assert json.loads(show.stdout)["epoch"] >= 1
