"""Fixture-generator invariants: the WAL must be a legal, watermark-
delimited change stream (FIXTURES.md §2) or every downstream test is void."""

import collections

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq

from tiflow_ray import oracle
from tiflow_ray.model import OP_DELETE, OP_INSERT, OP_UPDATE
from tiflow_ray.sources.wal import list_segments


def test_legal_histories(t1_fixture):
    root, reg, metas, info = t1_fixture
    evs = oracle.load_wal_events(root)
    base = oracle.load_base_rows(root)
    per_doc = collections.defaultdict(list)
    for e in evs:
        per_doc[e["doc_id"]].append(e)
    for d, es in per_doc.items():
        es.sort(key=lambda e: (e["commit_ts"], e["start_ts"], e["op"]))
        alive = d in base
        for e in es:
            if e["op"] == OP_INSERT:
                assert not alive, f"insert on live doc {d}"
                alive = True
            else:
                assert alive, f"op {e['op']} on dead doc {d}"
                alive = e["op"] != OP_DELETE


def test_watermark_contract(t1_fixture):
    """All events with commit_ts <= watermark(s) are in segments <= s."""
    root, *_ = t1_fixture
    segs = list_segments(f"{root}/wal")
    for i, s in enumerate(segs):
        t = pq.read_table(s.path, columns=["commit_ts"])
        cts = t["commit_ts"].to_numpy()
        assert cts.max() == s.max_ts and cts.min() == s.min_ts
        assert s.watermark_ts == s.max_ts
        if i:
            assert cts.min() > segs[i - 1].watermark_ts


def test_image_invariants(t1_fixture):
    root, *_ = t1_fixture
    for s in list_segments(f"{root}/wal"):
        t = pq.read_table(s.path)
        ops = t["op"].to_numpy()
        has_img = pc.is_valid(t["tokens"]).to_numpy(zero_copy_only=False)
        assert (has_img == (ops != OP_DELETE)).all()
        ln = pc.list_value_length(t["tokens"]).to_numpy(zero_copy_only=False)
        nt = t["n_tok"].to_numpy(zero_copy_only=False)
        m = ops != OP_DELETE
        assert (ln[m] == nt[m]).all()
        # old image present iff update/delete of a pre-existing row
        pre = pc.is_valid(t["pre_tokens"]).to_numpy(zero_copy_only=False)
        assert not (pre & (ops == OP_INSERT)).any()


def test_schema_ver_tags_match_barriers(t1_fixture):
    root, reg, *_ = t1_fixture
    evs = oracle.load_wal_events(root)
    for e in evs:
        assert e["schema_ver"] == reg.version_at(e["commit_ts"])


def test_determinism(tmp_path):
    from tiflow_ray import fixtures
    r1, r2 = str(tmp_path / "a"), str(tmp_path / "b")
    fixtures.generate_tier(r1, "t1_noddl", seed=7)
    fixtures.generate_tier(r2, "t1_noddl", seed=7)
    s1, s2 = list_segments(f"{r1}/wal"), list_segments(f"{r2}/wal")
    assert [m.watermark_ts for m in s1] == [m.watermark_ts for m in s2]
    assert pq.read_table(s1[0].path).equals(pq.read_table(s2[0].path))
