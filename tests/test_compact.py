"""LWW compaction unit tests — the ordering semantics of
cdc/model/mounter.go:163-186 (delete<update<insert at equal ts, start_ts
tiebreak) are SURVEY.md §7 known-hard #1; pin them exhaustively."""

import numpy as np
import pyarrow as pa

from tiflow_ray.model import OP_DELETE, OP_INSERT, OP_UPDATE
from tiflow_ray.stages.compact import assign_partition, compact_batch, compact_partition


def ev_table(rows):
    """rows: list of (doc_id, commit_ts, start_ts, op, payload)."""
    return pa.table({
        "op": pa.array([r[3] for r in rows], pa.uint8()),
        "commit_ts": pa.array([r[1] for r in rows], pa.uint64()),
        "start_ts": pa.array([r[2] for r in rows], pa.uint64()),
        "doc_id": pa.array([r[0] for r in rows]),
        "payload": pa.array([r[4] for r in rows], pa.int64()),
    })


def winner(t, doc):
    t = compact_partition(t)
    m = [i for i, d in enumerate(t["doc_id"].to_pylist()) if d == doc]
    assert len(m) == 1
    return t.slice(m[0], 1).to_pylist()[0]


def test_commit_ts_order():
    t = ev_table([("a", 5, 1, OP_UPDATE, 1), ("a", 9, 1, OP_UPDATE, 2),
                  ("a", 7, 1, OP_UPDATE, 3)])
    assert winner(t, "a")["payload"] == 2


def test_start_ts_tiebreak():
    t = ev_table([("a", 5, 3, OP_UPDATE, 1), ("a", 5, 9, OP_UPDATE, 2),
                  ("a", 5, 7, OP_UPDATE, 3)])
    assert winner(t, "a")["payload"] == 2


def test_op_order_delete_before_insert_at_equal_ts():
    """Re-insert txn: D and I share (commit_ts, start_ts); insert applies
    last (delete<update<insert), so the row SURVIVES."""
    t = ev_table([("a", 5, 2, OP_DELETE, 0), ("a", 5, 2, OP_INSERT, 7)])
    w = winner(t, "a")
    assert w["op"] == OP_INSERT and w["payload"] == 7
    # and the reverse shuffle order in the input changes nothing
    t2 = ev_table([("a", 5, 2, OP_INSERT, 7), ("a", 5, 2, OP_DELETE, 0)])
    assert winner(t2, "a") == w


def test_delete_wins_when_last():
    t = ev_table([("a", 5, 1, OP_INSERT, 1), ("a", 8, 1, OP_DELETE, 0)])
    assert winner(t, "a")["op"] == OP_DELETE


def test_precompact_associativity():
    """compact(concat(compact(chunks))) == compact(all) for random splits —
    the property that makes the pre-shuffle combiner sound (SURVEY.md §7
    known-hard #5)."""
    rng = np.random.default_rng(0)
    rows = []
    for i in range(500):
        doc = f"d{rng.integers(0, 40)}"
        rows.append((doc, int(rng.integers(1, 50)), int(rng.integers(0, 10)),
                     int(rng.choice([OP_DELETE, OP_UPDATE, OP_INSERT])), i))
    t = ev_table(rows)
    direct = compact_partition(t)
    for trial in range(5):
        perm = rng.permutation(len(rows))
        shuffled = t.take(pa.array(perm))
        cuts = sorted(rng.choice(np.arange(1, len(rows)), 3, replace=False))
        chunks, lo = [], 0
        for c in list(cuts) + [len(rows)]:
            chunks.append(compact_batch(shuffled.slice(lo, c - lo)))
            lo = c
        recombined = compact_partition(pa.concat_tables(chunks))
        # compare winners on the full sort key (payload may tie-differ when
        # two random rows share the exact key — impossible in real streams,
        # where commit_ts strictly increases per doc)
        d = {r["doc_id"]: (r["commit_ts"], r["start_ts"], r["op"])
             for r in direct.to_pylist()}
        r = {r["doc_id"]: (r["commit_ts"], r["start_ts"], r["op"])
             for r in recombined.to_pylist()}
        assert d == r


def test_assign_partition_stable():
    t = ev_table([("a", 1, 0, OP_INSERT, 1), ("b", 1, 0, OP_INSERT, 1),
                  ("a", 2, 0, OP_UPDATE, 2)])
    p1 = assign_partition(t, 8)["part"].to_pylist()
    p2 = assign_partition(t, 8)["part"].to_pylist()
    assert p1 == p2
    assert p1[0] == p1[2]  # same doc → same partition
    assert all(0 <= x < 8 for x in p1)
