"""Identity-changing update split (cdc/model/sink.go:1262-1318 semantics)."""

import pyarrow as pa

from tiflow_ray.model import OP_DELETE, OP_INSERT, OP_UPDATE
from tiflow_ray.stages.update_split import split_updates


def make(rows):
    return pa.table({
        "op": pa.array([r["op"] for r in rows], pa.uint8()),
        "commit_ts": pa.array([r["cts"] for r in rows], pa.uint64()),
        "start_ts": pa.array([r["sts"] for r in rows], pa.uint64()),
        "doc_id": pa.array([r["doc"] for r in rows]),
        "tokens": pa.array([r.get("tokens") for r in rows], pa.list_(pa.int32())),
        "new_doc_id": pa.array([r.get("new") for r in rows], pa.string()),
    })


def test_no_moves_passthrough():
    t = make([{"op": OP_UPDATE, "cts": 5, "sts": 1, "doc": "a", "tokens": [1]}])
    out = split_updates(t)
    assert out.num_rows == 1 and "new_doc_id" not in out.column_names


def test_move_splits_into_delete_plus_insert():
    t = make([
        {"op": OP_UPDATE, "cts": 5, "sts": 1, "doc": "a", "tokens": [1, 2],
         "new": "b"},
        {"op": OP_INSERT, "cts": 3, "sts": 1, "doc": "c", "tokens": [9]},
    ])
    out = split_updates(t).to_pylist()
    assert len(out) == 3
    by_key = {(r["doc_id"], r["op"]): r for r in out}
    d = by_key[("a", OP_DELETE)]
    i = by_key[("b", OP_INSERT)]
    # both halves keep the original ts pair (split, not re-timestamp)
    assert (d["commit_ts"], d["start_ts"]) == (5, 1)
    assert (i["commit_ts"], i["start_ts"]) == (5, 1)
    assert d["tokens"] is None          # delete image is empty
    assert i["tokens"] == [1, 2]        # insert carries the new image
    assert ("c", OP_INSERT) in by_key   # untouched row passes through


def test_update_without_move_is_not_split():
    t = make([{"op": OP_DELETE, "cts": 5, "sts": 1, "doc": "a", "new": "b"}])
    # op != UPDATE ⇒ new_doc_id ignored (defensive; generator never emits it)
    out = split_updates(t)
    assert out.num_rows == 1 and out["op"].to_pylist() == [OP_DELETE]
