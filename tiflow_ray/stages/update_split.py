"""Identity-changing-update split: U(doc_id → new_doc_id) ⇒ D(doc_id) + I(new_doc_id).

Reproduces cdc/model/sink.go:1262-1318 (ShouldSplitUpdateEvent /
SplitUpdateEvent) and the reference's placement decision: split happens
BEFORE the key shuffle (the puller-side split,
cdc/processor/sourcemanager/manager.go:135-156) because the delete image and
the insert image hash to DIFFERENT partitions (SURVEY.md §7 known-hard #4).

Both halves keep the original (commit_ts, start_ts): within the old key the
delete sorts after every earlier event at the same ts by op order; the insert
starts the new key's history. Vectorized: boolean mask + table concat, no
row loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..model import OP_DELETE, OP_INSERT, OP_UPDATE


def split_updates(t: pa.Table) -> pa.Table:
    nd = t["new_doc_id"]
    moving = pc.and_kleene(pc.is_valid(nd), pc.equal(t["op"], OP_UPDATE))
    moving = pc.fill_null(moving, False)
    if not pc.any(moving).as_py():
        return t.drop_columns(["new_doc_id"])

    plain = t.filter(pc.invert(moving)).drop_columns(["new_doc_id"])
    mv = t.filter(moving)
    n = mv.num_rows

    # delete half: old key, image columns nulled
    d_cols = {}
    for name in plain.column_names:
        if name == "op":
            d_cols[name] = pa.array([OP_DELETE] * n, pa.uint8())
        elif name in ("commit_ts", "start_ts", "doc_id"):
            d_cols[name] = mv[name]
        else:
            d_cols[name] = pa.nulls(n, plain.schema.field(name).type)
    deletes = pa.table(d_cols).select(plain.column_names)

    # insert half: new key, full new image
    i_cols = {}
    for name in plain.column_names:
        if name == "op":
            i_cols[name] = pa.array([OP_INSERT] * n, pa.uint8())
        elif name == "doc_id":
            i_cols[name] = mv["new_doc_id"]
        else:
            i_cols[name] = mv[name]
    inserts = pa.table(i_cols).select(plain.column_names)

    return pa.concat_tables([plain, deletes, inserts]).combine_chunks()
