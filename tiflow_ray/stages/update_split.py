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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..model import OP_DELETE, OP_INSERT, OP_UPDATE


def split_updates(t: pa.Table) -> pa.Table:
    nd = t["new_doc_id"]
    moving = pc.and_kleene(pc.is_valid(nd), pc.equal(t["op"], OP_UPDATE))
    moving = pc.fill_null(moving, False)
    if not pc.any(moving).as_py():
        return t.drop_columns(["new_doc_id"])

    # moves are rare (~0.5% of updates): NEVER copy the full batch. The
    # moving update rows are rewritten IN PLACE into their insert half
    # (doc_id := new_doc_id, op := INSERT — two thin column rebuilds; all
    # payload columns stay zero-copy-shared), and only the tiny delete half
    # is materialized and appended.
    new_op = pc.if_else(moving, pa.scalar(OP_INSERT, pa.uint8()), t["op"])
    new_doc = pc.if_else(moving, nd, t["doc_id"])
    base = t.set_column(t.schema.get_field_index("op"), "op", new_op)
    base = base.set_column(base.schema.get_field_index("doc_id"), "doc_id", new_doc)
    base = base.drop_columns(["new_doc_id"])

    mv = t.filter(moving)  # small
    n = mv.num_rows
    d_cols = {}
    for name in base.column_names:
        if name == "op":
            d_cols[name] = pa.array(np.full(n, OP_DELETE, np.uint8()))
        elif name in ("commit_ts", "start_ts", "doc_id"):
            d_cols[name] = mv[name]
        else:
            d_cols[name] = pa.nulls(n, base.schema.field(name).type)
    deletes = pa.table(d_cols).select(base.column_names)

    return pa.concat_tables([base, deletes])
