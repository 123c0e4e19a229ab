"""Per-key last-writer-wins compaction (DM compactor / sorter semantics).

The reference's compactor keeps only the last job per identity key, merging
per its reduce table (dm/syncer/compactor.go:152-225,
pkg/sqlmodel/reduce.go:185-236): INSERT+UPDATE⇒INSERT, *+DELETE⇒DELETE,
DELETE+INSERT⇒REPLACE. For FINAL-STATE replay all of those collapse to one
rule — after sorting a key's events by the total order
(commit_ts, start_ts, delete<update<insert — cdc/model/mounter.go:163-186 =
pebble sorter key encoding key.go:83-120), the LAST event alone decides the
row: op==DELETE ⇒ tombstone, else its image is the row (REPLACE semantics,
cdc/sink/dmlsink/txn/mysql/mysql.go:525-539).

Two kernels, both fully vectorized (sort_indices + boundary mask, no row
loops):

- `compact_batch`: the per-batch COMBINER run before the shuffle — valid
  because "last by total sort key" is associative; this is what makes hot
  keys (1% of docs with 50% of events) cheap: their events collapse inside
  every input batch before a single byte is shuffled (the salted
  sub-partition pre-reduce of SURVEY.md §4, splitter_write.go analog: the
  "salt" is the physical input-batch boundary).
- `compact_partition`: the final per-partition reduce after the shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..model import EVENT_SORT_KEYS, hash_partition


def _last_per_doc(t: pa.Table) -> pa.Table:
    """Sort by (doc_id, commit_ts, start_ts, op) and keep each doc's last row."""
    if t.num_rows <= 1:
        return t
    idx = pc.sort_indices(t, sort_keys=[("doc_id", "ascending")] + EVENT_SORT_KEYS)
    t = t.take(idx)
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    last = np.ones(len(ids), bool)
    last[:-1] = ids[:-1] != ids[1:]
    if last.all():
        return t
    return t.filter(pa.array(last))


def compact_batch(t: pa.Table) -> pa.Table:
    """Pre-shuffle combiner: collapse each doc_id's events within one batch."""
    return _last_per_doc(t)


def compact_partition(t: pa.Table) -> pa.Table:
    """Post-shuffle final reduce: one surviving event per doc_id."""
    return _last_per_doc(t)


def assign_partition(t: pa.Table, num_partitions: int) -> pa.Table:
    """Add the shuffle key: part = hash(doc_id) % P — the span/causality-slot
    analog (pkg/causality/conflict_detector.go:26-118): all events of one key
    land in one partition ⇒ serialized per key, parallel across keys."""
    parts = hash_partition(t["doc_id"], num_partitions)
    return t.append_column("part", pa.array(parts, pa.uint32()))
