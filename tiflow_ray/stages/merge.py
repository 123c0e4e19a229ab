"""Co-partitioned merge-apply: base lake partition ⊕ compacted deltas.

The explicit version of the reference's implicit J2 join (the downstream DB
executes REPLACE/UPDATE/DELETE, cdc/sink/dmlsink/txn/mysql/mysql.go:598-608;
the storage sink defers to the consumer): base table and deltas share the
same hash(doc_id)%P layout, so the merge never shuffles the base — each
merge task reads ONLY its own partition's current file (listed in the
previous manifest), applies the per-key winners, and writes the partition's
next file with a deterministic name (two-phase, see state/checkpoint.py).

Merge rule per doc_id (REPLACE semantics = DM safe mode, §2.9):
  winner op == DELETE → row absent (tombstone; delete-of-missing is a no-op)
  winner op == INSERT/UPDATE → row := winner image (upsert-on-missing OK)
  no winner → base row survives (cast to the epoch's schema on touch)

Output rows are sorted by doc_id — deterministic files for byte-equality
judging (SURVEY.md §7 known-hard #7).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..model import OP_DELETE
from .compact import compact_partition
from .schema_evo import SchemaRegistry


class MergeApply:
    """Per-partition merge worker, used as the `map_groups` body of the
    groupby("part") shuffle. Stateful-ish config (registry, manifest parts,
    epoch, target paths) is small and rides in the closure; the heavy state
    (the base partition) is read inside the task from the lake — the actor
    analog of the reference's per-table dmlWorkers
    (cdc/sink/dmlsink/cloudstorage/dml_worker.go)."""

    def __init__(self, *, registry_json: str, prev_parts: dict[str, dict],
                 epoch: int, epoch_ver: int, watermark_ts: int,
                 lake_data_dir: str, final_compact: bool = True):
        self.registry = SchemaRegistry.from_json(registry_json)
        self.prev_parts = prev_parts
        self.epoch = epoch
        self.epoch_ver = epoch_ver
        self.watermark_ts = watermark_ts
        self.lake_data_dir = lake_data_dir
        self.final_compact = final_compact

    def __call__(self, deltas: pa.Table) -> pa.Table:
        part = int(deltas["part"][0].as_py())
        deltas = deltas.drop_columns(["part"])
        if self.final_compact:
            deltas = compact_partition(deltas)

        target_schema = self.registry.schema(self.epoch_ver)

        # read my base partition (no shuffle: co-partitioned by layout)
        prev = self.prev_parts.get(str(part))
        if prev is not None and prev.get("path"):
            base = pq.read_table(prev["path"])
            base = self.registry.cast_table(base, prev["schema_ver"], self.epoch_ver)
        else:
            base = target_schema.empty_table()

        # anti-join: base rows not touched this epoch survive
        touched = pc.unique(deltas["doc_id"])  # plain Array, valid as value_set
        survivors = base.filter(pc.invert(pc.is_in(base["doc_id"], value_set=touched)))

        # winners that are not tombstones become/replace rows
        ups = deltas.filter(pc.not_equal(deltas["op"], OP_DELETE))
        upsert_rows = ups.select([f.name for f in target_schema]).cast(target_schema)

        out = pa.concat_tables([survivors, upsert_rows])
        out = out.take(pc.sort_indices(out, sort_keys=[("doc_id", "ascending")]))

        path = os.path.join(self.lake_data_dir, f"part={part}",
                            f"epoch-{self.epoch:06d}.parquet")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(out, tmp)
        os.replace(tmp, path)  # idempotent under task retry (deterministic content)

        return pa.table({
            "part": pa.array([part], pa.int32()),
            "path": pa.array([path]),
            "rows": pa.array([out.num_rows], pa.int64()),
            "bytes": pa.array([out.nbytes], pa.int64()),
            "delta_events": pa.array([deltas.num_rows], pa.int64()),
            "upserts": pa.array([upsert_rows.num_rows], pa.int64()),
            "deletes": pa.array([deltas.num_rows - ups.num_rows], pa.int64()),
            "schema_ver": pa.array([self.epoch_ver], pa.int32()),
            "watermark_ts": pa.array([self.watermark_ts], pa.int64()),
        })
