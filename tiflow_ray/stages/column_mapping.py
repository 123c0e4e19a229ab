"""Column mapping (DM's pkg/column-mapping/column.go analog): rule-based
key-column rewrites applied per upstream shard during shard-merge.

The reference's canonical use is the "partition id" expression: when N
sharded upstreams with overlapping auto-increment PKs merge into one
downstream table, each shard's syncer prepends an instance/schema/table
tag to the PK so rows from different shards can never collide
(column.go's AddPrefix / AddSuffix / PartitionID expressions). Without
it, a colliding key is silently last-writer-wins-merged across shards —
data loss. Here the handle key is `doc_id` (and `new_doc_id` on doc
renames), and a rule is one vectorized pyarrow pass per batch.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

_KINDS = ("add prefix", "add suffix", "partition id")


@dataclass(frozen=True)
class ColumnMappingRule:
    """One shard's rewrite rule.

    kind:  "add prefix"   → value + col
           "add suffix"   → col + value
           "partition id" → value + "|" + col  (the shard-tag form the
                            reference's partitionID expression builds from
                            instance/schema/table ids, separator included)
    columns: key columns to rewrite; nulls pass through (a null
             new_doc_id stays null — pyarrow emit_null join semantics).
    """

    kind: str
    value: str
    columns: tuple[str, ...] = ("doc_id", "new_doc_id")

    def __post_init__(self):
        assert self.kind in _KINDS, f"unknown column-mapping kind {self.kind}"
        assert self.value, "column-mapping value must be non-empty"

    def apply(self, t: pa.Table) -> pa.Table:
        for c in self.columns:
            if c not in t.column_names:
                continue
            col = t[c]
            if self.kind == "add suffix":
                mapped = pc.binary_join_element_wise(col, self.value, "")
            else:
                pre = (self.value + "|" if self.kind == "partition id"
                       else self.value)
                mapped = pc.binary_join_element_wise(
                    pa.array([pre] * t.num_rows, pa.string()), col, "")
            t = t.set_column(t.column_names.index(c), c, mapped)
        return t


def mapping_stage(dir_rules: dict[str, ColumnMappingRule]):
    """map_batches callable rewriting key columns per source WAL dir.
    Batches arrive with a `path` column (read_parquet include_paths=True);
    each row's rule is its segment's directory — resolved once per
    distinct path (a batch holds rows of few segment files), then applied
    to each contiguous path-run vectorized. Drops `path`."""
    import os

    def apply_mapping(t: pa.Table) -> pa.Table:
        import numpy as np
        paths = np.asarray(t["path"].to_numpy(zero_copy_only=False))
        t = t.drop_columns(["path"])
        if t.num_rows == 0:
            return t
        uniq, inv = np.unique(paths, return_inverse=True)
        rules = [dir_rules[os.path.dirname(p)] for p in uniq]
        if len(uniq) == 1:
            return rules[0].apply(t)
        pieces = []
        order = np.argsort(inv, kind="stable")
        sorted_inv = inv[order]
        cuts = np.flatnonzero(np.diff(sorted_inv)) + 1
        for seg_idx, a in zip(
                [sorted_inv[0]] + [sorted_inv[c] for c in cuts],
                np.split(order, cuts)):
            pieces.append(rules[int(seg_idx)].apply(
                t.take(pa.array(a))))
        return pa.concat_tables(pieces)

    return apply_mapping
