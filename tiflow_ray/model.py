"""Core event/data model for the CDC engine.

Mirrors the reference's semantics, not its structures:

- op codes 1=DELETE, 2=UPDATE, 3=INSERT with total order delete<update<insert
  at equal (commit_ts, start_ts) — the on-disk sorter key of the reference
  (cdc/processor/sourcemanager/sorter/pebble/encoding/key.go:83-120) and the
  txn-internal re-sort (cdc/model/sink.go:439-452).
- the change-event Arrow schema: new image (tokens/n_tok/source, null on
  delete) + old image (pre_tokens, null on insert) in the same row — the
  columnar equivalent of RowChangedEvent.Columns/PreColumns
  (cdc/model/sink.go:347-391).
- `doc_id` is the HandleKey (row identity, cdc/model/sink.go:382-390): the
  partition/shuffle key everywhere.
- stable hash partitioning on doc_id: hash(doc_id) % P, fixed across epochs so
  lake layout / manifests / checkpoints stay aligned (the analog of span
  assignment + causality slots, pkg/causality/conflict_detector.go:26-118).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Op codes. Order matters: at equal (commit_ts, start_ts) the apply order is
# delete < update < insert (pebble/encoding/key.go:105-120).
OP_DELETE = 1
OP_UPDATE = 2
OP_INSERT = 3

# The total event order within a key (cdc/model/mounter.go:163-186).
EVENT_SORT_KEYS = [
    ("commit_ts", "ascending"),
    ("start_ts", "ascending"),
    ("op", "ascending"),
]

TOKEN_VOCAB = 50257  # GPT-2-ish vocab size for synthetic token ids

# Base lake table schema, version 1 (BASELINE.json input_hint).
BASE_COLUMNS_V1 = ["doc_id", "tokens", "n_tok", "source"]


def base_schema(extra_cols: list[tuple[str, pa.DataType]] | None = None,
                drop: set[str] | None = None) -> pa.Schema:
    """Arrow schema of the lake table at a given evolution state."""
    fields = [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
    if drop:
        fields = [f for f in fields if f.name not in drop]
    for name, typ in extra_cols or []:
        fields.append(pa.field(name, typ))
    return pa.schema(fields)


def event_schema(value_fields: list[pa.Field] | None = None) -> pa.Schema:
    """Arrow schema of one WAL change event (columnar RowChangedEvent).

    `value_fields` are the image columns of the table schema version the
    events were produced under (default: v1 base columns).
    """
    if value_fields is None:
        value_fields = [
            pa.field("tokens", pa.list_(pa.int32())),
            pa.field("n_tok", pa.int32()),
            pa.field("source", pa.string()),
        ]
    fields = [
        pa.field("op", pa.uint8()),
        pa.field("commit_ts", pa.uint64()),
        pa.field("start_ts", pa.uint64()),
        pa.field("doc_id", pa.string()),
        *value_fields,
        pa.field("pre_tokens", pa.list_(pa.int32())),
        pa.field("new_doc_id", pa.string()),
        pa.field("schema_ver", pa.int32()),
    ]
    return pa.schema(fields)


def key_hash64(doc_ids, seed: int = 0) -> np.ndarray:
    """Stable 64-bit hash of a string key column → uint64, NO Python-object
    round-trip (polars/Rust on the Arrow buffer; ~10x faster than
    pandas.util.hash_array on objects). Deterministic across processes for
    a fixed polars version + seed. Used by the fixture generator (base lake
    layout) and every epoch's shuffle — MUST stay consistent."""
    import os as _os
    _os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    if isinstance(doc_ids, pa.Array):
        s = pl.from_arrow(doc_ids)
    else:
        s = pl.Series(np.asarray(doc_ids, dtype=object).astype(str))
    return s.hash(seed=seed).to_numpy()


def collation_key(doc_ids, collation: str = "binary"):
    """The comparison form of a handle key under the configured collation
    (cdc/entry/mounter.go:75-91: TiDB's handle keys compare
    collation-aware, e.g. utf8mb4_general_ci folds case). "binary" = byte
    equality (default, zero cost); "ci" = case-insensitive via the
    utf8_lower normal form; "ai_ci" = accent- AND case-insensitive
    (utf8mb4_unicode_ci analog): NFKD-decompose, strip the combining
    marks (\\p{Mn}), then lower — café/CAFÉ/cafe all one key. Hashing,
    partition assignment, LWW compaction and base-merge anti-joins all
    compare THIS form; stored images keep the winner's original spelling
    — exactly the reference split between key comparison and row value."""
    if collation == "binary":
        return doc_ids
    assert collation in ("ci", "ai_ci"), \
        f"unknown key collation {collation!r}"
    import pyarrow.compute as pc
    if not isinstance(doc_ids, (pa.Array, pa.ChunkedArray)):
        doc_ids = pa.array(np.asarray(doc_ids, dtype=object).astype(str))
    if collation == "ai_ci":
        doc_ids = pc.replace_substring_regex(
            pc.utf8_normalize(doc_ids, form="NFKD"),
            pattern=r"\p{Mn}", replacement="")
    return pc.utf8_lower(doc_ids)


def hash_fingerprint() -> str:
    """Fingerprint of the key-hash function over canary keys. Recorded in
    every manifest and re-verified on resume: lake layout depends on
    key_hash64 being stable across library versions — a polars upgrade that
    changed the hash would otherwise silently mis-route keys and duplicate
    rows in existing lakes (fail loudly instead)."""
    import hashlib

    import polars as pl

    canary = pa.array([f"doc-{i:012d}" for i in range(8)]
                      + ["", "a", "käse", "的"])
    digest = hashlib.md5(key_hash64(canary).tobytes()).hexdigest()[:16]
    return f"polars={pl.__version__};canary={digest}"


def hash_partition(doc_ids, num_partitions: int) -> np.ndarray:
    """part = key_hash64(doc_id) % P → uint32 partition ids."""
    return (key_hash64(doc_ids) % np.uint64(num_partitions)).astype(np.uint32)


def sort_events_table(t: pa.Table, with_doc: bool = True) -> pa.Table:
    """Stable sort by (doc_id?, commit_ts, start_ts, op)."""
    import pyarrow.compute as pc

    keys = ([("doc_id", "ascending")] if with_doc else []) + EVENT_SORT_KEYS
    return t.take(pc.sort_indices(t, sort_keys=keys))


def image_columns(schema_cols: list[str]) -> list[str]:
    """The value/image columns of a table schema (everything but the key)."""
    return [c for c in schema_cols if c != "doc_id"]
