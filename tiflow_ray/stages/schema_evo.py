"""Schema evolution: DDL barrier schedule + versioned Arrow schemas + casts.

Reference semantics reproduced here:

- every DDL produces a new schema version keyed by its barrier (commit) ts;
  DML decode picks the snapshot "as of CRTs-1": an event whose commit_ts
  EQUALS a DDL's barrier_ts uses the schema BEFORE the DDL
  (cdc/entry/mounter.go:158-160).
- the owner executes the DDL only when the checkpoint reaches exactly
  barrier_ts (cdc/owner/ddl_manager.go:395-425) → in the epoch engine,
  epochs are cut at every barrier ts, each epoch carries exactly one schema
  version, and the base-table cast is applied when crossing the barrier.
- supported DDLs match the target lake: add_column (with default backfill)
  and drop_column — the storage sink's versioned schema files
  (pkg/sink/cloudstorage/table_definition.go:39-102) become
  (version → pyarrow.Schema) entries in the manifest.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import pyarrow as pa

#: DDL-spellable column types — the lattice the reference's storage sink
#: serializes (pkg/sink/cloudstorage/table_definition.go:39-102: INT/BIGINT,
#: FLOAT/DOUBLE, VARCHAR, TIMESTAMP, BINARY/BLOB, DECIMAL(p,s), plus
#: ENUM/SET/JSON); the mounter's datum2Value covers the same set
#: (cdc/entry/mounter.go:75-91). ENUM is dict-encoded string (the Arrow
#: analog of MySQL's small-domain string), SET is list<string>, JSON rides
#: as a string passthrough — parametric spellings are parsed in
#: `_parse_type`, e.g. "enum('web','books')", "set<string>", "json".
_TYPES = {"string": pa.string(), "int32": pa.int32(), "int64": pa.int64(),
          "float64": pa.float64(), "list<int32>": pa.list_(pa.int32()),
          "bool": pa.bool_(),
          "timestamp_us": pa.timestamp("us"),
          "timestamp_us_tz": pa.timestamp("us", tz="UTC"),
          "binary": pa.binary(),
          "decimal(18,6)": pa.decimal128(18, 6),
          "decimal(38,10)": pa.decimal128(38, 10),
          "json": pa.string(),
          "set<string>": pa.list_(pa.string())}
_TYPE_NAMES = {v: k for k, v in _TYPES.items()}

#: DDL kinds the lake recognizes but executes as no-op barriers (index /
#: partition jobs are metadata-only for a columnar lake); the skip is
#: recorded in the committing manifest's stats — never silent, never fatal
NON_SCHEMA_DDLS = frozenset(
    {"add_index", "drop_index", "exchange_partition"})

#: a DDL neutralized by an error operator (dmctl `binlog skip`, see
#: stages/handle_error.py): keeps its barrier (version++, epoch cut at
#: the exact barrier-ts) but changes nothing — visible in the registry
#: and recorded in the committing manifest's ddl_skipped note
OPERATOR_SKIP_DDL = "skipped_by_operator"


def _enum_elements(spec: str) -> tuple[str, ...]:
    """Parse "enum('a','b',...)" → its declared element tuple."""
    inner = spec[len("enum("):-1]
    return tuple(s.strip().strip("'\"") for s in inner.split(",") if s.strip())


def _parse_type(spec: str) -> pa.DataType:
    if spec.startswith("enum("):
        return pa.dictionary(pa.int32(), pa.string())
    if spec.startswith("set("):          # "set('a','b')" also accepted
        return pa.list_(pa.string())
    if spec.startswith("vector("):       # TiDB VECTOR(d) — float32 list
        # (tests/integration_tests/vector: VECTOR(5) columns replicate
        # through the changefeed; ALTER TABLE ADD column emb VECTOR(3));
        # the declared dimension is enforced on typed defaults, carried
        # in the spec for readers
        return pa.list_(pa.float32())
    return _TYPES[spec]


@dataclass(frozen=True)
class DDL:
    barrier_ts: int
    ddl_type: str            # "add_column" | "drop_column"
    column: str              # "name:type" for add, "name" for drop
    default: str | None      # default value (string-encoded) backfilled on add
    schema_ver: int          # version AFTER this DDL

    @property
    def col_name(self) -> str:
        return self.column.split(":", 1)[0]

    @property
    def rename_pair(self) -> tuple[str, str]:
        """(old, new) of a rename_column DDL (column spelled "old>new")."""
        old, new = self.column.split(">", 1)
        return old, new

    @property
    def col_type(self) -> pa.DataType:
        return _parse_type(self.column.split(":", 1)[1]) \
            if ":" in self.column else pa.string()

    @property
    def type_spec(self) -> str:
        return self.column.split(":", 1)[1] if ":" in self.column else "string"

    def typed_default(self):
        if self.default is None:
            return None
        spec = self.type_spec
        if spec.startswith("enum("):
            els = _enum_elements(spec)
            assert self.default in els, \
                f"enum default {self.default!r} outside declared {els}"
            return self.default
        if spec.startswith("set(") or spec == "set<string>":
            if spec.startswith("set("):
                els = _enum_elements("enum(" + spec[4:])
                vals = [v for v in self.default.split(",") if v]
                assert all(v in els for v in vals), \
                    f"set default {self.default!r} outside declared {els}"
            return [v for v in self.default.split(",") if v]
        if spec == "json":
            json.loads(self.default)      # must at least parse
            return self.default
        if spec.startswith("vector("):
            dim = int(spec[len("vector("):-1])
            vals = json.loads(self.default)
            assert isinstance(vals, list) and len(vals) == dim, \
                f"vector default {self.default!r} is not {dim}-dimensional"
            return [float(v) for v in vals]
        t = self.col_type
        if pa.types.is_integer(t):
            return int(self.default)
        if pa.types.is_floating(t):
            return float(self.default)
        if pa.types.is_boolean(t):
            return self.default in ("true", "True", "1")
        if pa.types.is_timestamp(t):
            import numpy as np
            return np.datetime64(self.default, "us")   # ISO-8601 string
        if pa.types.is_binary(t):
            return bytes.fromhex(self.default)         # hex-encoded
        if pa.types.is_decimal(t):
            import decimal
            return decimal.Decimal(self.default)
        return self.default


@dataclass
class SchemaRegistry:
    """Ordered (barrier_ts → schema) registry; the broadcastable analog of
    SchemaStorage.GetSnapshot(ts) (cdc/entry/schema_storage.go:40-151).

    Version 1 is the pristine base schema; version k+1 is produced by the
    k-th DDL in barrier_ts order.
    """

    ddls: list[DDL] = field(default_factory=list)

    def __post_init__(self):
        self.ddls = sorted(self.ddls, key=lambda d: d.barrier_ts)
        for i, d in enumerate(self.ddls):
            assert d.schema_ver == i + 2, f"DDL versions must be 2,3,...: {d}"
        self._schemas: dict[int, pa.Schema] = {1: _v1_schema()}
        self._defaults: dict[int, dict[str, object]] = {1: {}}
        cur = self._schemas[1]
        defaults: dict[str, object] = {}
        renamed_away: set[str] = set()
        for d in self.ddls:
            if d.ddl_type == "add_column":
                # re-adding a name an earlier rename vacated would make
                # source_name's unwind ambiguous — fail loudly
                assert d.col_name not in renamed_away, \
                    f"add_column {d.col_name!r} reuses a renamed-away name"
                cur = cur.append(pa.field(d.col_name, d.col_type))
                defaults = dict(defaults)
                defaults[d.col_name] = d.typed_default()
            elif d.ddl_type == "drop_column":
                cur = pa.schema([f for f in cur if f.name != d.col_name])
                defaults = {k: v for k, v in defaults.items() if k != d.col_name}
            elif d.ddl_type == "modify_column":
                # type change (widening), e.g. "n_tok:int64" — the mounter's
                # column-type evolution (cdc/entry/mounter.go datum2Value
                # re-decodes under the new type); cast_table casts existing
                # data on first touch
                assert any(f.name == d.col_name for f in cur), d.col_name
                cur = pa.schema([pa.field(f.name, d.col_type)
                                 if f.name == d.col_name else f for f in cur])
            elif d.ddl_type == "rename_column":
                # RENAME COLUMN old>new (mounter tracks column-ID → name, so
                # a rename is pure metadata): type and values carry over;
                # cast_table maps the target name back to its source-version
                # name when crossing the barrier
                old, new = d.rename_pair
                assert any(f.name == old for f in cur), old
                assert not any(f.name == new for f in cur), new
                cur = pa.schema([pa.field(new, f.type) if f.name == old
                                 else f for f in cur])
                renamed_away.add(old)
                if old in defaults:
                    defaults = dict(defaults)
                    defaults[new] = defaults.pop(old)
            elif d.ddl_type == "truncate":
                # TRUNCATE TABLE (cdc/model DDL job type; the sink drops all
                # rows at the barrier): schema unchanged, version++ so the
                # barrier cuts an epoch; cast_table crossing it empties any
                # pre-truncate table/image — see `truncated_between`
                pass
            elif d.ddl_type in NON_SCHEMA_DDLS \
                    or d.ddl_type == OPERATOR_SKIP_DDL:
                # recognize-and-skip, loudly (r3 verdict #7): index and
                # partition DDLs are metadata-only for a columnar lake —
                # cdc/owner/ddl_manager.go treats non-schema-affecting jobs
                # as barriers that execute nothing. Schema unchanged,
                # version++ so the barrier still cuts an epoch exactly at
                # the reference's barrier-ts, and _commit_epoch records a
                # `ddl_skipped` note in the manifest stats instead of
                # raising or silently dropping the job.
                pass
            else:
                raise ValueError(f"unknown ddl_type {d.ddl_type}")
            self._schemas[d.schema_ver] = cur
            self._defaults[d.schema_ver] = defaults

    @property
    def max_ver(self) -> int:
        return 1 + len(self.ddls)

    def schema(self, ver: int) -> pa.Schema:
        return self._schemas[ver]

    def defaults(self, ver: int) -> dict[str, object]:
        """Backfill defaults for columns added up to `ver`."""
        return self._defaults[ver]

    def version_at(self, commit_ts: int) -> int:
        """Schema version used to decode an event at commit_ts.

        Strictly-less: an event AT a barrier_ts uses the OLD schema
        (cdc/entry/mounter.go:158-160).
        """
        return 1 + sum(1 for d in self.ddls if d.barrier_ts < commit_ts)

    def barriers(self) -> list[int]:
        return [d.barrier_ts for d in self.ddls]

    # ---- table casts -----------------------------------------------------

    def truncated_between(self, from_ver: int, to_ver: int) -> bool:
        """True iff a TRUNCATE barrier lies in (from_ver, to_ver] — rows
        (or upsert images) produced at from_ver are all gone at to_ver."""
        return any(d.ddl_type == "truncate"
                   and from_ver < d.schema_ver <= to_ver
                   for d in self.ddls)

    def source_name(self, name: str, from_ver: int, to_ver: int) -> str:
        """The name a to_ver column had at from_ver, unwinding any
        rename_column barriers in between (identity when none)."""
        ren = [d for d in self.ddls if d.ddl_type == "rename_column"
               and min(from_ver, to_ver) < d.schema_ver
               <= max(from_ver, to_ver)]
        cur = name
        if from_ver <= to_ver:
            for d in reversed(ren):      # unwind new → old
                old, new = d.rename_pair
                if new == cur:
                    cur = old
        else:
            for d in ren:                # downward cast: old → new
                old, new = d.rename_pair
                if old == cur:
                    cur = new
        return cur

    def cast_table(self, t: pa.Table, from_ver: int, to_ver: int,
                   force_project: bool = False) -> pa.Table:
        """Cast a lake-table (or image) pa.Table between schema versions:
        drop removed columns, append added columns filled with their default.
        Column order follows the target schema. `force_project` also strips
        extra non-schema columns (op/commit_ts of delta files) when
        from_ver == to_ver."""
        if from_ver == to_ver and not force_project:
            return t
        target = self.schema(to_ver)
        if self.truncated_between(from_ver, to_ver):
            return target.empty_table()
        defaults = self.defaults(to_ver)
        n = t.num_rows
        cols = []
        for f in target:
            src = self.source_name(f.name, from_ver, to_ver)
            if src in t.column_names:
                col = t.column(src)
                if col.type != f.type:
                    col = col.cast(f.type)
            else:
                d = defaults.get(f.name)
                if d is None:
                    col = pa.nulls(n, f.type)
                else:
                    col = pa.array([d] * n)   # infer, then cast (tz-aware
                    if col.type != f.type:    # timestamps can't build direct)
                        col = col.cast(f.type)
            cols.append(col)
        return pa.Table.from_arrays(cols, schema=target)

    # ---- (de)serialization for the lake manifest -------------------------

    def to_json(self) -> str:
        return json.dumps([d.__dict__ for d in self.ddls])

    @classmethod
    def from_json(cls, s: str) -> "SchemaRegistry":
        return cls([DDL(**d) for d in json.loads(s)])


def _v1_schema() -> pa.Schema:
    return pa.schema([
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ])
