"""The epoch-loop replay engine: WAL change files → lake table state.

One Ray Data pipeline per epoch (SURVEY.md §7 design one-liner):

    read_parquet(segments ∩ (lo, hi], columns pruned to the epoch schema,
                 commit_ts row-filter pushdown)
      → map_batches Normalize            (mounter analog, stateless, Arrow)
      → map_batches split_updates        (identity-change D+I split, pre-shuffle)
      → map_batches compact_batch        (per-batch LWW combiner — hot-key
                                          pre-reduce — fused with part =
                                          hash(doc_id) % P; or, in
                                          replay_mode="two_pass", a thin first
                                          pass finds winner signatures and the
                                          payload pass ships winners only)
      → groupby("part").map_groups(MergeApply)   (THE one shuffle: deltas only,
                                                  base stays put; MoR appends
                                                  winner deltas / folds chains,
                                                  CoW rewrites partitions)
      → tiny stats table → driver commits manifest + checkpoint atomically

The driver (the "owner", cdc/owner/changefeed.go analog) only ever touches
O(P) metadata per epoch: per-partition stats, watermarks, the manifest. All
row data moves task-to-task through the object store.

Fault tolerance: any crash before the manifest rename loses nothing — the
next run re-plans from the last committed manifest and re-executes the epoch
onto the same deterministic file names (redo-applier semantics,
pkg/applier/redo.go; safe-mode §2.9: re-applying an applied prefix is a
no-op because merge is REPLACE-natured).
"""

from __future__ import annotations

import dataclasses
import glob
import os
import threading
from collections import OrderedDict
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray.data

from ..config import ReplayConfig
from ..model import hash_partition, image_columns
from ..sources.wal import Epoch, list_segments, load_registry, plan_epochs
from ..stages.compact import assign_partition, compact_batch
from ..stages.merge import MergeApply
from ..stages.normalize import Normalize, epoch_event_columns
from ..stages.update_split import split_updates
from ..stages.schema_evo import DDL, SchemaRegistry
from ..state.checkpoint import LakeState, Manifest


_READ_PLAN_LOCK = threading.Lock()

#: per-epoch ray.data execution-stats strings (ReplayConfig.collect_stats);
#: cleared at each run_replay call that collects — diagnostics only, never
#: read by the engine
LAST_EPOCH_STATS: list[str] = []
_STATS_LOCK = threading.Lock()


@dataclass
class EpochResult:
    epoch: int
    lo: int
    hi: int
    schema_ver: int
    events: int
    parts_touched: int
    rows_total: int


@dataclass
class ReplayResult:
    epochs: list[EpochResult] = field(default_factory=list)

    @property
    def events(self) -> int:
        return sum(e.events for e in self.epochs)


def bootstrap(cfg: ReplayConfig, base_dir: str | None = None) -> Manifest:
    """Epoch 0: register the existing base lake files (hash-partitioned
    part={p} dirs) in the first manifest. No data movement — the initial
    full-load (Dumpling/Lightning, S5) is just metadata here."""
    lake = LakeState(cfg.lake_dir)
    existing = lake.latest()
    if existing is not None:
        if existing.num_partitions and existing.num_partitions != cfg.num_partitions:
            raise ValueError(
                f"lake is laid out with P={existing.num_partitions}, "
                f"config says P={cfg.num_partitions}")
        return existing
    parts: dict[str, dict] = {}
    if base_dir:
        found = sorted(glob.glob(os.path.join(base_dir, "part=*")))
        for d in found:
            p = int(os.path.basename(d).split("=", 1)[1])
            if not 0 <= p < cfg.num_partitions:
                raise ValueError(f"base dir has {d} but P={cfg.num_partitions}")
        for p in range(cfg.num_partitions):
            files = sorted(glob.glob(os.path.join(base_dir, f"part={p}", "*.parquet")))
            if not files:
                continue
            assert len(files) == 1, f"expected one bootstrap file per part: {files}"
            # co-partitioning guard: a base laid out with a DIFFERENT P would
            # silently duplicate rows at merge time — sample and verify
            sample = pq.read_table(files[0], columns=["doc_id"]).column("doc_id")
            sample = sample.slice(0, 256)
            from ..model import collation_key
            if len(sample) and not (hash_partition(
                    collation_key(sample, cfg.key_collation),
                    cfg.num_partitions) == p).all():
                raise ValueError(
                    f"{files[0]} is not hash(doc_id)%{cfg.num_partitions}"
                    f"-partitioned (found part={p} rows hashing elsewhere); "
                    "base layout P must equal ReplayConfig.num_partitions")
            md = pq.read_metadata(files[0])
            parts[str(p)] = {"path": files[0], "schema_ver": 1,
                             "rows": md.num_rows, "watermark_ts": 0,
                             "bytes": 0, "deltas": []}
    from ..model import hash_fingerprint
    m = Manifest(epoch=0, watermark_ts=0, schema_ver=1,
                 num_partitions=cfg.num_partitions, parts=parts,
                 segments_applied=[], stats={"bootstrap": True},
                 hash_fingerprint=hash_fingerprint())
    lake.commit(m)
    return m


# per-worker cache of part→sorted-sig-array maps, keyed PER EPOCH (the
# block-ref set identifies the epoch) so concurrent pipelined epochs don't
# evict each other's maps. Within an epoch, blocks load LAZILY: a filter
# worker ray.gets only the sig blocks whose partitions actually appear in
# its batches, so on a multi-node cluster a node holds only the signature
# shards it filters — not the full set (zero-copy plasma views otherwise).
_SIG_MAP_CACHE: "OrderedDict[tuple, dict]" = OrderedDict()
_SIG_MAP_MAX_EPOCHS = 8     # ≥ any sane pipeline_epochs; tiny entries


def _part_sig_map(sig_index: tuple, parts_needed) -> dict:
    """`sig_index` is ((ref, parts_in_block), ...) built by
    _thin_winner_signatures. Loads exactly the blocks covering
    `parts_needed` that this worker hasn't loaded yet and returns the
    epoch's part→sorted-sigs dict (only loaded parts present — callers
    only look up parts they asked for)."""
    import numpy as np
    key = tuple(r.hex() for r, _ in sig_index)
    ent = _SIG_MAP_CACHE.get(key)
    if ent is None:
        ent = {"loaded": set(), "views": {}, "final": {}}
        _SIG_MAP_CACHE[key] = ent
        while len(_SIG_MAP_CACHE) > _SIG_MAP_MAX_EPOCHS:
            _SIG_MAP_CACHE.popitem(last=False)
    _SIG_MAP_CACHE.move_to_end(key)
    wanted = {int(p) for p in parts_needed}
    need = [r for r, ps in sig_index
            if r.hex() not in ent["loaded"] and wanted.intersection(ps)]
    if not need:
        return ent["final"]
    touched: set[int] = set()
    for r, t in zip(need, ray.get(need)):
        ent["loaded"].add(r.hex())
        if t.num_rows == 0:
            continue
        parts = t["part"].to_numpy(zero_copy_only=False)
        sigs = t["sig"].to_numpy()          # plasma-backed, read-only
        # run boundaries: each map_groups group (one part) is contiguous
        cuts = np.flatnonzero(np.r_[True, parts[1:] != parts[:-1]])
        ends = np.r_[cuts[1:], len(parts)]
        for s, e in zip(cuts, ends):
            p = int(parts[s])
            ent["views"].setdefault(p, []).append(sigs[s:e])
            touched.add(p)
    for p in touched:
        v = ent["views"][p]
        ent["final"][p] = (v[0] if len(v) == 1
                           else np.sort(np.concatenate(v)))
    return ent["final"]


def _epoch_byte_cap(cfg: ReplayConfig) -> int | None:
    """Resolve cfg.max_epoch_bytes: >0 explicit, -1 off, 0 auto — a share
    of the object store per concurrently-pipelined epoch, with a 12×
    parquet→working-set expansion margin (decompressed Arrow + in-flight
    shuffle copies). Bounds an epoch's plasma footprint so the 100×-data
    case degrades to more epochs instead of the spill cliff."""
    if cfg.max_epoch_bytes > 0:
        return cfg.max_epoch_bytes
    if cfg.max_epoch_bytes < 0 or not ray.is_initialized():
        return None
    plasma = ray.cluster_resources().get("object_store_memory", 0)
    if not plasma:
        return None
    k = max(1, cfg.pipeline_epochs)
    return max(64 << 20, int(plasma / (k * 12)))


@ray.remote(num_cpus=0)
def _block_parts(t: pa.Table) -> tuple:
    """Distinct partitions present in one sig block (runs co-located with
    the block — only the tuple travels back)."""
    import numpy as np
    if t.num_rows == 0:
        return ()
    return tuple(
        int(p) for p in
        np.unique(t["part"].to_numpy(zero_copy_only=False)))


def full_load(ds: "ray.data.Dataset", cfg: ReplayConfig) -> Manifest:
    """Distributed full load (Dumpling/Lightning analog, S5 made real at
    scale): hash-partition an arbitrary base-schema Dataset into the lake
    layout and commit the bootstrap manifest — ONE shuffle, each partition
    written by its own task, the driver handles O(P) stats only.
    `bootstrap(base_dir=...)` remains the metadata-only path for data that
    already lives in the lake layout."""
    from ..stages.compact import assign_partition

    lake = LakeState(cfg.lake_dir)
    assert lake.latest() is None, "lake already bootstrapped"
    if "part" in (ds.schema().names or []):
        raise ValueError(
            "input dataset already has a 'part' column (often a hive-"
            "partitioning artifact — pass partitioning=None to read_parquet "
            "or rename the column); full_load owns the partition assignment")
    data_dir = os.path.join(cfg.lake_dir, "data")

    def write_part(t: pa.Table) -> pa.Table:
        from ..stages.merge import _atomic_write
        part = int(t["part"][0].as_py())
        out = t.drop_columns(["part"])
        out = out.take(pc.sort_indices(out, sort_keys=[("doc_id", "ascending")]))
        path = os.path.join(data_dir, f"part={part}", "epoch-000000.parquet")
        _atomic_write(out, path)
        return pa.table({"part": pa.array([part], pa.int32()),
                         "path": pa.array([path]),
                         "rows": pa.array([out.num_rows], pa.int64()),
                         "bytes": pa.array([out.nbytes], pa.int64())})

    stats = ds.map_batches(lambda t: assign_partition(t, cfg.num_partitions),
                           batch_format="pyarrow", batch_size=cfg.batch_size) \
        .groupby("part").map_groups(write_part, batch_format="pyarrow") \
        .take_all()

    from ..model import hash_fingerprint
    parts = {str(r["part"]): {"path": r["path"], "schema_ver": 1,
                              "rows": r["rows"], "watermark_ts": 0,
                              "bytes": r["bytes"], "deltas": []}
             for r in stats}
    m = Manifest(epoch=0, watermark_ts=0, schema_ver=1,
                 num_partitions=cfg.num_partitions, parts=parts,
                 segments_applied=[], stats={"bootstrap": True,
                                             "full_load": True},
                 hash_fingerprint=hash_fingerprint())
    lake.commit(m)
    return m


def _thin_winner_signatures(cfg: ReplayConfig, ep: Epoch,
                            read_kwargs: dict) -> tuple:
    """Two-pass pass 1: read ONLY (op, commit_ts, start_ts, doc_id,
    new_doc_id) (~6x fewer bytes than with token payloads), split identity
    changes, combine per batch, final-reduce per partition, and return the
    REFS to the per-partition (part, sorted sig) blocks — 8 bytes per
    surviving key, O(touched docs) total. There is NO global merge task
    (r3 verdict #3): each block stays in the object store as produced by
    its partition's reduce, and payload-pass filter workers binary-search
    each row against ITS partition's block only, so no single task ever
    holds (let alone 2×) the whole signature set — bounded per-task memory
    at any winners-per-epoch count."""
    import numpy as np

    from ..stages.compact import compact_partition, event_signature

    flt = (pads.field("commit_ts") > ep.lo) & (pads.field("commit_ts") <= ep.hi)
    thin_cols = ["op", "commit_ts", "start_ts", "doc_id", "new_doc_id"]
    # filters MUST apply to pass 1 too: a winner filtered from the payload
    # pass but not here would poison the signature set and silently drop the
    # doc's surviving earlier events (two_pass+predicate is rejected upfront
    # in _execute_epoch — a predicate may touch payload columns pass 1
    # doesn't read)
    thin_fields = []
    if cfg.ignore_sources:
        thin_cols = thin_cols + ["source"]
        thin_fields = [pa.field("source", pa.string())]
    # read PLANNING shares the same lazy-fsspec-import race as the main
    # epoch read when pipelined epochs plan concurrently — serialize it
    with _READ_PLAN_LOCK:
        ds = ray.data.read_parquet(list(ep.files), columns=thin_cols,
                                   filter=flt, **read_kwargs)
    if cfg.ignore_sources:
        ds = ds.map_batches(Normalize(thin_fields, ep.lo, ep.hi,
                                      cfg.ignore_sources, validate=False),
                            batch_format="pyarrow", batch_size=cfg.batch_size)
    ds = ds.map_batches(split_updates, batch_format="pyarrow",
                        batch_size=cfg.batch_size)
    ds = ds.map_batches(lambda t: compact_batch(t, cfg.num_partitions,
                                                collation=cfg.key_collation),
                        batch_format="pyarrow", batch_size=cfg.batch_size)

    def winners_to_sigs(t: pa.Table) -> pa.Table:
        import numpy as np
        part = int(t["part"][0].as_py()) if t.num_rows else -1
        w = compact_partition(t.drop_columns(["part"]),
                              collation=cfg.key_collation)
        sigs = np.sort(event_signature(w, cfg.key_collation))
        return pa.table({
            "part": pa.array(np.full(len(sigs), part, np.int32)),
            "sig": pa.array(sigs),
        })

    sig_ds = ds.groupby("part").map_groups(winners_to_sigs,
                                           batch_format="pyarrow")
    refs = sig_ds.to_arrow_refs()           # blocks stay in the object store
    # per-part ref index: each filter worker fetches ONLY the blocks whose
    # partitions appear in its batches (the parts tuple is computed next to
    # the block; only O(parts) ints travel)
    parts = ray.get([_block_parts.remote(r) for r in refs])
    return tuple(zip(refs, parts))


def _codec_col_groups(ep: Epoch) -> list[tuple[list[str], list[str]]]:
    """Group an epoch's files by their OWN segment-meta column order
    [(files, columns)]. Segments written before and after a DDL barrier
    carry different column sets (the storage sink rewrites its schema
    file at each DDL, pkg/sink/cloudstorage/table_definition.go), and a
    positional codec (csv) decoded under the wrong order misaligns
    silently — each group must decode under its own order. Insertion
    order follows ep.files so the plan stays deterministic."""
    cmap = dict(ep.col_map) if ep.col_map else {}
    groups: dict[tuple, list[str]] = {}
    for f in ep.files:
        groups.setdefault(tuple(cmap.get(f, ep.columns)), []).append(f)
    return [(fs, list(cols)) for cols, fs in groups.items()]


def _union_ds(parts: list) -> "ray.data.Dataset":
    return parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])


def read_codec_epoch(ep: Epoch, read_kwargs: dict,
                     batch_size: int) -> "ray.data.Dataset":
    """Distributed decode of one epoch's NON-parquet WAL segments (M10):
    jsonl / avro-OCF / craft / mysql-binlog / csv / canal-json /
    open-protocol / debezium / maxwell / simple. Returns raw change
    events; the caller must range-filter to (lo, hi] (codecs carry no
    commit_ts pushdown) and Normalize handles per-group schema deltas.
    Call under _READ_PLAN_LOCK when planning concurrently (pipelined
    epochs). Shared by the single-table and multi-table replay paths."""
    if ep.fmt == "jsonl":    # raw json change files (self-describing)
        return ray.data.read_json(list(ep.files), **read_kwargs)
    if ep.fmt == "avro":     # OCF: BLOCK-granular fan-out — the splitter
        # walks block headers (no datum decode) and each range task
        # seeks+reads only its own blocks, so one large segment decodes
        # ≥8-way instead of one-task-per-file
        from ..sources.codecs import AvroRangeDecoder, plan_avro_splits
        parts = []
        for files, cols in _codec_col_groups(ep):
            items = plan_avro_splits(files, cols)
            ds = ray.data.from_items(
                items, override_num_blocks=max(1, len(items)))
            parts.append(ds.map_batches(AvroRangeDecoder(cols),
                                        batch_format="pyarrow",
                                        batch_size=4))
        return _union_ds(parts)
    if ep.fmt == "mysql_binlog":   # binlog v4: TRANSACTION-granular
        # fan-out — the planner walks event headers (event_size hops, no
        # row decode) and each range task seeks+reads only its own whole
        # transactions (every txn re-announces its TABLE_MAP, so ranges
        # are self-contained)
        from ..sources.codecs import BinlogRangeDecoder, plan_binlog_splits
        parts = []
        for files, cols in _codec_col_groups(ep):
            items = plan_binlog_splits(files, cols)
            ds = ray.data.from_items(
                items, override_num_blocks=max(1, len(items)))
            parts.append(ds.map_batches(BinlogRangeDecoder(cols),
                                        batch_format="pyarrow",
                                        batch_size=4))
        return _union_ds(parts)
    if ep.fmt == "craft":    # craft: size tables live at the message
        # TAIL, so a mid-file split cannot be located without the tail —
        # file-granular fan-out is inherent to the format
        from ..sources.codecs import BinaryFileDecoder
        parts = []
        for files, cols in _codec_col_groups(ep):
            ds = ray.data.read_binary_files(files)
            parts.append(ds.map_batches(BinaryFileDecoder(ep.fmt, cols),
                                        batch_format="pyarrow",
                                        batch_size=4))
        return _union_ds(parts)
    # csv / canal-json / open-protocol / … change files: text → decoder,
    # one read per column-order group (csv is positional)
    from ..sources.codecs import ChangeFileDecoder
    parts = []
    for files, cols in _codec_col_groups(ep):
        ds = ray.data.read_text(files, **read_kwargs)
        parts.append(ds.map_batches(ChangeFileDecoder(ep.fmt, cols),
                                    batch_format="pandas",
                                    batch_size=batch_size))
    return _union_ds(parts)


class RemountStage:
    """In-epoch optimistic remount (r3 verdict #4): a map_batches kernel
    that re-mounts one shard's raw WAL rows under the synthesized merged
    registry at READ time — `_remount_table` per batch, the shard's
    column-mapping rule when configured, then projection to the epoch's
    read columns. Replaces the r3 design that materialized a derived
    `_remount/` WAL on disk (one extra full write+read of the change
    stream); the reference's relay log is a durability feature, not a
    required double-write."""

    def __init__(self, shard_reg_json: str, merged_reg_json: str,
                 mapping_rule, read_cols: list[str]):
        self.shard_reg = SchemaRegistry.from_json(shard_reg_json)
        self.merged_reg = SchemaRegistry.from_json(merged_reg_json)
        self.rule = mapping_rule
        self.read_cols = list(read_cols)

    def __call__(self, t: pa.Table) -> pa.Table:
        rt = _remount_table(t, self.shard_reg, self.merged_reg)
        if self.rule is not None:
            rt = self.rule.apply(rt)
        return rt.select(self.read_cols)


def _read_remounted(cfg: ReplayConfig, registry: SchemaRegistry, ep: Epoch,
                    read_cols: list[str], read_kwargs: dict):
    """Optimistic shard-merge epoch read: group the epoch's files by
    (shard dir, physical schema) — a shard's segments straddling its own
    DDL barrier have different physical schemas, and read_parquet needs a
    uniform fragment schema per dataset — read each group with the same
    commit_ts pushdown as the plain path, remount per batch, and union.
    Parallelism: per-group override_num_blocks is prorated by file count
    so the fan-out matches the plain read's."""
    flt = (pads.field("commit_ts") > ep.lo) & (pads.field("commit_ts") <= ep.hi)
    groups: dict[tuple, list] = {}
    for f in ep.files:
        sd = os.path.abspath(os.path.dirname(f))
        names = tuple(pq.read_schema(f).names)
        groups.setdefault((sd, names), []).append(f)
    merged_json = registry.to_json()
    nblocks = read_kwargs.get("override_num_blocks")
    parts = []
    for (sd, _names), files in groups.items():
        kw = dict(read_kwargs)
        if nblocks:
            kw["override_num_blocks"] = max(
                1, round(nblocks * len(files) / len(ep.files)))
        shard_reg_json, rule = cfg.remount_shards[sd]
        dsg = ray.data.read_parquet(files, filter=flt, **kw)
        dsg = dsg.map_batches(
            RemountStage(shard_reg_json, merged_json, rule, read_cols),
            batch_format="pyarrow", batch_size=cfg.batch_size)
        parts.append(dsg)
    return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]


def _execute_epoch(cfg: ReplayConfig, registry: SchemaRegistry,
                   prev_parts: dict, ep: Epoch, epoch_no: int,
                   allow_fold: bool = True) -> list[dict]:
    """Run one epoch's data pipeline (read → normalize → split → combine →
    shuffle → merge-write) and return the per-partition stats rows. NO
    manifest side effects — commit happens in _commit_epoch."""
    if cfg.replay_mode == "two_pass" and (cfg.event_predicate is not None
                                          or cfg.expr_filter_rules
                                          or cfg.online_ddl is not None
                                          or cfg.table_filter is not None
                                          or cfg.bdr_mode):
        raise ValueError(
            "replay_mode='two_pass' cannot be combined with event_predicate/"
            "expr_filter_rules: the thin pass does not read payload columns, "
            "so a predicate that filters a winner there would silently drop "
            "that doc's surviving events; use single_pass or fold the "
            "predicate into ignore_sources")
    if not ep.files:
        # a barrier-only epoch (DDL lands before any event in range): no
        # data moves; the commit alone advances schema_ver + watermark
        return []
    image_fields = [registry.schema(ep.schema_ver).field(c)
                    for c in image_columns([f.name for f in
                                            registry.schema(ep.schema_ver)])]
    cols = epoch_event_columns([f.name for f in image_fields])
    # online-DDL / table-filter modes read the table routing column so the
    # Normalize-stage predicate can drop ghost/trash or unselected-table
    # DML; Normalize's final projection then discards it (not an image col)
    read_cols = list(cols)
    if cfg.online_ddl is not None or cfg.table_filter is not None:
        read_cols.append("table_name")
    if cfg.bdr_mode:
        read_cols.append("write_source")

    # block count ≫ cores: parquet files are few and large, so without an
    # override the read fans out only #files wide and the whole pipeline
    # starves past ~16 cores (measured 2-4x on the 20M-event bench)
    read_kwargs = {}
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    if ep.est_rows > 4 * 131072:
        read_kwargs["override_num_blocks"] = max(
            ncpu, min(8 * ncpu, ep.est_rows // 131072))

    # read PLANNING is not thread-safe in Ray (lazy fsspec imports race when
    # pipelined epochs plan concurrently) — serialize planning only;
    # execution itself streams outside the lock
    if cfg.shard_key_mapping and ep.fmt != "parquet":
        raise ValueError("shard column mapping expects parquet WAL shards")
    if cfg.shard_key_mapping and cfg.replay_mode == "two_pass":
        raise ValueError(
            "replay_mode='two_pass' cannot be combined with column mapping: "
            "the thin winner pass reads keys without their source paths, so "
            "it would dedupe UNMAPPED keys across shards")
    with _READ_PLAN_LOCK:
        if ep.fmt == "parquet" and cfg.remount_shards is not None:
            ds = _read_remounted(cfg, registry, ep, read_cols, read_kwargs)
            enforce_range = False
        elif ep.fmt == "parquet":
            flt = (pads.field("commit_ts") > ep.lo) & (pads.field("commit_ts") <= ep.hi)
            if cfg.shard_key_mapping:
                read_kwargs["include_paths"] = True
            # Parquet segments in one epoch may carry DIFFERENT column
            # sets (a derived WAL whose producer learned a column after
            # earlier rounds were written, or plain pre/post-DDL
            # straddles): requesting a column a file lacks is a read
            # error, so group files by their own available∩wanted
            # columns and union — Normalize null-fills what a group is
            # missing (same shape as the codec col_map path).
            cmap = dict(ep.col_map)
            by_cols: dict[tuple, list[str]] = {}
            for f in ep.files:
                avail = cmap.get(f) or ()
                want = tuple(c for c in read_cols
                             if not avail or c in avail)
                by_cols.setdefault(want, []).append(f)
            if len(by_cols) == 1:
                ds = ray.data.read_parquet(
                    list(ep.files), columns=list(next(iter(by_cols))),
                    filter=flt, **read_kwargs)
            else:
                ds = _union_ds([
                    ray.data.read_parquet(fs, columns=list(w),
                                          filter=flt, **read_kwargs)
                    for w, fs in by_cols.items()])
            if cfg.shard_key_mapping:
                from ..stages.column_mapping import mapping_stage
                ds = ds.map_batches(mapping_stage(cfg.shard_key_mapping),
                                    batch_format="pyarrow",
                                    batch_size=cfg.batch_size)
            enforce_range = False
        else:   # non-parquet change-file codecs (M10 decode)
            ds = read_codec_epoch(ep, read_kwargs, cfg.batch_size)
            enforce_range = True   # codecs have no commit_ts pushdown
    predicate = cfg.event_predicate
    if cfg.bdr_mode:
        def _bdr_mask(t):
            import numpy as _np
            import pyarrow as _pa
            import pyarrow.compute as _pc
            if "write_source" not in t.column_names:
                return _pa.array(_np.ones(t.num_rows, dtype=bool))
            ws = t["write_source"]
            # null / 0 = local write → replicate; nonzero = CDC-applied
            return _pc.fill_null(_pc.equal(_pc.fill_null(ws.cast(
                _pa.int64()), 0), 0), True)
        if predicate is None:
            predicate = _bdr_mask
        else:
            user_bdr = predicate

            def predicate(t, _u=user_bdr, _m=_bdr_mask):     # AND-compose
                import numpy as _np
                import pyarrow as _pa
                return _pa.array(_np.asarray(_u(t), dtype=bool)
                                 & _np.asarray(_m(t), dtype=bool))
    if cfg.table_filter is not None:
        tfilt = cfg.table_filter

        def _tf_mask(t, _f=tfilt):
            import numpy as _np
            import pyarrow as _pa
            if "table_name" not in t.column_names:
                return _pa.array(_np.ones(t.num_rows, dtype=bool))
            tables = _np.asarray(
                t["table_name"].to_numpy(zero_copy_only=False))
            schemas = (_np.asarray(
                t["schema_name"].to_numpy(zero_copy_only=False))
                if "schema_name" in t.column_names
                else _np.full(t.num_rows, "tiflow"))
            return _pa.array(_f.mask(schemas, tables))
        if predicate is None:
            predicate = _tf_mask
        else:
            user_tf = predicate

            def predicate(t, _u=user_tf, _m=_tf_mask):      # AND-compose
                import numpy as _np
                import pyarrow as _pa
                return _pa.array(_np.asarray(_u(t), dtype=bool)
                                 & _np.asarray(_m(t), dtype=bool))
    if cfg.online_ddl is not None:
        plugin = cfg.online_ddl
        if predicate is None:
            def predicate(t, _p=plugin):
                return _p.dml_mask(t)
        else:
            user_pred0 = predicate

            def predicate(t, _u=user_pred0, _p=plugin):    # AND-compose
                import numpy as _np
                import pyarrow as _pa
                return _pa.array(_np.asarray(_u(t), dtype=bool)
                                 & _np.asarray(_p.dml_mask(t), dtype=bool))
    if cfg.expr_filter_rules:
        from ..stages.expr_filter import ExprFilter
        expr_pred = ExprFilter(list(cfg.expr_filter_rules))
        if predicate is None:
            predicate = expr_pred
        else:
            user_pred = predicate

            def predicate(t, _u=user_pred, _e=expr_pred):   # AND-compose
                import numpy as _np
                import pyarrow as _pa
                return _pa.array(
                    _np.asarray(_u(t), dtype=bool)
                    & _np.asarray(_e(t), dtype=bool))
    ds = ds.map_batches(Normalize(image_fields, ep.lo, ep.hi,
                                  cfg.ignore_sources, cfg.validate,
                                  enforce_range=enforce_range,
                                  predicate=predicate),
                        batch_format="pyarrow", batch_size=cfg.batch_size)
    ds = ds.map_batches(split_updates, batch_format="pyarrow",
                        batch_size=cfg.batch_size)
    if cfg.replay_mode == "two_pass" and ep.fmt == "parquet":
        from ..stages.compact import filter_by_signature_sharded
        sig_index = _thin_winner_signatures(cfg, ep, read_kwargs)

        def keep_winners(t: pa.Table) -> pa.Table:
            # partition first, then each row binary-searches ONLY its
            # partition's sorted sig block (worker-cached plasma views;
            # only the blocks covering THIS batch's partitions are fetched)
            import numpy as _np
            t = assign_partition(t, cfg.num_partitions, cfg.key_collation)
            if t.num_rows == 0:
                return t
            batch_parts = _np.unique(
                t["part"].to_numpy(zero_copy_only=False))
            return filter_by_signature_sharded(
                t, _part_sig_map(sig_index, batch_parts),
                cfg.key_collation)

        ds = ds.map_batches(keep_winners, batch_format="pyarrow",
                            batch_size=cfg.batch_size)
    dynamic_salt = cfg.auto_salt and cfg.salt_shuffle <= 1 and cfg.precompact
    if cfg.replay_mode == "two_pass" and ep.fmt == "parquet":
        dynamic_salt = False          # thin pass handled above; no combiner
    elif cfg.precompact:
        # combiner + partition column in one fused pass (hash computed
        # once); under auto_salt the same pass also measures per-key batch
        # shares and salts ONLY detected-hot keys (splitter_write.go analog)
        hot_share = cfg.auto_salt_share if dynamic_salt else None
        ds = ds.map_batches(
            lambda t: compact_batch(t, cfg.num_partitions,
                                    hot_share=hot_share,
                                    salt_factor=cfg.auto_salt_factor,
                                    collation=cfg.key_collation),
            batch_format="pyarrow", batch_size=cfg.batch_size)
    else:
        dynamic_salt = False
        ds = ds.map_batches(
            lambda t: assign_partition(t, cfg.num_partitions,
                                       cfg.key_collation),
            batch_format="pyarrow", batch_size=cfg.batch_size)

    if cfg.salt_shuffle > 1 or dynamic_salt:
        from ..stages.compact import compact_partition
        S = cfg.salt_shuffle

        def add_salt(t: pa.Table) -> pa.Table:   # static: salt every row
            import numpy as _np
            salt = (t["start_ts"].to_numpy(zero_copy_only=False)
                    % _np.uint64(S)).astype(_np.uint32)
            return t.append_column("salt", pa.array(salt))

        def presalt_reduce(t: pa.Table) -> pa.Table:
            # carry detection evidence to the merge stats: rows arriving
            # through a salted (hot-key) group are counted in the manifest
            salted = bool(t.num_rows) and t["salt"][0].as_py() != 0
            out = compact_partition(t.drop_columns(["salt"]),
                                    collation=cfg.key_collation)
            return out.append_column(
                "from_salted", pa.array(np.full(out.num_rows, salted)))

        if not dynamic_salt:
            ds = ds.map_batches(add_salt, batch_format="pyarrow",
                                batch_size=cfg.batch_size)
        ds = ds.groupby(["part", "salt"]).map_groups(presalt_reduce,
                                                     batch_format="pyarrow")

    merge = MergeApply(registry_json=registry.to_json(),
                       prev_parts=prev_parts, epoch=epoch_no,
                       epoch_ver=ep.schema_ver, watermark_ts=ep.hi,
                       lake_data_dir=os.path.join(cfg.lake_dir, "data"),
                       sink_mode=cfg.sink_mode, compact_every=cfg.compact_every,
                       allow_fold=allow_fold,
                       online_validate=cfg.online_validate,
                       collation=cfg.key_collation)
    if cfg.shuffle_mode == "direct":
        stats_rows = _direct_exchange(ds, merge, cfg.num_partitions)
    else:
        def merge_apply(t: pa.Table) -> pa.Table:  # map_groups needs a __name__
            return merge(t)

        gb = ds.groupby("part")
        kwargs = {}
        if cfg.merge_concurrency:
            kwargs["concurrency"] = cfg.merge_concurrency
        out_ds = gb.map_groups(merge_apply, batch_format="pyarrow", **kwargs)
        stats_rows = out_ds.take_all()
        if cfg.collect_stats:
            with _STATS_LOCK:
                LAST_EPOCH_STATS.append(out_ds.stats())
    return stats_rows


def _commit_epoch(lake: LakeState, registry: SchemaRegistry, prev: Manifest,
                  ep: Epoch, epoch_no: int, stats_rows: list[dict],
                  syncpoint_interval: int = 0,
                  key_collation: str = "binary") -> tuple[Manifest, EpochResult]:
    n_winners = 0  # surviving per-key winners, counted from per-part stats
    # build the next manifest: touched parts get a new base file (fold/cow)
    # or an appended delta (MoR); untouched parts carry over untouched
    parts = dict(prev.parts)
    rows_total = 0
    for r in stats_rows:
        key = str(r["part"])
        if r["is_delta"]:
            pm = dict(parts.get(key) or
                      {"path": None, "schema_ver": ep.schema_ver,
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
    for meta in parts.values():
        rows_total += max(meta.get("rows", 0), 0)

    # recognize-and-skip note for non-schema DDL barriers crossed by this
    # commit (add/drop index, exchange partition — metadata-only for the
    # lake): the skip is recorded HERE, in the durable manifest, so it is
    # auditable rather than silent (cdc/owner/ddl_manager.go's treatment
    # of non-schema-affecting jobs)
    from ..stages.schema_evo import NON_SCHEMA_DDLS, OPERATOR_SKIP_DDL
    skipped = [f"{d.ddl_type}:{d.column}" for d in registry.ddls
               if prev.schema_ver < d.schema_ver <= ep.schema_ver
               and (d.ddl_type in NON_SCHEMA_DDLS
                    or d.ddl_type == OPERATOR_SKIP_DDL)]

    m = Manifest(epoch=epoch_no, watermark_ts=ep.hi, schema_ver=ep.schema_ver,
                 num_partitions=prev.num_partitions,
                 registry_json=registry.to_json(), parts=parts,
                 segments_applied=sorted(set(prev.segments_applied) | set(ep.files)),
                 stats={**({"ddl_skipped": skipped} if skipped else {}),
                        **({"key_collation": key_collation}
                           if key_collation != "binary" else {}),
                        "events": ep.est_rows, "winners": n_winners,
                        "parts_touched": len(stats_rows),
                        "salted_events": sum(r.get("salted_events", 0)
                                             for r in stats_rows),
                        # consistent-snapshot tag (cdc/owner syncpoint):
                        # this manifest's watermark IS the aligned ts
                        "syncpoint": bool(syncpoint_interval
                                          and ep.hi % syncpoint_interval == 0),
                        "lo": ep.lo, "hi": ep.hi},
                 hash_fingerprint=prev.hash_fingerprint)
    lake.commit(m)  # THE commit point: epoch becomes durable exactly here
    return m, EpochResult(epoch_no, ep.lo, ep.hi, ep.schema_ver, ep.est_rows,
                          len(stats_rows), rows_total)


def run_epoch(cfg: ReplayConfig, lake: LakeState, registry: SchemaRegistry,
              prev: Manifest, ep: Epoch, epoch_no: int) -> tuple[Manifest, EpochResult]:
    stats_rows = _execute_epoch(cfg, registry, prev.parts, ep, epoch_no)
    return _commit_epoch(lake, registry, prev, ep, epoch_no, stats_rows,
                         syncpoint_interval=cfg.syncpoint_interval,
                         key_collation=cfg.key_collation)


def _split_block_by_part(t: pa.Table, num_partitions: int) -> tuple:
    """One combiner output block → P zero-copy-sliced sub-tables (sorted by
    the uint32 part column; no comparator sort, no sampling)."""
    import numpy as np
    part = t["part"].to_numpy(zero_copy_only=False)
    order = np.argsort(part, kind="stable")
    ts = t.take(pa.array(order))
    ps = part[order]
    bounds = np.searchsorted(ps, np.arange(num_partitions + 1))
    return tuple(ts.slice(int(bounds[p]), int(bounds[p + 1] - bounds[p]))
                 for p in range(num_partitions))


def _merge_exchange_task(merge: "MergeApply", part: int, *tables) -> dict | None:
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return None
    return merge(pa.concat_tables(tables)).to_pylist()[0]


def _direct_exchange(ds: ray.data.Dataset, merge: "MergeApply",
                     num_partitions: int) -> list[dict]:
    """Explicit hash exchange replacing the generic sort shuffle: the
    partition count is small and FIXED (the lake layout), so routing is a
    stable integer sort + zero-copy slicing per block, and each partition's
    merge is one task over its slice refs. This is the span-assignment
    exchange of the reference made literal. For very large P or multi-node
    spill pressure, cfg.shuffle_mode="sort" falls back to Ray's shuffle."""
    split = ray.remote(num_returns=num_partitions)(_split_block_by_part)
    block_refs = ds.to_arrow_refs()   # combiner output, materialized as blocks
    subrefs = [split.remote(r, num_partitions) for r in block_refs]
    if num_partitions == 1:
        subrefs = [[s] for s in subrefs]
    merge_task = ray.remote(_merge_exchange_task)
    stats_refs = [merge_task.remote(merge, p, *[sr[p] for sr in subrefs])
                  for p in range(num_partitions)]
    return [r for r in ray.get(stats_refs) if r is not None]


def run_replay(cfg: ReplayConfig, upto_ts: int | None = None,
               max_epochs: int | None = None) -> ReplayResult:
    """Replay all WAL segments beyond the last checkpoint into the lake.
    Safe to call repeatedly / after a crash: resumes from the latest
    committed manifest (resume ≡ next epoch, SURVEY.md §3.2)."""
    lake = LakeState(cfg.lake_dir)
    registry = load_registry(cfg.wal_dir)
    prev = lake.latest()
    assert prev is not None, "call bootstrap() first"
    if cfg.collect_stats:
        with _STATS_LOCK:
            LAST_EPOCH_STATS.clear()

    segments = list_segments(cfg.wal_dir)
    epochs = plan_epochs(segments, registry, from_ts=prev.watermark_ts,
                         max_segments_per_epoch=cfg.max_segments_per_epoch,
                         upto_ts=upto_ts,
                         syncpoint_interval=cfg.syncpoint_interval,
                         max_bytes_per_epoch=_epoch_byte_cap(cfg))
    if max_epochs is not None:
        epochs = epochs[:max_epochs]
    return _drive_epochs(cfg, lake, registry, prev, epochs)


def tail_replay(cfg: ReplayConfig, poll_secs: float = 0.5,
                idle_timeout: float | None = None,
                stop_file: str | None = None,
                max_epochs: int | None = None) -> ReplayResult:
    """Continuous tailing daemon (the changefeed processor loop): watch the
    WAL dir and replay new epochs as segments land, committing checkpoints
    as it goes — `run_replay` IS already incremental (resume ≡ next epoch),
    so tailing is just that call in a poll loop. Stops when `idle_timeout`
    seconds pass with no new committed work, when `stop_file` appears (the
    operator's pause/remove-changefeed signal), or after `max_epochs`
    total. Restart later to resume from the checkpoint — identical
    semantics to any crash/resume."""
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
        r = run_replay(cfg, max_epochs=budget)
        if r.epochs:
            result.epochs.extend(r.epochs)
            idle_since = time.monotonic()
        else:
            if idle_timeout is not None and \
                    time.monotonic() - idle_since >= idle_timeout:
                break
            time.sleep(poll_secs)
    return result


def _drive_epochs(cfg: ReplayConfig, lake: LakeState, registry: SchemaRegistry,
                  prev: Manifest, epochs: list[Epoch]) -> ReplayResult:
    if prev.num_partitions and prev.num_partitions != cfg.num_partitions:
        raise ValueError(f"lake P={prev.num_partitions} != config "
                         f"P={cfg.num_partitions}; repartitioning the lake "
                         "requires an explicit re-bootstrap")
    from ..model import hash_fingerprint
    if prev.hash_fingerprint and prev.hash_fingerprint != hash_fingerprint():
        raise ValueError(
            f"key-hash fingerprint mismatch: lake was laid out with "
            f"{prev.hash_fingerprint!r}, this process computes "
            f"{hash_fingerprint()!r} — a hash-function/library change would "
            "mis-route keys into existing partitions; re-bootstrap the lake")
    result = ReplayResult()
    next_no = prev.epoch + 1

    k = max(1, cfg.pipeline_epochs) if cfg.sink_mode == "mor" else 1
    i = 0
    while i < len(epochs):
        group = epochs[i:i + k]
        if len(group) == 1:
            prev, er = run_epoch(cfg, lake, registry, prev, group[0], next_no)
            result.epochs.append(er)
            next_no += 1
        else:
            # concurrent group: every epoch appends independent MoR deltas
            # (folds deferred ⇒ no epoch reads another's output); pipelines
            # overlap, commits stay strictly ordered
            from concurrent.futures import ThreadPoolExecutor

            # pre-warm lazy imports Ray touches inside read planning —
            # concurrent first-imports from threads race half-initialized
            # modules (observed: fsspec.implementations.http)
            try:
                import fsspec.implementations.http  # noqa: F401
            except Exception:
                pass
            with ThreadPoolExecutor(max_workers=len(group)) as pool:
                futs = [pool.submit(_execute_epoch, cfg, registry, prev.parts,
                                    ep, next_no + j, False)
                        for j, ep in enumerate(group)]
                stats_lists = [f.result() for f in futs]
            for j, (ep, stats_rows) in enumerate(zip(group, stats_lists)):
                prev, er = _commit_epoch(lake, registry, prev, ep,
                                         next_no + j, stats_rows,
                                         syncpoint_interval=cfg.syncpoint_interval,
                                         key_collation=cfg.key_collation)
                result.epochs.append(er)
            next_no += len(group)
        i += len(group)
    return result


def merge_optimistic_registries(regs: list[SchemaRegistry]) -> SchemaRegistry:
    """Synthesize the optimistic shard-merge target schema (DM's
    dm/pkg/shardddl/optimism coordination, re-expressed for the lake):
    every shard must eventually apply the same logical DDL set, but each at
    its OWN binlog position. The synthesized schedule applies an
    `add_column` at the EARLIEST shard barrier (rows from shards that have
    not added it yet backfill the column default) and a `drop_column` at
    the LATEST shard barrier (the column survives until the last shard
    dropped it) — the lattice-join rule optimism's schema tracker computes.

    Only add/drop are coordinated optimistically; a `modify_column` (type
    change) is exactly the conflict optimism cannot auto-resolve and is
    rejected, as is a shard whose logical DDL set diverges."""
    def ident(d):
        return (d.ddl_type, d.column, d.default)

    for r in regs:
        kinds = {d.ddl_type for d in r.ddls}
        if not kinds <= {"add_column", "drop_column"}:
            raise ValueError(
                f"optimistic shard-merge coordinates add/drop only; got "
                f"{kinds - {'add_column', 'drop_column'}}")
        ids = [ident(d) for d in r.ddls]
        assert len(ids) == len(set(ids)), "duplicate DDL within one shard"
    ref = sorted(ident(d) for d in regs[0].ddls)
    for i, r in enumerate(regs[1:], 1):
        if sorted(ident(d) for d in r.ddls) != ref:
            raise ValueError(
                f"shard {i} declares a different logical DDL set than shard "
                "0 — optimistic shard-merge requires eventually-identical "
                "migrations (optimism's schema-compatibility rule)")
    merged_bts = {}
    for r in regs:
        for d in r.ddls:
            k = ident(d)
            cur = merged_bts.get(k)
            pick = min if d.ddl_type == "add_column" else max
            merged_bts[k] = d.barrier_ts if cur is None else pick(cur, d.barrier_ts)
    ordered = sorted(merged_bts.items(), key=lambda kv: (kv[1], kv[0][1]))
    return SchemaRegistry([
        DDL(bts, t, col, dflt, i + 2)
        for i, ((t, col, dflt), bts) in enumerate(ordered)])


def _remount_table(t: pa.Table, shard_reg: SchemaRegistry,
                   merged_reg: SchemaRegistry) -> pa.Table:
    """Re-mount one shard segment's events under the synthesized schema
    (the optimistic syncer's event rewrite): per event, image columns the
    shard has at its own version pass through; columns the merged schema
    already has but this shard has not added yet are backfilled with the
    merged default (null for deletes — deletes carry no image); columns
    outside the merged version at that ts ride as null (never projected).
    `schema_ver` is rewritten to the merged version. Vectorized over runs
    of constant (shard_ver, merged_ver) — almost always one run/segment."""
    from ..model import OP_DELETE
    from ..stages.normalize import EVENT_KEY_COLS

    t = t.take(pc.sort_indices(t, sort_keys=[("commit_ts", "ascending"),
                                             ("start_ts", "ascending")]))
    n = t.num_rows

    # superset image fields: v1 columns + every merged add, in merged order
    sup = list(merged_reg.schema(1))
    seen = {f.name for f in sup}
    for d in merged_reg.ddls:
        if d.ddl_type == "add_column" and d.col_name not in seen:
            sup.append(pa.field(d.col_name, d.col_type))
            seen.add(d.col_name)
    sup = [f for f in sup if f.name != "doc_id"]

    if n == 0:   # resolved-ts heartbeat: emit the uniform superset layout
        cols, names = [], []
        for c in EVENT_KEY_COLS + ["pre_tokens"]:
            if c in t.column_names:
                names.append(c); cols.append(t[c])
        for f in sup:
            names.append(f.name); cols.append(pa.nulls(0, f.type))
        names.append("schema_ver"); cols.append(pa.nulls(0, pa.int32()))
        return pa.Table.from_arrays(cols, names=names)

    cts = t["commit_ts"].to_numpy(zero_copy_only=False).astype(np.int64)
    def vers(reg):
        bar = np.array(reg.barriers(), np.int64)
        if not len(bar):
            return np.ones(n, np.int64)
        return 1 + (cts[:, None] > bar[None, :]).sum(axis=1)
    s_ver, m_ver = vers(shard_reg), vers(merged_reg)

    key = s_ver * (int(m_ver.max()) + 1) + m_ver
    cuts = (np.flatnonzero(np.diff(key)) + 1).tolist()
    pieces = []
    for a, b in zip([0] + cuts, cuts + [n]):
        sub = t.slice(a, b - a)
        sv, mv = int(s_ver[a]), int(m_ver[a])
        shard_cols = set(shard_reg.schema(sv).names)
        merged_cols = set(merged_reg.schema(mv).names)
        defaults = merged_reg.defaults(mv)
        cols, names = [], []
        for c in EVENT_KEY_COLS + ["pre_tokens"]:
            if c in sub.column_names:
                names.append(c); cols.append(sub[c])
        for f in sup:
            names.append(f.name)
            if f.name in shard_cols and f.name in sub.column_names:
                col = sub[f.name]
                cols.append(col.cast(f.type) if col.type != f.type else col)
            elif f.name in merged_cols and defaults.get(f.name) is not None:
                fill = pa.array([defaults[f.name]] * sub.num_rows)
                if fill.type != f.type:
                    fill = fill.cast(f.type)
                not_del = pc.not_equal(sub["op"], pa.scalar(OP_DELETE, pa.uint8()))
                cols.append(pc.if_else(not_del, fill, pa.nulls(sub.num_rows, f.type)))
            else:
                cols.append(pa.nulls(sub.num_rows, f.type))
        names.append("schema_ver")
        cols.append(pa.array(np.full(sub.num_rows, mv, np.int32)))
        pieces.append(pa.Table.from_arrays(cols, names=names))
    return pa.concat_tables(pieces) if pieces else t


def _run_replay_optimistic(cfg: ReplayConfig, wal_dirs: list[str],
                           upto_ts: int | None) -> ReplayResult:
    """Optimistic shard-merge: synthesize the merged registry and drive
    the standard epoch engine over the UNION of the raw shard segments,
    remounting each batch under the merged schema AT READ TIME
    (RemountStage via cfg.remount_shards — no derived WAL is ever written;
    r3 materialized a `_remount/` copy of the whole change stream first).
    Column mapping applies inside the remount stage (per shard, where
    shard identity is explicit); the epoch engine must not re-map, so the
    config is stripped before _drive_epochs. Resume needs no remount
    state: epochs past the committed watermark simply re-read the raw
    shard files."""
    lake = LakeState(cfg.lake_dir)
    key_mapping = cfg.shard_key_mapping
    if key_mapping:
        # mirror of the shard_key_mapping+two_pass guard in _execute_epoch:
        # the mapping moves into cfg.remount_shards below, which the epoch
        # guard never sees — but the thin winner pass still reads RAW
        # unmapped doc_ids, so signatures/partitions would mismatch the
        # remounted main pass and the filter would drop every event
        if (cfg.replay_mode == "two_pass"
                and any(m is not None for m in key_mapping.values())):
            raise ValueError(
                "replay_mode='two_pass' cannot be combined with per-shard "
                "column mapping in optimistic shard-merge: the thin winner "
                "pass reads unmapped keys while the main pass remounts them")
        cfg = dataclasses.replace(cfg, shard_key_mapping=None)
    regs = [load_registry(d) for d in wal_dirs]
    merged = merge_optimistic_registries(regs)
    prev = lake.latest()
    assert prev is not None, "call bootstrap() first"

    shard_segs = [list_segments(d) for d in wal_dirs]
    if any(not s for s in shard_segs):    # empty shard holds the frontier
        return ReplayResult()
    frontier = min(s[-1].watermark_ts for s in shard_segs)
    if upto_ts is not None:
        frontier = min(frontier, upto_ts)

    remount_map: dict[str, tuple] = {}
    for i, d in enumerate(wal_dirs):
        for s in shard_segs[i]:
            assert s.format == "parquet", \
                "optimistic shard-merge expects parquet WAL shards"
        ad = os.path.abspath(d)
        remount_map[ad] = (regs[i].to_json(),
                           key_mapping.get(ad) if key_mapping else None)
    cfg = dataclasses.replace(cfg, remount_shards=remount_map)

    merged_segs = sorted((seg for segs in shard_segs for seg in segs),
                         key=lambda s: (s.watermark_ts, s.path))
    epochs = plan_epochs(merged_segs, merged, from_ts=prev.watermark_ts,
                         max_segments_per_epoch=cfg.max_segments_per_epoch,
                         upto_ts=frontier,
                         syncpoint_interval=cfg.syncpoint_interval,
                         max_bytes_per_epoch=_epoch_byte_cap(cfg))
    return _drive_epochs(cfg, lake, merged, prev, epochs)


def run_replay_sharded(cfg: ReplayConfig, wal_dirs: list[str],
                       upto_ts: int | None = None,
                       mode: str = "pessimistic",
                       key_mappings: list | None = None) -> ReplayResult:
    """Shard-merge replay (dm/syncer/shardddl pessimistic coordination
    analog): N upstream WAL streams merge into ONE target table.
    `mode="optimistic"` instead coordinates divergent per-shard DDL
    schedules via the synthesized merged schema (see
    merge_optimistic_registries / _run_replay_optimistic).

    - All shards must declare the SAME DDL schedule; a divergent schedule
      is exactly the conflict the pessimist blocks on — rejected upfront
      (shardddl/pessimist.go semantics: a shard's DDL must match the owner's
      before any shard may proceed).
    - The merged frontier is min over shards of their last watermark (the
      A1 min-over-spans rule): an epoch — and therefore any DDL barrier —
      only commits once EVERY shard has delivered up to it. A lagging
      pre-barrier shard holds the barrier back; catch-up is just calling
      this again after new segments land (resume ≡ next epoch).
    - Within an epoch the union of shard segments is one read: per-key
      ordering needs no cross-shard coordination because the compactor
      sorts by (commit_ts, start_ts) globally after the shuffle.
    - `key_mappings` (DM pkg/column-mapping analog): one ColumnMappingRule
      per shard, rewriting handle keys at read time — the "partition id"
      rule that keeps overlapping shard-local PKs from colliding in the
      merged table. The base lake must already hold MAPPED keys (DM's
      full load also runs through column mapping).
    """
    assert mode in ("pessimistic", "optimistic"), mode
    if key_mappings is not None:
        assert len(key_mappings) == len(wal_dirs), \
            "key_mappings must give exactly one rule per shard"
        cfg = dataclasses.replace(cfg, shard_key_mapping={
            os.path.abspath(d): r for d, r in zip(wal_dirs, key_mappings)})
    if mode == "optimistic":
        return _run_replay_optimistic(cfg, wal_dirs, upto_ts)
    lake = LakeState(cfg.lake_dir)
    registries = [load_registry(d) for d in wal_dirs]
    ref = registries[0].to_json()
    for d, r in zip(wal_dirs[1:], registries[1:]):
        if r.to_json() != ref:
            raise ValueError(
                f"shard {d} declares a different DDL schedule than "
                f"{wal_dirs[0]} — pessimistic shard-merge requires identical "
                "migrations on every shard before any may proceed")
    registry = registries[0]
    prev = lake.latest()
    assert prev is not None, "call bootstrap() first"

    shard_segs = [list_segments(d) for d in wal_dirs]
    # A shard with ZERO segments is frontier-holding, not ignorable: its
    # data (at unknown commit_ts) has simply not been delivered yet, and
    # committing past it would let plan_epochs' from_ts predicate filter
    # those events out forever on catch-up (silent loss). The pessimist
    # min-over-spans rule applies to every declared shard, delivered or not.
    if any(not s for s in shard_segs):
        return ReplayResult()
    frontier = min(s[-1].watermark_ts for s in shard_segs)
    if upto_ts is not None:
        frontier = min(frontier, upto_ts)
    merged = sorted((seg for segs in shard_segs for seg in segs),
                    key=lambda s: (s.watermark_ts, s.path))
    epochs = plan_epochs(merged, registry, from_ts=prev.watermark_ts,
                         max_segments_per_epoch=cfg.max_segments_per_epoch,
                         upto_ts=frontier,
                         syncpoint_interval=cfg.syncpoint_interval,
                         max_bytes_per_epoch=_epoch_byte_cap(cfg))
    return _drive_epochs(cfg, lake, registry, prev, epochs)


def gc_wal(wal_dir: str, lake_dir: str) -> dict:
    """Remove WAL segments fully behind the lake's committed watermark
    (redo-log GC analog, cdc/redo meta GC): a segment is deletable only
    when its max_ts <= the manifest watermark AND it is recorded in
    segments_applied — resume re-planning never needs it again."""
    lake = LakeState(lake_dir)
    m = lake.latest()
    assert m is not None, "no committed manifest"
    applied = set(m.segments_applied)
    removed = 0
    for s in list_segments(wal_dir):
        if s.max_ts <= m.watermark_ts and s.path in applied:
            os.remove(s.path)
            meta = os.path.join(wal_dir, f"seq={s.seq:05d}.meta.json")
            if os.path.exists(meta):
                os.remove(meta)
            removed += 1
    return {"segments_removed": removed, "watermark_ts": m.watermark_ts}


def compact_lake(lake_dir: str, parts: list[int] | None = None) -> dict:
    """Offline/background MoR compaction job: fold every partition with a
    pending delta chain into a fresh base file and commit one manifest
    epoch — compaction decoupled from replay (the background-compaction
    service a lake needs when `compact_every` is set high to keep ingest
    latency flat). One Ray task per partition (distributed, no shuffle —
    each task reads only its own chain); the manifest commit is the usual
    atomic rename, so a crash mid-compaction changes nothing."""
    import json as _json

    from ..stages.merge import _atomic_write, fold_part

    lake = LakeState(lake_dir)
    m = lake.latest()
    assert m is not None, "no committed manifest"
    registry = SchemaRegistry.from_json(m.registry_json)
    todo = [int(p) for p, meta in m.parts.items()
            if meta.get("deltas") and (parts is None or int(p) in parts)]
    if not todo:
        return {"parts_folded": 0, "epoch": m.epoch}

    epoch_no = m.epoch + 1
    reg_json, cur_ver = registry.to_json(), m.schema_ver
    data_dir = os.path.join(lake_dir, "data")
    items = [{"part": p, "meta_json": _json.dumps(m.parts[str(p)])}
             for p in todo]

    def fold_write(t: pa.Table) -> pa.Table:
        reg = SchemaRegistry.from_json(reg_json)
        out = {"part": [], "path": [], "rows": [], "bytes": []}
        for p, meta_json in zip(t["part"].to_pylist(),
                                t["meta_json"].to_pylist()):
            folded = fold_part(_json.loads(meta_json), reg, cur_ver)
            path = os.path.join(data_dir, f"part={p}",
                                f"epoch-{epoch_no:06d}.parquet")
            _atomic_write(folded, path)
            out["part"].append(p)
            out["path"].append(path)
            out["rows"].append(folded.num_rows)
            out["bytes"].append(folded.nbytes)
        return pa.table(out)

    stats = ray.data.from_items(items) \
        .map_batches(fold_write, batch_format="pyarrow", batch_size=1) \
        .take_all()

    new_parts = dict(m.parts)
    for r in stats:
        old = new_parts[str(r["part"])]
        new_parts[str(r["part"])] = {
            "path": r["path"], "schema_ver": cur_ver, "rows": r["rows"],
            "watermark_ts": old.get("watermark_ts", m.watermark_ts),
            "bytes": r["bytes"], "deltas": []}
    m2 = Manifest(epoch=epoch_no, watermark_ts=m.watermark_ts,
                  schema_ver=cur_ver, num_partitions=m.num_partitions,
                  registry_json=m.registry_json, parts=new_parts,
                  segments_applied=m.segments_applied,
                  stats={"compaction": True, "parts_folded": len(stats)},
                  hash_fingerprint=m.hash_fingerprint)
    lake.commit(m2)
    return {"parts_folded": len(stats), "epoch": epoch_no}


def repartition_lake(lake_dir: str, new_p: int) -> dict:
    """Re-lay the lake out with a different partition count — the keyspan
    split/merge scale-out move (cdc/scheduler/internal/v3/keyspan splitters
    re-balance spans across captures; here the lake's hash space re-buckets
    so a bigger cluster gets more parallel merge lanes). Offline job
    between epochs: replay resumes with `num_partitions=new_p` afterwards.

    Paths, all committing ONE atomic manifest epoch (crash ⇒ no-op):
    - new_p % P == 0 (split, the common scale-OUT): shuffle-free — a key in
      old part p can only re-hash to {p, p+P, ...}, so one task per OLD
      partition folds its chain and writes its ≤ new_p/P children directly.
    - P % new_p == 0 (merge, scale-IN): shuffle-free — one task per NEW
      partition folds exactly its P/new_p parents and concatenates.
    - otherwise: one all-to-all exchange (read_lake → re-hash →
      groupby(part) writers) — unavoidable for a general re-hash.
    """
    import json as _json

    from ..stages.merge import _atomic_write, fold_part

    lake = LakeState(lake_dir)
    m = lake.latest()
    assert m is not None, "no committed manifest"
    P = m.num_partitions
    assert new_p >= 1
    if new_p == P:
        return {"num_partitions": P, "epoch": m.epoch, "moved": 0}
    registry = SchemaRegistry.from_json(m.registry_json)
    reg_json, cur_ver = registry.to_json(), m.schema_ver
    epoch_no = m.epoch + 1
    data_dir = os.path.join(lake_dir, "data")
    wm = m.watermark_ts

    def write_piece(t: pa.Table, c: int) -> dict:
        path = os.path.join(data_dir, f"part={c}",
                            f"epoch-{epoch_no:06d}.parquet")
        _atomic_write(t, path)
        return {"part": c, "path": path, "rows": t.num_rows,
                "bytes": t.nbytes, "schema_ver": cur_ver,
                "watermark_ts": wm}

    if new_p % P == 0:            # split: task per OLD part, no shuffle
        items = [{"old": int(p), "meta_json": _json.dumps(meta)}
                 for p, meta in m.parts.items()]

        def split_write(tb: pa.Table) -> pa.Table:
            reg = SchemaRegistry.from_json(reg_json)
            out = []
            for row in tb.to_pylist():
                folded = fold_part(_json.loads(row["meta_json"]), reg, cur_ver)
                child = hash_partition(folded["doc_id"], new_p)
                for c in range(row["old"], new_p, P):
                    piece = folded.filter(pa.array(child == c))
                    if piece.num_rows:
                        out.append(write_piece(piece, c))
            return pa.Table.from_pylist(out) if out else pa.table(
                {"part": pa.array([], pa.int64())})

        stats = ray.data.from_items(items).map_batches(
            split_write, batch_format="pyarrow", batch_size=1).take_all()
    elif P % new_p == 0:          # merge: task per NEW part, no shuffle
        items = []
        for c in range(new_p):
            parents = [m.parts[str(p)] for p in range(c, P, new_p)
                       if str(p) in m.parts]
            if parents:
                items.append({"new": c, "metas_json": _json.dumps(parents)})

        def merge_write(tb: pa.Table) -> pa.Table:
            reg = SchemaRegistry.from_json(reg_json)
            out = []
            for row in tb.to_pylist():
                folded = pa.concat_tables(
                    [fold_part(meta, reg, cur_ver)
                     for meta in _json.loads(row["metas_json"])])
                folded = folded.take(pc.sort_indices(
                    folded, sort_keys=[("doc_id", "ascending")]))
                if folded.num_rows:
                    out.append(write_piece(folded, int(row["new"])))
            return pa.Table.from_pylist(out) if out else pa.table(
                {"part": pa.array([], pa.int64())})

        stats = ray.data.from_items(items).map_batches(
            merge_write, batch_format="pyarrow", batch_size=1).take_all()
    else:                         # general re-hash: one all-to-all exchange
        ds = read_lake(lake_dir)

        def assign(t: pa.Table) -> pa.Table:
            return t.append_column(
                "part", pa.array(hash_partition(t["doc_id"], new_p)))

        def part_write(t: pa.Table) -> pa.Table:
            c = int(t["part"][0].as_py())
            body = t.drop_columns(["part"])
            body = body.take(pc.sort_indices(
                body, sort_keys=[("doc_id", "ascending")]))
            return pa.Table.from_pylist([write_piece(body, c)])

        stats = ds.map_batches(assign, batch_format="pyarrow") \
            .groupby("part").map_groups(part_write, batch_format="pyarrow") \
            .take_all()

    parts = {str(r["part"]): {**{k: r[k] for k in
                                 ("path", "schema_ver", "rows",
                                  "watermark_ts", "bytes")}, "deltas": []}
             for r in stats if "path" in r and r.get("path")}
    m2 = Manifest(epoch=epoch_no, watermark_ts=wm, schema_ver=cur_ver,
                  num_partitions=new_p, registry_json=m.registry_json,
                  parts=parts, segments_applied=list(m.segments_applied),
                  stats={"repartitioned_from": P, "parts_written": len(parts)},
                  hash_fingerprint=m.hash_fingerprint)
    lake.commit(m2)
    return {"num_partitions": new_p, "epoch": epoch_no,
            "parts_written": len(parts)}


def list_syncpoints(lake_dir: str) -> list[dict]:
    """Committed consistent-snapshot points (cdc/owner syncpoint analog):
    every manifest whose epoch was cut at an aligned ts. Each entry pins a
    manifest whose watermark EQUALS the sync ts — `read_lake(...,
    epoch=entry['epoch'])` materializes exactly that snapshot."""
    lake = LakeState(lake_dir)
    out = []
    for e in lake.committed_epochs():
        m = lake.load(e)
        if m.stats.get("syncpoint"):
            out.append({"ts": m.watermark_ts, "epoch": m.epoch,
                        "schema_ver": m.schema_ver})
    return out


def read_lake(lake_dir: str, wal_dir: str | None = None,
              epoch: int | None = None) -> ray.data.Dataset:
    """Lake table as a Dataset: one fold task per partition applies the
    MoR delta chain (and any pending schema cast) — the read half of the
    merge-on-read sink. CoW lakes (empty chains) reduce to a plain read.
    `epoch` pins a specific committed manifest (time travel to a
    syncpoint); default = latest."""
    import json as _json

    from ..stages.merge import fold_part

    lake = LakeState(lake_dir)
    m = lake.latest() if epoch is None else lake.load(epoch)
    assert m is not None
    # the manifest's own registry makes the lake self-describing; a wal_dir
    # override only matters for pre-registry manifests
    registry = (SchemaRegistry.from_json(m.registry_json)
                if m.registry_json != "[]" or not wal_dir
                else load_registry(wal_dir))
    reg_json = registry.to_json()
    cur_ver = m.schema_ver
    collation = m.stats.get("key_collation", "binary")

    metas = [meta for _, meta in sorted(m.parts.items(), key=lambda kv: int(kv[0]))]
    if not metas:
        return ray.data.from_arrow(registry.schema(cur_ver).empty_table())

    items = [{"meta_json": _json.dumps(meta)} for meta in metas]

    def fold_batch(t: pa.Table) -> pa.Table:
        reg = SchemaRegistry.from_json(reg_json)
        outs = [fold_part(_json.loads(s), reg, cur_ver, collation)
                for s in t["meta_json"].to_pylist()]
        return pa.concat_tables(outs)

    return ray.data.from_items(items).map_batches(fold_batch,
                                                  batch_format="pyarrow",
                                                  batch_size=1)


def lake_to_table(lake_dir: str, wal_dir: str | None = None,
                  epoch: int | None = None) -> pa.Table:
    """Materialize the lake (tests/small outputs only), sorted by doc_id."""
    tbls = [pa.Table.from_pandas(b.to_pandas()) if not isinstance(b, pa.Table) else b
            for b in read_lake(lake_dir, wal_dir, epoch=epoch).iter_batches(
                batch_size=1 << 18, batch_format="pyarrow")]
    if not tbls:
        raise ValueError("empty lake")
    t = pa.concat_tables([x if isinstance(x, pa.Table) else pa.Table.from_batches([x])
                          for x in tbls])
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))
