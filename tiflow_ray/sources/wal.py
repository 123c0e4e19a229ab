"""WAL (synthetic binlog) source: segment discovery + epoch planning.

The WAL is a directory of resolved-ts-delimited Parquet segments
(`seq={s}.parquet` + `seq={s}.meta.json` carrying watermark/min/max commit_ts).
This is the columnar analog of the puller + frontier chain
(cdc/puller/multiplexing_puller.go:50-170, cdc/puller/frontier/frontier.go:30-112):
a segment's watermark says "all events with commit_ts <= watermark are in
segments <= s", so processing whole segments in order never sees late data —
the same contract the reference's sorter relies on (cdc/model/kv.go:59-66).

Epoch planning cuts the stream at (a) segment watermarks, coalescing up to
`max_segments_per_epoch`, and (b) every DDL barrier_ts (epochs never span a
barrier; events AT barrier_ts fall in the OLD-schema epoch —
cdc/owner/ddl_manager.go:395-425 + cdc/entry/mounter.go:158-160).
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass

from ..stages.schema_evo import DDL, SchemaRegistry


@dataclass(frozen=True)
class Segment:
    seq: int
    path: str
    watermark_ts: int
    min_ts: int
    max_ts: int
    rows: int
    format: str = "parquet"   # "parquet" | "jsonl" | "csv" | "canal_json"
    columns: tuple[str, ...] = ()   # column order for headerless codecs
                                    # (csv/canal-json — the schema-file analog)


@dataclass(frozen=True)
class Epoch:
    index: int            # epoch number (dense, deterministic)
    lo: int               # exclusive lower commit_ts bound
    hi: int               # inclusive upper bound (a watermark or barrier ts)
    schema_ver: int       # the ONE schema version of every event in (lo, hi]
    files: tuple[str, ...]  # WAL segment files overlapping (lo, hi]
    est_rows: int = 0     # upper-bound row estimate (sum of overlapping segments)
    fmt: str = "parquet"  # uniform file format of this epoch's segments
    columns: tuple[str, ...] = ()   # codec column order (csv/canal-json)
    #: per-file codec column order — segments written before and after a
    #: DDL barrier carry DIFFERENT column sets, and positional codecs
    #: (csv) misdecode under the wrong order; () falls back to `columns`
    col_map: tuple[tuple[str, tuple[str, ...]], ...] = ()


def list_segments(wal_dir: str) -> list[Segment]:
    segs = []
    for meta_path in sorted(glob.glob(os.path.join(wal_dir, "seq=*.meta.json"))):
        with open(meta_path) as f:
            m = json.load(f)
        fmt = m.get("format", "parquet")
        ext = {"parquet": ".parquet", "jsonl": ".jsonl",
               "csv": ".csv", "canal_json": ".canal.jsonl",
               "debezium": ".dbz.jsonl",
               "open_protocol": ".open.jsonl",
               "maxwell": ".maxwell.jsonl",
               "simple": ".simple.jsonl",
               "avro": ".avro",
               "craft": ".craft",
               "mysql_binlog": ".binlog"}[fmt]
        path = meta_path.replace(".meta.json", ext)
        segs.append(Segment(m["seq"], path, m["watermark_ts"], m["min_ts"],
                            m["max_ts"], m["rows"], fmt,
                            tuple(m.get("columns", ()))))
    return sorted(segs, key=lambda s: s.seq)


def load_registry(wal_dir: str) -> SchemaRegistry:
    """ddl.json → SchemaRegistry, with any registered error operators
    applied (stages/handle_error.py — dmctl binlog skip/replace/inject).
    Patching happens on the RAW specs before validation: the point of an
    operator is getting past a schedule the engine cannot execute, so a
    bad DDL must be neutralized before the registry walks it. A tailing
    replay reloads per iteration, picking fresh operators up live."""
    p = os.path.join(wal_dir, "ddl.json")
    raw: list[dict] = []
    if os.path.exists(p):
        with open(p) as f:
            raw = json.loads(f.read())
    from ..stages.handle_error import apply_error_ops, load_ops
    ops = load_ops(wal_dir)
    if ops:
        raw = apply_error_ops(raw, ops)
    return SchemaRegistry([DDL(**d) for d in raw])


def plan_epochs(segments: list[Segment], registry: SchemaRegistry,
                from_ts: int = 0, max_segments_per_epoch: int = 8,
                upto_ts: int | None = None,
                syncpoint_interval: int = 0,
                max_bytes_per_epoch: int | None = None) -> list[Epoch]:
    """Deterministic epoch plan for events in (from_ts, upto_ts].

    Resume safety: the plan is a pure function of (segment metas, DDL
    schedule, from_ts, syncpoint interval, byte cap) — a restarted driver
    with the same checkpoint reproduces exactly the remaining epochs
    (redo-applier analog, pkg/applier/redo.go:162-230).

    `syncpoint_interval` > 0 additionally cuts an epoch at every multiple
    of the interval (cdc/owner syncpoint analog): each such boundary
    commits a manifest whose watermark equals the aligned ts — a
    consistent snapshot downstream checkers can pin.

    `max_bytes_per_epoch` caps an epoch's on-disk segment bytes IN
    ADDITION to the segment-count cap: segment count says nothing about
    working-set size, and one oversized epoch (decompressed Arrow ×
    in-flight shuffle copies) can exceed the object store and hit the
    spill cliff. Byte-capped epochs trade a little per-epoch fixed cost
    for a bounded plasma footprint. Resume-deterministic as long as the
    segment files themselves are immutable (they are — tmp→rename)."""
    if not segments:
        return []
    max_w = segments[-1].watermark_ts if upto_ts is None else upto_ts
    barriers = [b for b in registry.barriers() if from_ts < b <= max_w]
    syncs = []
    if syncpoint_interval > 0:
        first = (from_ts // syncpoint_interval + 1) * syncpoint_interval
        syncs = list(range(first, max_w + 1, syncpoint_interval))

    # candidate boundaries: coalesced segment watermarks + barriers + syncs
    wm_segs = [s for s in segments if from_ts < s.watermark_ts <= max_w]
    wm = [s.watermark_ts for s in wm_segs]
    coalesced, cnt, acc = [], 0, 0
    for s in wm_segs:
        cnt += 1
        if max_bytes_per_epoch:
            try:
                acc += os.path.getsize(s.path)
            except OSError:
                pass
        if cnt >= max_segments_per_epoch or \
                (max_bytes_per_epoch and acc >= max_bytes_per_epoch):
            coalesced.append(s.watermark_ts)
            cnt = acc = 0
    if wm and (not coalesced or coalesced[-1] != wm[-1]):
        coalesced.append(wm[-1])
    bounds = sorted(set(coalesced) | set(barriers) | set(syncs))

    epochs = []
    lo = from_ts
    for i, hi in enumerate(bounds):
        overlapping = [s for s in segments if s.max_ts > lo and s.min_ts <= hi]
        fmts = {s.format for s in overlapping} or {"parquet"}
        assert len(fmts) == 1, f"mixed segment formats in one epoch: {fmts}"
        ver = registry.version_at(hi)  # events at hi use the old schema ⇒ this ver
        epochs.append(Epoch(i, lo, hi, ver,
                            tuple(s.path for s in overlapping),
                            sum(s.rows for s in overlapping), fmts.pop(),
                            overlapping[0].columns if overlapping else (),
                            tuple((s.path, s.columns) for s in overlapping)))
        lo = hi
    return epochs
