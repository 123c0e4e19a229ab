"""Deterministic synthetic fixtures: base lake + WAL change stream + DDLs.

Implements FIXTURES.md §1-3 exactly: seed-driven numpy generation, no
wall-clock anywhere. The WAL mirrors the reference's event semantics:

- op ∈ {1=DELETE, 2=UPDATE, 3=INSERT}; old+new images per row
  (RowChangedEvent.Columns/PreColumns, cdc/model/sink.go:347-391).
- per doc_id the event sequence is a LEGAL history (I before U/D, no U/D
  after D until a later I) — what an upstream DB guarantees.
- files are resolved-ts-delimited: all events with commit_ts <= watermark(s)
  live in segments <= s (the resolved-ts contract, cdc/model/kv.go:59-66);
  rows INSIDE a segment are shuffled (the engine must sort).
- ~0.5% of updates are identity-changing (new_doc_id set) — the engine must
  split them into delete+insert (cdc/model/sink.go:1262-1318).
- 1% of doc_ids receive ~50% of the updates (hot keys).
- a small DDL schedule (add_column / drop_column) cuts the stream into
  schema-version regimes; events AT a barrier_ts carry the OLD version
  (cdc/entry/mounter.go:158-160).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .model import OP_DELETE, OP_INSERT, OP_UPDATE, TOKEN_VOCAB, hash_partition
from .stages.schema_evo import DDL, SchemaRegistry

_MIX = 2654435761  # Knuth multiplicative hash constant
_LANGS = np.array(["en", "de", "fr", "zh", "es"])
_SOURCES = np.array(["web", "code", "books", "wiki"])
_SOURCE_P = np.array([0.6, 0.2, 0.1, 0.1])


def doc_name(idx) -> np.ndarray:
    """doc-{i:012d} vectorized."""
    idx = np.asarray(idx, dtype=np.int64)
    return np.char.add("doc-", np.char.zfill(idx.astype("U12"), 12))


# ---------------------------------------------------------------------------
# Deterministic token images. tokens(doc, ts) is a pure function so the
# generator can rebuild any historical image (for pre_tokens) without state.
# ---------------------------------------------------------------------------

def _image_len(doc_idx: np.ndarray, ts: np.ndarray, max_len: int) -> np.ndarray:
    span = max(1, max_len - 8)
    return (8 + (doc_idx * 13 + ts * 7) % span).astype(np.int32)


def _tokens_list_array(doc_idx: np.ndarray, ts: np.ndarray, max_len: int,
                       valid: np.ndarray | None = None) -> tuple[pa.ListArray, np.ndarray]:
    """Vectorized list<int32> build: tokens[i][j] = (seed_i + j*7) % VOCAB."""
    n = len(doc_idx)
    lens = _image_len(doc_idx, ts, max_len).astype(np.int64)
    if valid is not None:
        lens = np.where(valid, lens, 0)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    seeds = ((doc_idx.astype(np.uint64) * np.uint64(_MIX)
              + ts.astype(np.uint64) * np.uint64(97)) % np.uint64(TOKEN_VOCAB)).astype(np.int64)
    j = np.arange(offsets[-1], dtype=np.int64) - np.repeat(offsets[:-1], lens)
    values = ((np.repeat(seeds, lens) + j * 7) % TOKEN_VOCAB).astype(np.int32)
    mask = None
    if valid is not None:
        mask = pa.array(~valid)  # True = null in from_arrays mask convention
    if offsets[-1] > np.iinfo(np.int32).max:
        raise OverflowError(
            f"token list offsets overflow int32 ({offsets[-1]}); "
            "split the segment into smaller chunks")
    arr = pa.ListArray.from_arrays(pa.array(offsets.astype(np.int32)),
                                   pa.array(values), mask=mask)
    out_lens = lens.astype(np.int32)
    if valid is not None:
        out_lens = np.where(valid, out_lens, -1).astype(np.int32)
    return arr, out_lens


def _source_for(doc_idx: np.ndarray) -> np.ndarray:
    # skewed categorical, deterministic per doc
    cut = (np.cumsum(_SOURCE_P) * 1000).astype(np.int64)
    h = (doc_idx * 40503) % 1000
    return _SOURCES[np.searchsorted(cut, h, side="right")]


def _lang_for(doc_idx: np.ndarray) -> np.ndarray:
    return _LANGS[(doc_idx * 31) % len(_LANGS)]


# ---------------------------------------------------------------------------
# Base lake
# ---------------------------------------------------------------------------

def generate_base(root: str, n_docs: int, num_partitions: int,
                  max_len: int = 256) -> None:
    """Write base/part={p}/base.parquet, hash-co-partitioned on doc_id."""
    doc_idx = np.arange(n_docs, dtype=np.int64)
    ids = doc_name(doc_idx)
    parts = hash_partition(ids, num_partitions)
    ts0 = np.zeros(n_docs, dtype=np.int64)
    for p in range(num_partitions):
        m = parts == p
        di = doc_idx[m]
        toks, lens = _tokens_list_array(di, ts0[: m.sum()], max_len)
        t = pa.table({
            "doc_id": pa.array(ids[m]),
            "tokens": toks,
            "n_tok": pa.array(lens),
            "source": pa.array(_source_for(di)),
        })
        d = os.path.join(root, "base", f"part={p}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(t, os.path.join(d, "base.parquet"))


def base_image_table(doc_idx: np.ndarray, max_len: int = 256) -> pa.Table:
    """The v1 base image rows for given doc indexes (used by the oracle)."""
    toks, lens = _tokens_list_array(doc_idx, np.zeros(len(doc_idx), np.int64), max_len)
    return pa.table({
        "doc_id": pa.array(doc_name(doc_idx)),
        "tokens": toks,
        "n_tok": pa.array(lens),
        "source": pa.array(_source_for(doc_idx)),
    })


# ---------------------------------------------------------------------------
# WAL change stream
# ---------------------------------------------------------------------------

@dataclass
class WalSpec:
    n_docs: int
    n_events: int
    n_segments: int
    seed: int = 42
    max_len: int = 256
    hot_frac: float = 0.01          # fraction of active docs that are hot
    hot_share: float = 0.5          # share of events that land on hot docs
    move_frac: float = 0.005        # identity-changing updates
    include_pre: bool = True        # populate pre_tokens old images
    ts_lo: int = 1_000
    ts_hi: int = 1_000_000_000


def plan_ddls(spec: WalSpec, kinds: tuple[str, ...] = ("add_lang", "drop_source")) -> SchemaRegistry:
    """A small deterministic DDL schedule at fixed ts quantiles."""
    ddls = []
    span = spec.ts_hi - spec.ts_lo
    qs = {"add_lang": 0.45, "drop_source": 0.75}
    ver = 2
    for k in kinds:
        bts = int(spec.ts_lo + qs[k] * span)
        if k == "add_lang":
            ddls.append(DDL(bts, "add_column", "lang:string", "und", ver))
        elif k == "drop_source":
            ddls.append(DDL(bts, "drop_column", "source", None, ver))
        ver += 1
    return SchemaRegistry(ddls)


def generate_wal(root: str, spec: WalSpec, registry: SchemaRegistry) -> list[dict]:
    """Write wal/seq={s}.parquet + wal/seq={s}.meta.json; returns metas."""
    rng = np.random.default_rng(spec.seed)
    n_active = max(1, min(spec.n_docs, spec.n_events // 3))
    active = rng.choice(spec.n_docs, size=n_active, replace=False)
    # also some brand-new docs (pure inserts), ~10% of active set
    n_new = max(1, n_active // 10)
    new_docs = np.arange(spec.n_docs, spec.n_docs + n_new, dtype=np.int64)
    docs = np.concatenate([active, new_docs])
    in_base = np.concatenate([np.ones(n_active, bool), np.zeros(n_new, bool)])

    # event counts per doc with hot-key skew
    n_hot = max(1, int(len(docs) * spec.hot_frac))
    hot_sel = rng.choice(len(docs), size=n_hot, replace=False)
    w = np.ones(len(docs))
    w[hot_sel] = spec.hot_share * (len(docs) - n_hot) / max(1e-9, (1 - spec.hot_share) * n_hot)
    p = w / w.sum()
    counts = rng.multinomial(spec.n_events, p)

    # per-doc legal op chains, vectorized over chain position
    max_m = int(counts.max())
    alive = in_base.copy()
    ops_by_pos: list[np.ndarray] = []
    sel_by_pos: list[np.ndarray] = []
    for j in range(max_m):
        sel = np.flatnonzero(counts > j)
        if len(sel) == 0:
            break
        a = alive[sel]
        u = rng.random(len(sel))
        op = np.where(a, np.where(u < 0.25, OP_DELETE, OP_UPDATE), OP_INSERT).astype(np.uint8)
        alive[sel] = op != OP_DELETE
        ops_by_pos.append(op)
        sel_by_pos.append(sel)

    doc_of = np.concatenate([docs[s] for s in sel_by_pos])
    pos_of = np.concatenate([np.full(len(s), j) for j, s in enumerate(sel_by_pos)])
    op_of = np.concatenate(ops_by_pos)
    n_ev = len(doc_of)

    # assign commit_ts: random ts, sorted within each doc, strictly increasing
    order = np.lexsort((pos_of, doc_of))
    doc_s, pos_s, op_s = doc_of[order], pos_of[order], op_of[order]
    ts_raw = rng.integers(spec.ts_lo, spec.ts_hi, size=n_ev, dtype=np.int64)
    ts_sorted_within_doc = ts_raw[np.lexsort((ts_raw, doc_of))]
    cts = ts_sorted_within_doc + pos_s  # strict increase inside a doc
    sts = cts - 1 - rng.integers(0, 50, size=n_ev, dtype=np.int64)

    # same-ts delete+insert pairs (re-insert txns): D at pos j, I at pos j+1
    same_doc_next = np.zeros(n_ev, bool)
    same_doc_next[:-1] = doc_s[:-1] == doc_s[1:]
    di = np.flatnonzero(same_doc_next[:-1] & (op_s[:-1] == OP_DELETE))
    di = di[op_s[di + 1] == OP_INSERT]
    di = di[rng.random(len(di)) < 0.5]
    cts[di + 1] = cts[di]
    sts[di + 1] = sts[di]

    # identity-changing updates: only as the LAST event of a doc's chain
    is_last = np.ones(n_ev, bool)
    is_last[:-1] = doc_s[:-1] != doc_s[1:]
    cand = np.flatnonzero(is_last & (op_s == OP_UPDATE))
    n_mov = int(round(len(cand) * spec.move_frac))
    mov = rng.choice(cand, size=min(n_mov, len(cand)), replace=False) if len(cand) else np.array([], int)
    new_doc = np.full(n_ev, None, dtype=object)
    mov_targets = np.arange(spec.n_docs + n_new, spec.n_docs + n_new + len(mov), dtype=np.int64)
    new_doc[mov] = doc_name(mov_targets)

    # previous image pointer (for pre_tokens): ts of previous I/U event,
    # 0 for first event of an in-base doc, -1 (no pre) otherwise
    prev_ts = np.full(n_ev, -1, dtype=np.int64)
    prev_ts[1:] = np.where(doc_s[1:] == doc_s[:-1], cts[:-1], -1)
    first = np.ones(n_ev, bool)
    first[1:] = doc_s[1:] != doc_s[:-1]
    prev_ts[first & np.isin(doc_s, docs[in_base], assume_unique=False)] = 0
    # an event right after a DELETE has no pre image (it's an insert)
    after_del = np.zeros(n_ev, bool)
    after_del[1:] = (doc_s[1:] == doc_s[:-1]) & (op_s[:-1] == OP_DELETE)
    prev_ts[after_del] = -1

    # vectorized version_at: 1 + count of barriers STRICTLY below commit_ts
    # (events at barrier_ts use the old schema, cdc/entry/mounter.go:158-160)
    if registry.ddls:
        b = np.array(registry.barriers(), dtype=np.int64)
        sver = (1 + (cts[:, None] > b[None, :]).sum(axis=1)).astype(np.int32)
    else:
        sver = np.ones(n_ev, np.int32)

    # segment split on global commit_ts order, ties kept together
    g = np.argsort(cts, kind="stable")
    bounds = [int(round(i * n_ev / spec.n_segments)) for i in range(1, spec.n_segments)]
    cts_g = cts[g]
    cuts = []
    for bidx in bounds:
        v = cts_g[min(bidx, n_ev - 1)]
        cuts.append(int(np.searchsorted(cts_g, v, side="left")))
    cuts = sorted(set(c for c in cuts if 0 < c < n_ev))
    seg_starts = [0] + cuts
    seg_ends = cuts + [n_ev]

    os.makedirs(os.path.join(root, "wal"), exist_ok=True)
    # one name table, indexed per segment (np.char formatting is slow)
    name_table = doc_name(np.arange(spec.n_docs + n_new + len(mov) + 1,
                                    dtype=np.int64))
    metas = []
    for s, (a, bnd) in enumerate(zip(seg_starts, seg_ends)):
        idx = g[a:bnd]
        idx = idx[rng.permutation(len(idx))]  # engine must sort
        t = _events_table(doc_s[idx], op_s[idx], cts[idx], sts[idx],
                          prev_ts[idx], new_doc[idx], sver[idx],
                          registry, spec, name_table)
        path = os.path.join(root, "wal", f"seq={s:05d}.parquet")
        pq.write_table(t, path, row_group_size=32768)
        meta = {"seq": s, "watermark_ts": int(cts_g[bnd - 1]),
                "min_ts": int(cts_g[a]), "max_ts": int(cts_g[bnd - 1]),
                "rows": int(bnd - a)}
        with open(os.path.join(root, "wal", f"seq={s:05d}.meta.json"), "w") as f:
            json.dump(meta, f)
        metas.append(meta)
    with open(os.path.join(root, "wal", "ddl.json"), "w") as f:
        f.write(registry.to_json())
    return metas


def _events_table(doc_idx, op, cts, sts, prev_ts, new_doc, sver,
                  registry: SchemaRegistry, spec: WalSpec,
                  name_table: np.ndarray | None = None) -> pa.Table:
    has_img = op != OP_DELETE
    toks, lens = _tokens_list_array(doc_idx, cts.astype(np.int64), spec.max_len,
                                    valid=has_img)
    n = len(doc_idx)
    names = (name_table[doc_idx] if name_table is not None
             else doc_name(doc_idx))
    cols: dict[str, pa.Array] = {
        "op": pa.array(op, pa.uint8()),
        "commit_ts": pa.array(cts.astype(np.uint64)),
        "start_ts": pa.array(np.maximum(sts, 0).astype(np.uint64)),
        "doc_id": pa.array(names),
        "tokens": toks,
        "n_tok": pa.array(np.where(has_img, lens, 0).astype(np.int32),
                          mask=~has_img),
        "source": pa.array(np.where(has_img, _source_for(doc_idx), None),
                           pa.string()),
    }
    # evolved columns present when any event in this file is at that version
    max_v = int(sver.max()) if n else 1
    for d in registry.ddls:
        if d.ddl_type == "add_column" and max_v >= d.schema_ver:
            live = has_img & (sver >= d.schema_ver)
            if d.col_name == "lang":
                vals = np.where(live, _lang_for(doc_idx), None)
            else:
                vals = np.where(live, d.default, None)
            cols[d.col_name] = pa.array(vals, d.col_type)
        if d.ddl_type == "drop_column" and d.col_name in cols and max_v >= d.schema_ver:
            base = cols[d.col_name].to_pandas().to_numpy(dtype=object)
            base[(sver >= d.schema_ver)] = None
            cols[d.col_name] = pa.array(base, cols[d.col_name].type)
    if spec.include_pre:
        has_pre = (prev_ts >= 0) & (op != OP_INSERT)
        pre, _ = _tokens_list_array(doc_idx, np.maximum(prev_ts, 0),
                                    spec.max_len, valid=has_pre)
        cols["pre_tokens"] = pre
    else:
        cols["pre_tokens"] = pa.nulls(n, pa.list_(pa.int32()))
    cols["new_doc_id"] = pa.array(new_doc, pa.string())
    cols["schema_ver"] = pa.array(sver, pa.int32())
    return pa.table(cols)


def write_segment_payload(seg: pa.Table, wal_dir: str, seq: int, fmt: str,
                          codec_opts: dict | None = None) -> None:
    """Encode ONE segment table into its change-file under wal_dir (every
    supported codec; filename extension matches sources.wal.list_segments)."""
    if fmt == "parquet":
        # modest row groups: Ray parallelizes parquet reads at row-group
        # granularity, so a handful of big segments still fans out wide
        pq.write_table(seg, os.path.join(wal_dir, f"seq={seq:05d}.parquet"),
                       row_group_size=32768)
        return
    if fmt == "jsonl":
        with open(os.path.join(wal_dir, f"seq={seq:05d}.jsonl"), "w") as f:
            for row in seg.to_pylist():
                f.write(json.dumps(row) + "\n")
        return
    from .sources import codecs as C
    text_encoders = {"csv": None, "canal_json": C.encode_canal_json,
                     "debezium": C.encode_debezium,
                     "open_protocol": C.encode_open_protocol,
                     "maxwell": C.encode_maxwell, "simple": C.encode_simple}
    exts = {"csv": ".csv", "canal_json": ".canal.jsonl",
            "debezium": ".dbz.jsonl", "open_protocol": ".open.jsonl",
            "maxwell": ".maxwell.jsonl", "simple": ".simple.jsonl",
            "avro": ".avro", "craft": ".craft", "mysql_binlog": ".binlog"}
    if fmt in text_encoders:
        text = C.encode_csv(seg)[0] if fmt == "csv" \
            else text_encoders[fmt](seg)
        with open(os.path.join(wal_dir, f"seq={seq:05d}{exts[fmt]}"),
                  "w") as f:
            f.write(text)
    elif fmt == "avro":
        with open(os.path.join(wal_dir, f"seq={seq:05d}.avro"), "wb") as f:
            f.write(C.encode_avro(seg))
    elif fmt == "craft":
        with open(os.path.join(wal_dir, f"seq={seq:05d}.craft"), "wb") as f:
            f.write(C.encode_craft(seg))
    elif fmt == "mysql_binlog":
        with open(os.path.join(wal_dir, f"seq={seq:05d}.binlog"), "wb") as f:
            f.write(C.encode_mysql_binlog(seg, **(codec_opts or {})))
    else:
        raise ValueError(f"unknown wal format {fmt}")


def _binlog_ddl_slice(registry, lo: int | None, hi: int, last: bool,
                      codec_opts: dict | None) -> dict:
    """codec_opts carrying the DDLs whose barrier falls in this segment's
    (lo, hi] watermark window — DDL travels IN the binlog stream, where
    MySQL puts it, so a relayed dir is self-describing with no side-band
    ddl.json (sources/repl_protocol.index_binlog_dir rebuilds it). The
    last segment also takes barriers past the final watermark."""
    import types
    ddls = [] if registry is None else \
        [d for d in registry.ddls
         if (lo is None or d.barrier_ts > lo) and (last or d.barrier_ts <= hi)]
    opts = dict(codec_opts or {})
    opts["registry"] = types.SimpleNamespace(ddls=ddls)
    return opts


def _binlog_gtid_chain(opts: dict, seg: pa.Table, running: int) -> int:
    """Chain dense gnos across segment files when codec_opts asks for
    GTID mode ({"gtid": True}): this segment starts after `running`
    transactions; returns the new running count. PREVIOUS_GTIDS in each
    file carries the prior set, so a GTID dump can pick its start file
    without decoding rows (dm resume-by-gtid, dm/pkg/gtid)."""
    from .sources.codecs import binlog_txn_count
    if not opts.pop("gtid", False):
        return running
    opts["gtid_start"] = running
    return running + binlog_txn_count(seg, opts["registry"])


def transcode_wal(src_wal: str, dst_wal: str, fmt: str,
                  codec_opts: dict | None = None) -> list[dict]:
    """Re-encode an existing parquet WAL segment-by-segment into another
    change-file format, preserving seq numbers, watermarks and each
    segment's OWN column set — segments written before and after a DDL
    barrier carry different columns (the storage sink rewrites its schema
    file per DDL, pkg/sink/cloudstorage/table_definition.go), and a
    whole-stream rewrite would erase that. This is the relay direction
    (dm/relay persists the upstream stream as local files 1:1, without
    re-batching). Copies ddl.json; returns the new metas."""
    import shutil

    from .sources.wal import list_segments, load_registry
    os.makedirs(dst_wal, exist_ok=True)
    metas = []
    segments = list_segments(src_wal)
    reg = load_registry(src_wal)
    gtid_running = 0
    for i, s in enumerate(segments):
        assert s.format == "parquet", f"transcode source must be parquet: {s}"
        seg = pq.read_table(s.path)
        opts = codec_opts
        if fmt == "mysql_binlog" and (codec_opts or {}).get("registry") is None:
            opts = _binlog_ddl_slice(
                reg, None if i == 0 else segments[i - 1].watermark_ts,
                s.watermark_ts, i == len(segments) - 1, codec_opts)
            gtid_running = _binlog_gtid_chain(opts, seg, gtid_running)
        write_segment_payload(seg, dst_wal, s.seq, fmt, opts)
        meta = {"seq": s.seq, "watermark_ts": s.watermark_ts,
                "min_ts": s.min_ts, "max_ts": s.max_ts, "rows": s.rows,
                "format": fmt, "columns": list(seg.column_names)}
        with open(os.path.join(dst_wal, f"seq={s.seq:05d}.meta.json"),
                  "w") as f:
            json.dump(meta, f)
        metas.append(meta)
    ddl = os.path.join(src_wal, "ddl.json")
    if os.path.exists(ddl):
        shutil.copyfile(ddl, os.path.join(dst_wal, "ddl.json"))
    return metas


def write_wal_segments(t: pa.Table, wal_dir: str, n_segments: int,
                       registry: SchemaRegistry | None = None,
                       fmt: str = "parquet",
                       codec_opts: dict | None = None) -> list[dict]:
    """Write an arbitrary event-schema table as resolved-ts-delimited WAL
    segments (sorted split on commit_ts, ties never cross a boundary) +
    metas + ddl.json. fmt="jsonl" emits canal-json-style line-delimited
    change files (M9/M10 codec analog; test-scale only)."""
    import pyarrow.compute as pc

    os.makedirs(wal_dir, exist_ok=True)
    idx = pc.sort_indices(t, sort_keys=[("commit_ts", "ascending")])
    t = t.take(idx)
    cts = t["commit_ts"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(cts)
    cuts = []
    for i in range(1, n_segments):
        v = cts[min(int(round(i * n / n_segments)), n - 1)]
        cuts.append(int(np.searchsorted(cts, v, side="left")))
    cuts = sorted({c for c in cuts if 0 < c < n})
    starts, ends = [0] + cuts, cuts + [n]
    metas = []
    gtid_running = 0
    for s, (a, b) in enumerate(zip(starts, ends)):
        seg = t.slice(a, b - a)
        opts = codec_opts
        if fmt == "mysql_binlog" and (codec_opts or {}).get("registry") is None:
            opts = _binlog_ddl_slice(registry,
                                     None if s == 0 else int(cts[a - 1]),
                                     int(cts[b - 1]), b == n, codec_opts)
            gtid_running = _binlog_gtid_chain(opts, seg, gtid_running)
        write_segment_payload(seg, wal_dir, s, fmt, opts)
        meta = {"seq": s, "watermark_ts": int(cts[b - 1]),
                "min_ts": int(cts[a]), "max_ts": int(cts[b - 1]),
                "rows": int(b - a), "format": fmt,
                "columns": list(t.column_names)}
        with open(os.path.join(wal_dir, f"seq={s:05d}.meta.json"), "w") as f:
            json.dump(meta, f)
        metas.append(meta)
    with open(os.path.join(wal_dir, "ddl.json"), "w") as f:
        f.write((registry or SchemaRegistry([])).to_json())
    return metas


def write_heartbeat_segment(wal_dir: str, watermark_ts: int) -> dict:
    """A resolved-ts-only heartbeat: a zero-row segment whose watermark
    advances the frontier with no data (the puller's resolved-ts event,
    cdc/model/kv.go OpTypeResolved analog) — lets downstream checkpoints
    progress through quiet spans."""
    from .model import event_schema
    seqs = [int(os.path.basename(p).split("=")[1].split(".")[0])
            for p in __import__("glob").glob(os.path.join(wal_dir, "seq=*.meta.json"))]
    s = (max(seqs) + 1) if seqs else 0
    empty = event_schema().empty_table()
    pq.write_table(empty, os.path.join(wal_dir, f"seq={s:05d}.parquet"))
    meta = {"seq": s, "watermark_ts": int(watermark_ts),
            "min_ts": int(watermark_ts), "max_ts": int(watermark_ts),
            "rows": 0, "format": "parquet",
            "columns": [f.name for f in event_schema()]}
    with open(os.path.join(wal_dir, f"seq={s:05d}.meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def write_base_partitioned(base: pa.Table, root: str, num_partitions: int,
                           collation: str = "binary") -> None:
    """Hash-co-partition an arbitrary base-schema table into
    base/part={p}/base.parquet (the lake bootstrap layout). `collation`
    must match the replaying config's key_collation (ci lakes partition
    by the lower-cased key)."""
    from .model import collation_key
    parts = hash_partition(collation_key(base["doc_id"], collation),
                           num_partitions)
    base = base.append_column("__part", pa.array(parts))
    for p in range(num_partitions):
        sub = base.filter(pa.compute.equal(base["__part"], p)).drop_columns(["__part"])
        d = os.path.join(root, "base", f"part={p}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(sub, os.path.join(d, "base.parquet"))


# ---------------------------------------------------------------------------
# Tiers (FIXTURES.md §5)
# ---------------------------------------------------------------------------

TIERS = {
    "t1": dict(n_docs=1_000, n_events=5_000, n_segments=4, num_partitions=8,
               max_len=64, ddls=("add_lang", "drop_source")),
    "t1_noddl": dict(n_docs=1_000, n_events=5_000, n_segments=4, num_partitions=8,
                     max_len=64, ddls=()),
    "t2": dict(n_docs=50_000, n_events=250_000, n_segments=16, num_partitions=16,
               max_len=128, ddls=("add_lang", "drop_source")),
    "bench": dict(n_docs=2_000_000, n_events=20_000_000, n_segments=32,
                  num_partitions=64, max_len=64, ddls=(), include_pre=False),
}


def generate_tier(root: str, tier: str, seed: int = 42,
                  **overrides) -> tuple[SchemaRegistry, list[dict], dict]:
    cfg = dict(TIERS[tier])
    cfg.update(overrides)
    P = cfg.pop("num_partitions")
    ddl_kinds = cfg.pop("ddls")
    spec = WalSpec(n_docs=cfg.pop("n_docs"), n_events=cfg.pop("n_events"),
                   n_segments=cfg.pop("n_segments"), seed=seed, **cfg)
    registry = plan_ddls(spec, tuple(ddl_kinds)) if ddl_kinds else SchemaRegistry([])
    os.makedirs(root, exist_ok=True)
    generate_base(root, spec.n_docs, P, spec.max_len)
    metas = generate_wal(root, spec, registry)
    info = {"tier": tier, "num_partitions": P, "n_docs": spec.n_docs,
            "n_events": spec.n_events, "seed": seed, "max_len": spec.max_len}
    with open(os.path.join(root, "fixture.json"), "w") as f:
        json.dump(info, f)
    return registry, metas, info
