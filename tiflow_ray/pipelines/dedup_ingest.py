"""Incremental (streaming) corpus dedup against a persistent key index —
the dedup analog of the CDC epoch engine: a crawl/ingest pipeline never
sees the corpus at once, so "exact dedup" must mean "drop every doc whose
key was seen in ANY earlier ingest epoch", with exactly-once semantics
across crashes and re-runs.

Design (the same shapes as the replay sink, stages/merge.py +
state/checkpoint.py):

* the index is HASH-PARTITIONED by dedup key (`part={p}/`), so one ingest
  epoch is ONE shuffle of the new docs plus P independent partition tasks
  — a task reads only its partition's key set, never the whole index;
* each epoch appends one `keys-{epoch:06d}.parquet` DELTA per touched
  partition (MoR-style append-only; rewrite-in-place would make a crashed
  task corrupt history);
* task writes are tmp→rename idempotent; the driver commits
  `_manifest/epoch-{n}.json` LAST — a crash before commit leaves deltas
  that the retried epoch simply overwrites (same filenames, same
  content: the winner choice is deterministic);
* re-ingesting an already-committed epoch id is a no-op (the manifest is
  the dedup ledger of the pipeline itself).

At 100 TB the index is the distinct-key set — far smaller than the
corpus, spread over P partitions; raise P with corpus size (the same
`repartition_lake` math applies). Returns the NOVEL docs per epoch — the
stream a training pipeline actually wants.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def _manifest_path(index_dir: str, epoch_id: int) -> str:
    return os.path.join(index_dir, "_manifest", f"epoch-{epoch_id:06d}.json")


def committed_epochs(index_dir: str) -> list[int]:
    return sorted(int(os.path.basename(p)[6:-5]) for p in
                  glob.glob(os.path.join(index_dir, "_manifest",
                                         "epoch-*.json")))


def compact_horizon(index_dir: str) -> int:
    """Highest committed compaction horizon: every committed delta with
    epoch <= horizon is folded into the per-partition base file. -1 = no
    compaction has ever committed."""
    hs = [int(os.path.basename(p)[8:-5]) for p in
          glob.glob(os.path.join(index_dir, "_manifest", "compact-*.json"))]
    return max(hs, default=-1)


_DELTA_GLOB = "-[0-9][0-9][0-9][0-9][0-9][0-9].parquet"


def _partition_files(pdir: str, prefix: str, visible: set[int],
                     horizon: int) -> list[str]:
    """The authoritative files of one index partition: the committed base
    (covers every committed epoch <= horizon) plus the committed deltas
    newer than it. Uncommitted leftovers (crashed epochs, folded-but-not-
    yet-deleted deltas) are skipped either way."""
    out = []
    if horizon >= 0:
        base = os.path.join(pdir, f"{prefix}-base-{horizon:06d}.parquet")
        if os.path.exists(base):
            out.append(base)
    for f in sorted(glob.glob(os.path.join(pdir, prefix + _DELTA_GLOB))):
        e = int(os.path.basename(f)[len(prefix) + 1:-8])
        if e in visible and e > horizon:
            out.append(f)
    return out


# natural sort keys per index kind — compaction output must be
# DETERMINISTIC (a retried crash re-writes byte-identical bases)
_INDEX_SORT = {"keys": ["dedup_key"],
               "bands": ["band", "band_hash", "doc_id"],
               "lsh": ["tbl", "bucket", "vec_id"]}


def compact_index(index_dir: str) -> dict:
    """Fold every partition's committed delta chain into ONE base file per
    partition (the compact_lake analog for ingest indexes; reference shape:
    the db-sorter's compaction, docs/design/2022-03-16-ticdc-db-sorter.md).

    Without this, each ingest epoch re-reads O(#epochs) delta files — the
    chain itself becomes the bottleneck after ~10^4 epochs. After
    compaction a partition task reads exactly one base + the deltas landed
    since the last compaction.

    Protocol (same crash discipline as the epochs):
      1. per partition, write `{prefix}-base-{h:06d}.parquet` = sorted
         union of the current base and all committed deltas <= h
         (tmp→rename; content deterministic, retry overwrites);
      2. driver commits `_manifest/compact-{h:06d}.json` LAST;
      3. only then delete the folded files (a crash mid-delete leaves
         garbage that readers already skip — re-running compact_index
         sweeps it).
    Not concurrency-safe with a running ingest epoch of the SAME index —
    run it between epochs (it's a maintenance job, like compact_lake)."""
    committed = committed_epochs(index_dir)
    if not committed:
        return {"horizon": -1, "partitions": 0, "folded_files": 0}
    h = committed[-1]
    visible = set(committed)
    old_h = compact_horizon(index_dir)
    pdirs = sorted(glob.glob(os.path.join(index_dir, "part=*")))

    def compact_partition_dir(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        counts = []
        for pdir in t["pdir"].to_pylist():
            folded = 0
            for prefix, sort_cols in _INDEX_SORT.items():
                files = _partition_files(pdir, prefix, visible, old_h)
                if not files:
                    continue
                dst = os.path.join(pdir, f"{prefix}-base-{h:06d}.parquet")
                if [dst] == files:      # already fully compacted
                    continue
                tbl = pa.concat_tables(
                    [pq.read_table(f) for f in files],
                    promote_options="default")
                tbl = tbl.take(pc.sort_indices(
                    tbl, sort_keys=[(c, "ascending") for c in sort_cols]))
                tmp = dst + f".tmp.{os.getpid()}"
                pq.write_table(tbl, tmp, row_group_size=65536)
                os.replace(tmp, dst)
                folded += len(files)
            counts.append(folded)
        return pa.table({"pdir": t["pdir"],
                         "folded": pa.array(counts, pa.int64())})

    total_folded = 0
    if pdirs:
        stats = ray.data.from_items([{"pdir": d} for d in pdirs],
                                    override_num_blocks=len(pdirs)) \
            .map_batches(compact_partition_dir, batch_format="pyarrow",
                         batch_size=1).take_all()
        total_folded = sum(r["folded"] for r in stats)

    # commit point
    mdir = os.path.join(index_dir, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    mp = os.path.join(mdir, f"compact-{h:06d}.json")
    with open(mp + ".tmp", "w") as f:
        json.dump({"horizon": h, "prev_horizon": old_h,
                   "partitions": len(pdirs)}, f)
    os.replace(mp + ".tmp", mp)

    # sweep the folded (now-unreferenced) files: every delta <= h and any
    # superseded base; leftover crashed-epoch deltas <= h are dead too
    # (their epoch id can never commit — ids are strictly increasing)
    removed = 0
    for pdir in pdirs:
        for prefix in _INDEX_SORT:
            for f in glob.glob(os.path.join(pdir, prefix + _DELTA_GLOB)):
                if int(os.path.basename(f)[len(prefix) + 1:-8]) <= h:
                    os.remove(f)
                    removed += 1
            for f in glob.glob(os.path.join(
                    pdir, f"{prefix}-base-*.parquet")):
                if int(os.path.basename(f)[len(prefix) + 6:-8]) < h:
                    os.remove(f)
                    removed += 1
            for f in glob.glob(os.path.join(pdir, "*.tmp.*")):
                os.remove(f)
                removed += 1
    return {"horizon": h, "partitions": len(pdirs),
            "folded_files": total_folded, "removed_files": removed}


def ingest_epoch(ds: "ray.data.Dataset", index_dir: str, epoch_id: int,
                 num_partitions: int = 16,
                 key_fn=None) -> "ray.data.Dataset | None":
    """Dedup one ingest epoch of docs (columns doc_id, text) against the
    persistent index; returns the novel docs (doc_id, dedup_key) as a
    Dataset, or None if this epoch id already committed (idempotent)."""
    from ..functions.dedup import exact_dedup_key

    if os.path.exists(_manifest_path(index_dir, epoch_id)):
        return None
    committed = committed_epochs(index_dir)
    assert all(e < epoch_id for e in committed), \
        f"epoch {epoch_id} must be newer than committed {committed[-1:]}"
    key_fn = key_fn or exact_dedup_key
    os.makedirs(os.path.join(index_dir, "_manifest"), exist_ok=True)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        keyed = key_fn(df)
        h = pd.util.hash_array(keyed["dedup_key"].to_numpy(),
                               categorize=False)
        return keyed.assign(part=(h % num_partitions).astype("int64"))

    visible = set(committed)
    horizon = compact_horizon(index_dir)

    def dedup_partition(g: pd.DataFrame) -> pd.DataFrame:
        """One partition's task: batch-local first-wins, then drop keys
        already in THIS partition's committed chain (compacted base +
        committed deltas — uncommitted leftovers from a crashed epoch
        must not suppress docs), then append this epoch's novel keys as
        one delta (tmp→rename, idempotent — deterministic content, fixed
        filename)."""
        p = int(g["part"].iloc[0])
        pdir = os.path.join(index_dir, f"part={p}")
        os.makedirs(pdir, exist_ok=True)
        g = g.sort_values(["dedup_key", "doc_id"], kind="mergesort") \
             .drop_duplicates("dedup_key")
        seen_parts = [pq.read_table(f, columns=["dedup_key"])
                      for f in _partition_files(pdir, "keys", visible,
                                                horizon)]
        if seen_parts:
            seen = pa.concat_tables(seen_parts)["dedup_key"] \
                .to_numpy(zero_copy_only=False)
            g = g[~g["dedup_key"].isin(seen)]
        novel = g[["doc_id", "dedup_key"]].reset_index(drop=True)
        dst = os.path.join(pdir, f"keys-{epoch_id:06d}.parquet")
        tmp = dst + f".tmp.{os.getpid()}"
        pq.write_table(pa.table({
            "dedup_key": pa.array(novel["dedup_key"].to_numpy(), pa.string()),
        }), tmp, row_group_size=65536)
        os.replace(tmp, dst)
        return novel

    novel = ds.map_batches(add_part, batch_format="pandas") \
        .groupby("part").map_groups(dedup_partition, batch_format="pandas")
    novel = novel.materialize()     # deltas durable before the commit
    meta = {"epoch": epoch_id, "novel_docs": novel.count(),
            "num_partitions": num_partitions}
    mp = _manifest_path(index_dir, epoch_id)
    with open(mp + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(mp + ".tmp", mp)     # commit point
    return novel


def index_keys(index_dir: str) -> "ray.data.Dataset":
    """All committed keys (for audits): compacted base + committed deltas."""
    visible = set(committed_epochs(index_dir))
    horizon = compact_horizon(index_dir)
    files = []
    for pdir in sorted(glob.glob(os.path.join(index_dir, "part=*"))):
        files.extend(_partition_files(pdir, "keys", visible, horizon))
    return ray.data.read_parquet(files)


# ---------------------------------------------------------------------------
# Incremental NEAR-dup dedup against a persistent MinHash band index —
# exact-key dedup above catches byte-identical re-crawls; this catches the
# near-copies (boilerplate edits, tracking-parameter URLs, one-word diffs)
# that dominate real crawl streams. Same manifest/delta/idempotence scheme.
#
# Shape per epoch (two thin shuffles, no joins back to any corpus text):
#   docs → MinHashBandSig rows (band, band_hash, full packed signature)
#        → shuffle by hash(band, band_hash) % P
#        → per partition: bucket-match vs COMMITTED index rows (signature-
#          agreement ≥ threshold = estimated Jaccard, Broder 1997) and vs
#          smaller-doc_id epoch-mates; append this epoch's rows as one
#          idempotent delta
#        → thin (doc_id, matched) verdicts → per-doc ANY across partitions
#   driver commits the manifest LAST (crash before commit = clean retry).
#
# The index stores only WINNERS' band rows by default (keep_only=True): a
# post-verdict trim pass rewrites the epoch's deltas minus this epoch's
# dup doc_ids (broadcast once), bounding index growth by the DISTINCT set
# instead of the corpus. keep_only=False retains every doc's rows —
# verdicts then never depend on a cross-epoch "who won" transitivity.
# Either way, committed delta chains fold into per-partition bases via
# compact_index() so a partition task reads O(1) files, not O(#epochs).
# ---------------------------------------------------------------------------


def _trim_epoch_deltas(verdicts: "ray.data.Dataset", index_dir: str,
                       epoch_id: int, prefix: str, id_col: str,
                       num_partitions: int) -> bool:
    """Keep-only trim shared by the MinHash and embedding ingests:
    rewrite each touched partition's epoch delta keeping only winners'
    rows (this epoch's dup ids broadcast once via ray.put — epoch-scale,
    gated by TIFLOW_INGEST_KEEPONLY_BYTES like the MinHash collect
    gate). Crash safety: the trim runs BEFORE the manifest commit, so a
    crash mid-trim leaves mixed full/trimmed deltas that the retried
    epoch deterministically overwrites (full) and re-trims. Returns
    whether the trim ran."""
    dup_ids = np.concatenate(
        [b[id_col].to_numpy() for b in verdicts.map_batches(
            lambda t: t.filter(t["is_dup"]), batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")]
        or [np.empty(0, np.int64)])
    budget = int(os.environ.get("TIFLOW_INGEST_KEEPONLY_BYTES", 2 ** 28))
    if len(dup_ids) == 0 or dup_ids.nbytes > budget:
        return False
    ref = ray.put(np.sort(dup_ids))

    def trim(t: pa.Table) -> pa.Table:
        dup = ray.get(ref)
        removed = []
        for p in t["part"].to_pylist():
            f = os.path.join(index_dir, f"part={p}",
                             f"{prefix}-{epoch_id:06d}.parquet")
            if not os.path.exists(f):
                removed.append(0)
                continue
            tb = pq.read_table(f)
            ids = tb[id_col].to_numpy()
            keep = ~np.isin(ids, dup)
            if keep.all():
                removed.append(0)
                continue
            tmp = f + f".tmp.{os.getpid()}"
            pq.write_table(tb.filter(pa.array(keep)), tmp,
                           row_group_size=65536)
            os.replace(tmp, f)
            removed.append(int((~keep).sum()))
        return pa.table({"part": t["part"],
                         "removed": pa.array(removed, pa.int64())})

    ray.data.from_items(
        [{"part": p} for p in range(num_partitions)],
        override_num_blocks=num_partitions) \
        .map_batches(trim, batch_format="pyarrow",
                     batch_size=1).materialize()
    return True


def minhash_ingest_epoch(ds: "ray.data.Dataset", index_dir: str,
                         epoch_id: int, num_partitions: int = 16,
                         num_perm: int = 32, bands: int = 8,
                         sim_threshold: float = 0.7,
                         max_bucket: int = 64,
                         keep_only: bool = True
                         ) -> "ray.data.Dataset | None":
    """Near-dup-dedup one ingest epoch (columns doc_id, text) against the
    persistent MinHash band index; returns (doc_id, is_dup) verdicts as a
    Dataset, or None if this epoch id already committed (idempotent).

    `keep_only` (default): after the epoch's verdicts settle, the epoch's
    deltas are trimmed to WINNERS' band rows only, so the index grows with
    the distinct set, not the corpus — at crawl-scale dup rates the
    difference is the whole ballgame. The tradeoff: a future doc matches
    only retained winners, so a near-copy of a dropped dup must transit
    via its winner (the standard keep-only approximation; exact at
    sim=1.0, negligible at high thresholds). Verdicts within this epoch
    are computed BEFORE the trim and are unaffected."""
    from ..functions.dedup import MinHashBandSig, sig_agreement

    if os.path.exists(_manifest_path(index_dir, epoch_id)):
        return None
    committed = committed_epochs(index_dir)
    assert all(e < epoch_id for e in committed), \
        f"epoch {epoch_id} must be newer than committed {committed[-1:]}"
    os.makedirs(os.path.join(index_dir, "_manifest"), exist_ok=True)
    visible = set(committed)
    horizon = compact_horizon(index_dir)

    stage = MinHashBandSig(num_perm=num_perm, bands=bands)

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = stage(df)
        h = pd.util.hash_array(
            (out["band_hash"].to_numpy().astype(np.uint64)
             * np.uint64(31) + out["band"].to_numpy().astype(np.uint64)),
            categorize=False)
        return out.assign(part=(h % num_partitions).astype("int64"))

    def dedup_partition(g: pd.DataFrame) -> pd.DataFrame:
        p = int(g["part"].iloc[0])
        pdir = os.path.join(index_dir, f"part={p}")
        os.makedirs(pdir, exist_ok=True)
        g = g.sort_values(["band", "band_hash", "doc_id"],
                          kind="mergesort").reset_index(drop=True)

        old_parts = [pq.read_table(f).to_pandas()
                     for f in _partition_files(pdir, "bands", visible,
                                               horizon)]
        matched = np.zeros(len(g), bool)

        if old_parts:
            old = pd.concat(old_parts, ignore_index=True)
            j = g.merge(old, on=["band", "band_hash"],
                        suffixes=("", "_old"))
            if len(j):
                sim = sig_agreement(j["sig"].to_numpy(),
                                    j["sig_old"].to_numpy(), num_perm)
                hit_ids = np.unique(
                    j["doc_id"].to_numpy()[sim >= sim_threshold])
                matched |= g["doc_id"].isin(hit_ids).to_numpy()

        # epoch-mates: within each bucket, a doc matches if ANY
        # smaller-doc_id mate agrees (first-wins); bucket scan capped like
        # pairs_from_buckets — giant buckets are near-identical anyway
        bh = g["band_hash"].to_numpy()
        bd = g["band"].to_numpy()
        cuts = np.flatnonzero(np.r_[True, (bh[1:] != bh[:-1])
                                    | (bd[1:] != bd[:-1])])
        ends = np.r_[cuts[1:], len(g)]
        sigs = g["sig"].to_numpy()
        for s, e in zip(cuts, ends):
            m = min(e - s, max_bucket)
            if m < 2:
                continue
            for i in range(s + 1, s + m):   # doc_id-sorted: earlier wins
                mate = np.empty(i - s, object)
                mate[:] = sigs[i]           # np.repeat would EXPLODE bytes
                sim = sig_agreement(sigs[s:i], mate, num_perm)
                if (sim >= sim_threshold).any():
                    matched[i] = True

        dst = os.path.join(pdir, f"bands-{epoch_id:06d}.parquet")
        tmp = dst + f".tmp.{os.getpid()}"
        pq.write_table(pa.table({
            "band": pa.array(bd, pa.int64()),
            "band_hash": pa.array(bh, pa.int64()),
            "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
            "sig": pa.array(list(sigs), pa.binary()),
        }), tmp, row_group_size=65536)
        os.replace(tmp, dst)
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                             "matched": matched})

    def verdicts(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc_id", as_index=False)["matched"].any()
        return pd.DataFrame({"doc_id": agg["doc_id"].to_numpy(),
                             "is_dup": agg["matched"].to_numpy()})

    per_band = ds.map_batches(band_rows, batch_format="pandas") \
        .groupby("part").map_groups(dedup_partition, batch_format="pandas")
    out = per_band.map_batches(
        lambda df: df.assign(vpart=(pd.util.hash_array(
            df["doc_id"].to_numpy()) % num_partitions).astype("int64")),
        batch_format="pandas") \
        .groupby("vpart").map_groups(
            lambda g: verdicts(g.drop(columns=["vpart"])),
            batch_format="pandas")
    out = out.materialize()         # deltas durable before the commit
    n_dup = int(out.sum("is_dup") or 0)

    trimmed = _trim_epoch_deltas(out, index_dir, epoch_id, "bands",
                                 "doc_id", num_partitions) \
        if keep_only and n_dup else False

    meta = {"epoch": epoch_id, "docs": out.count(), "near_dups": n_dup,
            "num_partitions": num_partitions, "num_perm": num_perm,
            "bands": bands, "sim_threshold": sim_threshold,
            "keep_only": trimmed}
    mp = _manifest_path(index_dir, epoch_id)
    with open(mp + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(mp + ".tmp", mp)     # commit point
    return out


# ---------------------------------------------------------------------------
# Incremental EMBEDDING near-dup dedup against a persistent LSH index —
# the semantic sibling of the MinHash ingest above (SemDeDup-style: drop
# new docs whose embedding is ≥ tau cosine-similar to anything already
# ingested). Index rows are the (tbl, bucket, vec_id, packed float32
# embedding) explosion of functions/similarity.bucketize_for_screen, with
# (bits, tables) chosen from collision theory for the configured tau, so
# verdicts are one exact dot product per bucket collision — no re-read of
# any historical vector outside the colliding bucket.
# ---------------------------------------------------------------------------


def embed_ingest_epoch(ds: "ray.data.Dataset", index_dir: str,
                       epoch_id: int, num_partitions: int = 16,
                       tau: float = 0.9, target_recall: float = 0.95,
                       keep_only: bool = True
                       ) -> "ray.data.Dataset | None":
    """Near-dup-dedup one ingest epoch of embeddings (columns vec_id,
    embedding:list<float>) against the persistent LSH index; returns
    (vec_id, is_dup) verdicts, or None if this epoch already committed.

    `keep_only` (default): trim dup vectors' LSH rows from the epoch's
    deltas after verdicts settle — the index grows with the distinct set
    (same tradeoff and crash discipline as the MinHash twin; a future
    near-copy of a dropped dup matches via its retained winner, which at
    tau ≥ 0.9 it is ≥ (2·tau² − 1)-similar to)."""
    from ..functions.similarity import bucketize_for_screen

    if os.path.exists(_manifest_path(index_dir, epoch_id)):
        return None
    committed = committed_epochs(index_dir)
    assert all(e < epoch_id for e in committed), \
        f"epoch {epoch_id} must be newer than committed {committed[-1:]}"
    os.makedirs(os.path.join(index_dir, "_manifest"), exist_ok=True)
    visible = set(committed)
    horizon = compact_horizon(index_dir)

    import pyarrow as _pa

    def rows(t: _pa.Table) -> pd.DataFrame:
        out = bucketize_for_screen(t, tau, target_recall).to_pandas()
        h = pd.util.hash_array(
            (out["bucket"].to_numpy().astype(np.uint64) * np.uint64(131)
             + out["tbl"].to_numpy().astype(np.uint64)), categorize=False)
        return out.assign(part=(h % num_partitions).astype("int64"))

    def _mat(col) -> np.ndarray:
        if len(col) == 0:
            return np.empty((0, 0), np.float32)
        flat = np.frombuffer(b"".join(col), np.float32)
        return flat.reshape(len(col), -1)

    def dedup_partition(g: pd.DataFrame) -> pd.DataFrame:
        p = int(g["part"].iloc[0])
        pdir = os.path.join(index_dir, f"part={p}")
        os.makedirs(pdir, exist_ok=True)
        g = g.sort_values(["tbl", "bucket", "vec_id"],
                          kind="mergesort").reset_index(drop=True)
        matched = np.zeros(len(g), bool)

        old_parts = [pq.read_table(f).to_pandas()
                     for f in _partition_files(pdir, "lsh", visible,
                                               horizon)]
        if old_parts:
            old = pd.concat(old_parts, ignore_index=True)
            j = g.reset_index().merge(old, on=["tbl", "bucket"],
                                      suffixes=("", "_old"))
            if len(j):
                a = _mat(j["emb"].to_numpy())
                b = _mat(j["emb_old"].to_numpy())
                sim = (a * b).sum(axis=1)      # rows pre-normalized
                hit = np.unique(j["index"].to_numpy()[sim >= tau])
                matched[hit] = True

        # epoch-mates: within a bucket the smaller vec_id wins
        bk = g["bucket"].to_numpy()
        tb = g["tbl"].to_numpy()
        cuts = np.flatnonzero(np.r_[True, (bk[1:] != bk[:-1])
                                    | (tb[1:] != tb[:-1])])
        ends = np.r_[cuts[1:], len(g)]
        embs = g["emb"].to_numpy()
        for s, e in zip(cuts, ends):
            m = min(e - s, 256)
            if m < 2:
                continue
            block = _mat(embs[s:s + m])
            sims = block @ block.T
            for i in range(1, m):
                if (sims[i, :i] >= tau).any():
                    matched[s + i] = True

        dst = os.path.join(pdir, f"lsh-{epoch_id:06d}.parquet")
        tmp = dst + f".tmp.{os.getpid()}"
        pq.write_table(pa.table({
            "tbl": pa.array(tb.astype(np.int32)),
            "bucket": pa.array(bk, pa.int64()),
            "vec_id": pa.array(g["vec_id"].to_numpy(), pa.int64()),
            "emb": pa.array(list(embs), pa.large_binary()),
        }), tmp, row_group_size=65536)
        os.replace(tmp, dst)
        return pd.DataFrame({"vec_id": g["vec_id"].to_numpy(),
                             "matched": matched})

    per_row = ds.map_batches(rows, batch_format="pyarrow") \
        .groupby("part").map_groups(dedup_partition, batch_format="pandas")
    out = per_row.map_batches(
        lambda df: df.assign(vpart=(pd.util.hash_array(
            df["vec_id"].to_numpy()) % num_partitions).astype("int64")),
        batch_format="pandas") \
        .groupby("vpart").map_groups(
            lambda g: pd.DataFrame({
                "vec_id": g.groupby("vec_id")["matched"].any().index.to_numpy(),
                "is_dup": g.groupby("vec_id")["matched"].any().to_numpy()}),
            batch_format="pandas")
    out = out.materialize()
    n_dup = int(out.sum("is_dup") or 0)
    trimmed = _trim_epoch_deltas(out, index_dir, epoch_id, "lsh",
                                 "vec_id", num_partitions) \
        if keep_only and n_dup else False
    meta = {"epoch": epoch_id, "vecs": out.count(), "near_dups": n_dup,
            "num_partitions": num_partitions, "tau": tau,
            "target_recall": target_recall, "keep_only": trimmed}
    mp = _manifest_path(index_dir, epoch_id)
    with open(mp + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(mp + ".tmp", mp)
    return out
