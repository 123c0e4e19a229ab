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

    def dedup_partition(g: pd.DataFrame) -> pd.DataFrame:
        """One partition's task: batch-local first-wins, then drop keys
        already in THIS partition's committed delta chain, then append
        this epoch's novel keys as one delta (tmp→rename, idempotent —
        deterministic content, fixed filename)."""
        p = int(g["part"].iloc[0])
        pdir = os.path.join(index_dir, f"part={p}")
        os.makedirs(pdir, exist_ok=True)
        g = g.sort_values(["dedup_key", "doc_id"], kind="mergesort") \
             .drop_duplicates("dedup_key")
        seen_parts = []
        for f in sorted(glob.glob(os.path.join(pdir, "keys-*.parquet"))):
            # only COMMITTED deltas are authoritative; an uncommitted
            # leftover from a crashed epoch must not suppress docs
            if int(os.path.basename(f)[5:-8]) in visible:
                seen_parts.append(pq.read_table(f, columns=["dedup_key"]))
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
    """All committed keys (for audits): committed deltas only."""
    visible = set(committed_epochs(index_dir))
    files = [f for f in glob.glob(os.path.join(index_dir, "part=*",
                                               "keys-*.parquet"))
             if int(os.path.basename(f)[5:-8]) in visible]
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
# The index stores EVERY ingested doc's band rows (duplicates included):
# a future near-copy then matches whichever earlier copy shares its
# buckets — slightly larger index than keep-only, but verdicts never
# depend on a cross-partition "who won" decision, so one shuffle suffices
# and crashed-epoch retries are bit-deterministic.
# ---------------------------------------------------------------------------


def minhash_ingest_epoch(ds: "ray.data.Dataset", index_dir: str,
                         epoch_id: int, num_partitions: int = 16,
                         num_perm: int = 32, bands: int = 8,
                         sim_threshold: float = 0.7,
                         max_bucket: int = 64) -> "ray.data.Dataset | None":
    """Near-dup-dedup one ingest epoch (columns doc_id, text) against the
    persistent MinHash band index; returns (doc_id, is_dup) verdicts as a
    Dataset, or None if this epoch id already committed (idempotent)."""
    from ..functions.dedup import MinHashBandSig, sig_agreement

    if os.path.exists(_manifest_path(index_dir, epoch_id)):
        return None
    committed = committed_epochs(index_dir)
    assert all(e < epoch_id for e in committed), \
        f"epoch {epoch_id} must be newer than committed {committed[-1:]}"
    os.makedirs(os.path.join(index_dir, "_manifest"), exist_ok=True)
    visible = set(committed)

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

        old_parts = []
        for f in sorted(glob.glob(os.path.join(pdir, "bands-*.parquet"))):
            if int(os.path.basename(f)[6:-8]) in visible:
                old_parts.append(pq.read_table(f).to_pandas())
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
    meta = {"epoch": epoch_id, "docs": out.count(), "near_dups": n_dup,
            "num_partitions": num_partitions, "num_perm": num_perm,
            "bands": bands, "sim_threshold": sim_threshold}
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
                       tau: float = 0.9, target_recall: float = 0.95
                       ) -> "ray.data.Dataset | None":
    """Near-dup-dedup one ingest epoch of embeddings (columns vec_id,
    embedding:list<float>) against the persistent LSH index; returns
    (vec_id, is_dup) verdicts, or None if this epoch already committed."""
    from ..functions.similarity import bucketize_for_screen

    if os.path.exists(_manifest_path(index_dir, epoch_id)):
        return None
    committed = committed_epochs(index_dir)
    assert all(e < epoch_id for e in committed), \
        f"epoch {epoch_id} must be newer than committed {committed[-1:]}"
    os.makedirs(os.path.join(index_dir, "_manifest"), exist_ok=True)
    visible = set(committed)

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

        old_parts = []
        for f in sorted(glob.glob(os.path.join(pdir, "lsh-*.parquet"))):
            if int(os.path.basename(f)[4:-8]) in visible:
                old_parts.append(pq.read_table(f).to_pandas())
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
    meta = {"epoch": epoch_id, "vecs": out.count(), "near_dups": n_dup,
            "num_partitions": num_partitions, "tau": tau,
            "target_recall": target_recall}
    mp = _manifest_path(index_dir, epoch_id)
    with open(mp + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(mp + ".tmp", mp)
    return out
