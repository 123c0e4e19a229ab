"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (the part that must survive 100 TB):

- exact: add a key-hash column in `map_batches`, then
  `groupby(key).map_groups(keep first)` — ONE shuffle of (key, doc_id)-thin
  rows; the winner policy (min doc_id) is deterministic.
- MinHash-LSH: signatures are computed per batch (vectorized polynomial
  hashing over shingle crc32s — no Python per-shingle loop), then EXPLODED
  to (band, band_hash, doc_id) rows; one groupby over band buckets yields
  candidate pairs; exact-Jaccard verification joins texts per pair. Nothing
  ever holds all docs in one place.
- SimHash: 64-bit signature per doc from the same crc32 shingle stream;
  near-dup = equal value in any of 4 16-bit bands (hamming<=k screening).
- embedding cosine: see functions/similarity.py (block-matmul vs broadcast).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """crc32 of each word k-gram (distinct), vectorized downstream."""
    words = text.split(" ")
    if len(words) < k:
        grams = {" ".join(words)}
    else:
        grams = {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}
    return np.fromiter((zlib.crc32(g.encode()) for g in grams),
                       dtype=np.uint64, count=len(grams))


def minhash_signature(h: np.ndarray, perms_a: np.ndarray,
                      perms_b: np.ndarray) -> np.ndarray:
    """min over shingles of (a*h + b mod M) per permutation — one matmul-ish
    broadcastednumpy op, no Python loop over shingles."""
    v = (perms_a[:, None] * h[None, :] + perms_b[:, None]) % _MERSENNE
    return v.min(axis=1)


def make_perms(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE) - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE) - 1, size=num_perm, dtype=np.uint64)
    return a, b


_G1, _G2, _G3 = (np.uint64(0x9E3779B97F4A7C15), np.uint64(0x85EBCA6B2C2B2AE3),
                 np.uint64(0xC2B2AE3D27D4EB4F))


def batch_gram_hashes(texts: list[str], k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized word-k-gram hashing for a whole batch: hash every word
    once (C-speed pandas hash), combine k consecutive word hashes with
    wrap-around multiply-adds. Returns (gram_hashes, doc_offsets) where
    doc_offsets[i]:doc_offsets[i+1] are doc i's grams (>=1 per doc)."""
    words_per_doc = [t.split(" ") for t in texts]
    nw = np.array([len(w) for w in words_per_doc], dtype=np.int64)
    flat = np.array([w for ws in words_per_doc for w in ws], dtype=object)
    wh = pd.util.hash_array(flat, categorize=False).astype(np.uint64)

    with np.errstate(over="ignore"):
        if len(wh) >= k:
            g = wh[:-2] * _G1 + wh[1:-1] * _G2 + wh[2:] * _G3
        else:
            g = np.empty(0, np.uint64)
    # position i produces a gram iff i .. i+k-1 stay inside one doc
    doc_of_word = np.repeat(np.arange(len(nw)), nw)
    valid = doc_of_word[:-2] == doc_of_word[2:] if len(wh) >= k else np.empty(0, bool)
    grams = g[valid]
    gdoc = doc_of_word[:-2][valid] if len(wh) >= k else np.empty(0, np.int64)

    # short docs (< k words): fall back to the single whole-doc hash
    counts = np.bincount(gdoc, minlength=len(nw))
    if (counts == 0).any():
        extra_docs = np.flatnonzero(counts == 0)
        extra = pd.util.hash_array(
            np.array([texts[i] for i in extra_docs], dtype=object),
            categorize=False).astype(np.uint64)
        grams = np.concatenate([grams, extra])
        gdoc = np.concatenate([gdoc, extra_docs])
        order = np.argsort(gdoc, kind="stable")
        grams, gdoc = grams[order], gdoc[order]
        counts = np.bincount(gdoc, minlength=len(nw))
    offsets = np.zeros(len(nw) + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    return grams, offsets


class MinHashStage:
    """map_batches actor: docs → exploded (band, band_hash, doc_id) rows.
    Fully vectorized: per permutation one affine transform over all grams of
    the batch + a minimum.reduceat per doc (no Python loop over shingles)."""

    def __init__(self, num_perm: int = 32, bands: int = 8, k: int = 3,
                 seed: int = 7):
        assert num_perm % bands == 0
        self.a, self.b = make_perms(num_perm, seed)
        self.bands, self.rows = bands, num_perm // bands
        self.k = k
        rng = np.random.default_rng(seed + 1)
        self.row_mix = rng.integers(1, int(_MERSENNE), size=num_perm,
                                    dtype=np.uint64)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].tolist()
        grams, offsets = batch_gram_hashes(texts, self.k)
        n_docs = len(texts)
        sig = np.empty((len(self.a), n_docs), dtype=np.uint64)
        starts = offsets[:-1]
        for j in range(len(self.a)):
            v = (self.a[j] * grams + self.b[j]) % _MERSENNE
            sig[j] = np.minimum.reduceat(v, starts)
        # band hash: mix the band's rows with one more affine combine
        out = []
        with np.errstate(over="ignore"):
            for bi in range(self.bands):
                rows = sig[bi * self.rows:(bi + 1) * self.rows]
                mix = self.row_mix[bi * self.rows:(bi + 1) * self.rows]
                bh = (rows * mix[:, None]).sum(axis=0, dtype=np.uint64)
                out.append(pd.DataFrame({
                    "doc_id": df["doc_id"].to_numpy(),
                    "band": np.full(n_docs, bi, np.int64),
                    "band_hash": bh.astype(np.int64),
                }))
        return pd.concat(out, ignore_index=True)


def pairs_from_buckets(g: pd.DataFrame, max_bucket: int = 64) -> pd.DataFrame:
    """Candidate pairs from one (band, bucket) slice: vectorized group scan
    over band_hash; buckets larger than `max_bucket` docs are capped (a
    giant near-dup cluster would otherwise emit O(m^2) pairs — the cap is
    logged upstream, not silent)."""
    g = g.sort_values(["band_hash", "doc_id"], kind="mergesort")
    a_out, b_out = [], []
    for _, grp in g.groupby("band_hash", sort=False):
        ids = grp["doc_id"].to_numpy()
        if len(ids) < 2:
            continue
        ids = ids[:max_bucket]
        ia, ib = np.triu_indices(len(ids), k=1)
        a_out.append(ids[ia])
        b_out.append(ids[ib])
    if not a_out:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})
    return pd.DataFrame({"a": np.concatenate(a_out).astype("int64"),
                         "b": np.concatenate(b_out).astype("int64")})


def exact_jaccard(t1: str, t2: str, k: int = 3) -> float:
    s1 = set(map(int, _shingle_hashes(t1, k)))
    s2 = set(map(int, _shingle_hashes(t2, k)))
    if not s1 and not s2:
        return 1.0
    return len(s1 & s2) / len(s1 | s2)


def simhash64(text: str, k: int = 3) -> int:
    """64-bit SimHash over word-k-gram crc32s expanded to 64 bits via
    splitmix-style mixing; vectorized bit counting."""
    h = _shingle_hashes(text, k)
    # mix 32→64 bits (xorshift-multiply, constants from splitmix64)
    x = h.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(31)
    bits = ((x[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
    score = bits.sum(axis=0) * 2 - len(x)          # per-bit vote
    out = np.uint64(0)
    for i in np.flatnonzero(score > 0):
        out |= np.uint64(1) << np.uint64(i)
    return int(out)


class SimHashStage:
    def __init__(self, k: int = 3):
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = df["text"].map(lambda t: simhash64(t, self.k)).astype("uint64")
        out = {"doc_id": df["doc_id"], "simhash": sigs}
        # 4×16-bit bands for hamming<=3-ish candidate screening
        for b in range(4):
            out[f"band{b}"] = ((sigs.to_numpy() >> np.uint64(16 * b))
                               & np.uint64(0xFFFF)).astype("int64")
        return pd.DataFrame(out)


def exact_dedup_key(df: pd.DataFrame, first_words: int = 5) -> pd.DataFrame:
    """Exact-dedup key: the first `first_words` words (normalized prefix) —
    the hash-partition + per-group-first exact dedup's key column."""
    key = df["text"].str.split(" ").str[:first_words].str.join(" ")
    return pd.DataFrame({"doc_id": df["doc_id"], "dedup_key": key})
