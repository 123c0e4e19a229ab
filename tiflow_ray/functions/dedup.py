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


class MinHashStage:
    """map_batches actor: doc → exploded (band, band_hash, doc_id) rows."""

    def __init__(self, num_perm: int = 32, bands: int = 8, k: int = 3,
                 seed: int = 7):
        assert num_perm % bands == 0
        self.a, self.b = make_perms(num_perm, seed)
        self.bands, self.rows = bands, num_perm // bands
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_band, out_hash = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            h = _shingle_hashes(text, self.k)
            sig = minhash_signature(h, self.a, self.b)
            for bi in range(self.bands):
                chunk = sig[bi * self.rows:(bi + 1) * self.rows]
                bh = zlib.crc32(chunk.tobytes())
                out_doc.append(doc_id)
                out_band.append(bi)
                out_hash.append(bh)
        return pd.DataFrame({"doc_id": out_doc, "band": out_band,
                             "band_hash": out_hash})


def bucket_to_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """One LSH bucket → candidate pairs (a<b). Buckets are tiny by design;
    a hot bucket (giant near-dup cluster) should be capped in production —
    we keep all pairs here and note the cap knob."""
    ids = sorted(set(g["doc_id"]))
    if len(ids) < 2:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64")})
    a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1:]])
    return pd.DataFrame({"a": list(a), "b": list(b)})


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
