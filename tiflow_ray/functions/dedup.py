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
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (uint64 → well-mixed uint64)."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
        x ^= x >> np.uint64(30)
        x = (x * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
        x ^= x >> np.uint64(27)
        x = (x * np.uint64(0x94D049BB133111EB)) & _MASK64
        x ^= x >> np.uint64(31)
    return x


def _gram_mix_consts(k: int) -> np.ndarray:
    """Per-position combine constants; k=3 keeps the historical values (lake
    /query caches key off signature stability)."""
    if k == 3:
        return np.array([_G1, _G2, _G3], dtype=np.uint64)
    return splitmix64(np.arange(1, k + 1, dtype=np.uint64)) | np.uint64(1)


def batch_gram_hashes(texts: list[str], k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized word-k-gram hashing for a whole batch: hash every word
    once (C-speed pandas hash), combine k consecutive word hashes with
    wrap-around multiply-adds. Returns (gram_hashes, doc_offsets) where
    doc_offsets[i]:doc_offsets[i+1] are doc i's grams (>=1 per doc).
    Generalized to any k >= 1 (position-mix constants from splitmix64)."""
    assert k >= 1
    consts = _gram_mix_consts(k)
    words_per_doc = [t.split(" ") for t in texts]
    nw = np.array([len(w) for w in words_per_doc], dtype=np.int64)
    flat = np.array([w for ws in words_per_doc for w in ws], dtype=object)
    wh = pd.util.hash_array(flat, categorize=False).astype(np.uint64)

    n_words = len(wh)
    with np.errstate(over="ignore"):
        if n_words >= k:
            g = np.zeros(n_words - k + 1, np.uint64)
            for i in range(k):
                g += wh[i:n_words - k + 1 + i] * consts[i]
        else:
            g = np.empty(0, np.uint64)
    # position i produces a gram iff i .. i+k-1 stay inside one doc
    doc_of_word = np.repeat(np.arange(len(nw)), nw)
    valid = (doc_of_word[:n_words - k + 1] == doc_of_word[k - 1:]
             if n_words >= k else np.empty(0, bool))
    grams = g[valid]
    gdoc = doc_of_word[:n_words - k + 1][valid] if n_words >= k else np.empty(0, np.int64)

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


def pairs_from_buckets(g: pd.DataFrame, max_bucket: int = 64,
                       carry: tuple[str, ...] = ()) -> pd.DataFrame:
    """Candidate pairs from one (band, bucket) slice: vectorized group scan
    over band_hash; buckets larger than `max_bucket` docs are capped (a
    giant near-dup cluster would otherwise emit O(m^2) pairs — the cap is
    logged upstream, not silent). `carry` columns ride along as
    a_<col>/b_<col> so per-pair verification (e.g. simhash hamming) needs no
    join back to the signature table."""
    g = g.sort_values(["band_hash", "doc_id"], kind="mergesort")
    outs = {c: ([], []) for c in ("doc_id",) + tuple(carry)}
    for _, grp in g.groupby("band_hash", sort=False):
        if len(grp) < 2:
            continue
        grp = grp.iloc[:max_bucket]
        ia, ib = np.triu_indices(len(grp), k=1)
        for c, (al, bl) in outs.items():
            v = grp[c].to_numpy()
            al.append(v[ia])
            bl.append(v[ib])
    cols: dict[str, np.ndarray | pd.Series] = {}
    for c, (al, bl) in outs.items():
        an = "a" if c == "doc_id" else f"a_{c}"
        bn = "b" if c == "doc_id" else f"b_{c}"
        if al:
            cols[an], cols[bn] = np.concatenate(al), np.concatenate(bl)
        else:
            dt = "uint64" if c == "simhash" else "int64"
            cols[an] = pd.Series([], dtype=dt)
            cols[bn] = pd.Series([], dtype=dt)
    df = pd.DataFrame(cols)
    if len(df):
        df["a"] = df["a"].astype("int64")
        df["b"] = df["b"].astype("int64")
    return df


_POPCNT8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                         axis=1).sum(axis=1).astype(np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (uint8 lookup table)."""
    if len(x) == 0:
        return np.empty(0, np.int64)
    return _POPCNT8[np.ascontiguousarray(x).view(np.uint8)] \
        .reshape(len(x), 8).sum(axis=1).astype(np.int64)


def doc_unique_grams(texts: list[str], k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """(sorted-distinct gram hashes, doc offsets) for a batch — the exact
    per-doc shingle SETS Jaccard verification needs, computed in one
    vectorized pass (sort by (doc, gram), first-occurrence mask)."""
    grams, offsets = batch_gram_hashes(texts, k)
    gdoc = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
    order = np.lexsort((grams, gdoc))
    gs, ds_ = grams[order], gdoc[order]
    first = np.ones(len(gs), bool)
    if len(gs) > 1:
        first[1:] = (gs[1:] != gs[:-1]) | (ds_[1:] != ds_[:-1])
    gs, ds_ = gs[first], ds_[first]
    counts = np.bincount(ds_, minlength=len(offsets) - 1)
    out_off = np.zeros(len(offsets), np.int64)
    np.cumsum(counts, out=out_off[1:])
    return gs, out_off


def exact_jaccard(t1: str, t2: str, k: int = 3) -> float:
    s1 = set(map(int, _shingle_hashes(t1, k)))
    s2 = set(map(int, _shingle_hashes(t2, k)))
    if not s1 and not s2:
        return 1.0
    return len(s1 & s2) / len(s1 | s2)


def batch_simhash64(texts: list[str], k: int = 3) -> np.ndarray:
    """Vectorized 64-bit SimHash for a whole batch: ONE gram-hash pass
    (`batch_gram_hashes`, shared with MinHash), splitmix64 mixing, per-doc
    bit votes via `np.add.reduceat` — no Python loop over docs or grams."""
    grams, offsets = batch_gram_hashes(texts, k)
    x = splitmix64(grams)
    n_docs = len(offsets) - 1
    if n_docs == 0:
        return np.empty(0, np.uint64)
    # (n_grams, 8) uint8 view → unpack to (n_grams, 64) bits
    bits = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                         axis=1, bitorder="little")
    votes = np.add.reduceat(bits.astype(np.int64), offsets[:-1], axis=0)
    n_grams = np.diff(offsets)[:, None]
    sig_bits = (2 * votes > n_grams).astype(np.uint8)   # majority per bit
    return np.packbits(sig_bits, axis=1, bitorder="little") \
             .view(np.uint64).ravel()


def simhash64(text: str, k: int = 3) -> int:
    """Single-doc convenience wrapper over `batch_simhash64`."""
    return int(batch_simhash64([text], k)[0])


class SimHashStage:
    """map_batches stage: doc → (simhash, 4×16-bit band columns). The bands
    are the hamming<=3-ish candidate screen; the full signature rides along
    so downstream verify never needs a join back to this table."""

    def __init__(self, k: int = 3):
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = batch_simhash64(df["text"].tolist(), self.k)
        out = {"doc_id": df["doc_id"].to_numpy(),
               "simhash": pd.Series(sigs, dtype="uint64")}
        for b in range(4):
            out[f"band{b}"] = ((sigs >> np.uint64(16 * b))
                               & np.uint64(0xFFFF)).astype("int64")
        return pd.DataFrame(out)


def grams_to_binary(df: pd.DataFrame, k: int = 3) -> pa.Table:
    """Docs → (doc_id, grams:large_binary) where grams is the doc's
    sorted-distinct gram-hash SET as raw uint64 bytes. Binary because hash
    joins (acero) ship binary payloads but not list columns; the verify
    stage `np.frombuffer`s it back zero-copy."""
    gs, off = doc_unique_grams(df["text"].tolist(), k)
    payload = [gs[off[i]:off[i + 1]].tobytes() for i in range(len(off) - 1)]
    return pa.table({"doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                     "grams": pa.array(payload, pa.large_binary())})


def jaccard_verify_batch(t: pa.Table, tau: float,
                         a_col: str = "grams_a", b_col: str = "grams_b") -> pa.Table:
    """(a, b, grams_a, grams_b) candidate rows → the (a, b) pairs whose
    EXACT Jaccard ≥ tau. Per row one C-level `np.intersect1d` over the two
    sorted-unique gram sets — no Python loop over grams, no driver state."""
    ga, gb = t[a_col].to_pylist(), t[b_col].to_pylist()
    keep = np.zeros(t.num_rows, bool)
    for i in range(t.num_rows):
        sa = np.frombuffer(ga[i], np.uint64)
        sb = np.frombuffer(gb[i], np.uint64)
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        keep[i] = (inter / union if union else 1.0) >= tau
    return pa.table({"a": t["a"].filter(pa.array(keep)),
                     "b": t["b"].filter(pa.array(keep))})


class BroadcastJaccardVerify:
    """map_batches actor for the SMALL-candidate verify route: the
    candidate docs' gram sets (output-scale, already semi-joined down)
    are broadcast ONCE via ray.put; each task fetches the map in __init__
    and verifies its pair batch with the same exact-Jaccard kernel — no
    join exchange at all (two hash joins cost ~4s of aggregator spin-up
    at sf0.1 for candidate-sized inputs)."""

    def __init__(self, gram_ref, tau: float):
        import ray
        self.grams = ray.get(gram_ref)
        self.tau = tau

    def __call__(self, t: pa.Table) -> pa.Table:
        g = self.grams
        t = t.append_column("grams_a", pa.array(
            [g[a] for a in t["a"].to_pylist()], pa.large_binary()))
        t = t.append_column("grams_b", pa.array(
            [g[b] for b in t["b"].to_pylist()], pa.large_binary()))
        return jaccard_verify_batch(t, self.tau)


def exact_dedup_key(df: pd.DataFrame, first_words: int = 5) -> pd.DataFrame:
    """Exact-dedup key: the first `first_words` words (normalized prefix) —
    the hash-partition + per-group-first exact dedup's key column."""
    key = df["text"].str.split(" ").str[:first_words].str.join(" ")
    return pd.DataFrame({"doc_id": df["doc_id"], "dedup_key": key})


# Task-mode wrappers (see functions/text.py rationale): the signature
# stages' state is a few hundred permutation coefficients — per-worker
# lazy singletons beat actor-pool spin-up at fixed cost.
_SINGLETONS: dict = {}


def minhash_stage_batch(df: pd.DataFrame) -> pd.DataFrame:
    obj = _SINGLETONS.get("minhash")
    if obj is None:
        obj = _SINGLETONS["minhash"] = MinHashStage()
    return obj(df)


def simhash_stage_batch(df: pd.DataFrame) -> pd.DataFrame:
    obj = _SINGLETONS.get("simhash")
    if obj is None:
        obj = _SINGLETONS["simhash"] = SimHashStage()
    return obj(df)


def shingle_pieces(df, width: int = 8):
    """doc → non-overlapping `width`-word pieces (doc_id, pos, piece) —
    the C4/RefinedWeb dedup granularity (Raffel et al. 2020 §2.2 dedups
    three-sentence spans; Penedo et al. 2023 line-level): global EXACT
    dedup at sub-document units so boilerplate shared across documents
    dies without killing the documents. One polars split/explode/groupby
    pass per batch, no Python per word."""
    import polars as pl
    s = pl.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                      "text": df["text"].to_numpy()})
    ex = (s.with_columns(pl.col("text").str.split(" "))
           .explode("text")
           .with_columns(pos=pl.int_range(pl.len()).over("doc_id")))
    g = (ex.with_columns(pos=pl.col("pos") // width)
           .group_by(["doc_id", "pos"], maintain_order=True)
           .agg(piece=pl.col("text").str.join(" ")))
    return g.to_pandas()


def rebuild_docs(g):
    """Surviving (doc_id, pos, piece) rows of one hash partition →
    (doc_id, text_dedup, n_kept): C-level sort + grouped string join
    (polars), one call per partition."""
    import polars as pl
    out = (pl.from_pandas(g[["doc_id", "pos", "piece"]])
             .sort(["doc_id", "pos"])
             .group_by("doc_id", maintain_order=True)
             .agg(text_dedup=pl.col("piece").str.join(" "),
                  n_kept=pl.len().cast(pl.Int64)))
    return out.to_pandas()


class MinHashBandSig:
    """MinHashStage variant for the INCREMENTAL dedup index: per (doc,
    band) it emits (doc_id, band, band_hash, sig) where `sig` is the
    doc's FULL minhash signature packed as fixed-width binary (num_perm ×
    8 bytes). The signature riding every band row means the per-bucket
    verify needs no join back to the corpus — the same zero-join shape as
    SimHash's carried signature — and, crucially for the persistent
    index, the verdict for a future doc needs only the index rows, never
    the historical text."""

    def __init__(self, num_perm: int = 32, bands: int = 8, k: int = 3,
                 seed: int = 7):
        assert num_perm % bands == 0
        self.a, self.b = make_perms(num_perm, seed)
        self.num_perm, self.bands = num_perm, bands
        self.rows = num_perm // bands
        self.k = k
        rng = np.random.default_rng(seed + 1)
        self.row_mix = rng.integers(1, int(_MERSENNE), size=num_perm,
                                    dtype=np.uint64)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            # upstream filters (e.g. the ingest plant step) can emit empty
            # blocks; .view(uint8).reshape on a 0-row array raises
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=df["doc_id"].dtype
                                    if "doc_id" in df else np.int64),
                "band": pd.Series([], dtype=np.int64),
                "band_hash": pd.Series([], dtype=np.int64),
                "sig": pd.Series([], dtype=object),
            })
        texts = df["text"].tolist()
        grams, offsets = batch_gram_hashes(texts, self.k)
        n_docs = len(texts)
        sig = np.empty((self.num_perm, n_docs), dtype=np.uint64)
        starts = offsets[:-1]
        for j in range(self.num_perm):
            v = (self.a[j] * grams + self.b[j]) % _MERSENNE
            sig[j] = np.minimum.reduceat(v, starts)
        packed = sig.T.copy().view(np.uint8).reshape(n_docs, -1)
        sig_bytes = [packed[i].tobytes() for i in range(n_docs)]
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
                    "sig": sig_bytes,
                }))
        return pd.concat(out, ignore_index=True)


def sig_agreement(a: np.ndarray, b: np.ndarray,
                  num_perm: int) -> np.ndarray:
    """Fraction of agreeing minhash components per pair — the unbiased
    estimator of Jaccard similarity (Broder 1997). `a`, `b` are object
    arrays of packed signature bytes."""
    if len(a) == 0:
        return np.empty(0, np.float64)
    av = np.frombuffer(b"".join(a), np.uint64).reshape(len(a), num_perm)
    bv = np.frombuffer(b"".join(b), np.uint64).reshape(len(b), num_perm)
    return (av == bv).mean(axis=1)
