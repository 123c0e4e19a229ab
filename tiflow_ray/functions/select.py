"""Data-selection operators for training-corpus curation:

- DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling"): hashed n-gram bucket
  distributions of a small TARGET corpus vs the RAW corpus give an
  importance score per document; keep docs that look more target-like.
  Discretized to integer arithmetic (per-bucket sign via cross
  multiplication, no float log-ratios) so the SQL twin hashes bit-exactly.
- Distributed rank / ntile (curriculum binning): exact global rank of an
  integer-valued column without a global sort — one histogram pass
  (O(value range) driver state, the bounded-domain analog of
  sample-quantile partitioning), then per-value-partition tie-breaking.

Both follow the two-pass broadcast shape: pass 1 reduces a small summary
(bucket counts / histogram) to the driver, pass 2 streams the corpus
against the broadcast summary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from .text import md5_u64

#: number of hash buckets for DSIR n-gram features
DSIR_BUCKETS = 256


def _doc_gram_strings(text: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """All unigram + bigram OCCURRENCES per doc (bigrams joined with
    chr(31), matching the SQL twin). Returns (grams, doc_idx)."""
    words_per_doc = [t.split(" ") for t in text]
    nw = np.array([len(w) for w in words_per_doc], np.int64)
    uni = np.array([w for ws in words_per_doc for w in ws], dtype=object)
    bi = np.array(["\x1f".join(p) for ws in words_per_doc
                   for p in zip(ws, ws[1:])], dtype=object)
    doc_uni = np.repeat(np.arange(len(nw)), nw)
    doc_bi = np.repeat(np.arange(len(nw)), np.maximum(nw - 1, 0))
    return (np.concatenate([uni, bi]),
            np.concatenate([doc_uni, doc_bi]))


# worker-persistent gram→bucket memo: corpora are zipfian, so distinct
# grams repeat across batches — md5 (the DuckDB-parity contract) runs once
# per gram per WORKER instead of once per gram per batch. Capped so a
# pathological vocabulary can't grow the worker heap unboundedly.
_BUCKET_CACHE: dict = {}
_BUCKET_CACHE_MAX = 2_000_000


def _bucketize(grams: np.ndarray) -> np.ndarray:
    """md5-bucket per gram occurrence — md5 once per DISTINCT gram
    (doc_fingerprint/HashEmbed DuckDB-parity contract) via the vectorized
    DuckDB md5 kernel, gathered back over occurrences via the unique
    inverse. The per-worker memo still short-circuits grams seen in
    earlier batches (zipfian corpora)."""
    if len(grams) == 0:
        return np.empty(0, np.int64)
    distinct, inverse = np.unique(grams, return_inverse=True)
    cache = _BUCKET_CACHE
    db = np.empty(len(distinct), np.int64)
    miss_idx = []
    for i, g in enumerate(distinct):
        b = cache.get(g)
        if b is None:
            miss_idx.append(i)
        else:
            db[i] = b
    if miss_idx:
        from .text import md5_u64_many
        miss_idx = np.asarray(miss_idx, np.int64)
        hashed = (md5_u64_many(distinct[miss_idx])
                  % np.uint64(DSIR_BUCKETS)).astype(np.int64)
        db[miss_idx] = hashed
        if len(cache) < _BUCKET_CACHE_MAX:
            cache.update(zip(distinct[miss_idx], hashed.tolist()))
    return db[inverse]


def dsir_bucket_partials(df: pd.DataFrame, target_sources) -> pd.DataFrame:
    """Pass 1 kernel: per-batch (bucket, raw_count, target_count) partials
    — the batch-local combiner, O(DSIR_BUCKETS) rows shipped per batch."""
    grams, doc_idx = _doc_gram_strings(df["text"])
    b = _bucketize(grams)
    is_target = df["source"].isin(target_sources).to_numpy()[doc_idx]
    raw = np.bincount(b, minlength=DSIR_BUCKETS)
    tgt = np.bincount(b[is_target], minlength=DSIR_BUCKETS)
    return pd.DataFrame({"b": np.arange(DSIR_BUCKETS, dtype=np.int64),
                         "r": raw.astype("int64"),
                         "t": tgt.astype("int64")})


def dsir_signs(partials: pd.DataFrame) -> np.ndarray:
    """Reduce partials to the per-bucket importance sign: +1 where the
    bucket is over-represented in the target (t/T > r/R via integer cross
    multiplication), else -1."""
    agg = partials.groupby("b").agg(r=("r", "sum"), t=("t", "sum"))
    r = np.zeros(DSIR_BUCKETS, np.int64)
    t = np.zeros(DSIR_BUCKETS, np.int64)
    r[agg.index.to_numpy()] = agg["r"].to_numpy()
    t[agg.index.to_numpy()] = agg["t"].to_numpy()
    T, R = int(t.sum()), int(r.sum())
    # arbitrary-precision Python ints: at 100 TB scale R ~ 1e13 and
    # per-bucket t ~ 1e11, so the int64 products would silently wrap while
    # the DuckDB twin sums into HUGEINT — only 256 comparisons, so the
    # Python loop is free (ADVICE r3)
    return np.array([1 if int(ti) * R > int(ri) * T else -1
                     for ti, ri in zip(t, r)], np.int64)


class DsirScore:
    """Pass 2 kernel: broadcast sign table (ray.put once), per-batch gram
    pass + sign gather + per-doc sum."""

    def __init__(self, signs_ref):
        self.signs = np.asarray(ray.get(signs_ref), dtype=np.int64)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        grams, doc_idx = _doc_gram_strings(df["text"])
        b = _bucketize(grams)
        score = np.bincount(doc_idx, weights=self.signs[b],
                            minlength=len(df)).astype("int64")
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "score": score,
            "dsir_keep": score > 0,
        })


def dsir_doc_buckets(df: pd.DataFrame, target_sources) -> "pa.Table":
    """Shared pass for both DSIR stages: ONE gram explode + md5 bucketize
    per document, reduced to per-doc SPARSE bucket counts (bks:list<int16>,
    cnts:list<int64>). The partial-count stage and the scoring stage both
    consume this intermediate, so the expensive split+md5 work runs once
    per corpus instead of once per stage (VERDICT r3 #5). The sparse rows
    are far smaller than the text (≤256 entries per doc) — cheap to
    materialize, and both downstream passes are pure numpy."""
    import pyarrow as pa
    grams, doc_idx = _doc_gram_strings(df["text"])
    b = _bucketize(grams)
    ndocs = len(df)
    key = doc_idx * DSIR_BUCKETS + b
    uk, cnt = np.unique(key, return_counts=True)
    d = (uk // DSIR_BUCKETS).astype(np.int64)
    bk = (uk % DSIR_BUCKETS).astype(np.int16)
    per_doc = np.bincount(d, minlength=ndocs)
    offsets = np.concatenate(([0], np.cumsum(per_doc))).astype(np.int32)
    return pa.table({
        "doc_id": pa.Array.from_pandas(df["doc_id"]),
        "is_target": pa.array(
            df["source"].isin(target_sources).to_numpy()),
        "bks": pa.ListArray.from_arrays(pa.array(offsets),
                                        pa.array(bk, pa.int16())),
        "cnts": pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(cnt.astype(np.int64), pa.int64())),
    })


def _flat_lists(t) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(bks_flat, cnts_flat, lengths) from a pyarrow batch of sparse rows."""
    bks = t.column("bks").combine_chunks()
    cnts = t.column("cnts").combine_chunks()
    import pyarrow.compute as pc
    lengths = pc.list_value_length(bks).to_numpy().astype(np.int64)
    return (bks.flatten().to_numpy().astype(np.int64),
            cnts.flatten().to_numpy(), lengths)


def dsir_partials_from_buckets(t) -> pd.DataFrame:
    """Pass-1 combiner over the sparse intermediate: O(DSIR_BUCKETS) rows
    per batch. Integer-exact: counts stay < 2^53 per batch by construction
    (bincount's float64 accumulation is exact in that range); the final
    cross-multiplication uses Python ints (dsir_signs)."""
    bks, cnts, lengths = _flat_lists(t)
    is_t = np.repeat(t.column("is_target").to_numpy(zero_copy_only=False),
                     lengths)
    raw = np.bincount(bks, weights=cnts, minlength=DSIR_BUCKETS)
    tgt = np.bincount(bks[is_t], weights=cnts[is_t],
                      minlength=DSIR_BUCKETS)
    return pd.DataFrame({"b": np.arange(DSIR_BUCKETS, dtype=np.int64),
                         "r": raw.astype("int64"),
                         "t": tgt.astype("int64")})


class DsirScoreFromBuckets:
    """Pass-2 scorer over the sparse intermediate: broadcast sign table
    (ray.put once, read once per actor), score = Σ cnts·signs[bks]."""

    def __init__(self, signs_ref):
        self.signs = np.asarray(ray.get(signs_ref), dtype=np.int64)

    def __call__(self, t) -> pd.DataFrame:
        bks, cnts, lengths = _flat_lists(t)
        nrows = t.num_rows
        contribs = cnts * self.signs[bks]
        row_idx = np.repeat(np.arange(nrows, dtype=np.int64), lengths)
        score = np.bincount(row_idx, weights=contribs,
                            minlength=nrows).astype("int64")
        return pd.DataFrame({
            "doc_id": t.column("doc_id").to_pandas().to_numpy(),
            "score": score,
            "dsir_keep": score > 0,
        })


def value_histogram(ds: ray.data.Dataset, col: str,
                    max_value: int) -> np.ndarray:
    """Distributed exact histogram of a bounded non-negative int column:
    per-batch bincount partials (one O(range) row per batch), summed on
    the driver. O(max_value) driver state — for unbounded domains swap in
    a sampled-quantile boundary pass; the two-phase shape is identical."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = np.bincount(df[col].to_numpy(), minlength=max_value + 1)
        if len(h) > max_value + 1:
            raise ValueError(f"{col} exceeds max_value={max_value}")
        nz = np.flatnonzero(h)   # ship only the occupied values
        return pd.DataFrame({"v": nz.astype("int64"),
                             "n": h[nz].astype("int64")})

    # distributed final sum: the driver receives ≤ range rows total, not
    # O(batches × range)
    from ray.data.aggregate import Sum
    agg = ds.map_batches(partial, batch_format="pandas") \
        .groupby("v").aggregate(Sum(on="n", alias_name="n")).to_pandas()
    hist = np.zeros(max_value + 1, np.int64)
    hist[agg["v"].to_numpy()] = agg["n"].to_numpy()
    return hist


def rank_buckets(ds: ray.data.Dataset, col: str, id_col: str,
                 hist: np.ndarray, n_buckets: int = 10,
                 num_parts: int = 16) -> ray.data.Dataset:
    """Exact global rank of (col, id_col) and its ntile bucket, without a
    global sort: cum-below offsets from the broadcast histogram + ONE
    hash-partition shuffle on the VALUE for within-value tie-breaking
    (every row of one value lands in one partition; ties ranked by id)."""
    cum_below = np.concatenate([[0], np.cumsum(hist)[:-1]])
    total = int(hist.sum())

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df[col].to_numpy(), categorize=False)
        return df.assign(part=(h % num_parts).astype("int64"))

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        # cum_below rides the closure (O(range), small by contract)
        g = g.sort_values([col, id_col])
        v = g[col].to_numpy()
        within = np.arange(len(g)) - np.searchsorted(v, v, side="left")
        rank = cum_below[v] + within
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            col: v,
            "global_rank": rank.astype("int64"),
            "bucket": (n_buckets * rank // total).astype("int64"),
        })

    return ds.map_batches(add_part, batch_format="pandas") \
        .groupby("part").map_groups(rank_part, batch_format="pandas")


def shuffle_positions(ds: ray.data.Dataset, id_col: str, seed: str,
                      bucket_bits: int = 8,
                      num_parts: int | None = None) -> ray.data.Dataset:
    """Deterministic global shuffle for training order: every row gets an
    exact permutation index = its rank under (md5(id:seed), id) — the
    seeded pseudo-random order a trainer consumes the corpus in — WITHOUT
    a global sort. Two passes: (1) count rows per top-`bucket_bits` hash
    bucket, cumsum on the driver (O(2^bits) state); (2) one shuffle keyed
    on the bucket, within-bucket sort + broadcast offset. The md5-per-row
    cost is the doc_fingerprint DuckDB-parity contract."""
    from .graph import _parts
    n_parts = _parts(num_parts)
    n_buckets = 1 << bucket_bits
    shift = np.uint64(64 - bucket_bits)

    def hashed(df: pd.DataFrame) -> pd.DataFrame:
        from .text import md5_u64_many
        ids = df[id_col].to_numpy()
        keys = np.array([f"{v}:{seed}" for v in ids], dtype=object)
        h = md5_u64_many(keys)
        return pd.DataFrame({id_col: ids, "hv": h,
                             "bucket": (h >> shift).astype("int64")})

    hds = ds.map_batches(hashed, batch_format="pandas").materialize()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.bincount(df["bucket"].to_numpy(), minlength=n_buckets)
        nz = np.flatnonzero(c)
        return pd.DataFrame({"v": nz.astype("int64"),
                             "n": c[nz].astype("int64")})

    from ray.data.aggregate import Sum
    agg = hds.map_batches(partial, batch_format="pandas") \
        .groupby("v").aggregate(Sum(on="n", alias_name="n")).to_pandas()
    hist = np.zeros(n_buckets, np.int64)
    hist[agg["v"].to_numpy()] = agg["n"].to_numpy()
    offsets = np.concatenate([[0], np.cumsum(hist)[:-1]])

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for b, grp in g.groupby("bucket"):
            grp = grp.sort_values(["hv", id_col])
            pos = offsets[b] + np.arange(len(grp), dtype=np.int64)
            out.append(pd.DataFrame({id_col: grp[id_col].to_numpy(),
                                     "shuffle_pos": pos}))
        return pd.concat(out, ignore_index=True) if out else \
            pd.DataFrame({id_col: np.empty(0, g[id_col].dtype),
                          "shuffle_pos": np.empty(0, np.int64)})

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        # partition BY bucket value (not hash-of-bucket): all rows of one
        # bucket must land together for the offset math; modulo n_parts
        # so the shuffle width follows the cluster size (ADVICE r3)
        return df.assign(part=df["bucket"] % n_parts)

    return hds.map_batches(add_part, batch_format="pandas") \
        .groupby("part").map_groups(rank_part, batch_format="pandas")
