"""Sequence packing for LLM pretraining: concatenate documents in a
stable global order and chunk the token stream every `seq_len` tokens
(the concat-then-chunk packing GPT-style pipelines run before training).
Each doc's placement is fully determined by its GLOBAL token offset — an
ordered prefix sum over the corpus, which is the interesting part at
100 TB:

* docs range-partition by doc_id (contiguous ranges, not hash — order is
  the whole point);
* pass 1 computes per-range token sums (tiny: P numbers to the driver);
* the driver takes the exclusive prefix over ranges (O(P));
* pass 2 rebroadcasts the range offsets and each range task computes its
  docs' global offsets with one in-range cumsum — no all-to-all, no
  driver materialization of the corpus, two streaming passes.

Emitted per doc: global start offset, first/last chunk ids, and the
offset inside the first chunk — everything a downstream tokenizer needs
to assemble fixed-length training sequences.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def pack_offsets(ds: "ray.data.Dataset", seq_len: int,
                 n_docs: int, num_ranges: int = 16,
                 tok_fn=None) -> "ray.data.Dataset":
    """ds: (doc_id, text) with doc_id in [0, n_docs). Returns a Dataset of
    (doc_id, n_tok, start_off, chunk_first, chunk_last, off_in_chunk)."""
    span = -(-n_docs // num_ranges)          # ceil: contiguous id ranges

    if tok_fn is None:
        def tok_fn(text: pd.Series) -> np.ndarray:
            return text.str.split(" ").str.len().to_numpy(np.int64)

    def tokens_and_range(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_tok": tok_fn(df["text"]),
            "part": (df["doc_id"].to_numpy(np.int64) // span),
        })

    toks = ds.map_batches(tokens_and_range, batch_format="pandas")

    # pass 1: per-range sums — P rows to the driver, nothing else
    sums = toks.groupby("part").sum("n_tok").to_pandas()
    sums = sums.sort_values("part")
    base = np.zeros(num_ranges + 1, np.int64)
    np.add.at(base, sums["part"].to_numpy(np.int64) + 1,
              sums["sum(n_tok)"].to_numpy(np.int64))
    base = np.cumsum(base)                   # exclusive prefix per range

    def place(g: pd.DataFrame) -> pd.DataFrame:
        p = int(g["part"].iloc[0])
        g = g.sort_values("doc_id", kind="mergesort")
        n = g["n_tok"].to_numpy(np.int64)
        start = base[p] + np.concatenate([[0], np.cumsum(n)[:-1]])
        end = start + np.maximum(n, 1) - 1   # n>=1 (split of any text)
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "n_tok": n,
            "start_off": start,
            "chunk_first": start // seq_len,
            "chunk_last": end // seq_len,
            "off_in_chunk": start % seq_len,
        })

    # pass 2: range tasks place their docs (same groupby shuffle key —
    # ranges are contiguous so each group is one independent cumsum)
    return toks.groupby("part").map_groups(place, batch_format="pandas")


def chunk_docs_batch(df: pd.DataFrame, width: int = 32,
                     stride: int = 24) -> pd.DataFrame:
    """Sliding-window document chunking (RAG / long-context pretraining
    prep): split each doc into word windows of `width` with overlap
    `width - stride`. Fully vectorized — one polars explode, then each
    word is assigned its ≤2 owning chunks by arithmetic (a word at
    position p belongs to chunk p//stride, and to the previous chunk
    when p % stride < width - stride), one groupby joins chunks back.
    No Python per chunk; embarrassingly parallel per batch."""
    assert 0 < stride <= width <= 2 * stride, \
        "word membership is ≤2 chunks only when width <= 2*stride"
    import polars as pl
    s = pl.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                      "text": df["text"].to_numpy()})
    ex = (s.with_columns(pl.col("text").str.split(" "))
           .with_columns(n=pl.col("text").list.len())
           .explode("text")
           .with_columns(pos=pl.int_range(pl.len()).over("doc_id")))
    n_chunks = (pl.when(pl.col("n") <= width).then(1)
                .otherwise((pl.col("n") - width + stride - 1) // stride + 1))
    ex = ex.with_columns(nc=n_chunks)
    a = ex.with_columns(chunk_idx=pl.col("pos") // stride) \
        .filter(pl.col("chunk_idx") < pl.col("nc"))
    b = ex.with_columns(chunk_idx=pl.col("pos") // stride - 1) \
        .filter((pl.col("chunk_idx") >= 0)
                & (pl.col("pos") % stride < width - stride))
    out = (pl.concat([a, b])
           .sort(["doc_id", "chunk_idx", "pos"])
           .group_by(["doc_id", "chunk_idx"], maintain_order=True)
           .agg(chunk_text=pl.col("text").str.join(" ")))
    res = out.to_pandas()
    res["chunk_idx"] = res["chunk_idx"].astype("int64")
    return res[["doc_id", "chunk_idx", "chunk_text"]]
