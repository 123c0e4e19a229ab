"""Safety / compliance kernels for the training-data pipeline:

- PII redaction (emails / IPv4 / phone numbers): count + scrub per batch
  with compiled regexes shared across the patterns both `re` and DuckDB's
  RE2 interpret identically, so the SQL twin hash-verifies the REDACTED
  TEXT itself, not just the counts.
- Benchmark decontamination (GPT-3 appendix C / PaLM style): overlapping
  word-k-gram shingles of a small held-out benchmark set are broadcast
  once (`ray.put`); every training doc counts its shingle overlap in one
  vectorized hash pass + `np.isin`. Docs with any overlap are flagged for
  removal — the classic eval-leakage gate run over the whole corpus.

Both are stateless batch kernels (task mode — nothing to amortize in an
actor __init__; see the actor-pool sizing rule in queries.py).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .dedup import batch_gram_hashes

# Patterns restricted to syntax with identical semantics in Python `re`
# and RE2 (DuckDB): char classes, bounded repeats, \d, \b. No lookaround,
# no backreferences. Compiled with re.ASCII because RE2's \d and \b are
# ASCII-only while Python's are Unicode-aware on str (e.g. '١٢٣' matches
# \d without the flag) — re.ASCII pins both engines to the same character
# classes so the redacted-text hash parity holds on non-ASCII corpora
# (ADVICE r3).
EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
                      re.ASCII)
IPV4_RE = re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", re.ASCII)
PHONE_RE = re.compile(r"\d{3}-\d{3}-\d{4}", re.ASCII)

# the same patterns as SQL string literals (single-quoted SQL does not
# process backslashes, so these are byte-identical to the Python sources)
EMAIL_SQL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_SQL = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
PHONE_SQL = "\\d{3}-\\d{3}-\\d{4}"


def pii_redact_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Count and redact PII in one vectorized pass per pattern.

    Counts are taken on the ORIGINAL text; redaction replaces matches
    with typed placeholder tags in a fixed order (email → ip → phone —
    the earlier placeholders contain no digits/dots, so later patterns
    never match inside them)."""
    text = df["text"]
    n_emails = text.str.count(EMAIL_RE).astype("int64")
    n_ips = text.str.count(IPV4_RE).astype("int64")
    n_phones = text.str.count(PHONE_RE).astype("int64")
    clean = (text.str.replace(EMAIL_RE, "<EMAIL>", regex=True)
                 .str.replace(IPV4_RE, "<IP>", regex=True)
                 .str.replace(PHONE_RE, "<PHONE>", regex=True))
    return pd.DataFrame({
        "doc_id": df["doc_id"].to_numpy(),
        "n_emails": n_emails.to_numpy(),
        "n_ips": n_ips.to_numpy(),
        "n_phones": n_phones.to_numpy(),
        "clean_text": clean.to_numpy(),
    })


class Decontaminate:
    """Per-batch benchmark-overlap scorer: the benchmark's unique shingle
    hashes arrive as ONE broadcast object (ray.put'd sorted uint64 array,
    read once per actor), each batch does one vectorized k-gram hash pass
    (`batch_gram_hashes`) + `np.isin` + a per-doc `reduceat` sum.

    At 100 TB the benchmark side stays small (eval suites are a few
    thousand documents) while the training side streams — the canonical
    broadcast-small-side shape."""

    def __init__(self, bench_ref, k: int = 8):
        import ray
        self.bench = np.sort(np.asarray(ray.get(bench_ref), dtype=np.uint64))
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        grams, offsets = batch_gram_hashes(list(df["text"]), k=self.k)
        known = np.isin(grams, self.bench, assume_unique=False)
        n_shingles = np.diff(offsets).astype(np.int64)
        n_overlap = np.add.reduceat(
            known.astype(np.int64), offsets[:-1]) if len(grams) else \
            np.zeros(len(df), np.int64)
        # reduceat quirk: offsets[i] == offsets[i+1] (impossible here —
        # batch_gram_hashes guarantees >=1 gram per doc) would repeat a
        # neighbor's slice; guarded by the >=1 contract.
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_shingles": n_shingles,
            "n_overlap": n_overlap,
            "contaminated": n_overlap > 0,
        })


def bench_shingles(texts, k: int = 8) -> np.ndarray:
    """Unique shingle hashes of the benchmark corpus (driver-side: the
    benchmark set is small by construction; broadcast the result once)."""
    if len(texts) == 0:
        return np.empty(0, np.uint64)
    grams, _ = batch_gram_hashes(list(texts), k=k)
    return np.unique(grams)
