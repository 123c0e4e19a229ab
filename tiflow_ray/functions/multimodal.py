"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with metadata columns beside
them. The decode/feature kernels themselves are STUBBED (no codec libs in
this container) behind `DecodeStub`, but the Ray-side plumbing is real and
tested: actor-pool `map_batches` stage, small `batch_size` for wide binary
rows, pyarrow-native batches end-to-end (binary columns must NOT round-trip
through pandas object dtype).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def to_binary_payload(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Model a binary modality from a text column (deterministic stand-in
    for raw image/audio bytes)."""
    payload = t[text_col].cast(pa.binary())
    return pa.table({
        "doc_id": t["doc_id"],
        "payload": payload,
        "n_bytes": pc.binary_length(payload).cast(pa.int64()),
    })


class DecodeStub:
    """Actor-pool decode stage. A real deployment drops in PIL/ffmpeg here
    (loaded once per actor in __init__); this stub extracts deterministic
    pseudo-features so the pipeline shape, schema and batching are testable.

    Raises NotImplementedError for real_decode=True to make the stubbed
    boundary explicit.
    """

    def __init__(self, real_decode: bool = False):
        if real_decode:
            raise NotImplementedError(
                "no image/audio codecs in this environment; plug a decoder "
                "(e.g. PIL.Image.open) into DecodeStub and set real_decode")
        # "model load" happens here, once per actor

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(p).digest()[8:16], "little")
             for p in payloads),
            dtype=np.uint64, count=len(payloads))
        # pseudo "width/height" features from the digest — stands in for
        # decoded image dims; downstream schema is what matters
        return pa.table({
            "doc_id": t["doc_id"],
            "n_bytes": t["n_bytes"],
            "content_hash": pa.array(h),
            "feat_w": pa.array((h % np.uint64(1920)).astype(np.int64)),
            "feat_h": pa.array(((h >> np.uint64(16)) % np.uint64(1080)).astype(np.int64)),
        })
