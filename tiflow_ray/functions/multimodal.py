"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with metadata columns beside
them. Two decode tiers:

- **PPM (P6) images are REALLY decoded** — header parse + numpy pixel
  buffer + nearest-neighbor resize + per-channel means, no external libs
  (`encode_ppm` / `DecodePpm` / `resize_nearest`). This exercises the full
  decode→transform→featurize actor pipeline with genuine bytes-in,
  array-out kernels.
- PIL/ffmpeg-class codecs (JPEG/PNG/audio/video) stay STUBBED behind
  `DecodeStub` (no codec libs in this container) — the boundary raises
  NotImplementedError explicitly.

Ray-side plumbing in both tiers: actor-pool `map_batches` stage ("model"
load once per actor), small `batch_size` for wide binary rows,
pyarrow-native batches end-to-end (binary columns must NOT round-trip
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


# ---------------------------------------------------------------------------
# real decode tier: PPM (P6) — binary RGB images, pure numpy
# ---------------------------------------------------------------------------

def encode_ppm(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """A valid binary-PPM (P6) image with constant per-channel values."""
    header = f"P6\n{width} {height}\n255\n".encode()
    px = np.empty((height, width, 3), np.uint8)
    px[..., 0], px[..., 1], px[..., 2] = rgb
    return header + px.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Parse a P6 PPM into an (h, w, 3) uint8 array — a REAL bytes→pixels
    decode (header tokenizer + buffer reshape), no codec libs needed."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic, width, height, maxval — whitespace/comment separated
    fields, i = [], 2
    while len(fields) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":               # comment line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1                                          # single ws after maxval
    w, h, maxval = fields
    assert maxval == 255, "only 8-bit PPM supported"
    return np.frombuffer(payload, np.uint8, count=w * h * 3,
                         offset=i).reshape(h, w, 3)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (index gather — vectorized)."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return img[yi[:, None], xi[None, :]]


def doc_to_ppm_payload(t: pa.Table) -> pa.Table:
    """Synthesize a deterministic PPM image per doc (dims + channel values
    are pure functions of doc_id, so downstream features are
    oracle-checkable) — the stand-in for reading real image bytes."""
    ids = t["doc_id"].to_numpy()
    payloads = [encode_ppm(16 + int(d) % 8, 12 + int(d) % 4,
                           (int(d) % 256, (int(d) * 7) % 256,
                            (int(d) * 13) % 256))
                for d in ids]
    return pa.table({
        "doc_id": t["doc_id"],
        "payload": pa.array(payloads, pa.binary()),
    })


class DecodePpm:
    """Actor-pool stage: REAL decode → resize → featurize per image.
    Target size is the 'model config' held by the actor."""

    def __init__(self, out_w: int = 8, out_h: int = 8):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, t: pa.Table) -> pa.Table:
        ws, hs, mr, mg, mb = [], [], [], [], []
        for p in t["payload"].to_pylist():
            img = decode_ppm(p)
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            small = resize_nearest(img, self.out_w, self.out_h)
            means = small.reshape(-1, 3).mean(axis=0)
            mr.append(int(round(means[0])))
            mg.append(int(round(means[1])))
            mb.append(int(round(means[2])))
        return pa.table({
            "doc_id": t["doc_id"],
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "mean_r": pa.array(mr, pa.int64()),
            "mean_g": pa.array(mg, pa.int64()),
            "mean_b": pa.array(mb, pa.int64()),
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
