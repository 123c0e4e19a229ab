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


# ---------------------------------------------------------------------------
# real decode tier: WAV (RIFF/PCM16) audio — pure numpy
# ---------------------------------------------------------------------------

def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """A valid mono 16-bit PCM WAV file (RIFF header + fmt + data)."""
    import struct
    pcm = samples.astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt " + \
        struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16) + \
        b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse RIFF/PCM16 → (sample_rate, int16 samples) — a real header
    walk over the chunk structure, no audio libs."""
    import struct
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, rate, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i:i + 4]
        size = struct.unpack("<I", payload[i + 4:i + 8])[0]
        body = payload[i + 8:i + 8 + size]
        if cid == b"fmt ":
            fmt, ch, rate = struct.unpack("<HHI", body[:8])
            assert fmt == 1 and ch == 1, "PCM mono only"
        elif cid == b"data":
            data = np.frombuffer(body, "<i2")
        i += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, data


def doc_to_wav_payload(t: pa.Table) -> pa.Table:
    """Deterministic constant-amplitude square wave per doc (amplitude and
    length are pure functions of doc_id → features are closed-form)."""
    payloads = []
    for d in t["doc_id"].to_numpy():
        d = int(d)
        n = 64 + d % 32
        amp = 100 + d % 1000
        s = np.full(n, amp, np.int16)
        s[1::2] = -amp
        payloads.append(encode_wav(16_000, s))
    return pa.table({"doc_id": t["doc_id"],
                     "payload": pa.array(payloads, pa.binary())})


class DecodeWav:
    """Actor-pool audio featurizer: real RIFF parse → n_samples / peak /
    mean-abs features."""

    def __call__(self, t: pa.Table) -> pa.Table:
        rates, ns, peak, mean_abs = [], [], [], []
        for p in t["payload"].to_pylist():
            rate, s = decode_wav(p)
            rates.append(rate)
            ns.append(len(s))
            a = np.abs(s.astype(np.int64))
            peak.append(int(a.max()))
            mean_abs.append(int(a.mean()))   # exact for constant |amp|
        return pa.table({
            "doc_id": t["doc_id"],
            "sample_rate": pa.array(rates, pa.int64()),
            "n_samples": pa.array(ns, pa.int64()),
            "peak": pa.array(peak, pa.int64()),
            "mean_abs": pa.array(mean_abs, pa.int64()),
        })


# ---------------------------------------------------------------------------
# real transform tier: frame sampling over multi-frame (video-like) payloads
# ---------------------------------------------------------------------------

def doc_to_frames_payload(t: pa.Table) -> pa.Table:
    """A crude 'video': N concatenated PPM frames per doc (N = 4 + d%5),
    frame f carrying channel value (d + f) % 256 — per-frame features stay
    closed-form."""
    payloads, n_frames = [], []
    for d in t["doc_id"].to_numpy():
        d = int(d)
        n = 4 + d % 5
        frames = b"".join(encode_ppm(8, 6, ((d + f) % 256, 0, 0))
                          for f in range(n))
        payloads.append(frames)
        n_frames.append(n)
    return pa.table({"doc_id": t["doc_id"],
                     "payload": pa.array(payloads, pa.binary()),
                     "n_frames": pa.array(n_frames, pa.int64())})


def split_ppm_frames(payload: bytes) -> list[bytes]:
    """Split concatenated P6 frames by walking each header + pixel size."""
    out, i = [], 0
    while i < len(payload):
        assert payload[i:i + 2] == b"P6", "corrupt frame boundary"
        j, fields = i + 2, []
        while len(fields) < 3:
            while payload[j:j + 1].isspace():
                j += 1
            k = j
            while not payload[k:k + 1].isspace():
                k += 1
            fields.append(int(payload[j:k]))
            j = k
        j += 1
        end = j + fields[0] * fields[1] * 3
        out.append(payload[i:end])
        i = end
    return out


class FrameSample:
    """Actor-pool frame sampler: decode every `stride`-th frame of each
    multi-frame payload, feature = mean red channel of the FIRST sampled
    frame + sampled-frame count (the frame-sample → per-frame-featurize
    shape of a video preprocessing pipeline)."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        n_sampled, first_r = [], []
        for p in t["payload"].to_pylist():
            frames = split_ppm_frames(p)[::self.stride]
            n_sampled.append(len(frames))
            img = decode_ppm(frames[0])
            first_r.append(int(round(img[..., 0].mean())))
        return pa.table({
            "doc_id": t["doc_id"],
            "n_frames": t["n_frames"],
            "n_sampled": pa.array(n_sampled, pa.int64()),
            "first_frame_mean_r": pa.array(first_r, pa.int64()),
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
