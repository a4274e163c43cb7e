"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with sidecar metadata
(media_type, n_bytes, checksum). The image path is REAL end to end for the
PPM (P6) container: a dependency-free pure-python codec (``encode_ppm`` /
``decode_ppm``) decodes pixel arrays inside the actor-pool stage and
produces real shape/intensity features. Formats needing native libraries
(JPEG/PNG/audio/video) stay stubbed behind ``DecodeImage(decoder=None)``
(raises with guidance) — the Ray-side plumbing (actor-pool ``map_batches``
signature, small batch sizes for large payloads, Arrow binary in /
fixed-shape features out) is identical for a real libvips/ffmpeg decoder.

Scale notes: binary payloads dominate block size — stages here default to
``batch_size=32`` so batch × concurrency stays within a worker heap even at
multi-MB payloads; blocks of decoded features are fixed-width and compact.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import ray.data as rd


def media_metadata_batch(batch: pa.Table, *, payload_col: str = "payload") -> pa.Table:
    """binary payloads → (… , n_bytes, sha256, crc32) sidecar metadata."""
    payloads = batch.column(payload_col).to_pylist()
    n_bytes = [len(p) if p is not None else 0 for p in payloads]
    sha = [hashlib.sha256(p or b"").hexdigest() for p in payloads]
    crc = [zlib.crc32(p or b"") for p in payloads]
    out = batch.drop_columns([payload_col])
    return (
        out.append_column("n_bytes", pa.array(n_bytes, pa.int64()))
        .append_column("sha256", pa.array(sha, pa.string()))
        .append_column("crc32", pa.array(crc, pa.int64()))
    )


# ---------------------------------------------------------------------------
# PPM (P6) codec — pure python + numpy, no imaging libraries
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array → binary PPM (P6), the netpbm raw format."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"PPM needs (h, w, 3) pixels, got shape {arr.shape}")
    h, w = arr.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode("ascii") + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8 pixels.

    Full header grammar: '#' comments and any whitespace between the magic,
    dimensions and maxval tokens; raster read zero-copy via np.frombuffer.
    """
    if not payload or payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields: list[int] = []
    n = len(payload)
    while len(fields) < 3:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos : pos + 1] == b"#":
            while pos < n and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    pos += 1  # single whitespace byte after maxval, per spec
    raster = payload[pos : pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def ppm_features(pixels: np.ndarray) -> list[float]:
    """(h, w, 3) pixels → 8-dim feature: [h, w, mean_r, mean_g, mean_b,
    std_r, std_g, std_b] (intensities normalized to [0, 1], 6 dp)."""
    f = pixels.astype(np.float64) / 255.0
    mean = f.mean(axis=(0, 1))
    std = f.std(axis=(0, 1))
    return [
        float(pixels.shape[0]),
        float(pixels.shape[1]),
        *(round(float(x), 6) for x in mean),
        *(round(float(x), 6) for x in std),
    ]


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for an image decode: 8×8×1 'pixels' derived
    from the payload bytes (so tests exercise real array plumbing)."""
    h = hashlib.sha256(payload or b"").digest()
    base = np.frombuffer((h * 2)[:64], dtype=np.uint8)
    return base.reshape(8, 8).astype(np.float32) / 255.0


class DecodeImage:
    """Actor-pool decode stage: (id, payload: binary) → (id, feature: list<float>).

    ``decoder`` is loaded once per actor in ``__init__`` (the model-load
    slot). Default ``"ppm"`` is the REAL pure-python P6 decoder with
    shape/intensity features; ``use_fake=True`` selects the deterministic
    hash decoder (any payload); ``decoder=None`` models a format whose
    native library (PIL/libvips/ffmpeg) is absent — the first batch raises
    ``NotImplementedError`` with guidance, the honest-stub contract.

    Usage::

        ds.map_batches(DecodeImage, batch_format="pyarrow", batch_size=32,
                       concurrency=(1, 8))
    """

    def __init__(
        self,
        use_fake: bool = False,
        payload_col: str = "payload",
        decoder: str | None = "ppm",
    ):
        self.payload_col = payload_col
        if use_fake:
            self.decoder = fake_decode
            self.features = lambda arr: [round(float(x), 6) for x in arr.mean(axis=0)]
        elif decoder == "ppm":
            self.decoder = decode_ppm
            self.features = ppm_features
        else:
            self.decoder = None
            self.features = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder is None:
            raise NotImplementedError(
                "No native decoder for this media format in this environment; "
                "use the built-in pure-python decoder (decoder='ppm'), "
                "use_fake=True for the deterministic test decoder, or plug a "
                "real decoder callable taking bytes -> np.ndarray."
            )
        feats = [
            self.features(self.decoder(p))
            for p in batch.column(self.payload_col).to_pylist()
        ]
        out = batch.drop_columns([self.payload_col])
        return out.append_column(
            "feature", pa.array(feats, pa.list_(pa.float32()))
        )


def resize_ppm(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, 3) raster — pure numpy fancy
    indexing (the sampling grid matches the standard pixel-center
    convention: src = floor((i + 0.5) * scale))."""
    h, w = pixels.shape[:2]
    rows = np.minimum(((np.arange(out_h) + 0.5) * (h / out_h)).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * (w / out_w)).astype(np.int64), w - 1)
    return pixels[rows[:, None], cols[None, :]]


class ResizeImage:
    """Actor-pool resize stage: PPM payload in → resized PPM payload out
    (decode → nearest-neighbor resample → re-encode, all pure python/numpy).
    The real-libs version (vips thumbnail) drops into the same signature.

    Output: (…, width, height, payload) with payload a valid P6 image of
    the target size.
    """

    def __init__(self, out_h: int = 16, out_w: int = 16, payload_col: str = "payload"):
        self.out_h, self.out_w = out_h, out_w
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        resized = [
            encode_ppm(resize_ppm(decode_ppm(p), self.out_h, self.out_w))
            for p in batch.column(self.payload_col).to_pylist()
        ]
        out = batch.drop_columns([self.payload_col])
        return (
            out.append_column("width", pa.array([self.out_w] * len(resized), pa.int64()))
            .append_column("height", pa.array([self.out_h] * len(resized), pa.int64()))
            .append_column("payload", pa.array(resized, pa.binary()))
        )


def frame_sample_batch(
    batch: pa.Table, *, payload_col: str = "payload", every_n: int = 4
) -> pa.Table:
    """'Video' frame sampling stub: split each payload into fixed-size
    chunks ('frames') and keep every ``every_n``-th — one output row per
    kept frame (a flat_map-shaped batch fn). Real frame decode would slot
    into the same shape."""
    ids = batch.column("media_id").to_pylist()
    payloads = batch.column(payload_col).to_pylist()
    out_ids, out_idx, out_frames = [], [], []
    FRAME = 256
    for mid, p in zip(ids, payloads):
        p = p or b""
        frames = [p[i : i + FRAME] for i in range(0, len(p), FRAME)]
        for fi in range(0, len(frames), every_n):
            out_ids.append(mid)
            out_idx.append(fi)
            out_frames.append(frames[fi])
    return pa.table(
        {
            "media_id": pa.array(out_ids, pa.int64()),
            "frame_idx": pa.array(out_idx, pa.int64()),
            "frame": pa.array(out_frames, pa.binary()),
        }
    )


def synth_media_dataset(sf_dir: str) -> rd.Dataset:
    """Deterministic media table: one REAL PPM (P6) image per document —
    pixels are the doc's utf-8 text bytes tiled into an (h, w, 3) raster
    whose dimensions vary by doc_id. Pure functions of the documents table
    (no external data), decodable by any netpbm reader."""
    from kgw_ray.sources.readers import read_table

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        payloads = []
        for d, t in zip(ids, texts):
            w, h = 16 + (d % 17), 12 + (d % 13)
            src = np.frombuffer((t or " ").encode("utf-8"), dtype=np.uint8)
            payloads.append(encode_ppm(np.resize(src, (h, w, 3))))
        return pa.table(
            {
                "media_id": batch.column("doc_id"),
                "media_type": pa.array(
                    ["image/x-portable-pixmap"] * batch.num_rows, pa.string()
                ),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        to_media, batch_format="pyarrow"
    )
