"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with sidecar metadata
(media_type, n_bytes, checksum). The decode/feature kernels themselves are
STUBBED (no image/audio libraries in this container — ``DecodeImage`` raises
``NotImplementedError`` unless given the deterministic fake decoder), but the
Ray-side plumbing is real and tested: actor-pool ``map_batches`` signature,
small batch sizes for large payloads, Arrow binary in / fixed-shape features
out, and the partitioned output layout.

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


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for an image decode: 8×8×1 'pixels' derived
    from the payload bytes (so tests exercise real array plumbing)."""
    h = hashlib.sha256(payload or b"").digest()
    base = np.frombuffer((h * 2)[:64], dtype=np.uint8)
    return base.reshape(8, 8).astype(np.float32) / 255.0


class DecodeImage:
    """Actor-pool decode stage: (id, payload: binary) → (id, feature: list<float>).

    ``decoder`` is loaded once per actor in ``__init__`` (the model-load
    slot). The real decoder (PIL/libvips/ffmpeg) is not available in this
    container; pass ``use_fake=True`` for the deterministic fake, otherwise
    the first batch raises ``NotImplementedError`` with guidance.

    Usage::

        ds.map_batches(DecodeImage, fn_constructor_kwargs={"use_fake": True},
                       batch_format="pyarrow", batch_size=32,
                       concurrency=(1, 8))
    """

    def __init__(self, use_fake: bool = False, payload_col: str = "payload"):
        self.payload_col = payload_col
        if use_fake:
            self.decoder = fake_decode
        else:
            self.decoder = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder is None:
            raise NotImplementedError(
                "No image decoder available in this environment; construct with "
                "use_fake=True for the deterministic test decoder, or plug a real "
                "decoder callable taking bytes -> np.ndarray."
            )
        feats = [
            self.decoder(p).mean(axis=0).tolist()  # 8-dim column-mean feature
            for p in batch.column(self.payload_col).to_pylist()
        ]
        out = batch.drop_columns([self.payload_col])
        return out.append_column(
            "feature", pa.array(feats, pa.list_(pa.float32()))
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
    """Deterministic fake media table derived from documents: the html bytes
    of the synthesized page stand in for an image/video payload."""
    from kgw_ray.sources.pages import pages_dataset

    def to_media(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": batch.column("doc_id"),
                "media_type": pa.array(["image/x-fake"] * batch.num_rows, pa.string()),
                "payload": batch.column("html"),
            }
        )

    return pages_dataset(sf_dir).map_batches(to_media, batch_format="pyarrow")
