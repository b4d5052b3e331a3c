"""Multimodal column plumbing (task brief).

Image/audio/video payloads are opaque ``binary`` columns with typed metadata.
The decode libraries (PIL/ffmpeg/...) are NOT in this container, so the
decode kernel is STUBBED (deterministic fake via ``FakeDecoder``; the real
path raises NotImplementedError) — but the Ray-side plumbing is real and
tested: actor-pool ``map_batches`` with small ``batch_size`` (large payloads
per row), schema handling, and the feature-output layout.

MEDIA_SCHEMA:
    media_id:int64, kind:string ('image'|'audio'), payload:binary,
    width:int32, height:int32, sample_rate:int32

FEATURES_SCHEMA:
    media_id:int64, kind:string, n_bytes:int64, sha16:string,
    feature:list<float>  (fixed 32-dim embedding from the decoder)
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("kind", pa.string()),
    pa.field("payload", pa.binary()),
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
    pa.field("sample_rate", pa.int32()),
])

FEATURE_DIM = 32


class RealDecoder:
    """Placeholder for the real decode path (image/audio libs absent)."""

    def decode(self, payload: bytes, kind: str) -> np.ndarray:
        raise NotImplementedError(
            "media decode requires PIL/torchaudio/ffmpeg — not available in "
            "this environment; use FakeDecoder for pipeline testing")


class FakeDecoder:
    """Deterministic fake: 32-dim feature = normalized bytes of sha256."""

    def decode(self, payload: bytes, kind: str) -> np.ndarray:
        h = hashlib.sha256(payload or b"").digest()
        v = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
        return (v - 127.5) / 127.5


class MediaFeatureExtract:
    """Actor-pool stage: decode + featurize media rows.

    Construct once per actor (decoder init = the 'model load'); use small
    batch_size so payload_bytes x batch x concurrency fits worker heap.
    """

    def __init__(self, decoder: Optional[object] = None):
        self.decoder = decoder if decoder is not None else FakeDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        nb, sha, feats = [], [], []
        for p, k in zip(payloads, kinds):
            p = p or b""
            nb.append(len(p))
            sha.append(hashlib.sha256(p).hexdigest()[:16])
            feats.append(self.decoder.decode(p, k).tolist())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "n_bytes": pa.array(nb, pa.int64()),
            "sha16": pa.array(sha, pa.string()),
            "feature": pa.array(feats, pa.list_(pa.float64())),
        })


def media_features_dataset(media, concurrency=(1, 4), batch_size: int = 32):
    """media Dataset (MEDIA_SCHEMA) -> features Dataset (actor pool)."""
    return media.map_batches(
        MediaFeatureExtract, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)


def synth_media_from_documents(docs):
    """Deterministic fake media table derived from documents (no external
    data): payload = utf-8 bytes of text, kind alternates image/audio."""

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = [x or "" for x in batch.column("text").to_pylist()]
        kinds = ["image" if i % 2 == 0 else "audio" for i in ids]
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array([t.encode("utf-8") for t in texts], pa.binary()),
            "width": pa.array([64 if k == "image" else 0 for k in kinds], pa.int32()),
            "height": pa.array([64 if k == "image" else 0 for k in kinds], pa.int32()),
            "sample_rate": pa.array([0 if k == "image" else 16000 for k in kinds], pa.int32()),
        })

    return docs.map_batches(to_media, batch_format="pyarrow")


# ---------------- video frame sampling + image resize plumbing ----------------

VIDEO_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("kind", pa.string()),           # 'video'
    pa.field("payload", pa.binary()),        # n_frames x frame_bytes packed
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
    pa.field("n_frames", pa.int32()),
])


class FrameSampler:
    """Actor-pool stage: sample every ``every_n``-th frame of video rows.

    The container parse is the stubbed kernel (a real deployment plugs
    ffmpeg into ``_frames``); the deterministic fake treats the payload as
    ``n_frames`` fixed-size packed frames (width x height bytes). The Ray
    plumbing — one input row fanning out to many frame rows, small batches
    for large payloads, per-actor construction — is the real, tested part.
    """

    def __init__(self, every_n: int = 5, real: bool = False):
        self.every_n = max(1, int(every_n))
        self.real = real

    def _frames(self, payload: bytes, w: int, h: int, n_frames: int):
        if self.real:
            raise NotImplementedError(
                "video decode requires ffmpeg — not available here")
        fb = max(1, w * h)
        return [payload[i * fb:(i + 1) * fb] for i in range(n_frames)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, fidx, fpay, fsha = [], [], [], []
        for mid, kind, payload, w, h, nf in zip(
                batch.column("media_id").to_pylist(),
                batch.column("kind").to_pylist(),
                batch.column("payload").to_pylist(),
                batch.column("width").to_pylist(),
                batch.column("height").to_pylist(),
                batch.column("n_frames").to_pylist()):
            if kind != "video":
                continue
            frames = self._frames(payload or b"", int(w), int(h), int(nf))
            for i in range(0, len(frames), self.every_n):
                mids.append(mid)
                fidx.append(i)
                fpay.append(frames[i])
                fsha.append(hashlib.sha256(frames[i]).hexdigest()[:16])
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "frame": pa.array(fpay, pa.binary()),
            "sha16": pa.array(fsha, pa.string()),
        })


def frame_sample_dataset(media, every_n: int = 5, concurrency=(1, 4),
                         batch_size: int = 16):
    """video Dataset (VIDEO_SCHEMA) -> sampled frame rows (actor pool;
    small batch_size: each input row can be many MB and fans out)."""
    return media.map_batches(FrameSampler, fn_constructor_args=(every_n,),
                             batch_format="pyarrow", batch_size=batch_size,
                             concurrency=concurrency)


class ImageResizer:
    """Actor-pool stage: resize image payloads to (out_w, out_h).

    Real path (PIL) is stubbed; the deterministic fake resamples the raw
    byte grid with nearest-neighbour strides — enough to exercise payload
    transforms that SHRINK rows mid-pipeline (output batches are smaller
    than input batches, the shape Ray must handle for real resizes).
    """

    def __init__(self, out_w: int = 16, out_h: int = 16, real: bool = False):
        self.out_w, self.out_h, self.real = int(out_w), int(out_h), real

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:
            raise NotImplementedError("image resize requires PIL")
        out_pay, out_w, out_h = [], [], []
        for payload, w, h in zip(batch.column("payload").to_pylist(),
                                 batch.column("width").to_pylist(),
                                 batch.column("height").to_pylist()):
            p = payload or b""
            w, h = max(1, int(w)), max(1, int(h))
            grid = np.frombuffer(p.ljust(w * h, b"\0")[:w * h], dtype=np.uint8)
            grid = grid.reshape(h, w)
            yi = (np.arange(self.out_h) * h) // self.out_h
            xi = (np.arange(self.out_w) * w) // self.out_w
            out_pay.append(grid[np.ix_(yi, xi)].tobytes())
            out_w.append(self.out_w)
            out_h.append(self.out_h)
        out = pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "payload": pa.array(out_pay, pa.binary()),
            "width": pa.array(out_w, pa.int32()),
            "height": pa.array(out_h, pa.int32()),
        })
        return out


def resize_images_dataset(media, out_w: int = 16, out_h: int = 16,
                          concurrency=(1, 4), batch_size: int = 32):
    return media.map_batches(ImageResizer, fn_constructor_args=(out_w, out_h),
                             batch_format="pyarrow", batch_size=batch_size,
                             concurrency=concurrency)


def synth_video_from_documents(docs, width: int = 8, height: int = 8,
                               n_frames: int = 12):
    """Deterministic fake video table: payload = text bytes tiled/padded to
    n_frames x (width x height) packed frames."""
    fb = width * height

    def to_video(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = [x or "" for x in batch.column("text").to_pylist()]
        pays = []
        for t in texts:
            raw = t.encode("utf-8")
            need = fb * n_frames
            rep = (raw * (need // max(1, len(raw)) + 1))[:need] if raw else b"\0" * need
            pays.append(rep)
        n = len(ids)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["video"] * n, pa.string()),
            "payload": pa.array(pays, pa.binary()),
            "width": pa.array([width] * n, pa.int32()),
            "height": pa.array([height] * n, pa.int32()),
            "n_frames": pa.array([n_frames] * n, pa.int32()),
        })

    return docs.map_batches(to_video, batch_format="pyarrow")
