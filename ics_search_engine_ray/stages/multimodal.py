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
