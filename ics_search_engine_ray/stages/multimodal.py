"""Multimodal column plumbing (task brief).

Image/audio/video payloads are opaque ``binary`` columns with typed metadata.

Decode surface, honestly partitioned by what this container permits:
- REAL: ``PpmWavDecoder`` fully parses binary PPM (P6) images and mono
  PCM16 WAV (RIFF) audio with numpy alone — header validation, chunk
  walking, exact pixel/sample recovery (unit-tested against hand-built
  payloads, including negative PCM samples and space-valued raster
  bytes). ``RealMediaDigest`` runs it in an actor pool and emits
  SQL-replicable decoded-essence digests (the ``media_decode`` oracle).
- STUBBED: codec formats (JPEG/PNG/MP3/H.264) need PIL/ffmpeg, absent
  here; ``RealDecoder``/``FrameSampler(real=True)`` raise with that
  message, and ``FakeDecoder`` exercises the same plumbing shape
  (actor-pool ``map_batches``, small ``batch_size`` for large payloads,
  schema handling, feature-output layout).

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
    """Placeholder for the codec decode path (JPEG/PNG/MP3 libs absent).
    Library-free STANDARD formats (P6 PPM, PCM WAV) have a fully real
    decoder below — :class:`PpmWavDecoder`."""

    def decode(self, payload: bytes, kind: str) -> np.ndarray:
        raise NotImplementedError(
            "codec decode (JPEG/PNG/MP3/H.264) requires PIL/torchaudio/"
            "ffmpeg — not available in this environment; PPM/WAV decode "
            "is real (PpmWavDecoder); use FakeDecoder for plumbing tests")


class PpmWavDecoder:
    """REAL media decoding for the two standard formats that need no
    external library: binary PPM (P6, Netpbm) images and PCM16 WAV
    (RIFF) audio — both parsed with numpy only. This is not a stub: it
    rejects malformed headers, honors the declared dimensions, and the
    32-dim feature it emits is a documented, SQL-replicable function of
    the DECODED pixels/samples (so the driver oracle checks the decode
    itself, not just the plumbing).

    Feature layout (all values exact rationals of integer pixel/sample
    statistics — float only at the final division):
      image: f[0:26] 26-bin histogram of gray = (r+g+b)//3 over
             bin = gray*26//256, normalized by n_pixels;
             f[26:29] channel means / 255; f[29] w/64; f[30] h/64;
             f[31] n_pixels/4096.
      audio: f[0:26] 26-bin histogram of sample*26//32768 (PCM16 LE,
             non-negative by construction here); f[26] mean/32768;
             f[27] max/32768; f[28] min/32768; f[29] rate/16000;
             f[30] n_samples/1000; f[31] 0.
    """

    _PPM_HDR = __import__("re").compile(
        rb"^P6[ \t\r\n]+(\d+)[ \t\r\n]+(\d+)[ \t\r\n]+(\d+)[ \t\r\n]")

    def parse_ppm(self, payload: bytes) -> np.ndarray:
        if not payload.startswith(b"P6"):
            raise ValueError("not a P6 PPM payload")
        # header: P6 <ws> width <ws> height <ws> maxval <ONE ws> raster.
        # Parsed with an anchored regex, NOT split(): split() collapses
        # whitespace runs and would strip raster bytes that happen to be
        # 0x20 (a real decoder bug the roundtrip test caught).
        m = self._PPM_HDR.match(payload)
        if not m:
            raise ValueError("truncated PPM header")
        w, h, maxval = (int(m.group(1)), int(m.group(2)),
                        int(m.group(3)))
        if maxval != 255:
            raise ValueError(f"only maxval=255 supported, got {maxval}")
        raster = payload[m.end():]
        need = w * h * 3
        if len(raster) < need:
            raise ValueError(f"PPM raster short: {len(raster)} < {need}")
        return np.frombuffer(raster[:need], np.uint8).reshape(h, w, 3)

    def parse_wav(self, payload: bytes) -> tuple:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE payload")
        pos, rate, bits, channels, data = 12, None, None, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            sz = int.from_bytes(payload[pos + 4:pos + 8], "little")
            body = payload[pos + 8:pos + 8 + sz]
            if cid == b"fmt ":
                channels = int.from_bytes(body[2:4], "little")
                rate = int.from_bytes(body[4:8], "little")
                bits = int.from_bytes(body[14:16], "little")
            elif cid == b"data":
                data = body
            pos += 8 + sz + (sz & 1)
        if rate is None or data is None:
            raise ValueError("WAV missing fmt/data chunk")
        if bits != 16 or channels != 1:
            raise ValueError(f"only mono PCM16 supported "
                             f"(got {bits}-bit x{channels})")
        samples = np.frombuffer(
            data[:len(data) // 2 * 2], np.dtype("<i2")).astype(np.int64)
        return samples, rate

    def decode(self, payload: bytes, kind: str) -> np.ndarray:
        f = np.zeros(FEATURE_DIM, np.float64)
        if kind == "image":
            px = self.parse_ppm(payload or b"")
            h, w = px.shape[0], px.shape[1]
            n = h * w
            gray = px.astype(np.int64).sum(axis=2) // 3
            bins = np.bincount((gray.ravel() * 26) // 256, minlength=26)
            f[0:26] = bins[:26] / n
            f[26:29] = px.reshape(-1, 3).astype(np.int64).sum(0) \
                / (255.0 * n)
            f[29] = w / 64.0
            f[30] = h / 64.0
            f[31] = n / 4096.0
        elif kind == "audio":
            s, rate = self.parse_wav(payload or b"")
            if s.size == 0:
                raise ValueError("empty WAV data chunk")
            sc = np.clip(s, 0, 32767)     # histogram domain (synthetic
            bins = np.bincount((sc * 26) // 32768, minlength=26)  # >= 0)
            f[0:26] = bins[:26] / s.size
            f[26] = s.sum() / (32768.0 * s.size)
            f[27] = s.max() / 32768.0
            f[28] = s.min() / 32768.0
            f[29] = rate / 16000.0
            f[30] = s.size / 1000.0
        else:
            raise NotImplementedError(f"kind {kind!r}: video containers "
                                      f"need ffmpeg (absent)")
        return f


def wav_header(n_samples: int, rate: int = 8000) -> bytes:
    """44-byte canonical RIFF header for mono PCM16 — a CONSTANT for
    fixed (n_samples, rate), which is what lets the SQL oracle embed it
    as a hex literal."""
    nbytes = n_samples * 2
    return (b"RIFF" + (36 + nbytes).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little")          # PCM
            + (1).to_bytes(2, "little")          # mono
            + rate.to_bytes(4, "little")
            + (rate * 2).to_bytes(4, "little")   # byte rate
            + (2).to_bytes(2, "little")          # block align
            + (16).to_bytes(2, "little")         # bits
            + b"data" + nbytes.to_bytes(4, "little"))


def synth_real_media_from_documents(docs, w: int = 8, h: int = 8,
                                    rate: int = 8000,
                                    n_samples: int = 100):
    """REAL-format media table from the documents corpus: even doc_ids
    become valid P6 PPM images (pixel bytes = the doc's ASCII text tiled
    over the raster), odd doc_ids become valid mono PCM16 WAV files
    (sample bytes = the text tiled over the data chunk). Deterministic,
    byte-reproducible in SQL (header literals + repeat/substring), and
    every payload round-trips through :class:`PpmWavDecoder`."""
    ppm_hdr = f"P6\n{w} {h}\n255\n".encode()
    wav_hdr = wav_header(n_samples, rate)
    need_img = w * h * 3
    need_wav = n_samples * 2

    def tile(text: str, n: int) -> bytes:
        raw = (text or " ").encode("utf-8") or b" "
        return (raw * (n // len(raw) + 1))[:n]

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = [x or "" for x in batch.column("text").to_pylist()]
        kinds = ["image" if i % 2 == 0 else "audio" for i in ids]
        pays = [ppm_hdr + tile(t, need_img) if k == "image"
                else wav_hdr + tile(t, need_wav)
                for t, k in zip(texts, kinds)]
        n = len(ids)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(pays, pa.binary()),
            "width": pa.array([w if k == "image" else 0 for k in kinds],
                              pa.int32()),
            "height": pa.array([h if k == "image" else 0 for k in kinds],
                               pa.int32()),
            "sample_rate": pa.array(
                [0 if k == "image" else rate for k in kinds], pa.int32()),
        })

    return docs.map_batches(to_media, batch_format="pyarrow")


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
            return self._resize_ppm(batch)
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

    def _resize_ppm(self, batch: pa.Table) -> pa.Table:
        """REAL path: parse the PPM container, nearest-neighbour
        resample the RGB raster (yi = (y*h)//out_h — PIL NEAREST's
        index rule), re-emit a VALID P6 payload. Non-PPM image codecs
        still raise (they need PIL)."""
        dec = PpmWavDecoder()
        hdr = f"P6\n{self.out_w} {self.out_h}\n255\n".encode()
        ids, kinds, pays, ws, hs = [], [], [], [], []
        for mid, kind, payload in zip(
                batch.column("media_id").to_pylist(),
                batch.column("kind").to_pylist(),
                batch.column("payload").to_pylist()):
            if kind != "image":
                continue
            p = payload or b""
            if not p.startswith(b"P6"):
                raise NotImplementedError(
                    "real resize of non-PPM image codecs requires PIL")
            px = dec.parse_ppm(p)
            h, w = px.shape[0], px.shape[1]
            yi = (np.arange(self.out_h) * h) // self.out_h
            xi = (np.arange(self.out_w) * w) // self.out_w
            out = px[np.ix_(yi, xi)]
            ids.append(mid)
            kinds.append(kind)
            pays.append(hdr + out.tobytes())
            ws.append(self.out_w)
            hs.append(self.out_h)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(pays, pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
        })


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


class RealMediaDigest:
    """Actor-pool stage: REAL decode (PpmWavDecoder) + SQL-replicable
    content digests. Emits per media row:
      n_bytes           — container payload length
      sha16             — sha256[:16] of the decoded ESSENCE (raster /
                          PCM data), i.e. a container-invariant content
                          hash (what media dedup actually wants); also
                          what lets DuckDB replay it over ASCII essence
      feat_sum_micro    — sum of all 32 feature dims in 1e-6 units
      hist_moment_micro — first moment of the 26-bin histogram
      mean_micro        — primary mean dim (red channel / PCM mean)
    All three digests are computed from INTEGER pixel/sample statistics
    with the exact expressions the SQL oracle uses (floor(x*1e6/den
    + 0.5)), so a mis-parsed header or off-by-one raster offset flips
    the hash.
    """

    def __init__(self):
        self.dec = PpmWavDecoder()

    @staticmethod
    def _micro(num: int, den: int) -> int:
        return int(np.floor(num * 1e6 / den + 0.5))

    def _digest_image(self, payload: bytes):
        px = self.dec.parse_ppm(payload)
        h, w = px.shape[0], px.shape[1]
        n = h * w
        flat = px.reshape(-1, 3).astype(np.int64)
        gray = flat.sum(1) // 3
        bins = np.bincount((gray * 26) // 256, minlength=26)[:26]
        fbins = [self._micro(int(c), n) for c in bins]
        fr = self._micro(int(flat[:, 0].sum()), 255 * n)
        fg = self._micro(int(flat[:, 1].sum()), 255 * n)
        fb = self._micro(int(flat[:, 2].sum()), 255 * n)
        f29 = self._micro(w, 64)
        f30 = self._micro(h, 64)
        f31 = self._micro(n, 4096)
        feat_sum = sum(fbins) + fr + fg + fb + f29 + f30 + f31
        moment = sum(i * f for i, f in enumerate(fbins))
        # essence = the raster bytes the parser actually selected
        essence = px.tobytes()
        return essence, feat_sum, moment, fr

    def _digest_audio(self, payload: bytes):
        s, rate = self.dec.parse_wav(payload)
        n = s.size
        sc = np.clip(s, 0, 32767)
        bins = np.bincount((sc * 26) // 32768, minlength=26)[:26]
        fbins = [self._micro(int(c), n) for c in bins]
        fmean = self._micro(int(s.sum()), 32768 * n)
        fmax = self._micro(int(s.max()), 32768)
        fmin = self._micro(int(s.min()), 32768)
        f29 = self._micro(rate, 16000)
        f30 = self._micro(n, 1000)
        feat_sum = sum(fbins) + fmean + fmax + fmin + f29 + f30
        moment = sum(i * f for i, f in enumerate(fbins))
        essence = s.astype("<i2").tobytes()
        return essence, feat_sum, moment, fmean

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, kinds, nb, sha, fsum, mom, mean = [], [], [], [], [], [], []
        for mid, kind, payload in zip(
                batch.column("media_id").to_pylist(),
                batch.column("kind").to_pylist(),
                batch.column("payload").to_pylist()):
            p = payload or b""
            if kind == "image":
                e, s_, m_, mn = self._digest_image(p)
            else:
                e, s_, m_, mn = self._digest_audio(p)
            mids.append(mid)
            kinds.append(kind)
            nb.append(len(p))
            sha.append(hashlib.sha256(e).hexdigest()[:16])
            fsum.append(s_)
            mom.append(m_)
            mean.append(mn)
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "n_bytes": pa.array(nb, pa.int64()),
            "sha16": pa.array(sha, pa.string()),
            "feat_sum_micro": pa.array(fsum, pa.int64()),
            "hist_moment_micro": pa.array(mom, pa.int64()),
            "mean_micro": pa.array(mean, pa.int64()),
        })


def media_decode_digest_dataset(media, concurrency=(1, 4),
                                batch_size: int = 32):
    """media Dataset -> real-decode digests (actor pool; decoder built
    once per actor)."""
    return media.map_batches(RealMediaDigest, batch_format="pyarrow",
                             batch_size=batch_size,
                             concurrency=concurrency)
