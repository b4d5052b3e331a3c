"""REAL media decode (stages/multimodal.py PpmWavDecoder): hand-built
P6 PPM / PCM16 WAV payloads must parse to the exact pixel/sample arrays,
malformed containers must be rejected, and the synthetic real-media
corpus must round-trip decoder == constructor."""

import numpy as np
import pyarrow as pa
import pytest

from ics_search_engine_ray.stages.multimodal import (PpmWavDecoder,
                                                     wav_header)


def test_parse_ppm_exact():
    dec = PpmWavDecoder()
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(3, 2, 3)
    payload = b"P6\n2 3\n255\n" + px.tobytes()
    got = dec.parse_ppm(payload)
    assert got.shape == (3, 2, 3)
    assert (got == px).all()


def test_parse_ppm_rejects():
    dec = PpmWavDecoder()
    with pytest.raises(ValueError, match="P6"):
        dec.parse_ppm(b"P5\n2 2\n255\nxxxx")
    with pytest.raises(ValueError, match="short"):
        dec.parse_ppm(b"P6\n4 4\n255\nabc")
    with pytest.raises(ValueError, match="maxval"):
        dec.parse_ppm(b"P6\n1 1\n15\nabc")


def test_parse_wav_exact_negative_samples():
    dec = PpmWavDecoder()
    samples = np.array([0, 1, -1, 32767, -32768, 12345], np.int16)
    payload = wav_header(samples.size, rate=44100) \
        + samples.astype("<i2").tobytes()
    got, rate = dec.parse_wav(payload)
    assert rate == 44100
    assert (got == samples.astype(np.int64)).all()


def test_parse_wav_rejects_stereo():
    dec = PpmWavDecoder()
    hdr = bytearray(wav_header(4, rate=8000))
    hdr[22] = 2                      # channels = 2
    with pytest.raises(ValueError, match="mono"):
        dec.parse_wav(bytes(hdr) + b"\0" * 8)
    with pytest.raises(ValueError, match="RIFF"):
        dec.parse_wav(b"OggS" + b"\0" * 40)


def test_synth_real_media_roundtrip(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.multimodal import \
        synth_real_media_from_documents

    docs = rd.from_items([
        {"doc_id": 0, "text": "hello world"},
        {"doc_id": 1, "text": "abc"},
        {"doc_id": 2, "text": ""},            # empty -> single space tile
    ])
    rows = {r["media_id"]: r
            for r in synth_real_media_from_documents(docs).take_all()}
    dec = PpmWavDecoder()
    px = dec.parse_ppm(rows[0]["payload"])
    assert px.shape == (8, 8, 3)
    tile = (b"hello world" * 18)[:192]
    assert px.tobytes() == tile
    s, rate = dec.parse_wav(rows[1]["payload"])
    assert rate == 8000 and s.size == 100
    want = np.frombuffer((b"abc" * 67)[:200], np.dtype("<i2"))
    assert (s == want.astype(np.int64)).all()
    # empty text pads with spaces; still a valid container
    px2 = dec.parse_ppm(rows[2]["payload"])
    assert (px2 == 32).all()


def test_decode_feature_matches_digest(ray_session):
    """The 32-dim float feature and the integer micro digests agree."""
    import ray.data as rd
    from ics_search_engine_ray.stages.multimodal import (
        RealMediaDigest, synth_real_media_from_documents)

    docs = rd.from_items([{"doc_id": i, "text": f"doc number {i} text"}
                          for i in range(6)])
    media = synth_real_media_from_documents(docs)
    dig = {r["media_id"]: r
           for b in media.map_batches(RealMediaDigest,
                                      batch_format="pyarrow",
                                      concurrency=1)
           .iter_batches(batch_format="pyarrow")
           for r in b.to_pylist()}
    dec = PpmWavDecoder()
    for r in media.take_all():
        f = dec.decode(r["payload"], r["kind"])
        micro = np.floor(f * 1e6 + 0.5).astype(np.int64)
        assert int(micro.sum()) == dig[r["media_id"]]["feat_sum_micro"]
