"""Vectorized delta + LEB128 varint codec for posting lists.

North-star segment format (BASELINE.json): delta-encoded, varint-compressed
postings with skip pointers / block-max metadata. The reference stored raw
pickled tuples (utils/index_generator.py:18-32); this codec replaces that.

Everything is numpy-vectorized: encoding builds an (n, 10) byte matrix and
masks out unused bytes; decoding finds terminator bytes (high bit clear) and
accumulates 7-bit groups with at most 10 passes over fixed offsets — no
Python-per-integer loops, so multi-million-entry posting lists encode/decode
at memory speed.
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 10  # ceil(64 / 7)


def encode_varints(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64/int64 array (values must be >= 0)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.shape[0]
    if n == 0:
        return b""
    # byte i holds bits [7i, 7i+7); continuation bit set while more bits remain
    shifts = (np.arange(_MAX_BYTES, dtype=np.uint64) * np.uint64(7))
    chunks = (v[:, None] >> shifts[None, :]) & np.uint64(0x7F)   # (n, 10)
    # length in bytes per value: position of highest nonzero chunk + 1
    nonzero = chunks != 0
    nonzero[:, 0] = True                                         # at least 1 byte
    lengths = _MAX_BYTES - np.argmax(nonzero[:, ::-1], axis=1)   # (n,)
    cont_mask = np.arange(_MAX_BYTES)[None, :] < (lengths[:, None] - 1)
    used_mask = np.arange(_MAX_BYTES)[None, :] < lengths[:, None]
    out = chunks.astype(np.uint8)
    out[cont_mask] |= 0x80
    return out[used_mask].tobytes()


def decode_varints(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode every varint in `buf` to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(b < 0x80)                  # terminator positions
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    n = ends.size
    vals = np.zeros(n, dtype=np.uint64)
    max_len = int(lengths.max())
    for j in range(max_len):
        mask = lengths > j
        vals[mask] |= (b[starts[mask] + j] & np.uint8(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    if count is not None and n != count:
        raise ValueError(f"expected {count} varints, decoded {n}")
    return vals


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """First value + successive differences (input must be sorted ascending)."""
    v = np.ascontiguousarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(deltas.astype(np.uint64), dtype=np.uint64)


def encode_sorted(values: np.ndarray) -> bytes:
    return encode_varints(delta_encode(values))


def decode_sorted(buf: bytes, count: int | None = None) -> np.ndarray:
    return delta_decode(decode_varints(buf, count))
