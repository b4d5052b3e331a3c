"""128-bit SimHash (Charikar 2002) with reference-parity bit semantics.

The reference (utils/simhash.py:8-47) hashes each token with md5, renders the
128-bit value as a big-endian bitstring, and takes a frequency-weighted
majority vote per bit position (strictly-positive vote -> '1'). We keep those
exact semantics but store fingerprints as 16-byte ``bytes`` (big-endian), and
vectorize the vote with numpy: per-token bit rows are cached as ±1 int8
vectors, a document's fingerprint is ``counts @ bits > 0``.

Hamming distance over packed fingerprints uses a uint8 popcount table, which
lets dedup stages compare whole candidate buckets as matrix ops.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterable, List, Sequence

import numpy as np

_POPCNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1).astype(np.uint8)

BITS = 128
NBYTES = BITS // 8


def word_hash_bits(word: str) -> np.ndarray:
    """±1 int8 vector of the md5 bits of `word`, big-endian (index 0 = MSB).

    Equals reference ``_hash_word`` (simhash.py:13-20): ``bin(md5)[2:]
    .zfill(128)[-128:]`` is exactly the big-endian 128-bit expansion.
    """
    digest = hashlib.md5(word.encode("utf-8")).digest()
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))
    return (bits.astype(np.int8) << 1) - 1  # {0,1} -> {-1,+1}


class SimHasher:
    """Per-actor simhash computer with a word-bit cache
    (reference caches word hashes too, simhash.py:12 lru_cache)."""

    def __init__(self, max_cache: int = 1_000_000):
        self._cache: Dict[str, np.ndarray] = {}
        self._max_cache = max_cache

    def _bits(self, word: str) -> np.ndarray:
        v = self._cache.get(word)
        if v is None:
            v = word_hash_bits(word)
            if len(self._cache) < self._max_cache:
                self._cache[word] = v
        return v

    def fingerprint(self, tokens: Sequence[str]) -> bytes:
        """16-byte big-endian fingerprint of a token sequence.

        Empty token list -> all-zero fingerprint (reference: V stays all 0,
        every vote fails `> 0`, fingerprint all '0').
        """
        if not tokens:
            return b"\x00" * NBYTES
        freq: Dict[str, int] = {}
        for t in tokens:
            freq[t] = freq.get(t, 0) + 1
        words = list(freq.keys())
        mat = np.stack([self._bits(w) for w in words])          # (k, 128) ±1
        counts = np.fromiter(freq.values(), dtype=np.int64, count=len(words))
        votes = counts @ mat                                     # (128,)
        bits = (votes > 0).astype(np.uint8)
        return np.packbits(bits).tobytes()


def fingerprint_to_bitstring(fp: bytes) -> str:
    """Render as the reference's 128-char '0'/'1' string for parity tests."""
    bits = np.unpackbits(np.frombuffer(fp, dtype=np.uint8))
    return "".join("1" if b else "0" for b in bits)


def hamming_bytes(a: bytes, b: bytes) -> int:
    xa = np.frombuffer(a, dtype=np.uint8)
    xb = np.frombuffer(b, dtype=np.uint8)
    return int(_POPCNT[xa ^ xb].sum())


def hamming_matrix(fps: np.ndarray) -> np.ndarray:
    """Pairwise hamming distances for an (n, 16) uint8 fingerprint matrix."""
    n = fps.shape[0]
    x = fps[:, None, :] ^ fps[None, :, :]
    return _POPCNT[x].sum(axis=2, dtype=np.int32)


def fps_to_matrix(fps: Iterable[bytes]) -> np.ndarray:
    buf = b"".join(fps)
    arr = np.frombuffer(buf, dtype=np.uint8)
    return arr.reshape(-1, NBYTES)


# (band-key computation lives solely in stages/dedup.py BandEmitter; its
# pigeonhole exactness is pinned by the brute-force equivalence test in
# tests/test_training_ops.py)
