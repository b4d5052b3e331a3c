"""Vectorized 64-bit hashing of whitespace-token streams.

Replaces the per-shingle ``hashlib.md5`` calls in the MinHash / n-gram
Jaccard kernels (the one per-row Python loop VERDICT r2 flagged in a dedup
hot path) with three numpy passes:

1. ``flat_word_hashes``: one polynomial (Rabin-Karp style) hash per word,
   computed over the newline-joined UTF-8 buffer of the WHOLE batch — the
   per-position power/cumsum trick with the modular inverse of the (odd,
   hence invertible mod 2^64) base recovers each word's own-origin hash from
   one global prefix sum. 0x0A can never appear inside a word: ``str.split``
   strips all whitespace and UTF-8 continuation bytes are >= 0x80.
2. ``batch_shingle_hashes``: k-word windows combine word hashes with a
   second polynomial (k shifted multiply-adds, no per-window work); docs
   with 0 < len(words) < k contribute their single whole-doc shingle
   (``_shingles`` join semantics: words contain no whitespace, so the word
   sequence determines the joined string bijectively).
3. a splitmix64 finalizer (Steele et al., OOPSLA 2014) spreads the
   structured polynomial outputs before downstream universal hashing.

All arithmetic is uint64 wraparound (numpy C-cast semantics) — deterministic
across platforms.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

_P = np.uint64(0x100000001B3)          # FNV-1a prime (odd => invertible)
_PINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))
_A = np.uint64(0x9E3779B97F4A7C15)     # word-combination base (odd)
_LEN_SALT = np.uint64(0xD6E8FEB86659FD93)

_ERR = dict(over="ignore")             # uint64 wraparound is intentional


def _splitmix(x: np.ndarray) -> np.ndarray:
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def flat_word_hashes(all_words: List[str]) -> np.ndarray:
    """One 64-bit hash per word, vectorized over one joined buffer."""
    n = len(all_words)
    if n == 0:
        return np.empty(0, np.uint64)
    buf = "\n".join(all_words).encode("utf-8")
    arr = np.frombuffer(buf, np.uint8)
    m = arr.size
    with np.errstate(over="ignore"):
        nl = arr == 0x0A
        starts = np.empty(n, np.int64)
        starts[0] = 0
        ends = np.empty(n, np.int64)
        if n > 1:
            nl_pos = np.flatnonzero(nl)
            starts[1:] = nl_pos + 1
            ends[:-1] = nl_pos
        ends[-1] = m
        vals = arr.astype(np.uint64)
        vals[nl] = 0
        pw = np.multiply.accumulate(np.full(m, _P, np.uint64))      # P^1..P^m
        csum = np.cumsum(vals * pw)                                  # wraps
        pinv_pw = np.multiply.accumulate(np.full(m, _PINV, np.uint64))
        seg = csum[ends - 1] - np.where(starts > 0,
                                        csum[starts - 1], np.uint64(0))
        # PINV^(s+1) * sum(vals[j] * P^(j+1)) == sum(vals[j] * P^(j-s))
        h = seg * pinv_pw[starts]
        return _splitmix(h + (ends - starts).astype(np.uint64) * _LEN_SALT)


def _apow(e: int) -> np.uint64:
    return np.uint64(pow(0x9E3779B97F4A7C15, e, 1 << 64))


def batch_shingle_hashes(texts: List[str],
                         k: int) -> Tuple[np.ndarray, np.ndarray]:
    """-> (flat shingle hashes uint64, per-doc offsets int64 of len n+1).

    Shingle semantics identical to ``_shingles(text.split(), k)``: docs with
    >= k words emit one hash per k-window (duplicates kept); docs with
    0 < w < k emit ONE whole-doc shingle; empty docs emit none. Equal word
    sequences hash equal regardless of which doc/window produced them.
    """
    words_per_doc = [(t or "").split() for t in texts]
    counts = np.array([len(w) for w in words_per_doc], np.int64)
    n_docs = counts.size
    wh = flat_word_hashes([w for ws in words_per_doc for w in ws])
    n_sh = np.where(counts == 0, 0, np.maximum(counts - k + 1, 1))
    offs = np.concatenate(([0], np.cumsum(n_sh)))
    out = np.empty(int(offs[-1]), np.uint64)
    if out.size == 0:
        return out, offs
    word_starts = np.concatenate(([0], np.cumsum(counts)))
    W = int(wh.size)
    with np.errstate(over="ignore"):
        # full k-windows across the whole batch: k shifted multiply-adds,
        # then keep only windows that start and end inside one doc
        full = np.flatnonzero(counts >= k)
        if full.size and W >= k:
            conv = np.zeros(W - k + 1, np.uint64)
            for d in range(k):
                conv += wh[d:W - k + 1 + d] * _apow(k - 1 - d)
            did = np.repeat(np.arange(n_docs), counts)
            valid = did[:W - k + 1] == did[k - 1:]
            hashes = _splitmix(conv[valid] + np.uint64(k) * _LEN_SALT)
            lens = n_sh[full]
            rep_start = np.repeat(offs[full], lens)
            within = (np.arange(int(lens.sum()))
                      - np.repeat(np.cumsum(lens) - lens, lens))
            out[rep_start + within] = hashes
        # short docs (0 < w < k): one whole-doc shingle each, grouped by w
        for c in range(1, k):
            sd = np.flatnonzero(counts == c)
            if not sd.size:
                continue
            s = word_starts[sd]
            h = np.zeros(sd.size, np.uint64)
            for d in range(c):
                h += wh[s + d] * _apow(c - 1 - d)
            out[offs[sd]] = _splitmix(h + np.uint64(c) * _LEN_SALT)
    return out, offs
