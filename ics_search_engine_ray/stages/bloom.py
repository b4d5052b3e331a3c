"""Sharded Bloom-filter membership for incremental-crawl dedup.

``dedup_against`` (stages/dedup_text.py) answers the recrawl question
EXACTLY by shipping / co-partitioning the old corpus's distinct 128-bit
hashes. At 100 TB the distinct-hash relation itself is ~160 GB; a Bloom
filter answers the same question in ~10 bits/key (~12 GB at 10^10 docs)
with a bounded, *deterministic* false-positive set — the standard
pre-filter in front of the exact path (only maybe-dup docs need the
exact anti-join).

Determinism is the point of this implementation: positions derive from
the full 128-bit md5 of the text via Kirsch-Mitzenmacher double hashing
(pos_j = h1 + j*h2 mod 2^64 mod m_shard, h2 forced odd), so the DuckDB
oracle replicates every probe — including the false positives —
bit-exactly with ``md5_number_upper/lower``.

Layout: the filter is SHARDED by the top 16 bits of h1
(``shard = (h1 >> 48) % S``) so every doc's k probes land in ONE shard:

- build: (shard, h1, h2) rows -> native ``groupby(shard).map_groups``
  sets bits per shard -> a Dataset of (shard, packed-bits) rows. Only
  O(k * n_old) int64 rows shuffle; the dense blobs exist only at the
  reducers.
- probe, under the gate (total filter bytes <= ``max_filter_bytes``):
  the S blobs ship ONCE via ``ray.put`` and every new-side batch tests
  locally — zero probe-side shuffle.
- probe, above the gate: probe rows co-partition with the filter rows
  by shard (tagged union -> ``groupby(shard).map_groups``), so each
  task holds exactly one shard's blob. No driver-side O(corpus) state;
  S scales with m (SCALE.md: sharded-bloom row).

Reference parity: the reference engine has no incremental path at all
(it rebuilds `full_analytics/` from scratch; see SURVEY.md §2 S3-S5) —
this operator extends the dedup family the same way dedup_against does.
"""

from __future__ import annotations

import hashlib
from typing import List, Tuple

import numpy as np
import pyarrow as pa

_SHARD_SHIFT = np.uint64(48)


def _md5_h12(texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 per text: h1 = little-endian first 8 md5 bytes
    (DuckDB ``md5_number_upper``), h2 = little-endian last 8 bytes
    (``md5_number_lower``) forced odd so it is invertible mod 2^64."""
    if not texts:
        z = np.empty(0, np.uint64)
        return z, z
    buf = b"".join(hashlib.md5((t or "").encode("utf-8")).digest()
                   for t in texts)
    arr = np.frombuffer(buf, dtype="<u8")
    h1 = arr[0::2].copy()
    h2 = arr[1::2] | np.uint64(1)
    return h1, h2


def _positions(h1: np.ndarray, h2: np.ndarray, k: int,
               m_shard: int) -> np.ndarray:
    """(n, k) uint64 probe positions, wraparound double hashing."""
    with np.errstate(over="ignore"):
        j = np.arange(k, dtype=np.uint64)
        return (h1[:, None] + j[None, :] * h2[:, None]) % np.uint64(m_shard)


def _hash_rows(batch: pa.Table, shards: int) -> pa.Table:
    texts = [x or "" for x in batch.column("text").to_pylist()]
    h1, h2 = _md5_h12(texts)
    shard = ((h1 >> _SHARD_SHIFT) % np.uint64(shards)).astype(np.int64)
    cols = {"shard": pa.array(shard, pa.int64()),
            "h1": pa.array(h1.view(np.int64), pa.int64()),
            "h2": pa.array(h2.view(np.int64), pa.int64())}
    if "doc_id" in batch.column_names:
        cols["doc_id"] = batch.column("doc_id")
    return pa.table(cols)


_FILTER_SCHEMA = pa.schema([("shard", pa.int64()), ("bits", pa.binary())])


def bloom_build(old_docs, m_bits: int = 1 << 20, k: int = 4,
                shards: int = 16):
    """documents(text) -> Dataset[(shard, bits)] — one packed
    ``m_bits // shards``-bit blob per non-empty shard."""
    if m_bits % (shards * 64):
        raise ValueError("m_bits must be a multiple of shards*64")
    m_shard = m_bits // shards

    hashed = old_docs.map_batches(
        lambda b, s=shards: _hash_rows(b.select(["text"]), s),
        batch_format="pyarrow")

    def set_bits(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _FILTER_SCHEMA.empty_table()
        h1 = g.column("h1").to_numpy(zero_copy_only=False).view(np.uint64)
        h2 = g.column("h2").to_numpy(zero_copy_only=False).view(np.uint64)
        pos = _positions(h1, h2, k, m_shard).ravel()
        words = np.zeros(m_shard // 64, np.uint64)
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({
            "shard": pa.array([int(g.column("shard")[0].as_py())],
                              pa.int64()),
            "bits": pa.array([words.tobytes()], pa.binary())})

    return hashed.groupby("shard").map_groups(set_bits,
                                              batch_format="pyarrow")


def _probe_words(words: np.ndarray, h1: np.ndarray, h2: np.ndarray,
                 k: int, m_shard: int) -> np.ndarray:
    """int64 1 where all k probe bits are set in ``words``."""
    if h1.size == 0:
        return np.empty(0, np.int64)
    pos = _positions(h1, h2, k, m_shard)
    hit = (words[(pos >> np.uint64(6)).astype(np.int64)]
           >> (pos & np.uint64(63))) & np.uint64(1)
    return (hit.sum(axis=1) == k).astype(np.int64)


def bloom_dedup_against(new_docs, old_docs, m_bits: int = 1 << 20,
                        k: int = 4, shards: int = 16,
                        max_filter_bytes: int = 64 << 20):
    """-> (doc_id, maybe_dup int64 0/1) for every NEW doc: 1 iff all k
    Bloom probes over the OLD corpus's filter hit (every true dup is 1;
    a deterministic, oracle-replicable false-positive set may also be).

    Under ``max_filter_bytes`` the whole filter broadcasts once; above
    it, probes co-partition with the per-shard blobs (no broadcast, no
    driver state). Both paths are tested equal (test_bloom.py)."""
    import ray

    if m_bits % (shards * 64):
        raise ValueError("m_bits must be a multiple of shards*64")
    m_shard = m_bits // shards
    filt = bloom_build(old_docs, m_bits=m_bits, k=k, shards=shards)
    probes = new_docs.map_batches(
        lambda b, s=shards: _hash_rows(b.select(["doc_id", "text"]), s),
        batch_format="pyarrow")
    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("maybe_dup", pa.int64())])

    if m_bits // 8 <= max_filter_bytes:
        # blobs total m_bits/8 bytes — bounded by the gate, not by corpus
        rows = filt.take_all()
        table = {int(r["shard"]): np.frombuffer(r["bits"], np.uint64)
                 for r in rows}
        zero = np.zeros(m_shard // 64, np.uint64)
        blobs = [table.get(s, zero) for s in range(shards)]
        ref = ray.put(blobs)

        def probe(b: pa.Table) -> pa.Table:
            bl = ray.get(ref)
            h1 = b.column("h1").to_numpy(zero_copy_only=False) \
                .view(np.uint64)
            h2 = b.column("h2").to_numpy(zero_copy_only=False) \
                .view(np.uint64)
            sh = b.column("shard").to_numpy(zero_copy_only=False)
            flag = np.zeros(b.num_rows, np.int64)
            for s in np.unique(sh):
                idx = np.flatnonzero(sh == s)
                flag[idx] = _probe_words(bl[int(s)], h1[idx], h2[idx],
                                         k, m_shard)
            return pa.table({"doc_id": b.column("doc_id"),
                             "maybe_dup": pa.array(flag, pa.int64())})

        return probes.map_batches(probe, batch_format="pyarrow")

    # scale path: co-partition probes with their shard's blob
    def tag_probe(b: pa.Table) -> pa.Table:
        return pa.table({
            "shard": b.column("shard"),
            "_side": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
            "doc_id": b.column("doc_id"), "h1": b.column("h1"),
            "h2": b.column("h2"),
            "bits": pa.array([b""] * b.num_rows, pa.binary())})

    def tag_filt(b: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(b.num_rows, np.int64), pa.int64())
        return pa.table({
            "shard": b.column("shard"),
            "_side": pa.array(np.ones(b.num_rows, np.int8), pa.int8()),
            "doc_id": z, "h1": z, "h2": z, "bits": b.column("bits")})

    tagged = probes.map_batches(tag_probe, batch_format="pyarrow").union(
        filt.map_batches(tag_filt, batch_format="pyarrow"))

    def resolve(g: pa.Table) -> pa.Table:
        side = g.column("_side").to_numpy(zero_copy_only=False)
        pi = np.flatnonzero(side == 0)
        if pi.size == 0:
            return out_schema.empty_table()
        fi = np.flatnonzero(side == 1)
        words = (np.frombuffer(g.column("bits")[int(fi[0])].as_py(),
                               np.uint64) if fi.size
                 else np.zeros(m_shard // 64, np.uint64))
        h1 = g.column("h1").to_numpy(zero_copy_only=False) \
            .view(np.uint64)[pi]
        h2 = g.column("h2").to_numpy(zero_copy_only=False) \
            .view(np.uint64)[pi]
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)[pi]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "maybe_dup": pa.array(_probe_words(words, h1, h2, k, m_shard),
                                  pa.int64())})

    return tagged.groupby("shard").map_groups(resolve,
                                              batch_format="pyarrow")
