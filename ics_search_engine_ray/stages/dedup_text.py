"""Deduplication family over a text/embedding corpus (task brief):

- exact dedup: hash-partitioned groupby(text-hash) keeping min doc_id
- MinHash + LSH near-dedup: word-shingle -> 128 minhash -> banded groupby
- n-gram Jaccard verification (used as the MinHash verify step and standalone)
- embedding-cosine near-dedup: LSH-bucketed (random hyperplane) + verify

All are Ray-Data-native: per-batch signature computation is numpy-vectorized,
candidate generation is a banded ``groupby`` (same pattern as the SimHash
dedup in stages/dedup.py), verification is vectorized inside ``map_groups``,
and survivors are resolved deterministically (min doc_id per cluster).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Dict, List, Set, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# module-level (NOT inside batch fns): batch callables run on workers where
# the package may not be importable — by-value cloudpickle captures these as
# serialized globals, a runtime relative import would raise ModuleNotFoundError
from ..functions.tokenizer import TOKEN_RE
from ..functions.wordhash import _apow, _splitmix, batch_shingle_hashes

_MERSENNE = (1 << 61) - 1


# ---------------- exact dedup ----------------


def _text_hash_batch(batch: pa.Table) -> pa.Table:
    """Full 128-bit md5 per text as two int64 columns — a truncated digest
    could collide and silently drop a distinct document."""
    texts = [x or "" for x in batch.column("text").to_pylist()]
    digests = [hashlib.md5(x.encode("utf-8")).digest() for x in texts]
    hi = [int.from_bytes(d[:8], "big", signed=True) for d in digests]
    lo = [int.from_bytes(d[8:], "big", signed=True) for d in digests]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "hash_hi": pa.array(hi, pa.int64()),
                     "hash_lo": pa.array(lo, pa.int64())})


def exact_dedup(docs):
    """documents(doc_id, text) -> survivors (doc_id), min doc_id per distinct
    text. Hash-partitioned groupby; only (doc_id, 128-bit hash) rows shuffle."""
    hashed = docs.map_batches(_text_hash_batch, batch_format="pyarrow")
    return hashed.groupby(["hash_hi", "hash_lo"]).min("doc_id") \
        .map_batches(lambda b: pa.table({"doc_id": b.column("min(doc_id)")}),
                     batch_format="pyarrow")


# ---------------- minhash ----------------


def _shingles(words: List[str], k: int) -> List[str]:
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]


class MinHashBatch:
    """Per-batch minhash signatures: k-word shingles -> 64-bit vectorized
    polynomial hash (functions/wordhash.py — no per-shingle hashlib) ->
    n_perm universal-hash minima, min-reduced in doc-boundary-aligned slabs
    (``np.minimum.reduceat``) so one kernel call covers many docs."""

    _SLAB = 1 << 15        # shingles per (slab x n_perm) uint64 working set

    def __init__(self, n_perm: int = 128, shingle_k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.k = shingle_k

    def signatures(self, texts: List[str]) -> np.ndarray:
        """(n_docs, n_perm) uint64 signature matrix; empty docs keep the
        uint64-max sentinel (matching the old per-doc path)."""
        flat, offs = batch_shingle_hashes(texts, self.k)
        n_docs = len(texts)
        sigs = np.full((n_docs, self.n_perm), np.iinfo(np.uint64).max,
                       dtype=np.uint64)
        if flat.size == 0:
            return sigs
        doc_of = np.repeat(np.arange(n_docs), np.diff(offs))
        with np.errstate(over="ignore"):
            for s0 in range(0, flat.size, self._SLAB):
                sl = slice(s0, min(s0 + self._SLAB, int(flat.size)))
                x = (flat[sl, None] * self.a[None, :] + self.b[None, :]) \
                    % np.uint64(_MERSENNE)
                d = doc_of[sl]
                bs = np.concatenate(
                    ([0], np.flatnonzero(d[1:] != d[:-1]) + 1))
                mins = np.minimum.reduceat(x, bs, axis=0)
                docs_here = d[bs]                 # unique within a slab
                sigs[docs_here] = np.minimum(sigs[docs_here], mins)
        return sigs

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.signatures(batch.column("text").to_pylist())
        sigs64 = sigs.view(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "minhash": pa.array([sigs64[i].tobytes()
                                 for i in range(sigs64.shape[0])], pa.binary()),
        })


class MinHashBands:
    def __init__(self, n_perm: int = 128, n_bands: int = 32):
        assert n_perm % n_bands == 0
        self.n_perm = n_perm
        self.n_bands = n_bands
        self.r = n_perm // n_bands

    def keys(self, batch: pa.Table) -> np.ndarray:
        """(n, n_bands) int64 band keys, vectorized: (n, n_bands, r)
        polynomial combine + splitmix, 48-bit mask, band index in the top
        bits — no per-(doc, band) Python or hashlib."""
        n = batch.num_rows
        flat = np.frombuffer(b"".join(batch.column("minhash").to_pylist()),
                             dtype=np.uint64)
        segs = flat.reshape(n, self.n_bands, self.r)
        with np.errstate(over="ignore"):
            h = np.zeros((n, self.n_bands), np.uint64)
            for j in range(self.r):
                h += segs[:, :, j] * _apow(self.r - 1 - j)
            h = _splitmix(h) & np.uint64((1 << 48) - 1)
            return (np.arange(self.n_bands, dtype=np.int64)[None, :] << 48) \
                | h.astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"band": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "minhash": pa.array([], pa.binary())})
        keys = self.keys(batch)
        rep = np.repeat(np.arange(n), self.n_bands)
        return pa.table({
            "band": pa.array(keys.ravel(), pa.int64()),
            "doc_id": batch.column("doc_id").take(pa.array(rep)),
            "minhash": batch.column("minhash").take(pa.array(rep)),
        })


def minhash_band_pairs(docs, n_perm: int = 32, n_bands: int = 8,
                       shingle_k: int = 3, threshold: float = 0.5,
                       num_verify_groups: int = 64):
    """documents(doc_id, text) -> (a, b, est): every DISTINCT banded-LSH
    candidate pair whose signature-agreement Jaccard estimate reaches
    ``threshold`` — the fully deterministic core of :func:`minhash_dedup`
    exposed as a relation. Nothing here is random at run time (the
    permutation constants come from a fixed seed, the hashes are the
    seedless wordhash/splitmix chain), so a DuckDB oracle can replay the
    ENTIRE pipeline — word hashes, shingle combine, n_perm permutation
    minima, 48-bit band keys, candidate pairs, agreement estimate —
    bit-exactly in 128-bit SQL arithmetic (__ray_entry__
    _minhash_band_pairs_sql).

    Plan: signatures once per doc (actor pool) -> banded rows CARRYING
    the signature bytes (n_perm x 8 B; at the default 32 perms that is
    256 B/doc/band — this op trades minhash_dedup's signature-free
    shuffle for in-group verification with zero driver state) ->
    groupby(band-hash group) emits verified pairs -> final groupby((a,
    b)) collapses multi-band rediscovery (estimates are identical, Min
    is arbitrary-but-deterministic)."""
    bander = MinHashBands(n_perm, n_bands)
    sigs = docs.map_batches(MinHashBatch,
                            fn_constructor_args=(n_perm, shingle_k),
                            batch_format="pyarrow", concurrency=(1, 4))

    sentinel = b"\xff" * (8 * n_perm)

    def drop_unshingled(b: pa.Table) -> pa.Table:
        # docs with zero shingles keep the all-0xFF sentinel signature and
        # would spuriously pair with each other; real minima are % M61 <
        # 2^61, so the sentinel can never occur for a shingled doc and the
        # filter is exact (and matches the oracle, where empty docs simply
        # produce no shingle rows)
        return b.filter(pc.not_equal(
            b.column("minhash"), pa.scalar(sentinel, pa.binary())))

    banded = sigs.map_batches(drop_unshingled, batch_format="pyarrow") \
        .map_batches(bander, batch_format="pyarrow")

    def tag(b: pa.Table) -> pa.Table:
        keys = b.column("band").to_numpy(zero_copy_only=False)
        return b.append_column(
            "_g", pa.array((keys % num_verify_groups + num_verify_groups)
                           % num_verify_groups, pa.int64()))

    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("est", pa.float64())])

    def verify(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2:
            return out_schema.empty_table()
        g = g.sort_by([("band", "ascending"), ("doc_id", "ascending")])
        bands = g.column("band").to_numpy(zero_copy_only=False)
        dids = g.column("doc_id").to_numpy(zero_copy_only=False)
        sig = np.frombuffer(b"".join(g.column("minhash").to_pylist()),
                            np.uint64).reshape(n, n_perm)
        starts = np.flatnonzero(np.concatenate(
            ([True], bands[1:] != bands[:-1])))
        lens = np.diff(np.append(starts, n))
        aa, bb, ee = [], [], []
        for run_len in np.unique(lens[lens >= 2]):
            st = starts[lens == run_len]
            ti, tj = np.triu_indices(int(run_len), k=1)
            ii = (st[:, None] + ti[None, :]).ravel()
            jj = (st[:, None] + tj[None, :]).ravel()
            da, db = dids[ii], dids[jj]
            ne = da != db
            ii, jj = ii[ne], jj[ne]
            est = (sig[ii] == sig[jj]).mean(axis=1)
            keep = est >= threshold - 1e-12
            aa.append(np.minimum(da[ne], db[ne])[keep])
            bb.append(np.maximum(da[ne], db[ne])[keep])
            ee.append(np.round(est[keep], 6))
        if not aa:
            return out_schema.empty_table()
        return pa.table({"a": pa.array(np.concatenate(aa), pa.int64()),
                         "b": pa.array(np.concatenate(bb), pa.int64()),
                         "est": pa.array(np.concatenate(ee),
                                         pa.float64())})

    pairs = banded.map_batches(tag, batch_format="pyarrow") \
        .groupby("_g").map_groups(
            lambda g: verify(g.drop(["_g"])), batch_format="pyarrow")

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({"a": b.column("a"), "b": b.column("b"),
                         "est": b.column("min(est)")})

    return pairs.groupby(["a", "b"]).min("est") \
        .map_batches(fin, batch_format="pyarrow")


def _minhash_jaccard_est(a: bytes, b: bytes) -> float:
    x = np.frombuffer(a, dtype=np.int64)
    y = np.frombuffer(b, dtype=np.int64)
    return float((x == y).mean())


def minhash_dedup(docs, threshold: float = 0.8, n_perm: int = 128,
                  n_bands: int = 32, shingle_k: int = 3,
                  num_verify_groups: int = None):
    """documents(doc_id, text) -> (survivor doc_ids, dropped set, pairs).

    Returns (survivors: Dataset[doc_id], dropped: set[int], n_pairs: int).

    Two-phase LSH: (1) candidate generation shuffles ONLY 16 B (band,
    doc_id) rows — the n_perm x 8 B signatures never ride the all-to-all
    exchange (at n_bands=32 that cuts the banded shuffle from ~32 KB to
    ~0.5 KB per doc); (2) verification pulls the signatures of candidate
    docs alone (a broadcast id filter over the materialized signature
    dataset) and runs the equal-permutation estimator vectorized. Driver
    memory is O(candidate pairs + their signatures), never O(N). The
    verify-group count scales with the banded row count so per-task group
    memory stays bounded at any corpus size; pass an explicit count to pin.
    """
    import ray
    from .common import adaptive_groups
    if num_verify_groups is None:
        # banded rows are 16 B each: target ~2M rows (~32 MB) per group
        est_banded = docs.count() * n_bands
        num_verify_groups = adaptive_groups(est_banded, 2_000_000, lo=64)
    sigs = docs.map_batches(MinHashBatch, fn_constructor_args=(n_perm, shingle_k),
                            batch_format="pyarrow", concurrency=(1, 4)) \
               .materialize()
    bander = MinHashBands(n_perm, n_bands)

    def band_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"band": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "gkey": pa.array([], pa.int64())})
        keys = bander.keys(b)
        g = keys % num_verify_groups
        rep = np.repeat(np.arange(b.num_rows), bander.n_bands)
        return pa.table({
            "band": pa.array(keys.ravel(), pa.int64()),
            "doc_id": b.column("doc_id").take(pa.array(rep)),
            "gkey": pa.array(g.ravel(), pa.int64()),
        })

    banded = sigs.map_batches(band_rows, batch_format="pyarrow")

    def cand_pairs(group: pa.Table) -> pa.Table:
        """Distinct candidate pairs per band run (triangle templates per run
        length, lexsort-deduped in-task)."""
        empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        n = group.num_rows
        if n < 2:
            return empty
        group = group.sort_by([("band", "ascending"), ("doc_id", "ascending")])
        bands = group.column("band").to_numpy(zero_copy_only=False)
        dids = group.column("doc_id").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate(([True], bands[1:] != bands[:-1])))
        lens = np.diff(np.append(starts, n))
        a_parts, b_parts = [], []
        for run_len in np.unique(lens[lens >= 2]):
            st = starts[lens == run_len]
            ti, tj = np.triu_indices(int(run_len), k=1)
            ii = (st[:, None] + ti[None, :]).ravel()
            jj = (st[:, None] + tj[None, :]).ravel()
            da, db = dids[ii], dids[jj]
            ne = da != db
            a_parts.append(np.minimum(da, db)[ne])
            b_parts.append(np.maximum(da, db)[ne])
        if not a_parts:
            return empty
        a = np.concatenate(a_parts)
        b2 = np.concatenate(b_parts)
        order = np.lexsort((b2, a))
        a, b2 = a[order], b2[order]
        new = np.empty(a.size, bool)
        new[0] = True
        new[1:] = (a[1:] != a[:-1]) | (b2[1:] != b2[:-1])
        return pa.table({"a": pa.array(a[new], pa.int64()),
                         "b": pa.array(b2[new], pa.int64())})

    pairs_ds = banded.groupby("gkey").map_groups(
        lambda g: cand_pairs(g.drop(["gkey"])), batch_format="pyarrow")
    cand: Set[Tuple[int, int]] = set()
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        for a, b2 in zip(b.column("a").to_pylist(), b.column("b").to_pylist()):
            cand.add((a, b2))

    pairs: Set[Tuple[int, int]] = set()
    if cand:
        # fetch candidate docs' signatures (distributed filter, O(cand) out)
        need = np.array(sorted({d for p in cand for d in p}), dtype=np.int64)
        need_ref = ray.put(need)

        def sig_filter(b: pa.Table) -> pa.Table:
            nd = ray.get(need_ref)
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(nd, ids)
            ok = pos < nd.size
            ok[ok] = nd[pos[ok]] == ids[ok]
            return b.filter(pa.array(ok))

        sigmap: Dict[int, bytes] = {}
        for b in sigs.map_batches(sig_filter, batch_format="pyarrow") \
                     .iter_batches(batch_format="pyarrow"):
            for did, s in zip(b.column("doc_id").to_pylist(),
                              b.column("minhash").to_pylist()):
                sigmap[did] = s
        plist = sorted(cand)
        amat = np.frombuffer(b"".join(sigmap[a] for a, _ in plist),
                             dtype=np.int64).reshape(len(plist), -1)
        bmat = np.frombuffer(b"".join(sigmap[b2] for _, b2 in plist),
                             dtype=np.int64).reshape(len(plist), -1)
        est = (amat == bmat).mean(axis=1)
        pairs = {p for p, e in zip(plist, est) if e >= threshold}
    dropped = _min_survivor_drops(pairs)
    # survivors stay a DATASET: the corpus anti-joins the (small) broadcast
    # drop set — the driver never materializes a full-corpus id list
    import ray
    from .common import filter_dropped_ids
    dropped_ref = ray.put(dropped)
    survivors_ds = docs.select_columns(["doc_id"]).map_batches(
        filter_dropped_ids(dropped_ref), batch_format="pyarrow")
    return survivors_ds, dropped, len(pairs)


def _min_survivor_drops(pairs: Set[Tuple[int, int]]) -> Set[int]:
    """Union-find clusters; min doc_id survives each cluster."""
    parent: Dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra > rb:
                ra, rb = rb, ra
            parent[rb] = ra
    dropped = set()
    for a, b in pairs:
        for x in (a, b):
            if find(x) != x:
                dropped.add(x)
    return dropped


# ---------------- n-gram Jaccard (exact set similarity) ----------------


_NGRAM_CHUNK = 4096        # shingle buckets above this split into chunk pairs
_NGRAM_MAX_CHUNKS = 64     # K cap: per-unit rows stay ~est/K even for the
                           # hottest shingle (beyond, raise the cap, not G)
_NGRAM_LOCAL_ROWS = 1_000_000   # below this, skip hot discovery entirely


def ngram_jaccard_pairs(docs, n: int = 3, threshold: float = 0.8,
                        num_shuffle_groups: int = None,
                        est_shingles_per_doc: int = 256,  # unused (kept for API compat; exact count from the materialized relation)
                        hot_gate_rows: int = _NGRAM_LOCAL_ROWS,
                        chunk_rows: int = _NGRAM_CHUNK,
                        sample_frac: float = 0.02,
                        measure: str = "jaccard"):
    """Exact word-n-gram Jaccard similar pairs, as a distributed pipeline:

    1. per batch: distinct-shingle hash rows (shingle_hash, doc_id,
       set_size) — set_size rides along so no doc-size join is needed later;
    2. ``groupby(shingle_hash % G)`` -> vectorized co-occurrence pair
       emission per shingle run (pair templates, no per-shingle Python);
    3. ``groupby([a, b])`` native aggregation: shared-shingle count c =
       |A ∩ B| (each shared shingle emits the pair exactly once) + set
       sizes — J = c / (|A| + |B| - c) computed vectorized, filtered. Pair rows
    are pre-pruned by the exact PPJoin length bound and partially combined
    per (a, b) inside each emission task, so the aggregate shuffle carries
    one row per (pair, group) instead of one per shared shingle.

    Exact (no candidate cap): J comes from complete co-occurrence counts.
    A pathologically hot shingle (boilerplate shared by ~everyone) would make
    pair emission quadratic in ONE task, so hot shingles (discovered on a 2%
    sample of the materialized shingle relation — missing one costs
    parallelism, never correctness) split into
    chunk-PAIR units: rows chunk by doc_id % K and replicate to the K units
    containing their chunk; a unit (lo < hi) emits only cross pairs between
    its two chunks, a diagonal unit (lo == hi) its triangle — every doc pair
    sharing the shingle is emitted exactly once, so the downstream
    ``Sum(c)`` stays exact (same triangle decomposition as stages/dedup.py,
    but routed by the exact (sh, lo, hi) triple because here a group-key
    collision would corrupt counts, not just over-generate candidates).

    Returns a sorted list of (a, b, jaccard) — the RESULT set, small by
    construction; the corpus itself never lands on the driver.
    """
    import ray as _ray
    from ray.data.aggregate import Max, Sum
    from .common import adaptive_groups

    def shingle_rows(batch: pa.Table) -> pa.Table:
        """Distinct-shingle rows, fully vectorized: batch shingle hashes
        (functions/wordhash.py), per-doc dedupe via one lexsort + run
        compare, per-doc set sizes via bincount."""
        empty = pa.table({"sh": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64()),
                          "size": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        texts = batch.column("text").to_pylist()
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        flat, offs = batch_shingle_hashes(texts, n)
        if flat.size == 0:
            return empty
        doc_of = np.repeat(np.arange(len(texts)), np.diff(offs))
        order = np.lexsort((flat, doc_of))
        d, h = doc_of[order], flat[order]
        keep = np.empty(d.size, bool)
        keep[0] = True
        keep[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
        d, h = d[keep], h[keep]
        set_sizes = np.bincount(d, minlength=len(texts))
        return pa.table({
            "sh": pa.array(h.view(np.int64), pa.int64()),
            "doc_id": pa.array(doc_ids[d], pa.int64()),
            "size": pa.array(set_sizes[d], pa.int64()),
        })

    # one shingle pass, materialized: the shuffle would put this relation in
    # the object store anyway, and both consumers (hot-shingle sampling and
    # pair emission) reuse it instead of re-shingling the corpus
    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        shingle_rows, batch_format="pyarrow").materialize()
    est_rows = rows.count()        # exact and free on a materialized dataset
    if num_shuffle_groups is None:
        # shingle rows are 24 B each; target ~1M rows per pair-emission group
        num_shuffle_groups = adaptive_groups(est_rows, 1_000_000, lo=64)

    # hot-shingle discovery: sampled distinct-doc counts per shingle; only
    # sampled-hot shingles reach the driver (O(hot) memory). Skipped on small
    # inputs where even a worst-case single bucket is one sub-second task.
    plan: Dict[int, int] = {}
    if est_rows > hot_gate_rows:
        frac = sample_frac
        thresh = max(2, int(chunk_rows * frac / 2))

        def sh_counts(b: pa.Table) -> pa.Table:
            vc = b.column("sh").value_counts()
            return pa.table({"sh": vc.field("values"),
                             "cnt": vc.field("counts").cast(pa.int64())})

        hot = (rows.random_sample(frac, seed=19)
               .map_batches(sh_counts, batch_format="pyarrow")
               .groupby("sh").sum("cnt")
               .map_batches(lambda b: b.filter(
                   pc.greater(b.column("sum(cnt)"), thresh)),
                   batch_format="pyarrow")
               .take_all())
        plan = {int(r["sh"]): min(_NGRAM_MAX_CHUNKS,
                                  -(-int(r["sum(cnt)"] / frac) // chunk_rows))
                for r in hot}
    plan_ref = _ray.put(plan)

    def expand_chunks(b: pa.Table) -> pa.Table:
        """Route each row to its chunk-pair unit(s). Non-hot shingles are a
        single (0, 0) unit; a hot shingle with K chunks replicates each row
        to the K units containing its chunk (ci = doc_id % K)."""
        sh = b.column("sh").to_numpy(zero_copy_only=False)
        cplan = _ray.get(plan_ref)
        if cplan:
            dids = b.column("doc_id").to_numpy(zero_copy_only=False)
            nck = np.ones(sh.size, dtype=np.int64)
            for s, kk in cplan.items():        # plan is tiny (hot shingles)
                nck[sh == s] = kk
            ci = dids % nck
            rep = np.repeat(np.arange(sh.size), nck)
            seg_start = np.cumsum(nck) - nck
            cj = np.arange(rep.size, dtype=np.int64) - seg_start[rep]
            lo = np.minimum(ci[rep], cj)
            hi = np.maximum(ci[rep], cj)
            b = b.take(rep)
            chunk = ci[rep]
            shx = sh[rep]
        else:
            lo = hi = chunk = np.zeros(sh.size, np.int64)
            shx = sh
        # shuffle key mixes the EXACT unit triple; % G only merges units into
        # coarse groups — emit_pairs re-segments on the exact triple, so a
        # key collision can never conflate two different shingles
        g = _splitmix(shx.view(np.uint64) + np.uint64(0x9E37)
                      * (lo * _NGRAM_MAX_CHUNKS + hi).view(np.uint64)) \
            .view(np.int64) % num_shuffle_groups
        b = b.append_column("chunk", pa.array(chunk, pa.int64()))
        b = b.append_column("lo", pa.array(lo, pa.int64()))
        b = b.append_column("hi", pa.array(hi, pa.int64()))
        return b.append_column("gkey", pa.array(g, pa.int64()))

    def emit_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64()),
                          "sa": pa.array([], pa.int64()), "sb": pa.array([], pa.int64())})
        m = g.num_rows
        if m < 2:
            return empty
        g = g.sort_by([("sh", "ascending"), ("lo", "ascending"),
                       ("hi", "ascending"), ("chunk", "ascending"),
                       ("doc_id", "ascending")])
        sh = g.column("sh").to_numpy(zero_copy_only=False)
        lo = g.column("lo").to_numpy(zero_copy_only=False)
        hi = g.column("hi").to_numpy(zero_copy_only=False)
        dids = g.column("doc_id").to_numpy(zero_copy_only=False)
        sizes = g.column("size").to_numpy(zero_copy_only=False)
        new_unit = np.concatenate(([True], (sh[1:] != sh[:-1])
                                   | (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])))
        starts = np.flatnonzero(new_unit)
        lens = np.diff(np.append(starts, m))
        diag = lo[starts] == hi[starts]
        aa, bb, sa_l, sb_l = [], [], [], []

        def push(ii, jj):
            aa.append(np.minimum(dids[ii], dids[jj]))
            bb.append(np.maximum(dids[ii], dids[jj]))
            lo_is_i = dids[ii] <= dids[jj]
            sa_l.append(np.where(lo_is_i, sizes[ii], sizes[jj]))
            sb_l.append(np.where(lo_is_i, sizes[jj], sizes[ii]))

        # diagonal units (the common case — every non-hot shingle):
        # triangle via batched templates per run length
        d_lens = lens[diag]
        d_starts = starts[diag]
        for run_len in np.unique(d_lens[d_lens >= 2]):
            st = d_starts[d_lens == run_len]
            ti, tj = np.triu_indices(int(run_len), k=1)
            push((st[:, None] + ti[None, :]).ravel(),
                 (st[:, None] + tj[None, :]).ravel())
        # cross units (hot shingles only — few): chunk-lo rows x chunk-hi
        # rows; rows are chunk-sorted inside the unit, so one searchsorted
        # finds the split point
        chunk = g.column("chunk").to_numpy(zero_copy_only=False)
        for u in np.flatnonzero(~diag):
            s0, ln = int(starts[u]), int(lens[u])
            split = s0 + int(np.searchsorted(chunk[s0:s0 + ln], hi[s0]))
            n_lo, n_hi = split - s0, s0 + ln - split
            if n_lo == 0 or n_hi == 0:
                continue
            ii = np.repeat(np.arange(s0, split), n_hi)
            jj = np.tile(np.arange(split, s0 + ln), n_lo)
            push(ii, jj)
        if not aa:
            return empty
        a = np.concatenate(aa)
        b = np.concatenate(bb)
        sa = np.concatenate(sa_l)
        sb = np.concatenate(sb_l)
        if measure == "jaccard":
            # exact length filter (Xiao et al., PPJoin): J <= min(|A|,|B|)
            # / max(|A|,|B|), so size-mismatched pairs can never reach the
            # threshold — prune them before they shuffle (epsilon matches
            # the final jaccard_filter so no boundary pair is lost).
            # Containment has NO length bound (a small doc fully inside a
            # huge one is exactly the target), so the prune is skipped.
            keep = np.minimum(sa, sb) >= (threshold - 1e-12) \
                * np.maximum(sa, sb)
            if not keep.any():
                return empty
            a, b, sa, sb = a[keep], b[keep], sa[keep], sb[keep]
        # in-task partial combine: one row per (a, b) with the local shared-
        # shingle count — pairs sharing many shingles inside this group
        # shuffle one row instead of one per shingle
        order = np.lexsort((b, a))
        a, b, sa, sb = a[order], b[order], sa[order], sb[order]
        new = np.empty(a.size, bool)
        new[0] = True
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(new)
        c = np.diff(np.append(starts, a.size))
        return pa.table({"a": pa.array(a[starts], pa.int64()),
                         "b": pa.array(b[starts], pa.int64()),
                         "c": pa.array(c, pa.int64()),
                         "sa": pa.array(sa[starts], pa.int64()),
                         "sb": pa.array(sb[starts], pa.int64())})

    cand = rows.map_batches(expand_chunks, batch_format="pyarrow") \
        .groupby("gkey").map_groups(
            lambda g: emit_pairs(g.drop(["gkey"])), batch_format="pyarrow")
    agg = cand.groupby(["a", "b"]).aggregate(Sum("c"), Max("sa"), Max("sb"))

    out_col = "jaccard" if measure == "jaccard" else "containment"

    def jaccard_filter(b: pa.Table) -> pa.Table:
        c = b.column("sum(c)").to_numpy(zero_copy_only=False).astype(np.float64)
        sa = b.column("max(sa)").to_numpy(zero_copy_only=False).astype(np.float64)
        sb = b.column("max(sb)").to_numpy(zero_copy_only=False).astype(np.float64)
        if measure == "jaccard":
            union = sa + sb - c
            j = np.where(union > 0, c / np.maximum(union, 1e-300), 0.0)
        else:
            # max containment: the smaller set's coverage, c / min(|A|,|B|)
            j = c / np.minimum(sa, sb)
        keep = j >= threshold - 1e-12
        return pa.table({"a": b.column("a").filter(pa.array(keep)),
                         "b": b.column("b").filter(pa.array(keep)),
                         out_col: pa.array(np.round(j[keep], 6), pa.float64())})

    out = []
    for b in agg.map_batches(jaccard_filter, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        out.extend(zip(b.column("a").to_pylist(), b.column("b").to_pylist(),
                       b.column(out_col).to_pylist()))
    return sorted(out)


def ngram_containment_pairs(docs, n: int = 3, threshold: float = 0.5,
                            **kw):
    """Exact word-n-gram CONTAINMENT pairs: (a, b, containment) with
    ``c / min(|A|, |B|) >= threshold`` — one-sided near-duplication
    (quotes, partial mirrors, doc-inside-doc) that symmetric Jaccard
    misses by construction. Same distributed pipeline as
    :func:`ngram_jaccard_pairs` (one shingle pass, co-occurrence counts,
    native pair groupby) with the PPJoin length prune disabled: size-
    mismatched pairs are the target, not noise."""
    return ngram_jaccard_pairs(docs, n=n, threshold=threshold,
                               measure="containment", **kw)


# ---------------- embedding cosine near-dup ----------------


class HyperplaneLSH:
    """Random-hyperplane signatures for cosine LSH (Charikar 2002)."""

    def __init__(self, dim: int, n_bits: int = 16, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_bits))

    def keys(self, vecs: np.ndarray) -> np.ndarray:
        bits = (vecs @ self.planes) > 0
        key = np.zeros(vecs.shape[0], dtype=np.int64)
        for c in range(bits.shape[1]):
            key = (key << 1) | bits[:, c]
        return key


def embedding_dedup(embeds, threshold: float = 0.99, n_bits: int = 12,
                    n_tables: int = 4):
    """embeddings(vec_id, embedding) -> near-dup pairs (a, b, cos) with
    cos >= threshold, via multi-table hyperplane LSH buckets + exact verify.

    Candidate generation: per batch compute n_tables bucket keys; shuffle by
    (table, key); verify with a matmul per bucket.
    """
    first = embeds.take_batch(1, batch_format="pyarrow")
    dim = len(first.column("embedding")[0].as_py())
    tables = [HyperplaneLSH(dim, n_bits, seed=11 + 13 * t) for t in range(n_tables)]

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        emb = batch.column("embedding").combine_chunks()
        # flatten() honors list offsets: zero-copy values -> (n, dim)
        vecs = np.asarray(emb.flatten(), dtype=np.float64).reshape(-1, dim)
        norm = np.linalg.norm(vecs, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        vn = vecs / norm
        n = vn.shape[0]
        keys = np.concatenate([
            lsh.keys(vn) | (np.int64(t) << np.int64(n_bits + 1))
            for t, lsh in enumerate(tables)])
        # vn replicated n_tables times as ONE list column built from flat
        # values + arithmetic offsets (no per-row Python tolist)
        flat = pa.array(np.tile(vn, (n_tables, 1)).ravel(), pa.float64())
        offs = pa.array(np.arange(n * n_tables + 1, dtype=np.int32) * dim)
        return pa.table({
            "bucket": pa.array(keys, pa.int64()),
            "vec_id": pa.array(np.tile(ids, n_tables), pa.int64()),
            "vec": pa.ListArray.from_arrays(offs, flat),
        })

    bucketed = embeds.map_batches(bucketize, batch_format="pyarrow")

    def verify(group: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                          "cos": pa.array([], pa.float64())})
        m = group.num_rows
        if m < 2:
            return empty
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        vc = group.column("vec").combine_chunks()
        vecs = np.asarray(vc.flatten(), dtype=np.float64).reshape(m, -1)
        sim = vecs @ vecs.T
        ii, jj = np.nonzero(sim >= threshold - 1e-12)
        keep = ii < jj
        ii, jj = ii[keep], jj[keep]
        aa = np.minimum(ids[ii], ids[jj])
        bb = np.maximum(ids[ii], ids[jj])
        cc = np.round(sim[ii, jj], 6)
        ne = aa != bb                  # duplicate vec_ids within a bucket
        aa, bb, cc = aa[ne], bb[ne], cc[ne]
        if aa.size == 0:
            return empty
        # (a, b) dedupe via lexsort + run compare (same trick as
        # stages/dedup.py pair dedupe) — no per-pair Python set
        order = np.lexsort((bb, aa))
        aa, bb, cc = aa[order], bb[order], cc[order]
        uniq = np.empty(aa.size, bool)
        uniq[0] = True
        uniq[1:] = (aa[1:] != aa[:-1]) | (bb[1:] != bb[:-1])
        return pa.table({"a": pa.array(aa[uniq], pa.int64()),
                         "b": pa.array(bb[uniq], pa.int64()),
                         "cos": pa.array(cc[uniq], pa.float64())})

    pairs_ds = bucketed.groupby("bucket").map_groups(verify, batch_format="pyarrow")
    # cross-table dedupe of the RESULT set (O(pairs), small): one lexsort
    a_p, b_p, c_p = [], [], []
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            a_p.append(b.column("a").to_numpy(zero_copy_only=False))
            b_p.append(b.column("b").to_numpy(zero_copy_only=False))
            c_p.append(b.column("cos").to_numpy(zero_copy_only=False))
    if not a_p:
        return []
    aa, bb, cc = map(np.concatenate, (a_p, b_p, c_p))
    order = np.lexsort((bb, aa))
    aa, bb, cc = aa[order], bb[order], cc[order]
    uniq = np.empty(aa.size, bool)
    uniq[0] = True
    uniq[1:] = (aa[1:] != aa[:-1]) | (bb[1:] != bb[:-1])
    return [(int(a), int(b), float(c))
            for a, b, c in zip(aa[uniq], bb[uniq], cc[uniq])]


# ---------------- exact duplicate-span detection ----------------

# broadcast gate for the duplicated-gram hash set (Lee et al. substring
# dedup): above this, switch to the documented hash-join path instead of
# ray.put-ing the set (repo hard rule: size-gated broadcasts)
_BCAST_DUP_GRAMS = 10_000_000


def _win_tokens(texts, k: int):
    """Shared window scaffolding for the substring-dedup family: token
    lists, per-doc token counts, and the k-gram window hashes (int64
    bit-view — Ray's aggregate shuffle cannot carry uint64 keys above
    2^63) with whole-doc fallback shingles of short docs masked out.

    NOTE: runs WORKER-side (called from map_batches UDFs) — all imports
    must be module-level so by-value-pickled closures never trigger a
    package import on a worker whose driver started from a foreign cwd."""
    toks = [[t for t in TOKEN_RE.findall((x or "").lower())
             if len(t) > 1] for x in texts]
    counts = np.array([len(t) for t in toks], np.int64)
    h, offs = batch_shingle_hashes([" ".join(t) for t in toks], k)
    n_win = np.where(counts >= k, counts - k + 1, 0)
    keep = np.repeat(counts >= k, np.diff(offs))
    return (h[keep].view(np.int64),
            np.concatenate(([0], np.cumsum(n_win))), toks, counts)


def _exact_dup_grams(docs, k: int):
    """The STRING-EXACT duplicated-gram set shared by
    :func:`duplicate_spans` / :func:`scrub_duplicate_spans`, in three
    narrow passes (decontaminate's rule: a raw 64-bit hash hit is never
    trusted alone, so a collision cannot silently scrub non-duplicated
    text — r3 advice item):

    1. count pass: per-batch-distinct (hash, count) partials -> native
       ``groupby(h).sum`` -> CANDIDATE hashes with count >= 2 (16 B
       rows, never text).
    2. verify pass: per batch, only windows hitting the candidate set
       materialize their gram STRING; distinct (gram, count) partials
       -> native ``groupby(gram).sum`` -> grams whose exact string
       count >= 2. A candidate hash whose count was inflated by a
       collision of two distinct single-occurrence strings dies here.
    3. the verified grams re-hash with the same kernel, sort by hash,
       and return as (dup_h sorted int64, dup_strs aligned) — the mark
       pass confirms every hit by string equality over the equal-hash
       run.

    Both driver collections are size-gated at ``_BCAST_DUP_GRAMS``
    (scale path above the gate: shuffle (doc_id, s, h) windows by h
    range and semi-join per partition).
    """
    import ray
    from ray.data.aggregate import Sum

    from ..functions.wordhash import batch_shingle_hashes

    def count_partial(b: pa.Table) -> pa.Table:
        h, _, _, _ = _win_tokens(b.column("text").to_pylist(), k)
        if not h.size:
            return pa.table({"h": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        uh, c = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(uh, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64())})

    counts = docs.select_columns(["doc_id", "text"]) \
        .map_batches(count_partial, batch_format="pyarrow") \
        .groupby("h").aggregate(Sum("cnt"))

    cand: List[int] = []
    for b in counts.iter_batches(batch_format="pyarrow"):
        hv = b.column("h").to_numpy(zero_copy_only=False)
        cv = b.column("sum(cnt)").to_numpy(zero_copy_only=False)
        cand.extend(hv[cv >= 2].tolist())
        if len(cand) > _BCAST_DUP_GRAMS:
            raise ValueError(
                f"duplicated-gram set exceeds broadcast gate "
                f"({_BCAST_DUP_GRAMS}); use the hash-join scale path "
                "(shuffle (doc_id, s, h) windows by h range and semi-join "
                "per partition)")
    cand_arr = np.sort(np.array(cand, np.int64))
    if not cand_arr.size:
        return cand_arr, np.empty(0, object)
    cand_ref = ray.put(cand_arr)

    def gram_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"gram": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        h, offs, toks, _ = _win_tokens(b.column("text").to_pylist(), k)
        if not h.size:
            return empty
        c = ray.get(cand_ref)
        pos = np.clip(np.searchsorted(c, h), 0, c.size - 1)
        hit = np.flatnonzero(c[pos] == h)
        if not hit.size:
            return empty
        n_win = np.diff(offs)
        win_doc = np.repeat(np.arange(n_win.size), n_win)[hit]
        win_s = hit - offs[win_doc]
        grams = [" ".join(toks[d][s:s + k])
                 for d, s in zip(win_doc.tolist(), win_s.tolist())]
        ug, uc = np.unique(np.asarray(grams, object), return_counts=True)
        return pa.table({"gram": pa.array(ug, pa.string()),
                         "cnt": pa.array(uc.astype(np.int64), pa.int64())})

    gsum = docs.select_columns(["doc_id", "text"]) \
        .map_batches(gram_partial, batch_format="pyarrow") \
        .groupby("gram").aggregate(Sum("cnt"))
    dup_strs: List[str] = []
    for b in gsum.iter_batches(batch_format="pyarrow"):
        gv = b.column("gram").to_pylist()
        cv = b.column("sum(cnt)").to_numpy(zero_copy_only=False)
        dup_strs.extend(g for g, c in zip(gv, cv) if c >= 2)
        if len(dup_strs) > _BCAST_DUP_GRAMS:
            raise ValueError(
                f"duplicated-gram set exceeds broadcast gate "
                f"({_BCAST_DUP_GRAMS}); use the hash-join scale path")
    if not dup_strs:
        return np.empty(0, np.int64), np.empty(0, object)
    dh, _ = batch_shingle_hashes(dup_strs, k)   # one window per k-token gram
    dh = dh.view(np.int64)
    order = np.argsort(dh, kind="stable")
    return dh[order], np.asarray(dup_strs, object)[order]


def _verified_hits(h, offs, toks, dup_h, dup_strs, k: int):
    """Windows whose hash hits ``dup_h`` AND whose gram string equals a
    verified dup gram (walking the equal-hash run) -> (win_doc, win_s)
    of confirmed windows, sorted by (doc, start). The string loop runs
    only over hash hits, i.e. O(true duplicated windows)."""
    n_win = np.diff(offs)
    win_doc_all = np.repeat(np.arange(n_win.size), n_win)
    win_s_all = np.arange(h.size) - np.repeat(offs[:-1], n_win)
    pos = np.searchsorted(dup_h, h, side="left")
    inb = pos < dup_h.size
    hit = np.flatnonzero(inb & (dup_h[np.minimum(pos, dup_h.size - 1)] == h))
    if not hit.size:
        return (np.empty(0, np.int64),) * 2
    ok = np.zeros(hit.size, bool)
    for i, wi in enumerate(hit.tolist()):
        d = int(win_doc_all[wi])
        s = int(win_s_all[wi])
        w = " ".join(toks[d][s:s + k])
        p = int(pos[wi])
        while p < dup_h.size and dup_h[p] == h[wi]:
            if dup_strs[p] == w:
                ok[i] = True
                break
            p += 1
    conf = hit[ok]
    return win_doc_all[conf], win_s_all[conf]


def duplicate_spans(docs, k: int = 8):
    """EXACT cross-corpus duplicate-span detection (the substring-level
    dedup of Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better", arXiv:2107.06499 — token-window variant): every maximal
    token span covered by k-grams that occur MORE THAN ONCE in the corpus
    (any doc, any position).

    -> Dataset (doc_id, span_start, span_end): token-index half-open spans,
    overlapping/touching duplicated windows merged per doc.

    Plan: the string-exact dup-gram set from :func:`_exact_dup_grams`
    (hash count pass + exact-string verify pass, both native groupby
    sums) broadcasts once; the mark scan recomputes window hashes,
    confirms every hit by string equality (:func:`_verified_hits` — a
    64-bit collision can no longer scrub non-duplicated text), and
    merges confirmed windows into maximal spans with one vectorized
    pass (sorted starts; a new span opens where start - prev > k).
    Tokenization is the SQL-replicable variant; the DuckDB oracle
    re-derives count-dup grams + gaps-and-islands span merge exactly.
    """
    import ray

    dup_h, dup_strs = _exact_dup_grams(docs, k)
    dup_ref = ray.put((dup_h, dup_strs))

    def spans(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "span_start": pa.array([], pa.int64()),
                          "span_end": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        dh, dstrs = ray.get(dup_ref)
        if not dh.size:
            return empty
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        h, offs, toks, _ = _win_tokens(b.column("text").to_pylist(), k)
        if not h.size:
            return empty
        d, s = _verified_hits(h, offs, toks, dh, dstrs, k)
        if not d.size:
            return empty
        new_span = np.empty(d.size, bool)
        new_span[0] = True
        new_span[1:] = (d[1:] != d[:-1]) | ((s[1:] - s[:-1]) > k)
        starts = s[new_span]
        ends = np.maximum.reduceat(s, np.flatnonzero(new_span)) + k
        return pa.table({
            "doc_id": pa.array(ids[d[new_span]], pa.int64()),
            "span_start": pa.array(starts, pa.int64()),
            "span_end": pa.array(ends, pa.int64()),
        })

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(spans, batch_format="pyarrow")


def scrub_duplicate_spans(docs, k: int = 8):
    """Rewrite each doc with its duplicated spans REMOVED (the scrub policy
    that drops every corpus-duplicated k-gram region; Lee et al.'s
    keep-one-occurrence variant needs a canonical-occurrence choice and is
    deliberately out of scope — this is the conservative filter used when
    any duplication is treated as boilerplate).

    -> (doc_id, text_clean, n_removed): tokens inside any duplicated span
    dropped, survivors re-joined with single spaces; n_removed = dropped
    token count. Same three-pass plan, string-exact dup-gram set and
    broadcast gate as ``duplicate_spans`` (shared
    :func:`_exact_dup_grams` / :func:`_verified_hits` — hash hits are
    confirmed by string equality before any token is dropped); the
    scrub adds one boolean mask + one Arrow ``binary_join`` per batch.
    """
    import ray

    dup_h, dup_strs = _exact_dup_grams(docs, k)
    dup_ref = ray.put((dup_h, dup_strs))

    def scrub(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "text_clean": pa.array([], pa.string()),
                          "n_removed": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        dh, dstrs = ray.get(dup_ref)
        ids = b.column("doc_id")
        h, offs, toks, counts = _win_tokens(b.column("text").to_pylist(), k)
        flat_n = int(counts.sum())
        drop = np.zeros(flat_n, bool)            # per flat-token drop mask
        tok_starts = np.concatenate(([0], np.cumsum(counts)))
        if h.size and dh.size:
            wd, ws = _verified_hits(h, offs, toks, dh, dstrs, k)
            if wd.size:
                win_s = ws + tok_starts[wd]
                # mark k tokens per confirmed window (overlaps OR together)
                for d in range(k):
                    drop[win_s + d] = True
        keep = ~drop
        flat = pa.array([t for ts in toks for t in ts], pa.string())
        if flat_n:
            # clip trailing empty-doc starts (== flat_n) into range; their
            # bogus reduceat value is overwritten by the counts==0 reset
            seg = np.minimum(tok_starts[:-1], flat_n - 1)
            kept_per_doc = np.add.reduceat(keep.astype(np.int64), seg)
        else:
            kept_per_doc = np.zeros(counts.size, np.int64)
        kept_per_doc[counts == 0] = 0
        offs_out = pa.array(np.concatenate(([0], np.cumsum(kept_per_doc))),
                            pa.int32())
        lists = pa.ListArray.from_arrays(
            offs_out, flat.filter(pa.array(keep)))
        return pa.table({
            "doc_id": ids,
            "text_clean": pc.binary_join(lists, " "),
            "n_removed": pa.array((counts - kept_per_doc).astype(np.int64),
                                  pa.int64()),
        })

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(scrub, batch_format="pyarrow")


# ---------------- window-unit (paragraph-level) dedup ----------------

# The CCNet / RefinedWeb unit-level dedup family (Wenzek et al. 2020,
# arXiv:1911.00359 dedupe paragraphs by hash across shards; Penedo et al.
# 2023, arXiv:2306.01116 drop repeated lines/documents): the corpus is cut
# into fixed-width token windows ("paragraphs" — this synthetic corpus has
# no newline structure, so the unit is a W-token chunk) and each distinct
# chunk string keeps exactly its FIRST occurrence corpus-wide. Differs from
# duplicate_spans (Lee et al. substring dedup): units are disjoint and
# aligned, the survivor policy is keep-first rather than scrub-all, and a
# per-source boilerplate variant drops units repeated across >= m docs of
# one source.


def _chunk_relation(docs, win: int, cols=("doc_id", "text")):
    """Cut each doc's SQL-replicable token stream (TOKEN_RE, len>1) into
    disjoint ``win``-token chunks -> (doc_id[, source], cidx, chunk, h,
    nch) where ``h`` is the vectorized 64-bit chunk-string hash (int64
    bit-view — Ray shuffle keys must stay below 2^63) and ``nch`` the
    doc's total chunk count. One ``flat_word_hashes`` call per batch;
    chunk strings contain no newline (space-joined [a-z0-9]+ tokens), the
    kernel's only precondition."""
    from ..functions.wordhash import flat_word_hashes

    with_source = "source" in cols

    def chunker(b: pa.Table) -> pa.Table:
        base = {"doc_id": pa.array([], pa.int64())}
        if with_source:
            base["source"] = pa.array([], pa.string())
        base.update({"cidx": pa.array([], pa.int64()),
                     "chunk": pa.array([], pa.string()),
                     "h": pa.array([], pa.int64()),
                     "nch": pa.array([], pa.int64())})
        empty = pa.table(base)
        if b.num_rows == 0:
            return empty
        texts = b.column("text").to_pylist()
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        toks = [[t for t in TOKEN_RE.findall((x or "").lower())
                 if len(t) > 1] for x in texts]
        nch = np.array([-(-len(t) // win) if t else 0 for t in toks],
                       np.int64)
        if not nch.sum():
            return empty
        chunks = [" ".join(t[i * win:(i + 1) * win])
                  for t in toks for i in range(-(-len(t) // win))]
        h = flat_word_hashes(chunks).view(np.int64)
        di = np.repeat(np.arange(len(toks)), nch)
        cidx = np.arange(int(nch.sum()), dtype=np.int64) \
            - np.repeat(np.concatenate(([0], np.cumsum(nch)[:-1])), nch)
        out = {"doc_id": pa.array(ids[di].astype(np.int64), pa.int64())}
        if with_source:
            src = np.asarray(b.column("source").to_pylist(), object)
            out["source"] = pa.array(src[di], pa.string())
        out.update({
            "cidx": pa.array(cidx, pa.int64()),
            "chunk": pa.array(np.asarray(chunks, object), pa.string()),
            "h": pa.array(h, pa.int64()),
            "nch": pa.array(nch[di], pa.int64())})
        return pa.table(out)

    return docs.select_columns(list(cols)) \
        .map_batches(chunker, batch_format="pyarrow")


def _reassemble_chunks(survivors):
    """(doc_id, cidx, chunk, nch) survivors -> (doc_id, text, n_chunks,
    n_dropped): per-doc chunks re-joined in cidx order. Bucketed by
    doc_id hash (adaptive group count) so one task never holds more than
    ~target rows; the per-bucket kernel is one lexsort + segment walk
    with a C-level join per doc."""
    from .common import adaptive_groups

    survivors = survivors.materialize()       # count() + output pass: the
    est = survivors.count()                   # dedup shuffle must run ONCE
    ngroups = adaptive_groups(est, 1_000_000, lo=16)

    def tag(b: pa.Table) -> pa.Table:
        # uint64 arithmetic: the golden-ratio constant exceeds int64, and
        # int64 * big-python-int silently promotes to float64 (zeroing the
        # low bits -> every row buckets to _g=0)
        d = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        g = (d * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(ngroups)
        return b.append_column(
            "_g", pa.array(g.astype(np.int64), pa.int64()))

    def rebuild(g: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "text": pa.array([], pa.string()),
                          "n_chunks": pa.array([], pa.int64()),
                          "n_dropped": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        d = g.column("doc_id").to_numpy(zero_copy_only=False)
        ci = g.column("cidx").to_numpy(zero_copy_only=False)
        ch = np.asarray(g.column("chunk").to_pylist(), object)
        nch = g.column("nch").to_numpy(zero_copy_only=False)
        o = np.lexsort((ci, d))
        d, ci, ch, nch = d[o], ci[o], ch[o], nch[o]
        starts = np.flatnonzero(
            np.concatenate(([True], d[1:] != d[:-1])))
        ends = np.append(starts[1:], d.size)
        return pa.table({
            "doc_id": pa.array(d[starts].astype(np.int64), pa.int64()),
            "text": pa.array([" ".join(ch[s:e])
                              for s, e in zip(starts, ends)], pa.string()),
            "n_chunks": pa.array(nch[starts].astype(np.int64), pa.int64()),
            "n_dropped": pa.array(
                (nch[starts] - (ends - starts)).astype(np.int64),
                pa.int64())})

    return survivors.map_batches(tag, batch_format="pyarrow") \
        .groupby("_g").map_groups(lambda g: rebuild(g.drop_columns(["_g"])),
                                  batch_format="pyarrow")


def paragraph_dedup(docs, win: int = 20):
    """Corpus-wide keep-first window-unit dedup -> (doc_id, text,
    n_chunks, n_dropped): every distinct ``win``-token chunk STRING keeps
    only its first occurrence (min (doc_id, cidx)); docs are re-joined
    from their surviving chunks (docs with zero tokens vanish, matching
    the SQL oracle's group-by over surviving rows).

    Plan: chunk relation (one vectorized hash pass) -> groupby chunk-hash
    bucket -> per-bucket STRING-exact first-occurrence selection (equal
    chunks always share h, so buckets are complete; hash collisions are
    harmless because selection compares strings) -> bucketed per-doc
    reassembly. Two natural-key shuffles, no driver-side state, no
    broadcast — scales with the chunk relation like exact_dedup."""
    from .common import adaptive_groups

    chunks = _chunk_relation(docs, win)
    ngroups = adaptive_groups(docs.count() * 8, 1_000_000, lo=16)

    def tag(b: pa.Table) -> pa.Table:
        h = b.column("h").to_numpy(zero_copy_only=False)
        return b.append_column(
            "_g", pa.array((h.view(np.uint64) % ngroups).astype(np.int64),
                           pa.int64()))

    def first_only(g: pa.Table) -> pa.Table:
        cols = ["doc_id", "cidx", "chunk", "nch"]
        if g.num_rows == 0:
            return g.select(cols)
        d = g.column("doc_id").to_numpy(zero_copy_only=False)
        ci = g.column("cidx").to_numpy(zero_copy_only=False)
        ch = np.asarray(g.column("chunk").to_pylist(), object)
        o = np.lexsort((ci, d, ch))
        firsts = np.concatenate(([True], ch[o][1:] != ch[o][:-1]))
        return g.select(cols).take(pa.array(o[firsts], pa.int64()))

    survivors = chunks.map_batches(tag, batch_format="pyarrow") \
        .groupby("_g").map_groups(
            lambda g: first_only(g.drop_columns(["_g"])),
            batch_format="pyarrow")
    return _reassemble_chunks(survivors)


def boilerplate_remove(docs, win: int = 20, min_docs: int = 2):
    """Per-source boilerplate removal -> (doc_id, text, n_chunks,
    n_dropped): a chunk string appearing in >= ``min_docs`` DISTINCT docs
    of the SAME source is boilerplate (nav bars, footers, templated
    headers in a web crawl) and ALL its occurrences in that source drop —
    no canonical copy survives, unlike :func:`paragraph_dedup`. The same
    chunk text under a different source is independent (CCNet dedupes
    within snapshot shards for the same reason).

    Same bucketed plan; the per-bucket kernel segments (source, chunk)
    runs and counts distinct doc_ids per run vectorized."""
    from .common import adaptive_groups

    chunks = _chunk_relation(docs, win, cols=("doc_id", "source", "text"))
    ngroups = adaptive_groups(docs.count() * 8, 1_000_000, lo=16)

    def tag(b: pa.Table) -> pa.Table:
        h = b.column("h").to_numpy(zero_copy_only=False)
        return b.append_column(
            "_g", pa.array((h.view(np.uint64) % ngroups).astype(np.int64),
                           pa.int64()))

    def keep_rare(g: pa.Table) -> pa.Table:
        cols = ["doc_id", "cidx", "chunk", "nch"]
        if g.num_rows == 0:
            return g.select(cols)
        d = g.column("doc_id").to_numpy(zero_copy_only=False)
        ci = g.column("cidx").to_numpy(zero_copy_only=False)
        ch = np.asarray(g.column("chunk").to_pylist(), object)
        src = np.asarray(g.column("source").to_pylist(), object)
        o = np.lexsort((ci, d, ch, src))
        d, ch, src = d[o], ch[o], src[o]
        newrun = np.concatenate(
            ([True], (src[1:] != src[:-1]) | (ch[1:] != ch[:-1])))
        run_id = np.cumsum(newrun) - 1
        # distinct doc_ids per (source, chunk) run: rows are sorted by
        # doc within each run, so count doc-change boundaries
        newdoc = newrun | np.concatenate(([True], d[1:] != d[:-1]))
        ndoc = np.bincount(run_id, newdoc.astype(np.int64))
        keep = ndoc[run_id] < min_docs
        return g.select(cols).take(pa.array(o[keep], pa.int64()))

    survivors = chunks.map_batches(tag, batch_format="pyarrow") \
        .groupby("_g").map_groups(
            lambda g: keep_rare(g.drop_columns(["_g"])),
            batch_format="pyarrow")
    return _reassemble_chunks(survivors)


# ---------------- cross-corpus (incremental) exact dedup ----------------


def dedup_against(new_docs, old_docs, max_bcast_rows: int = 2_000_000,
                  num_groups: int = None):
    """Incremental-crawl exact dedup: drop NEW documents whose full text
    already exists in the OLD corpus (the recrawl filter every continuous
    crawl pipeline runs before indexing). Returns the surviving new-side
    ``(doc_id,)`` rows.

    Both corpora hash per batch to the same 128-bit md5 as
    :func:`exact_dedup` (two int64 halves — a truncated digest could
    collide and silently drop a genuinely new page). The old side first
    collapses to DISTINCT hashes with one native groupby, so only
    O(distinct old texts) keys ever move:

    - **under the gate** the key set ships once via the object store and
      each new batch runs pyarrow's vectorized 'left anti' join locally —
      zero new-side shuffle (the common case: the old-hash set is the
      thing a crawl keeps hot anyway);
    - **above the gate** both sides co-partition by ``hash_hi % G``
      (uniform — md5 bits) into adaptive groups, and each group resolves
      with one lexsort-run membership scan: a new row survives iff no old
      row shares its (hi, lo) run. No driver-side O(corpus) state.
    """
    import ray

    from .common import adaptive_groups

    new_h = new_docs.map_batches(_text_hash_batch, batch_format="pyarrow")
    old_keys = old_docs.map_batches(_text_hash_batch,
                                    batch_format="pyarrow") \
        .groupby(["hash_hi", "hash_lo"]).count() \
        .select_columns(["hash_hi", "hash_lo"]).materialize()
    n_keys = old_keys.count()

    if n_keys <= max_bcast_rows:
        parts = [t for t in ray.get(old_keys.to_arrow_refs())
                 if t.num_rows]
        k_tbl = (pa.concat_tables(parts) if parts else pa.table(
            {"hash_hi": pa.array([], pa.int64()),
             "hash_lo": pa.array([], pa.int64())})).combine_chunks()
        k_ref = ray.put(k_tbl)

        def anti(b: pa.Table) -> pa.Table:
            keys = ray.get(k_ref)
            out = b.join(keys, keys=["hash_hi", "hash_lo"],
                         join_type="left anti", use_threads=False)
            return out.select(["doc_id"])

        return new_h.map_batches(anti, batch_format="pyarrow")

    # scale path: co-partition by the (uniform) high hash half.
    # Size from new_docs.count() — the map is 1:1, and counting new_h
    # would execute the md5 pass a second time (the paragraph_dedup
    # materialize-before-count pitfall).
    if num_groups is None:
        num_groups = adaptive_groups(new_docs.count() + n_keys,
                                     1_000_000, lo=32)

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            hi = b.column("hash_hi").to_numpy(zero_copy_only=False)
            g = (hi % num_groups + num_groups) % num_groups
            ids = (b.column("doc_id").to_numpy(zero_copy_only=False)
                   if side == 0 else np.zeros(n, np.int64))
            return pa.table({
                "_g": pa.array(g, pa.int64()),
                "_side": pa.array(np.full(n, side, np.int8), pa.int8()),
                "doc_id": pa.array(ids, pa.int64()),
                "hash_hi": pa.array(hi, pa.int64()),
                "hash_lo": b.column("hash_lo")})
        return fn

    tagged = new_h.map_batches(tag(0), batch_format="pyarrow") \
        .union(old_keys.map_batches(tag(1), batch_format="pyarrow"))

    def resolve(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        side = g.column("_side").to_numpy(zero_copy_only=False)
        hi = g.column("hash_hi").to_numpy(zero_copy_only=False)
        lo = g.column("hash_lo").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, lo, hi))
        hi_s, lo_s, side_s = hi[order], lo[order], side[order]
        run_start = np.concatenate(
            ([True], (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])))
        run_id = np.cumsum(run_start) - 1
        has_old = np.bincount(run_id, weights=(side_s == 1)) > 0
        keep = order[(side_s == 0) & ~has_old[run_id]]
        return pa.table({"doc_id": pa.array(ids[keep], pa.int64())})

    return tagged.groupby("_g").map_groups(resolve, batch_format="pyarrow")


_RDIFF_SCHEMA = pa.schema([
    ("source", pa.string()), ("n_unchanged", pa.int64()),
    ("n_changed", pa.int64()), ("n_new", pa.int64()),
    ("n_deleted", pa.int64())])


def recrawl_diff(new_docs, old_docs, num_groups: int = 64):
    """Cross-crawl lifecycle report -> (source, n_unchanged, n_changed,
    n_new, n_deleted): for two snapshots keyed by stable doc_id, how
    many documents per source kept their exact text, changed it,
    appeared, or vanished — the recrawl dashboard row next to
    :func:`dup_rate_per_source`.

    Shape: both sides reduce to (doc_id, 128-bit md5, source) rows
    (the :func:`exact_dedup` hash kernel), co-partition on
    ``doc_id % num_groups`` (a tagged union — the FULL OUTER join no
    per-batch broadcast can express), and each partition classifies its
    doc_id runs with one lexsort + boundary scan, emitting per-(source,
    status) COUNT partials only. The final groupby(source) sums four
    int columns; output is O(sources). Assumes doc_id is unique within
    each snapshot (the crawl-key contract)."""
    from ray.data.aggregate import Sum

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            h = _text_hash_batch(b)
            ids = h.column("doc_id").to_numpy(zero_copy_only=False)
            return pa.table({
                "_g": pa.array((ids % num_groups + num_groups)
                               % num_groups, pa.int64()),
                "_side": pa.array(np.full(len(ids), side, np.int8),
                                  pa.int8()),
                "doc_id": h.column("doc_id"),
                "hash_hi": h.column("hash_hi"),
                "hash_lo": h.column("hash_lo"),
                "source": b.column("source")})
        return fn

    tagged = old_docs.map_batches(tag(0), batch_format="pyarrow").union(
        new_docs.map_batches(tag(1), batch_format="pyarrow"))

    def classify(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _RDIFF_SCHEMA.empty_table()
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        side = g.column("_side").to_numpy(zero_copy_only=False)
        hi = g.column("hash_hi").to_numpy(zero_copy_only=False)
        lo = g.column("hash_lo").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, ids))          # old row first in a run
        ids_s, side_s = ids[order], side[order]
        start = np.flatnonzero(np.concatenate(
            ([True], ids_s[1:] != ids_s[:-1])))
        run_id = np.cumsum(np.concatenate(
            ([True], ids_s[1:] != ids_s[:-1]))) - 1
        has_old = np.bincount(run_id, weights=(side_s == 0)) > 0
        has_new = np.bincount(run_id, weights=(side_s == 1)) > 0
        both = has_old & has_new
        old_pos = order[start]                    # valid where has_old
        # second-row index clipped: old-only runs never read new_pos
        new_pos = order[np.minimum(start + has_old.astype(np.int64),
                                   order.size - 1)]
        same = np.zeros(start.size, bool)
        b = np.flatnonzero(both)
        same[b] = (hi[old_pos[b]] == hi[new_pos[b]]) & \
                  (lo[old_pos[b]] == lo[new_pos[b]])
        # 0 unchanged, 1 changed, 2 new, 3 deleted
        status = np.where(both, np.where(same, 0, 1),
                          np.where(has_new, 2, 3))
        src_pos = np.where(has_new, new_pos, old_pos)
        srcs = g.column("source").take(
            pa.array(src_pos, pa.int64())).to_pylist()
        uniq, inv = np.unique(np.asarray(srcs, object),
                              return_inverse=True)
        cnt = np.bincount(inv * 4 + status,
                          minlength=uniq.size * 4).reshape(-1, 4)
        return pa.table({
            "source": pa.array(uniq.tolist(), pa.string()),
            "n_unchanged": pa.array(cnt[:, 0], pa.int64()),
            "n_changed": pa.array(cnt[:, 1], pa.int64()),
            "n_new": pa.array(cnt[:, 2], pa.int64()),
            "n_deleted": pa.array(cnt[:, 3], pa.int64())})

    summed = tagged.groupby("_g").map_groups(
        classify, batch_format="pyarrow").groupby("source").aggregate(
        Sum("n_unchanged"), Sum("n_changed"), Sum("n_new"),
        Sum("n_deleted"))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "source": b.column("source"),
            "n_unchanged": b.column("sum(n_unchanged)"),
            "n_changed": b.column("sum(n_changed)"),
            "n_new": b.column("sum(n_new)"),
            "n_deleted": b.column("sum(n_deleted)")})

    return summed.map_batches(fin, batch_format="pyarrow")


def dup_rate_per_source(docs):
    """Per-source exact-duplicate report -> (source, n_docs, n_unique,
    dup_rate): how much of each source is verbatim repetition — the
    number a curation dashboard watches per crawl snapshot.

    Shape: per-batch (source, 128-bit md5 halves) rows (the exact_dedup
    hash with the source column riding along) -> ONE native groupby over
    (hash_hi, hash_lo, source) -> per-batch per-source run-count
    partials (one sort + boundary scan, shared kernel for both the
    distinct and the raw counts) -> tiny groupby Sum.
    dup_rate = round(1 - n_unique/n_docs, 6)."""
    import ray
    from ray.data.aggregate import Sum

    from .common import round_half_away

    def hash_rows(b: pa.Table) -> pa.Table:
        return _text_hash_batch(b).append_column("source",
                                                 b.column("source"))

    def runs_per_source(out_col: str):
        """(source, <out_col>) = rows per source in this batch — counts
        DISTINCT hashes when fed the post-groupby relation, raw docs
        when fed the corpus."""
        def fn(b: pa.Table) -> pa.Table:
            empty = pa.table({"source": pa.array([], pa.string()),
                              out_col: pa.array([], pa.int64())})
            if b.num_rows == 0:
                return empty
            srcs = np.asarray(b.column("source").to_pylist(), object)
            o = np.argsort(srcs, kind="stable")
            ss = srcs[o]
            starts = np.flatnonzero(np.concatenate(
                ([True], ss[1:] != ss[:-1])))
            return pa.table({
                "source": pa.array(ss[starts], pa.string()),
                out_col: pa.array(
                    np.diff(np.append(starts, ss.size)).astype(np.int64),
                    pa.int64())})
        return fn

    uniq = docs.map_batches(hash_rows, batch_format="pyarrow") \
        .groupby(["hash_hi", "hash_lo", "source"]).count()
    nu = uniq.map_batches(runs_per_source("n_unique"),
                          batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("n_unique",
                                         alias_name="n_unique"))
    nd = docs.select_columns(["source"]) \
        .map_batches(runs_per_source("n_docs"), batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("n_docs", alias_name="n_docs"))

    empty_out = pa.table({"source": pa.array([], pa.string()),
                          "n_docs": pa.array([], pa.int64()),
                          "n_unique": pa.array([], pa.int64()),
                          "dup_rate": pa.array([], pa.float64())})
    nd_parts = [t for t in ray.get(nd.materialize().to_arrow_refs())
                if t.num_rows]
    if not nd_parts:
        return empty_out
    nu_parts = [t for t in ray.get(nu.materialize().to_arrow_refs())
                if t.num_rows]
    nd_t = pa.concat_tables(nd_parts)
    u_map: dict = {}
    if nu_parts:
        nu_t = pa.concat_tables(nu_parts)
        u_map = dict(zip(
            nu_t.column("source").to_pylist(),
            nu_t.column("n_unique").cast(pa.int64()).to_pylist()))
    rows = sorted(zip(nd_t.column("source").to_pylist(),
                      nd_t.column("n_docs").cast(pa.int64()).to_pylist()))
    srcs = [s for s, _ in rows]
    ndv = np.array([n for _, n in rows], np.int64)
    nuv = np.array([u_map.get(s, 0) for s in srcs], np.int64)
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "n_docs": pa.array(ndv, pa.int64()),
        "n_unique": pa.array(nuv, pa.int64()),
        "dup_rate": pa.array(
            round_half_away(1.0 - nuv.astype(np.float64) / ndv, 6),
            pa.float64())})


def cluster_canonical(assign, quality_col: str = "n_chars",
                      id_col: str = "doc_id",
                      cluster_col: str = "cluster"):
    """Representative selection after clustering dedup: per cluster keep
    the member with the HIGHEST quality (ties -> lowest id) — the policy
    step between dup_clusters and the training corpus ("keep the longest
    copy, drop the mirrors").

    Argmax-with-tiebreak distributes as ONE native groupby: each row
    encodes ``key = quality * 2^32 + (2^32-1 - id)`` so integer Max is
    exactly (quality desc, id asc) lexicographic order; the winner
    decodes from the max key. Requires 0 <= quality < 2^30 and
    0 <= id < 2^32 (asserted per batch — doc-length-class qualities and
    dense doc ids; widen the limbs for larger domains).

    Output: cluster, keep_id, quality, n_members.
    """
    from ray.data.aggregate import Count, Max

    MASK = (1 << 32) - 1

    def encode(b: pa.Table) -> pa.Table:
        empty = pa.table({cluster_col: pa.array([], pa.int64()),
                          "key": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        q = b.column(quality_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        i = b.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        assert (q >= 0).all() and (q < (1 << 30)).all(), \
            "quality out of the 2^30 limb"
        assert (i >= 0).all() and (i <= MASK).all(), \
            "id out of the 2^32 limb"
        key = (q << 32) + (MASK - i)
        return pa.table({
            cluster_col: b.column(cluster_col).cast(pa.int64()),
            "key": pa.array(key, pa.int64())})

    agg = assign.map_batches(encode, batch_format="pyarrow") \
        .groupby(cluster_col).aggregate(Max("key", alias_name="key"),
                                        Count(alias_name="n_members"))

    def decode(b: pa.Table) -> pa.Table:
        empty = pa.table({"cluster": pa.array([], pa.int64()),
                          "keep_id": pa.array([], pa.int64()),
                          "quality": pa.array([], pa.int64()),
                          "n_members": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        key = b.column("key").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "cluster": b.column(cluster_col).cast(pa.int64()),
            "keep_id": pa.array(MASK - (key & MASK), pa.int64()),
            "quality": pa.array(key >> 32, pa.int64()),
            "n_members": b.column("n_members").cast(pa.int64())})

    return agg.map_batches(decode, batch_format="pyarrow").sort("cluster")


def semdedup(embeds, k: int = 8, iters: int = 5, threshold: float = 0.95,
             vec_col: str = "embedding", id_col: str = "vec_id"):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) -> (vec_id,
    cluster, keep): semantic dedup by k-means partition + EXACT
    within-cluster cosine, the published recipe for web-scale corpora —
    clustering makes the quadratic verify local, so no global pair
    shuffle ever exists.

    - **cluster**: distributed spherical k-means
      (:func:`~.similarity.kmeans_fit` — streaming passes, centroids
      broadcast, vectors never shuffle during training).
    - **partition**: one assignment pass tags each vector with its
      cluster; the ONLY corpus-sized shuffle is the groupby(cluster)
      that co-locates each cluster in one task. Partitioning
      assumption (documented per the custom-operator contract): a
      cluster fits one worker — size k so corpus/k vectors fit memory;
      split oversized clusters by re-running semdedup inside them.
    - **verify**: per cluster, one normalize + matmul; the greedy scan
      visits items in keep-priority order (centroid-cosine ASC, id ASC
      — the paper keeps LOW-centroid-similarity examples) and keeps an
      item iff it is not within ``threshold`` of any already-kept item.
      Deterministic for any partition layout: assignment is a pure
      function of the (deterministic) centroids and the scan order is a
      pure function of cluster contents."""
    from .similarity import kmeans_fit

    cent = kmeans_fit(embeds, k=k, iters=iters, vec_col=vec_col,
                      id_col=id_col)
    if cent.size == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int64()),
                         "keep": pa.array([], pa.bool_())})
    dim = cent.shape[1]

    def assign(b: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "cluster": pa.array([], pa.int64()),
                          "vec": pa.array([], pa.list_(pa.float64()))})
        if b.num_rows == 0:
            return empty
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        emb = b.column(vec_col).combine_chunks()
        vecs = np.asarray(emb.flatten(), np.float64).reshape(-1, dim)
        norm = np.linalg.norm(vecs, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        vn = vecs / norm
        cl = np.argmax(vn @ cent.T, axis=1).astype(np.int64)
        flat = pa.array(vn.ravel(), pa.float64())
        offs = pa.array(np.arange(b.num_rows + 1, dtype=np.int32) * dim)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "cluster": pa.array(cl, pa.int64()),
            "vec": pa.ListArray.from_arrays(offs, flat)})

    tagged = embeds.select_columns([id_col, vec_col]) \
        .map_batches(assign, batch_format="pyarrow")

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "cluster": pa.array([], pa.int64()),
                          "keep": pa.array([], pa.bool_())})
        m = g.num_rows
        if m == 0:
            return empty
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        cl = int(g.column("cluster")[0].as_py())
        vc = g.column("vec").combine_chunks()
        vn = np.asarray(vc.flatten(), np.float64).reshape(m, dim)
        csim = vn @ cent[cl]
        order = np.lexsort((ids, csim))   # centroid-cos ASC, id ASC
        sim = vn[order] @ vn[order].T
        oids = ids[order]
        kept = np.zeros(m, bool)
        for i in range(m):
            prev = kept[:i]
            kept[i] = not (sim[i, :i][prev] >= threshold - 1e-12).any()
        keep_sorted = np.argsort(oids, kind="stable")
        return pa.table({
            id_col: pa.array(oids[keep_sorted], pa.int64()),
            "cluster": pa.array(np.full(m, cl, np.int64), pa.int64()),
            "keep": pa.array(kept[keep_sorted], pa.bool_())})

    return tagged.groupby("cluster") \
        .map_groups(resolve, batch_format="pyarrow").sort(id_col)


def soft_dedup_weights(docs):
    """Soft deduplication -> (doc_id, weight): instead of DROPPING exact
    duplicates, every document gets training weight 1/|its exact-dup
    cluster| so each distinct text contributes unit mass to the loss —
    the modern alternative to hard dedup (down-weighting preserves
    natural distribution shape while killing memorization pressure;
    cf. SlimPajama/D4-style soft weighting).

    Plan: the exact_dedup hash relation (doc_id, 128-bit md5) shuffles
    once into a native count groupby; counts broadcast back by a SECOND
    pass over the same hash relation joined per batch against... no —
    cheaper: ONE groupby carrying both the count and the member list is
    exactly what groupby(map_groups) gives; each (tiny) hash group
    emits its members with weight 1/n. Groups are exact-duplicate
    clusters — bounded by the duplication factor, never corpus-sized.
    Weight rounds half-away at 6 dp (SQL round parity).
    """
    def weights(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "weight": pa.array([], pa.float64())})
        n = g.num_rows
        w = float(np.floor(1e6 / n + 0.5) / 1e6)
        return pa.table({
            "doc_id": g.column("doc_id").cast(pa.int64()),
            "weight": pa.array(np.full(n, w, np.float64),
                               pa.float64())})

    hashed = docs.map_batches(_text_hash_batch, batch_format="pyarrow")
    return hashed.groupby(["hash_hi", "hash_lo"]) \
        .map_groups(lambda g: weights(g.drop_columns(
            ["hash_hi", "hash_lo"])), batch_format="pyarrow") \
        .sort("doc_id")


def cross_source_dup_pairs(docs, n: int = 3, threshold: float = 0.8):
    """Syndication detection -> (doc_a, doc_b, source_a, source_b,
    jaccard): NEAR-duplicate pairs (word-n-gram Jaccard >= threshold,
    the :func:`ngram_jaccard_pairs` machinery) whose two documents live
    in DIFFERENT sources — the curation report that tells you two
    crawls/feeds carry the same syndicated content (byte-identity
    almost never survives templating, so exact hashing misses these).

    The heavy lifting is the existing distributed pair pipeline (one
    shingle shuffle, PPJoin pruning, hot-shingle chunk split); this
    adds ONLY a candidate-id filtered source lookup — the pair list is
    O(near-dups), so the lookup batch-scans docs once against a
    broadcast id set and nothing corpus-sized reaches the driver
    beyond what ngram_jaccard_pairs already returns.
    """
    import ray

    pair_list = ngram_jaccard_pairs(docs, n=n, threshold=threshold)
    if not pair_list:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "source_a": pa.array([], pa.string()),
                         "source_b": pa.array([], pa.string()),
                         "jaccard": pa.array([], pa.float64())})
    cand = np.unique(np.asarray(
        [d for p in pair_list for d in (p[0], p[1])], np.int64))
    cand_ref = ray.put(cand)

    def lookup(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cs = ray.get(cand_ref)
        pos = np.clip(np.searchsorted(cs, ids), 0, cs.size - 1)
        m = cs[pos] == ids
        t = b.filter(pa.array(m))
        return pa.table({"doc_id": t.column("doc_id").cast(pa.int64()),
                         "source": t.column("source")})

    smap = {}
    for bt in docs.select_columns(["doc_id", "source"]) \
            .map_batches(lookup, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        smap.update(zip(bt.column("doc_id").to_pylist(),
                        bt.column("source").to_pylist()))

    rows = [(a, b, smap[a], smap[b], j) for a, b, j in pair_list
            if smap[a] != smap[b]]
    rows.sort()
    return pa.table({
        "doc_a": pa.array([r[0] for r in rows], pa.int64()),
        "doc_b": pa.array([r[1] for r in rows], pa.int64()),
        "source_a": pa.array([r[2] for r in rows], pa.string()),
        "source_b": pa.array([r[3] for r in rows], pa.string()),
        "jaccard": pa.array([r[4] for r in rows], pa.float64())})
