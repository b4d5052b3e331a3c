"""Near-duplicate detection: SimHash LSH banding (SURVEY.md §2 T2/D2).

The reference compares every new document against ALL previously accepted
documents — an O(N²) serialized scan whose outcome depends on arrival order
(components/document_processor.py:72-79, multithread_indexer.py:110-120).
That cannot scale and is nondeterministic; the Ray-native design is:

1. band stage: flat-map each (doc_id, simhash) to ``num_bands`` rows keyed by
   a band of the fingerprint. With ``num_bands = max_hamming + 1`` (20 for the
   reference's 0.85/128-bit threshold) the pigeonhole principle makes
   candidate generation EXACT: every pair within threshold shares a band.
2. ``groupby(band)`` shuffle + per-bucket vectorized hamming verification
   (uint8 popcount matrix, chunked so a hot bucket never materializes an
   unbounded pairwise matrix).
3. candidate pairs (tiny relative to N — dup pairs, not docs) come back to
   the driver; union-find connects clusters; within each cluster docs are
   accepted greedily in ascending doc_id against previously accepted members
   — the reference's first-seen-wins rule with doc_id replacing arrival
   order, so the result is deterministic across any parallelism level.

Scale note (documented assumption): pair collection assumes |dup pairs| << N.
At 10^12 docs with a looser threshold the greedy step itself would move into
a per-cluster ``map_groups``; the banding/verify stages already scale.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Set, Tuple

import numpy as np
import pyarrow as pa

from ..config import EngineConfig, DEFAULT_CONFIG
from ..functions.memtune import tune_malloc
from ..functions.simhash import NBYTES, hamming_bytes

_VERIFY_CHUNK = 2048


def _band_bounds(bits: int, num_bands: int) -> np.ndarray:
    return np.linspace(0, bits, num_bands + 1).astype(int)


class BandEmitter:
    """batch fn: (doc_id, simhash) -> num_bands x (band, doc_id, simhash)."""

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG):
        self.num_bands = cfg.max_hamming + 1
        self.bounds = _band_bounds(cfg.simhash_bits, self.num_bands)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        fps = batch.column("simhash").to_pylist()
        n = len(fps)
        if n == 0:
            return pa.table({"band": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "simhash": pa.array([], pa.binary(16))})
        mat = np.frombuffer(b"".join(fps), dtype=np.uint8).reshape(n, NBYTES)
        bits = np.unpackbits(mat, axis=1)                      # (n, 128)
        bands, dids, hashes = [], [], []
        for bi in range(self.num_bands):
            seg = bits[:, self.bounds[bi]:self.bounds[bi + 1]]
            # fold band bits into an int key; prefix with band index
            key = np.zeros(n, dtype=np.int64)
            for c in range(seg.shape[1]):
                key = (key << 1) | seg[:, c]
            key |= np.int64(bi) << np.int64(40)
            bands.append(key)
            dids.append(doc_ids)
            hashes.extend(fps)
        return pa.table({
            "band": pa.array(np.concatenate(bands), pa.int64()),
            "doc_id": pa.array(np.concatenate(dids), pa.int64()),
            "simhash": pa.array(hashes, pa.binary(16)),
        })


_EMPTY_PAIRS = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})


_CHUNK_SPLIT = 6144      # band buckets above this split into chunk-pair tasks
_MAX_CHUNKS = 64


def _verify_group(group: pa.Table, max_hamming: int, bits: int = 128) -> pa.Table:
    """Verify one *coarse* group (many verify units): sort rows by vkey, then
    run a pairwise-hamming check per unit. A unit is either a whole band
    bucket (triangle) or one chunk-PAIR of a split hot bucket (triangle when
    chunk a == b, cross otherwise) — see the triangle-join decomposition in
    ``simhash_dedup``.

    Grouping by ``vkey % G`` instead of by exact vkey keeps the number of
    ``map_groups`` invocations bounded by G (Python-call overhead per tiny
    bucket would otherwise dominate — most buckets are singletons), while all
    real work stays vectorized.

    Kernel: hamming via BLAS. Unpack each fingerprint to a ±1 float32 row
    vector; then dot(u, v) = bits - 2*hamming(u, v), so a chunked ``B @ B.T``
    plus a threshold on the dot product replaces the byte-wise popcount
    (integer dot >= bits - 2*max_hamming <=> hamming <= max_hamming; float32
    is exact for integers this small, so no tolerance games needed).
    """
    tune_malloc()
    n = group.num_rows
    if n < 2:
        return _EMPTY_PAIRS
    group = group.sort_by([("vkey", "ascending"), ("chunk", "ascending"),
                           ("doc_id", "ascending")])
    vkeys = group.column("vkey").to_numpy(zero_copy_only=False)
    chunks = group.column("chunk").to_numpy(zero_copy_only=False)
    bands = group.column("band").to_numpy(zero_copy_only=False)
    doc_ids = group.column("doc_id").to_numpy(zero_copy_only=False)
    fps = group.column("simhash").to_pylist()
    mat = np.frombuffer(b"".join(fps), dtype=np.uint8).reshape(n, NBYTES)
    allbits = np.unpackbits(mat, axis=1)
    B = allbits.astype(np.float32) * 2.0 - 1.0                       # (n, bits)
    half = bits // 2
    dot_min = float(bits - 2 * max_hamming)
    # half-prefilter: hamming(total) <= k implies hamming(first half) <= k,
    # i.e. dot_half >= half - 2k. A random pair passes with probability
    # P(Binom(64, .5) <= 19) ~ 6e-4, so the full-width check runs on a tiny
    # candidate set and the matmul does half the FLOPs.
    dot_min_half = float(half - 2 * max_hamming)
    band_idx = (bands >> np.int64(40)).astype(np.int64)
    # band-0 key per row: pairs sharing it are verified in band 0's own
    # bucket, so bands > 0 can skip the dominant equal-key block (the 20x
    # redundancy of a near-dup cluster occupying the same bucket in every
    # band). Skipping only the LARGEST equal-key block keeps the BLAS calls
    # few; smaller repeated blocks are cheap and deduped later.
    b0_width = _band_bounds(bits, max_hamming + 1)[1]
    b0_key = np.zeros(n, dtype=np.int64)
    for c in range(int(b0_width)):
        b0_key = (b0_key << 1) | allbits[:, c]

    a_parts, b_parts = [], []

    def block(ids_bx, Bx_blk, ids_by, By_blk, triangle_offset=None):
        """One chunk-size block: full-width matmul + threshold.

        (A half-width prefilter was tried and reverted: simhash bits are
        strongly BIASED — docs share most high-df token hashes — so in the
        hot buckets the 'rare' prefilter band is passed by most pairs and
        the per-candidate gather costs far more than the straight matmul.)
        """
        full = Bx_blk @ By_blk.T
        ii, jj = np.nonzero(full >= dot_min)
        if not ii.size:
            return
        if triangle_offset is not None:
            di, dj = triangle_offset
            keep = (ii + di) < (jj + dj)
            ii, jj = ii[keep], jj[keep]
        if ii.size:
            ia, ib = ids_bx[ii], ids_by[jj]
            keep = ia != ib
            a_parts.append(np.minimum(ia, ib)[keep])
            b_parts.append(np.maximum(ia, ib)[keep])

    def tri(ids_x, Bx):
        """Upper-triangle verify of one member set (chunked)."""
        m = ids_x.shape[0]
        for i0 in range(0, m, _VERIFY_CHUNK):
            for j0 in range(i0, m, _VERIFY_CHUNK):
                block(ids_x[i0:i0 + _VERIFY_CHUNK], Bx[i0:i0 + _VERIFY_CHUNK],
                      ids_x[j0:j0 + _VERIFY_CHUNK], Bx[j0:j0 + _VERIFY_CHUNK],
                      triangle_offset=(i0, j0))

    def cross(ids_x, Bx, ids_y, By):
        """Verify all x-y pairs (chunked)."""
        for i0 in range(0, ids_x.shape[0], _VERIFY_CHUNK):
            for j0 in range(0, ids_y.shape[0], _VERIFY_CHUNK):
                block(ids_x[i0:i0 + _VERIFY_CHUNK], Bx[i0:i0 + _VERIFY_CHUNK],
                      ids_y[j0:j0 + _VERIFY_CHUNK], By[j0:j0 + _VERIFY_CHUNK])

    def cross_skip_dominant(ids_x, Bx, kx, ids_y, By, ky):
        """Cross verify minus the dominant-equal-b0-key block (band 0 covers
        those pairs; in a split hot bucket of a near-dup family that block IS
        most of the work)."""
        ux, cx = np.unique(np.concatenate([kx, ky]), return_counts=True)
        kdom = ux[int(cx.argmax())]
        if int(cx.max()) < (kx.size + ky.size) // 2:
            cross(ids_x, Bx, ids_y, By)
            return
        ex = kx == kdom
        ey = ky == kdom
        if (~ex).any():
            cross(ids_x[~ex], Bx[~ex], ids_y, By)
        if ex.any() and (~ey).any():
            cross(ids_x[ex], Bx[ex], ids_y[~ey], By[~ey])

    run_starts = np.flatnonzero(np.concatenate(([True], vkeys[1:] != vkeys[:-1])))
    run_ends = np.append(run_starts[1:], n)
    for s, e in zip(run_starts, run_ends):
        m = e - s
        if m < 2:
            continue
        ids = doc_ids[s:e]
        sub = B[s:e]
        ck = chunks[s:e]
        keys = b0_key[s:e]
        lo = int(vkeys[s]) // _MAX_CHUNKS % _MAX_CHUNKS
        hi = int(vkeys[s]) % _MAX_CHUNKS
        if lo != hi:
            # chunk-pair unit of a split bucket: cross chunks only (each
            # chunk's intra-pairs are that chunk's own (a, a) unit)
            in_lo = ck == lo
            if band_idx[s] > 0:
                cross_skip_dominant(ids[in_lo], sub[in_lo], keys[in_lo],
                                    ids[~in_lo], sub[~in_lo], keys[~in_lo])
            else:
                cross(ids[in_lo], sub[in_lo], ids[~in_lo], sub[~in_lo])
            continue
        if band_idx[s] > 0 and m >= 64:
            uniq, counts = np.unique(keys, return_counts=True)
            top = int(counts.max())
            if top >= m // 2:
                # dominant equal-band-0-key block: its intra-pairs are
                # band 0's job; verify only block x rest + rest x rest
                kmax = uniq[int(counts.argmax())]
                in_blk = keys == kmax
                ids_x, Bx = ids[in_blk], sub[in_blk]
                ids_y, By = ids[~in_blk], sub[~in_blk]
                if ids_y.size:
                    cross(ids_x, Bx, ids_y, By)
                    tri(ids_y, By)
                continue
        tri(ids, sub)
    if not a_parts:
        return _EMPTY_PAIRS
    return pa.table({"a": pa.array(np.concatenate(a_parts), pa.int64()),
                     "b": pa.array(np.concatenate(b_parts), pa.int64())})


@dataclass
class DedupResult:
    dropped: Set[int]
    clusters: List[List[int]]      # each sorted by doc_id; [0] is the survivor
    num_pairs: int
    stage_secs: Dict[str, float] = None


def simhash_dedup(docs, cfg: EngineConfig = DEFAULT_CONFIG,
                  num_verify_groups: int = 256) -> DedupResult:
    """docs: Dataset with (doc_id, simhash). Returns deterministic drop set.

    Stage 0 collapses *identical* fingerprints first (groupby(simhash), min
    doc_id representative): exact duplicates are decided without any pairwise
    work, and — crucially — the quadratic band-bucket verification then runs
    over distinct fingerprints only. A representative's verdict transfers to
    its followers (distance(follower, x) == distance(rep, x)), so greedy
    semantics are preserved exactly.

    Driver memory is O(duplicates + candidate pairs), never O(N): the
    collapsed representatives stay distributed (materialized dataset); only
    exact-dup follower lists, verified pairs, and the fingerprints of
    *clustered* doc_ids are pulled to the driver.
    """
    import time as _time
    import pyarrow.compute as pc
    import ray.data as rd

    stage_secs: Dict[str, float] = {}

    # ---- stage 0: identical-fingerprint collapse (stays distributed) ----
    t0 = _time.time()

    def collapse(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        mn = int(ids.min())
        return pa.table({
            "doc_id": pa.array([mn], pa.int64()),
            "simhash": group.column("simhash").slice(0, 1),
            "followers": pa.array([sorted(int(x) for x in ids if x != mn)],
                                  pa.list_(pa.int64())),
        })

    reps_mat = docs.groupby("simhash").map_groups(collapse, batch_format="pyarrow").materialize()

    # only exact-dup groups (followers non-empty) come to the driver
    followers_of: Dict[int, List[int]] = {}
    fol_ds = reps_mat.map_batches(
        lambda b: b.filter(pc.greater(pc.list_value_length(b.column("followers")), 0)),
        batch_format="pyarrow")
    for b in fol_ds.iter_batches(batch_format="pyarrow"):
        for did, fol in zip(b.column("doc_id").to_pylist(),
                            b.column("followers").to_pylist()):
            followers_of[did] = list(fol)
    stage_secs["collapse"] = _time.time() - t0

    # ---- stages 1-2: banding + bucket verification over representatives ----
    # A band bucket of m members costs m^2/2 hamming checks in ONE task; hot
    # bands (simhash bit bias makes some 6-bit band values hold several % of
    # the corpus) become multi-minute stragglers. Triangle-join
    # decomposition: a pre-pass counts bucket sizes, buckets over
    # _CHUNK_SPLIT split into ceil(m/_CHUNK_SPLIT) doc-hash chunks, and each
    # chunk PAIR (a <= b) becomes its own verify task — same pairs, bounded
    # task size, replication factor = n_chunks per row.
    t0 = _time.time()
    banded = reps_mat.select_columns(["doc_id", "simhash"]).map_batches(
        BandEmitter(cfg), batch_format="pyarrow").materialize()
    # (materialized: both the count pre-pass and the chunk expansion consume
    # it — lazy would re-run the banding per consumer)

    def band_counts(b: pa.Table) -> pa.Table:
        vc = b.column("band").value_counts()
        return pa.table({"band": vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    counts: Dict[int, int] = {}
    for b in banded.map_batches(band_counts, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
        for band, cnt in zip(b.column("band").to_pylist(), b.column("cnt").to_pylist()):
            counts[band] = counts.get(band, 0) + cnt
    import ray as _ray
    n_chunks_of = {band: min(_MAX_CHUNKS, -(-m // _CHUNK_SPLIT))
                   for band, m in counts.items() if m > _CHUNK_SPLIT}
    plan_ref = _ray.put(n_chunks_of)

    def chunk_pairs(b: pa.Table) -> pa.Table:
        plan = _ray.get(plan_ref)
        bands = b.column("band").to_numpy(zero_copy_only=False)
        dids = b.column("doc_id").to_numpy(zero_copy_only=False)
        nck = np.ones(bands.size, dtype=np.int64)
        for bd, nc in plan.items():          # plan is tiny (hot bands only)
            nck[bands == bd] = nc
        ci = (dids % nck).astype(np.int64)
        reps_idx = np.repeat(np.arange(bands.size), nck)          # row index per emission
        cj = np.concatenate([np.arange(n) for n in nck.tolist()]) if bands.size else np.empty(0, np.int64)
        lo = np.minimum(ci[reps_idx], cj)
        hi = np.maximum(ci[reps_idx], cj)
        vkey = bands[reps_idx] * (_MAX_CHUNKS * _MAX_CHUNKS) + lo * _MAX_CHUNKS + hi
        out = b.take(reps_idx)
        out = out.append_column("chunk", pa.array(ci[reps_idx], pa.int64()))
        out = out.append_column("vkey", pa.array(vkey, pa.int64()))
        g = (vkey % num_verify_groups).astype(np.int64)
        return out.append_column("gkey", pa.array(g, pa.int64()))

    expanded = banded.map_batches(chunk_pairs, batch_format="pyarrow")
    pairs_ds = expanded.groupby("gkey").map_groups(
        lambda g: _verify_group(g.drop(["gkey"]), cfg.max_hamming), batch_format="pyarrow")
    a_chunks, b_chunks = [], []
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            a_chunks.append(b.column("a").to_numpy(zero_copy_only=False))
            b_chunks.append(b.column("b").to_numpy(zero_copy_only=False))
    if a_chunks:
        pa_all = np.concatenate(a_chunks)
        pb_all = np.concatenate(b_chunks)
        # dedup (a, b) rows via lexsort + run-compare (np.unique(axis=0) does
        # a slow void-dtype sort)
        order = np.lexsort((pb_all, pa_all))
        pa_all, pb_all = pa_all[order], pb_all[order]
        keep = np.empty(pa_all.size, dtype=bool)
        keep[0] = True
        keep[1:] = (pa_all[1:] != pa_all[:-1]) | (pb_all[1:] != pb_all[:-1])
        pair_a, pair_b = pa_all[keep], pb_all[keep]
    else:
        pair_a = pair_b = np.empty(0, dtype=np.int64)
    num_pairs = int(pair_a.size)
    stage_secs["band_verify"] = _time.time() - t0

    # ---- stage 3: clusters + greedy accept (driver; |pairs| << N) ----
    t0 = _time.time()
    adj: Dict[int, List[int]] = {}
    for a, b in zip(pair_a.tolist(), pair_b.tolist()):
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)

    visited: Set[int] = set()
    clusters: List[List[int]] = []
    for node in sorted(adj):
        if node in visited:
            continue
        comp = []
        stack = [node]
        visited.add(node)
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in adj[u]:
                if v not in visited:
                    visited.add(v)
                    stack.append(v)
        clusters.append(sorted(comp))

    # greedy accept in doc_id order (reference first-seen-wins rule with
    # doc_id replacing arrival order — deterministic under any parallelism).
    # Banding + verification is EXACT (pigeonhole), so the pair list already
    # contains every within-threshold pair: "d has an accepted doc within
    # threshold" is exactly "d has an accepted pair-graph neighbor" — the
    # greedy is pure O(edges) graph traversal, no fingerprint math at all.
    dropped: Set[int] = set()
    for comp in clusters:
        accepted: Set[int] = set()
        for d in comp:                       # ascending doc_id
            if any(v in accepted for v in adj[d]):
                dropped.add(d)
            else:
                accepted.add(d)

    # expand exact-duplicate followers into clusters and the drop set
    full_clusters: List[List[int]] = []
    clustered_reps = set()
    for comp in clusters:
        members = []
        for d in comp:
            members.append(d)
            members.extend(followers_of.get(d, []))
            clustered_reps.add(d)
        full_clusters.append(sorted(members))
    for rep, fol in followers_of.items():
        dropped.update(fol)
        if rep not in clustered_reps:
            full_clusters.append(sorted([rep] + fol))
    stage_secs["cluster_greedy"] = _time.time() - t0

    return DedupResult(dropped, full_clusters, num_pairs, stage_secs)


_POP = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1).astype(np.uint8)


def exact_dedup_min_doc_id(docs):
    """D-exact: groupby(simhash) keep min doc_id (special case of T2)."""
    import pyarrow.compute as pc

    def keep_min(g: pa.Table) -> pa.Table:
        i = pc.index(g.column("doc_id"), pc.min(g.column("doc_id")))
        return g.slice(int(i.as_py()), 1) if g.num_rows else g

    return docs.groupby("simhash").map_groups(keep_min, batch_format="pyarrow")
