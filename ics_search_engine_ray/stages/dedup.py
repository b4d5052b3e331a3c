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


def _verify_group(group: pa.Table, max_hamming: int, bits: int = 128) -> pa.Table:
    """Verify one *coarse* group (many band buckets): sort rows by band, then
    do a chunked pairwise-hamming check within each band run of size >= 2.

    Grouping by ``band % G`` instead of by exact band keeps the number of
    ``map_groups`` invocations bounded by G (Python-call overhead per tiny
    bucket would otherwise dominate — most buckets are singletons), while all
    real work stays vectorized.

    Kernel: hamming via BLAS. Unpack each fingerprint to a ±1 float32 row
    vector; then dot(u, v) = bits - 2*hamming(u, v), so a chunked ``B @ B.T``
    plus a threshold on the dot product replaces the byte-wise popcount
    (integer dot >= bits - 2*max_hamming <=> hamming <= max_hamming; float32
    is exact for integers this small, so no tolerance games needed).
    """
    n = group.num_rows
    if n < 2:
        return _EMPTY_PAIRS
    group = group.sort_by([("band", "ascending"), ("doc_id", "ascending")])
    bands = group.column("band").to_numpy(zero_copy_only=False)
    doc_ids = group.column("doc_id").to_numpy(zero_copy_only=False)
    fps = group.column("simhash").to_pylist()
    mat = np.frombuffer(b"".join(fps), dtype=np.uint8).reshape(n, NBYTES)
    B = (np.unpackbits(mat, axis=1).astype(np.float32) * 2.0 - 1.0)  # (n, bits)
    dot_min = float(bits - 2 * max_hamming)

    run_starts = np.flatnonzero(np.concatenate(([True], bands[1:] != bands[:-1])))
    run_ends = np.append(run_starts[1:], n)
    a_parts, b_parts = [], []
    for s, e in zip(run_starts, run_ends):
        m = e - s
        if m < 2:
            continue
        sub = B[s:e]
        ids = doc_ids[s:e]
        for i0 in range(0, m, _VERIFY_CHUNK):
            for j0 in range(i0, m, _VERIFY_CHUNK):
                dot = sub[i0:i0 + _VERIFY_CHUNK] @ sub[j0:j0 + _VERIFY_CHUNK].T
                ii, jj = np.nonzero(dot >= dot_min)
                gi = ii + i0
                gj = jj + j0
                keep = gi < gj
                if keep.any():
                    ia, ib = ids[gi[keep]], ids[gj[keep]]
                    a_parts.append(np.minimum(ia, ib))
                    b_parts.append(np.maximum(ia, ib))
    if not a_parts:
        return _EMPTY_PAIRS
    return pa.table({"a": pa.array(np.concatenate(a_parts), pa.int64()),
                     "b": pa.array(np.concatenate(b_parts), pa.int64())})


@dataclass
class DedupResult:
    dropped: Set[int]
    clusters: List[List[int]]      # each sorted by doc_id; [0] is the survivor
    num_pairs: int


def simhash_dedup(docs, cfg: EngineConfig = DEFAULT_CONFIG,
                  num_verify_groups: int = 256) -> DedupResult:
    """docs: Dataset with (doc_id, simhash). Returns deterministic drop set.

    Stage 0 collapses *identical* fingerprints first (groupby(simhash), min
    doc_id representative): exact duplicates are decided without any pairwise
    work, and — crucially — the quadratic band-bucket verification then runs
    over distinct fingerprints only. A representative's verdict transfers to
    its followers (distance(follower, x) == distance(rep, x)), so greedy
    semantics are preserved exactly.
    """
    import pyarrow.compute as pc

    # ---- stage 0: identical-fingerprint collapse ----
    def collapse(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        mn = int(ids.min())
        return pa.table({
            "doc_id": pa.array([mn], pa.int64()),
            "simhash": group.column("simhash").slice(0, 1),
            "followers": pa.array([sorted(int(x) for x in ids if x != mn)],
                                  pa.list_(pa.int64())),
        })

    reps_tbl_batches = []
    reps_ds = docs.groupby("simhash").map_groups(collapse, batch_format="pyarrow")
    followers_of: Dict[int, List[int]] = {}
    rep_rows: List[Tuple[int, bytes]] = []
    for b in reps_ds.iter_batches(batch_format="pyarrow"):
        for did, fp, fol in zip(b.column("doc_id").to_pylist(),
                                b.column("simhash").to_pylist(),
                                b.column("followers").to_pylist()):
            rep_rows.append((did, fp))
            if fol:
                followers_of[did] = list(fol)

    import ray.data as rd
    reps = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rep_rows], pa.int64()),
        "simhash": pa.array([r[1] for r in rep_rows], pa.binary(16)),
    }))

    # ---- stages 1-2: banding + bucket verification over representatives ----
    banded = reps.map_batches(BandEmitter(cfg), batch_format="pyarrow")

    def add_gkey(b: pa.Table) -> pa.Table:
        g = b.column("band").to_numpy(zero_copy_only=False) % num_verify_groups
        return b.append_column("gkey", pa.array(g, pa.int64()))

    banded = banded.map_batches(add_gkey, batch_format="pyarrow")
    pairs_ds = banded.groupby("gkey").map_groups(
        lambda g: _verify_group(g.drop(["gkey"]), cfg.max_hamming), batch_format="pyarrow")
    seen: Set[Tuple[int, int]] = set()
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        seen.update(zip(b.column("a").to_pylist(), b.column("b").to_pylist()))

    fp_of: Dict[int, bytes] = dict(rep_rows)

    # ---- stage 3: clusters + greedy accept (driver; |pairs| << N assumed) ----
    adj: Dict[int, List[int]] = {}
    for a, b in seen:
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
    # doc_id replacing arrival order — deterministic under any parallelism)
    dropped: Set[int] = set()
    for comp in clusters:
        accepted: List[int] = []
        accepted_fps: List[np.ndarray] = []
        for d in comp:
            fp = np.frombuffer(fp_of[d], dtype=np.uint8)
            if accepted_fps:
                mat = np.stack(accepted_fps)
                dists = _POP[mat ^ fp[None, :]].sum(axis=1)
                if (dists <= cfg.max_hamming).any():
                    dropped.add(d)
                    continue
            accepted.append(d)
            accepted_fps.append(fp)

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

    return DedupResult(dropped, full_clusters, len(seen))


_POP = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1).astype(np.uint8)


def exact_dedup_min_doc_id(docs):
    """D-exact: groupby(simhash) keep min doc_id (special case of T2)."""
    import pyarrow.compute as pc

    def keep_min(g: pa.Table) -> pa.Table:
        i = pc.index(g.column("doc_id"), pc.min(g.column("doc_id")))
        return g.slice(int(i.as_py()), 1) if g.num_rows else g

    return docs.groupby("simhash").map_groups(keep_min, batch_format="pyarrow")
