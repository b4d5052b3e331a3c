"""Near-duplicate detection: SimHash LSH banding (SURVEY.md §2 T2/D2).

The reference compares every new document against ALL previously accepted
documents — an O(N²) serialized scan whose outcome depends on arrival order
(components/document_processor.py:72-79, multithread_indexer.py:110-120).
That cannot scale and is nondeterministic; the Ray-native design is:

1. band stage: flat-map each (doc_id, simhash) to banded rows keyed by a
   band of the fingerprint, with generalized-pigeonhole probing (see
   ``BandEmitter``): candidate generation is EXACT — every pair within
   threshold meets in some bucket as a stored-stored or probe-stored pair.
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
from ..functions.bufpool import fsb_to_numpy, get_buf
from ..functions.memtune import tune_malloc
from ..functions.simhash import NBYTES, _POPCNT as _POP

# (256, 8) bit-expansion lookup: row b = bits of byte b, MSB first (the
# np.unpackbits convention) — lets us unpack into a REUSED buffer via np.take
_BIT_LUT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1)

_VERIFY_CHUNK = 2048
_SMALL_RUN = 64          # buckets up to this size verify via the batched
                         # gather-dot path (one vectorized op for ALL of
                         # them) instead of per-bucket Python dispatch

_PAIR_TMPL: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}


def _pair_template(m: int) -> Tuple[np.ndarray, np.ndarray]:
    """Upper-triangle index pairs (i < j) for a run of length m, cached."""
    t = _PAIR_TMPL.get(m)
    if t is None:
        ii, jj = np.triu_indices(m, k=1)
        t = (ii.astype(np.int64), jj.astype(np.int64))
        _PAIR_TMPL[m] = t
    return t


def _band_bounds(bits: int, num_bands: int) -> np.ndarray:
    return np.linspace(0, bits, num_bands + 1).astype(int)


class BandEmitter:
    """batch fn: (doc_id, simhash) -> banded candidate rows (band, doc_id,
    stored, simhash).

    Generalized-pigeonhole banding (multi-index hashing, Norouzi et al.,
    "Fast Search in Hamming Space with Multi-Index Hashing", 2014): with
    ``b`` bands and probe radius ``r = ceil((k+1)/b) - 1``, any pair within
    hamming ``k`` has at least one band with band-hamming <= r (else total
    >= b*(r+1) > k). Two supported regimes, both EXACT:

    - r == 0 (b >= k+1): classic exact-match banding. For k=19/128 bits that
      forces 6-7-bit bands whose tiny keyspace makes every bucket a random
      ~N/64 collision set — verify work ~0.3 N^2.
    - r == 1 (b >= ceil((k+1)/2)): wider bands (12-13 bits at b=10) with
      single-bit probing. Probe volume is HALVED by the flip-down trick: a
      pair differing at exactly one band bit has exactly one member with a 1
      there, and that member's flip-down probe lands on the other's stored
      key — so probes only clear 1-bits. Candidates are stored x stored
      (band-hamming 0) + probe x stored (band-hamming 1); probe x probe pairs
      are never candidates. Measured on the replica corpus: ~7.6x fewer
      pair checks and max bucket 4% of corpus vs 23% (better skew).
    """

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG, include_fp: bool = True):
        self.num_bands = int(getattr(cfg, "simhash_bands", 0)) or (cfg.max_hamming + 1)
        k1 = cfg.max_hamming + 1
        self.radius = -(-k1 // self.num_bands) - 1
        if self.radius > 1:
            raise ValueError(
                f"simhash_bands={self.num_bands} needs probe radius "
                f"{self.radius}; only radius <= 1 is implemented "
                f"(use bands >= {-(-k1 // 2)})")
        self.bounds = _band_bounds(cfg.simhash_bits, self.num_bands)
        # include_fp=False drops the 16-byte fingerprint from the emitted
        # rows (HALVING the verify-shuffle bytes); the verify stage then
        # rehydrates fingerprints from a broadcast (doc_id-sorted) table —
        # chosen by simhash_dedup when the distinct-fp table is small enough
        # to broadcast; carrying the fp is the unbounded-scale path
        self.include_fp = include_fp

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = batch.num_rows
        if n == 0:
            empty = {"band": pa.array([], pa.int64()),
                     "doc_id": pa.array([], pa.int64()),
                     "stored": pa.array([], pa.int8())}
            if self.include_fp:
                empty["simhash"] = pa.array([], pa.binary(16))
            return pa.table(empty)
        mat = fsb_to_numpy(batch.column("simhash"), NBYTES)
        bits = np.unpackbits(mat, axis=1)                      # (n, 128)
        keys_parts, idx_parts, stored_parts = [], [], []
        all_rows = np.arange(n, dtype=np.int64)
        for bi in range(self.num_bands):
            seg = bits[:, self.bounds[bi]:self.bounds[bi + 1]]
            w = seg.shape[1]
            # fold band bits into an int key; prefix with band index
            key = np.zeros(n, dtype=np.int64)
            for c in range(w):
                key = (key << 1) | seg[:, c]
            tag = np.int64(bi) << np.int64(40)
            keys_parts.append(key | tag)
            idx_parts.append(all_rows)
            stored_parts.append(np.ones(n, dtype=np.int8))
            if self.radius >= 1:
                for j in range(w):                 # flip-down probes (1 -> 0)
                    rows = np.flatnonzero(seg[:, j])
                    if rows.size:
                        keys_parts.append((key[rows] ^ np.int64(1 << (w - 1 - j))) | tag)
                        idx_parts.append(rows)
                        stored_parts.append(np.zeros(rows.size, dtype=np.int8))
        keys = np.concatenate(keys_parts)
        idx = np.concatenate(idx_parts)
        stored = np.concatenate(stored_parts)
        cols = {
            "band": pa.array(keys, pa.int64()),
            "doc_id": pa.array(doc_ids[idx], pa.int64()),
            "stored": pa.array(stored, pa.int8()),
        }
        if self.include_fp:
            # simhash gathered buffer-level (no per-row Python objects)
            sh = np.ascontiguousarray(mat[idx])
            cols["simhash"] = pa.Array.from_buffers(
                pa.binary(NBYTES), idx.size, [None, pa.py_buffer(sh.tobytes())])
        return pa.table(cols)


_EMPTY_PAIRS = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})


_CHUNK_SPLIT = 6144      # band buckets above this split into chunk-pair tasks
_MAX_CHUNKS = 64
_LOCAL_VERIFY_ROWS = 300_000     # banded rows below this verify in ONE task
                                 # (no shuffle; ~12 MB, ~1 s in the kernel —
                                 # a sort shuffle costs more than it buys);
                                 # above it, the distributed chunk-split +
                                 # groupby(gkey) path runs on all cores
_BCAST_FP_ROWS = 2_000_000       # distinct fps below this broadcast as one
                                 # (doc_id, fp) table (~48 MB) so banded rows
                                 # shuffle fingerprint-free; above, fps are
                                 # carried in the rows (unbounded scale)


def _verify_group(group: pa.Table, max_hamming: int, num_bands: int,
                  bits: int = 128, fp_ref=None) -> pa.Table:
    """Verify one *coarse* group (many verify units): sort rows by vkey, then
    run a pairwise-hamming check per unit. A unit is either a whole band
    bucket (chunk a == b) or one chunk-PAIR of a split hot bucket — see the
    triangle-join decomposition in ``simhash_dedup``. Within a unit the
    candidate pairs are stored x stored plus probe x stored (see
    BandEmitter); probe x probe pairs are never candidates.

    Grouping by ``vkey % G`` instead of by exact vkey keeps the number of
    ``map_groups`` invocations bounded by G (Python-call overhead per tiny
    bucket would otherwise dominate — most buckets are singletons), while all
    real work stays vectorized.

    Kernels, chosen for minimum fresh-memory traffic (on this VM every
    newly faulted MB costs ~0.14 s, far more than the arithmetic on it):

    - small buckets (the vast majority with wide bands): ONE batched
      gather of packed fingerprint bytes per distinct run length, XOR +
      byte-popcount LUT — ~40 bytes of buffered traffic per candidate pair;
    - big buckets: chunked BLAS. ±1 float32 expansion of JUST the chunk
      rows (reused arenas); dot(u, v) = bits - 2*hamming(u, v), so
      ``Bx @ By.T`` >= bits - 2*max_hamming <=> hamming <= max_hamming
      (float32 is exact for integers this small).
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
    stored = group.column("stored").to_numpy(zero_copy_only=False).astype(bool)
    if "simhash" in group.column_names:
        mat = fsb_to_numpy(group.column("simhash"), NBYTES)
    else:
        # broadcast-fp mode: rehydrate from the doc_id-sorted table (fetched
        # once per worker; gather lands in a reused arena)
        import ray as _ray
        ids_sorted, fp_mat = _ray.get(fp_ref)
        pos = np.searchsorted(ids_sorted, doc_ids)
        mat = get_buf("vg.fpg", (n, NBYTES), np.uint8)
        np.take(fp_mat, pos, axis=0, out=mat)
    dot_min = float(bits - 2 * max_hamming)
    band_idx = (bands >> np.int64(40)).astype(np.int64)
    # band-0 STORED key: any pair sharing it was verified in band 0's own
    # bucket (as stored x stored), so bands > 0 can skip the dominant
    # equal-key block (the num_bands-x redundancy of a near-dup cluster
    # occupying the same bucket in every band). Computed lazily per big run.
    b0_width = int(_band_bounds(bits, num_bands)[1])
    b0_bytes = (b0_width + 7) // 8
    b0_shift = (-b0_width) % 8

    a_parts, b_parts = [], []

    def b0_of(rows: np.ndarray) -> np.ndarray:
        sub = mat[rows]
        k = np.zeros(sub.shape[0], dtype=np.int64)
        for c in range(b0_bytes):
            k = (k << 8) | sub[:, c]
        return k >> b0_shift

    def _expand(rows: np.ndarray, bufkey: str) -> np.ndarray:
        """Packed rows -> ±1 float32 (reused arenas, no fresh allocation)."""
        mm = rows.size
        sub8 = get_buf(bufkey + ".8", (mm, NBYTES), np.uint8)
        np.take(mat, rows, axis=0, out=sub8.reshape(mm, NBYTES))
        bb = get_buf(bufkey + ".b", (mm, NBYTES, 8), np.uint8)
        np.take(_BIT_LUT, sub8, axis=0, out=bb)
        F = get_buf(bufkey + ".f", (mm, bits), np.float32)
        np.multiply(bb.reshape(mm, bits), 2, out=F, casting="unsafe")
        F -= 1.0
        return F

    def block(ids_bx, rows_bx, ids_by, rows_by, triangle_offset=None):
        """One chunk-size block: full-width matmul + threshold.

        (A half-width prefilter was tried and reverted: simhash bits are
        strongly BIASED — docs share most high-df token hashes — so in the
        hot buckets the 'rare' prefilter band is passed by most pairs and
        the per-candidate gather costs far more than the straight matmul.)
        """
        Bx_blk = _expand(rows_bx, "vg.fx")
        By_blk = _expand(rows_by, "vg.fy")
        full = get_buf("vg.mm", (Bx_blk.shape[0], By_blk.shape[0]), np.float32)
        np.matmul(Bx_blk, By_blk.T, out=full)
        mask = get_buf("vg.mask", full.shape, bool)
        np.greater_equal(full, dot_min, out=mask)
        ii, jj = np.nonzero(mask)
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

    def tri(ids_x, rows_x):
        """Upper-triangle verify of one member set (chunked)."""
        m = ids_x.shape[0]
        for i0 in range(0, m, _VERIFY_CHUNK):
            for j0 in range(i0, m, _VERIFY_CHUNK):
                block(ids_x[i0:i0 + _VERIFY_CHUNK], rows_x[i0:i0 + _VERIFY_CHUNK],
                      ids_x[j0:j0 + _VERIFY_CHUNK], rows_x[j0:j0 + _VERIFY_CHUNK],
                      triangle_offset=(i0, j0))

    def cross(ids_x, rows_x, ids_y, rows_y):
        """Verify all x-y pairs (chunked)."""
        if not (ids_x.size and ids_y.size):
            return
        for i0 in range(0, ids_x.shape[0], _VERIFY_CHUNK):
            for j0 in range(0, ids_y.shape[0], _VERIFY_CHUNK):
                block(ids_x[i0:i0 + _VERIFY_CHUNK], rows_x[i0:i0 + _VERIFY_CHUNK],
                      ids_y[j0:j0 + _VERIFY_CHUNK], rows_y[j0:j0 + _VERIFY_CHUNK])

    def cross_sd(ids_x, rows_x, ids_y, rows_y, skip_dom: bool):
        """Cross verify, minus the dominant-equal-b0-key block when the unit
        is in a band > 0 (band 0 covers those pairs; in a hot bucket of a
        near-dup family that block IS most of the work)."""
        if not (ids_x.size and ids_y.size):
            return
        if not skip_dom:
            cross(ids_x, rows_x, ids_y, rows_y)
            return
        kx, ky = b0_of(rows_x), b0_of(rows_y)
        ux, cx = np.unique(np.concatenate([kx, ky]), return_counts=True)
        kdom = ux[int(cx.argmax())]
        if int(cx.max()) < (kx.size + ky.size) // 2:
            cross(ids_x, rows_x, ids_y, rows_y)
            return
        ex = kx == kdom
        ey = ky == kdom
        if (~ex).any():
            cross(ids_x[~ex], rows_x[~ex], ids_y, rows_y)
        if ex.any() and (~ey).any():
            cross(ids_x[ex], rows_x[ex], ids_y[~ey], rows_y[~ey])

    def tri_sd(ids_x, rows_x, skip_dom: bool):
        m = ids_x.shape[0]
        if m < 2:
            return
        if skip_dom and m >= 64:
            kx = b0_of(rows_x)
            uniq, counts = np.unique(kx, return_counts=True)
            top = int(counts.max())
            if top >= m // 2:
                # dominant equal-band-0-key block: its intra-pairs are
                # band 0's job; verify only block x rest + rest x rest
                kmax = uniq[int(counts.argmax())]
                in_blk = kx == kmax
                if (~in_blk).any():
                    cross(ids_x[in_blk], rows_x[in_blk],
                          ids_x[~in_blk], rows_x[~in_blk])
                    tri(ids_x[~in_blk], rows_x[~in_blk])
                return
        tri(ids_x, rows_x)

    run_starts = np.flatnonzero(np.concatenate(([True], vkeys[1:] != vkeys[:-1])))
    run_ends = np.append(run_starts[1:], n)
    run_lens = run_ends - run_starts
    vk0 = vkeys[run_starts]
    is_pair_unit = ((vk0 // _MAX_CHUNKS) % _MAX_CHUNKS) != (vk0 % _MAX_CHUNKS)

    # ---- batched small-run path ----
    # Wide bands make most buckets tiny (singletons or a handful of rows);
    # dispatching those through the per-bucket loop costs more Python time
    # than all the hamming checks combined. Instead, every same-chunk run of
    # size 2.._SMALL_RUN verifies through ONE batched XOR + byte-popcount per
    # distinct run length: pair templates expand to global (i, j) index
    # arrays, probe x probe pairs are masked out, and buffered byte ops score
    # every candidate pair of every small bucket at once.
    small = (~is_pair_unit) & (run_lens >= 2) & (run_lens <= _SMALL_RUN)
    if small.any():
        st_small = run_starts[small]
        ln_small = run_lens[small]
        for m_len in np.unique(ln_small):
            ti, tj = _pair_template(int(m_len))
            st = st_small[ln_small == m_len]
            ii = (st[:, None] + ti[None, :]).ravel()
            jj = (st[:, None] + tj[None, :]).ravel()
            keep = stored[ii] | stored[jj]          # probe x probe: never
            ii, jj = ii[keep], jj[keep]
            if not ii.size:
                continue
            g8a = get_buf("vg.g8a", (ii.size, NBYTES), np.uint8)
            g8b = get_buf("vg.g8b", (ii.size, NBYTES), np.uint8)
            np.take(mat, ii, axis=0, out=g8a)
            np.take(mat, jj, axis=0, out=g8b)
            np.bitwise_xor(g8a, g8b, out=g8a)
            np.take(_POP, g8a, out=g8b)             # per-byte popcount
            ham = get_buf("vg.ham", (ii.size,), np.int64)
            np.sum(g8b, axis=1, dtype=np.int64, out=ham)
            sel = ham <= max_hamming
            if sel.any():
                ia, ib = doc_ids[ii[sel]], doc_ids[jj[sel]]
                ne = ia != ib
                a_parts.append(np.minimum(ia, ib)[ne])
                b_parts.append(np.maximum(ia, ib)[ne])

    for ri in np.flatnonzero(~small & (run_lens >= 2)):
        s, e = int(run_starts[ri]), int(run_ends[ri])
        ids = doc_ids[s:e]
        rows = np.arange(s, e, dtype=np.int64)
        ck = chunks[s:e]
        sto = stored[s:e]
        skip_dom = band_idx[s] > 0
        lo = int(vkeys[s]) // _MAX_CHUNKS % _MAX_CHUNKS
        hi = int(vkeys[s]) % _MAX_CHUNKS
        if lo != hi:
            # chunk-pair unit of a split bucket: cross-chunk pairs only (each
            # chunk's intra-pairs are that chunk's own (a, a) unit).
            # stored_lo x stored_hi + probe_lo x stored_hi + probe_hi x stored_lo
            in_lo = ck == lo
            sl, pl = in_lo & sto, in_lo & ~sto
            sh, ph = ~in_lo & sto, ~in_lo & ~sto
            cross_sd(ids[sl], rows[sl], ids[sh], rows[sh], skip_dom)
            cross_sd(ids[pl], rows[pl], ids[sh], rows[sh], skip_dom)
            cross_sd(ids[ph], rows[ph], ids[sl], rows[sl], skip_dom)
            continue
        if sto.all():                       # radius-0 / probe-free fast path
            tri_sd(ids, rows, skip_dom)
            continue
        ss = sto
        tri_sd(ids[ss], rows[ss], skip_dom)
        cross_sd(ids[~ss], rows[~ss], ids[ss], rows[ss], skip_dom)
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


def _verified_rep_pairs(docs, cfg: EngineConfig = DEFAULT_CONFIG,
                        num_verify_groups: int = None,
                        broadcast_fp: bool = None,
                        n_docs_hint: int = None):
    """Stages 0-2 of the SimHash near-dup machinery, shared by
    :func:`simhash_dedup` and :func:`simhash_pairs`: identical-fingerprint
    collapse, banding + pigeonhole-complete bucket verification over
    DISTINCT representatives. Returns ``(pair_a, pair_b, followers_of,
    stage_secs)`` — the EXACT <= cfg.max_hamming pair set over
    representatives plus the exact-dup follower map (a representative's
    verdict transfers to its followers: distance(follower, x) ==
    distance(rep, x))."""
    import time as _time
    import pyarrow.compute as pc
    import ray.data as rd

    from .common import adaptive_groups

    stage_secs: Dict[str, float] = {}

    # ---- stage 0: identical-fingerprint collapse (stays distributed) ----
    # Grouped by a coarse hash of the fingerprint (not by exact simhash):
    # per-group Python-call overhead for N tiny groups would dominate; the
    # coarse fn handles many fingerprints per call, fully vectorized via
    # sorted run boundaries. Group count scales with the (hinted) doc count
    # — one group materializes per task — at ~1M 40 B rows per group.
    collapse_groups = (adaptive_groups(n_docs_hint, 1_000_000, lo=256)
                       if n_docs_hint else 256)
    t0 = _time.time()

    def add_ckey(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return b.append_column("ckey", pa.array([], pa.int64()))
        mat = fsb_to_numpy(b.column("simhash"), NBYTES)
        ck = mat[:, :8].astype(np.int64) @ (np.int64(1) << (np.arange(8, dtype=np.int64) * 7))
        return b.append_column("ckey", pa.array(ck % collapse_groups, pa.int64()))

    def collapse_coarse(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "simhash": pa.array([], pa.binary(16)),
                             "rep_of": pa.array([], pa.int64())})
        g = g.sort_by([("simhash", "ascending"), ("doc_id", "ascending")])
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        mat = fsb_to_numpy(g.column("simhash"), NBYTES)
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        new_run[1:] = (mat[1:] != mat[:-1]).any(axis=1)
        run_id = np.cumsum(new_run) - 1
        rep_row = np.flatnonzero(new_run)          # first (min doc_id) per run
        rep_of = ids[rep_row][run_id]              # each row's representative
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "simhash": g.column("simhash"),
            "rep_of": pa.array(np.where(new_run, np.int64(-1), rep_of), pa.int64()),
        })

    collapsed = (docs.map_batches(add_ckey, batch_format="pyarrow")
                 .groupby("ckey")
                 .map_groups(lambda g: collapse_coarse(g.drop(["ckey"])),
                             batch_format="pyarrow")
                 .materialize())
    # materialized: up to three consumers (fp-broadcast collection, hot-band
    # sampling, banding) would otherwise re-run the filter over the corpus
    reps_mat = collapsed.map_batches(
        lambda b: b.filter(pc.equal(b.column("rep_of"), -1)).drop(["rep_of"]),
        batch_format="pyarrow").materialize()

    # only exact-dup followers (rep_of != -1) come to the driver
    followers_of: Dict[int, List[int]] = {}
    fol_ds = collapsed.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("rep_of"), -1)),
        batch_format="pyarrow")
    for b in fol_ds.iter_batches(batch_format="pyarrow"):
        for did, rep in zip(b.column("doc_id").to_pylist(),
                            b.column("rep_of").to_pylist()):
            followers_of.setdefault(rep, []).append(did)
    for fol in followers_of.values():
        fol.sort()
    stage_secs["collapse"] = _time.time() - t0

    # ---- stages 1-2: banding + bucket verification over representatives ----
    # A band bucket of m members costs m^2/2 hamming checks in ONE task; hot
    # bands (simhash bit bias makes some 6-bit band values hold several % of
    # the corpus) become multi-minute stragglers. Triangle-join
    # decomposition: a pre-pass counts bucket sizes, buckets over
    # _CHUNK_SPLIT split into ceil(m/_CHUNK_SPLIT) doc-hash chunks, and each
    # chunk PAIR (a <= b) becomes its own verify task — same pairs, bounded
    # task size, replication factor = n_chunks per row.
    n_reps = collapsed.count() - sum(len(v) for v in followers_of.values())
    # Broadcast-fp mode (size-gated): below _BCAST_FP_ROWS distinct
    # fingerprints, the (doc_id, fp) table broadcasts once via the object
    # store and banded rows shuffle WITHOUT the 16-byte fingerprint —
    # halving the verify-shuffle volume. Above the gate, fingerprints are
    # carried in the rows (the unbounded-scale path; a broadcast table does
    # not exist at 10^9 distinct fps).
    if broadcast_fp is None:
        broadcast_fp = n_reps <= _BCAST_FP_ROWS
    fp_ref = None
    if broadcast_fp:
        import ray as _ray
        ids_parts, fp_parts = [], []
        for b in reps_mat.select_columns(["doc_id", "simhash"]) \
                         .iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                ids_parts.append(b.column("doc_id").to_numpy(zero_copy_only=False))
                fp_parts.append(fsb_to_numpy(b.column("simhash"), NBYTES).copy())
        ids_all = (np.concatenate(ids_parts) if ids_parts
                   else np.empty(0, np.int64))
        fps_all = (np.vstack(fp_parts) if fp_parts
                   else np.empty((0, NBYTES), np.uint8))
        order = np.argsort(ids_all)
        fp_ref = _ray.put((ids_all[order], np.ascontiguousarray(fps_all[order])))
        del ids_parts, fp_parts, ids_all, fps_all   # transient, size-gated

    emitter = BandEmitter(cfg, include_fp=not broadcast_fp)
    nb = emitter.num_bands
    # banding is LAZY — fused by the streaming executor straight into the
    # verify consumer, so the banded relation (the widest intermediate) never
    # round-trips through the object store as its own materialization.
    banded = reps_mat.select_columns(["doc_id", "simhash"]).map_batches(
        emitter, batch_format="pyarrow")
    w_avg = cfg.simhash_bits / nb
    est_banded = int(n_reps * nb * (1 + (w_avg / 2 if emitter.radius else 0)))
    if num_verify_groups is None:
        # verify groups scale with the banded relation (~40 B rows): per-task
        # group memory stays bounded at any corpus size (VERDICT r2 item 2)
        num_verify_groups = adaptive_groups(est_banded, 1_000_000, lo=256)

    # hot-band discovery. Splitting is a pure work-decomposition decision —
    # missing a hot band costs parallelism, never correctness — so it runs on
    # a 2% sample of the representatives with a conservative threshold
    # (distributed partial value_counts -> groupby-sum -> filter; only
    # sampled-hot bands reach the driver: O(hot bands) driver memory, never
    # O(distinct fps x bands)). Small inputs skip the pass entirely: an
    # unsplit bucket of <= ~25k rows is a sub-second task in the kernel.
    t0 = _time.time()
    n_chunks_of: Dict[int, int] = {}
    if est_banded > _LOCAL_VERIFY_ROWS:     # split only helps the
                                            # distributed path (below)
        frac = 0.02
        thresh = max(2, int(_CHUNK_SPLIT * frac / 2))

        def band_counts(b: pa.Table) -> pa.Table:
            vc = b.column("band").value_counts()
            return pa.table({"band": vc.field("values"),
                             "cnt": vc.field("counts").cast(pa.int64())})

        hot_rows = (reps_mat.select_columns(["doc_id", "simhash"])
                    .random_sample(frac, seed=17)
                    .map_batches(emitter, batch_format="pyarrow")
                    .map_batches(band_counts, batch_format="pyarrow")
                    .groupby("band").sum("cnt")
                    .map_batches(lambda b: b.filter(
                        pc.greater(b.column("sum(cnt)"), thresh)),
                        batch_format="pyarrow")
                    .take_all())
        n_chunks_of = {
            int(r["band"]): min(_MAX_CHUNKS,
                                -(-int(r["sum(cnt)"] / frac) // _CHUNK_SPLIT))
            for r in hot_rows}
    stage_secs["hot_bands"] = _time.time() - t0

    t0 = _time.time()
    import ray as _ray
    plan_ref = _ray.put(n_chunks_of)

    def chunk_pairs(b: pa.Table) -> pa.Table:
        bands = b.column("band").to_numpy(zero_copy_only=False)
        plan = _ray.get(plan_ref)
        if not plan:
            # common case: no hot bands — every bucket is its own (0, 0) unit
            vkey = bands * (_MAX_CHUNKS * _MAX_CHUNKS)
            out = b.append_column("chunk", pa.array(np.zeros(bands.size, np.int64), pa.int64()))
            out = out.append_column("vkey", pa.array(vkey, pa.int64()))
            return out.append_column("gkey", pa.array(vkey % num_verify_groups, pa.int64()))
        dids = b.column("doc_id").to_numpy(zero_copy_only=False)
        nck = np.ones(bands.size, dtype=np.int64)
        for bd, nc in plan.items():          # plan is tiny (hot bands only)
            nck[bands == bd] = nc
        ci = (dids % nck).astype(np.int64)
        reps_idx = np.repeat(np.arange(bands.size), nck)          # row index per emission
        # cj enumerates 0..nck[i]-1 per source row, without per-row Python:
        # global arange minus each row's segment start (cumsum of nck)
        seg_start = np.cumsum(nck) - nck
        cj = np.arange(reps_idx.size, dtype=np.int64) - seg_start[reps_idx]
        lo = np.minimum(ci[reps_idx], cj)
        hi = np.maximum(ci[reps_idx], cj)
        vkey = bands[reps_idx] * (_MAX_CHUNKS * _MAX_CHUNKS) + lo * _MAX_CHUNKS + hi
        out = b.take(reps_idx)
        out = out.append_column("chunk", pa.array(ci[reps_idx], pa.int64()))
        out = out.append_column("vkey", pa.array(vkey, pa.int64()))
        g = (vkey % num_verify_groups).astype(np.int64)
        return out.append_column("gkey", pa.array(g, pa.int64()))

    if est_banded <= _LOCAL_VERIFY_ROWS:
        # single-task verify: below ~60 MB of banded rows, a sort-based
        # groupby shuffle would move the relation through the object store
        # 2-3x to feed 256 near-empty groups. Instead coalesce to one block
        # and run the (fully vectorized) verify kernel in ONE worker task —
        # the driver sees only the resulting pairs. The distributed
        # chunk-split + groupby path below is the scale path.
        def verify_all(b: pa.Table) -> pa.Table:
            t = chunk_pairs(b)
            return _verify_group(t.drop(["gkey"]), cfg.max_hamming, nb,
                                 fp_ref=fp_ref)

        pairs_ds = banded.repartition(1).map_batches(
            verify_all, batch_format="pyarrow", batch_size=None)
    else:
        expanded = banded.map_batches(chunk_pairs, batch_format="pyarrow")
        pairs_ds = expanded.groupby("gkey").map_groups(
            lambda g: _verify_group(g.drop(["gkey"]), cfg.max_hamming, nb,
                                    fp_ref=fp_ref),
            batch_format="pyarrow")
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
    stage_secs["band_verify"] = _time.time() - t0
    return pair_a, pair_b, followers_of, stage_secs


def simhash_dedup(docs, cfg: EngineConfig = DEFAULT_CONFIG,
                  num_verify_groups: int = None,
                  broadcast_fp: bool = None,
                  n_docs_hint: int = None) -> DedupResult:
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

    pair_a, pair_b, followers_of, stage_secs = _verified_rep_pairs(
        docs, cfg, num_verify_groups, broadcast_fp, n_docs_hint)
    num_pairs = int(pair_a.size)

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


def simhash_pairs(docs, cfg: EngineConfig = DEFAULT_CONFIG,
                  num_verify_groups: int = None,
                  broadcast_fp: bool = None,
                  n_docs_hint: int = None) -> pa.Table:
    """The full (a < b) pair set with hamming <= cfg.max_hamming — the
    reference's >=0.85-similarity near-dup rule
    (/root/reference/components/document_processor.py:72-79, threshold
    /root/reference/utils/constants.py:28) as a relation, EXACT by the
    banding pigeonhole. Shares stages 0-2 with :func:`simhash_dedup`;
    the only additional work expands representative pairs to their
    identical-fingerprint followers (within-cluster pairs have hamming
    0; cross pairs inherit the verified rep distance). Driver memory is
    O(pairs) — the operator's own output size."""
    pair_a, pair_b, followers_of, _ = _verified_rep_pairs(
        docs, cfg, num_verify_groups, broadcast_fp, n_docs_hint)

    def members(rep: int) -> List[int]:
        return [rep] + followers_of.get(rep, [])

    rows_a: List[int] = []
    rows_b: List[int] = []
    for rep, fol in followers_of.items():
        mem = sorted([rep] + fol)
        for i in range(len(mem)):
            for j in range(i + 1, len(mem)):
                rows_a.append(mem[i])
                rows_b.append(mem[j])
    for a, b in zip(pair_a.tolist(), pair_b.tolist()):
        for x in members(a):
            for y in members(b):
                rows_a.append(x if x < y else y)
                rows_b.append(y if x < y else x)
    if not rows_a:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    aa = np.asarray(rows_a, np.int64)
    bb = np.asarray(rows_b, np.int64)
    order = np.lexsort((bb, aa))
    aa, bb = aa[order], bb[order]
    keep = np.empty(aa.size, bool)
    keep[0] = True
    keep[1:] = (aa[1:] != aa[:-1]) | (bb[1:] != bb[:-1])
    return pa.table({"a": pa.array(aa[keep], pa.int64()),
                     "b": pa.array(bb[keep], pa.int64())})


def exact_dedup_min_doc_id(docs):
    """D-exact: groupby(simhash) keep min doc_id (special case of T2).

    Native vectorized aggregation — one `min` per fingerprint, no per-group
    Python. (For text-keyed exact dedup use stages/dedup_text.exact_dedup.)
    """
    return docs.groupby("simhash").min("doc_id").map_batches(
        lambda b: pa.table({"simhash": b.column("simhash"),
                            "doc_id": b.column("min(doc_id)")}),
        batch_format="pyarrow")
