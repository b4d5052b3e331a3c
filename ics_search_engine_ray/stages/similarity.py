"""Similarity search over an embedding column (task brief).

- ``knn_brute``: exact cosine top-k — the query matrix is broadcast once
  (``ray.put``), each batch computes a numpy matmul and emits its *local*
  top-k (the combiner), the driver merges the tiny partials. Nothing but
  (batch x k) rows ever leave the workers.
- ``knn_lsh``: hyperplane-LSH bucket the corpus once, probe only matching
  buckets (approximate; recall grows with n_tables).
- ``knn_ivf``: the classic scale path (IVF / coarse quantizer): k-means
  centroids trained on a driver-side sample, broadcast; each batch scores
  only the vectors whose nearest centroid is among the query's ``n_probe``
  closest lists — per-batch masked matmul + local top-k combiner, same
  merge shape as knn_brute. Recall grows with n_probe (n_probe == n_lists
  degenerates to exact brute force — tested).
"""

from __future__ import annotations

import heapq
from typing import List, Sequence, Tuple

import numpy as np
import pyarrow as pa

from .dedup_text import HyperplaneLSH


def _list_col_np(col) -> np.ndarray:
    """list<float> column -> (n, dim) float64 matrix WITHOUT to_pylist: the
    flattened value buffer converts in one numpy pass and reshapes (embedding
    columns are uniform-length by construction; ragged input falls back)."""
    import pyarrow.compute as pc
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    if not (lens == lens[0]).all():
        return np.array(col.to_pylist(), dtype=np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(np.float64, copy=False).reshape(n, int(lens[0]))


def _batch_vecs(batch: pa.Table) -> Tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    return ids, _list_col_np(batch.column("embedding"))


def _normalize(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    n[n == 0] = 1.0
    return v / n


def knn_brute(embeds, query_vecs: np.ndarray, k: int = 10):
    """Exact cosine top-k for each query vector.

    Returns list (per query) of [(vec_id, cos)] ranked by (-cos, vec_id).
    """
    import ray

    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    q_ref = ray.put(q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids, vecs = _batch_vecs(batch)
        vn = _normalize(vecs)
        sim = qm @ vn.T                      # (nq, nb)
        nq = sim.shape[0]
        kk = min(k, sim.shape[1])
        out_q, out_id, out_cos = [], [], []
        for qi in range(nq):
            idx = np.argpartition(-sim[qi], kk - 1)[:kk] if kk < sim.shape[1] else np.arange(sim.shape[1])
            for j in idx:
                out_q.append(qi)
                out_id.append(int(ids[j]))
                out_cos.append(float(sim[qi, j]))
        return pa.table({"q": pa.array(out_q, pa.int32()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "cos": pa.array(out_cos, pa.float64())})

    parts = embeds.map_batches(partial_topk, batch_format="pyarrow")
    per_q: List[List[Tuple[int, float]]] = [[] for _ in range(q.shape[0])]
    for b in parts.iter_batches(batch_format="pyarrow"):
        for qi, vid, cos in zip(b.column("q").to_pylist(), b.column("vec_id").to_pylist(),
                                b.column("cos").to_pylist()):
            per_q[qi].append((vid, cos))
    out = []
    for lst in per_q:
        lst.sort(key=lambda x: (-x[1], x[0]))
        out.append(lst[:k])
    return out


def knn_lsh(embeds, query_vecs: np.ndarray, k: int = 10, n_bits: int = 10,
            n_tables: int = 8):
    """Approximate cosine top-k: probe only LSH-matching buckets.

    Builds the bucketed corpus as a Dataset groupby; each probed bucket is a
    small exact matmul. Returns same shape as knn_brute (may miss neighbors —
    approximate by design; recall tested against knn_brute)."""
    q_arr = np.atleast_2d(np.asarray(query_vecs, dtype=np.float64))
    if embeds.count() == 0:
        return [[] for _ in range(q_arr.shape[0])]
    first = embeds.take_batch(1, batch_format="pyarrow")
    dim = len(first.column("embedding")[0].as_py())
    tables = [HyperplaneLSH(dim, n_bits, seed=101 + 7 * t) for t in range(n_tables)]
    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))

    q_keys = [lsh.keys(q) | (np.int64(t) << np.int64(n_bits + 1))
              for t, lsh in enumerate(tables)]
    wanted = set()
    for keys in q_keys:
        wanted.update(int(x) for x in keys)
    wanted_arr = pa.array(sorted(wanted), pa.int64())

    def bucketize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ids, vecs = _batch_vecs(batch)
        vn = _normalize(vecs)
        ks, ds, vs = [], [], []
        for t, lsh in enumerate(tables):
            key = lsh.keys(vn) | (np.int64(t) << np.int64(n_bits + 1))
            ks.append(key)
            ds.append(ids)
            vs.append(vn)
        tbl = pa.table({
            "bucket": pa.array(np.concatenate(ks), pa.int64()),
            "vec_id": pa.array(np.concatenate(ds), pa.int64()),
            "vec": pa.array(np.concatenate(vs).tolist(), pa.list_(pa.float64())),
        })
        return tbl.filter(pc.is_in(tbl.column("bucket"), value_set=wanted_arr))

    import ray
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        """Bucket-matching candidates scored in-task; only per-query local
        top-k rows leave the worker (same combiner shape as knn_brute) —
        a hot bucket costs a bigger matmul here, never unbounded driver
        memory. Exact cosine over the candidate set, so cross-batch /
        multi-table duplicates carry identical scores and dedupe by vec_id
        at the driver merge."""
        empty = pa.table({"q": pa.array([], pa.int32()),
                          "vec_id": pa.array([], pa.int64()),
                          "cos": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        qm = ray.get(q_ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        mat = _list_col_np(batch.column("vec"))
        _, first_ix = np.unique(ids, return_index=True)   # within-batch dupes
        ids, mat = ids[first_ix], mat[first_ix]
        sim = qm @ mat.T                                   # (nq, nc)
        out_q, out_id, out_cos = [], [], []
        for qi in range(qm.shape[0]):
            kk = min(k, ids.size)
            order = np.lexsort((ids, -sim[qi]))[:kk]
            out_q.extend([qi] * order.size)
            out_id.extend(int(ids[j]) for j in order)
            out_cos.extend(float(sim[qi, j]) for j in order)
        return pa.table({"q": pa.array(out_q, pa.int32()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "cos": pa.array(out_cos, pa.float64())})

    parts = embeds.map_batches(bucketize, batch_format="pyarrow") \
                  .map_batches(local_topk, batch_format="pyarrow")
    per_q: List[List[Tuple[int, float]]] = [[] for _ in range(q.shape[0])]
    for b in parts.iter_batches(batch_format="pyarrow"):
        for qi, vid, cos in zip(b.column("q").to_pylist(),
                                b.column("vec_id").to_pylist(),
                                b.column("cos").to_pylist()):
            per_q[qi].append((vid, cos))
    out: List[List[Tuple[int, float]]] = []
    for lst in per_q:
        # duplicates across batches carry the same exact score: keep first
        seen, merged = set(), []
        for vid, cos in sorted(lst, key=lambda x: (-x[1], x[0])):
            if vid not in seen:
                seen.add(vid)
                merged.append((vid, cos))
        out.append(merged[:k])
    return out


def _kmeans(sample: np.ndarray, n_lists: int, iters: int = 12,
            seed: int = 3) -> np.ndarray:
    """Spherical k-means on a (normalized) sample: cosine assignment, mean
    update, renormalize. Deterministic (seeded init from sample rows)."""
    rng = np.random.default_rng(seed)
    n = sample.shape[0]
    n_lists = min(n_lists, n)
    cent = sample[rng.choice(n, size=n_lists, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(n_lists):
            members = sample[assign == c]
            if members.shape[0]:
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def knn_ivf(embeds, query_vecs: np.ndarray, k: int = 10, n_lists: int = 32,
            n_probe: int = 8, train_sample: int = 4096, seed: int = 3):
    """Approximate cosine top-k via an IVF coarse quantizer.

    Train: sample -> spherical k-means (driver; centroids are tiny and
    broadcast). Search: one streaming pass — each batch assigns its vectors
    to their nearest centroid, keeps only rows whose list is probed by some
    query, and emits per-query local top-k; the driver merges (batch x k)
    partials exactly like knn_brute. No separate "build index" pass is
    needed for one-shot queries; for repeated querying, persist the
    ``list_id`` column once with ``ivf_assign`` and filter on it.
    """
    import ray

    q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))

    # ---- train on a bounded sample ----
    n_total = embeds.count()
    if n_total == 0:
        return [[] for _ in range(q.shape[0])]
    frac = min(1.0, train_sample / max(n_total, 1))
    sample_rows = embeds.random_sample(frac, seed=seed).take_all() \
        if frac < 1.0 else embeds.take_all()
    if not sample_rows:        # tiny corpus x small frac can sample nothing
        sample_rows = embeds.limit(min(n_total, train_sample)).take_all()
    smat = _normalize(np.array([r["embedding"] for r in sample_rows],
                               dtype=np.float64).reshape(len(sample_rows), -1))
    cent = _kmeans(smat, n_lists, seed=seed)

    # ---- per-query probe lists ----
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :min(n_probe, cent.shape[0])]
    probed_any = np.zeros(cent.shape[0], dtype=bool)
    probed_any[np.unique(probes)] = True
    # per-list bitmask of which queries probe it: (n_lists, nq)
    probe_mask = np.zeros((cent.shape[0], q.shape[0]), dtype=bool)
    for qi in range(q.shape[0]):
        probe_mask[probes[qi], qi] = True
    state_ref = ray.put((q, cent, probed_any, probe_mask))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm, cm, p_any, p_mask = ray.get(state_ref)
        ids, vecs = _batch_vecs(batch)
        vn = _normalize(vecs)
        assign = np.argmax(vn @ cm.T, axis=1)
        keep = p_any[assign]
        empty = pa.table({"q": pa.array([], pa.int32()),
                          "vec_id": pa.array([], pa.int64()),
                          "cos": pa.array([], pa.float64())})
        if not keep.any():
            return empty
        ids, vn, assign = ids[keep], vn[keep], assign[keep]
        sim = qm @ vn.T                              # (nq, nb_kept)
        allowed = p_mask[assign].T                   # (nq, nb_kept)
        out_q, out_id, out_cos = [], [], []
        for qi in range(qm.shape[0]):
            cols = np.flatnonzero(allowed[qi])
            if not cols.size:
                continue
            s = sim[qi, cols]
            kk = min(k, cols.size)
            idx = np.argpartition(-s, kk - 1)[:kk] if kk < cols.size else np.arange(cols.size)
            for j in idx:
                out_q.append(qi)
                out_id.append(int(ids[cols[j]]))
                out_cos.append(float(s[j]))
        if not out_q:
            return empty
        return pa.table({"q": pa.array(out_q, pa.int32()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "cos": pa.array(out_cos, pa.float64())})

    parts = embeds.map_batches(partial_topk, batch_format="pyarrow")
    per_q: List[List[Tuple[int, float]]] = [[] for _ in range(q.shape[0])]
    for b in parts.iter_batches(batch_format="pyarrow"):
        for qi, vid, cos in zip(b.column("q").to_pylist(),
                                b.column("vec_id").to_pylist(),
                                b.column("cos").to_pylist()):
            per_q[qi].append((vid, cos))
    out = []
    for lst in per_q:
        lst.sort(key=lambda x: (-x[1], x[0]))
        out.append(lst[:k])
    return out


def ivf_assign(embeds, centroids: np.ndarray, vec_col: str = "embedding"):
    """Persistable IVF assignment: adds a ``list_id`` column (write the
    result partitioned by list_id for a reusable on-disk IVF index)."""
    import ray

    cent_ref = ray.put(_normalize(np.asarray(centroids, dtype=np.float64)))

    def assign(batch: pa.Table) -> pa.Table:
        cm = ray.get(cent_ref)
        vn = _normalize(_list_col_np(batch.column(vec_col)))
        lid = np.argmax(vn @ cm.T, axis=1).astype(np.int32)
        return batch.append_column("list_id", pa.array(lid, pa.int32()))

    return embeds.map_batches(assign, batch_format="pyarrow")


# broadcast gate for the exact all-pairs join: below this many rows the
# normalized f64 matrix (rows x dim x 8B; ~0.5 GB at 200k x 256-dim) rides
# the object store as ONE broadcast; above it the tiled block-pair join runs
# instead — the driver never materializes the corpus in either mode beyond
# this bound (repo hard rule: size-gated broadcasts with a scale path).
_BCAST_VEC_ROWS = 200_000


def cosine_pairs_exact(embeds, threshold: float = 0.99, broadcast: bool = None,
                       tile_rows: int = 8192):
    """EXACT all-pairs cosine join: every (a, b, cos) with cos >= threshold.

    Two size-gated modes, identical results (tested):
    - broadcast (N <= _BCAST_VEC_ROWS): the normalized matrix broadcasts
      once (``ray.put``); each batch computes one (batch x N) matmul and
      emits only its above-threshold pairs with a < b.
    - tiled (the scale path): rows hash into T = ceil(N / tile_rows) tiles;
      each row replicates to the T tile-pairs containing its tile (the same
      triangle-join decomposition as stages/dedup.py hot buckets) and a
      ``groupby(pair)`` computes one bounded cross/triangle matmul per tile
      pair — per-task memory is <= 2 x tile_rows vectors regardless of N.
      The O(N^2) FLOPs and the N x T shuffled rows are inherent to an exact
      all-pairs join; this is the ground-truth/verification counterpart of
      the approximate ``embedding_dedup`` (LSH) path.

    Returns a sorted list of (a, b, cos) — the result set, small by
    construction for near-dup thresholds.
    """
    import ray

    n_total = embeds.count()
    if n_total == 0:
        return []
    if broadcast is None:
        broadcast = n_total <= _BCAST_VEC_ROWS
    if not broadcast:
        return _cosine_pairs_tiled(embeds, threshold, n_total, tile_rows)

    ids_parts, vec_parts = [], []
    for b in embeds.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            i, v = _batch_vecs(b)
            ids_parts.append(i.copy())
            vec_parts.append(_normalize(v))
    if not ids_parts:
        return []
    all_ids = np.concatenate(ids_parts)
    all_vecs = np.vstack(vec_parts)
    ref = ray.put((all_ids, all_vecs))

    def pairs(batch: pa.Table) -> pa.Table:
        gids, gvecs = ray.get(ref)
        ids, vecs = _batch_vecs(batch)
        vn = _normalize(vecs)
        sim = vn @ gvecs.T                           # (nb, N)
        mask = (sim >= threshold - 1e-12) & (ids[:, None] < gids[None, :])
        ii, jj = np.nonzero(mask)
        return pa.table({
            "a": pa.array(ids[ii], pa.int64()),
            "b": pa.array(gids[jj], pa.int64()),
            "cos": pa.array(np.round(sim[ii, jj], 6), pa.float64()),
        })

    out = []
    for b in embeds.map_batches(pairs, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
        out.extend(zip(b.column("a").to_pylist(), b.column("b").to_pylist(),
                       b.column("cos").to_pylist()))
    return sorted(out)


def _cosine_pairs_tiled(embeds, threshold: float, n_total: int,
                        tile_rows: int):
    """Block-pair (triangle) decomposition of the exact all-pairs join.

    Tile id = multiplicative hash of vec_id mod T (id-clustering-proof);
    group key = lo * T + hi over unordered tile pairs, so every unordered
    row pair meets in EXACTLY one group: (c, c) groups emit their triangle,
    (lo, hi) groups the full cross product between the two tile sides.
    """
    T = max(2, -(-n_total // max(1, tile_rows)))

    def fan_out(batch: pa.Table) -> pa.Table:
        ids, vecs = _batch_vecs(batch)
        if not ids.size:
            return pa.table({
                "pk": pa.array([], pa.int64()),
                "chunk": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "vec": pa.array([], pa.list_(pa.float64()))})
        vn = _normalize(vecs)
        mixed = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        ci = (mixed % np.uint64(T)).astype(np.int64)
        rep = np.repeat(np.arange(ids.size), T)
        cj = np.tile(np.arange(T, dtype=np.int64), ids.size)
        lo = np.minimum(ci[rep], cj)
        hi = np.maximum(ci[rep], cj)
        # list<double> built from one flat buffer + arithmetic offsets (no
        # per-row Python); plain list (not fixed_size) keeps the block schema
        # identical to the typed empty-batch table above
        flat = pa.array(vn[rep].ravel(), pa.float64())
        offs = pa.array(np.arange(rep.size + 1, dtype=np.int32) * vn.shape[1],
                        pa.int32())
        return pa.table({
            "pk": pa.array(lo * T + hi, pa.int64()),
            "chunk": pa.array(ci[rep], pa.int64()),
            "vec_id": pa.array(ids[rep], pa.int64()),
            "vec": pa.ListArray.from_arrays(offs, flat),
        })

    def pairs_group(g: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "cos": pa.array([], pa.float64())})
        if g.num_rows < 2:
            return empty
        lo, hi = divmod(int(g.column("pk")[0].as_py()), T)
        ids = g.column("vec_id").to_numpy(zero_copy_only=False)
        mat = _list_col_np(g.column("vec"))
        if lo == hi:                                 # triangle within a tile
            sim = mat @ mat.T
            mask = (sim >= threshold - 1e-12) & (ids[:, None] < ids[None, :])
            ii, jj = np.nonzero(mask)
            a, b, c = ids[ii], ids[jj], sim[ii, jj]
        else:                                        # cross between tiles
            sa = g.column("chunk").to_numpy(zero_copy_only=False) == lo
            ia, va = ids[sa], mat[sa]
            ib, vb = ids[~sa], mat[~sa]
            if not ia.size or not ib.size:
                return empty
            sim = va @ vb.T
            ii, jj = np.nonzero(sim >= threshold - 1e-12)
            a = np.minimum(ia[ii], ib[jj])
            b = np.maximum(ia[ii], ib[jj])
            c = sim[ii, jj]
        if not a.size:
            return empty
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64()),
                         "cos": pa.array(np.round(c, 6), pa.float64())})

    pairs_ds = embeds.map_batches(fan_out, batch_format="pyarrow") \
                     .groupby("pk").map_groups(pairs_group,
                                               batch_format="pyarrow")
    out = []
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        out.extend(zip(b.column("a").to_pylist(), b.column("b").to_pylist(),
                       b.column("cos").to_pylist()))
    return sorted(out)


def kmeans_fit(embeds, k: int = 8, iters: int = 10,
               vec_col: str = "embedding", id_col: str = "vec_id"):
    """Fully DISTRIBUTED spherical k-means (Lloyd's) over the whole
    corpus — unlike :func:`_kmeans` (driver-side, sample-trained for IVF),
    every iteration here is one streaming Dataset pass:

    - centroids (k x dim, tiny) broadcast via the closure each round;
    - each batch does ONE cosine-assignment matmul, then a sort+reduceat
      (count, sum-vector) combiner per centroid — only O(batches x k)
      partial rows reach the driver merge, raw vectors never shuffle and
      the dataset never materializes (at scale each pass re-reads from
      storage, the standard scale path for iterative refinement);
    - empty clusters retain their previous centroid; centroids
      renormalize each round (spherical variant).

    Deterministic: init = first k rows in dataset order, fixed iteration
    count. Returns the (k x dim) centroid matrix.
    """
    init_rows = embeds.limit(k).take_all()
    if not init_rows:
        return np.empty((0, 0), np.float64)
    cent = _normalize(np.array([r[vec_col] for r in init_rows],
                               dtype=np.float64).reshape(len(init_rows), -1))
    src = embeds.select_columns([vec_col])
    # pin small corpora in the object store once instead of re-reading
    # parquet every iteration; above the gate, streaming re-read per pass
    # is the scale path (object-store memory stays O(1) in iterations)
    if src.count() <= _BCAST_VEC_ROWS:
        src = src.materialize()

    for _ in range(iters):
        cm = cent  # captured by value in the closure; k x dim, tiny

        def partial(b: pa.Table, cm=cm) -> pa.Table:
            kk, dim = cm.shape
            if b.num_rows == 0:
                return pa.table({
                    "cluster": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.list_(pa.float64()))})
            vecs = _list_col_np(b.column(vec_col))
            vn = _normalize(vecs)
            assign = np.argmax(vn @ cm.T, axis=1).astype(np.int64)
            order = np.argsort(assign, kind="stable")
            a, m = assign[order], vecs[order]
            starts = np.flatnonzero(
                np.concatenate(([True], a[1:] != a[:-1])))
            sums = np.add.reduceat(m, starts, axis=0)
            cnts = np.diff(np.append(starts, a.size))
            return pa.table({
                "cluster": pa.array(a[starts], pa.int64()),
                "cnt": pa.array(cnts.astype(np.int64), pa.int64()),
                "vsum": pa.array(list(sums), pa.list_(pa.float64()))})

        rows = src.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros_like(cent)
        cnts = np.zeros(cent.shape[0], np.int64)
        for r in rows:
            c = int(r["cluster"])
            sums[c] += np.asarray(r["vsum"], np.float64)
            cnts[c] += int(r["cnt"])
        new = cent.copy()
        nonempty = cnts > 0
        new[nonempty] = sums[nonempty] / cnts[nonempty, None]
        cent = _normalize(new)
    return cent


def kmeans_assign(embeds, k: int = 8, iters: int = 10,
                  vec_col: str = "embedding", id_col: str = "vec_id"):
    """-> (vec_id, cluster): :func:`kmeans_fit` then one assignment pass
    (``ivf_assign``), renamed for the training-data clustering surface."""
    cent = kmeans_fit(embeds, k=k, iters=iters, vec_col=vec_col,
                      id_col=id_col)

    out = ivf_assign(embeds.select_columns([id_col, vec_col]), cent,
                     vec_col=vec_col)
    return out.map_batches(
        lambda b: pa.table({id_col: b.column(id_col).cast(pa.int64()),
                            "cluster": b.column("list_id").cast(pa.int64())}),
        batch_format="pyarrow")


def label_centroids(embeds, label_col: str = "label",
                    vec_col: str = "embedding", round_dp: int = 6):
    """Per-label mean vector (class prototypes for nearest-centroid
    classification / IVF seeding), as the long relation (label, dim, v).

    Classic pre-aggregated combiner over a VECTOR column: each batch
    sorts by label once and emits one (label, count, sum-vector) row per
    label via ``np.add.reduceat`` — the merge groupby sees
    O(batches x labels) rows and the raw vectors never shuffle. Output
    dims are 1-based to match SQL ``generate_subscripts``.
    """

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "label": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
            "vsum": pa.array([], pa.list_(pa.float64()))})
        if b.num_rows == 0:
            return empty
        labels = b.column(label_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mat = _list_col_np(b.column(vec_col))
        order = np.argsort(labels, kind="stable")
        labels, mat = labels[order], mat[order]
        starts = np.flatnonzero(
            np.concatenate(([True], labels[1:] != labels[:-1])))
        sums = np.add.reduceat(mat, starts, axis=0)
        cnts = np.diff(np.append(starts, labels.size))
        return pa.table({
            "label": pa.array(labels[starts], pa.int64()),
            "cnt": pa.array(cnts.astype(np.int64), pa.int64()),
            "vsum": pa.array(list(sums), pa.list_(pa.float64()))})

    def finish(g: pa.Table) -> pa.Table:
        labels = g.column("label").to_numpy(zero_copy_only=False)
        cnts = g.column("cnt").to_numpy(zero_copy_only=False)
        mat = _list_col_np(g.column("vsum"))
        order = np.argsort(labels, kind="stable")
        labels, cnts, mat = labels[order], cnts[order], mat[order]
        starts = np.flatnonzero(
            np.concatenate(([True], labels[1:] != labels[:-1])))
        sums = np.add.reduceat(mat, starts, axis=0)
        total = np.add.reduceat(cnts, starts)
        mean = np.round(sums / total[:, None], round_dp)
        ul = labels[starts]
        dim = mean.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(ul, dim), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, dim + 1), ul.size),
                            pa.int64()),
            "v": pa.array(mean.ravel(), pa.float64())})

    return embeds.select_columns([label_col, vec_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .map_batches(
            lambda b: b.append_column("_g", pa.array([0] * b.num_rows,
                                                     pa.int8())),
            batch_format="pyarrow") \
        .groupby("_g").map_groups(lambda g: finish(g.drop(["_g"])),
                                  batch_format="pyarrow")


def embedding_dim_stats(embeds, vec_col: str = "embedding",
                        scale: int = 1_000_000):
    """Exact per-dimension statistics of a ``list<float>`` column —
    the vector-column face of the table profiler: each coordinate is
    quantized to ``round(x * scale)`` micro-units (half-away, int64) so
    every aggregate is an order-independent integer sum the SQL oracle
    reproduces bit-for-bit (float accumulation order would not be).

    Per batch one (dim,)-row partial: n, sum(q), sum(q^2), min, max —
    only ``dim`` rows per batch enter the native groupby, the vectors
    themselves never shuffle. sum(q^2) per-batch stays < 2^63 for any
    realistic batch (|q| <= ~scale for unit-normalized embeddings);
    corpus-level overflow would need ~1e6 batches x 4e15 — flagged in
    the docstring rather than guarded, same stance as the other
    integer-moment ops (SCALE.md).

    Output: dim, n, sum_q, sumsq_q, min_q, max_q, mean
    (mean = (sum_q/n)/scale in two IEEE divisions, replayed in SQL).
    """
    from ray.data.aggregate import Max, Min, Sum

    from .common import half_away_scaled_int

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"dim": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "s": pa.array([], pa.int64()),
                          "ss": pa.array([], pa.int64()),
                          "mn": pa.array([], pa.int64()),
                          "mx": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        v = _list_col_np(b.column(vec_col))
        if v.size == 0:
            return empty
        q = half_away_scaled_int(v, scale)
        dim = q.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(dim, dtype=np.int64), pa.int64()),
            "n": pa.array(np.full(dim, q.shape[0], np.int64), pa.int64()),
            "s": pa.array(q.sum(axis=0, dtype=np.int64), pa.int64()),
            "ss": pa.array((q * q).sum(axis=0, dtype=np.int64), pa.int64()),
            "mn": pa.array(q.min(axis=0), pa.int64()),
            "mx": pa.array(q.max(axis=0), pa.int64())})

    merged = embeds.select_columns([vec_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("dim").aggregate(
            Sum("n", alias_name="n"), Sum("s", alias_name="sum_q"),
            Sum("ss", alias_name="sumsq_q"), Min("mn", alias_name="min_q"),
            Max("mx", alias_name="max_q"))

    sc = float(scale)

    def finish(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "dim": pa.array([], pa.int64()), "n": pa.array([], pa.int64()),
            "sum_q": pa.array([], pa.int64()),
            "sumsq_q": pa.array([], pa.int64()),
            "min_q": pa.array([], pa.int64()),
            "max_q": pa.array([], pa.int64()),
            "mean": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        n = b.column("n").cast(pa.int64()).to_numpy(zero_copy_only=False)
        s = b.column("sum_q").cast(pa.int64()).to_numpy(zero_copy_only=False)
        mean = (s.astype(np.float64) / n.astype(np.float64)) / sc
        return pa.table({
            "dim": b.column("dim").cast(pa.int64()),
            "n": pa.array(n, pa.int64()),
            "sum_q": pa.array(s, pa.int64()),
            "sumsq_q": b.column("sumsq_q").cast(pa.int64()),
            "min_q": b.column("min_q").cast(pa.int64()),
            "max_q": b.column("max_q").cast(pa.int64()),
            "mean": pa.array(mean, pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow").sort("dim")


def embedding_norm_topk(embeds, k: int = 20, largest: bool = True,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        scale: int = 1_000_000):
    """Norm outliers: top-k vectors by exact quantized squared L2 norm
    (``sum(round(x*scale)^2)`` int64) — the standard embedding-quality
    diagnostic (near-zero or blown-up norms are collapsed/broken rows).
    Per-batch local top-k combiner, then a k-row global sort; vectors
    never shuffle. Ties break on ``id_col`` ascending, same in SQL.
    """
    from .common import half_away_scaled_int

    sign = -1 if largest else 1

    def local_topk(b: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "normsq_q": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        v = _list_col_np(b.column(vec_col))
        if v.size == 0:
            return empty
        q = half_away_scaled_int(v, scale)
        nsq = (q * q).sum(axis=1, dtype=np.int64)
        ids = b.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sign * nsq))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "normsq_q": pa.array(nsq[order], pa.int64())})

    return embeds.select_columns([id_col, vec_col]) \
        .map_batches(local_topk, batch_format="pyarrow") \
        .sort(["normsq_q", id_col], descending=[largest, False]).limit(k)


def embed_covariance(embeds, vec_col: str = "embedding",
                     scale: int = 1_000_000):
    """Exact sample covariance matrix of the embedding column ->
    (i, j, n, cov) for every upper-triangle dim pair i <= j — the input
    to whitening / PCA-style diagnostics over a vector corpus.

    Exactness contract: coordinates quantize to ``round(x*scale)``
    micro-units (half-away int64, same as embedding_dim_stats), so the
    cross-moment matrix is an order-independent INTEGER sum; the only
    floats are the final ``cov = f64(n*Sxy - Sx*Sy) / f64(n*(n-1)) /
    scale^2`` — three IEEE ops replayed verbatim in the SQL oracle.

    Scale shape: per batch ONE int64 matmul (``q.T @ q``, d x d) plus
    column sums and a row count ride as <= d^2 + d + 1 keyed integer
    partials into a native groupby — the vectors themselves never
    shuffle, and the merged relation is O(d^2) regardless of corpus
    size. The d^2-cell finish runs driver-side with arbitrary-precision
    Python ints (``n*Sxy - Sx*Sy`` overflows int64 around 1e6 rows; the
    int64 partial sums themselves hold to ~1e7 rows x unit-norm vectors
    — the embedding_dim_stats overflow stance, documented not guarded).
    """
    from ray.data.aggregate import Sum

    from .common import half_away_scaled_int

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"k": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        q = half_away_scaled_int(_list_col_np(b.column(vec_col)), scale)
        if q.size == 0:
            return empty
        d = q.shape[1]
        xtx = q.T @ q                      # (d, d) int64 exact
        iu, ju = np.triu_indices(d)
        keys = np.concatenate([
            iu.astype(np.int64) * d + ju,                  # pair cells
            np.int64(d) * d + np.arange(d, dtype=np.int64),  # col sums
            np.array([d * d + d], np.int64)])              # row count
        vals = np.concatenate([
            xtx[iu, ju],
            q.sum(axis=0, dtype=np.int64),
            np.array([q.shape[0]], np.int64)])
        return pa.table({"k": pa.array(keys, pa.int64()),
                         "v": pa.array(vals, pa.int64())})

    merged = embeds.select_columns([vec_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("v", alias_name="v"))

    cells: dict = {}
    for b in merged.iter_batches(batch_format="pyarrow"):
        for k, v in zip(b.column("k").to_pylist(),
                        b.column("v").to_pylist()):
            cells[int(k)] = int(v)
    empty = pa.table({"i": pa.array([], pa.int64()),
                      "j": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64()),
                      "cov": pa.array([], pa.float64())})
    if not cells:
        return empty
    # d decodes from the largest key: n's key is d^2 + d
    mk = max(cells)
    d = int((-1 + (1 + 4 * mk) ** 0.5) / 2 + 0.5)
    assert d * d + d == mk, "inconsistent key space"
    n = cells[mk]
    if n < 2:
        return empty
    sx = [cells.get(d * d + i, 0) for i in range(d)]
    ii, jj, cov = [], [], []
    den = float(n * (n - 1))
    sc2 = float(scale) * float(scale)
    for i in range(d):
        for j in range(i, d):
            sxy = cells.get(i * d + j, 0)
            ii.append(i)
            jj.append(j)
            cov.append(float(n * sxy - sx[i] * sx[j]) / den / sc2)
    return pa.table({"i": pa.array(ii, pa.int64()),
                     "j": pa.array(jj, pa.int64()),
                     "n": pa.array([n] * len(ii), pa.int64()),
                     "cov": pa.array(cov, pa.float64())})


def quantize_embeddings(embeds, vec_col: str = "embedding",
                        id_col: str = "vec_id", levels: int = 255):
    """Per-dimension min-max scalar quantization of the embedding column
    -> (id, dim, code) with ``code = round((x - mn_d)/(mx_d - mn_d) *
    levels)`` — the standard int8-codebook compression pass before an
    ANN index ships to storage.

    Two streaming passes: (1) per-batch per-dim (min, max) float
    partials -> native groupby -> an O(dim) range table that rides the
    task closure; (2) a pure map emitting codes. Every arithmetic step
    is the same IEEE double expression the SQL oracle runs (float32
    coordinates widen exactly; min/max are exact elements; one
    subtraction, one division, one multiply, half-away round), so codes
    hash-match bit-for-bit. Constant dimensions (mx == mn) code to 0.

    The exploded (id, dim, code) layout is the oracle-comparable face;
    a production sink would re-pack to one ``list<int8>`` per row in
    the same batch map (no extra pass) — layout choice, not plan.
    """
    from ray.data.aggregate import Max, Min, Sum  # noqa: F401

    def mm_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"dim": pa.array([], pa.int64()),
                          "mn": pa.array([], pa.float64()),
                          "mx": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        v = _list_col_np(b.column(vec_col))
        if v.size == 0:
            return empty
        d = v.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64), pa.int64()),
            "mn": pa.array(v.min(axis=0), pa.float64()),
            "mx": pa.array(v.max(axis=0), pa.float64())})

    rng = embeds.select_columns([vec_col]) \
        .map_batches(mm_partial, batch_format="pyarrow") \
        .groupby("dim").aggregate(Min("mn", alias_name="mn"),
                                  Max("mx", alias_name="mx"))
    dims, mns, mxs = [], [], []
    for b in rng.iter_batches(batch_format="pyarrow"):
        dims.extend(b.column("dim").to_pylist())
        mns.extend(b.column("mn").to_pylist())
        mxs.extend(b.column("mx").to_pylist())
    if not dims:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "dim": pa.array([], pa.int64()),
                         "code": pa.array([], pa.int64())})
    order = np.argsort(np.asarray(dims))
    mn = np.asarray(mns, np.float64)[order]
    mx = np.asarray(mxs, np.float64)[order]
    span_ok = mx > mn
    lv = float(levels)

    from .common import half_away_scaled_int

    def codes(b: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "dim": pa.array([], pa.int64()),
                          "code": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        ids = b.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = _list_col_np(b.column(vec_col))
        nrm = np.where(span_ok, (v - mn) / np.where(span_ok, mx - mn, 1.0)
                       * lv, 0.0)
        c = half_away_scaled_int(nrm, 1)
        n, d = v.shape
        return pa.table({
            id_col: pa.array(np.repeat(ids, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n),
                            pa.int64()),
            "code": pa.array(c.ravel(), pa.int64())})

    return embeds.select_columns([id_col, vec_col]) \
        .map_batches(codes, batch_format="pyarrow")
