"""Exact global order statistics without a global sort: every row gets
its exact rank in the total order (value, id) using range partitioning +
prefix-sum offsets — the textbook distributed-rank plan.

1. histogram pass: per-batch bin counts against broadcast bin edges
   (one ``np.searchsorted`` per batch); the driver merges B tiny count
   vectors (never rows) into an exclusive prefix sum = each bin's global
   starting rank.
2. rank pass: ONE shuffle keyed on the bin id; each bin's rows sort
   locally and take ``offset[bin] + local_position``.

Bin edges come from a per-batch deterministic subsample (every k-th
element of the batch's sorted values) so bins approximate equi-depth
even on skewed distributions — a hot uniform-width bin would otherwise
concentrate the shuffle. Ids break ties, so ranks are unique and match
SQL ``rank() OVER (ORDER BY value, id)`` exactly.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from .common import adaptive_groups

_SAMPLE_STRIDE = 64        # keep every 64th sorted value per batch ...
_BATCH_SAMPLE_CAP = 256    # ... but never more than this many per batch
_MAX_EDGES = 4096


def global_rank(ds, value_col: str, id_col: str,
                num_bins: Optional[int] = None):
    """Dataset (id, rank) with rank the exact 1-based position of
    (value, id) in the global ascending order. ``id_col`` values must be
    unique; ``value_col`` must be numeric and non-null."""
    import ray

    if num_bins is None:
        num_bins = min(_MAX_EDGES,
                       adaptive_groups(max(ds.count(), 1), 250_000, lo=32))

    src = ds.select_columns([value_col, id_col])

    # --- edge discovery: deterministic strided subsample per batch,
    # capped at _BATCH_SAMPLE_CAP values/batch so the driver holds
    # O(n_batches) sample points, never O(rows) ---
    def sample(b: pa.Table) -> pa.Table:
        v = np.sort(b.column(value_col).to_numpy(zero_copy_only=False))
        stride = max(_SAMPLE_STRIDE,
                     -(-v.size // _BATCH_SAMPLE_CAP))
        return pa.table({"v": pa.array(v[::stride].astype(
            np.float64), pa.float64())})

    samp = np.sort(np.array(
        [r["v"] for r in src.map_batches(sample,
                                         batch_format="pyarrow").take_all()],
        np.float64))
    if samp.size == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "rank": pa.array([], pa.int64())}))
    # interior edges at equi-depth positions of the sample
    qpos = (np.arange(1, num_bins) * samp.size) // num_bins
    edges = np.unique(samp[np.clip(qpos, 0, samp.size - 1)])
    edges_ref = ray.put(edges)
    nb = edges.size + 1                    # actual bin count

    # --- pass 1: per-batch counts of TOUCHED bins only (O(batches x
    # occupied-bins) driver rows, never the dense bin vector) ---
    def bincounts(b: pa.Table) -> pa.Table:
        e = ray.get(edges_ref)
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        bins = np.searchsorted(e, v, side="right")
        ub, c = np.unique(bins, return_counts=True)
        return pa.table({"bin": pa.array(ub.astype(np.int64), pa.int64()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64())})

    counts = np.zeros(nb, np.int64)
    for r in src.map_batches(bincounts, batch_format="pyarrow").take_all():
        counts[r["bin"]] += r["cnt"]
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    off_ref = ray.put(offsets)

    # --- pass 2: one shuffle on bin id; local sort + offset ---
    def tag(b: pa.Table) -> pa.Table:
        e = ray.get(edges_ref)
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        g = np.searchsorted(e, v, side="right")
        return pa.table({
            "v": b.column(value_col),
            id_col: b.column(id_col).cast(pa.int64()),
            "gkey": pa.array(g.astype(np.int64), pa.int64())})

    def rank_bin(g: pa.Table, bin_id: np.int64) -> pa.Table:
        off = ray.get(off_ref)
        v = g.column("v").to_numpy(zero_copy_only=False)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, v))
        start = int(off[int(bin_id)])
        return pa.table({
            id_col: pa.array(ids[order], pa.int64()),
            "rank": pa.array(start + 1 + np.arange(ids.size, dtype=np.int64),
                             pa.int64())})

    return src.map_batches(tag, batch_format="pyarrow") \
        .groupby("gkey").map_groups(
            lambda t: rank_bin(t.drop(["gkey"]),
                               t.column("gkey")[0].as_py()),
            batch_format="pyarrow")


def group_percent_rank(ds, group: str, order_col: str, id_col: str,
                       dp: int = 6):
    """SQL ``percent_rank() OVER (PARTITION BY group ORDER BY order_col)``
    -> (id, group, order_col, pr): rank-with-gaps ties, pr =
    (rank-1)/(n-1), single-row groups -> 0. The per-source quality-
    percentile selector (keep the top p% of each source by a quality
    signal) every mixture-curation pipeline needs.

    Co-partitions by ``group`` and resolves each partition vectorized
    (one sort + searchsorted per group segment — the loop is over
    distinct groups per task, not rows). Partitioning assumption: one
    group's rows fit one task (the sessionize contract); for a group
    that exceeds a worker, swap in the equi-depth global_rank bins per
    group — same output, two passes.
    """
    from .common import adaptive_groups, round_half_away

    est = ds.count()
    ngroups = adaptive_groups(est, 1_000_000, lo=16)

    def resolve(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             group: pa.array([], pa.string()),
                             order_col: pa.array([], pa.int64()),
                             "pr": pa.array([], pa.float64())})
        key = np.asarray(g.column(group).to_pylist(), object)
        v = g.column(order_col).to_numpy(zero_copy_only=False)
        o = np.lexsort((v, key))
        ks, vs = key[o], v[o]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        ends = np.append(starts[1:], ks.size)
        pr = np.zeros(ks.size, np.float64)
        for s, e in zip(starts, ends):
            n = e - s
            if n > 1:
                seg = vs[s:e]
                rank = np.searchsorted(seg, seg, side="left")  # ties: rank()
                pr[s:e] = rank / (n - 1)
        inv = np.empty(ks.size, np.int64)
        inv[o] = np.arange(ks.size)
        return pa.table({
            id_col: g.column(id_col),
            group: g.column(group),
            order_col: g.column(order_col),
            "pr": pa.array(round_half_away(pr[inv], dp), pa.float64())})

    def add_g(b: pa.Table) -> pa.Table:
        import hashlib
        # deterministic cross-process hash (Python hash() is per-process
        # salted — it would split one group across partitions); md5 only
        # over the batch-DISTINCT group values
        vals = np.asarray(b.column(group).to_pylist(), object)
        uniq, inv = np.unique(vals, return_inverse=True)
        hu = np.array([int.from_bytes(
            hashlib.md5(str(x).encode()).digest()[:8], "little")
            % ngroups for x in uniq], np.int64)
        return b.append_column("_g", pa.array(hu[inv], pa.int64()))

    return (ds.select_columns([id_col, group, order_col])
            .map_batches(add_g, batch_format="pyarrow")
            .groupby("_g")
            .map_groups(lambda g: resolve(g.drop(["_g"])),
                        batch_format="pyarrow"))


def ntile(ds, value_col: str, id_col: str, k: int):
    """SQL ``ntile(k) OVER (ORDER BY value, id)`` -> (id, bucket):
    distributed equal-frequency bucketing WITHOUT a global sort — the
    exact 1-based global rank comes from :func:`global_rank` (equi-depth
    bins + prefix-sum offsets, two streaming passes) and the bucket is a
    closed-form function of (rank, n, k) replicating SQL's
    extras-to-the-front rule: the first ``n % k`` buckets hold
    ``n // k + 1`` rows, the rest ``n // k``."""
    n = ds.count()
    ranks = global_rank(ds, value_col, id_col)
    n_big = n % k
    size_small = n // k
    size_big = size_small + 1
    cut = n_big * size_big

    def bucketize(b: pa.Table) -> pa.Table:
        r0 = b.column("rank").cast(pa.int64()).to_numpy(
            zero_copy_only=False) - 1
        if size_small > 0:
            bkt = np.where(r0 < cut, r0 // size_big,
                           n_big + (r0 - cut) // max(size_small, 1))
        else:                      # n < k: one row per leading bucket
            bkt = r0
        return pa.table({
            id_col: b.column(id_col).cast(pa.int64()),
            "bucket": pa.array((bkt + 1).astype(np.int64), pa.int64())})

    return ranks.map_batches(bucketize, batch_format="pyarrow")
