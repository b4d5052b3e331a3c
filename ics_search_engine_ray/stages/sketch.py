"""Mergeable distinct-count sketches over a keyed column (task brief:
"a novel sketch" as a custom operator).

KMV (k minimum values) estimator [Bar-Yossef et al. 2002; Beyer et al.
2007 "On synopses for distinct-value estimation"]: hash every value with a
64-bit mixer onto [0, 1); keep the k smallest distinct hashes per group.
With m >= k observed distinct hashes, the k-th smallest hash h_(k)
estimates the distinct count as (k - 1) / h_(k); with fewer than k the
sketch is exact. Sketches merge by union + re-truncate, so the map side
emits one bounded partial sketch per (batch, group) and the single tiny
``groupby(key).map_groups`` merge sees only O(batches x k) rows — the
classic pre-aggregated-combiner shape; the raw value column never
shuffles.

``distinct_count_exact`` is the exact companion (two-stage groupby:
distinct pairs, then count) used as the SQL-oracle-checkable truth.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.wordhash import _splitmix


def _hash01(vals: np.ndarray) -> np.ndarray:
    """uint64 mix -> float64 in [0, 1) (53-bit mantissa precision)."""
    h = _splitmix(vals.astype(np.uint64))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def kmv_estimate(hashes: np.ndarray, k: int) -> float:
    """Estimate distinct count from a merged set of distinct hashes."""
    hs = np.unique(hashes)
    if hs.size < k:
        return float(hs.size)
    return (k - 1) / float(hs[k - 1])


def _kmv_partial(key: str, value: str, k: int):
    """Batch fn factory: per-key k-smallest distinct hashes (the map-side
    partial KMV sketch) — shared by :func:`distinct_count_kmv` and
    :func:`distinct_intersection_kmv`."""

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({key: pa.array([], b.schema.field(key).type),
                             "h": pa.array([], pa.float64())})
        keys = b.column(key)
        vals = b.column(value).to_numpy(zero_copy_only=False).astype(np.int64)
        h = _hash01(vals)
        # per-key k-smallest distinct hashes within this batch
        import pyarrow.compute as pc
        codes = pc.dictionary_encode(keys)
        idx = codes.combine_chunks().indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((h, idx))
        gi, hh = idx[order], h[order]
        keep = np.empty(gi.size, bool)
        keep[0] = True
        keep[1:] = (gi[1:] != gi[:-1]) | (hh[1:] != hh[:-1])   # distinct
        gi, hh = gi[keep], hh[keep]
        starts = np.flatnonzero(np.concatenate(([True], gi[1:] != gi[:-1])))
        rank = np.arange(gi.size) - np.repeat(starts, np.diff(np.append(starts, gi.size)))
        top = rank < k
        gi, hh = gi[top], hh[top]
        dict_arr = codes.combine_chunks().dictionary
        return pa.table({key: dict_arr.take(pa.array(gi, pa.int64())),
                         "h": pa.array(hh, pa.float64())})

    return partial


def distinct_count_kmv(ds, key: str, value: str, k: int = 256):
    """Dataset -> Dataset (key, estimate): approximate distinct `value`
    per `key`. Returns estimates as float64 (deterministic: the hash is
    seedless splitmix)."""

    def merge(g: pa.Table) -> pa.Table:
        kt = g.schema.field(key).type
        if g.num_rows == 0:
            return pa.table({key: pa.array([], kt),
                             "estimate": pa.array([], pa.float64())})
        est = kmv_estimate(g.column("h").to_numpy(zero_copy_only=False), k)
        return pa.table({key: g.column(key).slice(0, 1),
                         "estimate": pa.array([round(est, 6)], pa.float64())})

    return ds.map_batches(_kmv_partial(key, value, k),
                          batch_format="pyarrow") \
             .groupby(key).map_groups(merge, batch_format="pyarrow")


_KMV_PAIR_GATE_ROWS = 4_000_000    # driver sketch table: keys x k rows —
# "results"-class state (source taxonomies x 256); raise k or trim keys
# upstream if a fleet of 15k+ sources at k=256 ever trips it


def distinct_intersection_kmv(ds, key: str, value: str, k: int = 256,
                              gate_rows: int = _KMV_PAIR_GATE_ROWS):
    """Theta-style KMV set intersection [Beyer et al. 2007; the theta
    sketch of Dasgupta et al. 2016]: for every key pair (s1 < s2),
    estimate the number of DISTINCT ``value``s they share — "how many
    users do two event types have in common", the set-algebra companion
    of :func:`distinct_count_kmv`.

    Estimator: per key keep the KMV sketch; theta_key = h_(k) when the
    sketch saturated (entries are the k-1 hashes below it) else 1.0
    (entries are ALL hashes — the estimate is EXACT for small sets).
    For a pair, theta = min(theta_a, theta_b) and
    ``est = |{h in entries_a ∩ entries_b : h < theta}| / theta``.

    Distribution shape: the same map-side partial as distinct_count_kmv
    (raw values never shuffle), a native groupby(key) truncates to the
    final per-key sketch, and only the (keys x k)-row sketch table
    reaches the driver (gated) where all pairs combine in numpy.
    Deterministic given the seedless splitmix hash — the DuckDB oracle
    replicates it bit-exactly. Returns a pa.Table (s1, s2, est_shared).
    """

    def final_sketch(g: pa.Table) -> pa.Table:
        kt = g.schema.field(key).type
        if g.num_rows == 0:
            return pa.table({key: pa.array([], kt),
                             "h": pa.array([], pa.float64())})
        hs = np.unique(g.column("h").to_numpy(zero_copy_only=False))[:k]
        k0 = g.column(key)[0].as_py()
        return pa.table({key: pa.array([k0] * hs.size, kt),
                         "h": pa.array(hs, pa.float64())})

    merged = ds.map_batches(_kmv_partial(key, value, k),
                            batch_format="pyarrow") \
               .groupby(key).map_groups(final_sketch,
                                        batch_format="pyarrow")
    sketches: dict = {}
    n_rows = 0
    for b in merged.iter_batches(batch_format="pyarrow"):
        n_rows += b.num_rows
        if n_rows > gate_rows:
            raise ValueError(
                f"KMV pair sketch table exceeds {gate_rows} rows "
                f"(keys x k); lower k or pre-filter keys")
        for kk, hh in zip(b.column(key).to_pylist(),
                          b.column("h").to_pylist()):
            sketches.setdefault(kk, []).append(hh)
    finals = {}
    for kk, hs in sketches.items():
        hs = np.sort(np.asarray(hs, np.float64))
        if hs.size >= k:
            finals[kk] = (float(hs[k - 1]), hs[:k - 1])
        else:
            finals[kk] = (1.0, hs)
    keys_sorted = sorted(finals)
    s1l, s2l, estl = [], [], []
    for i, a in enumerate(keys_sorted):
        ta, ea = finals[a]
        for b_ in keys_sorted[i + 1:]:
            tb, eb = finals[b_]
            th = min(ta, tb)
            m = np.intersect1d(ea, eb, assume_unique=True)
            m = int((m < th).sum())
            s1l.append(a)
            s2l.append(b_)
            estl.append(round(m / th, 6))
    return pa.table({"s1": pa.array(s1l), "s2": pa.array(s2l),
                     "est_shared": pa.array(estl, pa.float64())})


def distinct_count_exact(ds, key: str, value: str):
    """Exact distinct `value` per `key`: two-stage groupby — distinct
    (key, value) pairs first (the wide step carries only the pair), then a
    native count per key."""
    pairs = ds.select_columns([key, value]) \
              .groupby([key, value]).count()
    out = pairs.groupby(key).count()
    return out.map_batches(
        lambda b: pa.table({key: b.column(key),
                            "n_distinct": b.column("count()").cast(pa.int64())}),
        batch_format="pyarrow")


def _bitlen64(w: np.ndarray) -> np.ndarray:
    """Vectorized bit length of uint64 values — exact (binary-reduction
    shifts, no float log2, whose rounding misclassifies values just
    below a power of two once they exceed 53 bits)."""
    v = w.copy()
    bl = np.zeros(v.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= np.uint64(1 << s)
        bl[m] += s
        v[m] >>= np.uint64(s)
    return bl + (v > 0)


def distinct_count_hll(ds, key: str, value: str, p: int = 12):
    """Per-key HyperLogLog distinct estimate -> (key, estimate)
    [Flajolet et al. 2007], the constant-memory companion to
    :func:`distinct_count_kmv` (KMV keeps k hashes; HLL keeps
    m = 2**p <= 4096 one-byte registers regardless of cardinality — the
    sketch every warehouse ships as approx_count_distinct).

    Distribution shape: the register table is kept SPARSE — each batch
    pre-aggregates to (key, bucket, max rho) rows, a native
    ``groupby(key, bucket).max`` IS the HLL merge (register-wise max is
    associative/commutative, so the estimate is independent of block
    layout), and a final per-key fold of <= m rows applies the
    harmonic-mean estimator with the standard linear-counting
    small-range correction. The raw value column never shuffles; at
    most ``batches x keys x m`` partial rows move.
    """
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)

    def partial(b: pa.Table) -> pa.Table:
        kt = b.schema.field(key).type
        empty = pa.table({key: pa.array([], kt),
                          "bucket": pa.array([], pa.int64()),
                          "rho": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        import pyarrow.compute as pc
        vals = b.column(value).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = _splitmix(vals.astype(np.uint64))
        bucket = (h >> np.uint64(64 - p)).astype(np.int64)
        # low 64-p bits, KEPT right-aligned (mask, not shift): a left
        # shift would leave bitlen(w) p too large and rho p too small,
        # inflating sum(2^-rho) by 2^p once registers saturate past the
        # linear-counting range (~m*ln m) — estimates came out ~2^p low.
        w = h & np.uint64((1 << (64 - p)) - 1)
        rho = (64 - p) - _bitlen64(w) + 1   # w==0 -> 64-p+1 (correct)
        codes = pc.dictionary_encode(b.column(key)).combine_chunks()
        idx = codes.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # per (key, bucket) max rho within the batch
        order = np.lexsort((-rho, bucket, idx))
        gi, bu, rh = idx[order], bucket[order], rho[order]
        first = np.concatenate(
            ([True], (gi[1:] != gi[:-1]) | (bu[1:] != bu[:-1])))
        gi, bu, rh = gi[first], bu[first], rh[first]
        return pa.table({
            key: codes.dictionary.take(pa.array(gi, pa.int64())),
            "bucket": pa.array(bu, pa.int64()),
            "rho": pa.array(rh, pa.int64())})

    from ray.data.aggregate import Max

    regs = ds.select_columns([key, value]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby([key, "bucket"]).aggregate(Max("rho", alias_name="rho"))

    def estimate(g: pa.Table) -> pa.Table:
        kt = g.schema.field(key).type
        if g.num_rows == 0:
            return pa.table({key: pa.array([], kt),
                             "estimate": pa.array([], pa.float64())})
        rho = g.column("rho").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        zeros = m - rho.size            # buckets never hit stay at 0
        denom = zeros + np.power(2.0, -rho.astype(np.float64)).sum()
        est = alpha * m * m / denom
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / float(zeros))   # linear counting
        return pa.table({key: g.column(key).slice(0, 1),
                         "estimate": pa.array([round(float(est), 6)],
                                              pa.float64())})

    return regs.groupby(key).map_groups(estimate, batch_format="pyarrow")


def quantile_sketch(ds, key: str, value: str, qs=(0.5, 0.95),
                    k_per_batch: int = 64):
    """Mergeable per-key approximate quantiles — the scale path for
    events.quantile_agg, whose exact form materializes one whole key
    group per task (fine for bounded keys, impossible for a key with
    10^10 values at 100 TB).

    Sketch: each batch sorts its per-key values once and keeps every
    s-th sorted value (s = ceil(seg/k_per_batch)) with weight = the gap
    to the next kept point, so each key contributes <= k_per_batch
    weighted points per batch and weights sum exactly to the segment
    size. Weighted points are mergeable by concatenation; the final
    per-key estimate is the value at cumulative weight >= q * total.

    Rank-error bound (tested): |est_rank - true_rank| <= sum over
    contributing batches of that batch's stride — with B batches,
    error <= B * ceil(n_max_batch/k) ~= n/k total, i.e. ~1/k relative.
    Returns (key, q DOUBLE, value DOUBLE) like quantile_agg.
    """
    import pyarrow as pa

    def compress(b: pa.Table) -> pa.Table:
        kt = b.schema.field(key).type      # typed empty (hard rule)
        if b.num_rows == 0:
            return pa.table({key: pa.array([], kt),
                             "v": pa.array([], pa.float64()),
                             "w": pa.array([], pa.int64())})
        keys = b.column(key).to_numpy(zero_copy_only=False)
        vals = b.column(value).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        order = np.lexsort((vals, keys))
        keys, vals = keys[order], vals[order]
        starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1])))
        ends = np.append(starts[1:], keys.size)
        out_i, out_w = [], []
        for s, e in zip(starts, ends):       # loop over keys, not rows
            seg = e - s
            stride = -(-seg // k_per_batch)
            idx = np.arange(s, e, stride)
            w = np.diff(np.append(idx, e))
            out_i.append(idx)
            out_w.append(w)
        idx = np.concatenate(out_i)
        return pa.table({key: pa.array(keys[idx]),
                         "v": pa.array(vals[idx], pa.float64()),
                         "w": pa.array(np.concatenate(out_w).astype(
                             np.int64), pa.int64())})

    def estimate(g: pa.Table) -> pa.Table:
        k0 = g.column(key)[0].as_py()
        v = g.column("v").to_numpy(zero_copy_only=False)
        w = g.column("w").to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cw = np.cumsum(w)
        total = cw[-1]
        out_q, out_v = [], []
        for q in qs:
            pos = int(np.searchsorted(cw, q * total, side="left"))
            pos = min(pos, v.size - 1)
            out_q.append(float(q))
            out_v.append(float(v[pos]))
        return pa.table({key: pa.array([k0] * len(qs)),
                         "q": pa.array(out_q, pa.float64()),
                         "value": pa.array(out_v, pa.float64())})

    return ds.select_columns([key, value]) \
        .map_batches(compress, batch_format="pyarrow") \
        .groupby(key).map_groups(estimate, batch_format="pyarrow")


_CMS_W = 65_536      # 2^16 cells per row: cell_r(term) = the r-th 16-bit
_CMS_D = 4           # slice of md5(term) — no extra hash family needed,
# and SQL can re-derive the slices nibble-by-nibble for the oracle


def term_counts_cms(docs, query_terms, w: int = _CMS_W, d: int = _CMS_D,
                    text_col: str = "text"):
    """Count-min sketch of corpus term frequencies [Cormode &
    Muthukrishnan 2005]: estimated total occurrences (cf) for each
    ``query_terms`` entry using w x d bounded counters instead of a
    vocabulary-sized relation — the heavy-hitter companion of the
    distinct-count sketches (point queries OVERESTIMATE only; error
    <= corpus_tokens/w per row, min over d rows).

    Distribution shape: per-batch partials reduce the batch to sparse
    (row, cell) -> count rows over the regex token alphabet
    (``[a-z0-9]+`` len>1 — the SQL-replicable tokenizer); the CMS merge
    IS elementwise sum, i.e. one native groupby(cell).sum; at most
    w x d counter rows exist no matter the corpus size. Deterministic
    given md5, so the DuckDB oracle hash-matches.
    """
    import hashlib

    from ..functions.tokenizer import TOKEN_RE  # [a-zA-Z0-9]+ on lowered
    # text == the [a-z0-9]+ alphabet the SQL oracles use

    def cells_of(term: str) -> list:
        hx = hashlib.md5(term.encode("utf-8")).hexdigest()
        return [int(hx[4 * r:4 * r + 4], 16) % w for r in range(d)]

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"rc": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        terms = []
        for t in b.column(text_col).to_pylist():
            terms.extend(x for x in TOKEN_RE.findall((t or "").lower())
                         if len(x) > 1)
        if not terms:
            return empty
        uterm, cnt = np.unique(np.asarray(terms, object),
                               return_counts=True)
        rcs = np.empty(uterm.size * d, np.int64)
        for i, t in enumerate(uterm):
            for r, c in enumerate(cells_of(t)):
                rcs[i * d + r] = r * w + c
        cnts = np.repeat(cnt.astype(np.int64), d)
        # collapse within-batch collisions
        urc, inv = np.unique(rcs, return_inverse=True)
        summed = np.bincount(inv, weights=cnts).astype(np.int64)
        return pa.table({"rc": pa.array(urc, pa.int64()),
                         "cnt": pa.array(summed, pa.int64())})

    counters: dict = {}
    agg = docs.select_columns([text_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("rc").sum("cnt")
    for b in agg.iter_batches(batch_format="pyarrow"):
        for rc, c in zip(b.column("rc").to_pylist(),
                         b.column("sum(cnt)").to_pylist()):
            counters[int(rc)] = int(c)

    terms_sorted = sorted(set(query_terms))
    ests = [min(counters.get(r * w + c, 0)
                for r, c in enumerate(cells_of(t)))
            for t in terms_sorted]
    return pa.table({"term": pa.array(terms_sorted, pa.string()),
                     "est_count": pa.array(ests, pa.int64())})
