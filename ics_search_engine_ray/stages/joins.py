"""Temporal joins Ray Data lacks natively, as key-co-partitioned
compositions (task brief: "custom operators — as-of join, range join — as a
composition of map_batches + groupby().map_groups if semantics allow").

``asof_join``: for each left row, attach the right row with the greatest
``on`` value <= the left row's ``on`` within the same ``by`` key (inner
semantics — unmatched left rows drop), i.e. DuckDB's
``l ASOF JOIN r ON l.by = r.by AND l.on >= r.on``.

Shape: both inputs are tagged and unioned into one fixed schema (absent
side's columns are typed nulls), hash-co-partitioned on ``by`` into
adaptive groups, and each group resolves matches vectorized — rows sort
once by (by, on) per side, then one ``np.searchsorted`` per by-key segment
(the loop is over distinct keys in the group, not rows; every step inside
is a numpy kernel). Only the needed columns ride the shuffle.

Partitioning assumption: one ``by`` key's rows fit one task — the same
assumption as sessionize, with the same escape hatch wired in (r4
verdict item 8): keys detected hot by the pigeonhole pass route through
a (key, coarse-time-bucket)-salted variant whose per-task rows stay
bounded, re-merged exactly (asof carries a small per-(key, bucket)
last-right relation across bucket boundaries; interval replicates each
right interval into every bucket it overlaps).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa

from .common import adaptive_groups

# ---------------- hot-key (skew) salting machinery ----------------
#
# Mirrors stages/events.py (sessionize): a key holding >= _HOT_BATCH_FRAC
# of the DATASET holds >= it in some batch (pigeonhole), so the per-batch
# candidate scan finds every dataset-hot key with an O(batches/frac)
# driver set; false positives only route a key through the (equally
# correct) salted path.

_HOT_BATCH_FRAC = 0.10
_CARRY_GATE_ROWS = 20_000_000    # asof carry relation: one row per
# (hot key, time bucket WITH right rows) — "hot keys"-class driver state
# (CLAUDE.md). If a fleet of hot keys x fine buckets ever exceeds this,
# the wired knob is salt_secs (coarser buckets shrink it linearly).


def _hot_keys(ds, key: str, frac: float = _HOT_BATCH_FRAC) -> set:
    """Candidate hot key ids via the per-batch pigeonhole scan."""

    def cand(b: pa.Table) -> pa.Table:
        if b.num_rows < int(np.ceil(2 / frac)):
            return pa.table({"u": pa.array([], pa.int64())})
        u = b.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        uu, c = np.unique(u, return_counts=True)
        hot = uu[c >= max(2, int(b.num_rows * frac))]
        return pa.table({"u": pa.array(hot.astype(np.int64), pa.int64())})

    out: set = set()
    for b in ds.select_columns([key]) \
            .map_batches(cand, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        out.update(b.column("u").to_pylist())
    return out


def _split_keys(ds, hot: set, key: str):
    """(rest, hot_only) datasets via one broadcast sorted-array
    membership filter (the hot set is tiny by construction)."""
    import ray

    ref = ray.put(np.array(sorted(hot), np.int64))

    def mk(keep_hot: bool):
        def f(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            harr = ray.get(ref)
            u = b.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.clip(np.searchsorted(harr, u), 0, harr.size - 1)
            ishot = harr[pos] == u
            return b.filter(pa.array(ishot if keep_hot else ~ishot))
        return f

    return (ds.map_batches(mk(False), batch_format="pyarrow"),
            ds.map_batches(mk(True), batch_format="pyarrow"))


def asof_join(left_ds, right_ds, by: str, on: str,
              left_cols: List[str], right_cols: List[str],
              left_prefix: str = "l_", right_prefix: str = "r_",
              num_groups: Optional[int] = None,
              salt_secs: float = 86_400,
              hot_frac: float = _HOT_BATCH_FRAC,
              _force_hot: Optional[set] = None):
    """Returns a Dataset with columns: ``by``, ``{left_prefix}{on}``, the
    prefixed ``left_cols``/``right_cols`` payloads, and ``{right_prefix}{on}``.

    ``on`` must be an ordered numeric/timestamp column; right-side
    (by, on) pairs must be unique for deterministic output (matching the
    ASOF SQL contract).

    Skew: keys flagged by the pigeonhole pass on EITHER side route
    through :func:`_asof_join_salted` — their rows co-partition by
    (key, ``salt_secs`` bucket) so one pathological key spreads across
    tasks; matches that cross a bucket boundary resolve against a small
    per-(key, bucket) last-right carry relation, provably equal to the
    unsalted result (``tests/test_joins.py`` forced-skew test).
    """
    est = left_ds.count() + right_ds.count()
    if num_groups is None:
        num_groups = adaptive_groups(est, 1_000_000, lo=32)
    hot = (_force_hot if _force_hot is not None
           else _hot_keys(left_ds, by, hot_frac)
           | _hot_keys(right_ds, by, hot_frac))
    if not hot:
        return _asof_join_plain(left_ds, right_ds, by, on, left_cols,
                                right_cols, left_prefix, right_prefix,
                                num_groups)
    l_rest, l_hot = _split_keys(left_ds, hot, by)
    r_rest, r_hot = _split_keys(right_ds, hot, by)
    base = _asof_join_plain(l_rest, r_rest, by, on, left_cols, right_cols,
                            left_prefix, right_prefix, num_groups)
    salted = _asof_join_salted(l_hot, r_hot, by, on, left_cols, right_cols,
                               left_prefix, right_prefix, num_groups,
                               max(1, int(round(salt_secs * 1_000_000))))
    return base.union(salted)


def _asof_join_plain(left_ds, right_ds, by: str, on: str,
                     left_cols: List[str], right_cols: List[str],
                     left_prefix: str = "l_", right_prefix: str = "r_",
                     num_groups: Optional[int] = None):
    """Unsalted asof join: each ``by`` key's rows land in ONE task."""
    if num_groups is None:
        est = left_ds.count() + right_ds.count()
        num_groups = adaptive_groups(est, 1_000_000, lo=32)

    l_schema = left_ds.schema().base_schema
    r_schema = right_ds.schema().base_schema
    by_t = l_schema.field(by).type
    on_t = l_schema.field(on).type
    l_types = {c: l_schema.field(c).type for c in left_cols}
    r_types = {c: r_schema.field(c).type for c in right_cols}

    def union_schema() -> pa.Schema:
        fields = [pa.field(by, by_t), pa.field(on, on_t),
                  pa.field("side", pa.int8()),
                  pa.field("gkey", pa.int64())]
        fields += [pa.field(left_prefix + c, l_types[c]) for c in left_cols]
        fields += [pa.field(right_prefix + c, r_types[c]) for c in right_cols]
        return pa.schema(fields)

    u_schema = union_schema()

    def tag(side: int, cols: List[str], prefix: str, types: dict):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            keys = b.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
            g = (keys % num_groups + num_groups) % num_groups
            arrays = [b.column(by), b.column(on),
                      pa.array(np.full(n, side, np.int8), pa.int8()),
                      pa.array(g, pa.int64())]
            for f in list(u_schema)[4:]:
                if f.name.startswith(prefix) and f.name[len(prefix):] in cols:
                    arrays.append(b.column(f.name[len(prefix):]).cast(f.type))
                else:
                    arrays.append(pa.nulls(n, f.type))
            return pa.Table.from_arrays(arrays, schema=u_schema)
        return fn

    tagged = left_ds.select_columns(list(dict.fromkeys([by, on] + left_cols))) \
        .map_batches(tag(0, left_cols, left_prefix, l_types),
                     batch_format="pyarrow") \
        .union(right_ds.select_columns(list(dict.fromkeys([by, on] + right_cols)))
               .map_batches(tag(1, right_cols, right_prefix, r_types),
                            batch_format="pyarrow"))

    out_fields = ([pa.field(by, by_t), pa.field(left_prefix + on, on_t)]
                  + [pa.field(left_prefix + c, l_types[c]) for c in left_cols]
                  + [pa.field(right_prefix + on, on_t)]
                  + [pa.field(right_prefix + c, r_types[c]) for c in right_cols])
    out_schema = pa.schema(out_fields)

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.nulls(0, f.type) for f in out_schema], schema=out_schema)
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        ons = g.column(on).to_numpy(zero_copy_only=False).astype(np.int64)
        is_l = side == 0
        if not is_l.any() or is_l.all():
            return empty
        li = np.flatnonzero(is_l)
        ri = np.flatnonzero(~is_l)
        lo_order = np.lexsort((ons[li], keys[li]))
        ro_order = np.lexsort((ons[ri], keys[ri]))
        li, ri = li[lo_order], ri[ro_order]
        lk, lt = keys[li], ons[li]
        rk, rt = keys[ri], ons[ri]
        # per-key segments; loop over distinct keys, searchsorted per segment
        l_starts = np.flatnonzero(np.concatenate(([True], lk[1:] != lk[:-1])))
        l_ends = np.append(l_starts[1:], lk.size)
        r_starts = np.searchsorted(rk, lk[l_starts], side="left")
        r_ends = np.searchsorted(rk, lk[l_starts], side="right")
        src_l, src_r = [], []
        for s, e, rs, re_ in zip(l_starts, l_ends, r_starts, r_ends):
            if rs == re_:
                continue
            pos = np.searchsorted(rt[rs:re_], lt[s:e], side="right") - 1
            ok = pos >= 0
            if ok.any():
                src_l.append(li[s:e][ok])
                src_r.append(ri[rs + pos[ok]])
        if not src_l:
            return empty
        sl = np.concatenate(src_l)
        sr = np.concatenate(src_r)
        ls = pa.array(sl, pa.int64())
        rs_ = pa.array(sr, pa.int64())
        arrays = [g.column(by).take(ls), g.column(on).take(ls)]
        arrays += [g.column(left_prefix + c).take(ls) for c in left_cols]
        arrays.append(g.column(on).take(rs_))
        arrays += [g.column(right_prefix + c).take(rs_) for c in right_cols]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return tagged.groupby("gkey").map_groups(
        lambda g: resolve(g.drop(["gkey"])), batch_format="pyarrow")


def _asof_join_salted(left_ds, right_ds, by: str, on: str,
                      left_cols: List[str], right_cols: List[str],
                      left_prefix: str, right_prefix: str,
                      num_groups: int, salt_us: int):
    """Asof join for HOT keys: co-partition by (key, ``on`` // salt_us)
    so one key's rows spread across ~buckets tasks.

    A left row whose bucket holds no earlier right row must match the
    LAST right row of the greatest earlier bucket — that per-(key,
    bucket) argmax-``on`` relation (the "carry") is tiny (hot keys x
    buckets-with-right-rows), computed with one partial-then-groupby
    pass, broadcast once via ``ray.put``, and binary-searched inside
    the group resolve. Exactly equal to the unsalted join.
    """
    import ray

    l_schema = left_ds.schema().base_schema
    r_schema = right_ds.schema().base_schema
    by_t = l_schema.field(by).type
    on_t = l_schema.field(on).type
    l_types = {c: l_schema.field(c).type for c in left_cols}
    r_types = {c: r_schema.field(c).type for c in right_cols}

    # ---- stage 1: the carry relation (last right row per (key, bucket))
    carry_schema = pa.schema(
        [pa.field(by, pa.int64()), pa.field("_salt", pa.int64()),
         pa.field(on, on_t)]
        + [pa.field(c, r_types[c]) for c in right_cols])

    def last_per_bucket(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.nulls(0, f.type) for f in carry_schema],
                schema=carry_schema)
        k = b.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        t = b.column(on).cast(pa.int64()).to_numpy(zero_copy_only=False)
        salt = t // salt_us
        order = np.lexsort((t, salt, k))
        ks, ss = k[order], salt[order]
        is_last = np.concatenate(
            ((ks[1:] != ks[:-1]) | (ss[1:] != ss[:-1]), [True]))
        idx = order[is_last]
        ai = pa.array(idx, pa.int64())
        arrays = [pa.array(k[idx], pa.int64()),
                  pa.array(salt[idx], pa.int64()),
                  b.column(on).take(ai)]
        arrays += [b.column(c).cast(r_types[c]).take(ai) for c in right_cols]
        return pa.Table.from_arrays(arrays, schema=carry_schema)

    def keep_last(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g
        t = g.column(on).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return g.take(pa.array([int(np.argmax(t))], pa.int64()))

    parts = []
    n_carry = 0
    for cb in (right_ds
               .select_columns(list(dict.fromkeys([by, on] + right_cols)))
               .map_batches(last_per_bucket, batch_format="pyarrow")
               .groupby([by, "_salt"])
               .map_groups(keep_last, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow")):
        n_carry += cb.num_rows
        if n_carry > _CARRY_GATE_ROWS:
            raise ValueError(
                f"asof carry relation exceeds {_CARRY_GATE_ROWS} rows "
                f"(hot keys x time buckets); raise salt_secs to coarsen "
                f"the buckets — the relation shrinks linearly")
        parts.append(cb)
    carry = (pa.concat_tables(parts).combine_chunks() if parts
             else carry_schema.empty_table())
    ck = carry.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
    cs = carry.column("_salt").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((cs, ck))
    carry = carry.take(pa.array(order, pa.int64()))
    carry_ref = ray.put((ck[order], cs[order], carry))

    # ---- stage 2: (key, bucket)-salted co-partition + group resolve
    fields = [pa.field(by, by_t), pa.field(on, on_t),
              pa.field("side", pa.int8()), pa.field("gkey", pa.int64())]
    fields += [pa.field(left_prefix + c, l_types[c]) for c in left_cols]
    fields += [pa.field(right_prefix + c, r_types[c]) for c in right_cols]
    u_schema = pa.schema(fields)

    def tag(side: int, cols: List[str], prefix: str):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            keys = b.column(by).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            t = b.column(on).cast(pa.int64()).to_numpy(zero_copy_only=False)
            salt = t // salt_us
            g = ((keys * np.int64(1_000_003) + salt) % num_groups
                 + num_groups) % num_groups
            arrays = [b.column(by), b.column(on),
                      pa.array(np.full(n, side, np.int8), pa.int8()),
                      pa.array(g, pa.int64())]
            for f in list(u_schema)[4:]:
                if f.name.startswith(prefix) and f.name[len(prefix):] in cols:
                    arrays.append(b.column(f.name[len(prefix):]).cast(f.type))
                else:
                    arrays.append(pa.nulls(n, f.type))
            return pa.Table.from_arrays(arrays, schema=u_schema)
        return fn

    tagged = left_ds.select_columns(list(dict.fromkeys([by, on] + left_cols))) \
        .map_batches(tag(0, left_cols, left_prefix),
                     batch_format="pyarrow") \
        .union(right_ds.select_columns(
                   list(dict.fromkeys([by, on] + right_cols)))
               .map_batches(tag(1, right_cols, right_prefix),
                            batch_format="pyarrow"))

    out_fields = ([pa.field(by, by_t), pa.field(left_prefix + on, on_t)]
                  + [pa.field(left_prefix + c, l_types[c]) for c in left_cols]
                  + [pa.field(right_prefix + on, on_t)]
                  + [pa.field(right_prefix + c, r_types[c]) for c in right_cols])
    out_schema = pa.schema(out_fields)

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.nulls(0, f.type) for f in out_schema], schema=out_schema)
        if g.num_rows == 0:
            return empty
        ckk, css, ctab = ray.get(carry_ref)
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        ons = g.column(on).cast(pa.int64()).to_numpy(zero_copy_only=False)
        salts = ons // salt_us
        is_l = side == 0
        if not is_l.any():
            return empty
        li = np.flatnonzero(is_l)
        ri = np.flatnonzero(~is_l)
        li = li[np.lexsort((ons[li], salts[li], keys[li]))]
        ri = ri[np.lexsort((ons[ri], salts[ri], keys[ri]))]
        lk, lsal, lt = keys[li], salts[li], ons[li]
        rk, rsal, rt = keys[ri], salts[ri], ons[ri]
        seg = np.concatenate(
            ([True], (lk[1:] != lk[:-1]) | (lsal[1:] != lsal[:-1])))
        l_starts = np.flatnonzero(seg)
        l_ends = np.append(l_starts[1:], lk.size)
        src_l, src_r = [], []            # matched inside the bucket
        car_l, car_c = [], []            # matched via the carry relation
        for s, e in zip(l_starts, l_ends):
            k, sal = lk[s], lsal[s]
            a = np.searchsorted(rk, k, side="left")
            b_ = np.searchsorted(rk, k, side="right")
            a2 = a + np.searchsorted(rsal[a:b_], sal, side="left")
            b2 = a + np.searchsorted(rsal[a:b_], sal, side="right")
            if a2 < b2:
                pos = np.searchsorted(rt[a2:b2], lt[s:e], side="right") - 1
                ok = pos >= 0
                if ok.any():
                    src_l.append(li[s:e][ok])
                    src_r.append(ri[a2 + pos[ok]])
                un = ~ok
            else:
                un = np.ones(e - s, bool)
            if un.any() and ckk.size:
                # last right row of the greatest bucket STRICTLY before
                # sal (every on there < sal*salt_us <= these lefts' on)
                ca = np.searchsorted(ckk, k, side="left")
                cb = np.searchsorted(ckk, k, side="right")
                j = int(np.searchsorted(css[ca:cb], sal, side="left")) - 1
                if j >= 0:
                    car_l.append(li[s:e][un])
                    car_c.append(np.full(int(un.sum()), ca + j, np.int64))
        tabs = []
        if src_l:
            sl = pa.array(np.concatenate(src_l), pa.int64())
            sr = pa.array(np.concatenate(src_r), pa.int64())
            arrays = [g.column(by).take(sl), g.column(on).take(sl)]
            arrays += [g.column(left_prefix + c).take(sl) for c in left_cols]
            arrays.append(g.column(on).take(sr))
            arrays += [g.column(right_prefix + c).take(sr)
                       for c in right_cols]
            tabs.append(pa.Table.from_arrays(arrays, schema=out_schema))
        if car_l:
            sl = pa.array(np.concatenate(car_l), pa.int64())
            sc = pa.array(np.concatenate(car_c), pa.int64())
            arrays = [g.column(by).take(sl), g.column(on).take(sl)]
            arrays += [g.column(left_prefix + c).take(sl) for c in left_cols]
            arrays.append(ctab.column(on).take(sc))
            arrays += [ctab.column(c).take(sc) for c in right_cols]
            tabs.append(pa.Table.from_arrays(arrays, schema=out_schema))
        if not tabs:
            return empty
        return tabs[0] if len(tabs) == 1 else pa.concat_tables(tabs)

    return tagged.groupby("gkey").map_groups(
        lambda g: resolve(g.drop(["gkey"])), batch_format="pyarrow")


_BCAST_JOIN_ROWS = 2_000_000     # small side below this broadcasts whole
"""Size gate for :func:`broadcast_join` (same hard rule as dedup's
``_BCAST_FP_ROWS``: no un-gated driver-side O(corpus) state). Above the
gate callers must use :func:`hash_join` — the error message says so."""


def broadcast_join(left_ds, right, on: str, right_on: Optional[str] = None,
                   join_type: str = "inner",
                   max_rows: int = _BCAST_JOIN_ROWS):
    """Equi-join where the RIGHT side is small: materialize it once, ship it
    to every task via the object store (``ray.put`` once — Ray serializes
    the captured Arrow table into the object store, so every task on a node
    maps the same copy instead of re-shipping it per batch), and join each
    left batch against it with pyarrow's vectorized Acero hash join.

    ``right`` may be a Dataset or a ``pa.Table``. Raises ``ValueError``
    when the small side exceeds ``max_rows`` — the scale path is
    :func:`hash_join` (a real two-sided shuffle), never an unbounded
    driver materialization.

    Only join types that are correct PER LEFT BATCH are accepted
    (inner / left outer / left semi / left anti). Right/full variants
    would emit an unmatched right row once per batch — use
    :func:`hash_join` for those.
    """
    import ray

    if join_type not in ("inner", "left outer", "left semi", "left anti"):
        raise ValueError(
            f"join_type {join_type!r} is not per-batch-safe for a "
            f"broadcast join; use hash_join")

    if isinstance(right, pa.Table):
        r_tbl = right
    else:
        parts = right.to_arrow_refs()
        r_tbl = pa.concat_tables(
            [t for t in ray.get(parts) if t.num_rows] or
            [right.schema().base_schema.empty_table()])
    if r_tbl.num_rows > max_rows:
        raise ValueError(
            f"broadcast_join small side has {r_tbl.num_rows} rows "
            f"(> {max_rows}); use hash_join for large-large joins")
    r_tbl = r_tbl.combine_chunks()
    r_on = right_on or on
    r_ref = ray.put(r_tbl)

    def join_batch(b: pa.Table) -> pa.Table:
        small = ray.get(r_ref)
        # single-threaded inside the task: Ray owns cross-task parallelism
        return b.join(small, keys=on, right_keys=r_on,
                      join_type=join_type, use_threads=False)

    return left_ds.map_batches(join_batch, batch_format="pyarrow")


def hash_join(left_ds, right_ds, on: str, right_on: Optional[str] = None,
              join_type: str = "inner", num_partitions: Optional[int] = None):
    """Large-large equi-join: Ray Data's native hash-partitioned join
    (both sides shuffle on the key; per-partition Arrow hash join inside
    the aggregator actors). This is the scale path when neither side fits
    :func:`broadcast_join`'s gate.

    ``num_partitions`` defaults adaptively from the two input sizes
    (~1M rows per partition), clamped below by the cluster's CPU count
    capped at 16 — each partition is a hash-aggregator ACTOR, and a
    pipeline chaining two joins with more aggregators than CPUs
    deadlocks on actor scheduling (reproduced at 4 CPUs x 2x16
    aggregators). Partition count still grows with data size.
    """
    if num_partitions is None:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 16)) \
            if ray.is_initialized() else 16
        est = left_ds.count() + right_ds.count()
        num_partitions = adaptive_groups(
            est, 1_000_000, lo=max(2, min(16, cpus // 2)))
    # `on` / `right_on` accept a single column name or a sequence of
    # names (composite-key equi-join, e.g. exact (u, v) edge-pair
    # membership where packing two 64-bit ids into one key would be lossy)
    on_t = (on,) if isinstance(on, str) else tuple(on)
    if right_on is None:
        right_t = on_t
    else:
        right_t = (right_on,) if isinstance(right_on, str) \
            else tuple(right_on)
    return left_ds.join(right_ds, join_type=join_type,
                        num_partitions=num_partitions,
                        on=on_t, right_on=right_t)


def skew_join(left_ds, right_ds, on: str, right_on: Optional[str] = None,
              num_partitions: Optional[int] = None, salt: int = 8,
              hot_keys=None, hot_ppm: int = 10_000):
    """Skew-resistant inner equi-join: hot keys are salted so one
    pathological key spreads over ``salt`` partitions instead of sinking
    a single join task — the standard fix for power-law join keys (one
    crawl domain, one null-ish sentinel id) at 100 TB.

    Plan: detect hot LEFT keys (>= ``hot_ppm``/1e6 of some batch — the
    same pigeonhole guarantee as heavy_hitters, so detection is one
    streaming pass and the driver holds only the hot-key set); cold rows
    take the plain native hash join; hot left rows get a per-row salt and
    the matching right rows replicate ``salt`` times, joining on
    (key, salt). Results union — identical rows to an unsalted join,
    tested in tests/test_relational.py.

    ``hot_keys`` (iterable of ints) skips detection. Integer keys only.
    """
    import ray

    r_on = right_on or on
    if num_partitions is None:
        est = left_ds.count() + right_ds.count()
        num_partitions = adaptive_groups(est, 1_000_000, lo=16)

    if hot_keys is None:
        def local_hot(b: pa.Table) -> pa.Table:
            k = b.column(on).to_numpy(zero_copy_only=False)
            if k.size == 0:
                return pa.table({"k": pa.array([], pa.int64())})
            uk, cnt = np.unique(k, return_counts=True)
            keep = cnt.astype(np.int64) * 1_000_000 >= hot_ppm * k.size
            return pa.table({"k": pa.array(uk[keep].astype(np.int64),
                                           pa.int64())})

        hot_keys = sorted({r["k"] for r in left_ds.select_columns([on])
                          .map_batches(local_hot, batch_format="pyarrow")
                          .take_all()})
    hot = np.asarray(sorted(hot_keys), np.int64)
    if hot.size == 0:
        return hash_join(left_ds, right_ds, on=on, right_on=r_on,
                         num_partitions=num_partitions)
    hot_ref = ray.put(hot)

    def is_hot(b: pa.Table, col: str) -> np.ndarray:
        h = ray.get(hot_ref)
        k = b.column(col).to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(h, k), 0, h.size - 1)
        return h[pos] == k

    def split(col, want_hot, add_salt=None):
        def fn(b: pa.Table) -> pa.Table:
            m = is_hot(b, col)
            t = b.filter(pa.array(m if want_hot else ~m))
            if add_salt == "row":        # left: spread rows over salts
                s = np.arange(t.num_rows, dtype=np.int64) % salt
                t = t.append_column("_salt", pa.array(s, pa.int64()))
            elif add_salt == "replicate":  # right: one copy per salt
                idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), salt)
                t = t.take(pa.array(idx, pa.int64()))
                s = np.tile(np.arange(salt, dtype=np.int64), t.num_rows
                            // salt if salt else 0)
                t = t.append_column("_salt", pa.array(s, pa.int64()))
            return t
        return fn

    cold = hash_join(
        left_ds.map_batches(split(on, False), batch_format="pyarrow"),
        right_ds.map_batches(split(r_on, False), batch_format="pyarrow"),
        on=on, right_on=r_on, num_partitions=num_partitions)
    hot_l = left_ds.map_batches(split(on, True, "row"),
                                batch_format="pyarrow")
    hot_r = right_ds.map_batches(split(r_on, True, "replicate"),
                                 batch_format="pyarrow")
    hot_j = hot_l.join(hot_r, join_type="inner",
                       num_partitions=num_partitions,
                       on=(on, "_salt"), right_on=(r_on, "_salt"),
                       left_suffix="", right_suffix="_r") \
        .drop_columns(["_salt"])
    return cold.union(hot_j)


def interval_join(left_ds, right_ds, by: str, on: str, lo: str, hi: str,
                  left_cols: List[str], right_cols: List[str],
                  left_prefix: str = "l_", right_prefix: str = "r_",
                  num_groups: Optional[int] = None,
                  salt_secs: float = 86_400,
                  hot_frac: float = _HOT_BATCH_FRAC,
                  _force_hot: Optional[set] = None):
    """Range join: every (left, right) pair with the same ``by`` key and
    ``right.lo <= left.on <= right.hi`` — i.e. SQL
    ``l JOIN r ON l.by = r.by AND l.on BETWEEN r.lo AND r.hi``.

    Same co-partitioned shape as :func:`asof_join`, including the skew
    hatch: pigeonhole-hot keys route through
    :func:`_interval_join_salted` — left rows bucket by ``on`` //
    ``salt_secs``, each right interval replicates into every bucket it
    overlaps (its span / salt_secs copies; pick salt_secs >= the typical
    interval length so that factor stays ~2), and each (left, right)
    pair meets in exactly one bucket — provably equal to the unsalted
    join (``tests/test_joins.py`` forced-skew test).
    """
    est = left_ds.count() + right_ds.count()
    if num_groups is None:
        num_groups = adaptive_groups(est, 1_000_000, lo=32)
    hot = (_force_hot if _force_hot is not None
           else _hot_keys(left_ds, by, hot_frac)
           | _hot_keys(right_ds, by, hot_frac))
    if not hot:
        return _interval_join_plain(left_ds, right_ds, by, on, lo, hi,
                                    left_cols, right_cols, left_prefix,
                                    right_prefix, num_groups)
    l_rest, l_hot = _split_keys(left_ds, hot, by)
    r_rest, r_hot = _split_keys(right_ds, hot, by)
    base = _interval_join_plain(l_rest, r_rest, by, on, lo, hi, left_cols,
                                right_cols, left_prefix, right_prefix,
                                num_groups)
    salted = _interval_join_salted(l_hot, r_hot, by, on, lo, hi, left_cols,
                                   right_cols, left_prefix, right_prefix,
                                   num_groups,
                                   max(1, int(round(salt_secs * 1_000_000))))
    return base.union(salted)


def _interval_join_plain(left_ds, right_ds, by: str, on: str, lo: str,
                         hi: str, left_cols: List[str],
                         right_cols: List[str],
                         left_prefix: str = "l_", right_prefix: str = "r_",
                         num_groups: Optional[int] = None):
    """Unsalted range join: each ``by`` key's rows land in ONE task.
    Inside a group, each key segment builds its candidate set with one
    repeat x tile + mask (per-key work is points x intervals)."""
    if num_groups is None:
        est = left_ds.count() + right_ds.count()
        num_groups = adaptive_groups(est, 1_000_000, lo=32)

    l_schema = left_ds.schema().base_schema
    r_schema = right_ds.schema().base_schema
    by_t = l_schema.field(by).type
    on_t = l_schema.field(on).type
    l_types = {c: l_schema.field(c).type for c in left_cols}
    r_types = {c: r_schema.field(c).type for c in right_cols}
    bound_t = r_schema.field(lo).type

    fields = [pa.field(by, by_t), pa.field("pos", on_t),
              pa.field("hi", bound_t),
              pa.field("side", pa.int8()), pa.field("gkey", pa.int64())]
    fields += [pa.field(left_prefix + c, l_types[c]) for c in left_cols]
    fields += [pa.field(right_prefix + c, r_types[c]) for c in right_cols]
    u_schema = pa.schema(fields)

    def tag(side: int, cols: List[str], prefix: str, pos_col: str,
            hi_col: Optional[str]):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            keys = b.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
            g = (keys % num_groups + num_groups) % num_groups
            arrays = [b.column(by), b.column(pos_col).cast(on_t)]
            arrays.append(b.column(hi_col).cast(bound_t) if hi_col
                          else pa.nulls(n, bound_t))
            arrays += [pa.array(np.full(n, side, np.int8), pa.int8()),
                       pa.array(g, pa.int64())]
            for f in list(u_schema)[5:]:
                if f.name.startswith(prefix) and f.name[len(prefix):] in cols:
                    arrays.append(b.column(f.name[len(prefix):]).cast(f.type))
                else:
                    arrays.append(pa.nulls(n, f.type))
            return pa.Table.from_arrays(arrays, schema=u_schema)
        return fn

    tagged = left_ds.select_columns(list(dict.fromkeys([by, on] + left_cols))) \
        .map_batches(tag(0, left_cols, left_prefix, on, None),
                     batch_format="pyarrow") \
        .union(right_ds.select_columns(
                   list(dict.fromkeys([by, lo, hi] + right_cols)))
               .map_batches(tag(1, right_cols, right_prefix, lo, hi),
                            batch_format="pyarrow"))

    out_fields = ([pa.field(by, by_t), pa.field(left_prefix + on, on_t)]
                  + [pa.field(left_prefix + c, l_types[c]) for c in left_cols]
                  + [pa.field(right_prefix + lo, on_t),
                     pa.field(right_prefix + hi, bound_t)]
                  + [pa.field(right_prefix + c, r_types[c]) for c in right_cols])
    out_schema = pa.schema(out_fields)

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.nulls(0, f.type) for f in out_schema], schema=out_schema)
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        pos = g.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
        is_l = side == 0
        if not is_l.any() or is_l.all():
            return empty
        his = g.column("hi").to_numpy(zero_copy_only=False)
        li = np.flatnonzero(is_l)[np.lexsort((pos[is_l], keys[is_l]))]
        ri = np.flatnonzero(~is_l)[np.lexsort((pos[~is_l], keys[~is_l]))]
        lk, rk = keys[li], keys[ri]
        l_starts = np.flatnonzero(np.concatenate(([True], lk[1:] != lk[:-1])))
        l_ends = np.append(l_starts[1:], lk.size)
        r_starts = np.searchsorted(rk, lk[l_starts], side="left")
        r_ends = np.searchsorted(rk, lk[l_starts], side="right")
        src_l, src_r = [], []
        for s, e, rs, re_ in zip(l_starts, l_ends, r_starts, r_ends):
            if rs == re_:
                continue
            pl = li[s:e]
            pr = ri[rs:re_]
            ii = np.repeat(pl, pr.size)
            jj = np.tile(pr, pl.size)
            m = (pos[jj] <= pos[ii]) & (pos[ii] <= his[jj].astype(np.int64))
            if m.any():
                src_l.append(ii[m])
                src_r.append(jj[m])
        if not src_l:
            return empty
        ls = pa.array(np.concatenate(src_l), pa.int64())
        rs_ = pa.array(np.concatenate(src_r), pa.int64())
        arrays = [g.column(by).take(ls), g.column("pos").take(ls)]
        arrays += [g.column(left_prefix + c).take(ls) for c in left_cols]
        arrays += [g.column("pos").take(rs_), g.column("hi").take(rs_)]
        arrays += [g.column(right_prefix + c).take(rs_) for c in right_cols]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return tagged.groupby("gkey").map_groups(
        lambda g: resolve(g.drop(["gkey"])), batch_format="pyarrow")


def _interval_join_salted(left_ds, right_ds, by: str, on: str, lo: str,
                          hi: str, left_cols: List[str],
                          right_cols: List[str], left_prefix: str,
                          right_prefix: str, num_groups: int, salt_us: int):
    """Range join for HOT keys: left rows co-partition by (key,
    ``on`` // salt_us); each right interval replicates into every bucket
    in [lo // salt_us, hi // salt_us] (bounded copies when salt_us is at
    least the typical interval span). A qualifying (left, right) pair
    meets in exactly the left row's bucket — no duplicates, no misses —
    so the result equals the unsalted join.
    """
    l_schema = left_ds.schema().base_schema
    r_schema = right_ds.schema().base_schema
    by_t = l_schema.field(by).type
    on_t = l_schema.field(on).type
    l_types = {c: l_schema.field(c).type for c in left_cols}
    r_types = {c: r_schema.field(c).type for c in right_cols}
    bound_t = r_schema.field(lo).type

    fields = [pa.field(by, by_t), pa.field("pos", on_t),
              pa.field("hi", bound_t), pa.field("_salt", pa.int64()),
              pa.field("side", pa.int8()), pa.field("gkey", pa.int64())]
    fields += [pa.field(left_prefix + c, l_types[c]) for c in left_cols]
    fields += [pa.field(right_prefix + c, r_types[c]) for c in right_cols]
    u_schema = pa.schema(fields)

    def payload(b: pa.Table, idx: Optional[pa.Array], prefix: str,
                cols: List[str]):
        out = []
        for f in list(u_schema)[6:]:
            if f.name.startswith(prefix) and f.name[len(prefix):] in cols:
                col = b.column(f.name[len(prefix):]).cast(f.type)
                out.append(col if idx is None else col.take(idx))
            else:
                n = b.num_rows if idx is None else len(idx)
                out.append(pa.nulls(n, f.type))
        return out

    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        keys = b.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        t = b.column(on).cast(pa.int64()).to_numpy(zero_copy_only=False)
        salt = t // salt_us
        g = ((keys * np.int64(1_000_003) + salt) % num_groups
             + num_groups) % num_groups
        arrays = [b.column(by), b.column(on).cast(on_t),
                  pa.nulls(n, bound_t),
                  pa.array(salt, pa.int64()),
                  pa.array(np.full(n, 0, np.int8), pa.int8()),
                  pa.array(g, pa.int64())]
        arrays += payload(b, None, left_prefix, left_cols)
        return pa.Table.from_arrays(arrays, schema=u_schema)

    def tag_right(b: pa.Table) -> pa.Table:
        keys = b.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        lov = b.column(lo).cast(pa.int64()).to_numpy(zero_copy_only=False)
        hiv = b.column(hi).cast(pa.int64()).to_numpy(zero_copy_only=False)
        valid = hiv >= lov                  # empty intervals match nothing
        s0, s1 = lov // salt_us, hiv // salt_us
        cnt = np.where(valid, s1 - s0 + 1, 0)
        total = int(cnt.sum())
        idx = np.repeat(np.arange(b.num_rows), cnt)
        offs = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        salts = s0[idx] + offs
        g = ((keys[idx] * np.int64(1_000_003) + salts) % num_groups
             + num_groups) % num_groups
        ai = pa.array(idx, pa.int64())
        arrays = [b.column(by).take(ai),
                  b.column(lo).cast(on_t).take(ai),
                  b.column(hi).cast(bound_t).take(ai),
                  pa.array(salts, pa.int64()),
                  pa.array(np.full(total, 1, np.int8), pa.int8()),
                  pa.array(g, pa.int64())]
        arrays += payload(b, ai, right_prefix, right_cols)
        return pa.Table.from_arrays(arrays, schema=u_schema)

    tagged = left_ds.select_columns(list(dict.fromkeys([by, on] + left_cols))) \
        .map_batches(tag_left, batch_format="pyarrow") \
        .union(right_ds.select_columns(
                   list(dict.fromkeys([by, lo, hi] + right_cols)))
               .map_batches(tag_right, batch_format="pyarrow"))

    out_fields = ([pa.field(by, by_t), pa.field(left_prefix + on, on_t)]
                  + [pa.field(left_prefix + c, l_types[c]) for c in left_cols]
                  + [pa.field(right_prefix + lo, on_t),
                     pa.field(right_prefix + hi, bound_t)]
                  + [pa.field(right_prefix + c, r_types[c]) for c in right_cols])
    out_schema = pa.schema(out_fields)

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.nulls(0, f.type) for f in out_schema], schema=out_schema)
        side = g.column("side").to_numpy(zero_copy_only=False)
        keys = g.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        pos = g.column("pos").cast(pa.int64()).to_numpy(zero_copy_only=False)
        salts = g.column("_salt").to_numpy(zero_copy_only=False)
        is_l = side == 0
        if not is_l.any() or is_l.all():
            return empty
        his = g.column("hi").to_numpy(zero_copy_only=False)
        li = np.flatnonzero(is_l)
        ri = np.flatnonzero(~is_l)
        li = li[np.lexsort((pos[li], salts[li], keys[li]))]
        ri = ri[np.lexsort((pos[ri], salts[ri], keys[ri]))]
        lk, lsal = keys[li], salts[li]
        rk, rsal = keys[ri], salts[ri]
        seg = np.concatenate(
            ([True], (lk[1:] != lk[:-1]) | (lsal[1:] != lsal[:-1])))
        l_starts = np.flatnonzero(seg)
        l_ends = np.append(l_starts[1:], lk.size)
        src_l, src_r = [], []
        for s, e in zip(l_starts, l_ends):
            k, sal = lk[s], lsal[s]
            a = np.searchsorted(rk, k, side="left")
            b_ = np.searchsorted(rk, k, side="right")
            a2 = a + np.searchsorted(rsal[a:b_], sal, side="left")
            b2 = a + np.searchsorted(rsal[a:b_], sal, side="right")
            if a2 >= b2:
                continue
            pl = li[s:e]
            pr = ri[a2:b2]
            ii = np.repeat(pl, pr.size)
            jj = np.tile(pr, pl.size)
            m = (pos[jj] <= pos[ii]) & (pos[ii] <= his[jj].astype(np.int64))
            if m.any():
                src_l.append(ii[m])
                src_r.append(jj[m])
        if not src_l:
            return empty
        ls = pa.array(np.concatenate(src_l), pa.int64())
        rs_ = pa.array(np.concatenate(src_r), pa.int64())
        arrays = [g.column(by).take(ls), g.column("pos").take(ls)]
        arrays += [g.column(left_prefix + c).take(ls) for c in left_cols]
        arrays += [g.column("pos").take(rs_), g.column("hi").take(rs_)]
        arrays += [g.column(right_prefix + c).take(rs_) for c in right_cols]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return tagged.groupby("gkey").map_groups(
        lambda g: resolve(g.drop(["gkey"])), batch_format="pyarrow")


def _keys_membership_join(left_ds, keys_src, on: str,
                          right_on: Optional[str], keep_matches: bool,
                          max_bcast_rows: int):
    """Shared engine for :func:`semi_join` (keep members) and
    :func:`anti_join_keys` (keep non-members): the right side collapses
    to DISTINCT keys with a native groupby; under the gate the key set
    ships once and each left batch runs Arrow 'left semi'/'left anti'
    locally (zero left shuffle); above it left rows and keys
    co-partition by key hash into adaptive groups (the asof_join
    tagged-union shape — a native keyed join here trips Arrow's
    schema-less-empty-partition failure when key cardinality <<
    partitions) and each group resolves with one vectorized ``np.isin``
    (complemented for anti). Integer keys only on the hash path."""
    r_on = right_on or on
    keys = (keys_src.select_columns([r_on]).groupby(r_on).count()
            .select_columns([r_on]).materialize())   # consumed twice below
    n_keys = keys.count()
    if n_keys <= max_bcast_rows:
        return broadcast_join(
            left_ds, keys, on=on, right_on=r_on,
            join_type="left semi" if keep_matches else "left anti",
            max_rows=max_bcast_rows)

    l_schema = left_ds.schema().base_schema
    u_schema = pa.schema([pa.field("_side", pa.int8()),
                          pa.field("_g", pa.int64())]
                         + [pa.field(f.name, f.type) for f in l_schema])
    num_groups = adaptive_groups(left_ds.count() + n_keys, 1_000_000,
                                 lo=32)

    def tag(side: int, key_col: str):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            k = b.column(key_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            g = (k % num_groups + num_groups) % num_groups
            arrays = [pa.array(np.full(n, side, np.int8), pa.int8()),
                      pa.array(g, pa.int64())]
            for f in l_schema:
                if side == 1:
                    arrays.append(b.column(key_col).cast(f.type)
                                  if f.name == on else pa.nulls(n, f.type))
                else:
                    arrays.append(b.column(f.name))
            return pa.Table.from_arrays(arrays, schema=u_schema)
        return fn

    tagged = left_ds.map_batches(tag(0, on), batch_format="pyarrow") \
        .union(keys.map_batches(tag(1, r_on), batch_format="pyarrow"))

    def resolve(g: pa.Table) -> pa.Table:
        side = g.column("_side").to_numpy(zero_copy_only=False)
        k = g.column(on).to_numpy(zero_copy_only=False)
        member = np.unique(k[side == 1])
        is_member = np.isin(k, member)
        want = is_member if keep_matches else ~is_member
        li = np.flatnonzero((side == 0) & want)
        return g.drop(["_side", "_g"]).take(pa.array(li, pa.int64()))

    return tagged.groupby("_g").map_groups(resolve, batch_format="pyarrow")


def semi_join(left_ds, right_ds, on: str, right_on: Optional[str] = None,
              max_bcast_rows: int = _BCAST_JOIN_ROWS):
    """EXISTS semi-join: left rows whose key appears at least once on the
    right, each emitted ONCE regardless of right multiplicity (TPC-H Q4's
    shape: orders having any qualifying lineitem). Physical plan in
    :func:`_keys_membership_join`."""
    return _keys_membership_join(left_ds, right_ds, on, right_on,
                                 keep_matches=True,
                                 max_bcast_rows=max_bcast_rows)


def anti_join_keys(left_ds, keys_ds, on: str, right_on: Optional[str] = None,
                   max_bcast_rows: int = _BCAST_JOIN_ROWS):
    """NOT-EXISTS anti-join against a key relation: left rows whose key
    appears NOWHERE on the right (the complement of :func:`semi_join`,
    same physical plan — see :func:`_keys_membership_join`)."""
    return _keys_membership_join(left_ds, keys_ds, on, right_on,
                                 keep_matches=False,
                                 max_bcast_rows=max_bcast_rows)
