"""Event-stream batch operators: tumbling-window aggregation and
sessionization (the "windowed aggregate" class of custom operators the task
brief calls out — Ray Data has no native window primitive, so both are
expressed as key-partitioned compositions, per the documented pattern:
map_batches window assignment + groupby for tumbling windows; coarse-keyed
groupby + vectorized run detection for sessions).

Partitioning assumptions (documented per brief):
- tumbling windows are a pure function of the row -> embarrassingly
  parallel; the groupby key (window, type) is low-cardinality and safe;
- sessionization requires co-locating each user's events; the shuffle key
  is ``user_id % G`` (G coarse groups bound the per-call Python overhead;
  all real work is vectorized run detection over the sorted group). Skewed
  single users stay within one group — salt by day first if one user can
  exceed a worker's memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# module-level: referenced from worker-side kernels (by-value-pickled
# closures must not trigger runtime relative imports on workers)
from .common import half_away_scaled_int, round_half_away


# ---------------- hot-key (skew) salting machinery ----------------
#
# The single-key operators below (sessionize / user_running / funnel /
# event_transitions) co-locate each user's events in one task. One
# pathological user (a bot, a null-ish sentinel id) would sink a single
# worker at 100x scale — the documented escape hatch (r3 verdict item 5):
# detect hot users with the skew_join pigeonhole pattern, salt their
# events by time (day) so per-task rows stay bounded, and re-merge the
# per-salt partials exactly.

_HOT_BATCH_FRAC = 0.10           # a user holding >= this fraction of the
                                 # DATASET holds >= it in some batch
_SALT_US = 86_400 * 1_000_000    # day salt


def _hot_users(events, frac: float = _HOT_BATCH_FRAC,
               key: str = "user_id"):
    """Candidate hot user ids (pigeonhole, the stages/joins.py skew_join
    pattern): per batch, users holding >= ``frac`` of the batch's rows.
    The driver union is O(batches / frac) ids, never the user universe;
    a false positive only routes a user through the (equally correct)
    salted path."""

    def cand(b: pa.Table) -> pa.Table:
        # tiny tail blocks can't witness dataset-level heat: below
        # ~1/frac rows the max(2, ...) floor would flag any user with two
        # co-located events, ballooning the "O(hot keys)" driver set
        if b.num_rows < int(np.ceil(2 / frac)):
            return pa.table({"u": pa.array([], pa.int64())})
        u = b.column(key).to_numpy(zero_copy_only=False)
        uu, c = np.unique(u, return_counts=True)
        hot = uu[c >= max(2, int(b.num_rows * frac))]
        return pa.table({"u": pa.array(hot.astype(np.int64), pa.int64())})

    hot = set()
    for b in events.select_columns([key]) \
            .map_batches(cand, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        hot.update(b.column("u").to_pylist())
    return hot


def _split_hot(events, hot, key: str = "user_id"):
    """(rest, hot_only) datasets via one broadcast sorted-array
    membership filter (the hot set is tiny by construction)."""
    import ray

    ref = ray.put(np.array(sorted(hot), np.int64))

    def mk(keep_hot: bool):
        def f(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            harr = ray.get(ref)
            u = b.column(key).to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(harr, u), 0, harr.size - 1)
            ishot = harr[pos] == u
            return b.filter(pa.array(ishot if keep_hot else ~ishot))
        return f

    return (events.map_batches(mk(False), batch_format="pyarrow"),
            events.map_batches(mk(True), batch_format="pyarrow"))


def _salt_gkey(b: pa.Table, num_groups: int, salt_us: int,
               key: str = "user_id", ts_col: str = "ts") -> pa.Table:
    """(user, day-salt) co-location key + the salt itself."""
    u = b.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
    ts = b.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
    salt = ts // salt_us
    g = ((u * np.int64(1_000_003) + salt) % num_groups
         + num_groups) % num_groups
    out = b.append_column("_salt", pa.array(salt, pa.int64()))
    return out.append_column("_g", pa.array(g, pa.int64()))


def tumbling_window_agg(events, window_secs: int = 3600):
    """events(ts, event_type, value) -> per (window_start, event_type):
    n_events + sum_value (rounded 1e-6). Tumbling (non-overlapping) windows
    aligned to the epoch."""
    from ray.data.aggregate import Count, Sum

    us = int(window_secs) * 1_000_000

    def add_window(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (ts // us) * us
        return pa.table({
            "window_us": pa.array(w, pa.int64()),
            "event_type": b.column("event_type"),
            "value": b.column("value"),
        })

    agg = (events.select_columns(["ts", "event_type", "value"])
           .map_batches(add_window, batch_format="pyarrow")
           .groupby(["window_us", "event_type"])
           .aggregate(Count(), Sum("value")))

    def finish(b: pa.Table) -> pa.Table:
        sv = b.column("sum(value)").to_numpy(zero_copy_only=False)
        return pa.table({
            "window_start": b.column("window_us").cast(pa.timestamp("us")),
            "event_type": b.column("event_type"),
            "n_events": b.column("count()").cast(pa.int64()),
            "sum_value": pa.array(np.round(sv, 6), pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def sessionize(events, gap_secs: int = 1800, num_groups: int = None,
               hot_frac: float = _HOT_BATCH_FRAC,
               salt_secs: int = 86_400):
    """events(event_id, ts, user_id, value) -> one row per session:
    (user_id, session_start, n_events, sum_value).

    A session is a maximal run of a user's events (ordered by ts, event_id)
    whose consecutive gaps are <= gap_secs. Stateful only WITHIN a user:
    groupby co-locates each user's events, then run detection is one
    vectorized pass per coarse group. The coarse-group count scales with the
    event count (one group materializes per task) unless pinned.

    Skew: users detected hot by the pigeonhole pass (>= ``hot_frac`` of
    some batch) route through :func:`_sessionize_salted` — their events
    salt by (user, day) so per-task rows stay bounded; per-salt partial
    sessions (with raw sums and end timestamps) re-merge exactly across
    salt boundaries in a second, sessions-sized groupby.
    """
    from .common import adaptive_groups

    if num_groups is None:
        # event rows are ~32 B; target ~1M rows per run-detection group
        num_groups = adaptive_groups(events.count(), 1_000_000, lo=64)
    gap_us = int(gap_secs) * 1_000_000

    def add_gkey(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column("_g", pa.array(u % num_groups, pa.int64()))

    def sessions(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "session_start": pa.array([], pa.timestamp("us")),
            "n_events": pa.array([], pa.int64()),
            "sum_value": pa.array([], pa.float64()),
        })
        n = g.num_rows
        if n == 0:
            return empty
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        val = g.column("value").to_numpy(zero_copy_only=False)
        new_sess = np.empty(n, dtype=bool)
        new_sess[0] = True
        new_sess[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        sid = np.cumsum(new_sess) - 1
        counts = np.bincount(sid)
        sums = np.bincount(sid, weights=val)
        starts = np.flatnonzero(new_sess)
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "session_start": pa.array(ts[starts], pa.int64()).cast(pa.timestamp("us")),
            "n_events": pa.array(counts, pa.int64()),
            "sum_value": pa.array(np.round(sums, 6), pa.float64()),
        })

    src = events.select_columns(["event_id", "ts", "user_id", "value"])
    hot = _hot_users(src, hot_frac)
    if not hot:
        return (src.map_batches(add_gkey, batch_format="pyarrow")
                .groupby("_g")
                .map_groups(lambda g: sessions(g.drop(["_g"])),
                            batch_format="pyarrow"))
    rest, hotds = _split_hot(src, hot)
    base = (rest.map_batches(add_gkey, batch_format="pyarrow")
            .groupby("_g")
            .map_groups(lambda g: sessions(g.drop(["_g"])),
                        batch_format="pyarrow"))
    salted = _sessionize_salted(hotds, gap_us,
                                int(salt_secs) * 1_000_000, num_groups)
    return base.union(salted)


def _sessionize_salted(hotds, gap_us: int, salt_us: int, num_groups: int):
    """Salted sessionize for hot users: stage 1 groups by (user, day)
    and emits PARTIAL sessions (start, end, n, raw sum) with runs broken
    at user / salt / gap boundaries; stage 2 groups the partial-session
    relation (O(sessions), a gap-fold smaller than the event volume) by
    user and chain-merges consecutive partials whose boundary gap is
    <= gap_us — exact, because partials within a salt are maximal and a
    merged chain's end is always the last partial's end."""
    from .common import adaptive_groups

    def parts(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "start_us": pa.array([], pa.int64()),
            "end_us": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "vsum": pa.array([], pa.float64()),
        })
        n = g.num_rows
        if n == 0:
            return empty
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        salt = g.column("_salt").to_numpy(zero_copy_only=False)
        val = g.column("value").to_numpy(zero_copy_only=False)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = ((uid[1:] != uid[:-1]) | (salt[1:] != salt[:-1])
                   | ((ts[1:] - ts[:-1]) > gap_us))
        sid = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n) - 1
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "start_us": pa.array(ts[starts], pa.int64()),
            "end_us": pa.array(ts[ends], pa.int64()),
            "n": pa.array(np.bincount(sid), pa.int64()),
            "vsum": pa.array(np.bincount(sid, weights=val), pa.float64()),
        })

    partial = hotds.map_batches(
        lambda b: _salt_gkey(b, num_groups, salt_us),
        batch_format="pyarrow") \
        .groupby("_g") \
        .map_groups(lambda g: parts(g.drop(["_g"])),
                    batch_format="pyarrow") \
        .materialize()            # count() + merge stage: run stage 1 once

    merge_groups = adaptive_groups(max(partial.count(), 1), 1_000_000,
                                   lo=16)

    def add_ukey(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "_g", pa.array((u % merge_groups + merge_groups) % merge_groups,
                           pa.int64()))

    def merge(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "session_start": pa.array([], pa.timestamp("us")),
            "n_events": pa.array([], pa.int64()),
            "sum_value": pa.array([], pa.float64()),
        })
        n = g.num_rows
        if n == 0:
            return empty
        g = g.sort_by([("user_id", "ascending"), ("start_us", "ascending")])
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        s = g.column("start_us").to_numpy(zero_copy_only=False)
        e = g.column("end_us").to_numpy(zero_copy_only=False)
        cnt = g.column("n").to_numpy(zero_copy_only=False)
        vs = g.column("vsum").to_numpy(zero_copy_only=False)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (uid[1:] != uid[:-1]) | ((s[1:] - e[:-1]) > gap_us)
        sid = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "session_start": pa.array(s[starts], pa.int64())
            .cast(pa.timestamp("us")),
            "n_events": pa.array(np.bincount(sid, weights=cnt)
                                 .astype(np.int64), pa.int64()),
            "sum_value": pa.array(
                np.round(np.bincount(sid, weights=vs), 6), pa.float64()),
        })

    return partial.map_batches(add_ukey, batch_format="pyarrow") \
        .groupby("_g") \
        .map_groups(lambda g: merge(g.drop(["_g"])),
                    batch_format="pyarrow")


def sliding_window_agg(events, window_secs: int = 3600, slide_secs: int = 900):
    """events(ts, event_type, value) -> per (window_start, event_type):
    n_events + sum_value over SLIDING windows of length ``window_secs``
    advancing every ``slide_secs``.

    Each event fans out to the ceil(window/slide) windows containing it — a
    pure per-row map (replication factor = window/slide), then the same
    low-cardinality groupby as the tumbling case. No ordering or state
    needed: the window membership is a function of the row.
    """
    from ray.data.aggregate import Count, Sum

    w_us = int(window_secs) * 1_000_000
    s_us = int(slide_secs) * 1_000_000
    nw = -(-w_us // s_us)                       # ceil(window / slide)

    def fan_out(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            # explicit types: pa.array over an empty object array would
            # infer a null-typed column and poison the block schema
            return pa.table({"window_us": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "value": pa.array([], pa.float64())})
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        val = b.column("value").to_numpy(zero_copy_only=False)
        base = ts // s_us
        n = ts.size
        rep = np.repeat(np.arange(n), nw)
        i = np.tile(np.arange(nw, dtype=np.int64), n)
        win = (base[rep] - i) * s_us
        keep = ts[rep] < win + w_us             # true window membership
        return pa.table({
            "window_us": pa.array(win[keep], pa.int64()),
            "event_type": pa.array(et[rep][keep]),
            "value": pa.array(val[rep][keep], pa.float64()),
        })

    agg = (events.select_columns(["ts", "event_type", "value"])
           .map_batches(fan_out, batch_format="pyarrow")
           .groupby(["window_us", "event_type"])
           .aggregate(Count(), Sum("value")))

    def finish(b: pa.Table) -> pa.Table:
        sv = b.column("sum(value)").to_numpy(zero_copy_only=False)
        return pa.table({
            "window_start": b.column("window_us").cast(pa.timestamp("us")),
            "event_type": b.column("event_type"),
            "n_events": b.column("count()").cast(pa.int64()),
            "sum_value": pa.array(np.round(sv, 6), pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def quantile_agg(events, key: str = "event_type", value: str = "value",
                 qs=(0.5, 0.95)):
    """Exact per-key quantiles of `value` (linear interpolation — matches
    DuckDB ``quantile_cont`` and np.quantile's default).

    ``groupby(key).map_groups`` materializes one key's values per task —
    exact quantiles need the full sorted set, so this is the small-key-
    cardinality tool (event types, status codes). At high cardinality or
    unbounded per-key rows, swap the group fn for a mergeable quantile
    sketch (t-digest / KLL) with per-batch partials, the same combiner
    shape as stages/sketch.distinct_count_kmv.
    """
    import numpy as np
    import pyarrow as pa

    qlist = list(qs)

    def per_key(g: pa.Table) -> pa.Table:
        kt = g.schema.field(key).type
        if g.num_rows == 0:
            return pa.table({key: pa.array([], kt),
                             "q": pa.array([], pa.float64()),
                             "value": pa.array([], pa.float64())})
        vals = g.column(value).to_numpy(zero_copy_only=False).astype(np.float64)
        est = np.quantile(vals, qlist)           # linear interpolation
        return pa.table({
            key: pa.concat_arrays([g.column(key).combine_chunks().slice(0, 1)] * len(qlist)),
            "q": pa.array(qlist, pa.float64()),
            "value": pa.array(np.round(est, 6), pa.float64()),
        })

    return events.select_columns([key, value]).groupby(key).map_groups(
        per_key, batch_format="pyarrow")


def pivot_sum(ds, by: str, pivot_col: str, value_col: str, categories,
              round_dp: int = 6, num_groups: int = None):
    """Wide aggregate (SQL manual PIVOT): one row per ``by`` key with one
    column per category holding sum(value) — missing cells are 0.

    Per-batch combiner on the composite (key, category-index) — the
    category set is fixed and rides the closure, so each batch emits at
    most |keys-in-batch| x |categories| partial rows; the final groupby
    builds the wide rows with one scatter-add per bucket.
    """
    from .common import adaptive_groups

    cats = sorted(categories)
    ncat = len(cats)
    cat_arr = np.asarray(cats, dtype=object)

    if num_groups is None:
        num_groups = adaptive_groups(max(ds.count(), 1), 1_000_000, lo=16)

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({by: pa.array([], pa.int64()),
                          "ci": pa.array([], pa.int64()),
                          "s": pa.array([], pa.float64()),
                          "gkey": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        keys = b.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        pv = b.column(pivot_col).to_numpy(zero_copy_only=False)
        vals = b.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ci = np.searchsorted(cat_arr, pv)
        ci = np.clip(ci, 0, ncat - 1)
        ok = cat_arr[ci] == pv              # rows outside categories drop
        if not ok.any():
            return empty
        keys, ci, vals = keys[ok], ci[ok], vals[ok]
        combo = keys * ncat + ci
        uk, inv = np.unique(combo, return_inverse=True)
        sums = np.bincount(inv, weights=vals)
        out_k = uk // ncat
        return pa.table({
            by: pa.array(out_k, pa.int64()),
            "ci": pa.array(uk % ncat, pa.int64()),
            "s": pa.array(sums, pa.float64()),
            "gkey": pa.array((out_k % num_groups + num_groups) % num_groups,
                             pa.int64())})

    def widen(g: pa.Table) -> pa.Table:
        keys = g.column(by).to_numpy(zero_copy_only=False)
        ci = g.column("ci").to_numpy(zero_copy_only=False)
        s = g.column("s").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(keys, return_inverse=True)
        wide = np.zeros((uk.size, ncat))
        np.add.at(wide, (inv, ci), s)
        wide = np.round(wide, round_dp)
        cols = {by: pa.array(uk, pa.int64())}
        for j, c in enumerate(cats):
            cols[str(c)] = pa.array(wide[:, j], pa.float64())
        return pa.table(cols)

    return ds.select_columns([by, pivot_col, value_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("gkey").map_groups(
            lambda t: widen(t.drop(["gkey"])), batch_format="pyarrow")


def attribution(events, conversion: str = "purchase",
                sources=("click", "view"), num_groups: int = None,
                hot_frac: float = _HOT_BATCH_FRAC,
                salt_secs: int = 86_400):
    """Last-touch conversion attribution -> (attributed_type, n): every
    ``conversion`` event credits the same user's most recent PRIOR event
    whose type is in ``sources`` (order (ts, event_id) within user);
    conversions with no prior source credit ``'none'``. The standard
    marketing-analytics attribution table.

    Plan: user co-partition (``user_id % G``, ONE shuffle), then per
    group a single lexsort + GLOBAL ``np.maximum.accumulate`` over
    source indices — leakage from the previous user cancels via a
    segment-start comparison, so there is no Python loop over rows.
    Each group emits <= len(sources)+1 count cells; one tiny native
    groupby Sum finishes.

    Skew: hot users (pigeonhole-detected, like sessionize/funnel) route
    through a (user, day)-salted path: per salt the kernel also reports
    how many conversions preceded the day's first source and the day's
    LAST source type; a second, days-sized groupby composes the days in
    (salt) order — exact, because last-touch state is a prefix property
    of the (ts, id) order that day boundaries preserve.
    """
    from .common import adaptive_groups

    src_set = sorted(set(sources))
    src = events.select_columns(["event_id", "ts", "user_id",
                                 "event_type"])

    if num_groups is None:
        num_groups = adaptive_groups(max(src.count(), 1), 1_000_000,
                                     lo=16)

    def add_gkey(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column("_g", pa.array(u % num_groups, pa.int64()))

    def _kernel(uid, et, idx_conv_mask, is_src):
        """attributed-type object array for conversion rows, given the
        (user, ts, id)-sorted columns. Strictly-PRIOR semantics: the
        accumulate is shifted one row so a conversion whose type is
        ALSO a source type can never credit itself (matches the SQL
        oracle's ROWS ... AND 1 PRECEDING window)."""
        n = uid.size
        idx = np.arange(n, dtype=np.int64)
        src_idx = np.where(is_src, idx, -1)
        acc = np.maximum.accumulate(src_idx)
        acc_prev = np.empty(n, np.int64)
        acc_prev[0] = -1
        acc_prev[1:] = acc[:-1]
        seg_new = np.empty(n, dtype=bool)
        seg_new[0] = True
        seg_new[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(seg_new)
        seg_start = starts[np.cumsum(seg_new) - 1]
        valid = acc_prev >= seg_start
        attr = np.where(valid & idx_conv_mask,
                        et[np.clip(acc_prev, 0, n - 1)], "none")
        return attr[idx_conv_mask]

    def counts_partial(g: pa.Table) -> pa.Table:
        empty = pa.table({"attributed_type": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        is_conv = et == conversion
        if not is_conv.any():
            return empty
        is_src = np.isin(et, src_set)
        attr = _kernel(uid, et, is_conv, is_src)
        ua, cnt = np.unique(attr, return_counts=True)
        return pa.table({
            "attributed_type": pa.array(ua.astype(object), pa.string()),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    hot = _hot_users(src, hot_frac)
    if not hot:
        partials = (src.map_batches(add_gkey, batch_format="pyarrow")
                    .groupby("_g")
                    .map_groups(lambda g: counts_partial(g.drop(["_g"])),
                                batch_format="pyarrow"))
    else:
        rest, hotds = _split_hot(src, hot)
        base = (rest.map_batches(add_gkey, batch_format="pyarrow")
                .groupby("_g")
                .map_groups(lambda g: counts_partial(g.drop(["_g"])),
                            batch_format="pyarrow"))
        salted = _attribution_salted(hotds, conversion, src_set,
                                     int(salt_secs) * 1_000_000)
        partials = base.union(salted)

    from ray.data.aggregate import Sum

    agg = partials.groupby("attributed_type") \
        .aggregate(Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda b: pa.table({
            "attributed_type": b.column("attributed_type"),
            "n": b.column("n").cast(pa.int64())}),
        batch_format="pyarrow").sort("attributed_type")


def _attribution_salted(hotds, conversion: str, src_set, salt_us: int):
    """Salted last-touch for hot users: stage 1 groups by (user, day)
    and emits per-day resolved counts + (pending-conversion count,
    day's last source type); stage 2 is a days-sized per-user fold in
    salt order (O(hot users x days), driver never sees raw events)."""

    def add_salt(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return b.append_column(
            "_salt", pa.array(ts // salt_us, pa.int64()))

    def day_partial(g: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "salt": pa.array([], pa.int64()),
                          "attributed_type": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "pending": pa.array([], pa.int64()),
                          "last_src": pa.array([], pa.string())})
        if g.num_rows == 0:
            return empty
        g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        uid = int(g.column("user_id")[0].as_py())
        salt = int(g.column("_salt")[0].as_py())
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        is_conv = et == conversion
        is_src = np.isin(et, src_set)
        idx = np.arange(et.size, dtype=np.int64)
        src_idx = np.where(is_src, idx, -1)
        acc = np.maximum.accumulate(src_idx)
        # strictly-prior shift (same rule as _kernel): a conversion that
        # is also a source must not credit itself
        acc_prev = np.empty(et.size, np.int64)
        acc_prev[0] = -1
        acc_prev[1:] = acc[:-1]
        conv_rows = np.flatnonzero(is_conv)
        resolved = conv_rows[acc_prev[conv_rows] >= 0]
        pending = int(conv_rows.size - resolved.size)
        last_src = str(et[acc[-1]]) if acc.size and acc[-1] >= 0 else ""
        rows = {"user_id": [], "salt": [], "attributed_type": [],
                "n": [], "pending": [], "last_src": []}
        if resolved.size:
            ua, cnt = np.unique(et[acc_prev[resolved]],
                                return_counts=True)
            for a, c in zip(ua.tolist(), cnt.tolist()):
                rows["user_id"].append(uid)
                rows["salt"].append(salt)
                rows["attributed_type"].append(str(a))
                rows["n"].append(int(c))
                rows["pending"].append(0)
                rows["last_src"].append("")
        # one summary row per (user, day) carries pending + last_src
        rows["user_id"].append(uid)
        rows["salt"].append(salt)
        rows["attributed_type"].append("")
        rows["n"].append(0)
        rows["pending"].append(pending)
        rows["last_src"].append(last_src)
        return pa.table({
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "salt": pa.array(rows["salt"], pa.int64()),
            "attributed_type": pa.array(rows["attributed_type"],
                                        pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "pending": pa.array(rows["pending"], pa.int64()),
            "last_src": pa.array(rows["last_src"], pa.string())})

    def fold_user(g: pa.Table) -> pa.Table:
        empty = pa.table({"attributed_type": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        g = g.sort_by([("salt", "ascending")])
        at = g.column("attributed_type").to_pylist()
        n = g.column("n").to_pylist()
        pend = g.column("pending").to_pylist()
        lsrc = g.column("last_src").to_pylist()
        out: dict = {}
        for a, c in zip(at, n):
            if a:
                out[a] = out.get(a, 0) + c
        carry = ""
        # walk day-summary rows (attributed_type == "") in salt order
        for a, c, p, ls in zip(at, n, pend, lsrc):
            if a:
                continue
            if p:
                who = carry if carry else "none"
                out[who] = out.get(who, 0) + p
            if ls:
                carry = ls
        return pa.table({
            "attributed_type": pa.array(sorted(out), pa.string()),
            "n": pa.array([out[k] for k in sorted(out)], pa.int64())})

    return (hotds.map_batches(add_salt, batch_format="pyarrow")
            .groupby(["user_id", "_salt"])
            .map_groups(day_partial, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(lambda g: fold_user(g.drop(["user_id"])),
                        batch_format="pyarrow"))


def funnel(events, steps, by: str = "user_id", ts: str = "ts",
           id_col: str = "event_id", type_col: str = "event_type",
           num_groups: int = None, hot_frac: float = _HOT_BATCH_FRAC,
           salt_secs: int = 86_400):
    """Ordered funnel: per ``by`` key, the earliest chain of events
    matching ``steps`` in sequence — step k+1 must occur strictly after
    the chosen step-k event in (ts, id) order. Returns one row per key
    that completes ALL steps, with each step's event id.

    Same co-partitioned shape as sessionize (bucket by key hash, one
    shuffle). Inside a bucket the cascade is vectorized across all keys
    at once: per step, a masked ``minimum.reduceat`` picks each key's
    first qualifying event; keys that miss a step get +inf and drop out
    of later steps automatically. The only loop is over the (few) steps.

    Skew: hot keys route through :func:`_funnel_salted` — per (key, day)
    the greedy cascade runs once per possible ENTRY state (the funnel
    automaton: greedy-from-state-s depends only on s and the day's
    events), and the O(hot keys x days x steps) state-transition rows
    compose in order on the driver. Exact, because the earliest-chain
    greedy is left-to-right and day boundaries preserve (ts, id) order.
    """
    import pyarrow.compute as pc
    from .common import adaptive_groups

    if num_groups is None:
        num_groups = adaptive_groups(max(events.count(), 1),
                                     1_000_000, lo=16)
    step_list = list(steps)

    def tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column(type_col),
                              value_set=pa.array(step_list)))
        keys = b.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        g = (keys % num_groups + num_groups) % num_groups
        return b.append_column("gkey", pa.array(g, pa.int64()))

    out_fields = [(by, pa.int64())] + \
        [(f"{s}_id", pa.int64()) for s in step_list]

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.table({n: pa.array([], t) for n, t in out_fields})
        if g.num_rows == 0:
            return empty
        keys = g.column(by).to_numpy(zero_copy_only=False)
        tss = g.column(ts).to_numpy(zero_copy_only=False)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        types = g.column(type_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, tss, keys))
        keys, ids, types = keys[order], ids[order], types[order]
        pos = np.arange(keys.size, dtype=np.float64)
        seg_starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1])))
        seg_of_row = np.repeat(np.arange(seg_starts.size),
                               np.diff(np.append(seg_starts, keys.size)))
        n_seg = seg_starts.size
        cur = np.full(n_seg, -1.0)
        picks = []
        for s in step_list:
            rows = np.flatnonzero(types == s)
            sel = np.full(n_seg, np.inf)
            if rows.size:
                seg_t = seg_of_row[rows]
                cand = np.where(pos[rows] > cur[seg_t], pos[rows], np.inf)
                bnd = np.flatnonzero(
                    np.concatenate(([True], seg_t[1:] != seg_t[:-1])))
                mins = np.minimum.reduceat(cand, bnd)
                sel[seg_t[bnd]] = mins
            picks.append(sel)
            cur = sel                      # inf propagates: key drops out
        done = np.isfinite(picks[-1])
        cols = {by: pa.array(keys[seg_starts][done].astype(np.int64),
                             pa.int64())}
        for s, sel in zip(step_list, picks):
            cols[f"{s}_id"] = pa.array(
                ids[sel[done].astype(np.int64)].astype(np.int64), pa.int64())
        return pa.table(cols)

    src = events.select_columns([by, ts, id_col, type_col]) \
        .map_batches(
            lambda b: b.filter(pc.is_in(b.column(type_col),
                                        value_set=pa.array(step_list))),
            batch_format="pyarrow")
    hot = _hot_users(src, hot_frac, key=by)
    if not hot:
        return src.map_batches(tag, batch_format="pyarrow") \
            .groupby("gkey").map_groups(
                lambda t: resolve(t.drop(["gkey"])),
                batch_format="pyarrow")
    rest, hotds = _split_hot(src, hot, key=by)
    base = rest.map_batches(tag, batch_format="pyarrow") \
        .groupby("gkey").map_groups(
            lambda t: resolve(t.drop(["gkey"])), batch_format="pyarrow")
    salted = _funnel_salted(hotds, step_list, by, ts, id_col, type_col,
                            num_groups, int(salt_secs) * 1_000_000)
    return base.union(salted)


def _funnel_salted(hotds, step_list, by, ts, id_col, type_col,
                   num_groups, salt_us):
    """Salted funnel for hot keys. Stage 1 groups by (key, day) and, for
    every possible ENTRY state s (steps already completed when the day
    begins), runs the same vectorized greedy cascade restricted to steps
    s.. — emitting one state-transition row per (key, day, entry) with
    the picked event id per step (-1 = not reached). The driver then
    composes each key's day functions in time order (O(hot keys x days x
    steps) rows — bounded, never the event volume) and emits keys whose
    final state completes all steps."""
    import ray.data as rd

    K = len(step_list)
    pick_cols = [f"_p{i}" for i in range(K)]

    def autom(g: pa.Table) -> pa.Table:
        cols = {by: pa.array([], pa.int64()),
                "_salt": pa.array([], pa.int64()),
                "_entry": pa.array([], pa.int64())}
        for c in pick_cols:
            cols[c] = pa.array([], pa.int64())
        empty = pa.table(cols)
        if g.num_rows == 0:
            return empty
        g = g.sort_by([(by, "ascending"), ("_salt", "ascending"),
                       (ts, "ascending"), (id_col, "ascending")])
        keys = g.column(by).to_numpy(zero_copy_only=False)
        salts = g.column("_salt").to_numpy(zero_copy_only=False)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        types = g.column(type_col).to_numpy(zero_copy_only=False)
        n = keys.size
        pos = np.arange(n, dtype=np.float64)
        new_seg = np.concatenate(
            ([True], (keys[1:] != keys[:-1]) | (salts[1:] != salts[:-1])))
        seg_starts = np.flatnonzero(new_seg)
        seg_of_row = np.repeat(np.arange(seg_starts.size),
                               np.diff(np.append(seg_starts, n)))
        n_seg = seg_starts.size
        out = {by: [], "_salt": [], "_entry": []}
        out_picks = [[] for _ in range(K)]
        type_rows = {s: np.flatnonzero(types == s) for s in step_list}
        for entry in range(K):
            cur = np.full(n_seg, -1.0)
            picks = np.full((K, n_seg), -1, np.int64)
            for si in range(entry, K):
                rows = type_rows[step_list[si]]
                sel = np.full(n_seg, np.inf)
                if rows.size:
                    seg_t = seg_of_row[rows]
                    cand = np.where(pos[rows] > cur[seg_t],
                                    pos[rows], np.inf)
                    bnd = np.flatnonzero(np.concatenate(
                        ([True], seg_t[1:] != seg_t[:-1])))
                    mins = np.minimum.reduceat(cand, bnd)
                    sel[seg_t[bnd]] = mins
                fin = np.isfinite(sel)
                picks[si, fin] = ids[sel[fin].astype(np.int64)]
                cur = sel                 # inf propagates: seg drops out
            out[by].extend(keys[seg_starts].astype(np.int64).tolist())
            out["_salt"].extend(salts[seg_starts].astype(np.int64).tolist())
            out["_entry"].extend([entry] * n_seg)
            for i in range(K):
                out_picks[i].extend(picks[i].tolist())
        cols = {by: pa.array(out[by], pa.int64()),
                "_salt": pa.array(out["_salt"], pa.int64()),
                "_entry": pa.array(out["_entry"], pa.int64())}
        for c, p in zip(pick_cols, out_picks):
            cols[c] = pa.array(p, pa.int64())
        return pa.table(cols)

    trans = hotds.map_batches(
        lambda b: _salt_gkey(b, num_groups, salt_us, key=by, ts_col=ts),
        batch_format="pyarrow") \
        .groupby("_g") \
        .map_groups(lambda g: autom(g.drop(["_g"])),
                    batch_format="pyarrow")

    rows = sorted(
        (r for b in trans.iter_batches(batch_format="pyarrow")
         for r in b.to_pylist()),
        key=lambda r: (r[by], r["_salt"], r["_entry"]))
    results = {}
    state = {}
    picked = {}
    for r in rows:
        k = r[by]
        st = state.get(k, 0)
        if r["_entry"] != st or st >= K:
            continue
        pk = picked.setdefault(k, [-1] * K)
        for si in range(st, K):
            pid = r[f"_p{si}"]
            if pid < 0:
                break
            pk[si] = pid
            st = si + 1
        state[k] = st
        if st == K:
            results[k] = list(pk)
    done_keys = sorted(results)
    cols = {by: pa.array(done_keys, pa.int64())}
    for i, s in enumerate(step_list):
        cols[f"{s}_id"] = pa.array([results[k][i] for k in done_keys],
                                   pa.int64())
    return rd.from_arrow(pa.table(cols))


def top_k_per_group(ds, key: str, order_col: str, k: int = 3,
                    tiebreak: str = None, payload_cols: list = None):
    """Top-k rows per key by `order_col` (descending; ties broken ascending
    on `tiebreak`), with a 1-based `rank` column — SQL's
    ``row_number() OVER (PARTITION BY key ORDER BY order_col DESC, tiebreak)
    <= k``.

    Classic pre-aggregated combiner: every batch emits only its local
    top-k per key, so the final ``groupby(key)`` merge sees O(batches x k)
    rows per key — the full relation never shuffles.
    """
    import numpy as np
    import pyarrow as pa

    cols = list(dict.fromkeys(
        [key, order_col] + ([tiebreak] if tiebreak else [])
        + (payload_cols or [])))

    def local_top(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        kv = b.column(key).to_numpy(zero_copy_only=False)
        ov = b.column(order_col).to_numpy(zero_copy_only=False)
        tb = (b.column(tiebreak).to_numpy(zero_copy_only=False)
              if tiebreak else np.arange(b.num_rows))
        order = np.lexsort((tb, -ov, kv))
        kk = kv[order]
        starts = np.flatnonzero(np.concatenate(([True], kk[1:] != kk[:-1])))
        rank = np.arange(kk.size) - np.repeat(
            starts, np.diff(np.append(starts, kk.size)))
        keep = order[rank < k]
        return b.take(pa.array(np.sort(keep), pa.int64()))

    def final_top(g: pa.Table) -> pa.Table:
        t = local_top(g)
        ov = t.column(order_col).to_numpy(zero_copy_only=False)
        tb = (t.column(tiebreak).to_numpy(zero_copy_only=False)
              if tiebreak else np.arange(t.num_rows))
        order = np.lexsort((tb, -ov))
        t = t.take(pa.array(order, pa.int64()))
        return t.append_column(
            "rank", pa.array(np.arange(1, t.num_rows + 1), pa.int64()))

    return ds.select_columns(cols).map_batches(local_top, batch_format="pyarrow") \
             .groupby(key).map_groups(final_top, batch_format="pyarrow")


def user_running(events, num_groups: int = None,
                 hot_frac: float = _HOT_BATCH_FRAC,
                 salt_secs: int = 86_400):
    """Per-event window analytics: running total, sequence number, and gap
    to the user's previous event — the SQL window-function trio
    (SUM OVER / row_number / LAG) Ray Data has no primitive for.
    Hot users (pigeonhole-detected) route through
    :func:`_user_running_salted` — day-salted locals + exact integer
    prefix offsets, bit-identical to the unsalted path.

    -> (event_id, user_id, cum_value, seq, gap_us); order within a user is
    (ts, event_id). cum_value accumulates EXACT integer cents
    (round(value*100)) so the distributed result is bit-identical to the
    SQL window oracle regardless of summation order; gap_us = -1 for a
    user's first event.

    Same partitioning contract as ``sessionize``: a user's events must
    co-locate; coarse ``user_id % G`` groups scale with the event count;
    within a group everything is one vectorized pass (per-user resets via
    exclusive-prefix subtraction on INTEGER cumsums — exact, unlike float).
    """
    from .common import adaptive_groups

    if num_groups is None:
        num_groups = adaptive_groups(events.count(), 1_000_000, lo=64)

    def add_gkey(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column("_g", pa.array(u % num_groups, pa.int64()))

    def running(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "cum_value": pa.array([], pa.float64()),
            "seq": pa.array([], pa.int64()),
            "gap_us": pa.array([], pa.int64()),
        })
        n = g.num_rows
        if n == 0:
            return empty
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        # half-away-from-zero like DuckDB round(value*100,0) — np.round is
        # banker's and diverges on exact .5 scaled values (e.g. 0.125)
        cents = half_away_scaled_int(
            g.column("value").to_numpy(zero_copy_only=False), 100)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_user)
        cum = np.cumsum(cents)
        # per-user reset: subtract the cumsum value just before each user's
        # first row, broadcast down the segment (exact on integers)
        base = np.repeat(np.where(starts > 0, cum[starts - 1], 0), np.diff(
            np.append(starts, n)))
        run = cum - base
        seq = np.arange(n, dtype=np.int64) - np.repeat(starts, np.diff(
            np.append(starts, n))) + 1
        gap = np.empty(n, np.int64)
        gap[0] = -1
        gap[1:] = np.where(new_user[1:], -1, ts[1:] - ts[:-1])
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "cum_value": pa.array(run / 100.0, pa.float64()),
            "seq": pa.array(seq, pa.int64()),
            "gap_us": pa.array(gap, pa.int64()),
        })

    src = events.select_columns(["event_id", "ts", "user_id", "value"])
    hot = _hot_users(src, hot_frac)
    if not hot:
        return (src.map_batches(add_gkey, batch_format="pyarrow")
                .groupby("_g")
                .map_groups(lambda g: running(g.drop(["_g"])),
                            batch_format="pyarrow"))
    rest, hotds = _split_hot(src, hot)
    base = (rest.map_batches(add_gkey, batch_format="pyarrow")
            .groupby("_g")
            .map_groups(lambda g: running(g.drop(["_g"])),
                        batch_format="pyarrow"))
    salted = _user_running_salted(hotds, int(salt_secs) * 1_000_000,
                                  num_groups)
    return base.union(salted)


def _user_running_salted(hotds, salt_us: int, num_groups: int):
    """Salted running-window trio for hot users: stage 1 groups by
    (user, day) and computes LOCAL integer-cents cumsums / seq / gaps
    per salt (bounded per-task rows); the per-(user, day) summary
    relation — O(hot users x days), native groupby Sum/Max/Count — comes
    to the driver, where exclusive prefix offsets (seq, cents,
    previous-salt last ts) are derived per salt; stage 2 is one
    broadcast-dict map over the local rows. Integer cents make the
    salted result BIT-identical to the unsalted path."""
    import ray
    from ray.data.aggregate import Count, Max, Sum

    def locals_(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "_salt": pa.array([], pa.int64()),
            "ts_us": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
            "cum_local": pa.array([], pa.int64()),
            "seq_local": pa.array([], pa.int64()),
            "gap_local": pa.array([], pa.int64()),
        })
        n = g.num_rows
        if n == 0:
            return empty
        g = g.sort_by([("user_id", "ascending"), ("_salt", "ascending"),
                       ("ts", "ascending"), ("event_id", "ascending")])
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        salt = g.column("_salt").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        cents = half_away_scaled_int(
            g.column("value").to_numpy(zero_copy_only=False), 100)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (uid[1:] != uid[:-1]) | (salt[1:] != salt[:-1])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, n))
        cum = np.cumsum(cents)
        base = np.repeat(np.where(starts > 0, cum[starts - 1], 0), lens)
        seq = np.arange(n, dtype=np.int64) - np.repeat(starts, lens) + 1
        gap = np.empty(n, np.int64)
        gap[0] = -1
        gap[1:] = np.where(new[1:], -1, ts[1:] - ts[:-1])
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "_salt": pa.array(salt, pa.int64()),
            "ts_us": pa.array(ts, pa.int64()),
            "cents": pa.array(cents, pa.int64()),
            "cum_local": pa.array(cum - base, pa.int64()),
            "seq_local": pa.array(seq, pa.int64()),
            "gap_local": pa.array(gap, pa.int64()),
        })

    loc = hotds.map_batches(
        lambda b: _salt_gkey(b, num_groups, salt_us),
        batch_format="pyarrow") \
        .groupby("_g") \
        .map_groups(lambda g: locals_(g.drop(["_g"])),
                    batch_format="pyarrow") \
        .materialize()          # consumed twice: summary agg + fix-up map

    summ = loc.groupby(["user_id", "_salt"]).aggregate(
        Count(), Sum("cents", alias_name="tot"),
        Max("ts_us", alias_name="last_ts"))
    offsets = {}
    rows = sorted(summ.take_all(),
                  key=lambda r: (r["user_id"], r["_salt"]))
    seq_off = cents_off = 0
    prev_user = prev_last = None
    for r in rows:
        u = r["user_id"]
        if u != prev_user:
            seq_off = cents_off = 0
            prev_last = None
            prev_user = u
        offsets[(u, r["_salt"])] = (seq_off, cents_off, prev_last)
        seq_off += int(r["count()"])
        cents_off += int(r["tot"])
        prev_last = int(r["last_ts"])
    off_ref = ray.put(offsets)

    def fix(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "cum_value": pa.array([], pa.float64()),
            "seq": pa.array([], pa.int64()),
            "gap_us": pa.array([], pa.int64()),
        })
        n = b.num_rows
        if n == 0:
            return empty
        off = ray.get(off_ref)
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        salt = b.column("_salt").to_numpy(zero_copy_only=False)
        # offsets dict is tiny (hot users x days); one lookup per
        # DISTINCT (user, salt) in the batch, vectorized application.
        # Pairs dedupe row-wise — bit-packing would corrupt for
        # salt >= 2^20 (small salt_secs) or user ids >= 2^43
        pairs = np.stack([uid.astype(np.int64),
                          salt.astype(np.int64)], axis=1)
        uc, inv = np.unique(pairs, axis=0, return_inverse=True)
        so = np.empty(uc.shape[0], np.int64)
        co = np.empty(uc.shape[0], np.int64)
        pl = np.empty(uc.shape[0], np.int64)
        for i, (u, s) in enumerate(uc.tolist()):
            seq_o, cents_o, prev_last = off[(int(u), int(s))]
            so[i], co[i] = seq_o, cents_o
            pl[i] = -1 if prev_last is None else prev_last
        gap = b.column("gap_local").to_numpy(zero_copy_only=False).copy()
        ts = b.column("ts_us").to_numpy(zero_copy_only=False)
        first = gap == -1
        has_prev = pl[inv] >= 0
        gap[first & has_prev] = (ts - pl[inv])[first & has_prev]
        return pa.table({
            "event_id": b.column("event_id"),
            "user_id": b.column("user_id"),
            "cum_value": pa.array(
                (b.column("cum_local").to_numpy(zero_copy_only=False)
                 + co[inv]) / 100.0, pa.float64()),
            "seq": pa.array(
                b.column("seq_local").to_numpy(zero_copy_only=False)
                + so[inv], pa.int64()),
            "gap_us": pa.array(gap, pa.int64()),
        })

    return loc.map_batches(fix, batch_format="pyarrow")


def latest_per_key(ds, key: str = "user_id", ts_col: str = "ts",
                   tie_col: str = "event_id", value_cols=("value",)):
    """Latest-record-per-key compaction (CDC upsert collapse / web-corpus
    recrawl collapse): one surviving row per key — the row with the
    lexicographically greatest (ts, tie).

    Classic pre-aggregated combiner: each batch reduces to AT MOST one row
    per key it contains (one vectorized lexsort + segment-tail gather), so
    the groupby merge shuffles O(batches x keys-per-batch) rows, never the
    relation. The merge applies the same reduction per key.
    """

    cols = [key, ts_col, tie_col, *value_cols]

    def reduce_batch(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        k = b.column(key).to_numpy(zero_copy_only=False)
        ts = b.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        tie = b.column(tie_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, ts, k))
        ks = k[order]
        last = np.flatnonzero(
            np.concatenate((ks[1:] != ks[:-1], [True])))
        return b.take(pa.array(order[last]))

    return ds.select_columns(cols) \
        .map_batches(reduce_batch, batch_format="pyarrow") \
        .groupby(key) \
        .map_groups(reduce_batch, batch_format="pyarrow")


def value_histogram(events, key: str = "event_type", value: str = "value",
                    bins: int = 20):
    """Equal-width histogram of ``value`` per ``key`` over GLOBAL bin
    edges -> (key, bin, n); bin = floor((v - min) * bins / (max - min)),
    top edge clamped into the last bin. The distribution profiler every
    data-quality pass runs.

    Two passes, zero wide shuffle: native Dataset min/max fix the edges
    (tiny all-reduce), then each batch bincounts its own (key, bin)
    pairs — only O(batches x keys x bins) partial rows reach the final
    native Sum groupby. Both sides of the oracle evaluate the identical
    IEEE expression, so binning is bit-stable.
    """
    from ray.data.aggregate import Max, Min, Sum

    stats = events.aggregate(Min(value), Max(value))
    if not stats or stats.get(f"min({value})") is None:   # empty input
        import ray.data as rd
        ktype = events.schema().base_schema.field(key).type
        return rd.from_arrow(pa.table({
            key: pa.array([], ktype),
            "bin": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64())}))
    lo, hi = float(stats[f"min({value})"]), float(stats[f"max({value})"])
    if not (np.isfinite(lo) and np.isfinite(hi)):
        raise ValueError(f"{value!r} must be finite for histogram binning")
    if hi <= lo:
        # degenerate single-valued column: everything lands in bin 0 (the
        # SQL expression divides by zero here — the oracle only covers
        # non-degenerate inputs)
        hi = lo + 1.0

    def partial(b: pa.Table) -> pa.Table:
        # key type follows the input schema (int categories work too),
        # as quantile_agg does — not a hardcoded pa.string()
        ktype = b.schema.field(key).type
        empty = pa.table({key: pa.array([], ktype),
                          "bin": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        v = b.column(value).to_numpy(zero_copy_only=False).astype(np.float64)
        k = b.column(key).to_numpy(zero_copy_only=False)
        bi = np.minimum(np.floor((v - lo) * bins / (hi - lo)),
                        bins - 1).astype(np.int64)
        uk, ki = np.unique(k, return_inverse=True)
        code = ki * bins + bi
        uc, cnt = np.unique(code, return_counts=True)
        return pa.table({
            key: pa.array(uk[uc // bins], ktype),
            "bin": pa.array((uc % bins).astype(np.int64), pa.int64()),
            "c": pa.array(cnt.astype(np.int64), pa.int64())})

    return events.select_columns([key, value]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby([key, "bin"]).aggregate(Sum("c", alias_name="n")) \
        .map_batches(
            lambda b: pa.table({key: b.column(key),
                                "bin": b.column("bin").cast(pa.int64()),
                                "n": b.column("n").cast(pa.int64())}),
            batch_format="pyarrow")


def event_transitions(events, num_groups: int = None,
                      hot_frac: float = _HOT_BATCH_FRAC,
                      salt_secs: int = 86_400):
    """Per-user consecutive event-type transition counts -> (src, dst, n):
    the first-order Markov transition table of the event stream (sequence
    mining / next-event modeling). Order within a user is (ts, event_id);
    only same-user adjacent pairs count.

    Same partitioning contract as ``sessionize``/``user_running`` (a user
    co-locates in one coarse ``user_id % G`` group); within a group one
    sort + shifted compare emits per-group (src, dst, partial-count) rows,
    so the final native two-key Sum groupby sees O(groups x types^2)
    rows, never the event volume.
    """
    from ray.data.aggregate import Sum
    from .common import adaptive_groups

    if num_groups is None:
        num_groups = adaptive_groups(events.count(), 1_000_000, lo=64)

    def add_gkey(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column("_g", pa.array(u % num_groups, pa.int64()))

    def pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({"src": pa.array([], pa.string()),
                          "dst": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})
        n = g.num_rows
        if n < 2:
            return empty
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        same = uid[:-1] == uid[1:]
        if not same.any():
            return empty
        li = np.flatnonzero(same)
        src, dst = et[li], et[li + 1]
        # count distinct (src, dst) pairs via one lexsort run-length pass
        order = np.lexsort((dst, src))
        s2, d2 = src[order], dst[order]
        new = np.concatenate(([True], (s2[1:] != s2[:-1])
                              | (d2[1:] != d2[:-1])))
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, s2.size))
        return pa.table({
            "src": pa.array(s2[starts], pa.string()),
            "dst": pa.array(d2[starts], pa.string()),
            "c": pa.array(cnt.astype(np.int64), pa.int64())})

    src_ds = events.select_columns(["event_id", "ts", "user_id",
                                    "event_type"])
    hot = _hot_users(src_ds, hot_frac)
    if not hot:
        partials = (src_ds.map_batches(add_gkey, batch_format="pyarrow")
                    .groupby("_g")
                    .map_groups(lambda g: pairs(g.drop(["_g"])),
                                batch_format="pyarrow"))
    else:
        rest, hotds = _split_hot(src_ds, hot)
        base = (rest.map_batches(add_gkey, batch_format="pyarrow")
                .groupby("_g")
                .map_groups(lambda g: pairs(g.drop(["_g"])),
                            batch_format="pyarrow"))
        partials = base.union(_event_transitions_salted(
            hotds, int(salt_secs) * 1_000_000, num_groups))
    return (partials
            .groupby(["src", "dst"]).aggregate(Sum("c", alias_name="n"))
            .map_batches(
                lambda b: pa.table({"src": b.column("src"),
                                    "dst": b.column("dst"),
                                    "n": b.column("n").cast(pa.int64())}),
                batch_format="pyarrow"))


def _event_transitions_salted(hotds, salt_us: int, num_groups: int):
    """Salted transition partials for hot users: one (user, day) groupby
    emits within-salt (src, dst, c) counts PLUS one boundary row per
    (user, salt) carrying the salt's first/last event types; boundary
    rows (O(hot users x days)) come to the driver where the cross-salt
    transition last(salt_i) -> first(next salt with events) is added —
    exact, because events are time-ordered across salts."""
    import ray.data as rd

    def kern(g: pa.Table) -> pa.Table:
        empty = pa.table({"src": pa.array([], pa.string()),
                          "dst": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64()),
                          "user_id": pa.array([], pa.int64()),
                          "salt": pa.array([], pa.int64())})
        n = g.num_rows
        if n == 0:
            return empty
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        salt = g.column("_salt").to_numpy(zero_copy_only=False)
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        out_s, out_d, out_c, out_u, out_sl = [], [], [], [], []
        if n >= 2:
            same = (uid[:-1] == uid[1:]) & (salt[:-1] == salt[1:])
            li = np.flatnonzero(same)
            if li.size:
                s0, d0 = et[li], et[li + 1]
                order = np.lexsort((d0, s0))
                s2, d2 = s0[order], d0[order]
                new = np.concatenate(([True], (s2[1:] != s2[:-1])
                                      | (d2[1:] != d2[:-1])))
                starts = np.flatnonzero(new)
                cnt = np.diff(np.append(starts, s2.size))
                out_s.extend(s2[starts].tolist())
                out_d.extend(d2[starts].tolist())
                out_c.extend(cnt.astype(np.int64).tolist())
                out_u.extend([-1] * starts.size)
                out_sl.extend([-1] * starts.size)
        # boundary rows: first/last type per (user, salt); c = -1 marks them
        new_seg = np.concatenate(
            ([True], (uid[1:] != uid[:-1]) | (salt[1:] != salt[:-1])))
        seg = np.flatnonzero(new_seg)
        ends = np.append(seg[1:], n) - 1
        out_s.extend(et[seg].tolist())        # src = salt's FIRST type
        out_d.extend(et[ends].tolist())       # dst = salt's LAST type
        out_c.extend([-1] * seg.size)
        out_u.extend(uid[seg].astype(np.int64).tolist())
        out_sl.extend(salt[seg].astype(np.int64).tolist())
        return pa.table({"src": pa.array(out_s, pa.string()),
                         "dst": pa.array(out_d, pa.string()),
                         "c": pa.array(out_c, pa.int64()),
                         "user_id": pa.array(out_u, pa.int64()),
                         "salt": pa.array(out_sl, pa.int64())})

    tagged = hotds.map_batches(
        lambda b: _salt_gkey(b, num_groups, salt_us),
        batch_format="pyarrow") \
        .groupby("_g") \
        .map_groups(lambda g: kern(g.drop(["_g"])),
                    batch_format="pyarrow").materialize()

    within = tagged.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("c"), 0))
        .select(["src", "dst", "c"]),
        batch_format="pyarrow")

    brows = sorted(
        ((r["user_id"], r["salt"], r["src"], r["dst"])
         for b in tagged.iter_batches(batch_format="pyarrow")
         for r in b.filter(pc.equal(b.column("c"), -1)).to_pylist()),
        key=lambda r: (r[0], r[1]))
    cross: dict = {}
    for i in range(1, len(brows)):
        pu, _, _, plast = brows[i - 1]
        cu, _, cfirst, _ = brows[i]
        if pu == cu:
            cross[(plast, cfirst)] = cross.get((plast, cfirst), 0) + 1
    cross_tbl = pa.table({
        "src": pa.array([k[0] for k in cross], pa.string()),
        "dst": pa.array([k[1] for k in cross], pa.string()),
        "c": pa.array(list(cross.values()), pa.int64())})
    return within.union(rd.from_arrow(cross_tbl)) if cross else within


def window_distinct_users(events, window_secs: int = 3600):
    """Exact distinct users per (window_start, event_type) -> the
    windowed-audience metric (DAU/HAU class). Tumbling epoch-aligned
    windows like :func:`tumbling_window_agg`.

    Exact distinct is a two-stage shuffle: per-batch DISTINCT
    (window, type, user) triples first (one lexsort run-length — repeat
    events collapse before anything moves), then a native triple groupby
    dedupes globally and a (window, type) count over the one-row-per-
    triple relation yields the answer. Only distinct triples ever
    shuffle; for heavier cardinalities swap the KMV sketch
    (stages/sketch.py) in as the approximate scale path.
    """
    us = int(window_secs) * 1_000_000

    def triples(b: pa.Table) -> pa.Table:
        empty = pa.table({"window_us": pa.array([], pa.int64()),
                          "event_type": pa.array([], pa.string()),
                          "user_id": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (ts // us) * us
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, et, w))
        w, et, uid = w[order], et[order], uid[order]
        new = np.concatenate(([True], (w[1:] != w[:-1])
                              | (et[1:] != et[:-1])
                              | (uid[1:] != uid[:-1])))
        return pa.table({
            "window_us": pa.array(w[new], pa.int64()),
            "event_type": pa.array(et[new], pa.string()),
            "user_id": pa.array(uid[new].astype(np.int64), pa.int64())})

    distinct = (events.select_columns(["ts", "event_type", "user_id"])
                .map_batches(triples, batch_format="pyarrow")
                .groupby(["window_us", "event_type", "user_id"]).count())

    counted = distinct.groupby(["window_us", "event_type"]).count()

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": b.column("window_us").cast(pa.timestamp("us")),
            "event_type": b.column("event_type"),
            "n_users": b.column("count()").cast(pa.int64())})

    return counted.map_batches(finish, batch_format="pyarrow")


def json_field_agg(events, key: str = "k", group: str = "event_type",
                   props_col: str = "props"):
    """Semi-structured extraction + aggregate -> (group, n, sum_k, avg_k):
    pull integer field ``key`` out of the JSON-ish ``props`` column and
    aggregate it per group. The log-analytics staple (every event table
    carries a JSON blob; the engine must reach into it without a
    row-at-a-time parse).

    Extraction is ONE vectorized RE2 pass (`pyarrow.compute.extract_regex`
    over the whole column in C++ — DuckDB's regexp_extract replays the
    identical automaton, so the oracle is exact); rows without the field
    are dropped like SQL NULLs. Per-batch (group, n, sum) partials ->
    native groupby Sum: only O(batches x groups) rows shuffle.
    """
    from ray.data.aggregate import Sum

    pat = '"' + key + '":\\s*(?P<v>-?\\d+)'

    def partial(b: pa.Table) -> pa.Table:
        gtype = b.schema.field(group).type
        empty = pa.table({group: pa.array([], gtype),
                          "c": pa.array([], pa.int64()),
                          "s": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        hit = pc.extract_regex(pc.cast(b.column(props_col), pa.string()),
                               pattern=pat)
        v = pc.struct_field(hit, "v")
        ok = pc.is_valid(v).to_numpy(zero_copy_only=False)
        if not ok.any():
            return empty
        vals = np.array(
            [int(x) for x in v.drop_null().to_pylist()], np.int64)
        g = b.column(group).to_numpy(zero_copy_only=False)[ok]
        o = np.argsort(g, kind="stable")
        g, vals = g[o], vals[o]
        starts = np.flatnonzero(np.concatenate(([True], g[1:] != g[:-1])))
        ends = np.append(starts[1:], g.size)
        return pa.table({
            group: pa.array(g[starts], gtype),
            "c": pa.array((ends - starts).astype(np.int64), pa.int64()),
            "s": pa.array(np.add.reduceat(vals, starts).astype(np.int64),
                          pa.int64())})

    merged = (events.select_columns([group, props_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby(group).aggregate(Sum("c", alias_name="n"),
                                        Sum("s", alias_name="sum_k")))

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n").cast(pa.int64()).to_numpy(zero_copy_only=False)
        s = b.column("sum_k").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        avg = round_half_away(s.astype(np.float64) / n, 6) + 0.0
        return pa.table({group: b.column(group),
                         "n": pa.array(n, pa.int64()),
                         "sum_k": pa.array(s, pa.int64()),
                         "avg_k": pa.array(avg, pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow")


def mode_per_key(events, key: str = "user_id", val: str = "event_type"):
    """Most-frequent value per key -> (key, top_val, n); ties break to
    the lexicographically smallest value (deterministic = oracle-able).
    The categorical-profile op (dominant event type per user, dominant
    language per domain, ...).

    Stage 1: per-batch (key, val, c) partials (lexsort + reduceat) ->
    native groupby Sum gives exact pair counts with only
    O(batches x distinct-pairs-per-batch) rows shuffled. Stage 2: the
    pair relation (output-bounded, O(distinct pairs)) reduces to one row
    per key with the same argmax combiner applied per batch and then per
    group — at most one candidate row per key per batch survives into
    the second (tiny) shuffle, the latest_per_key shape.
    """
    from ray.data.aggregate import Sum

    def pair_partial(b: pa.Table) -> pa.Table:
        ktype = b.schema.field(key).type
        vtype = b.schema.field(val).type
        empty = pa.table({key: pa.array([], ktype),
                          val: pa.array([], vtype),
                          "c": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        k = b.column(key).to_numpy(zero_copy_only=False)
        v = b.column(val).to_numpy(zero_copy_only=False)
        o = np.lexsort((v, k))
        k, v = k[o], v[o]
        new = np.flatnonzero(np.concatenate(
            ([True], (k[1:] != k[:-1]) | (v[1:] != v[:-1]))))
        ends = np.append(new[1:], k.size)
        return pa.table({
            key: pa.array(k[new], ktype),
            val: pa.array(v[new], vtype),
            "c": pa.array((ends - new).astype(np.int64), pa.int64())})

    pairs = (events.select_columns([key, val])
             .map_batches(pair_partial, batch_format="pyarrow")
             .groupby([key, val]).aggregate(Sum("c", alias_name="n")))

    def argmax_batch(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        k = b.column(key).to_numpy(zero_copy_only=False)
        v = b.column(val).to_numpy(zero_copy_only=False)
        n = b.column("n").cast(pa.int64()).to_numpy(zero_copy_only=False)
        # best per key = max n, then min val: sort by (key asc, n desc,
        # val asc) and take the first row of each key segment. np.lexsort
        # sorts ascending by the LAST key first, so feed (val, -n, key).
        o = np.lexsort((v, -n, k))
        ks = k[o]
        first = np.flatnonzero(np.concatenate(
            ([True], ks[1:] != ks[:-1])))
        return b.take(pa.array(o[first]))

    reduced = (pairs.map_batches(argmax_batch, batch_format="pyarrow")
               .groupby(key).map_groups(argmax_batch,
                                        batch_format="pyarrow"))

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({key: pa.array([], pa.int64()),
                             "top_val": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({key: b.column(key),
                         "top_val": b.column(val),
                         "n": b.column("n").cast(pa.int64())})

    return reduced.map_batches(finish, batch_format="pyarrow")


def event_gaps(events, key: str = "user_id", ts_col: str = "ts",
               tie_col: str = "event_id", num_groups=None):
    """Per-key inter-event gap statistics -> (user_id, n_gaps, avg_gap_s,
    max_gap_s) over events ordered by (ts, tie): the engagement-cadence /
    bot-detection profile (SQL: LAG + date_diff + avg/max). Keys with a
    single event emit nothing (no gaps).

    Co-partitions by key into adaptive integer-hash groups (the
    sessionize contract: one key fits one task; salt by day first if one
    ever exceeds a worker) and resolves each partition vectorized: one
    lexsort, one diff, reduceat segment sums/maxima. Gap arithmetic is
    integer microseconds end-to-end; only the final avg/max divide into
    float with the oracle's exact expression order."""
    from .common import adaptive_groups, round_half_away

    if num_groups is None:
        num_groups = adaptive_groups(events.count(), 1_000_000, lo=32)

    def add_g(b: pa.Table) -> pa.Table:
        u = b.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "_g", pa.array((u % num_groups + num_groups) % num_groups,
                           pa.int64()))

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.table({key: pa.array([], pa.int64()),
                          "n_gaps": pa.array([], pa.int64()),
                          "avg_gap_s": pa.array([], pa.float64()),
                          "max_gap_s": pa.array([], pa.float64())})
        if g.num_rows == 0:
            return empty
        u = g.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        tie = g.column(tie_col).to_numpy(zero_copy_only=False)
        o = np.lexsort((tie, ts, u))
        us, tss = u[o], ts[o]
        same = us[1:] == us[:-1]            # gap rows (same key as prev)
        if not same.any():
            return empty
        d = (tss[1:] - tss[:-1])[same]
        gu = us[1:][same]
        starts = np.flatnonzero(np.concatenate(
            ([True], gu[1:] != gu[:-1])))
        ends = np.append(starts[1:], gu.size)
        sums = np.add.reduceat(d, starts)
        maxs = np.maximum.reduceat(d, starts)
        n = (ends - starts).astype(np.int64)
        avg = round_half_away(
            sums.astype(np.float64) / n / 1_000_000.0, 6)
        return pa.table({
            key: pa.array(gu[starts], pa.int64()),
            "n_gaps": pa.array(n, pa.int64()),
            "avg_gap_s": pa.array(avg, pa.float64()),
            "max_gap_s": pa.array(maxs.astype(np.float64) / 1_000_000.0,
                                  pa.float64())})

    return (events.select_columns([key, ts_col, tie_col])
            .map_batches(add_g, batch_format="pyarrow")
            .groupby("_g")
            .map_groups(lambda g: resolve(g.drop(["_g"])),
                        batch_format="pyarrow"))


_WEEK_US = 7 * 24 * 3600 * 1_000_000


def _div_trunc(x: np.ndarray, d) -> np.ndarray:
    """Integer division truncating toward zero — DuckDB's ``//``.
    numpy ``//`` FLOORS, which diverges on negative epoch timestamps
    (np -7//2 = -4, DuckDB -7//2 = -3); every window/week bucket that
    mirrors a SQL ``//`` must use this."""
    d = np.int64(d)
    return np.where(x >= 0, x // d, -((-x) // d))


def retention_cohorts(events, key: str = "user_id", ts_col: str = "ts",
                      num_groups=None):
    """Cohort retention matrix -> (cohort_week, week_offset, n_users):
    users grouped by the epoch-week of their FIRST event, counted as
    active in every later week they appear — the product-analytics
    staple (SQL: min() OVER user + date_diff + count(DISTINCT)).

    One co-partitioned pass: users hash into adaptive integer groups
    (every event of a user lands in ONE task, so "first event" and
    "distinct weeks" resolve locally and exactly), each partition runs
    one lexsort + reduceat-min + unique; the per-partition output is
    already user-deduplicated, so the final native groupby only Sums
    O(partitions x cells) partial counts. Week arithmetic is integer
    microseconds end-to-end (truncating division matching DuckDB ``//``
    — see _div_trunc) — nothing floats, nothing can drift from the SQL
    oracle."""
    from ray.data.aggregate import Sum

    from .common import adaptive_groups

    if num_groups is None:
        num_groups = adaptive_groups(events.count(), 1_000_000, lo=32)

    def add_g(b: pa.Table) -> pa.Table:
        u = b.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "_g", pa.array((u % num_groups + num_groups) % num_groups,
                           pa.int64()))

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.table({"cohort_week": pa.array([], pa.int64()),
                          "week_offset": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        u = g.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        wk = _div_trunc(g.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False), _WEEK_US)
        o = np.lexsort((wk, u))
        us, ws = u[o], wk[o]
        starts = np.flatnonzero(np.concatenate(
            ([True], us[1:] != us[:-1])))
        first = np.repeat(ws[starts], np.diff(np.append(starts, us.size)))
        # one (cohort, offset) per distinct (user, week): the sorted run
        # boundaries give distinctness without a per-user Python loop
        keep = np.concatenate(
            ([True], (us[1:] != us[:-1]) | (ws[1:] != ws[:-1])))
        cw = first[keep]
        off = ws[keep] - cw
        # partial counts per (cohort, offset) cell within this partition
        packed = cw * np.int64(1 << 20) + off       # offsets < 2^20 weeks
        uk, inv = np.unique(packed, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table({
            "cohort_week": pa.array(uk >> np.int64(20), pa.int64()),
            "week_offset": pa.array(uk & np.int64((1 << 20) - 1),
                                    pa.int64()),
            "n": pa.array(cnt, pa.int64())})

    merged = (events.select_columns([key, ts_col])
              .map_batches(add_g, batch_format="pyarrow")
              .groupby("_g")
              .map_groups(lambda g: resolve(g.drop(["_g"])),
                          batch_format="pyarrow")
              .groupby(["cohort_week", "week_offset"])
              .aggregate(Sum("n", alias_name="n_users")))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_week": b.column("cohort_week").cast(pa.int64()),
            "week_offset": b.column("week_offset").cast(pa.int64()),
            "n_users": b.column("n_users").cast(pa.int64())})

    return merged.map_batches(finish, batch_format="pyarrow")


def validity_intervals(events, num_groups: int = None):
    """SCD2 history build -> (user_id, event_id, event_type,
    valid_from, valid_to): each event in a user's change log is valid
    from its own timestamp until the user's NEXT event ((ts, event_id)
    order), the last one open-ended (NULL) — the
    slowly-changing-dimension type-2 table every warehouse derives
    from a CDC stream.

    Same co-partitioned contract as sessionize (user_id % G, ONE
    shuffle); within a group one lexsort + shifted compare emits every
    interval — no per-row loop, no window function. The hot-user note
    from `sessionize` applies; an interval depends only on the NEXT
    row, so a (user, day)-salt needs just one boundary row carried
    between salts (cheap to add if a user exceeds a worker).
    """
    from .common import adaptive_groups

    if num_groups is None:
        num_groups = adaptive_groups(max(events.count(), 1), 1_000_000,
                                     lo=16)

    def add_gkey(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "_g", pa.array(u % num_groups, pa.int64()))

    def intervals(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "event_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "valid_from": pa.array([], pa.timestamp("us")),
            "valid_to": pa.array([], pa.timestamp("us"))})
        n = g.num_rows
        if n == 0:
            return empty
        g = g.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        nxt = np.empty(n, np.int64)
        nxt[:-1] = ts[1:]
        nxt[-1] = 0
        same = np.empty(n, bool)
        same[:-1] = uid[1:] == uid[:-1]
        same[-1] = False
        vto = pa.array(np.where(same, nxt, 0), pa.int64()) \
            .cast(pa.timestamp("us"))
        vto = pc.if_else(pa.array(same), vto,
                         pa.nulls(n, pa.timestamp("us")))
        return pa.table({
            "user_id": pa.array(uid.astype(np.int64), pa.int64()),
            "event_id": pa.array(eid.astype(np.int64), pa.int64()),
            "event_type": pa.array(et.astype(object), pa.string()),
            "valid_from": pa.array(ts, pa.int64())
            .cast(pa.timestamp("us")),
            "valid_to": vto})

    return (events.select_columns(["user_id", "event_id", "ts",
                                   "event_type"])
            .map_batches(add_gkey, batch_format="pyarrow")
            .groupby("_g")
            .map_groups(lambda g: intervals(g.drop(["_g"])),
                        batch_format="pyarrow"))


def peak_concurrency(events):
    """Max concurrent active users per day -> (day, peak): a user is
    "active" from their first to their last event of the day
    (inclusive interval), and the peak is the classic +1/-1 sweep over
    interval endpoints — the load-planning number (peak simultaneous
    sessions) every capacity dashboard shows.

    Scale shape: the interval relation is ONE native (user, day)
    min/max groupby (distinct-pairs-sized); the sweep is then
    TWO-LEVEL — each (day, hour) bucket sorts only its own endpoints
    and emits (sum of deltas, max prefix), and a days-sized fold
    composes the 24 hour segments in order via the associative
    (total, max) monoid: ``max(maxA, totalA + maxB)``. No day ever
    lands in one task as a whole point list, so a day with 10^8 active
    users still splits 24 ways (finer salts — minutes — drop in the
    same fold).

    Tie rule: at equal timestamps +1 applies before -1 (inclusive
    intervals; SQL replays it as ``ORDER BY t, d DESC``).
    """
    from ray.data.aggregate import Max, Min, Sum

    day_us = 86_400 * 1_000_000
    hour_us = 3_600 * 1_000_000

    def pair_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "day": pa.array([], pa.int64()),
                          "lo": pa.array([], pa.int64()),
                          "hi": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        u = b.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        d = ts // day_us
        o = np.lexsort((ts, d, u))
        u, d, ts = u[o], d[o], ts[o]
        starts = np.flatnonzero(np.concatenate(
            ([True], (u[1:] != u[:-1]) | (d[1:] != d[:-1]))))
        ends = np.append(starts[1:], u.size) - 1
        return pa.table({
            "user_id": pa.array(u[starts], pa.int64()),
            "day": pa.array(d[starts], pa.int64()),
            "lo": pa.array(ts[starts], pa.int64()),
            "hi": pa.array(ts[ends], pa.int64())})

    iv = events.select_columns(["user_id", "ts"]) \
        .map_batches(pair_partial, batch_format="pyarrow") \
        .groupby(["user_id", "day"]).aggregate(
            Min("lo", alias_name="lo"), Max("hi", alias_name="hi"))

    def points(b: pa.Table) -> pa.Table:
        empty = pa.table({"day": pa.array([], pa.int64()),
                          "hour": pa.array([], pa.int64()),
                          "t": pa.array([], pa.int64()),
                          "d": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        day = b.column("day").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        lo = b.column("lo").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        hi = b.column("hi").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        t = np.concatenate([lo, hi])
        dd = np.concatenate([day, day])
        delta = np.concatenate([np.ones(lo.size, np.int64),
                                -np.ones(hi.size, np.int64)])
        return pa.table({
            "day": pa.array(dd, pa.int64()),
            "hour": pa.array((t % day_us) // hour_us, pa.int64()),
            "t": pa.array(t, pa.int64()),
            "d": pa.array(delta, pa.int64())})

    def hour_sweep(g: pa.Table) -> pa.Table:
        empty = pa.table({"day": pa.array([], pa.int64()),
                          "hour": pa.array([], pa.int64()),
                          "total": pa.array([], pa.int64()),
                          "maxp": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        t = g.column("t").to_numpy(zero_copy_only=False)
        d = g.column("d").to_numpy(zero_copy_only=False)
        o = np.lexsort((-d, t))        # +1 before -1 at equal t
        run = np.cumsum(d[o])
        return pa.table({
            "day": g.column("day").slice(0, 1),
            "hour": g.column("hour").slice(0, 1),
            "total": pa.array([int(run[-1])], pa.int64()),
            "maxp": pa.array([int(run.max())], pa.int64())})

    def day_fold(g: pa.Table) -> pa.Table:
        empty = pa.table({"day": pa.array([], pa.timestamp("us")),
                          "peak": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        o = np.argsort(g.column("hour").to_numpy(zero_copy_only=False))
        tot = g.column("total").to_numpy(zero_copy_only=False)[o]
        mx = g.column("maxp").to_numpy(zero_copy_only=False)[o]
        prefix = np.concatenate(([0], np.cumsum(tot)))[:-1]
        peak = int((prefix + mx).max())
        day = int(g.column("day")[0].as_py()) * day_us
        return pa.table({
            "day": pa.array([day], pa.int64()).cast(pa.timestamp("us")),
            "peak": pa.array([peak], pa.int64())})

    return iv.map_batches(points, batch_format="pyarrow") \
        .groupby(["day", "hour"]).map_groups(hour_sweep,
                                             batch_format="pyarrow") \
        .groupby("day").map_groups(day_fold, batch_format="pyarrow") \
        .sort("day")


def decay_score(events, tau_days: float = 30.0,
                ref_ts: str = "2024-02-01"):
    """Per-user exponentially time-decayed value score -> (user_id,
    decay_score): sum of value x exp(-(T_ref - ts)/tau) — the standard
    recency-weighted engagement feature (a half-life'd RFM monetary
    term; every churn/LTV feature table carries one).

    Determinism: value enters as EXACT half-away cents; each event's
    contribution is then rounded half-away to an INTEGER micro-unit
    (cents x 1e6) so the per-user sums are order-independent — the
    repo's integer-moments pattern. The exp() itself is evaluated by
    libm on both oracle sides; the 1e-6-unit rounding absorbs any
    last-ulp divergence. No shuffle wider than the per-batch
    (user, partial-sum) relation.
    """
    from ray.data.aggregate import Sum

    from .common import half_away_scaled_int, round_half_away

    tau_us = float(tau_days) * 86_400.0 * 1e6
    ref_us = int(np.datetime64(ref_ts).astype("datetime64[us]")
                 .astype(np.int64))

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "s": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        u = b.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        val = b.column("value").to_numpy(zero_copy_only=False)
        cents = half_away_scaled_int(val, 100).astype(np.float64)
        w = np.exp(-(ref_us - ts).astype(np.float64) / tau_us)
        contrib = cents * w * 1e6
        micro = (np.floor(np.abs(contrib) + 0.5)
                 * np.sign(contrib)).astype(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        sums = np.zeros(uu.size, np.int64)
        np.add.at(sums, inv, micro)
        return pa.table({"user_id": pa.array(uu, pa.int64()),
                         "s": pa.array(sums, pa.int64())})

    agg = events.select_columns(["user_id", "ts", "value"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Sum("s", alias_name="s"))

    def fin(b: pa.Table) -> pa.Table:
        s = b.column("s").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "user_id": b.column("user_id").cast(pa.int64()),
            "decay_score": pa.array(round_half_away(s / 1e8, 6),
                                    pa.float64())})

    return agg.map_batches(fin, batch_format="pyarrow").sort("user_id")


def value_hour_corr(events, key: str = "user_id", ts_col: str = "ts",
                    val_col: str = "value"):
    """Per-key Pearson correlation between event value and hour-of-day
    -> (user_id, corr_vh): the spend-pattern / bot-rhythm signal.

    Distributed EXACT second moments: each batch emits per-key integer
    partial sums (n, sum cents, sum hour, sum cents*hour, sum cents^2,
    sum hour^2) — all int64, so the merge (one native groupby Sum over
    O(batches x keys) rows) is order-independent; the correlation is ONE
    float expression over exact integers, identical on both oracle
    sides. Keys with zero variance on either axis emit nothing (SQL
    corr() would be NULL). int64 headroom: cents^2 sums overflow only
    past ~10^6 high-value events per key per 9.2e18 — far beyond any
    per-user stream; shard by (key, month) first if one ever does."""
    from ray.data.aggregate import Sum

    from .common import round_half_away

    def partial(b: pa.Table) -> pa.Table:
        cols = ["n", "sx", "sy", "sxy", "sx2", "sy2"]
        empty = pa.table({key: pa.array([], pa.int64()),
                          **{c: pa.array([], pa.int64()) for c in cols}})
        if b.num_rows == 0:
            return empty
        u = b.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        x = half_away_scaled_int(
            b.column(val_col).to_numpy(zero_copy_only=False), 100)
        y = pc.hour(b.column(ts_col)).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        o = np.argsort(u, kind="stable")
        us, xs, ys = u[o], x[o], y[o]
        starts = np.flatnonzero(np.concatenate(
            ([True], us[1:] != us[:-1])))
        sums = {
            "n": np.diff(np.append(starts, us.size)).astype(np.int64),
            "sx": np.add.reduceat(xs, starts),
            "sy": np.add.reduceat(ys, starts),
            "sxy": np.add.reduceat(xs * ys, starts),
            "sx2": np.add.reduceat(xs * xs, starts),
            "sy2": np.add.reduceat(ys * ys, starts)}
        return pa.table({key: pa.array(us[starts], pa.int64()),
                         **{c: pa.array(v, pa.int64())
                            for c, v in sums.items()}})

    merged = events.select_columns([key, ts_col, val_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(key).aggregate(*[Sum(c, alias_name=c) for c in
                                  ("n", "sx", "sy", "sxy", "sx2", "sy2")])

    def finish(b: pa.Table) -> pa.Table:
        empty = pa.table({key: pa.array([], pa.int64()),
                          "corr_vh": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        g = {c: b.column(c).cast(pa.int64()).to_numpy(
            zero_copy_only=False) for c in
            (key, "n", "sx", "sy", "sxy", "sx2", "sy2")}
        vx = g["n"] * g["sx2"] - g["sx"] * g["sx"]
        vy = g["n"] * g["sy2"] - g["sy"] * g["sy"]
        ok = (vx > 0) & (vy > 0)
        if not ok.any():
            return empty
        num = (g["n"] * g["sxy"] - g["sx"] * g["sy"])[ok] \
            .astype(np.float64)
        corr = round_half_away(
            num / (np.sqrt(vx[ok].astype(np.float64))
                   * np.sqrt(vy[ok].astype(np.float64))), 6)
        return pa.table({key: pa.array(g[key][ok], pa.int64()),
                         "corr_vh": pa.array(corr, pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow")


def burst_max(events, key: str = "user_id", ts_col: str = "ts",
              window_s: int = 60, num_groups=None):
    """Per-key peak burst rate -> (user_id, max_burst): the maximum
    number of events inside ANY rolling ``window_s`` window (rate-limit /
    bot-burst detection). Matches SQL's
    ``count(*) OVER (... RANGE BETWEEN INTERVAL w PRECEDING AND CURRENT
    ROW)`` peer semantics exactly: the frame is every event with
    timestamp in ``[t - w, t]``, duplicates included.

    Keys co-partition by hash (the sessionize contract); each partition
    resolves vectorized — one lexsort, then per-key-segment the frame
    count is two ``searchsorted`` sweeps (right bound at each ts, left
    bound at ts - w), and the per-key max is one ``reduceat``. Integer
    microseconds end-to-end."""
    from ray.data.aggregate import Max

    from .common import adaptive_groups

    if num_groups is None:
        num_groups = adaptive_groups(events.count(), 1_000_000, lo=32)
    w_us = np.int64(window_s) * 1_000_000

    def add_g(b: pa.Table) -> pa.Table:
        u = b.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "_g", pa.array((u % num_groups + num_groups) % num_groups,
                           pa.int64()))

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.table({key: pa.array([], pa.int64()),
                          "max_burst": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        u = g.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        o = np.lexsort((ts, u))
        us, tss = u[o], ts[o]
        starts = np.flatnonzero(np.concatenate(
            ([True], us[1:] != us[:-1])))
        ends = np.append(starts[1:], us.size)
        bursts = np.empty(us.size, np.int64)
        for s, e in zip(starts, ends):      # per key: two sorted sweeps
            seg = tss[s:e]
            hi = np.searchsorted(seg, seg, side="right")
            lo = np.searchsorted(seg, seg - w_us, side="left")
            bursts[s:e] = hi - lo
        mx = np.maximum.reduceat(bursts, starts)
        return pa.table({key: pa.array(us[starts], pa.int64()),
                         "max_burst": pa.array(mx, pa.int64())})

    merged = (events.select_columns([key, ts_col])
              .map_batches(add_g, batch_format="pyarrow")
              .groupby("_g")
              .map_groups(lambda g: resolve(g.drop(["_g"])),
                          batch_format="pyarrow")
              .groupby(key).aggregate(Max("max_burst",
                                          alias_name="max_burst")))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({key: b.column(key).cast(pa.int64()),
                         "max_burst": b.column("max_burst")
                         .cast(pa.int64())})

    return merged.map_batches(finish, batch_format="pyarrow")


def median_abs_dev(events, key: str = "user_id", val_col: str = "value",
                   num_groups=None):
    """Per-key robust location/scale -> (user_id, median_value, mad):
    the median and the median absolute deviation of event values — the
    outlier-resistant profile that mean/std-based monitors get wrong on
    heavy-tailed spend.

    Keys co-partition by hash (all of a key's values land in one task —
    exact medians need the full set, same contract as sessionize); each
    segment computes both medians with ``np.quantile``'s linear
    interpolation, bit-matching DuckDB ``median()`` (the green
    quantile_agg precedent). Values convert to exact integer cents
    first, so only the final interpolation/divide floats."""
    from .common import adaptive_groups, round_half_away

    if num_groups is None:
        num_groups = adaptive_groups(events.count(), 1_000_000, lo=32)

    def add_g(b: pa.Table) -> pa.Table:
        u = b.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "_g", pa.array((u % num_groups + num_groups) % num_groups,
                           pa.int64()))

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.table({key: pa.array([], pa.int64()),
                          "median_value": pa.array([], pa.float64()),
                          "mad": pa.array([], pa.float64())})
        if g.num_rows == 0:
            return empty
        u = g.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        c = half_away_scaled_int(
            g.column(val_col).to_numpy(zero_copy_only=False), 100) \
            .astype(np.float64)
        o = np.argsort(u, kind="stable")
        us, cs = u[o], c[o]
        starts = np.flatnonzero(np.concatenate(
            ([True], us[1:] != us[:-1])))
        ends = np.append(starts[1:], us.size)
        meds = np.empty(starts.size, np.float64)
        mads = np.empty(starts.size, np.float64)
        for i, (s, e) in enumerate(zip(starts, ends)):
            seg = cs[s:e]
            med = np.quantile(seg, 0.5)
            meds[i] = med
            mads[i] = np.quantile(np.abs(seg - med), 0.5)
        return pa.table({
            key: pa.array(us[starts], pa.int64()),
            "median_value": pa.array(
                round_half_away(meds / 100.0, 6), pa.float64()),
            "mad": pa.array(round_half_away(mads / 100.0, 6),
                            pa.float64())})

    return (events.select_columns([key, val_col])
            .map_batches(add_g, batch_format="pyarrow")
            .groupby("_g")
            .map_groups(lambda g: resolve(g.drop(["_g"])),
                        batch_format="pyarrow"))


def drop_rapid_repeats(events, key_cols=("user_id", "event_type"),
                       ts_col: str = "ts", id_col: str = "event_id",
                       min_gap_s: float = 5.0, num_groups=None):
    """Telemetry de-bounce -> surviving (event_id,) rows: drop an event
    when the PREVIOUS event of the same (user, type) — in (ts, id) order
    — is closer than ``min_gap_s`` (SQL LAG semantics: each event
    compares against its immediate predecessor, kept or not, so the
    rule is one window expression on both oracle sides).

    Co-partitions by the first key's hash (all of a user's events in
    one task); each partition is one lexsort + one vectorized gap test.
    Integer microseconds; a gap EQUAL to the threshold survives
    (strict <)."""
    from .common import adaptive_groups

    if num_groups is None:
        num_groups = adaptive_groups(events.count(), 1_000_000, lo=32)
    gap_us = np.int64(round(min_gap_s * 1_000_000))
    k1, k2 = key_cols

    def add_g(b: pa.Table) -> pa.Table:
        u = b.column(k1).to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "_g", pa.array((u % num_groups + num_groups) % num_groups,
                           pa.int64()))

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        u = g.column(k1).to_numpy(zero_copy_only=False).astype(np.int64)
        t2 = np.asarray(g.column(k2).to_pylist(), object)
        ts = g.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        o = np.lexsort((ids, ts, t2, u))
        us, ts2, tss, idss = u[o], t2[o], ts[o], ids[o]
        same = np.concatenate(
            ([False], (us[1:] == us[:-1]) & (ts2[1:] == ts2[:-1])))
        gap = np.empty(us.size, np.int64)
        gap[0] = gap_us
        gap[1:] = tss[1:] - tss[:-1]
        keep = ~(same & (gap < gap_us))
        return pa.table({id_col: pa.array(idss[keep], pa.int64())})

    return (events.select_columns([k1, k2, ts_col, id_col])
            .map_batches(add_g, batch_format="pyarrow")
            .groupby("_g")
            .map_groups(lambda g: resolve(g.drop(["_g"])),
                        batch_format="pyarrow"))


def ab_funnel(events, steps=("signup", "view", "purchase"),
              variant_seed: int = 5, by: str = "user_id",
              num_groups=None):
    """A/B funnel analysis -> (variant, n_users, n_converted, cvr):
    users hash-assign to variants A/B (the deterministic Weyl split —
    no RNG state, SQL-mirrorable), the denominator is users with at
    least one first-step event, and conversions are full ordered-funnel
    completions (:func:`funnel`, the salted-skew cascade). cvr rounds
    half-away at 6 dp.

    Everything after the funnel is O(users)-thin: per-batch variant
    partials -> one tiny 2-row merge."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..stages.splits import weyl_hash
    from .common import round_half_away

    step0 = steps[0]
    conv = funnel(events, steps, by=by, num_groups=num_groups)

    def variant_of(u: np.ndarray) -> np.ndarray:
        return weyl_hash(u, variant_seed) % 2       # 0 = A, 1 = B

    def variant_counts(out_col: str):
        def fn(b: pa.Table) -> pa.Table:
            empty = pa.table({"v": pa.array([], pa.int64()),
                              out_col: pa.array([], pa.int64())})
            if b.num_rows == 0:
                return empty
            v = variant_of(b.column(by).to_numpy(
                zero_copy_only=False).astype(np.int64))
            return pa.table({"v": pa.array([0, 1], pa.int64()),
                             out_col: pa.array(
                                 [int((v == 0).sum()),
                                  int((v == 1).sum())], pa.int64())})
        return fn

    conv_partial = variant_counts("n_converted")
    den_partial = variant_counts("n_users")

    def first_step_users(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("event_type"), step0)
        return pa.table({by: b.filter(m).column(by).cast(pa.int64())})

    den = events.select_columns([by, "event_type"]) \
        .map_batches(first_step_users, batch_format="pyarrow") \
        .groupby(by).count().select_columns([by]) \
        .map_batches(den_partial, batch_format="pyarrow") \
        .groupby("v").aggregate(Sum("n_users", alias_name="n_users"))
    num = conv.map_batches(conv_partial, batch_format="pyarrow") \
        .groupby("v").aggregate(Sum("n_converted",
                                    alias_name="n_converted"))

    import ray
    den_parts = [t for t in ray.get(den.materialize().to_arrow_refs())
                 if t.num_rows]
    if not den_parts:          # no first-step events: SQL returns 0 rows
        return pa.table({"variant": pa.array([], pa.string()),
                         "n_users": pa.array([], pa.int64()),
                         "n_converted": pa.array([], pa.int64()),
                         "cvr": pa.array([], pa.float64())})
    den_t = pa.concat_tables(den_parts)
    num_parts = [t for t in ray.get(num.materialize().to_arrow_refs())
                 if t.num_rows]
    n_map = {}
    if num_parts:
        nt = pa.concat_tables(num_parts)
        n_map = dict(zip(nt.column("v").cast(pa.int64()).to_pylist(),
                         nt.column("n_converted").cast(pa.int64())
                         .to_pylist()))
    rows = sorted(zip(den_t.column("v").cast(pa.int64()).to_pylist(),
                      den_t.column("n_users").cast(pa.int64())
                      .to_pylist()))
    vs = [v for v, _ in rows]
    nu = np.array([n for _, n in rows], np.int64)
    nc = np.array([n_map.get(v, 0) for v in vs], np.int64)
    return pa.table({
        "variant": pa.array(["A" if v == 0 else "B" for v in vs],
                            pa.string()),
        "n_users": pa.array(nu, pa.int64()),
        "n_converted": pa.array(nc, pa.int64()),
        "cvr": pa.array(round_half_away(
            nc.astype(np.float64) / nu, 6), pa.float64())})


def window_topk(events, window_s: int = 86400 * 7, k: int = 3,
                key: str = "user_id", ts_col: str = "ts",
                val_col: str = "value"):
    """Continuous top-k per tumbling window -> (win_start, rank, user_id,
    total_value): the top-k keys by summed value inside every
    ``window_s`` window (the streaming-top-k maintenance shape — SAP,
    ICDE 2018 — expressed as its batch equivalent).

    Per-batch integer partials on the composite (window, key) -> ONE
    native groupby Sum -> per-batch local top-k forward per window
    (candidates under the exact total order (win, -value, key)) -> a
    final per-window resolution over O(batches x k) rows. Values sum in
    exact integer cents; ranks are dense 1..k with deterministic
    key-asc tie-breaks."""
    from ray.data.aggregate import Sum

    w_us = np.int64(window_s) * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"win": pa.array([], pa.int64()),
                          key: pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        u = b.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        win = _div_trunc(b.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False), w_us)
        c = half_away_scaled_int(
            b.column(val_col).to_numpy(zero_copy_only=False), 100)
        order = np.lexsort((u, win))
        ws, us_, cs = win[order], u[order], c[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], (ws[1:] != ws[:-1]) | (us_[1:] != us_[:-1]))))
        return pa.table({
            "win": pa.array(ws[starts], pa.int64()),
            key: pa.array(us_[starts], pa.int64()),
            "cents": pa.array(np.add.reduceat(cs, starts), pa.int64())})

    summed = events.select_columns([key, ts_col, val_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["win", key]).aggregate(Sum("cents", alias_name="cents"))

    def local_topk(b: pa.Table) -> pa.Table:
        empty = pa.table({"win": pa.array([], pa.int64()),
                          key: pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        win = b.column("win").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        u = b.column(key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        c = b.column("cents").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((u, -c, win))
        ws = win[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], ws[1:] != ws[:-1])))
        rank_in_win = np.arange(ws.size) - np.repeat(
            starts, np.diff(np.append(starts, ws.size)))
        keep = order[rank_in_win < k]
        return pa.table({"win": pa.array(win[keep], pa.int64()),
                         key: pa.array(u[keep], pa.int64()),
                         "cents": pa.array(c[keep], pa.int64())})

    def resolve(g: pa.Table) -> pa.Table:
        u = g.column(key).to_numpy(zero_copy_only=False)
        c = g.column("cents").to_numpy(zero_copy_only=False)
        win = g.column("win").to_numpy(zero_copy_only=False)
        order = np.lexsort((u, -c))[:k]
        return pa.table({
            "win_start": pa.array(win[order] * w_us,
                                  pa.timestamp("us")),
            "rank": pa.array(np.arange(1, order.size + 1), pa.int64()),
            key: pa.array(u[order], pa.int64()),
            "total_value": pa.array(
                c[order].astype(np.float64) / 100.0, pa.float64())})

    return summed.map_batches(local_topk, batch_format="pyarrow") \
        .groupby("win").map_groups(resolve, batch_format="pyarrow")


def winsorize_values(events, key: str = "event_type",
                     val_col: str = "value", id_col: str = "event_id",
                     p_lo: float = 0.05, p_hi: float = 0.95):
    """Per-key winsorization -> (event_id, value_w): clip each value to
    its key's [p_lo, p_hi] exact quantiles — the standard outlier guard
    before any mean-based metric.

    Bounds come from one small-cardinality ``groupby(key).map_groups``
    (exact quantiles need the full per-key set — the quantile_agg
    contract; keys here are event types / status codes, not users) and
    broadcast as a dict; the clip itself is a stateless vectorized map,
    so the corpus never shuffles. Bounds round half-away at 6 dp on
    BOTH oracle sides before clipping — unrounded float quantiles could
    differ by 1 ulp between numpy and the SQL engine."""
    from .common import round_half_away

    def per_key(g: pa.Table) -> pa.Table:
        kt = g.schema.field(key).type
        if g.num_rows == 0:
            return pa.table({key: pa.array([], kt),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        v = g.column(val_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        lo, hi = np.quantile(v, [p_lo, p_hi])
        return pa.table({
            key: g.column(key).combine_chunks().slice(0, 1),
            "lo": pa.array(round_half_away(np.array([lo]), 6),
                           pa.float64()),
            "hi": pa.array(round_half_away(np.array([hi]), 6),
                           pa.float64())})

    bound_parts = [b for b in events.select_columns([key, val_col])
                   .groupby(key).map_groups(per_key,
                                            batch_format="pyarrow")
                   .iter_batches(batch_format="pyarrow") if b.num_rows]
    bounds = ({r[key]: (r["lo"], r["hi"])
               for r in pa.concat_tables(bound_parts).to_pylist()}
              if bound_parts else {})

    def clip(b: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "value_w": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        keys = b.column(key).to_pylist()
        v = b.column(val_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        lo = np.fromiter((bounds[x][0] for x in keys), np.float64,
                         len(keys))
        hi = np.fromiter((bounds[x][1] for x in keys), np.float64,
                         len(keys))
        return pa.table({
            id_col: b.column(id_col).cast(pa.int64()),
            "value_w": pa.array(np.minimum(np.maximum(v, lo), hi),
                                pa.float64())})

    return events.select_columns([key, val_col, id_col]) \
        .map_batches(clip, batch_format="pyarrow")


def event_type_entropy(events, key: str = "user_id",
                       type_col: str = "event_type", num_groups=None):
    """Per-key behavioral entropy -> (user_id, n_events, entropy_nats):
    Shannon entropy of the event-type distribution — uniform mixes score
    high, single-action bots score 0.

    Keys co-partition by hash; within a partition one lexsort gives
    per-(key, type) counts, and each term's contribution rounds to
    integer NANO-nats before the per-key sum — the same
    order-independence trick as source_divergence, so the result is
    bit-identical to the SQL oracle no matter how either side orders
    the (few) types. ``entropy = -sum_t p_t ln p_t``."""
    from .common import adaptive_groups

    if num_groups is None:
        num_groups = adaptive_groups(events.count(), 1_000_000, lo=32)

    def add_g(b: pa.Table) -> pa.Table:
        u = b.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "_g", pa.array((u % num_groups + num_groups) % num_groups,
                           pa.int64()))

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.table({key: pa.array([], pa.int64()),
                          "n_events": pa.array([], pa.int64()),
                          "entropy_nats": pa.array([], pa.float64())})
        if g.num_rows == 0:
            return empty
        u = g.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        t = np.asarray(g.column(type_col).to_pylist(), object)
        o = np.lexsort((t, u))
        us, ts = u[o], t[o]
        pair_start = np.concatenate(
            ([True], (us[1:] != us[:-1]) | (ts[1:] != ts[:-1])))
        pidx = np.flatnonzero(pair_start)
        c = np.diff(np.append(pidx, us.size)).astype(np.float64)
        pu = us[pidx]
        key_start = np.concatenate(([True], pu[1:] != pu[:-1]))
        kidx = np.flatnonzero(key_start)
        n = np.add.reduceat(c, kidx)
        n_of_pair = np.repeat(n, np.diff(np.append(kidx, pu.size)))
        p = c / n_of_pair
        nano = half_away_scaled_int(p * np.log(p), 10**9)
        ent = -np.add.reduceat(nano, kidx)
        return pa.table({
            key: pa.array(pu[kidx], pa.int64()),
            "n_events": pa.array(n.astype(np.int64), pa.int64()),
            "entropy_nats": pa.array(ent.astype(np.float64) / 1e9,
                                     pa.float64())})

    return (events.select_columns([key, type_col])
            .map_batches(add_g, batch_format="pyarrow")
            .groupby("_g")
            .map_groups(lambda g: resolve(g.drop(["_g"])),
                        batch_format="pyarrow"))


_TREND_EPOCH_US = 788918400000000        # 1995-01-01, keeps x offsets small


def value_trend(events, key: str = "user_id", ts_col: str = "ts",
                val_col: str = "value"):
    """Per-key OLS spend trend -> (user_id, n_events, slope): the least-
    squares slope of value (cents) over time (hours since 1995-01-01) —
    is this account ramping up or cooling off.

    Same distributed-exact-moments skeleton as value_hour_corr: each
    batch emits per-key integer partials (n, Sx, Sy, Sxy, Sx2), one
    native groupby Sum merges them order-independently, and the slope
    ``(n*Sxy - Sx*Sy) / (n*Sx2 - Sx*Sx)`` is a single float expression
    over exact integers, identical on both oracle sides. The 1995 epoch
    keeps x small: with hour offsets < 2^17 and cents < 2^27, n*Sx2
    stays inside int64 past 10^7 events per key (document-shard beyond).
    Keys with zero time variance emit nothing (vertical line)."""
    from ray.data.aggregate import Sum

    from .common import round_half_away

    def partial(b: pa.Table) -> pa.Table:
        cols = ["n", "sx", "sy", "sxy", "sx2"]
        empty = pa.table({key: pa.array([], pa.int64()),
                          **{c: pa.array([], pa.int64()) for c in cols}})
        if b.num_rows == 0:
            return empty
        u = b.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        x = _div_trunc(b.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False) - _TREND_EPOCH_US, 3_600_000_000)
        y = half_away_scaled_int(
            b.column(val_col).to_numpy(zero_copy_only=False), 100)
        o = np.argsort(u, kind="stable")
        us, xs, ys = u[o], x[o], y[o]
        starts = np.flatnonzero(np.concatenate(
            ([True], us[1:] != us[:-1])))
        sums = {"n": np.diff(np.append(starts, us.size)).astype(np.int64),
                "sx": np.add.reduceat(xs, starts),
                "sy": np.add.reduceat(ys, starts),
                "sxy": np.add.reduceat(xs * ys, starts),
                "sx2": np.add.reduceat(xs * xs, starts)}
        return pa.table({key: pa.array(us[starts], pa.int64()),
                         **{c: pa.array(v, pa.int64())
                            for c, v in sums.items()}})

    merged = events.select_columns([key, ts_col, val_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(key).aggregate(*[Sum(c, alias_name=c) for c in
                                  ("n", "sx", "sy", "sxy", "sx2")])

    def finish(b: pa.Table) -> pa.Table:
        empty = pa.table({key: pa.array([], pa.int64()),
                          "n_events": pa.array([], pa.int64()),
                          "slope": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        g = {c: b.column(c).cast(pa.int64()).to_numpy(
            zero_copy_only=False) for c in
            (key, "n", "sx", "sy", "sxy", "sx2")}
        den = g["n"] * g["sx2"] - g["sx"] * g["sx"]
        ok = den > 0
        if not ok.any():
            return empty
        num = (g["n"] * g["sxy"] - g["sx"] * g["sy"])[ok] \
            .astype(np.float64)
        slope = round_half_away(num / den[ok].astype(np.float64), 6)
        return pa.table({key: pa.array(g[key][ok], pa.int64()),
                         "n_events": pa.array(g["n"][ok], pa.int64()),
                         "slope": pa.array(slope, pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow")


def user_features(events, num_groups=None, type_gate: int = 62):
    """Consolidated per-user ML feature table — the feature-engineering
    pass a churn/quality model trains on: event count, distinct
    event-type count, exact total/max value in cents, first/last
    timestamps, whole-day activity span, and mean value.

    Scale shape: each batch pre-aggregates to ONE partial row per user
    seen in the batch (lexsort + reduceat), so the only shuffle moves
    user-level partials, never events. Distinct-type counting is exact
    without a second shuffle: the (small, gated <= ``type_gate``) type
    set maps to bits and partial masks merge with bitwise OR in the
    co-partitioned merge; n_types is the popcount. avg_value is
    (sum_cents/n)/100 in two IEEE divisions replayed in SQL.
    """
    from .common import adaptive_groups

    type_rows = events.select_columns(["event_type"]) \
        .groupby("event_type").count().take_all()
    types = sorted(r["event_type"] for r in type_rows)
    if len(types) > type_gate:
        raise ValueError(
            f"user_features: {len(types)} event types exceeds the "
            f"{type_gate}-bit mask gate — use a (user, type) distinct "
            "pre-pass instead (SCALE.md)")
    tbit = {t: 1 << i for i, t in enumerate(types)}

    if num_groups is None:
        num_groups = adaptive_groups(events.count(), 1_000_000, lo=32)

    COLS = [("user_id", pa.int64()), ("n", pa.int64()),
            ("sum_c", pa.int64()), ("max_c", pa.int64()),
            ("min_ts", pa.int64()), ("max_ts", pa.int64()),
            ("mask", pa.int64()), ("_g", pa.int64())]

    def _empty(cols):
        return pa.table({c: pa.array([], t) for c, t in cols})

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty(COLS)
        u = b.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = half_away_scaled_int(
            b.column("value").to_numpy(zero_copy_only=False), 100)
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        bits = np.fromiter((tbit[t] for t in
                            b.column("event_type").to_pylist()),
                           np.int64, b.num_rows)
        o = np.argsort(u, kind="stable")
        u, cents, ts, bits = u[o], cents[o], ts[o], bits[o]
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        uu = u[starts]
        return pa.table({
            "user_id": pa.array(uu, pa.int64()),
            "n": pa.array(np.diff(np.append(starts, u.size)), pa.int64()),
            "sum_c": pa.array(np.add.reduceat(cents, starts), pa.int64()),
            "max_c": pa.array(np.maximum.reduceat(cents, starts),
                              pa.int64()),
            "min_ts": pa.array(np.minimum.reduceat(ts, starts), pa.int64()),
            "max_ts": pa.array(np.maximum.reduceat(ts, starts), pa.int64()),
            "mask": pa.array(np.bitwise_or.reduceat(bits, starts),
                             pa.int64()),
            "_g": pa.array((uu % num_groups + num_groups) % num_groups,
                           pa.int64())})

    OUT = [("user_id", pa.int64()), ("n_events", pa.int64()),
           ("n_types", pa.int64()), ("total_value_cents", pa.int64()),
           ("max_value_cents", pa.int64()),
           ("first_ts", pa.timestamp("us")),
           ("last_ts", pa.timestamp("us")), ("span_days", pa.int64()),
           ("avg_value", pa.float64())]

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty(OUT)
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        o = np.argsort(u, kind="stable")
        u = u[o]
        cols = {c: g.column(c).to_numpy(zero_copy_only=False)[o]
                for c, _ in COLS[1:-1]}
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        n = np.add.reduceat(cols["n"], starts)
        sum_c = np.add.reduceat(cols["sum_c"], starts)
        max_c = np.maximum.reduceat(cols["max_c"], starts)
        min_ts = np.minimum.reduceat(cols["min_ts"], starts)
        max_ts = np.maximum.reduceat(cols["max_ts"], starts)
        mask = np.bitwise_or.reduceat(cols["mask"], starts)
        n_types = np.unpackbits(
            mask.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1) \
            .astype(np.int64)
        avg = (sum_c.astype(np.float64) / n.astype(np.float64)) / 100.0
        return pa.table({
            "user_id": pa.array(u[starts], pa.int64()),
            "n_events": pa.array(n, pa.int64()),
            "n_types": pa.array(n_types, pa.int64()),
            "total_value_cents": pa.array(sum_c, pa.int64()),
            "max_value_cents": pa.array(max_c, pa.int64()),
            "first_ts": pa.array(min_ts, pa.int64()).cast(
                pa.timestamp("us")),
            "last_ts": pa.array(max_ts, pa.int64()).cast(
                pa.timestamp("us")),
            "span_days": pa.array((max_ts - min_ts) // 86_400_000_000,
                                  pa.int64()),
            "avg_value": pa.array(avg, pa.float64())})

    return events.select_columns(["user_id", "event_type", "ts", "value"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("_g").map_groups(
            lambda g: merge(g.drop(["_g"])), batch_format="pyarrow") \
        .sort("user_id")


def hourly_activity(events):
    """Behavioral clock: event counts and exact total value by
    (event_type, hour-of-day) — the load-shape / bot-detection profile.
    Hour extraction is Arrow's C++ hour() kernel (same calendar math as
    DuckDB hour()); value sums in exact cents. Each batch pre-aggregates
    to <= 24 x n_types partial rows before the native groupby."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], pa.string()),
                          "hour": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        h = pc.hour(b.column("ts")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cents = half_away_scaled_int(
            b.column("value").to_numpy(zero_copy_only=False), 100)
        t = np.asarray(b.column("event_type").to_pylist(), object)
        o = np.lexsort((h, t))
        t, h, cents = t[o], h[o], cents[o]
        starts = np.flatnonzero(np.concatenate(
            ([True], (t[1:] != t[:-1]) | (h[1:] != h[:-1]))))
        return pa.table({
            "event_type": pa.array(t[starts], pa.string()),
            "hour": pa.array(h[starts], pa.int64()),
            "n": pa.array(np.diff(np.append(starts, t.size)), pa.int64()),
            "cents": pa.array(np.add.reduceat(cents, starts), pa.int64())})

    merged = events.select_columns(["event_type", "ts", "value"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "hour"]).aggregate(
            Sum("n", alias_name="n_events"),
            Sum("cents", alias_name="c"))

    def finish(b: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], pa.string()),
                          "hour": pa.array([], pa.int64()),
                          "n_events": pa.array([], pa.int64()),
                          "total_value": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        c = b.column("c").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": b.column("event_type").cast(pa.string()),
            "hour": b.column("hour").cast(pa.int64()),
            "n_events": b.column("n_events").cast(pa.int64()),
            "total_value": pa.array(c.astype(np.float64) / 100.0,
                                    pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow") \
        .sort(["event_type", "hour"])


def dau_wau(events):
    """Product-health stickiness: per calendar day, distinct active users
    (DAU), trailing-7-day distinct active users (WAU) and the DAU/WAU
    stickiness ratio -> (day, dau, wau, stickiness) sorted by day.

    Plan: the corpus collapses per batch to distinct (epoch-day, user)
    pairs, then ONE native pair groupby makes them globally distinct —
    the only corpus-sized shuffle, O(users x days) rows. DAU is a
    per-day count over that relation. The trailing window never needs a
    range join: each distinct (day, user) pair fans out to its <= 7
    target days (a bounded x7 expansion of the ALREADY-deduplicated
    relation), a second pair groupby re-distincts, and target days
    filter to days actually present (broadcast of the tiny day set).
    Ratio rounds half-away at 6 dp on both oracle sides."""
    from ray.data.aggregate import Count

    from .common import round_half_away

    def pair_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"d": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64())})
        d = pc.cast(pc.floor_temporal(b.column("ts"), unit="day"),
                    pa.date32()).cast(pa.int32()) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        u = b.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if (u >= (1 << 40)).any() or (d >= (1 << 22)).any() or \
                (d < 0).any() or (u < 0).any():
            raise ValueError("dau_wau pack gate: user/day out of range")
        packed = np.unique((d << np.int64(40)) | u)
        return pa.table({
            "d": pa.array(packed >> np.int64(40), pa.int64()),
            "user_id": pa.array(packed & np.int64((1 << 40) - 1),
                                pa.int64())})

    du = events.select_columns(["ts", "user_id"]) \
        .map_batches(pair_partial, batch_format="pyarrow") \
        .groupby(["d", "user_id"]).aggregate(Count(alias_name="_c")) \
        .select_columns(["d", "user_id"]).materialize()  # consumed twice

    dau = du.groupby("d").aggregate(Count(alias_name="dau"))

    # tiny: the set of days that actually have events
    day_set = frozenset(
        r["d"] for b in dau.iter_batches(batch_format="pyarrow")
        for r in b.select(["d"]).to_pylist())

    def expand(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"d": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64())})
        d = b.column("d").to_numpy(zero_copy_only=False)
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        td = (d[:, None] + np.arange(7, dtype=np.int64)[None, :]).ravel()
        tu = np.repeat(u, 7)
        keep = np.isin(td, np.fromiter(day_set, np.int64, len(day_set)))
        td, tu = td[keep], tu[keep]
        packed = np.unique((td << np.int64(40)) | tu)
        return pa.table({
            "d": pa.array(packed >> np.int64(40), pa.int64()),
            "user_id": pa.array(packed & np.int64((1 << 40) - 1),
                                pa.int64())})

    wau = du.map_batches(expand, batch_format="pyarrow") \
        .groupby(["d", "user_id"]).aggregate(Count(alias_name="_c")) \
        .groupby("d").aggregate(Count(alias_name="wau"))

    from .joins import hash_join
    both = hash_join(dau.select_columns(["d", "dau"]),
                     wau.select_columns(["d", "wau"]), on="d")

    def finish(b: pa.Table) -> pa.Table:
        empty = pa.table({"day": pa.array([], pa.date32()),
                          "dau": pa.array([], pa.int64()),
                          "wau": pa.array([], pa.int64()),
                          "stickiness": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        d = b.column("d").cast(pa.int64()).to_numpy(zero_copy_only=False)
        da = b.column("dau").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        wa = b.column("wau").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "day": pa.array(d.astype(np.int32), pa.int32())
                .cast(pa.date32()),
            "dau": pa.array(da, pa.int64()),
            "wau": pa.array(wa, pa.int64()),
            "stickiness": pa.array(
                round_half_away(da.astype(np.float64) / wa, 6),
                pa.float64())})

    return both.map_batches(finish, batch_format="pyarrow").sort("day")


def daily_anomaly(events, z_flag: float = 2.0):
    """Volume-anomaly monitor -> (event_type, day, n_events, z,
    anomaly): per-type daily event counts scored against that type's
    own distribution over its observed days (population z-score) — the
    pipeline-health dashboard that catches a broken producer or a bot
    burst. Types with zero variance score z = 0.

    Plan: per-batch (type, day) count partials -> ONE native pair
    groupby (O(types x days) rows, the only corpus-sized shuffle, kept
    hot for two consumers) -> per-type moment partials (d, sum, sum of
    squares — exact int64) -> tiny groupby -> O(types) moments dict in
    the scoring closure. Mean/std evaluate in the oracle's exact
    float expression order; z rounds half-away at 6 dp."""
    from ray.data.aggregate import Sum

    from .common import round_half_away

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], pa.string()),
                          "day": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        d = pc.cast(pc.floor_temporal(b.column("ts"), unit="day"),
                    pa.date32()).cast(pa.int32()) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        t = np.asarray(b.column("event_type").to_pylist(), object)
        o = np.lexsort((d, t))
        t, d = t[o], d[o]
        starts = np.flatnonzero(np.concatenate(
            ([True], (t[1:] != t[:-1]) | (d[1:] != d[:-1]))))
        return pa.table({
            "event_type": pa.array(t[starts], pa.string()),
            "day": pa.array(d[starts], pa.int64()),
            "n": pa.array(np.diff(np.append(starts, t.size)), pa.int64())})

    per_day = events.select_columns(["event_type", "ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "day"]).aggregate(Sum("n", alias_name="n_events")) \
        .map_batches(
            lambda b: pa.table({
                "event_type": b.column("event_type").cast(pa.string()),
                "day": b.column("day").cast(pa.int64()),
                "n_events": b.column("n_events").cast(pa.int64())}),
            batch_format="pyarrow").materialize()   # consumed twice

    def mom_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], pa.string()),
                          "d": pa.array([], pa.int64()),
                          "s1": pa.array([], pa.int64()),
                          "s2": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        t = np.asarray(b.column("event_type").to_pylist(), object)
        n = b.column("n_events").to_numpy(zero_copy_only=False)
        o = np.argsort(t, kind="stable")
        t, n = t[o], n[o]
        starts = np.flatnonzero(np.concatenate(([True], t[1:] != t[:-1])))
        return pa.table({
            "event_type": pa.array(t[starts], pa.string()),
            "d": pa.array(np.diff(np.append(starts, t.size)), pa.int64()),
            "s1": pa.array(np.add.reduceat(n, starts), pa.int64()),
            "s2": pa.array(np.add.reduceat(n * n, starts), pa.int64())})

    mparts = [b for b in per_day.map_batches(
        mom_partial, batch_format="pyarrow")
        .groupby("event_type").aggregate(
            Sum("d", alias_name="d"), Sum("s1", alias_name="s1"), Sum("s2", alias_name="s2"))
        .iter_batches(batch_format="pyarrow") if b.num_rows]
    moments: dict = {}
    for b in mparts:
        for t, d, s1, s2 in zip(b.column("event_type").to_pylist(),
                                b.column("d").to_pylist(),
                                b.column("s1").to_pylist(),
                                b.column("s2").to_pylist()):
            moments[t] = (int(d), int(s1), int(s2))

    def score(b: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], pa.string()),
                          "day": pa.array([], pa.date32()),
                          "n_events": pa.array([], pa.int64()),
                          "z": pa.array([], pa.float64()),
                          "anomaly": pa.array([], pa.bool_())})
        if b.num_rows == 0:
            return empty
        t = b.column("event_type").to_pylist()
        d = b.column("day").to_numpy(zero_copy_only=False)
        n = b.column("n_events").to_numpy(zero_copy_only=False)
        dd = np.array([moments[x][0] for x in t], np.float64)
        s1 = np.array([moments[x][1] for x in t], np.float64)
        s2 = np.array([moments[x][2] for x in t], np.float64)
        mean = s1 / dd
        var = s2 / dd - mean * mean
        sd = np.sqrt(np.maximum(var, 0.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(sd > 0.0, (n - mean) / sd, 0.0)
        z = round_half_away(z, 6)
        return pa.table({
            "event_type": pa.array(t, pa.string()),
            "day": pa.array(d.astype(np.int32), pa.int32())
                .cast(pa.date32()),
            "n_events": pa.array(n, pa.int64()),
            "z": pa.array(z, pa.float64()),
            "anomaly": pa.array(np.abs(z) > z_flag, pa.bool_())})

    return per_day.map_batches(score, batch_format="pyarrow") \
        .sort(["event_type", "day"])


def pareto_share(events, key: str = "user_id", val_col: str = "value",
                 top_ppm: int = 10_000):
    """Value concentration -> ONE row (n_users, k_users, top_value,
    total_value, share): what fraction of total event value the top
    ``top_ppm``/1e6 of users generate (the 80/20 diagnostic that
    decides whether per-user skew salting is worth wiring).

    Plan: per-user exact cent totals (per-batch partials -> ONE
    O(users) groupby), then the top set resolves WITHOUT any driver
    top-k: rank.global_rank assigns every user its exact global
    position by (cents, user_id) ascending (equi-depth bins + prefix
    offsets — no global sort), the top-k filter is
    ``rank > n - k``, and the two survivors-side sums stream. Driver
    holds O(1) scalars. Ties at the boundary resolve to the HIGHER
    user_id (descending-rank convention), replayed in SQL as
    ``row_number() OVER (ORDER BY cents, user_id)``."""
    from ray.data.aggregate import Sum

    from .joins import hash_join
    from .rank import global_rank

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({key: pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        k = b.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        c = half_away_scaled_int(
            b.column(val_col).to_numpy(zero_copy_only=False), 100)
        o = np.argsort(k, kind="stable")
        k, c = k[o], c[o]
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        return pa.table({
            key: pa.array(k[starts], pa.int64()),
            "cents": pa.array(np.add.reduceat(c, starts), pa.int64())})

    per_user = events.select_columns([key, val_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(key).aggregate(Sum("cents", alias_name="cents")) \
        .materialize()
    n = per_user.count()
    empty = pa.table({"n_users": pa.array([], pa.int64()),
                      "k_users": pa.array([], pa.int64()),
                      "top_value": pa.array([], pa.float64()),
                      "total_value": pa.array([], pa.float64()),
                      "share": pa.array([], pa.float64())})
    if n == 0:
        return empty
    k_top = max(1, -(-n * top_ppm // 1_000_000))
    total = int(per_user.aggregate(Sum("cents", alias_name="s"))["s"])
    ranks = global_rank(per_user, value_col="cents", id_col=key)
    joined = hash_join(ranks, per_user, on=key)

    def top_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"c": pa.array([], pa.int64())})
        r = b.column("rank").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        c = b.column("cents").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        m = r > (n - k_top)
        return pa.table({"c": pa.array([int(c[m].sum())], pa.int64())})

    top = int(joined.map_batches(top_partial, batch_format="pyarrow")
              .aggregate(Sum("c", alias_name="s"))["s"] or 0)
    share = (float(top) / float(total)) if total else 0.0
    return pa.table({
        "n_users": pa.array([n], pa.int64()),
        "k_users": pa.array([int(k_top)], pa.int64()),
        "top_value": pa.array([top / 100.0], pa.float64()),
        "total_value": pa.array([total / 100.0], pa.float64()),
        "share": pa.array([share], pa.float64())})


def active_days_histogram(events):
    """Engagement-depth distribution -> (n_active_days, n_users): how
    many users were active on exactly k distinct calendar days — the
    histogram retention models are fit against.

    Plan: the dau_wau pair spine — per-batch distinct (epoch-day, user)
    packed pairs, ONE native pair groupby to global-distinct (the only
    corpus-sized shuffle, O(users x days) rows), a per-user Count over
    that relation, then per-batch histogram partials collapse to
    O(distinct day-counts) cells before the final tiny groupby."""
    from ray.data.aggregate import Count, Sum

    def pair_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"d": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64())})
        d = pc.cast(pc.floor_temporal(b.column("ts"), unit="day"),
                    pa.date32()).cast(pa.int32()) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        u = b.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if (u >= (1 << 40)).any() or (d >= (1 << 22)).any() or \
                (d < 0).any() or (u < 0).any():
            raise ValueError(
                "active_days pack gate: user/day out of range")
        packed = np.unique((d << np.int64(40)) | u)
        return pa.table({
            "d": pa.array(packed >> np.int64(40), pa.int64()),
            "user_id": pa.array(packed & np.int64((1 << 40) - 1),
                                pa.int64())})

    per_user = events.select_columns(["ts", "user_id"]) \
        .map_batches(pair_partial, batch_format="pyarrow") \
        .groupby(["d", "user_id"]).aggregate(Count(alias_name="_c")) \
        .groupby("user_id").aggregate(Count(alias_name="nd"))

    def hist_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"n_active_days": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        nd = b.column("nd").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        uk, cnt = np.unique(nd, return_counts=True)
        return pa.table({"n_active_days": pa.array(uk, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    return per_user.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("n_active_days") \
        .aggregate(Sum("c", alias_name="n_users")) \
        .sort("n_active_days")
