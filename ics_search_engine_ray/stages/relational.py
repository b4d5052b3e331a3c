"""Relational analytics over the TPC-H-ish tables — the multi-way
join + aggregate shapes a warehouse-style pipeline needs, expressed
shuffle-minimally on Ray Data.

``revenue_by_nation`` (TPC-H Q5-like): revenue per customer nation over a
date window. The physical plan is chosen for 100 TB, not for the small
test input:

- **prune at the read**: only the 3 lineitem / 2 orders columns leave
  storage; the date window is a pyarrow filter pushed into the parquet
  scan (row-group pruning).
- **pre-aggregate before the shuffle**: lineitem collapses to one
  ``(orderkey, revenue)`` row per order per batch BEFORE the join, so the
  only large shuffle moves ~|orders| rows, never |lineitem|.
- **one large-large hash join** (lineitem-agg x orders) via the native
  hash-partitioned join; **small sides broadcast** (customer's
  custkey->nationkey map and the 25-row nation table ride the object
  store once) — above the size gate the customer lookup flips to a
  second hash join automatically.
- **exact integer arithmetic**: revenue sums in integer "cent-basis
  points" (price-cents x discount-complement-percent), so the aggregate
  is order-independent and hash-identical to the SQL oracle — no float
  summation-order drift.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa

from .common import half_away_scaled_int
from .joins import _BCAST_JOIN_ROWS, hash_join


def _rev_units(ep: np.ndarray, disc: np.ndarray) -> np.ndarray:
    """Exact revenue in 1e-4 currency units: round(price*100) cents times
    (100 - round(discount*100)) percent-complement — int64, no float sum.
    Rounding is half-AWAY-from-zero to match DuckDB round() by
    construction (np.rint is half-to-even and diverges on exact .5
    boundaries like 0.045 * 100 — data with >2 decimals would flip)."""
    cents = _half_away_100(ep)
    dpct = _half_away_100(disc)
    return cents * (100 - dpct)


def _half_away_100(x: np.ndarray) -> np.ndarray:
    """round(x * 100) half-away-from-zero as int64 (DuckDB parity).
    half_away_scaled_int is imported at MODULE level — a runtime
    relative import here would raise ModuleNotFoundError inside
    by-value-pickled worker closures."""
    return half_away_scaled_int(np.asarray(x, np.float64), 100)


def _int_group_sums(keys: np.ndarray, vals: np.ndarray):
    """(unique_keys, exact int64 per-key sums). np.bincount(weights=...)
    accumulates in float64 and silently rounds past 2^53 — this stays
    int64 all the way (scatter-add into an int64 accumulator), preserving
    the module's bit-exact-vs-SQL guarantee at any scale."""
    uk, inv = np.unique(keys, return_inverse=True)
    acc = np.zeros(uk.size, np.int64)
    np.add.at(acc, inv, vals.astype(np.int64))
    return uk, acc


def revenue_by_nation(lineitem, orders, customer, nation,
                      num_partitions: Optional[int] = None,
                      bcast_max_rows: int = _BCAST_JOIN_ROWS):
    """``SELECT n_name, sum(l_extendedprice*(1-l_discount)) ... GROUP BY``
    across lineitem |><| orders |><| customer |><| nation.

    Inputs are Datasets already projected/filtered by the caller (see
    ``read_revenue_inputs``). Returns (n_name, revenue DOUBLE) sorted by
    revenue desc.
    """
    import ray

    # 1. lineitem -> (l_orderkey, rev_units): per-batch combine first, so
    #    the join input is ~|orders| rows, not |lineitem|.
    def li_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "rev_units": pa.array([], pa.int64())})
        keys = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        rev = _rev_units(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False),
            b.column("l_discount").to_numpy(zero_copy_only=False))
        uk, sums = _int_group_sums(keys, rev)
        return pa.table({"l_orderkey": pa.array(uk, pa.int64()),
                         "rev_units": pa.array(sums, pa.int64())})

    li_agg = lineitem.map_batches(li_partial, batch_format="pyarrow")

    # 2. the one large-large shuffle: lineitem-agg x orders on orderkey.
    joined = hash_join(li_agg, orders, on="l_orderkey",
                       right_on="o_orderkey", num_partitions=num_partitions)

    # 3. custkey -> nationkey. Small side broadcasts (sorted arrays +
    #    searchsorted — one binary-search kernel per batch); above the
    #    gate, fall back to a second hash-partitioned join.
    n_cust = customer.count()
    if n_cust <= bcast_max_rows:
        ct = pa.concat_tables(ray.get(customer.to_arrow_refs()))
        ck = ct.column("c_custkey").to_numpy(zero_copy_only=False)
        nk = ct.column("c_nationkey").to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        cust_ref = ray.put((np.ascontiguousarray(ck[order]),
                            np.ascontiguousarray(nk[order].astype(np.int64))))

        def attach_nation(b: pa.Table) -> pa.Table:
            sck, snk = ray.get(cust_ref)
            if b.num_rows == 0:
                return pa.table({"n_nationkey": pa.array([], pa.int64()),
                                 "rev_units": pa.array([], pa.int64())})
            cust = b.column("o_custkey").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(sck, cust)
            pos = np.clip(pos, 0, sck.size - 1)
            ok = sck[pos] == cust          # inner semantics on misses
            nat = snk[pos[ok]]
            rev = b.column("rev_units").to_numpy(zero_copy_only=False)[ok]
            # 4. partial agg by nationkey inside the same batch (<=25 keys)
            uk, sums = _int_group_sums(nat, rev)
            return pa.table({"n_nationkey": pa.array(uk, pa.int64()),
                             "rev_units": pa.array(sums, pa.int64())})

        per_nation = joined.map_batches(attach_nation, batch_format="pyarrow")
    else:
        cust_i64 = customer.map_batches(
            lambda b: pa.table({
                "c_custkey": b.column("c_custkey").cast(pa.int64()),
                "n_nationkey": b.column("c_nationkey").cast(pa.int64())}),
            batch_format="pyarrow")
        j2 = hash_join(joined, cust_i64, on="o_custkey",
                       right_on="c_custkey", num_partitions=num_partitions)

        def partial_by_nation(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"n_nationkey": pa.array([], pa.int64()),
                                 "rev_units": pa.array([], pa.int64())})
            nat = b.column("n_nationkey").to_numpy(zero_copy_only=False)
            rev = b.column("rev_units").to_numpy(zero_copy_only=False)
            uk, sums = _int_group_sums(nat, rev)
            return pa.table({"n_nationkey": pa.array(uk, pa.int64()),
                             "rev_units": pa.array(sums, pa.int64())})

        per_nation = j2.map_batches(partial_by_nation, batch_format="pyarrow")

    # 5. final merge: input is (num_batches x <=25) rows — a tiny groupby.
    def merge_all(g: pa.Table) -> pa.Table:
        keys = g.column("n_nationkey").to_numpy(zero_copy_only=False)
        rev = g.column("rev_units").to_numpy(zero_copy_only=False)
        uk, sums = _int_group_sums(keys, rev)
        return pa.table({"n_nationkey": pa.array(uk, pa.int64()),
                         "rev_units": pa.array(sums, pa.int64())})

    nt = pa.concat_tables(ray.get(nation.to_arrow_refs()))
    names = dict(zip(nt.column("n_nationkey").to_pylist(),
                     nt.column("n_name").to_pylist()))

    def finish(g: pa.Table) -> pa.Table:
        t = merge_all(g)
        keys = t.column("n_nationkey").to_pylist()      # <=25 rows
        rev = t.column("rev_units").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_name": pa.array([names[k] for k in keys], pa.string()),
            "revenue": pa.array(rev.astype(np.float64) / 10000.0,
                                pa.float64())})

    # single-group map_groups = the classic tiny-final-merge after
    # per-batch combining (same shape as distinct_count_kmv's merge)
    out = per_nation.map_batches(
        lambda b: b.append_column("_g", pa.array([0] * b.num_rows,
                                                 pa.int8())),
        batch_format="pyarrow") \
        .groupby("_g").map_groups(lambda g: finish(g.drop(["_g"])),
                                  batch_format="pyarrow")
    return out.sort(["revenue", "n_name"], descending=[True, False])


def _nation_year_cells(lineitem, orders, customer, nation,
                       num_partitions: Optional[int] = None,
                       bcast_max_rows: int = _BCAST_JOIN_ROWS):
    """Shared cell machinery for :func:`revenue_rollup` /
    :func:`revenue_cube`: the revenue_by_nation join plan reduced to a
    bounded (n_nationkey, o_year, rev_units) integer cell Dataset
    (<= 25 x |years| rows per batch) plus the driver-side nation-name
    map. Upper grouping levels derive from these cells — never from a
    re-scan."""
    import ray

    def li_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "rev_units": pa.array([], pa.int64())})
        keys = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        rev = _rev_units(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False),
            b.column("l_discount").to_numpy(zero_copy_only=False))
        uk, sums = _int_group_sums(keys, rev)
        return pa.table({"l_orderkey": pa.array(uk, pa.int64()),
                         "rev_units": pa.array(sums, pa.int64())})

    li_agg = lineitem.map_batches(li_partial, batch_format="pyarrow")
    joined = hash_join(li_agg, orders, on="l_orderkey",
                       right_on="o_orderkey", num_partitions=num_partitions)

    # custkey -> nationkey: size-gated broadcast with the same hash-join
    # fallback as revenue_by_nation (hard rule: no un-gated O(corpus)
    # driver broadcast).
    empty_cell = pa.table({"n_nationkey": pa.array([], pa.int64()),
                           "o_year": pa.array([], pa.int64()),
                           "rev_units": pa.array([], pa.int64())})

    def cell_partial(nat, yr, rev) -> pa.Table:
        combo = nat * 10_000 + yr
        uk, sums = _int_group_sums(combo, rev)
        return pa.table({
            "n_nationkey": pa.array(uk // 10_000, pa.int64()),
            "o_year": pa.array(uk % 10_000, pa.int64()),
            "rev_units": pa.array(sums, pa.int64())})

    n_cust = customer.count()
    if n_cust <= bcast_max_rows:
        ct = pa.concat_tables(ray.get(customer.to_arrow_refs()))
        ck = ct.column("c_custkey").to_numpy(zero_copy_only=False)
        nk = ct.column("c_nationkey").to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        cust_ref = ray.put((np.ascontiguousarray(ck[order]),
                            np.ascontiguousarray(nk[order].astype(np.int64))))

        def partial(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return empty_cell
            sck, snk = ray.get(cust_ref)
            cust = b.column("o_custkey").to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(sck, cust), 0, sck.size - 1)
            ok = sck[pos] == cust
            if not ok.any():
                return empty_cell
            return cell_partial(
                snk[pos[ok]],
                b.column("o_year").to_numpy(zero_copy_only=False)[ok],
                b.column("rev_units").to_numpy(zero_copy_only=False)[ok])

        per_cell = joined.map_batches(partial, batch_format="pyarrow")
    else:
        cust_i64 = customer.map_batches(
            lambda b: pa.table({
                "c_custkey": b.column("c_custkey").cast(pa.int64()),
                "n_nationkey": b.column("c_nationkey").cast(pa.int64())}),
            batch_format="pyarrow")
        j2 = hash_join(joined, cust_i64, on="o_custkey",
                       right_on="c_custkey", num_partitions=num_partitions)

        def partial_joined(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return empty_cell
            return cell_partial(
                b.column("n_nationkey").to_numpy(zero_copy_only=False),
                b.column("o_year").to_numpy(zero_copy_only=False),
                b.column("rev_units").to_numpy(zero_copy_only=False))

        per_cell = j2.map_batches(partial_joined, batch_format="pyarrow")

    nt = pa.concat_tables(ray.get(nation.to_arrow_refs()))
    names = dict(zip(nt.column("n_nationkey").to_pylist(),
                     nt.column("n_name").to_pylist()))
    return per_cell, names


def revenue_rollup(lineitem, orders, customer, nation,
                   num_partitions: Optional[int] = None,
                   bcast_max_rows: int = _BCAST_JOIN_ROWS):
    """``GROUP BY ROLLUP(n_name, o_year)`` revenue: per (nation, order
    year), per-nation subtotal, grand total — the two upper levels are
    derived from the base aggregate inside the final tiny merge, never by
    re-scanning the inputs. Same join plan as :func:`revenue_by_nation`
    (shared via :func:`_nation_year_cells`); the per-batch partial agg
    keys on (nationkey, year), still <= 25 x |years| rows per batch.
    Orders rows carry ``o_year`` computed at the scan. Output: (n_name,
    o_year, revenue) with SQL-ROLLUP nulls."""
    per_cell, names = _nation_year_cells(
        lineitem, orders, customer, nation,
        num_partitions=num_partitions, bcast_max_rows=bcast_max_rows)

    def finish(g: pa.Table) -> pa.Table:
        nat = g.column("n_nationkey").to_numpy(zero_copy_only=False)
        yr = g.column("o_year").to_numpy(zero_copy_only=False)
        rev = g.column("rev_units").to_numpy(zero_copy_only=False)
        combo = nat * 10_000 + yr
        uk, sums = _int_group_sums(combo, rev)
        base_n = uk // 10_000
        base_y = uk % 10_000
        # rollup level 1: per-nation totals; level 2: grand total
        un, nsums = _int_group_sums(base_n, sums)
        out_name = ([names[k] for k in base_n] + [names[k] for k in un]
                    + [None])
        out_year = (list(base_y) + [None] * un.size + [None])
        out_rev = np.concatenate([sums, nsums, [sums.sum()]])
        return pa.table({
            "n_name": pa.array(out_name, pa.string()),
            "o_year": pa.array(out_year, pa.int64()),
            "revenue": pa.array(out_rev.astype(np.float64) / 10000.0,
                                pa.float64())})

    return per_cell.map_batches(
        lambda b: b.append_column("_g", pa.array([0] * b.num_rows,
                                                 pa.int8())),
        batch_format="pyarrow") \
        .groupby("_g").map_groups(lambda g: finish(g.drop(["_g"])),
                                  batch_format="pyarrow")


def read_rollup_inputs(sf_dir: str):
    """Pruned reads for :func:`revenue_rollup`; orders carry an
    ``o_year`` column computed vectorized at the scan."""
    import pyarrow.compute as pc
    import ray.data as rd

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def add_year(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "o_custkey": b.column("o_custkey"),
            "o_year": pc.cast(pc.year(b.column("o_orderdate")),
                              pa.int64())})

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(add_year, batch_format="pyarrow")
    customer = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])
    nation = rd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"])
    return li, orders, customer, nation


def read_revenue_inputs(sf_dir: str, date_lo: str = "1996-01-01",
                        date_hi: str = "1998-01-01"):
    """Pruned reads for :func:`revenue_by_nation`: only needed columns,
    date window pushed into the orders scan as a pyarrow dataset filter."""
    import pyarrow.compute as pc
    import ray.data as rd

    lo = pa.scalar(np.datetime64(date_lo, "us"),
                   pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"),
                   pa.timestamp("us"))
    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
        filter=(pc.field("o_orderdate") >= lo)
               & (pc.field("o_orderdate") < hi))
    customer = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])
    nation = rd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"])
    return li, orders, customer, nation


def pricing_summary(lineitem):
    """TPC-H Q1 pricing summary report per (l_returnflag, l_linestatus):
    sum_qty, sum_base_price, sum_disc_price, sum_charge, avg_qty,
    avg_price, avg_disc, count_order — the canonical wide-scan aggregate.

    Bit-exact vs SQL by integer arithmetic: quantities/prices/discount/
    tax convert to half-away-rounded integer hundredths ONCE per row
    (common.half_away_scaled_int == DuckDB round()), every sum is int64
    (disc_price in 1e-4 units, charge in 1e-6), and only the final
    divisions produce floats (round_half_away(., 6) both sides).

    Per-batch (flag, status) partials via lexsort+reduceat -> native
    groupby Sum over at most O(batches x 6) rows — the full relation
    never shuffles.
    """
    from ray.data.aggregate import Sum

    from .common import half_away_scaled_int, round_half_away

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "l_returnflag": pa.array([], pa.string()),
            "l_linestatus": pa.array([], pa.string()),
            **{c: pa.array([], pa.int64())
               for c in ("q", "bp", "dp", "ch", "dc", "n")}})
        if b.num_rows == 0:
            return empty
        rf = np.asarray(b.column("l_returnflag").to_pylist(), object)
        ls = np.asarray(b.column("l_linestatus").to_pylist(), object)
        qty = half_away_scaled_int(
            b.column("l_quantity").to_numpy(zero_copy_only=False), 100)
        cents = half_away_scaled_int(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False), 100)
        dpct = half_away_scaled_int(
            b.column("l_discount").to_numpy(zero_copy_only=False), 100)
        tpct = half_away_scaled_int(
            b.column("l_tax").to_numpy(zero_copy_only=False), 100)
        disc_price = cents * (100 - dpct)             # 1e-4 units
        charge = disc_price * (100 + tpct)            # 1e-6 units
        key = np.char.add(np.char.add(rf.astype(str), "|"), ls.astype(str))
        o = np.argsort(key, kind="stable")
        ks = key[o]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        ends = np.append(starts[1:], ks.size)
        sums = {c: np.add.reduceat(v[o], starts).astype(np.int64)
                for c, v in (("q", qty), ("bp", cents),
                             ("dp", disc_price), ("ch", charge),
                             ("dc", dpct))}
        return pa.table({
            "l_returnflag": pa.array(rf[o][starts], pa.string()),
            "l_linestatus": pa.array(ls[o][starts], pa.string()),
            **{c: pa.array(v, pa.int64()) for c, v in sums.items()},
            "n": pa.array((ends - starts).astype(np.int64), pa.int64())})

    cols = ["l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax"]
    merged = (lineitem.select_columns(cols)
              .map_batches(partial, batch_format="pyarrow")
              .groupby(["l_returnflag", "l_linestatus"])
              .aggregate(*[Sum(c, alias_name=c)
                           for c in ("q", "bp", "dp", "ch", "dc", "n")]))

    def finish(b: pa.Table) -> pa.Table:
        g = {c: b.column(c).cast(pa.int64()).to_numpy(zero_copy_only=False)
             for c in ("q", "bp", "dp", "ch", "dc", "n")}
        n = g["n"].astype(np.float64)
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "sum_qty": pa.array(g["q"] / 100.0, pa.float64()),
            "sum_base_price": pa.array(g["bp"] / 100.0, pa.float64()),
            "sum_disc_price": pa.array(g["dp"] / 1e4, pa.float64()),
            "sum_charge": pa.array(g["ch"] / 1e6, pa.float64()),
            "avg_qty": pa.array(
                round_half_away(g["q"] / 100.0 / n, 6), pa.float64()),
            "avg_price": pa.array(
                round_half_away(g["bp"] / 100.0 / n, 6), pa.float64()),
            "avg_disc": pa.array(
                round_half_away(g["dc"] / 100.0 / n, 6), pa.float64()),
            "count_order": pa.array(g["n"], pa.int64())})

    return merged.map_batches(finish, batch_format="pyarrow")


def part_type_revenue(lineitem, part, max_bcast_rows=_BCAST_JOIN_ROWS):
    """Dimension-enrichment aggregate: discounted revenue per part type
    -> (p_type, n_items, revenue). The star-schema staple (fact table x
    small dimension): ``part`` projects to (p_partkey, p_type) and ships
    ONCE via the broadcast-join gate (a dimension at any realistic scale;
    above the gate swap in hash_join — documented, not silently slow).
    Revenue sums in exact 1e-4 integer units (the _rev_units identity the
    green revenue oracles prove), per-batch lexsort+reduceat partials ->
    native groupby Sum; the fact relation never shuffles."""
    from ray.data.aggregate import Sum

    from .common import round_half_away  # noqa: F401 (parity w/ siblings)
    from .joins import broadcast_join

    dim = part.select_columns(["p_partkey", "p_type"])
    joined = broadcast_join(
        lineitem.select_columns(["l_partkey", "l_extendedprice",
                                 "l_discount"]),
        dim, on="l_partkey", right_on="p_partkey",
        max_rows=max_bcast_rows)

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"p_type": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "rev": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        t = np.asarray(b.column("p_type").to_pylist(), object)
        rev = _rev_units(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False),
            b.column("l_discount").to_numpy(zero_copy_only=False))
        o = np.argsort(t, kind="stable")
        ts = t[o]
        starts = np.flatnonzero(np.concatenate(([True], ts[1:] != ts[:-1])))
        ends = np.append(starts[1:], ts.size)
        # np.unique sorts ascending like argsort: uk aligns with starts
        uk, sums = _int_group_sums(t, rev)
        return pa.table({
            "p_type": pa.array(uk, pa.string()),
            "n": pa.array((ends - starts).astype(np.int64), pa.int64()),
            "rev": pa.array(sums, pa.int64())})

    merged = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("p_type").aggregate(Sum("n", alias_name="n_items"),
                                     Sum("rev", alias_name="rev"))

    def finish(b: pa.Table) -> pa.Table:
        r = b.column("rev").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "p_type": b.column("p_type"),
            "n_items": b.column("n_items").cast(pa.int64()),
            "revenue": pa.array(r.astype(np.float64) / 10000.0,
                                pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow")


def forecast_revenue(lineitem, disc_lo: int = 5, disc_hi: int = 7,
                     qty_max: float = 24.0):
    """TPC-H Q6 forecast-revenue-change: one global SUM over a filtered
    scan -> a single row ``(n_items, revenue)``.

    The whole relation streams through stateless per-batch partials; the
    ONLY thing that ever leaves a task is one (count, int64-units) pair
    per batch, so there is no shuffle at all — the cheapest possible
    physical plan for a filter + global aggregate at 100 TB. The caller
    pushes the date window into the parquet scan (row-group pruning);
    the discount/quantity predicates are vectorized here because the
    discount test is on the CENTS value (``round(l_discount*100)``), not
    the raw float — keeping the filter bit-identical to the SQL oracle.
    Revenue accumulates in exact 1e-4 integer units (cents x discount
    percent), so summation order cannot drift."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"n": pa.array([], pa.int64()),
                          "rev": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        dpct = _half_away_100(b.column("l_discount").to_numpy(
            zero_copy_only=False))
        m = (dpct >= disc_lo) & (dpct <= disc_hi) & (qty < qty_max)
        if not m.any():
            return empty
        cents = _half_away_100(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[m])
        rev = int((cents * dpct[m]).sum())
        return pa.table({"n": pa.array([int(m.sum())], pa.int64()),
                         "rev": pa.array([rev], pa.int64())})

    agg = lineitem.map_batches(partial, batch_format="pyarrow") \
        .aggregate(Sum("n", alias_name="n"), Sum("rev", alias_name="rev"))
    n = int(agg.get("n") or 0)
    rev = int(agg.get("rev") or 0)
    return pa.table({"n_items": pa.array([n], pa.int64()),
                     "revenue": pa.array([rev / 10000.0], pa.float64())})


def promo_revenue(lineitem, part, max_bcast_rows=_BCAST_JOIN_ROWS):
    """TPC-H Q14 promotion-effect: percentage of revenue in a date window
    coming from PROMO-type parts -> one row ``(promo_pct,)``.

    Fact x dimension: ``part`` projects to (p_partkey, p_type) and ships
    ONCE through the gated broadcast join (hash_join is the documented
    path above the gate); the lineitem relation never shuffles. Both the
    promo and the total revenue accumulate in exact 1e-4 integer units;
    the single float division happens once on two driver-side scalars."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .joins import broadcast_join

    joined = broadcast_join(
        lineitem.select_columns(["l_partkey", "l_extendedprice",
                                 "l_discount"]),
        part.select_columns(["p_partkey", "p_type"]),
        on="l_partkey", right_on="p_partkey", max_rows=max_bcast_rows)

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"promo": pa.array([], pa.int64()),
                          "total": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        rev = _rev_units(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False),
            b.column("l_discount").to_numpy(zero_copy_only=False))
        is_promo = pc.equal(b.column("p_type"), "PROMO") \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "promo": pa.array([int(rev[is_promo].sum())], pa.int64()),
            "total": pa.array([int(rev.sum())], pa.int64())})

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .aggregate(Sum("promo", alias_name="promo"),
                   Sum("total", alias_name="total"))
    promo = int(agg.get("promo") or 0)
    total = int(agg.get("total") or 0)
    from .common import round_half_away
    pct = float(round_half_away(np.array([100.0 * promo / total]),
                                6)[0]) if total else 0.0
    return pa.table({"promo_pct": pa.array([pct], pa.float64())})


def top_unshipped_orders(lineitem, orders, customer,
                         segment: str = "BUILDING", k: int = 10,
                         max_bcast_rows=_BCAST_JOIN_ROWS):
    """TPC-H Q3 shipping-priority: top-k orders by outstanding revenue for
    one market segment -> (o_orderkey, o_orderdate, revenue) rows.

    Physical plan, chosen for the 100 TB shapes:

    - the caller pushes BOTH date predicates into the scans
      (l_shipdate > cutoff on lineitem, o_orderdate < cutoff on orders);
    - customer filters to the segment and collapses to a custkey set;
      :func:`~.joins.semi_join` picks gated-broadcast vs co-partitioned
      anti-shuffle automatically, so orders never re-shuffles for it;
    - lineitem collapses per batch to (orderkey, rev_units) partials
      BEFORE the one large-large hash join, so the join moves
      ~|qualifying orders| rows, never |lineitem|;
    - the post-join groupby keys on (orderkey, orderdate-as-int64us) —
      orderdate is functionally dependent on orderkey, riding along
      costs nothing and avoids a second join to re-attach it;
    - global top-k WITHOUT a global sort: every merged batch forwards
      only its local top-k candidates under the total order
      (rev desc, orderdate asc, orderkey asc), then one tiny sort+limit
      finishes on O(batches x k) rows.

    Revenue is exact 1e-4 integer units end-to-end, so the top-k
    membership and its tie-breaks are bit-identical to the SQL oracle."""
    from ray.data.aggregate import Sum

    from .joins import hash_join, semi_join

    cust = customer.select_columns(["c_custkey"])
    ords = semi_join(orders, cust, on="o_custkey", right_on="c_custkey",
                     max_bcast_rows=max_bcast_rows)

    def ords_proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
            "o_date_us": b.column("o_orderdate").cast(pa.int64())})

    def li_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "rev_units": pa.array([], pa.int64())})
        keys = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        rev = _rev_units(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False),
            b.column("l_discount").to_numpy(zero_copy_only=False))
        uk, sums = _int_group_sums(keys, rev)
        return pa.table({"l_orderkey": pa.array(uk, pa.int64()),
                         "rev_units": pa.array(sums, pa.int64())})

    li_agg = lineitem.map_batches(li_partial, batch_format="pyarrow")
    joined = hash_join(
        li_agg, ords.map_batches(ords_proj, batch_format="pyarrow"),
        on="l_orderkey", right_on="o_orderkey")
    merged = joined.groupby(["l_orderkey", "o_date_us"]) \
        .aggregate(Sum("rev_units", alias_name="rev"))

    def local_topk(b: pa.Table) -> pa.Table:
        empty = pa.table({"o_orderkey": pa.array([], pa.int64()),
                          "o_date_us": pa.array([], pa.int64()),
                          "rev": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        rev = b.column("rev").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        okey = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        odate = b.column("o_date_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, odate, -rev))[:k]
        return pa.table({
            "o_orderkey": pa.array(okey[order], pa.int64()),
            "o_date_us": pa.array(odate[order], pa.int64()),
            "rev": pa.array(rev[order], pa.int64())})

    cand = merged.map_batches(local_topk, batch_format="pyarrow") \
        .sort(["rev", "o_date_us", "o_orderkey"],
              descending=[True, False, False]).limit(k)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "o_orderdate": b.column("o_date_us").cast(pa.timestamp("us")),
            "revenue": pa.array(
                b.column("rev").to_numpy(zero_copy_only=False)
                .astype(np.float64) / 10000.0, pa.float64())})

    return cand.map_batches(finish, batch_format="pyarrow")


def large_orders(lineitem, orders, customer, min_qty: float = 250.0,
                 k: int = 100, max_bcast_rows=_BCAST_JOIN_ROWS):
    """TPC-H Q18 large-volume customers: orders whose total quantity
    exceeds ``min_qty``, with the buyer's name -> top-k by
    (o_totalprice desc, o_orderkey) of
    (c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty).

    Plan: lineitem collapses per batch to (orderkey, qty-in-1e-2-units)
    partials -> ONE native groupby Sum (the only corpus-sized shuffle)
    -> the HAVING filter. Orders exceeding ``min_qty`` are rare by
    construction, so the surviving relation is tiny: it rides the gated
    broadcast join onto orders, and the enriched (still tiny) result
    broadcasts onto customer — neither big relation ever shuffles.
    Above the gate (a pathological threshold) the operator flips to two
    native hash-partitioned joins automatically. Quantities are exact
    integer hundredths end-to-end."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .joins import broadcast_join

    def qty_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "q": pa.array([], pa.int64())})
        keys = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        q = _half_away_100(b.column("l_quantity").to_numpy(
            zero_copy_only=False))
        uk, sums = _int_group_sums(keys, q)
        return pa.table({"l_orderkey": pa.array(uk, pa.int64()),
                         "q": pa.array(sums, pa.int64())})

    thresh = int(round(min_qty * 100))
    heavy = lineitem.map_batches(qty_partial, batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(Sum("q", alias_name="q")) \
        .map_batches(
            lambda b: b.set_column(
                b.schema.get_field_index("q"),
                "q", b.column("q").cast(pa.int64()))
            .filter(pc.greater(b.column("q").cast(pa.int64()), thresh)),
            batch_format="pyarrow")

    heavy = heavy.materialize()            # consumed twice (gate + join)
    ords_proj = orders.select_columns(["o_orderkey", "o_custkey",
                                       "o_orderdate", "o_totalprice"])
    cust_proj = customer.select_columns(["c_custkey", "c_name"])
    if heavy.count() <= max_bcast_rows:
        with_orders = broadcast_join(
            ords_proj, heavy, on="o_orderkey", right_on="l_orderkey",
            max_rows=max_bcast_rows)
        enriched = broadcast_join(
            cust_proj, with_orders, on="c_custkey", right_on="o_custkey",
            max_rows=max_bcast_rows)
    else:
        # pathological threshold: the heavy set is order-sized — two
        # native hash-partitioned joins instead of broadcasts (the
        # native join keeps only the LEFT key column when names differ,
        # so c_custkey is restored from the surviving join key)
        with_orders = hash_join(heavy, ords_proj, on="l_orderkey",
                                right_on="o_orderkey") \
            .map_batches(
                lambda b: b.append_column(
                    "o_orderkey", b.column("l_orderkey").cast(pa.int64())),
                batch_format="pyarrow")
        enriched = hash_join(with_orders, cust_proj, on="o_custkey",
                             right_on="c_custkey") \
            .map_batches(
                lambda b: b.append_column(
                    "c_custkey", b.column("o_custkey").cast(pa.int64())),
                batch_format="pyarrow")

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_name": b.column("c_name"),
            "c_custkey": b.column("c_custkey").cast(pa.int64()),
            "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
            "o_orderdate": b.column("o_orderdate"),
            "o_totalprice": b.column("o_totalprice"),
            "total_qty": pa.array(
                b.column("q").to_numpy(zero_copy_only=False)
                .astype(np.float64) / 100.0, pa.float64())})

    return enriched.map_batches(finish, batch_format="pyarrow") \
        .sort(["o_totalprice", "o_orderkey"],
              descending=[True, False]).limit(k)


def order_count_distribution(orders, customer):
    """TPC-H Q13 customer-distribution: how many customers placed exactly
    N orders, INCLUDING the zero-order bucket -> (c_count, custdist).

    The classic formulation is a left-outer join; the distributed plan
    here needs NO join at all: orders collapse to per-customer counts
    with one native groupby (the only corpus shuffle), the count
    histogram is a second (tiny, O(distinct counts)) groupby, and the
    zero bucket is closed-form — ``|customer| - |customers with >=1
    order|`` — two streaming scalar counts. Nothing customer-sized ever
    moves."""
    from ray.data.aggregate import Sum

    counts = orders.groupby("o_custkey").count().materialize()
    n_customers = customer.count()
    n_with_orders = counts.count()

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"c_count": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        c = b.column("count()").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        uk, sums = _int_group_sums(c, np.ones(c.size, np.int64))
        return pa.table({"c_count": pa.array(uk, pa.int64()),
                         "n": pa.array(sums, pa.int64())})

    hist = counts.map_batches(partial, batch_format="pyarrow") \
        .groupby("c_count").aggregate(Sum("n", alias_name="custdist"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"c_count": b.column("c_count"),
                         "custdist": b.column("custdist").cast(pa.int64())})

    out = hist.map_batches(finish, batch_format="pyarrow")
    n_zero = n_customers - n_with_orders
    if n_zero == 0:        # SQL's groupby emits no empty zero bucket
        return out
    zero = pa.table({"c_count": pa.array([0], pa.int64()),
                     "custdist": pa.array([n_zero], pa.int64())})
    import ray.data as rd
    return out.union(rd.from_arrow(zero))


def top_suppliers(lineitem, supplier, max_bcast_rows=_BCAST_JOIN_ROWS):
    """TPC-H Q15 top supplier(s): supplier(s) with the MAX revenue over a
    shipping window (window pushed into the scan by the caller) ->
    (s_suppkey, s_name, total_revenue), all ties.

    Plan: per-batch (suppkey, rev-units) partials -> one native groupby
    Sum (O(suppliers) rows shuffle, never lineitem) -> a streaming Max
    for the global best -> the winner set (>=1 row, almost always tiny)
    broadcasts onto supplier, which never shuffles. Revenue in exact
    1e-4 integer units makes the max and its tie set scale-invariant."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum

    from .joins import broadcast_join

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"l_suppkey": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.int64())})
        keys = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        rev = _rev_units(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False),
            b.column("l_discount").to_numpy(zero_copy_only=False))
        uk, sums = _int_group_sums(keys, rev)
        return pa.table({"l_suppkey": pa.array(uk, pa.int64()),
                         "rev": pa.array(sums, pa.int64())})

    per_supp = lineitem.map_batches(partial, batch_format="pyarrow") \
        .groupby("l_suppkey").aggregate(Sum("rev", alias_name="rev")) \
        .map_batches(
            lambda b: pa.table({
                "l_suppkey": b.column("l_suppkey").cast(pa.int64()),
                "rev": b.column("rev").cast(pa.int64())}),
            batch_format="pyarrow").materialize()   # consumed twice
    best = per_supp.aggregate(Max("rev", alias_name="m")).get("m")
    if best is None:
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "total_revenue": pa.array([], pa.float64())})
    winners = per_supp.map_batches(
        lambda b: b.filter(pc.equal(b.column("rev"), best)),
        batch_format="pyarrow")

    enriched = broadcast_join(
        supplier.select_columns(["s_suppkey", "s_name"]), winners,
        on="s_suppkey", right_on="l_suppkey", max_rows=max_bcast_rows)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "s_suppkey": b.column("s_suppkey").cast(pa.int64()),
            "s_name": b.column("s_name"),
            "total_revenue": pa.array(
                b.column("rev").to_numpy(zero_copy_only=False)
                .astype(np.float64) / 10000.0, pa.float64())})

    return enriched.map_batches(finish, batch_format="pyarrow")


def idle_rich_customers(customer, orders, max_bcast_rows=_BCAST_JOIN_ROWS):
    """TPC-H Q22 global-relation sales opportunity: customers with an
    account balance above the (positive-balance) global average who never
    placed an order, grouped by nation ->
    (c_nationkey, numcust, totacctbal).

    Plan: the correlated scalar subquery becomes two streaming integer
    scalars (sum of positive balances in cents, their count) — the
    above-average test is the EXACT integer cross-multiplication
    ``bal_cents * cnt > sum_cents`` on both sides, so no float average
    ever exists to drift. The rich customers then anti-join the
    distinct active custkeys via :func:`~.joins.anti_join_keys` — gated
    broadcast 'left anti' per batch below the gate, key-hash
    co-partitioned complement above it (so the customer relation never
    shuffles in the common case and the operator still works when
    active keys outgrow the object store). The final per-nation rollup
    is a tiny groupby Sum."""
    from ray.data.aggregate import Sum

    from .joins import anti_join_keys

    def bal_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"s": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        cents = _half_away_100(b.column("c_acctbal").to_numpy(
            zero_copy_only=False))
        pos = cents[cents > 0]
        if pos.size == 0:
            return empty
        return pa.table({"s": pa.array([int(pos.sum())], pa.int64()),
                         "c": pa.array([int(pos.size)], pa.int64())})

    agg = customer.map_batches(bal_partial, batch_format="pyarrow") \
        .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="c"))
    sum_cents = int(agg.get("s") or 0)
    cnt = int(agg.get("c") or 0)

    def rich_only(b: pa.Table) -> pa.Table:
        empty = pa.table({"c_custkey": pa.array([], pa.int64()),
                          "c_nationkey": pa.array([], pa.int64()),
                          "bal_cents": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        cents = _half_away_100(b.column("c_acctbal").to_numpy(
            zero_copy_only=False))
        rich = cents * cnt > sum_cents
        if not rich.any():
            return empty
        return pa.table({
            "c_custkey": pa.array(
                b.column("c_custkey").to_numpy(
                    zero_copy_only=False)[rich].astype(np.int64),
                pa.int64()),
            "c_nationkey": pa.array(
                b.column("c_nationkey").to_numpy(
                    zero_copy_only=False)[rich].astype(np.int64),
                pa.int64()),
            "bal_cents": pa.array(cents[rich], pa.int64())})

    idle = anti_join_keys(
        customer.map_batches(rich_only, batch_format="pyarrow"),
        orders.select_columns(["o_custkey"]),
        on="c_custkey", right_on="o_custkey",
        max_bcast_rows=max_bcast_rows)

    def nation_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"c_nationkey": pa.array([], pa.int64()),
                          "numcust": pa.array([], pa.int64()),
                          "bal": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        nat = b.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        bal = b.column("bal_cents").to_numpy(zero_copy_only=False)
        uk, sums = _int_group_sums(nat, bal)
        _, ns = _int_group_sums(nat, np.ones(nat.size, np.int64))
        return pa.table({"c_nationkey": pa.array(uk, pa.int64()),
                         "numcust": pa.array(ns, pa.int64()),
                         "bal": pa.array(sums, pa.int64())})

    from ray.data.aggregate import Sum as _Sum
    merged = idle.map_batches(nation_partial, batch_format="pyarrow") \
        .groupby("c_nationkey").aggregate(
            _Sum("numcust", alias_name="numcust"),
            _Sum("bal", alias_name="bal"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_nationkey": b.column("c_nationkey").cast(pa.int64()),
            "numcust": b.column("numcust").cast(pa.int64()),
            "totacctbal": pa.array(
                b.column("bal").to_numpy(zero_copy_only=False)
                .astype(np.float64) / 100.0, pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow")


def small_qty_revenue(lineitem, part, brand: str,
                      max_bcast_rows=_BCAST_JOIN_ROWS):
    """TPC-H Q17 small-quantity-order revenue: average yearly revenue
    lost if orders below 20%% of a part's average quantity were not
    filled, for one brand -> one row ``(avg_yearly,)``.

    The correlated per-part average becomes two streaming passes over a
    brand-pruned lineitem — neither shuffles:

    - pass 1: brand part keys broadcast as an Arrow 'left semi' filter;
      per-batch (partkey, qty-units, count) partials -> native groupby
      Sum -> the per-part stats relation, O(parts of one brand);
    - pass 2: those stats broadcast back (gated) and the quantity test
      is the EXACT integer cross-multiplication ``qty_units * 5 * cnt <
      sum_qty_units`` (i.e. qty < 0.2 * avg without ever forming the
      float average); matching extendedprice sums in integer cents.

    The single float division (by 100 * 7 years) happens once on the
    driver."""
    import ray
    from ray.data.aggregate import Sum

    from .joins import semi_join

    import pyarrow.compute as _pc

    def brand_keys(b: pa.Table) -> pa.Table:
        return b.filter(_pc.equal(b.column("p_brand"), brand)) \
            .select(["p_partkey"])

    bkeys = part.map_batches(brand_keys, batch_format="pyarrow")
    # semi_join broadcasts the brand keys below the gate and
    # co-partitions above it — one brand's parts grow with scale factor
    li_b = semi_join(lineitem, bkeys, on="l_partkey",
                     right_on="p_partkey",
                     max_bcast_rows=max_bcast_rows).materialize()

    def stat_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "sq": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        keys = b.column("l_partkey").to_numpy(zero_copy_only=False)
        q = _half_away_100(b.column("l_quantity").to_numpy(
            zero_copy_only=False))
        uk, sums = _int_group_sums(keys, q)
        _, ns = _int_group_sums(keys, np.ones(keys.size, np.int64))
        return pa.table({"l_partkey": pa.array(uk, pa.int64()),
                         "sq": pa.array(sums, pa.int64()),
                         "cnt": pa.array(ns, pa.int64())})

    stats = li_b.map_batches(stat_partial, batch_format="pyarrow") \
        .groupby("l_partkey").aggregate(Sum("sq", alias_name="sq"),
                                        Sum("cnt", alias_name="cnt")) \
        .materialize()
    if stats.count() > max_bcast_rows:
        # scale path: per-part stats stay a Dataset and ONE hash_join
        # carries them back onto the brand-pruned lineitem; the exact
        # integer cross-multiplication test runs on the joined rows
        from .joins import hash_join

        li_sel = li_b.select_columns(
            ["l_partkey", "l_quantity", "l_extendedprice"])
        joined = hash_join(li_sel, stats, on="l_partkey")

        def rev_joined(b: pa.Table) -> pa.Table:
            empty = pa.table({"cents": pa.array([], pa.int64())})
            if b.num_rows == 0:
                return empty
            q = _half_away_100(b.column("l_quantity").to_numpy(
                zero_copy_only=False))
            sq = b.column("sq").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            cnt = b.column("cnt").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            small = q * 5 * cnt < sq
            if not small.any():
                return empty
            cents = _half_away_100(b.column("l_extendedprice")
                                   .to_numpy(zero_copy_only=False)[small])
            return pa.table({"cents": pa.array([int(cents.sum())],
                                               pa.int64())})

        total = joined.map_batches(rev_joined, batch_format="pyarrow") \
            .aggregate(Sum("cents", alias_name="cents"))
        cents = int(total.get("cents") or 0)
        from .common import round_half_away
        return pa.table({"avg_yearly": pa.array(
            [float(round_half_away(
                np.array([cents / 100.0 / 7.0]), 6)[0])],
            pa.float64())})
    s_parts = [t for t in ray.get(stats.to_arrow_refs())
               if t.num_rows]
    s_tbl = (pa.concat_tables(s_parts) if s_parts else pa.table(
        {"l_partkey": pa.array([], pa.int64()),
         "sq": pa.array([], pa.int64()),
         "cnt": pa.array([], pa.int64())})).combine_chunks()
    pk = s_tbl.column("l_partkey").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    order = np.argsort(pk, kind="stable")
    stats_ref = ray.put((pk[order],
                         s_tbl.column("sq").cast(pa.int64())
                         .to_numpy(zero_copy_only=False)[order],
                         s_tbl.column("cnt").cast(pa.int64())
                         .to_numpy(zero_copy_only=False)[order]))

    def rev_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"cents": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        spk, ssq, scnt = ray.get(stats_ref)
        keys = b.column("l_partkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(spk, keys)
        q = _half_away_100(b.column("l_quantity").to_numpy(
            zero_copy_only=False))
        small = q * 5 * scnt[pos] < ssq[pos]
        if not small.any():
            return empty
        cents = _half_away_100(b.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[small])
        return pa.table({"cents": pa.array([int(cents.sum())],
                                           pa.int64())})

    total = li_b.map_batches(rev_partial, batch_format="pyarrow") \
        .aggregate(Sum("cents", alias_name="cents"))
    cents = int(total.get("cents") or 0)
    from .common import round_half_away
    return pa.table({"avg_yearly": pa.array(
        [float(round_half_away(np.array([cents / 100.0 / 7.0]), 6)[0])],
        pa.float64())})


def returned_item_report(lineitem, orders, customer, nation, k: int = 20,
                         max_bcast_rows=_BCAST_JOIN_ROWS):
    """TPC-H Q10 returned-item reporting: top-k customers by revenue on
    RETURNED items in an order window ->
    (c_custkey, c_name, revenue, c_acctbal, n_name).

    Plan: lineitem keeps only returnflag='R' rows and collapses per batch
    to (orderkey, rev-units) BEFORE the one large-large hash join with
    the window-filtered orders (caller pushes the date window into the
    scan); per-customer revenue is one native groupby Sum; the global
    top-k forwards per-batch candidates under the exact-integer total
    order (rev desc, custkey asc) so only O(batches x k) rows sort; the
    k winners broadcast onto customer (which never shuffles) and the
    25-row nation map rides along. Ties cannot drift: revenue is exact
    1e-4 integer units end-to-end."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .joins import broadcast_join, hash_join

    def li_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"l_orderkey": pa.array([], pa.int64()),
                          "rev": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        m = pc.equal(b.column("l_returnflag"), "R") \
            .to_numpy(zero_copy_only=False)
        if not m.any():
            return empty
        keys = b.column("l_orderkey").to_numpy(zero_copy_only=False)[m]
        rev = _rev_units(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False)[m],
            b.column("l_discount").to_numpy(zero_copy_only=False)[m])
        uk, sums = _int_group_sums(keys, rev)
        return pa.table({"l_orderkey": pa.array(uk, pa.int64()),
                         "rev": pa.array(sums, pa.int64())})

    li_agg = lineitem.map_batches(li_partial, batch_format="pyarrow")
    joined = hash_join(li_agg, orders.select_columns(
        ["o_orderkey", "o_custkey"]), on="l_orderkey",
        right_on="o_orderkey")
    per_cust = joined.groupby("o_custkey") \
        .aggregate(Sum("rev", alias_name="rev"))

    def local_topk(b: pa.Table) -> pa.Table:
        empty = pa.table({"o_custkey": pa.array([], pa.int64()),
                          "rev": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        rev = b.column("rev").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ck = b.column("o_custkey").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, -rev))[:k]
        return pa.table({"o_custkey": pa.array(ck[order], pa.int64()),
                         "rev": pa.array(rev[order], pa.int64())})

    winners = per_cust.map_batches(local_topk, batch_format="pyarrow") \
        .sort(["rev", "o_custkey"], descending=[True, False]).limit(k)

    enriched = broadcast_join(
        customer.select_columns(["c_custkey", "c_name", "c_acctbal",
                                 "c_nationkey"]),
        winners, on="c_custkey", right_on="o_custkey",
        max_rows=max_bcast_rows)
    enriched = broadcast_join(
        enriched, nation.select_columns(["n_nationkey", "n_name"]),
        on="c_nationkey", right_on="n_nationkey",
        max_rows=max_bcast_rows)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b.column("c_custkey").cast(pa.int64()),
            "c_name": b.column("c_name"),
            "revenue": pa.array(
                b.column("rev").to_numpy(zero_copy_only=False)
                .astype(np.float64) / 10000.0, pa.float64()),
            "c_acctbal": b.column("c_acctbal"),
            "n_name": b.column("n_name")})

    # sort on the EXACT integer rev (not the derived float — two revs
    # above 2^53 1e-4-units could collapse to one double and flip ties)
    return enriched.sort(["rev", "c_custkey"],
                         descending=[True, False]) \
        .map_batches(finish, batch_format="pyarrow")


def nation_volume(lineitem, orders, customer, supplier, nation,
                  nation_a: str, nation_b: str,
                  max_bcast_rows=_BCAST_JOIN_ROWS):
    """TPC-H Q7 volume shipping between two nations: revenue by
    (supplier nation, customer nation, ship year) for the two cross
    directions -> (supp_nation, cust_nation, l_year, revenue).

    Plan: the supplier->nation and the 25-row nation maps are
    dimensions — they broadcast onto lineitem, which filters to the two
    supplier nations and collapses per batch to
    (orderkey, supp-nation-key, year, rev-units) partials; customer
    filters to the two nations and joins orders under the broadcast
    gate (hash_join above it — documented); ONE large-large hash join
    connects the two sides, a groupby over the 2x2xyears cells merges,
    and the cross-direction filter keeps (a->b) and (b->a). Names
    resolve from the tiny nation map at the end."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .joins import broadcast_join, hash_join

    # tiny nation map driver-side (25 rows by schema contract)
    nat_tbl = pa.concat_tables(
        [b for b in nation.select_columns(["n_nationkey", "n_name"])
         .iter_batches(batch_format="pyarrow") if b.num_rows])
    keys = nat_tbl.column("n_nationkey").cast(pa.int64()).to_pylist()
    names = nat_tbl.column("n_name").to_pylist()
    name_of = dict(zip(keys, names))
    key_of = {v: k for k, v in name_of.items()}
    ka, kb = key_of[nation_a], key_of[nation_b]

    li_s = broadcast_join(
        lineitem, supplier.select_columns(["s_suppkey", "s_nationkey"]),
        on="l_suppkey", right_on="s_suppkey", max_rows=max_bcast_rows)

    def li_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"l_orderkey": pa.array([], pa.int64()),
                          "snat": pa.array([], pa.int64()),
                          "l_year": pa.array([], pa.int64()),
                          "rev": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        snat = b.column("s_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = (snat == ka) | (snat == kb)
        if not m.any():
            return empty
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)[m]
        yr = pc.year(b.column("l_shipdate")).to_numpy(
            zero_copy_only=False).astype(np.int64)[m]
        rev = _rev_units(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False)[m],
            b.column("l_discount").to_numpy(zero_copy_only=False)[m])
        # pack (orderkey, snat-bit, year) into one sortable int64 key:
        # orderkey <= 2^40 by contract here; years fit in 12 bits
        sb = (snat[m] == kb).astype(np.int64)
        packed = (ok << np.int64(14)) | (sb << np.int64(13)) | (yr - 1900)
        uk, sums = _int_group_sums(packed, rev)
        return pa.table({
            "l_orderkey": pa.array(uk >> np.int64(14), pa.int64()),
            "snat": pa.array(np.where((uk >> np.int64(13)) & 1, kb, ka),
                             pa.int64()),
            "l_year": pa.array((uk & np.int64(0x1FFF)) + 1900, pa.int64()),
            "rev": pa.array(sums, pa.int64())})

    li_agg = li_s.map_batches(li_partial, batch_format="pyarrow")

    cust2 = customer.map_batches(
        lambda b: b.filter(
            pc.or_(pc.equal(pc.cast(b.column("c_nationkey"), pa.int64()),
                            ka),
                   pc.equal(pc.cast(b.column("c_nationkey"), pa.int64()),
                            kb)))
        .select(["c_custkey", "c_nationkey"]), batch_format="pyarrow")
    ords = broadcast_join(orders.select_columns(
        ["o_orderkey", "o_custkey"]), cust2, on="o_custkey",
        right_on="c_custkey", max_rows=max_bcast_rows)

    joined = hash_join(li_agg, ords, on="l_orderkey",
                       right_on="o_orderkey")

    def cross_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"snat": pa.array([], pa.int64()),
                          "cnat": pa.array([], pa.int64()),
                          "l_year": pa.array([], pa.int64()),
                          "rev": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        snat = b.column("snat").to_numpy(zero_copy_only=False)
        cnat = b.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = snat != cnat
        if not m.any():
            return empty
        yr = b.column("l_year").to_numpy(zero_copy_only=False)[m]
        rev = b.column("rev").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)[m]
        packed = ((snat[m] == kb).astype(np.int64) << np.int64(13)) \
            | (yr - 1900)
        uk, sums = _int_group_sums(packed, rev)
        sk = np.where((uk >> np.int64(13)) & 1, kb, ka)
        return pa.table({
            "snat": pa.array(sk, pa.int64()),
            "cnat": pa.array(np.where(sk == ka, kb, ka), pa.int64()),
            "l_year": pa.array((uk & np.int64(0x1FFF)) + 1900, pa.int64()),
            "rev": pa.array(sums, pa.int64())})

    merged = joined.map_batches(cross_partial, batch_format="pyarrow") \
        .groupby(["snat", "cnat", "l_year"]) \
        .aggregate(Sum("rev", alias_name="rev"))

    def finish(b: pa.Table) -> pa.Table:
        sn = [name_of[x] for x in b.column("snat").to_pylist()]
        cn = [name_of[x] for x in b.column("cnat").to_pylist()]
        return pa.table({
            "supp_nation": pa.array(sn, pa.string()),
            "cust_nation": pa.array(cn, pa.string()),
            "l_year": b.column("l_year").cast(pa.int64()),
            "revenue": pa.array(
                b.column("rev").cast(pa.int64())
                .to_numpy(zero_copy_only=False)
                .astype(np.float64) / 10000.0, pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow")


def market_share(lineitem, orders, customer, supplier, nation, region,
                 target_nation: str, region_name: str, part_type: str,
                 part, max_bcast_rows=_BCAST_JOIN_ROWS):
    """TPC-H Q8 national market share: the fraction of a region's
    revenue in one part type supplied by one nation, per order year ->
    (o_year, mkt_share).

    Every dimension stays a broadcast; the single large-large hash join
    connects the two fact-derived sides:

    - part keys of ``part_type`` broadcast-semi-filter lineitem;
    - the supplier->nation map broadcasts onto lineitem, which collapses
      per batch to (orderkey, is-target-flag, rev-units) partials — the
      flag rides the key, so target and non-target revenue co-aggregate;
    - region customers (customer x tiny nation/region maps) collapse to
      a custkey set; orders semi-join against it (gated broadcast /
      co-partition) carrying the order year;
    - ONE hash join, then per-batch (year, rev_target, rev_all) integer
      partials -> a years-sized groupby. The share is one float division
      per year over exact 1e-4-unit sums."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from .common import round_half_away
    from .joins import broadcast_join, semi_join

    # tiny maps driver-side (25 nations / 5 regions by schema contract)
    nat_tbl = pa.concat_tables(
        [b for b in nation.iter_batches(batch_format="pyarrow")
         if b.num_rows])
    reg_tbl = pa.concat_tables(
        [b for b in region.iter_batches(batch_format="pyarrow")
         if b.num_rows])
    rkey = {r["r_name"]: r["r_regionkey"]
            for r in reg_tbl.to_pylist()}[region_name]
    target_key = [r["n_nationkey"] for r in nat_tbl.to_pylist()
                  if r["n_name"] == target_nation][0]
    region_nats = {int(r["n_nationkey"]) for r in nat_tbl.to_pylist()
                   if int(r["n_regionkey"]) == int(rkey)}

    def type_keys(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        return b.filter(_pc.equal(b.column("p_type"), part_type)) \
            .select(["p_partkey"])

    pkeys = part.map_batches(type_keys, batch_format="pyarrow")
    li_f = broadcast_join(lineitem, pkeys, on="l_partkey",
                          right_on="p_partkey", join_type="left semi",
                          max_rows=max_bcast_rows)
    li_s = broadcast_join(
        li_f, supplier.select_columns(["s_suppkey", "s_nationkey"]),
        on="l_suppkey", right_on="s_suppkey", max_rows=max_bcast_rows)

    def li_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"l_orderkey": pa.array([], pa.int64()),
                          "tflag": pa.array([], pa.int64()),
                          "rev": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        snat = b.column("s_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        rev = _rev_units(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False),
            b.column("l_discount").to_numpy(zero_copy_only=False))
        flag = (snat == target_key).astype(np.int64)
        packed = (ok << np.int64(1)) | flag
        uk, sums = _int_group_sums(packed, rev)
        return pa.table({
            "l_orderkey": pa.array(uk >> np.int64(1), pa.int64()),
            "tflag": pa.array(uk & np.int64(1), pa.int64()),
            "rev": pa.array(sums, pa.int64())})

    li_agg = li_s.map_batches(li_partial, batch_format="pyarrow")

    rnats = np.array(sorted(region_nats), np.int64)

    def region_cust(b: pa.Table) -> pa.Table:
        nk = b.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = np.isin(nk, rnats)
        return pa.table({"c_custkey": pa.array(
            b.column("c_custkey").to_numpy(zero_copy_only=False)[m],
            pa.int64())})

    cust_r = customer.map_batches(region_cust, batch_format="pyarrow")
    ords = semi_join(orders, cust_r, on="o_custkey",
                     right_on="c_custkey", max_bcast_rows=max_bcast_rows)

    def ords_proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
            "o_year": pc.cast(pc.year(b.column("o_orderdate")),
                              pa.int64())})

    from .joins import hash_join
    joined = hash_join(
        li_agg, ords.map_batches(ords_proj, batch_format="pyarrow"),
        on="l_orderkey", right_on="o_orderkey")

    def year_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"o_year": pa.array([], pa.int64()),
                          "rev_t": pa.array([], pa.int64()),
                          "rev_all": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        yr = b.column("o_year").to_numpy(zero_copy_only=False)
        fl = b.column("tflag").to_numpy(zero_copy_only=False)
        rev = b.column("rev").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        uk, tot = _int_group_sums(yr, rev)
        _, tgt = _int_group_sums(yr, rev * fl)
        return pa.table({"o_year": pa.array(uk, pa.int64()),
                         "rev_t": pa.array(tgt, pa.int64()),
                         "rev_all": pa.array(tot, pa.int64())})

    merged = joined.map_batches(year_partial, batch_format="pyarrow") \
        .groupby("o_year").aggregate(Sum("rev_t", alias_name="rev_t"),
                                     Sum("rev_all", alias_name="rev_all"))

    def finish(b: pa.Table) -> pa.Table:
        t = b.column("rev_t").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        a = b.column("rev_all").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "o_year": b.column("o_year").cast(pa.int64()),
            "mkt_share": pa.array(round_half_away(t / a, 6),
                                  pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow")


def profile_table(ds, columns):
    """Data-profiling report -> one row per column: (col_name, n_rows,
    n_nulls, n_distinct) — the first thing a pipeline runs against an
    unfamiliar extract (null density and key-ness drive every later
    partitioning decision).

    Physical plan: ONE streaming pass collects (n, n_nulls) partials for
    ALL columns together; then one narrow groupby per column over
    pre-collapsed per-batch DISTINCT values (hashed type-agnostically
    through Arrow's string cast, floats canonicalized +0.0 so -0.0
    matches SQL DISTINCT). Documented: O(columns) distinct shuffles,
    each moving at most that column's distinct cardinality — never the
    relation."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    cols = list(columns)

    def counts_partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {"col_name": pa.array([], pa.string()),
             "n": pa.array([], pa.int64()),
             "nn": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        return pa.table({
            "col_name": pa.array(cols, pa.string()),
            "n": pa.array([b.num_rows] * len(cols), pa.int64()),
            "nn": pa.array([int(b.column(c).null_count) for c in cols],
                           pa.int64())})

    stats = pa.concat_tables(
        [b for b in ds.map_batches(counts_partial,
                                   batch_format="pyarrow")
         .groupby("col_name").aggregate(Sum("n", alias_name="n"),
                                        Sum("nn", alias_name="nn"))
         .iter_batches(batch_format="pyarrow") if b.num_rows]
        or [pa.table({"col_name": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64()),
                      "nn": pa.array([], pa.int64())})])
    by_col = {r["col_name"]: (int(r["n"]), int(r["nn"]))
              for r in stats.to_pylist()}

    out_rows, out_nulls, out_dist = [], [], []
    for col in cols:
        n, nn = by_col.get(col, (0, 0))

        def distinct_partial(b: pa.Table, _c=col) -> pa.Table:
            empty = pa.table({"v": pa.array([], pa.large_string())})
            if b.num_rows == 0:
                return empty
            c_arr = b.column(_c).combine_chunks()
            if pa.types.is_floating(c_arr.type):
                # -0.0 == 0.0 to SQL DISTINCT but stringifies apart
                c_arr = pc.add(c_arr, 0.0)
            u = pc.unique(c_arr)
            u = u.filter(pc.is_valid(u))
            return pa.table({"v": pc.cast(u, pa.large_string())})

        nd = ds.select_columns([col]) \
            .map_batches(distinct_partial, batch_format="pyarrow") \
            .groupby("v").count().count()
        out_rows.append(n)
        out_nulls.append(nn)
        out_dist.append(int(nd))

    return pa.table({"col_name": pa.array(cols, pa.string()),
                     "n_rows": pa.array(out_rows, pa.int64()),
                     "n_nulls": pa.array(out_nulls, pa.int64()),
                     "n_distinct": pa.array(out_dist, pa.int64())})


def gini_per_nation(customer):
    """Gini coefficient of customer account balances per nation — the
    standard inequality/concentration diagnostic (who holds the value in
    each market segment), via the rank formula over exact integer cents:

        G = (2 * sum(i * x_i) - (n + 1) * sum(x)) / (n * sum(x))

    with x sorted ascending, i = 1..n. Both moment sums are exact
    integers (ties in x contribute identically under any tie order, so
    the value is tie-stable and hash-identical to SQL's row_number
    form); the final division is one IEEE op replayed in the oracle.

    Shape: groupby(nation).map_groups, one numpy sort per group — the
    one-key-fits-one-task assumption (25 nations; for a high-cardinality
    key use the global_rank equi-depth machinery per key instead, see
    SCALE.md). int64 moment bound: sum(i*x) <= n^2 * max_cents, safe to
    ~1e6 rows/group at 1e6-cent balances; beyond that promote the merge
    to Python ints (documented, not guarded — same stance as the other
    integer-moment ops).
    """
    def per_nation(g: pa.Table) -> pa.Table:
        empty = pa.table({"c_nationkey": pa.array([], pa.int64()),
                          "n_customers": pa.array([], pa.int64()),
                          "gini": pa.array([], pa.float64())})
        if g.num_rows == 0:
            return empty
        cents = half_away_scaled_int(
            g.column("c_acctbal").to_numpy(zero_copy_only=False), 100)
        cents = np.sort(cents)
        n = cents.size
        i = np.arange(1, n + 1, dtype=np.int64)
        isum = int((i * cents).sum())
        csum = int(cents.sum())
        num = 2 * isum - (n + 1) * csum
        gini = float(num) / (float(n) * float(csum))
        return pa.table({
            "c_nationkey": pa.array(
                [int(g.column("c_nationkey")[0].as_py())], pa.int64()),
            "n_customers": pa.array([n], pa.int64()),
            "gini": pa.array([gini], pa.float64())})

    return customer.select_columns(["c_nationkey", "c_acctbal"]) \
        .groupby("c_nationkey").map_groups(
            per_nation, batch_format="pyarrow").sort("c_nationkey")


def referential_integrity(lineitem, orders, customer):
    """Warehouse fsck: referential-integrity violation counts between
    the fact tables — the data-quality gate a pipeline runs before
    trusting a drop of new partitions.

    Four NOT-EXISTS / EXISTS-complement counts, each a co-partitioned
    anti-join (joins.anti_join_keys — broadcast under the gate, hash
    co-partition above) over key columns only (pruned reads):

    - lineitem_orphans: lineitems whose l_orderkey has no order
    - orders_childless: orders with no lineitem
    - orders_orphan_cust: orders whose o_custkey has no customer
    - customers_no_orders: customers who never ordered

    Output: (check_name, n) long-format summary, 4 rows.
    """
    from .joins import anti_join_keys

    li_k = lineitem.select_columns(["l_orderkey"])
    ord_k = orders.select_columns(["o_orderkey"])
    ord_ck = orders.select_columns(["o_custkey"])
    cust_k = customer.select_columns(["c_custkey"])

    checks = [
        ("customers_no_orders",
         anti_join_keys(cust_k, ord_ck, on="c_custkey",
                        right_on="o_custkey")),
        ("lineitem_orphans",
         anti_join_keys(li_k, ord_k, on="l_orderkey",
                        right_on="o_orderkey")),
        ("orders_childless",
         anti_join_keys(ord_k, li_k, on="o_orderkey",
                        right_on="l_orderkey")),
        ("orders_orphan_cust",
         anti_join_keys(ord_ck, cust_k, on="o_custkey",
                        right_on="c_custkey")),
    ]
    return pa.table({
        "check_name": pa.array([c for c, _ in checks], pa.string()),
        "n": pa.array([ds.count() for _, ds in checks], pa.int64())})


def revenue_seasonality(lineitem):
    """Seasonality profile: discounted revenue and item counts by
    calendar MONTH-OF-YEAR across all years — the warehouse "is December
    always our peak?" query. Month extraction is Arrow's C++ month()
    kernel (identical calendar math to DuckDB month()); revenue uses the
    exact integer cent-basis-point identity (_rev_units), so sums are
    order-independent. Each batch pre-aggregates to <= 12 partial rows
    before the (tiny) native groupby."""
    from ray.data.aggregate import Sum
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"month": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "rev_units": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        m = pc.month(b.column("l_shipdate")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        rev = _rev_units(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False),
            b.column("l_discount").to_numpy(zero_copy_only=False))
        um, inv = np.unique(m, return_inverse=True)
        return pa.table({
            "month": pa.array(um, pa.int64()),
            "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
            "rev_units": pa.array(np.bincount(inv, weights=rev)
                                  .astype(np.int64), pa.int64())})

    merged = lineitem.select_columns(
        ["l_shipdate", "l_extendedprice", "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("month").aggregate(Sum("n", alias_name="n_items"),
                                    Sum("rev_units", alias_name="ru"))

    def finish(b: pa.Table) -> pa.Table:
        empty = pa.table({"month": pa.array([], pa.int64()),
                          "n_items": pa.array([], pa.int64()),
                          "revenue": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        ru = b.column("ru").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "month": b.column("month").cast(pa.int64()),
            "n_items": b.column("n_items").cast(pa.int64()),
            "revenue": pa.array(ru.astype(np.float64) / 10000.0,
                                pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow").sort("month")


def product_profit(lineitem, part, supplier, nation,
                   name_substr: str = "red",
                   max_bcast_rows=_BCAST_JOIN_ROWS):
    """TPC-H Q9 product-type profit, adapted to this schema (no
    partsupp -> profit is discounted revenue; no o_orderdate -> year is
    the ship year, so the orders join disappears entirely): revenue from
    parts whose name contains ``name_substr``, by supplier nation and
    ship year -> (nation, l_year, profit) sorted (nation, l_year).

    Plan: the matching-part key set is a FILTERED dimension — parts
    filter to the substring match (Arrow match_substring, identical
    semantics to SQL LIKE '%s%') and semi-join onto lineitem as a
    broadcast under the gate; above it, a co-partitioned hash semi-join
    (tested). The supplier->nationkey map broadcasts the same way. Each
    surviving batch collapses to <= nations x years packed-int partials
    of exact 1e-4 revenue units, so the only shuffle after the semi-join
    is a ~100-row groupby. Nation names resolve from the 25-row map at
    the end; float division happens once, post-aggregate."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .joins import broadcast_join, hash_join

    pkeys = part.map_batches(
        lambda b: b.filter(pc.match_substring(b.column("p_name"),
                                              name_substr))
        .select(["p_partkey"]), batch_format="pyarrow")
    try:
        li = broadcast_join(lineitem, pkeys, on="l_partkey",
                            right_on="p_partkey", join_type="left semi",
                            max_rows=max_bcast_rows)
    except ValueError:
        # scale path: part keys are unique (PK), so an inner hash join
        # is an exact semi-join with no fanout
        li = hash_join(lineitem, pkeys, on="l_partkey",
                       right_on="p_partkey")

    smap = supplier.select_columns(["s_suppkey", "s_nationkey"])
    try:
        li = broadcast_join(li, smap, on="l_suppkey",
                            right_on="s_suppkey", max_rows=max_bcast_rows)
    except ValueError:
        li = hash_join(li, smap, on="l_suppkey", right_on="s_suppkey")

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"k": pa.array([], pa.int64()),
                          "units": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        nat = b.column("s_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        yr = pc.year(b.column("l_shipdate")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rev = _rev_units(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False),
            b.column("l_discount").to_numpy(zero_copy_only=False))
        uk, sums = _int_group_sums((nat << np.int64(13)) | (yr - 1900),
                                   rev)
        return pa.table({"k": pa.array(uk, pa.int64()),
                         "units": pa.array(sums, pa.int64())})

    merged = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("units", alias_name="units"))

    # tiny nation map driver-side (25 rows by schema contract)
    nat_tbl = pa.concat_tables(
        [b for b in nation.select_columns(["n_nationkey", "n_name"])
         .iter_batches(batch_format="pyarrow") if b.num_rows])
    name_of = dict(zip(
        nat_tbl.column("n_nationkey").cast(pa.int64()).to_pylist(),
        nat_tbl.column("n_name").to_pylist()))

    def finish(b: pa.Table) -> pa.Table:
        empty = pa.table({"nation": pa.array([], pa.string()),
                          "l_year": pa.array([], pa.int64()),
                          "profit": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        k = b.column("k").cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = b.column("units").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "nation": pa.array([name_of[int(x)] for x in
                                (k >> np.int64(13))], pa.string()),
            "l_year": pa.array((k & np.int64(0x1FFF)) + 1900, pa.int64()),
            "profit": pa.array(u.astype(np.float64) / 10000.0,
                               pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow") \
        .sort(["nation", "l_year"])


def important_suppliers(lineitem, per_mille: int = 1):
    """TPC-H Q11 value concentration, adapted to this schema (no
    partsupp -> "value" is a supplier's discounted lineitem revenue):
    suppliers whose revenue exceeds ``per_mille``/1000 of GLOBAL revenue
    -> (l_suppkey, value) sorted by value desc, suppkey asc.

    Plan: the correlated global-total subquery becomes ONE streaming
    integer scalar (total 1e-4 revenue units); the threshold test is the
    EXACT integer cross-multiplication ``units * 1000 > total *
    per_mille``, so no float fraction ever exists to drift. Per-supplier
    revenue is per-batch packed partials into one O(suppliers)-row
    native groupby — lineitem itself never shuffles. The filtered
    survivor set is tiny by construction (< 1000/per_mille rows)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"l_suppkey": pa.array([], pa.int64()),
                             "units": pa.array([], pa.int64())})
        keys = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        rev = _rev_units(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False),
            b.column("l_discount").to_numpy(zero_copy_only=False))
        uk, sums = _int_group_sums(keys, rev)
        return pa.table({"l_suppkey": pa.array(uk, pa.int64()),
                         "units": pa.array(sums, pa.int64())})

    per_supp = lineitem.map_batches(partial, batch_format="pyarrow") \
        .groupby("l_suppkey").aggregate(Sum("units", alias_name="units")) \
        .map_batches(
            lambda b: pa.table({
                "l_suppkey": b.column("l_suppkey").cast(pa.int64()),
                "units": b.column("units").cast(pa.int64())}),
            batch_format="pyarrow").materialize()   # consumed twice
    total = int(per_supp.aggregate(Sum("units", alias_name="t"))
                .get("t") or 0)

    def keep(b: pa.Table) -> pa.Table:
        empty = pa.table({"l_suppkey": pa.array([], pa.int64()),
                          "value": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        u = b.column("units").to_numpy(zero_copy_only=False)
        # exact: units/total > per_mille/1000  <=>  units*1000 > total*pm
        m = u.astype(object) * 1000 > total * per_mille \
            if total > (1 << 52) else u * np.int64(1000) > np.int64(
                total * per_mille)
        m = np.asarray(m, bool)
        if not m.any():
            return empty
        return pa.table({
            "l_suppkey": b.column("l_suppkey").filter(pa.array(m)),
            "value": pa.array(u[m].astype(np.float64) / 10000.0,
                              pa.float64())})

    return per_supp.map_batches(keep, batch_format="pyarrow") \
        .sort(["value", "l_suppkey"], descending=[True, False])


def supplier_part_variety(lineitem, part, exclude_brand: str = "Brand#1",
                          max_bcast_rows=_BCAST_JOIN_ROWS):
    """TPC-H Q16 parts/supplier relationship, adapted to this schema (no
    partsupp -> supply evidence is a lineitem row; no p_container /
    comment filters -> a brand exclusion): how many DISTINCT suppliers
    ship each (p_brand, p_type, p_size) class, excluding one brand ->
    (p_brand, p_type, p_size, supplier_cnt) sorted (cnt desc, brand,
    type, size).

    Plan: lineitem pre-dedups to distinct (partkey, suppkey) pairs per
    batch, then ONE native pair groupby makes them globally distinct
    (O(distinct pairs) rows — the Q16 shuffle). The brand-filtered part
    attribute map broadcasts under the gate (hash join above it,
    tested); a second groupby over (brand, type, size) counts suppliers
    — exact because each (class, suppkey) combination survives exactly
    once. p_partkey is the part PK, so the attribute join has no
    fanout."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from .joins import broadcast_join, hash_join

    def pair_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "l_suppkey": pa.array([], pa.int64())})
        pk = b.column("l_partkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        sk = b.column("l_suppkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if (pk >= (1 << 31)).any() or (sk >= (1 << 31)).any():
            raise ValueError("key exceeds 31-bit pack gate")
        packed = np.unique((pk << np.int64(31)) | sk)
        return pa.table({
            "l_partkey": pa.array(packed >> np.int64(31), pa.int64()),
            "l_suppkey": pa.array(packed & np.int64((1 << 31) - 1),
                                  pa.int64())})

    pairs = lineitem.select_columns(["l_partkey", "l_suppkey"]) \
        .map_batches(pair_partial, batch_format="pyarrow") \
        .groupby(["l_partkey", "l_suppkey"]).aggregate(
            Count(alias_name="_c")) \
        .select_columns(["l_partkey", "l_suppkey"])

    pmap = part.map_batches(
        lambda b: b.filter(pc.invert(pc.equal(b.column("p_brand"),
                                              exclude_brand)))
        .select(["p_partkey", "p_brand", "p_type", "p_size"]),
        batch_format="pyarrow")
    try:
        joined = broadcast_join(pairs, pmap, on="l_partkey",
                                right_on="p_partkey",
                                max_rows=max_bcast_rows)
    except ValueError:
        joined = hash_join(pairs, pmap, on="l_partkey",
                           right_on="p_partkey")

    # a supplier shipping several parts of the same class must count
    # once: distinct (class, suppkey) first, then count per class
    counted = joined \
        .groupby(["p_brand", "p_type", "p_size", "l_suppkey"]) \
        .aggregate(Count(alias_name="_d")) \
        .groupby(["p_brand", "p_type", "p_size"]).aggregate(
            Count(alias_name="supplier_cnt"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "p_brand": b.column("p_brand").cast(pa.string()),
            "p_type": b.column("p_type").cast(pa.string()),
            "p_size": b.column("p_size").cast(pa.int64()),
            "supplier_cnt": b.column("supplier_cnt").cast(pa.int64())})

    return counted.map_batches(finish, batch_format="pyarrow") \
        .sort(["supplier_cnt", "p_brand", "p_type", "p_size"],
              descending=[True, False, False, False])


def order_intervals(orders, num_groups=None):
    """Per-customer reorder cadence -> (o_custkey, n_gaps, avg_gap_days,
    max_gap_days) over orders sorted by date: the repeat-purchase /
    churn-risk profile (SQL: LAG + datediff + avg/max). Customers with a
    single order emit nothing (no gaps). Same-day repeat orders
    contribute zero-day gaps; because consecutive-diff multisets over a
    sorted column are tie-order invariant, the result is deterministic
    without a tie-break column.

    Co-partitions by customer into adaptive integer-hash groups (the
    event_gaps contract) and resolves each partition vectorized: one
    lexsort, one diff, reduceat segment sums/maxima. Gap arithmetic is
    integer days end-to-end; only the final avg divides into float with
    the oracle's expression order."""
    from .common import adaptive_groups, round_half_away

    if num_groups is None:
        num_groups = adaptive_groups(orders.count(), 1_000_000, lo=32)

    def add_g(b: pa.Table) -> pa.Table:
        u = b.column("o_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "_g", pa.array((u % num_groups + num_groups) % num_groups,
                           pa.int64()))

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.table({"o_custkey": pa.array([], pa.int64()),
                          "n_gaps": pa.array([], pa.int64()),
                          "avg_gap_days": pa.array([], pa.float64()),
                          "max_gap_days": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        u = g.column("o_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        d = g.column("o_orderdate").cast(pa.date32()).cast(pa.int32()) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((d, u))
        us, ds = u[o], d[o]
        same = us[1:] == us[:-1]
        if not same.any():
            return empty
        gaps = (ds[1:] - ds[:-1])[same]
        gu = us[1:][same]
        starts = np.flatnonzero(np.concatenate(
            ([True], gu[1:] != gu[:-1])))
        ends = np.append(starts[1:], gu.size)
        sums = np.add.reduceat(gaps, starts)
        maxs = np.maximum.reduceat(gaps, starts)
        n = (ends - starts).astype(np.int64)
        return pa.table({
            "o_custkey": pa.array(gu[starts], pa.int64()),
            "n_gaps": pa.array(n, pa.int64()),
            "avg_gap_days": pa.array(
                round_half_away(sums.astype(np.float64) / n, 6),
                pa.float64()),
            "max_gap_days": pa.array(maxs, pa.int64())})

    return (orders.select_columns(["o_custkey", "o_orderdate"])
            .map_batches(add_g, batch_format="pyarrow")
            .groupby("_g")
            .map_groups(lambda g: resolve(g.drop(["_g"])),
                        batch_format="pyarrow")
            .sort("o_custkey"))


def basket_affinity(lineitem, part, min_count: int = 1,
                    max_bcast_rows=_BCAST_JOIN_ROWS, num_groups=None):
    """Market-basket affinity -> (type_a, type_b, n_orders): how many
    orders contain BOTH part types, for every unordered type pair
    (type_a < type_b) — the co-purchase signal behind "customers also
    bought" (classic Apriori 1-level pair counting, SIGMOD '93 shape).

    Plan: lineitem keeps (orderkey, partkey), the part->type map
    broadcasts under the gate (hash join above it); per batch the pairs
    collapse to distinct (orderkey, type-id) rows (orders are the
    natural co-location key); ONE adaptive orderkey-hash groupby
    co-locates each order, where a vectorized lexsort + run expansion
    emits that order's type pairs — baskets are small (TPC-H <= 7
    lineitems), so the quadratic step is bounded per order and the pair
    relation is tiny (<= types^2 rows) going into the final groupby
    Sum."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .common import adaptive_groups
    from .joins import broadcast_join, hash_join

    if num_groups is None:
        num_groups = adaptive_groups(lineitem.count(), 1_000_000, lo=32)

    pmap = part.select_columns(["p_partkey", "p_type"])
    li = lineitem.select_columns(["l_orderkey", "l_partkey"])
    try:
        joined = broadcast_join(li, pmap, on="l_partkey",
                                right_on="p_partkey",
                                max_rows=max_bcast_rows)
    except ValueError:
        joined = hash_join(li, pmap, on="l_partkey",
                           right_on="p_partkey")

    def pair_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"l_orderkey": pa.array([], pa.int64()),
                          "p_type": pa.array([], pa.string()),
                          "_g": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        ok = b.column("l_orderkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        ty = np.asarray(b.column("p_type").to_pylist(), object)
        o = np.lexsort((ty, ok))
        ok, ty = ok[o], ty[o]
        keep = np.concatenate(
            ([True], (ok[1:] != ok[:-1]) | (ty[1:] != ty[:-1])))
        ok, ty = ok[keep], ty[keep]
        return pa.table({
            "l_orderkey": pa.array(ok, pa.int64()),
            "p_type": pa.array(ty, pa.string()),
            "_g": pa.array((ok % num_groups + num_groups) % num_groups,
                           pa.int64())})

    tagged = joined.map_batches(pair_partial, batch_format="pyarrow")

    def expand(g: pa.Table) -> pa.Table:
        empty = pa.table({"type_a": pa.array([], pa.string()),
                          "type_b": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        ok = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        ty = np.asarray(g.column("p_type").to_pylist(), object)
        o = np.lexsort((ty, ok))
        ok, ty = ok[o], ty[o]
        # global re-distinct (the same (order, type) row can arrive
        # from several upstream batches)
        keep = np.concatenate(
            ([True], (ok[1:] != ok[:-1]) | (ty[1:] != ty[:-1])))
        ok, ty = ok[keep], ty[keep]
        starts = np.flatnonzero(np.concatenate(
            ([True], ok[1:] != ok[:-1])))
        lens = np.diff(np.append(starts, ok.size))
        # vectorize the quadratic step by basket SIZE: all orders with s
        # distinct types become one (n_s, s) matrix; each of the
        # s(s-1)/2 column pairs is a vectorized bincount over packed
        # int type-id pairs (types within an order are sorted, so
        # column i < column j already means type_a < type_b)
        utypes, tyi = np.unique(ty, return_inverse=True)
        nt = utypes.size
        keys = []
        for s in range(2, int(lens.max()) + 1 if lens.size else 2):
            sel = starts[lens == s]
            if sel.size == 0:
                continue
            idx = sel[:, None] + np.arange(s)[None, :]
            mat = tyi[idx]
            for i in range(s - 1):
                for j in range(i + 1, s):
                    keys.append(mat[:, i] * nt + mat[:, j])
        if not keys:
            return empty
        counts = np.bincount(np.concatenate(keys), minlength=nt * nt)
        nz = np.flatnonzero(counts)
        return pa.table({
            "type_a": pa.array(utypes[nz // nt], pa.string()),
            "type_b": pa.array(utypes[nz % nt], pa.string()),
            "n": pa.array(counts[nz], pa.int64())})

    counted = tagged.groupby("_g") \
        .map_groups(lambda g: expand(g.drop(["_g"])),
                    batch_format="pyarrow") \
        .groupby(["type_a", "type_b"]).aggregate(
            Sum("n", alias_name="n_orders"))

    def finish(b: pa.Table) -> pa.Table:
        out = pa.table({
            "type_a": b.column("type_a").cast(pa.string()),
            "type_b": b.column("type_b").cast(pa.string()),
            "n_orders": b.column("n_orders").cast(pa.int64())})
        return out.filter(pc.greater_equal(out.column("n_orders"),
                                           min_count))

    return counted.map_batches(finish, batch_format="pyarrow") \
        .sort(["type_a", "type_b"])


def trade_balance(lineitem, orders, customer, supplier, nation,
                  max_bcast_rows=_BCAST_JOIN_ROWS):
    """Per-nation trade balance -> (nation, supp_revenue, cust_revenue,
    balance): revenue each nation EARNS as the supplying side vs revenue
    it SPENDS as the buying side of every lineitem, and the difference —
    the Q5/Q7 machinery recomposed into a two-sided ledger.

    Plan: the supplier side never joins large-large — the
    supplier->nationkey map broadcasts (hash join above the gate) and
    lineitem collapses per batch to <= 25 nation partials. The customer
    side pre-aggregates lineitem to (orderkey, rev) partials BEFORE the
    single large-large hash join with orders (the revenue_by_nation
    plan), then the customer->nationkey map broadcasts. Both sides are
    exact 1e-4 integer units; two O(nations) relations merge
    driver-side."""
    import pyarrow.compute as pc  # noqa: F401
    from ray.data.aggregate import Sum

    from .joins import broadcast_join, hash_join

    # tiny nation map driver-side (25 rows by schema contract)
    nat_tbl = pa.concat_tables(
        [b for b in nation.select_columns(["n_nationkey", "n_name"])
         .iter_batches(batch_format="pyarrow") if b.num_rows])
    name_of = dict(zip(
        nat_tbl.column("n_nationkey").cast(pa.int64()).to_pylist(),
        nat_tbl.column("n_name").to_pylist()))

    def nat_partial(key_col):
        def fn(b: pa.Table) -> pa.Table:
            empty = pa.table({"nat": pa.array([], pa.int64()),
                              "units": pa.array([], pa.int64())})
            if b.num_rows == 0:
                return empty
            nat = b.column(key_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            rev = b.column("rev").to_numpy(zero_copy_only=False) \
                if "rev" in b.column_names else _rev_units(
                    b.column("l_extendedprice").to_numpy(
                        zero_copy_only=False),
                    b.column("l_discount").to_numpy(zero_copy_only=False))
            uk, sums = _int_group_sums(nat, rev)
            return pa.table({"nat": pa.array(uk, pa.int64()),
                             "units": pa.array(sums, pa.int64())})
        return fn

    # --- supplier side: broadcast map onto the fact scan
    smap = supplier.select_columns(["s_suppkey", "s_nationkey"])
    li_s = lineitem.select_columns(
        ["l_suppkey", "l_extendedprice", "l_discount"])
    try:
        li_s = broadcast_join(li_s, smap, on="l_suppkey",
                              right_on="s_suppkey",
                              max_rows=max_bcast_rows)
    except ValueError:
        li_s = hash_join(li_s, smap, on="l_suppkey", right_on="s_suppkey")
    supp = li_s.map_batches(nat_partial("s_nationkey"),
                            batch_format="pyarrow") \
        .groupby("nat").aggregate(Sum("units", alias_name="supp_units"))

    # --- customer side: pre-aggregate lineitem per order FIRST
    def order_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"l_orderkey": pa.array([], pa.int64()),
                          "rev": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        ok = b.column("l_orderkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        rev = _rev_units(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False),
            b.column("l_discount").to_numpy(zero_copy_only=False))
        uk, sums = _int_group_sums(ok, rev)
        return pa.table({"l_orderkey": pa.array(uk, pa.int64()),
                         "rev": pa.array(sums, pa.int64())})

    li_o = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount"]) \
        .map_batches(order_partial, batch_format="pyarrow")
    ordj = hash_join(li_o, orders.select_columns(
        ["o_orderkey", "o_custkey"]), on="l_orderkey",
        right_on="o_orderkey")
    cmap = customer.select_columns(["c_custkey", "c_nationkey"])
    try:
        ordj = broadcast_join(ordj, cmap, on="o_custkey",
                              right_on="c_custkey",
                              max_rows=max_bcast_rows)
    except ValueError:
        ordj = hash_join(ordj, cmap, on="o_custkey", right_on="c_custkey")
    cust = ordj.map_batches(nat_partial("c_nationkey"),
                            batch_format="pyarrow") \
        .groupby("nat").aggregate(Sum("units", alias_name="cust_units"))

    # --- two O(nations) relations merge driver-side
    def tiny(ds, col):
        out: dict = {}
        for b in ds.iter_batches(batch_format="pyarrow"):
            for k, v in zip(b.column("nat").to_pylist(),
                            b.column(col).to_pylist()):
                out[int(k)] = int(v)
        return out

    su, cu = tiny(supp, "supp_units"), tiny(cust, "cust_units")
    nats = sorted(set(su) | set(cu))
    names = [name_of[k] for k in nats]
    order = np.argsort(np.asarray(names, object), kind="stable")
    s_arr = np.array([su.get(nats[i], 0) for i in order], np.int64)
    c_arr = np.array([cu.get(nats[i], 0) for i in order], np.int64)
    return pa.table({
        "nation": pa.array([names[i] for i in order], pa.string()),
        "supp_revenue": pa.array(s_arr.astype(np.float64) / 10000.0,
                                 pa.float64()),
        "cust_revenue": pa.array(c_arr.astype(np.float64) / 10000.0,
                                 pa.float64()),
        "balance": pa.array((s_arr - c_arr).astype(np.float64) / 10000.0,
                            pa.float64())})


def rfm(orders):
    """Customer RFM profile -> (o_custkey, recency_days, frequency,
    monetary): days since the customer's last order (relative to the
    GLOBAL latest order date), order count, and exact total spend — the
    classic segmentation input (Hughes 1994), computed without any join.

    Plan: per-batch packed partials (max date, count, cent sum per
    customer) -> ONE native groupby over O(customers) rows; the global
    anchor date is a streaming Max scalar. All arithmetic integer."""
    from ray.data.aggregate import Max, Sum

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"o_custkey": pa.array([], pa.int64()),
                          "last_d": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        ck = b.column("o_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        d = b.column("o_orderdate").cast(pa.date32()).cast(pa.int32()) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        cents = half_away_scaled_int(
            b.column("o_totalprice").to_numpy(zero_copy_only=False), 100)
        o = np.argsort(ck, kind="stable")
        ck, d, cents = ck[o], d[o], cents[o]
        starts = np.flatnonzero(np.concatenate(
            ([True], ck[1:] != ck[:-1])))
        return pa.table({
            "o_custkey": pa.array(ck[starts], pa.int64()),
            "last_d": pa.array(np.maximum.reduceat(d, starts), pa.int64()),
            "n": pa.array(np.diff(np.append(starts, ck.size)), pa.int64()),
            "cents": pa.array(np.add.reduceat(cents, starts), pa.int64())})

    per_cust = orders.select_columns(
        ["o_custkey", "o_orderdate", "o_totalprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(
            Max("last_d", alias_name="last_d"),
            Sum("n", alias_name="frequency"),
            Sum("cents", alias_name="cents")).materialize()
    anchor = per_cust.aggregate(Max("last_d", alias_name="m")).get("m")
    if anchor is None:
        return pa.table({"o_custkey": pa.array([], pa.int64()),
                         "recency_days": pa.array([], pa.int64()),
                         "frequency": pa.array([], pa.int64()),
                         "monetary": pa.array([], pa.float64())})
    anchor = int(anchor)

    def finish(b: pa.Table) -> pa.Table:
        last = b.column("last_d").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cents = b.column("cents").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "o_custkey": b.column("o_custkey").cast(pa.int64()),
            "recency_days": pa.array(anchor - last, pa.int64()),
            "frequency": b.column("frequency").cast(pa.int64()),
            "monetary": pa.array(cents.astype(np.float64) / 100.0,
                                 pa.float64())})

    return per_cust.map_batches(finish, batch_format="pyarrow") \
        .sort("o_custkey")


def local_supplier_volume(lineitem, orders, customer, supplier, nation,
                          region, region_name: str = "ASIA",
                          max_bcast_rows=_BCAST_JOIN_ROWS):
    """TPC-H Q5 local supplier volume -> (nation, revenue): revenue from
    lineitems where the CUSTOMER and the SUPPLIER sit in the same nation,
    restricted to one region (the classic "local fulfilment" report).
    The date window is the caller's concern (push it into the orders
    scan — see read_revenue_inputs).

    Plan: nation x region resolve driver-side (25 x 5 rows by schema
    contract) to the in-region nation set. The supplier->nationkey map
    broadcasts onto lineitem (hash join above the gate), which filters
    to in-region supplier nations and collapses per batch to
    (orderkey, supp-nation) revenue partials — the only rows that cross
    the ONE large-large hash join with the date-filtered orders side
    (customer map broadcast the same way). The local condition
    c_nationkey == s_nationkey applies per batch after the join; the
    final groupby sees <= 5 nation cells. Exact 1e-4 integer units."""
    import pyarrow.compute as pc  # noqa: F401
    from ray.data.aggregate import Sum

    from .joins import broadcast_join

    def _tiny(ds, cols):
        tbl = pa.concat_tables(
            [b for b in ds.select_columns(list(cols))
             .iter_batches(batch_format="pyarrow") if b.num_rows])
        return {int(k): v for k, v in zip(
            tbl.column(cols[0]).cast(pa.int64()).to_pylist(),
            tbl.column(cols[1]).to_pylist())}

    rname_of = _tiny(region, ("r_regionkey", "r_name"))
    rkey = next((k for k, v in rname_of.items() if v == region_name),
                None)
    if rkey is None:
        raise ValueError(f"unknown region {region_name!r}")
    name_of = _tiny(nation, ("n_nationkey", "n_name"))
    reg_of = _tiny(nation, ("n_nationkey", "n_regionkey"))
    nats = np.array(sorted(k for k, r in reg_of.items() if r == rkey),
                    np.int64)
    # <=25 nations by contract: 5-bit packed index
    idx_of = np.full(int(nats.max()) + 1 if nats.size else 1, -1,
                     np.int64)
    idx_of[nats] = np.arange(nats.size, dtype=np.int64)

    smap = supplier.select_columns(["s_suppkey", "s_nationkey"])
    li = lineitem.select_columns(
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    try:
        li = broadcast_join(li, smap, on="l_suppkey",
                            right_on="s_suppkey", max_rows=max_bcast_rows)
    except ValueError:
        li = hash_join(li, smap, on="l_suppkey", right_on="s_suppkey")

    def li_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"l_orderkey": pa.array([], pa.int64()),
                          "snat": pa.array([], pa.int64()),
                          "rev": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        snat = b.column("s_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = np.isin(snat, nats)
        if not m.any():
            return empty
        ok = b.column("l_orderkey").to_numpy(
            zero_copy_only=False).astype(np.int64)[m]
        rev = _rev_units(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False)[m],
            b.column("l_discount").to_numpy(zero_copy_only=False)[m])
        packed = (ok << np.int64(5)) | idx_of[snat[m]]
        uk, sums = _int_group_sums(packed, rev)
        return pa.table({
            "l_orderkey": pa.array(uk >> np.int64(5), pa.int64()),
            "snat": pa.array(nats[uk & np.int64(0x1F)], pa.int64()),
            "rev": pa.array(sums, pa.int64())})

    li_agg = li.map_batches(li_partial, batch_format="pyarrow")

    cmap = customer.select_columns(["c_custkey", "c_nationkey"])
    ords = orders.select_columns(["o_orderkey", "o_custkey"])
    try:
        ords = broadcast_join(ords, cmap, on="o_custkey",
                              right_on="c_custkey",
                              max_rows=max_bcast_rows)
    except ValueError:
        ords = hash_join(ords, cmap, on="o_custkey", right_on="c_custkey")

    joined = hash_join(li_agg, ords, on="l_orderkey",
                       right_on="o_orderkey")

    def local_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"nat": pa.array([], pa.int64()),
                          "units": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        snat = b.column("snat").to_numpy(zero_copy_only=False)
        cnat = b.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = snat == cnat
        if not m.any():
            return empty
        rev = b.column("rev").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)[m]
        uk, sums = _int_group_sums(snat[m], rev)
        return pa.table({"nat": pa.array(uk, pa.int64()),
                         "units": pa.array(sums, pa.int64())})

    per_nat = joined.map_batches(local_partial, batch_format="pyarrow") \
        .groupby("nat").aggregate(Sum("units", alias_name="units"))

    # O(region nations) relation: finish + order driver-side on the
    # exact INTEGER units (never the derived float), then name asc
    rows = []
    for b in per_nat.iter_batches(batch_format="pyarrow"):
        rows.extend(zip(b.column("nat").to_pylist(),
                        b.column("units").to_pylist()))
    rows.sort(key=lambda r: (-int(r[1]), name_of[int(r[0])]))
    return pa.table({
        "nation": pa.array([name_of[int(k)] for k, _ in rows],
                           pa.string()),
        "revenue": pa.array([int(u) / 10000.0 for _, u in rows],
                            pa.float64())})


#: Q19-style (brand, size_lo, size_hi, qty_lo, qty_hi) revenue bands.
_DEFAULT_BANDS = (("Brand#12", 1, 15, 1, 21),
                  ("Brand#23", 1, 25, 10, 30),
                  ("Brand#34", 1, 35, 20, 40))


def banded_revenue(lineitem, part, bands=_DEFAULT_BANDS,
                   max_bcast_rows=_BCAST_JOIN_ROWS):
    """TPC-H Q19 discounted-revenue-in-bands -> one (revenue) row: sum of
    discounted revenue over lineitems whose part matches ANY
    (brand, size range, quantity range) band — the classic multi-predicate
    OR that a warehouse pushes into one scan.

    Plan: the part attribute map (partkey -> brand id, size) broadcasts
    (hash join above the gate); each batch evaluates all bands as one
    vectorized OR mask and emits a single integer-unit partial; the
    final sum is a streaming scalar. Nothing but 1-row partials ever
    crosses a wire."""
    from ray.data.aggregate import Sum

    from .joins import broadcast_join

    brands = sorted({b[0] for b in bands})
    bid_of = {br: i for i, br in enumerate(brands)}

    def attr_map(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        bid = np.full(b.num_rows, -1, np.int64)
        br = b.column("p_brand").to_pylist()
        for i, v in enumerate(br):
            if v in bid_of:
                bid[i] = bid_of[v]
        return pa.table({
            "p_partkey": pc.cast(b.column("p_partkey"), pa.int64()),
            "bid": pa.array(bid, pa.int64()),
            "p_size": pc.cast(b.column("p_size"), pa.int64())})

    pmap = part.select_columns(["p_partkey", "p_brand", "p_size"]) \
        .map_batches(attr_map, batch_format="pyarrow")
    li = lineitem.select_columns(
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
    try:
        li = broadcast_join(li, pmap, on="l_partkey",
                            right_on="p_partkey", max_rows=max_bcast_rows)
    except ValueError:
        li = hash_join(li, pmap, on="l_partkey", right_on="p_partkey")

    band_arr = [(bid_of[br], s_lo, s_hi, q_lo, q_hi)
                for br, s_lo, s_hi, q_lo, q_hi in bands]

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"units": pa.array([], pa.int64())})
        bid = b.column("bid").to_numpy(zero_copy_only=False)
        size = b.column("p_size").to_numpy(zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        m = np.zeros(b.num_rows, bool)
        for bi, s_lo, s_hi, q_lo, q_hi in band_arr:
            m |= ((bid == bi) & (size >= s_lo) & (size <= s_hi)
                  & (qty >= q_lo) & (qty <= q_hi))
        if not m.any():
            return pa.table({"units": pa.array([], pa.int64())})
        rev = _rev_units(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False)[m],
            b.column("l_discount").to_numpy(zero_copy_only=False)[m])
        return pa.table({"units": pa.array([int(rev.sum())], pa.int64())})

    total = li.map_batches(partial, batch_format="pyarrow") \
        .aggregate(Sum("units", alias_name="units"))
    units = int(total.get("units") or 0)
    return pa.table({"revenue": pa.array([units / 10000.0],
                                         pa.float64())})


def priority_returns(lineitem, orders,
                     max_bcast_rows=_BCAST_JOIN_ROWS):
    """TPC-H Q4-shaped priority report -> (o_orderpriority, order_count):
    how many orders of each priority had AT LEAST ONE returned lineitem
    (l_returnflag = 'R') — an EXISTS semi-join counted per category.

    Plan: lineitem filters to returns and collapses per batch to
    distinct orderkeys; joins.semi_join emits each qualifying order
    exactly ONCE regardless of how many lines were returned (gated
    broadcast of the distinct-key relation, co-partitioned membership
    scan above it); per-batch (priority, n) partials collapse to <= 5
    cells before the final tiny groupby."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .joins import semi_join

    def returned_keys(b: pa.Table) -> pa.Table:
        empty = pa.table({"l_orderkey": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        m = pc.equal(b.column("l_returnflag"), "R")
        ok = b.filter(m).column("l_orderkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if ok.size == 0:
            return empty
        return pa.table({"l_orderkey": pa.array(np.unique(ok),
                                                pa.int64())})

    keys = lineitem.select_columns(["l_orderkey", "l_returnflag"]) \
        .map_batches(returned_keys, batch_format="pyarrow")
    hit = semi_join(orders.select_columns(
        ["o_orderkey", "o_orderpriority"]), keys,
        on="o_orderkey", right_on="l_orderkey",
        max_bcast_rows=max_bcast_rows)

    def prio_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"o_orderpriority": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        enc = b.column("o_orderpriority").dictionary_encode()
        codes = np.asarray(enc.combine_chunks().indices.to_numpy(
            zero_copy_only=False), np.int64)
        cats = enc.combine_chunks().dictionary.to_pylist()
        cnt = np.bincount(codes, minlength=len(cats))
        return pa.table({
            "o_orderpriority": pa.array(cats, pa.string()),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    return hit.map_batches(prio_partial, batch_format="pyarrow") \
        .groupby("o_orderpriority") \
        .aggregate(Sum("n", alias_name="order_count")) \
        .sort("o_orderpriority")


def linestatus_priority(lineitem, orders, date_lo: str = "1996-01-01",
                        date_hi: str = "1998-01-01"):
    """TPC-H Q12-shaped priority-by-category report -> one row per
    (l_returnflag, l_linestatus) with ``high_line_count`` /
    ``low_line_count``: of the lines shipped inside the date window,
    how many belong to critical-priority orders ('1-URGENT'/'2-HIGH')
    vs everything else. (The reference Q12 groups by l_shipmode and
    windows on receipt/commit dates; this corpus carries neither, so
    the category is (returnflag, linestatus) and the window is on
    l_shipdate — the join/aggregate PLAN is Q12's.)

    Plan: lineitem filters the window per batch and PRE-AGGREGATES to
    (l_orderkey, category-code, n) — per-order line counts — so the
    join input is the distinct (order, category) relation, not raw
    lines. Orders reduces to (o_orderkey, is_high int8). The two
    shuffle once through :func:`joins.hash_join`; after the join every
    batch collapses to <= 12 (category, is_high, n) cells before ONE
    tiny native groupby Sum. Nothing wider than the category table
    ever materializes.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .joins import hash_join

    lo = np.datetime64(date_lo)
    hi = np.datetime64(date_hi)

    def li_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"l_orderkey": pa.array([], pa.int64()),
                          "cat": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        sd = b.column("l_shipdate").to_numpy(zero_copy_only=False)
        m = (sd >= lo) & (sd < hi)
        if not m.any():
            return empty
        ok = b.column("l_orderkey").to_numpy(
            zero_copy_only=False)[m].astype(np.int64)
        rf = b.column("l_returnflag").to_numpy(zero_copy_only=False)[m]
        ls = b.column("l_linestatus").to_numpy(zero_copy_only=False)[m]
        cat = np.asarray([f"{a}|{c}" for a, c in zip(rf, ls)], object)
        o = np.lexsort((cat, ok))
        ok, cat = ok[o], cat[o]
        newseg = np.concatenate(
            ([True], (ok[1:] != ok[:-1]) | (cat[1:] != cat[:-1])))
        starts = np.flatnonzero(newseg)
        n = np.diff(np.append(starts, ok.size)).astype(np.int64)
        return pa.table({
            "l_orderkey": pa.array(ok[starts], pa.int64()),
            "cat": pa.array(cat[starts], pa.string()),
            "n": pa.array(n, pa.int64())})

    def ord_flag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "is_high": pa.array([], pa.int8())})
        hi_m = pc.is_in(b.column("o_orderpriority"),
                        value_set=pa.array(["1-URGENT", "2-HIGH"]))
        return pa.table({
            "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
            "is_high": hi_m.cast(pa.int8())})

    li = lineitem.select_columns(
        ["l_orderkey", "l_returnflag", "l_linestatus", "l_shipdate"]) \
        .map_batches(li_partial, batch_format="pyarrow")
    od = orders.select_columns(["o_orderkey", "o_orderpriority"]) \
        .map_batches(ord_flag, batch_format="pyarrow")
    joined = hash_join(li, od, on="l_orderkey", right_on="o_orderkey")

    def cells(b: pa.Table) -> pa.Table:
        empty = pa.table({"cat": pa.array([], pa.string()),
                          "is_high": pa.array([], pa.int8()),
                          "n": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        cat = b.column("cat").to_numpy(zero_copy_only=False)
        ih = b.column("is_high").to_numpy(zero_copy_only=False) \
            .astype(np.int8)
        n = b.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        key = np.asarray([f"{c}|{int(h)}" for c, h in zip(cat, ih)],
                         object)
        uk, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(uk.size, np.int64)
        np.add.at(sums, inv, n)
        parts = [k.rsplit("|", 1) for k in uk.tolist()]
        return pa.table({
            "cat": pa.array([p[0] for p in parts], pa.string()),
            "is_high": pa.array([int(p[1]) for p in parts], pa.int8()),
            "n": pa.array(sums, pa.int64())})

    agg = joined.map_batches(cells, batch_format="pyarrow") \
        .groupby(["cat", "is_high"]).aggregate(Sum("n", alias_name="n"))

    def fin(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "l_returnflag": pa.array([], pa.string()),
                "l_linestatus": pa.array([], pa.string()),
                "high_line_count": pa.array([], pa.int64()),
                "low_line_count": pa.array([], pa.int64())})
        cat = b.column("cat").to_numpy(zero_copy_only=False)
        ih = b.column("is_high").to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uc, inv = np.unique(cat, return_inverse=True)
        high = np.zeros(uc.size, np.int64)
        low = np.zeros(uc.size, np.int64)
        np.add.at(high, inv[ih == 1], n[ih == 1])
        np.add.at(low, inv[ih == 0], n[ih == 0])
        parts = [c.split("|", 1) for c in uc.tolist()]
        return pa.table({
            "l_returnflag": pa.array([p[0] for p in parts], pa.string()),
            "l_linestatus": pa.array([p[1] for p in parts], pa.string()),
            "high_line_count": pa.array(high, pa.int64()),
            "low_line_count": pa.array(low, pa.int64())})

    # the (category, is_high) table is <= 12 rows — one final combine
    return agg.repartition(1).map_batches(fin, batch_format="pyarrow") \
        .sort(["l_returnflag", "l_linestatus"])


def min_cost_supplier(lineitem, supplier, nation, region,
                      region_name: str = "EUROPE", k: int = 100,
                      max_bcast_rows: int = _BCAST_JOIN_ROWS):
    """TPC-H Q2-shaped minimum-cost supplier -> per part, the supplier
    in ``region_name`` with the lowest observed unit cost
    (sum extendedprice / sum quantity over that (part, supplier)'s
    lines — the corpus has no partsupp relation, so lineitem IS the
    cost evidence; the correlated-MIN-subquery PLAN is Q2's). Output:
    top ``k`` by (s_acctbal DESC, n_name, s_name, p_partkey), Q2's
    ordering.

    Plan: region->nation->supplier are dimension broadcasts (tiny by
    schema); lineitem pre-aggregates per batch to packed
    (part, supplier) integer-cent sums so ONE native groupby carries
    exact (price, qty) evidence; the per-part argmin runs as per-batch
    local-argmin partials -> a parts-keyed map_groups final (rows per
    part = batches that saw it, never the supplier universe). The
    comparator is IEEE float division of exact int64 sums with suppkey
    tie-break — bit-identical to the SQL ORDER BY.
    """
    from ray.data.aggregate import Sum

    from .common import round_half_away

    # --- dimension broadcasts: region/nation are schema-bounded (5/25
    # rows); the supplier map is SIZE-GATED like every other broadcast
    # in this repo (CLAUDE.md rule). Above the gate suppliers stay a
    # Dataset and hash-join against the (part, supplier) cost sums on
    # suppkey (the part_type_revenue shape) — see _above_gate below.
    rk = {r["r_regionkey"] for r in region.take_all()
          if r["r_name"] == region_name}
    nmap = {r["n_nationkey"]: r["n_name"] for r in nation.take_all()
            if r["n_regionkey"] in rk}
    if supplier.count() > max_bcast_rows:
        return _min_cost_supplier_joined(lineitem, supplier, nmap, k)
    smap = {r["s_suppkey"]: (r["s_name"], r["s_nationkey"],
                             r["s_acctbal"])
            for r in supplier.take_all()
            if r["s_nationkey"] in nmap}
    import ray
    sk = np.array(sorted(smap), np.int64)
    sk_ref = ray.put(sk)

    def li_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"pk": pa.array([], pa.int64()),
                          "sk": pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64()),
                          "qc": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        skeys = ray.get(sk_ref)
        s = b.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.clip(np.searchsorted(skeys, s), 0, max(skeys.size - 1, 0))
        m = skeys.size > 0
        msk = (skeys[pos] == s) if m else np.zeros(s.size, bool)
        if not msk.any():
            return empty
        p = b.column("l_partkey").to_numpy(
            zero_copy_only=False)[msk].astype(np.int64)
        s = s[msk]
        cents = half_away_scaled_int(
            b.column("l_extendedprice").to_numpy(
                zero_copy_only=False)[msk], 100)
        qc = half_away_scaled_int(
            b.column("l_quantity").to_numpy(
                zero_copy_only=False)[msk], 100)
        # lexsort the raw key pair — a packed p*K+s key silently
        # corrupts once suppkey >= K (review finding), and gains nothing
        o = np.lexsort((s, p))
        p, s = p[o], s[o]
        starts = np.flatnonzero(np.concatenate(
            ([True], (p[1:] != p[:-1]) | (s[1:] != s[:-1]))))
        return pa.table({
            "pk": pa.array(p[starts], pa.int64()),
            "sk": pa.array(s[starts], pa.int64()),
            "cents": pa.array(np.add.reduceat(cents[o], starts),
                              pa.int64()),
            "qc": pa.array(np.add.reduceat(qc[o], starts), pa.int64())})

    sums = lineitem.select_columns(
        ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"]) \
        .map_batches(li_partial, batch_format="pyarrow") \
        .groupby(["pk", "sk"]).aggregate(
            Sum("cents", alias_name="cents"), Sum("qc", alias_name="qc"))

    def local_argmin(b: pa.Table) -> pa.Table:
        empty = pa.table({"pk": pa.array([], pa.int64()),
                          "sk": pa.array([], pa.int64()),
                          "cost": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        pk = b.column("pk").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        skc = b.column("sk").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        cents = b.column("cents").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        qc = b.column("qc").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        cost = cents.astype(np.float64) / qc.astype(np.float64)
        o = np.lexsort((skc, cost, pk))
        pk, skc, cost = pk[o], skc[o], cost[o]
        first = np.concatenate(([True], pk[1:] != pk[:-1]))
        return pa.table({"pk": pa.array(pk[first], pa.int64()),
                         "sk": pa.array(skc[first], pa.int64()),
                         "cost": pa.array(cost[first], pa.float64())})

    def final_argmin(g: pa.Table) -> pa.Table:
        empty = pa.table({"pk": pa.array([], pa.int64()),
                          "sk": pa.array([], pa.int64()),
                          "cost": pa.array([], pa.float64())})
        if g.num_rows == 0:
            return empty
        pk = g.column("pk").to_numpy(zero_copy_only=False)
        skc = g.column("sk").to_numpy(zero_copy_only=False)
        cost = g.column("cost").to_numpy(zero_copy_only=False)
        o = np.lexsort((skc, cost, pk))
        pk, skc, cost = pk[o], skc[o], cost[o]
        first = np.concatenate(([True], pk[1:] != pk[:-1]))
        return pa.table({"pk": pa.array(pk[first], pa.int64()),
                         "sk": pa.array(skc[first], pa.int64()),
                         "cost": pa.array(cost[first], pa.float64())})

    wins = sums.map_batches(local_argmin, batch_format="pyarrow") \
        .groupby("pk").map_groups(final_argmin, batch_format="pyarrow")

    def attach(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "s_acctbal": pa.array([], pa.float64()),
            "s_name": pa.array([], pa.string()),
            "n_name": pa.array([], pa.string()),
            "p_partkey": pa.array([], pa.int64()),
            "unit_cost": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        pk = b.column("pk").to_numpy(zero_copy_only=False)
        skc = b.column("sk").to_numpy(zero_copy_only=False)
        cost = b.column("cost").to_numpy(zero_copy_only=False)
        names, nnames, bals = [], [], []
        for s in skc.tolist():
            nm, nk, bal = smap[s]
            names.append(nm)
            nnames.append(nmap[nk])
            bals.append(float(bal))
        return pa.table({
            "s_acctbal": pa.array(bals, pa.float64()),
            "s_name": pa.array(names, pa.string()),
            "n_name": pa.array(nnames, pa.string()),
            "p_partkey": pa.array(pk, pa.int64()),
            "unit_cost": pa.array(round_half_away(cost, 6),
                                  pa.float64())})

    return wins.map_batches(attach, batch_format="pyarrow") \
        .sort(["s_acctbal", "n_name", "s_name", "p_partkey"],
              descending=[True, False, False, False]).limit(k)


def _min_cost_supplier_joined(lineitem, supplier, nmap: dict, k: int):
    """:func:`min_cost_supplier` above the supplier broadcast gate:
    supplier GROWS with scale factor (unlike region/nation), so no
    driver dict — the eligible-supplier relation stays a Dataset and
    ONE :func:`~.joins.hash_join` on suppkey both semi-filters the
    (part, supplier) cost sums to the region and attaches the supplier
    attributes the output needs. The per-part argmin then runs exactly
    as the broadcast path (local partials -> parts-keyed final), with
    the attribute columns riding along — rows per part stay bounded by
    batches-that-saw-it, never the supplier universe.
    """
    from ray.data.aggregate import Sum

    from .common import round_half_away
    from .joins import hash_join

    nkeys = np.array(sorted(nmap), np.int64)
    nnames = [nmap[int(x)] for x in nkeys.tolist()]

    def elig(b: pa.Table) -> pa.Table:
        empty = pa.table({"sk": pa.array([], pa.int64()),
                          "s_name": pa.array([], pa.string()),
                          "s_acctbal": pa.array([], pa.float64()),
                          "n_name": pa.array([], pa.string())})
        if b.num_rows == 0:
            return empty
        nk = b.column("s_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.clip(np.searchsorted(nkeys, nk), 0,
                      max(nkeys.size - 1, 0))
        m = (nkeys[pos] == nk) if nkeys.size else np.zeros(nk.size, bool)
        if not m.any():
            return empty
        return pa.table({
            "sk": b.column("s_suppkey").to_numpy(
                zero_copy_only=False)[m].astype(np.int64),
            "s_name": b.column("s_name").filter(pa.array(m)),
            "s_acctbal": b.column("s_acctbal").to_numpy(
                zero_copy_only=False)[m].astype(np.float64),
            "n_name": pa.array([nnames[int(i)] for i in pos[m]],
                               pa.string())})

    elig_ds = supplier.select_columns(
        ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]) \
        .map_batches(elig, batch_format="pyarrow")

    def li_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"pk": pa.array([], pa.int64()),
                          "sk": pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64()),
                          "qc": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        p = b.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = b.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = half_away_scaled_int(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False),
            100)
        qc = half_away_scaled_int(
            b.column("l_quantity").to_numpy(zero_copy_only=False), 100)
        o = np.lexsort((s, p))
        p, s = p[o], s[o]
        starts = np.flatnonzero(np.concatenate(
            ([True], (p[1:] != p[:-1]) | (s[1:] != s[:-1]))))
        return pa.table({
            "pk": pa.array(p[starts], pa.int64()),
            "sk": pa.array(s[starts], pa.int64()),
            "cents": pa.array(np.add.reduceat(cents[o], starts),
                              pa.int64()),
            "qc": pa.array(np.add.reduceat(qc[o], starts), pa.int64())})

    sums = lineitem.select_columns(
        ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"]) \
        .map_batches(li_partial, batch_format="pyarrow") \
        .groupby(["pk", "sk"]).aggregate(
            Sum("cents", alias_name="cents"), Sum("qc", alias_name="qc"))

    joined = hash_join(sums, elig_ds, on="sk")

    _out = {"pk": pa.int64(), "sk": pa.int64(),
            "cost": pa.float64(), "s_name": pa.string(),
            "s_acctbal": pa.float64(), "n_name": pa.string()}

    def argmin(b: pa.Table) -> pa.Table:
        empty = pa.table({c: pa.array([], t) for c, t in _out.items()})
        if b.num_rows == 0:
            return empty
        pk = b.column("pk").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        skc = b.column("sk").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        if "cost" in b.column_names:
            cost = b.column("cost").to_numpy(zero_copy_only=False)
        else:
            cents = b.column("cents").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            qc = b.column("qc").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            cost = cents.astype(np.float64) / qc.astype(np.float64)
        o = np.lexsort((skc, cost, pk))
        first = np.concatenate(([True], pk[o][1:] != pk[o][:-1]))
        take = pa.array(o[first].astype(np.int64))
        return pa.table({
            "pk": pa.array(pk[o][first], pa.int64()),
            "sk": pa.array(skc[o][first], pa.int64()),
            "cost": pa.array(cost[o][first], pa.float64()),
            "s_name": b.column("s_name").take(take),
            "s_acctbal": b.column("s_acctbal").cast(pa.float64())
            .take(take),
            "n_name": b.column("n_name").take(take)})

    wins = joined.map_batches(argmin, batch_format="pyarrow") \
        .groupby("pk").map_groups(argmin, batch_format="pyarrow")

    def fmt(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "s_acctbal": pa.array([], pa.float64()),
                "s_name": pa.array([], pa.string()),
                "n_name": pa.array([], pa.string()),
                "p_partkey": pa.array([], pa.int64()),
                "unit_cost": pa.array([], pa.float64())})
        return pa.table({
            "s_acctbal": b.column("s_acctbal"),
            "s_name": b.column("s_name"),
            "n_name": b.column("n_name"),
            "p_partkey": b.column("pk"),
            "unit_cost": pa.array(round_half_away(
                b.column("cost").to_numpy(zero_copy_only=False), 6),
                pa.float64())})

    return wins.map_batches(fmt, batch_format="pyarrow") \
        .sort(["s_acctbal", "n_name", "s_name", "p_partkey"],
              descending=[True, False, False, False]).limit(k)


def order_reconcile(orders, lineitem, date_lo: str = "1998-01-01"):
    """FULL OUTER ledger reconciliation -> (o_orderkey, order_total,
    line_total, status): recent orders (o_orderdate >= ``date_lo``)
    against per-order shipment revenue from the FULL lineitem relation
    — the two-sided audit every warehouse runs (status 'both' /
    'orders_only' / 'lines_only'). This is the repo's full-outer join
    shape: every other join family (inner/left/semi/anti/asof/interval)
    exists elsewhere; full outer needs BOTH unmatched sides, which a
    per-batch broadcast can never emit correctly, so it runs as the
    tagged-union co-partition (both sides hash by key into one groupby;
    each bucket does a vectorized two-array merge).

    Both sides PRE-AGGREGATE before the shuffle (orders to (key, cents),
    lineitem to per-batch (key, cents-sum partials) merged by the same
    bucket pass), so the wide step moves O(distinct orderkeys), never
    raw lines. Money stays integer cents end-to-end; floats only in the
    final /100 columns.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .common import half_away_scaled_int
    from ..stages.common import adaptive_groups

    lo = np.datetime64(date_lo)

    def ord_side(b: pa.Table) -> pa.Table:
        empty = pa.table({"k": pa.array([], pa.int64()),
                          "oc": pa.array([], pa.int64()),
                          "lc": pa.array([], pa.int64()),
                          "side": pa.array([], pa.int8())})
        if b.num_rows == 0:
            return empty
        od = b.column("o_orderdate").to_numpy(zero_copy_only=False)
        m = od >= lo
        if not m.any():
            return empty
        k = b.column("o_orderkey").to_numpy(
            zero_copy_only=False)[m].astype(np.int64)
        cents = half_away_scaled_int(
            b.column("o_totalprice").to_numpy(zero_copy_only=False)[m],
            100)
        return pa.table({"k": pa.array(k, pa.int64()),
                         "oc": pa.array(cents, pa.int64()),
                         "lc": pa.array(np.zeros(k.size, np.int64)),
                         "side": pa.array(np.zeros(k.size, np.int8),
                                          pa.int8())})

    def li_side(b: pa.Table) -> pa.Table:
        empty = pa.table({"k": pa.array([], pa.int64()),
                          "oc": pa.array([], pa.int64()),
                          "lc": pa.array([], pa.int64()),
                          "side": pa.array([], pa.int8())})
        if b.num_rows == 0:
            return empty
        k = b.column("l_orderkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        cents = half_away_scaled_int(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False),
            100)
        uk, inv = np.unique(k, return_inverse=True)
        sums = np.zeros(uk.size, np.int64)
        np.add.at(sums, inv, cents)
        return pa.table({"k": pa.array(uk, pa.int64()),
                         "oc": pa.array(np.zeros(uk.size, np.int64)),
                         "lc": pa.array(sums, pa.int64()),
                         "side": pa.array(np.ones(uk.size, np.int8),
                                          pa.int8())})

    o_rel = orders.select_columns(
        ["o_orderkey", "o_totalprice", "o_orderdate"]) \
        .map_batches(ord_side, batch_format="pyarrow")
    l_rel = lineitem.select_columns(["l_orderkey", "l_extendedprice"]) \
        .map_batches(li_side, batch_format="pyarrow")
    both = o_rel.union(l_rel)
    num_groups = adaptive_groups(max(orders.count(), 1), 1_000_000,
                                 lo=16)

    def bucket(b: pa.Table) -> pa.Table:
        k = b.column("k").to_numpy(zero_copy_only=False)
        return b.append_column(
            "_g", pa.array(k % num_groups, pa.int64()))

    def merge(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "o_orderkey": pa.array([], pa.int64()),
            "order_total": pa.array([], pa.float64()),
            "line_total": pa.array([], pa.float64()),
            "status": pa.array([], pa.string())})
        if g.num_rows == 0:
            return empty
        k = g.column("k").to_numpy(zero_copy_only=False)
        oc = g.column("oc").to_numpy(zero_copy_only=False)
        lc = g.column("lc").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        ocs = np.zeros(uk.size, np.int64)
        lcs = np.zeros(uk.size, np.int64)
        has_o = np.zeros(uk.size, bool)
        has_l = np.zeros(uk.size, bool)
        np.add.at(ocs, inv, oc)
        np.add.at(lcs, inv, lc)
        has_o[inv[side == 0]] = True
        has_l[inv[side == 1]] = True
        status = np.where(has_o & has_l, "both",
                          np.where(has_o, "orders_only", "lines_only"))
        ot = pa.array(np.where(has_o, ocs / 100.0, np.nan),
                      pa.float64())
        lt = pa.array(np.where(has_l, lcs / 100.0, np.nan),
                      pa.float64())
        # NaN -> null so the schema matches SQL's outer-join NULLs
        ot = pc.if_else(pc.is_nan(ot), pa.nulls(uk.size, pa.float64()),
                        ot)
        lt = pc.if_else(pc.is_nan(lt), pa.nulls(uk.size, pa.float64()),
                        lt)
        return pa.table({
            "o_orderkey": pa.array(uk, pa.int64()),
            "order_total": ot,
            "line_total": lt,
            "status": pa.array(status.astype(object), pa.string())})

    return both.map_batches(bucket, batch_format="pyarrow") \
        .groupby("_g").map_groups(
            lambda g: merge(g.drop(["_g"])), batch_format="pyarrow") \
        .sort("o_orderkey")


def customer_value_deciles(orders):
    """Customer lifetime-spend deciles -> (decile, n_customers,
    min_spend, max_spend, total_spend, avg_spend): the classic value
    segmentation — rank every customer by exact total spend and cut the
    ranking into ten equal-width rank bands (decile 0 = lowest spenders).

    Plan: per-customer cent totals (per-batch packed partials -> ONE
    O(customers) groupby), then rank.global_rank assigns exact 1-based
    positions by (cents, custkey) ascending WITHOUT a global sort
    (equi-depth bins + prefix offsets); decile = (rank-1)*10 // n is a
    pure map, and ten integer cells aggregate natively. SQL replays the
    rank as row_number() OVER (ORDER BY cents, o_custkey)."""
    from ray.data.aggregate import Max, Min, Sum

    from .joins import hash_join
    from .rank import global_rank

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"o_custkey": pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        ck = b.column("o_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        c = half_away_scaled_int(
            b.column("o_totalprice").to_numpy(zero_copy_only=False), 100)
        o = np.argsort(ck, kind="stable")
        ck, c = ck[o], c[o]
        starts = np.flatnonzero(np.concatenate(
            ([True], ck[1:] != ck[:-1])))
        return pa.table({
            "o_custkey": pa.array(ck[starts], pa.int64()),
            "cents": pa.array(np.add.reduceat(c, starts), pa.int64())})

    per_cust = orders.select_columns(["o_custkey", "o_totalprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Sum("cents", alias_name="cents")) \
        .materialize()
    n = per_cust.count()
    empty = pa.table({"decile": pa.array([], pa.int64()),
                      "n_customers": pa.array([], pa.int64()),
                      "min_spend": pa.array([], pa.float64()),
                      "max_spend": pa.array([], pa.float64()),
                      "total_spend": pa.array([], pa.float64()),
                      "avg_spend": pa.array([], pa.float64())})
    if n == 0:
        return empty

    ranks = global_rank(per_cust, value_col="cents", id_col="o_custkey")
    joined = hash_join(ranks, per_cust, on="o_custkey")

    def dec_partial(b: pa.Table) -> pa.Table:
        e = pa.table({"decile": pa.array([], pa.int64()),
                      "nc": pa.array([], pa.int64()),
                      "mn": pa.array([], pa.int64()),
                      "mx": pa.array([], pa.int64()),
                      "s": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return e
        r = b.column("rank").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        c = b.column("cents").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        d = (r - 1) * 10 // n
        o = np.argsort(d, kind="stable")
        d, c = d[o], c[o]
        starts = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
        return pa.table({
            "decile": pa.array(d[starts], pa.int64()),
            "nc": pa.array(np.diff(np.append(starts, d.size)), pa.int64()),
            "mn": pa.array(np.minimum.reduceat(c, starts), pa.int64()),
            "mx": pa.array(np.maximum.reduceat(c, starts), pa.int64()),
            "s": pa.array(np.add.reduceat(c, starts), pa.int64())})

    merged = joined.map_batches(dec_partial, batch_format="pyarrow") \
        .groupby("decile").aggregate(
            Sum("nc", alias_name="n_customers"),
            Min("mn", alias_name="mn"), Max("mx", alias_name="mx"),
            Sum("s", alias_name="s"))

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        nc = b.column("n_customers").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        s = b.column("s").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "decile": b.column("decile").cast(pa.int64()),
            "n_customers": pa.array(nc, pa.int64()),
            "min_spend": pa.array(
                b.column("mn").cast(pa.int64())
                .to_numpy(zero_copy_only=False).astype(np.float64) / 100.0,
                pa.float64()),
            "max_spend": pa.array(
                b.column("mx").cast(pa.int64())
                .to_numpy(zero_copy_only=False).astype(np.float64) / 100.0,
                pa.float64()),
            "total_spend": pa.array(s.astype(np.float64) / 100.0,
                                    pa.float64()),
            "avg_spend": pa.array(
                (s.astype(np.float64) / nc.astype(np.float64)) / 100.0,
                pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow") \
        .sort("decile")


def revenue_cube(lineitem, orders, customer, nation,
                 num_partitions: Optional[int] = None,
                 bcast_max_rows: int = _BCAST_JOIN_ROWS):
    """``GROUP BY CUBE(n_name, o_year)`` revenue — all four grouping
    levels: (nation, year) base cells, per-nation totals, per-YEAR
    totals (the level ROLLUP lacks), and the grand total. Every upper
    level derives from the bounded integer cell relation inside one
    tiny merge (the cells are <= 25 x |years| rows — the merge input is
    O(batches x cells), never the corpus), sharing
    :func:`_nation_year_cells` with :func:`revenue_rollup`.
    Output: (n_name, o_year, revenue) with SQL-CUBE nulls."""
    per_cell, names = _nation_year_cells(
        lineitem, orders, customer, nation,
        num_partitions=num_partitions, bcast_max_rows=bcast_max_rows)

    def finish(g: pa.Table) -> pa.Table:
        nat = g.column("n_nationkey").to_numpy(zero_copy_only=False)
        yr = g.column("o_year").to_numpy(zero_copy_only=False)
        rev = g.column("rev_units").to_numpy(zero_copy_only=False)
        combo = nat * 10_000 + yr
        uk, sums = _int_group_sums(combo, rev)
        base_n = uk // 10_000
        base_y = uk % 10_000
        un, nsums = _int_group_sums(base_n, sums)    # per-nation
        uy, ysums = _int_group_sums(base_y, sums)    # per-year
        out_name = ([names[k] for k in base_n] + [names[k] for k in un]
                    + [None] * uy.size + [None])
        out_year = (list(base_y) + [None] * un.size
                    + list(uy) + [None])
        out_rev = np.concatenate([sums, nsums, ysums, [sums.sum()]])
        return pa.table({
            "n_name": pa.array(out_name, pa.string()),
            "o_year": pa.array(out_year, pa.int64()),
            "revenue": pa.array(out_rev.astype(np.float64) / 10000.0,
                                pa.float64())})

    return per_cell.map_batches(
        lambda b: b.append_column("_g", pa.array([0] * b.num_rows,
                                                 pa.int8())),
        batch_format="pyarrow") \
        .groupby("_g").map_groups(lambda g: finish(g.drop(["_g"])),
                                  batch_format="pyarrow")


def excess_suppliers(lineitem, part, supplier,
                     name_like: str = "widget",
                     mult_num: int = 11, mult_den: int = 10,
                     max_bcast_rows=_BCAST_JOIN_ROWS):
    """TPC-H Q20-shaped excess-stock report -> (s_name, qty): suppliers
    who shipped MORE than ``mult_num/mult_den`` x the mean per-supplier
    quantity of parts whose name contains ``name_like`` — who is
    over-weighted on a product family.

    Plan: the matching part-key set collapses once and semi-joins
    lineitem (gated broadcast, co-partitioned membership above);
    per-batch (suppkey, qty-cents) partials -> ONE O(suppliers)
    groupby; the mean threshold is two streaming scalars compared by
    exact integer cross-multiplication (qty * n_supp * den >
    num * total); names resolve via the gated supplier map. No float
    enters the predicate."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .joins import broadcast_join, semi_join

    keys = part.select_columns(["p_partkey", "p_name"]).map_batches(
        lambda b: pa.table({"p_partkey": pc.cast(
            b.filter(pc.match_substring(b.column("p_name"), name_like))
            .column("p_partkey"), pa.int64())}),
        batch_format="pyarrow")
    li = semi_join(lineitem.select_columns(["l_partkey", "l_suppkey",
                                            "l_quantity"]),
                   keys, on="l_partkey", right_on="p_partkey",
                   max_bcast_rows=max_bcast_rows)

    def sup_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"s_suppkey": pa.array([], pa.int64()),
                          "qc": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        sk = b.column("l_suppkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        qc = half_away_scaled_int(
            b.column("l_quantity").to_numpy(zero_copy_only=False), 100)
        uk, sums = _int_group_sums(sk, qc)
        return pa.table({"s_suppkey": pa.array(uk, pa.int64()),
                         "qc": pa.array(sums, pa.int64())})

    per_supp = li.map_batches(sup_partial, batch_format="pyarrow") \
        .groupby("s_suppkey").aggregate(Sum("qc", alias_name="qc")) \
        .materialize()
    ns = per_supp.count()
    empty = pa.table({"s_name": pa.array([], pa.string()),
                      "qty": pa.array([], pa.float64())})
    if ns == 0:
        return empty
    total = int(per_supp.aggregate(Sum("qc", alias_name="s"))["s"])

    def thresh(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"s_suppkey": pa.array([], pa.int64()),
                             "qc": pa.array([], pa.int64())})
        qc = b.column("qc").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        rhs = mult_num * total
        if (qc.size and int(qc.max()) * ns * mult_den < 2 ** 63
                and rhs < 2 ** 63):
            keep = qc * np.int64(ns * mult_den) > np.int64(rhs)
        else:  # exact object-int compare past 2^63
            keep = np.array([int(q) * ns * mult_den > rhs
                             for q in qc], bool)
        return pa.table({
            "s_suppkey": b.column("s_suppkey").cast(pa.int64())
            .filter(pa.array(keep)),
            "qc": pa.array(qc[keep], pa.int64())})

    hot = per_supp.map_batches(thresh, batch_format="pyarrow")
    named = broadcast_join(
        hot, supplier.select_columns(["s_suppkey", "s_name"]),
        on="s_suppkey", max_rows=max_bcast_rows)

    rows = []
    for b in named.iter_batches(batch_format="pyarrow"):
        rows.extend(zip(b.column("s_name").to_pylist(),
                        b.column("qc").to_pylist()))
    rows.sort()
    return pa.table({
        "s_name": pa.array([r[0] for r in rows], pa.string()),
        "qty": pa.array([int(r[1]) / 100.0 for r in rows],
                        pa.float64())})


def dominant_suppliers(lineitem, supplier, num_groups=None,
                       max_bcast_rows=_BCAST_JOIN_ROWS):
    """TPC-H Q21-shaped dominance report -> (s_name, n_orders): on
    orders served by AT LEAST TWO suppliers, count per supplier the
    orders where that supplier alone billed a strict revenue majority
    (2 x supplier-revenue > order-revenue) — who monopolizes shared
    orders.

    Plan: per-batch (orderkey, suppkey) revenue partials -> orderkey
    co-partition into adaptive hash groups -> per task one
    lexsort/reduceat computes order totals, supplier-distinct counts
    and the majority mask with NO per-order loop -> O(suppliers)
    groupby -> gated name broadcast. The dominance predicate is exact
    integer arithmetic."""
    from ray.data.aggregate import Sum

    from .common import adaptive_groups
    from .joins import broadcast_join

    def pair_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"l_orderkey": pa.array([], pa.int64()),
                          "l_suppkey": pa.array([], pa.int64()),
                          "u": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        ok = b.column("l_orderkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        sk = b.column("l_suppkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        rev = _rev_units(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False),
            b.column("l_discount").to_numpy(zero_copy_only=False))
        o = np.lexsort((sk, ok))
        ok, sk, rev = ok[o], sk[o], rev[o]
        new = np.concatenate(([True], (ok[1:] != ok[:-1])
                              | (sk[1:] != sk[:-1])))
        starts = np.flatnonzero(new)
        return pa.table({
            "l_orderkey": pa.array(ok[starts], pa.int64()),
            "l_suppkey": pa.array(sk[starts], pa.int64()),
            "u": pa.array(np.add.reduceat(rev, starts), pa.int64())})

    pairs = lineitem.select_columns(
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]) \
        .map_batches(pair_partial, batch_format="pyarrow") \
        .groupby(["l_orderkey", "l_suppkey"]) \
        .aggregate(Sum("u", alias_name="u")).materialize()

    if num_groups is None:
        num_groups = adaptive_groups(max(pairs.count(), 1), 500_000,
                                     lo=8)

    def tag(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        g = (ok % num_groups + num_groups) % num_groups
        return pa.table({
            "gkey": pa.array(g, pa.int64()),
            "l_orderkey": pa.array(ok, pa.int64()),
            "l_suppkey": b.column("l_suppkey").cast(pa.int64()),
            "u": b.column("u").cast(pa.int64())})

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.table({"s_suppkey": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        ok = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        sk = g.column("l_suppkey").to_numpy(zero_copy_only=False)
        u = g.column("u").to_numpy(zero_copy_only=False)
        o = np.lexsort((sk, ok))
        ok, sk, u = ok[o], sk[o], u[o]
        starts = np.flatnonzero(np.concatenate(
            ([True], ok[1:] != ok[:-1])))
        sizes = np.diff(np.append(starts, ok.size))
        totals = np.add.reduceat(u, starts)
        # broadcast per-order stats back to pair rows
        rep_tot = np.repeat(totals, sizes)
        rep_n = np.repeat(sizes, sizes)
        dom = (rep_n >= 2) & (2 * u > rep_tot)
        if not dom.any():
            return empty
        uk, sums = _int_group_sums(sk[dom],
                                   np.ones(int(dom.sum()), np.int64))
        return pa.table({"s_suppkey": pa.array(uk, pa.int64()),
                         "n": pa.array(sums, pa.int64())})

    per_supp = pairs.map_batches(tag, batch_format="pyarrow") \
        .groupby("gkey").map_groups(
            lambda t: resolve(t.drop(["gkey"])), batch_format="pyarrow") \
        .groupby("s_suppkey").aggregate(Sum("n", alias_name="n_orders"))

    named = broadcast_join(
        per_supp, supplier.select_columns(["s_suppkey", "s_name"]),
        on="s_suppkey", max_rows=max_bcast_rows)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "s_name": b.column("s_name").cast(pa.string()),
            "n_orders": b.column("n_orders").cast(pa.int64())})

    return named.map_batches(finish, batch_format="pyarrow") \
        .sort(["n_orders", "s_name"], descending=[True, False])
