"""Deterministic dataset splitting and stratified sampling — the
train/valid/test assignment a training-data pipeline runs over every
corpus snapshot.

Both operators key off the same **Weyl multiplicative hash**
``h(id) = ((id + seed) * 2654435761) mod 2^32`` (Knuth's golden-ratio
multiplier). It is

- vectorized (one int64 multiply + mod per batch — no per-row Python,
  no md5 loop),
- equidistributed even on sequential ids (a Weyl sequence), and
- exactly expressible in ANSI SQL (``((id + seed) * 2654435761) %
  4294967296`` — no int64 overflow for ids < ~3.4e9), so the DuckDB
  oracle is bit-identical, not approximate.

Splits are *stable under corpus growth*: a document's assignment depends
only on its id and the seed, never on which other rows are present —
re-running on an appended corpus never reshuffles old rows (the property
hash-based splits are chosen for in practice).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

_WEYL = 2654435761          # floor(2^32 / golden ratio), Knuth 6.4
_MOD = 1 << 32


def weyl_hash(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """h(id) in [0, 2^32) as int64; matches the SQL expression exactly."""
    return ((ids.astype(np.int64) + seed) * _WEYL) % _MOD


def split_thresholds(fractions: Dict[str, float]) -> List[Tuple[str, int]]:
    """[(name, exclusive_upper_bound_on_h)] with cumulative bounds in hash
    space; the last bound is forced to 2^32 so every row lands somewhere.
    Shared by the Ray operator and the SQL-oracle generator so both sides
    use the SAME integer literals."""
    total = sum(fractions.values())
    bounds, acc = [], 0.0
    items = list(fractions.items())
    for i, (name, frac) in enumerate(items):
        acc += frac / total
        hi = _MOD if i == len(items) - 1 else int(acc * _MOD)
        bounds.append((name, hi))
    return bounds


def split_case_sql(id_expr: str, fractions: Dict[str, float],
                   seed: int = 0) -> str:
    """The oracle-side CASE expression for :func:`assign_split`."""
    h = f"((({id_expr}) + {seed}) * {_WEYL}) % {_MOD}"
    bounds = split_thresholds(fractions)
    whens = "".join(f" WHEN {h} < {hi} THEN '{name}'"
                    for name, hi in bounds[:-1])
    return f"CASE{whens} ELSE '{bounds[-1][0]}' END"


def assign_split(ds, id_col: str, fractions: Dict[str, float],
                 seed: int = 0, out_col: str = "split"):
    """Append a ``split`` column assigning each row to a named fraction by
    hash threshold. Pure map — no shuffle, no state, embarrassingly
    parallel at any scale."""
    bounds = split_thresholds(fractions)
    names = np.array([n for n, _ in bounds])
    uppers = np.array([hi for _, hi in bounds[:-1]], np.int64)

    def fn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column(out_col, pa.array([], pa.string()))
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        h = weyl_hash(ids, seed)
        idx = np.searchsorted(uppers, h, side="right")
        return b.append_column(out_col, pa.array(names[idx], pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample(ds, key: str, n: int, id_col: str, seed: int = 0,
                      extra_cols: Optional[List[str]] = None):
    """Deterministic n-per-group sample: within each ``key`` group keep
    the n rows with the smallest hash of ``id_col`` (ties broken by id),
    with a 1-based ``rank``. Same per-batch-combiner shape as
    :func:`~.events.top_k_per_group` — each batch forwards only its local
    n best per key, so the groupby merge sees O(batches x n) rows.

    Equals SQL ``row_number() OVER (PARTITION BY key ORDER BY h(id), id)
    <= n``.
    """
    from .events import top_k_per_group

    cols = list(dict.fromkeys([key, id_col] + (extra_cols or [])))

    def add_order(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("_negh", pa.array([], pa.int64()))
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        return b.append_column(
            "_negh", pa.array(-weyl_hash(ids, seed), pa.int64()))

    picked = top_k_per_group(
        ds.select_columns(cols).map_batches(add_order,
                                            batch_format="pyarrow"),
        key=key, order_col="_negh", k=n, tiebreak=id_col,
        payload_cols=extra_cols)
    return picked.drop_columns(["_negh"])


def weighted_sample(ds, k: int, weight_col: str, id_col: str = "doc_id"):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): keep the k rows with the largest ``ln(u) / w`` keys,
    where u is a per-row uniform derived from md5(id) — heavier rows are
    proportionally likelier to survive, and the sample is reproducible
    and SQL-mirrorable (no RNG state anywhere).

    ``u = (('0x' || substr(md5(id), 1, 13))::BIGINT + 0.5) / 2^52`` —
    13 hex digits = 52 bits, exactly representable in a double, so both
    oracle sides compute the identical uniform; the key expression
    divides once by the (positive) weight. Distributed shape: stateless
    per-batch key computation + per-batch local top-k forward (the total
    order is (key desc, id asc)) -> one tiny final sort over
    O(batches x k) candidate rows — the corpus never sorts. Emitted key
    rounds half-away at 6 dp for the hash-compared oracle."""
    import hashlib

    from .common import round_half_away

    def add_key(b: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "samp_key": pa.array([], pa.float64()),
                          "_k": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        w = b.column(weight_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        v = np.fromiter(
            (int(hashlib.md5(str(int(i)).encode()).hexdigest()[:13], 16)
             for i in ids), np.int64, ids.size)
        u = (v + 0.5) / float(1 << 52)
        key = np.log(u) / w
        order = np.lexsort((ids, -key))[:k]       # local top-k forward
        return pa.table({
            id_col: pa.array(ids[order], pa.int64()),
            "samp_key": pa.array(round_half_away(key[order], 6),
                                 pa.float64()),
            "_k": pa.array(key[order], pa.float64())})

    return ds.select_columns([id_col, weight_col]) \
        .map_batches(add_key, batch_format="pyarrow") \
        .sort(["_k", id_col], descending=[True, False]).limit(k) \
        .map_batches(lambda b: b.drop(["_k"]), batch_format="pyarrow")


def weighted_sample_sql(k: int, weight_expr: str, id_expr: str,
                        table: str) -> str:
    """DuckDB mirror of :func:`weighted_sample` (shared with tests)."""
    u = (f"((('0x' || substr(md5(CAST({id_expr} AS VARCHAR)), 1, 13))"
         f"::BIGINT + 0.5) / 4503599627370496.0)")
    return f"""
WITH s AS (SELECT {id_expr} AS doc_id,
                  ln({u}) / ({weight_expr}) AS key
           FROM {table})
SELECT doc_id, round(key, 6) AS samp_key
FROM s ORDER BY key DESC, doc_id LIMIT {k}"""
