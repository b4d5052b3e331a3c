"""Two-pass exact heavy hitters over a text corpus — terms whose corpus
frequency share is >= a threshold, with EXACT counts, without ever
shuffling the full term relation.

Pass 1 (candidate generation, pigeonhole): a term with global density
>= p must have local density >= p in at least one batch (the global
density is a weighted average of local densities). So each batch emits
only its locally-dense terms — at most 1/p per batch — and the union of
candidates is a provably complete, tiny set (<= n_batches / p).

Pass 2 (exact count): the candidate set broadcasts via ``ray.put``; each
batch counts ONLY candidate occurrences plus its total token count; a
final tiny merge filters by the exact integer condition
``cnt * 1_000_000 >= ppm * total`` (ppm arithmetic keeps the comparison
bit-identical to the SQL oracle — no float density edge cases).

The trade is tokenizing twice instead of shuffling every (term, 1) pair
once — at 100 TB the full-term exchange is the thing that doesn't fit,
while a second streaming pass is embarrassingly parallel. Tokenization
is one compiled-regex ``findall`` over the whole batch (texts joined
with a separator), not a per-row loop.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pyarrow as pa

TOKEN_RE = re.compile(r"[a-z0-9]+")

_CAND_GATE = 2_000_000
"""Max candidate terms the driver may hold (repo hard rule: driver state
is results/hot-keys only, size-gated). The bound is n_batches/ppm*1e6;
raising ppm or batch size keeps it tiny at any corpus size."""


def _batch_tokens(texts) -> np.ndarray:
    """All len>1 [a-z0-9]+ tokens in the batch, one findall call."""
    joined = "\x00".join((t or "") for t in texts).lower()
    toks = [t for t in TOKEN_RE.findall(joined) if len(t) > 1]
    return np.asarray(toks, dtype=object) if toks else \
        np.asarray([], dtype=object)


def heavy_hitters(docs, ppm: int, text_col: str = "text",
                  cand_gate: int = _CAND_GATE):
    """Terms with exact corpus share >= ppm/1e6. Returns a Dataset
    (term, cnt) with cnt the exact global count.

    ``ppm`` is an integer parts-per-million threshold (e.g. 2000 =
    0.2%); the final filter is exact integer arithmetic.
    """
    import ray
    import ray.data as rd

    src = docs.select_columns([text_col])

    def local_dense(b: pa.Table) -> pa.Table:
        toks = _batch_tokens(b.column(text_col).to_pylist())
        if toks.size == 0:
            return pa.table({"term": pa.array([], pa.string())})
        uniq, cnt = np.unique(toks, return_counts=True)
        keep = cnt.astype(np.int64) * 1_000_000 >= ppm * toks.size
        return pa.table({"term": pa.array(uniq[keep], pa.string())})

    # the candidate union IS the result's superset — a driver-side set is
    # the intended output scale (<= n_batches/ppm * 1e6 terms), gated.
    cand_rows = src.map_batches(local_dense, batch_format="pyarrow") \
        .take_all()
    cands = sorted({r["term"] for r in cand_rows})
    if len(cands) > cand_gate:
        raise ValueError(
            f"{len(cands)} candidates exceed the driver gate {cand_gate}; "
            f"raise ppm or batch size")
    if not cands:
        return rd.from_arrow(pa.table({
            "term": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64())}))
    cand_arr = np.asarray(cands, dtype=object)
    cand_ref = ray.put(cand_arr)

    def count_cands(b: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        toks = _batch_tokens(b.column(text_col).to_pylist())
        total = np.int64(toks.size)
        if toks.size == 0:
            counts = np.zeros(0, np.int64)
            idx = np.zeros(0, np.int64)
        else:
            pos = np.searchsorted(cand, toks)
            pos = np.clip(pos, 0, cand.size - 1)
            hit = cand[pos] == toks
            idx, counts = np.unique(pos[hit], return_counts=True)
        # one extra row (term=None) carries the batch's total token count
        return pa.table({
            "term": pa.array(list(cand[idx]) + [None], pa.string()),
            "cnt": pa.array(np.append(counts, total), pa.int64())})

    partial = src.map_batches(count_cands, batch_format="pyarrow")

    def finish(g: pa.Table) -> pa.Table:
        terms = g.column("term").to_pylist()
        cnts = g.column("cnt").to_numpy(zero_copy_only=False)
        total = sum(int(c) for t, c in zip(terms, cnts) if t is None)
        agg = {}
        for t, c in zip(terms, cnts):
            if t is not None:
                agg[t] = agg.get(t, 0) + int(c)
        keep = sorted((t, c) for t, c in agg.items()
                      if c * 1_000_000 >= ppm * total)
        return pa.table({
            "term": pa.array([t for t, _ in keep], pa.string()),
            "cnt": pa.array([c for _, c in keep], pa.int64())})

    # final merge input is O(batches x |candidates|) tiny rows
    return partial.map_batches(
        lambda b: b.append_column("_g", pa.array([0] * b.num_rows,
                                                 pa.int8())),
        batch_format="pyarrow") \
        .groupby("_g").map_groups(lambda g: finish(g.drop(["_g"])),
                                  batch_format="pyarrow")
