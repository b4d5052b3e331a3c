"""Sequence-layout operators for training-data preparation:

- ``chunk_tokens``: split every document's token stream into fixed-size
  overlapping windows (context-window chunking for embedding / RAG
  pipelines). Pure per-row fan-out — embarrassingly parallel, one
  ``map_batches`` pass, chunk text materialized with Arrow ``binary_join``
  over a gather of the batch's flat token array (no per-chunk Python).
- ``pack_assign``: the "concat-and-chunk" packing used to lay out LLM
  training batches — conceptually concatenate all documents in doc_id
  order and cut the token stream every ``budget`` tokens; each doc gets
  (pack_id, pack_offset) of its starting position. Needs a GLOBAL prefix
  sum, computed the distributed-rank way (stages/rank.py): equi-depth
  doc_id range partitions, per-partition token totals merged into an
  exclusive prefix on the driver (O(partitions) rows, never O(docs)),
  then one shuffle where each partition cumsums locally and adds its
  offset. Exact integer math end-to-end.

Tokenization is the SQL-replicable variant (lowercased [a-z0-9]+ runs,
length > 1) so both operators have exact DuckDB oracles.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokenizer import TOKEN_RE
from .common import adaptive_groups


def _multi_arange(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    keep = lens > 0
    starts, lens = starts[keep], lens[keep]
    if not starts.size:
        return np.empty(0, np.int64)
    cl = np.cumsum(lens)
    out = np.ones(cl[-1], np.int64)
    out[0] = starts[0]
    out[cl[:-1]] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    return np.cumsum(out)


def chunk_tokens(docs, chunk: int = 64, stride: int = 48):
    """docs(doc_id, text) -> (doc_id, chunk_id, n_tokens, chunk).

    Chunks start at 0, stride, 2*stride, ... while start < n_tokens; each
    covers tokens[start : start+chunk] (the final chunks may be shorter).
    Zero-token docs emit no chunks. chunk_id = start / stride.
    """
    assert 0 < stride <= chunk

    def explode(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "chunk_id": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "chunk": pa.array([], pa.string())})
        if b.num_rows == 0:
            return empty
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        toks = [[t for t in TOKEN_RE.findall((x or "").lower())
                 if len(t) > 1] for x in b.column("text").to_pylist()]
        counts = np.array([len(t) for t in toks], np.int64)
        n_chunks = -(-counts // stride)             # ceil; 0 for empty docs
        if int(n_chunks.sum()) == 0:
            return empty
        doc_starts = np.concatenate(([0], np.cumsum(counts)))  # flat-token
        # one row per chunk
        row_doc = np.repeat(np.arange(ids.size), n_chunks)
        within = (np.arange(row_doc.size)
                  - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks))
        start = within * stride
        ln = np.minimum(chunk, counts[row_doc] - start)
        # gather the (overlapping) token windows out of ONE flat array
        flat = pa.array([t for ts in toks for t in ts], pa.string())
        gather = _multi_arange(doc_starts[row_doc] + start, ln)
        offs = pa.array(np.concatenate(([0], np.cumsum(ln))), pa.int32())
        lists = pa.ListArray.from_arrays(offs, flat.take(pa.array(gather)))
        return pa.table({
            "doc_id": pa.array(ids[row_doc], pa.int64()),
            "chunk_id": pa.array(within, pa.int64()),
            "n_tokens": pa.array(ln, pa.int64()),
            "chunk": pc.binary_join(lists, " "),
        })

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(explode, batch_format="pyarrow")


def pack_assign(docs, budget: int = 2048, num_bins: Optional[int] = None):
    """docs(doc_id, text) -> (doc_id, n_tokens, pack_id, pack_offset).

    pack_id = cum_tokens_before // budget, pack_offset = cum_tokens_before
    % budget, where cum_tokens_before is the exact global token count of
    all docs with smaller doc_id (concat-and-chunk layout).
    """

    def tc(b: pa.Table) -> pa.Table:
        counts = [sum(1 for t in TOKEN_RE.findall((x or "").lower())
                      if len(t) > 1) for x in b.column("text").to_pylist()]
        return pa.table({"doc_id": b.column("doc_id").cast(pa.int64()),
                         "n_tokens": pa.array(counts, pa.int64())})

    return pack_counts(docs.select_columns(["doc_id", "text"])
                       .map_batches(tc, batch_format="pyarrow"),
                       budget=budget, num_bins=num_bins)


def pack_counts(tokc_ds, budget: int = 2048,
                num_bins: Optional[int] = None):
    """Core packing over a precomputed (doc_id, n_tokens) relation — the
    exact global prefix sum by doc_id (distributed-rank plan; see module
    docstring). Composable: ``prepare_corpus`` feeds it the survivor
    token counts already carried by the curation signals."""
    import ray

    # small fixed-width relation; materialize once, reuse in 3 passes
    tokc = tokc_ds.materialize()
    n_docs = tokc.count()
    if n_docs == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "pack_id": pa.array([], pa.int64()),
            "pack_offset": pa.array([], pa.int64())}))
    if num_bins is None:
        num_bins = adaptive_groups(n_docs, 250_000, lo=8, hi=4096)

    # equi-depth doc_id edges from a strided per-batch sample (rank.py plan)
    def sample(b: pa.Table) -> pa.Table:
        v = np.sort(b.column("doc_id").to_numpy(zero_copy_only=False))
        stride = max(64, -(-v.size // 256))
        return pa.table({"v": pa.array(v[::stride], pa.int64())})

    samp = np.sort(np.array(
        [r["v"] for r in tokc.map_batches(sample, batch_format="pyarrow")
         .take_all()], np.int64))
    qpos = (np.arange(1, num_bins) * samp.size) // num_bins
    edges = np.unique(samp[np.clip(qpos, 0, samp.size - 1)])
    edges_ref = ray.put(edges)
    nb = edges.size + 1

    # pass 1: per-bin token totals (touched bins only -> tiny driver merge)
    def bin_sums(b: pa.Table) -> pa.Table:
        e = ray.get(edges_ref)
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        n = b.column("n_tokens").to_numpy(zero_copy_only=False)
        bins = np.searchsorted(e, d, side="right")
        ub = np.unique(bins)
        sums = np.zeros(ub.size, np.int64)
        np.add.at(sums, np.searchsorted(ub, bins), n)
        return pa.table({"bin": pa.array(ub.astype(np.int64), pa.int64()),
                         "tok": pa.array(sums, pa.int64())})

    totals = np.zeros(nb, np.int64)
    for r in tokc.map_batches(bin_sums, batch_format="pyarrow").take_all():
        totals[r["bin"]] += r["tok"]
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))
    off_ref = ray.put(offsets)

    # pass 2: shuffle on bin, local sort-by-doc_id + exclusive cumsum + offset
    def tag(b: pa.Table) -> pa.Table:
        e = ray.get(edges_ref)
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        g = np.searchsorted(e, d, side="right")
        return b.append_column("_g", pa.array(g.astype(np.int64), pa.int64()))

    def pack_bin(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        bin_id = int(g.column("_g")[0].as_py())
        d = g.column("doc_id").to_numpy(zero_copy_only=False)
        n = g.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.argsort(d, kind="stable")
        d, n = d[order], n[order]
        cb = int(off[bin_id]) + np.concatenate(([0], np.cumsum(n)[:-1]))
        return pa.table({
            "doc_id": pa.array(d, pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "pack_id": pa.array(cb // budget, pa.int64()),
            "pack_offset": pa.array(cb % budget, pa.int64())})

    return tokc.map_batches(tag, batch_format="pyarrow") \
        .groupby("_g").map_groups(pack_bin, batch_format="pyarrow")
