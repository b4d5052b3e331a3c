"""Benchmark decontamination: flag training documents that contain any
n-gram of a held-out evaluation set (the standard contamination check run
before LLM training — e.g. GPT-3 appendix C / PaLM-style 8-gram overlap).

Shape (Ray-Data-first):
- the EVAL side is tiny by construction (a benchmark, not a corpus): its
  distinct token n-grams are collected once, size-gated, and broadcast via
  ``ray.put`` (hash array + exact string set);
- the TRAIN side streams: one ``map_batches`` pass computes every doc's
  n-gram window hashes with the vectorized polynomial kernel
  (``functions/wordhash.batch_shingle_hashes`` — no per-window Python),
  prefilters against the broadcast hash array (``np.isin`` on a sorted
  uint64 array), and string-verifies only the rare hash hits so the result
  is EXACT (collision-proof), matching the DuckDB oracle bit-for-bit.

Scale path past the broadcast gate (documented, per repo hard rule): shuffle
gram hashes of both sides into hash-range partitions and take the semi-join
per partition — the same banded-groupby shape as ``minhash_dedup``; the
broadcast mode is correct whenever the EVAL set fits the object store, which
holds for every real benchmark suite (millions of grams ≈ tens of MB).

Tokenization is the SQL-replicable variant (lowercased ``[a-z0-9]+`` runs,
length > 1, no stemming) so the driver's DuckDB oracle can verify exact
equality. Docs with fewer than ``n`` tokens have no n-grams and are never
contaminated; eval docs themselves are excluded from the output.
"""

from __future__ import annotations

from typing import List, Set, Tuple

import numpy as np
import pyarrow as pa

from ..functions.tokenizer import TOKEN_RE
from ..functions.wordhash import batch_shingle_hashes

# broadcast gate: above this many DISTINCT eval grams, refuse (with the
# partitioned semi-join named as the scale path) rather than blow the driver
_BCAST_GRAM_ROWS = 5_000_000


def _norm_tokens(texts: List[str]) -> List[List[str]]:
    return [[t for t in TOKEN_RE.findall((x or "").lower()) if len(t) > 1]
            for x in texts]


def _doc_grams(texts: List[str], n: int) -> Tuple[np.ndarray, np.ndarray,
                                                  List[List[str]]]:
    """-> (flat window hashes, per-doc offsets, token lists). Docs with
    fewer than n tokens contribute ZERO windows (offsets collapse), unlike
    the MinHash whole-doc-shingle fallback."""
    toks = _norm_tokens(texts)
    joined = [" ".join(t) for t in toks]
    h, offs = batch_shingle_hashes(joined, n)
    counts = np.array([len(t) for t in toks], np.int64)
    # batch_shingle_hashes emits one whole-doc shingle for 0 < w < n; mask
    # those docs out by rebuilding offsets with 0 windows for them
    n_win = np.where(counts >= n, counts - n + 1, 0)
    keep = np.zeros(int(offs[-1]), bool)
    for i in np.flatnonzero(counts > 0):
        if counts[i] >= n:
            keep[offs[i]:offs[i + 1]] = True
    new_offs = np.concatenate(([0], np.cumsum(n_win)))
    return h[keep], new_offs, toks


def eval_grams(docs, n: int = 8, select_mod: int = 97,
               select_rem: int = 1) -> Tuple[np.ndarray, Set[str]]:
    """Distinct n-grams of the eval slice (doc_id % select_mod ==
    select_rem), as (sorted uint64 hash array, exact string set)."""

    def grams(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        sel = (ids % select_mod) == select_rem
        if not sel.any():
            return pa.table({"h": pa.array([], pa.uint64()),
                             "gram": pa.array([], pa.string())})
        texts = b.filter(pa.array(sel)).column("text").to_pylist()
        h, offs, toks = _doc_grams(texts, n)
        strs: List[str] = []
        for ti, t in enumerate(toks):
            for s in range(int(offs[ti + 1] - offs[ti])):
                strs.append(" ".join(t[s:s + n]))
        # batch-local dedup before the driver merge
        uniq = {}
        for hv, sv in zip(h.tolist(), strs):
            uniq[sv] = hv
        return pa.table({"h": pa.array(list(uniq.values()), pa.uint64()),
                         "gram": pa.array(list(uniq.keys()), pa.string())})

    gram_set: Set[str] = set()
    hashes: List[int] = []
    total = 0
    for b in docs.select_columns(["doc_id", "text"]) \
                 .map_batches(grams, batch_format="pyarrow") \
                 .iter_batches(batch_format="pyarrow"):
        for hv, sv in zip(b.column("h").to_pylist(),
                          b.column("gram").to_pylist()):
            if sv not in gram_set:
                gram_set.add(sv)
                hashes.append(hv)
                total += 1
        if total > _BCAST_GRAM_ROWS:
            raise ValueError(
                f"eval gram set exceeds broadcast gate ({_BCAST_GRAM_ROWS}); "
                "use the partitioned hash semi-join scale path (shuffle gram "
                "hashes of both sides by hash range, per-partition is_in)")
    return np.sort(np.array(hashes, np.uint64)), gram_set


def decontaminate(docs, n: int = 8, select_mod: int = 97,
                  select_rem: int = 1):
    """-> Dataset (doc_id, contaminated 0/1) over NON-eval docs.

    contaminated = doc shares at least one token n-gram with the eval slice.
    Exact: uint64-hash prefilter (vectorized) + string verification of hits.
    """
    import ray

    hash_arr, gram_set = eval_grams(docs, n, select_mod, select_rem)
    ref = ray.put((hash_arr, gram_set))

    def scan(b: pa.Table) -> pa.Table:
        harr, gset = ray.get(ref)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        sel = (ids % select_mod) != select_rem
        out_ids = ids[sel]
        if not out_ids.size:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "contaminated": pa.array([], pa.int64())})
        texts = b.filter(pa.array(sel)).column("text").to_pylist()
        h, offs, toks = _doc_grams(texts, n)
        hit = np.zeros(out_ids.size, bool)
        if h.size and harr.size:
            pos = np.searchsorted(harr, h)
            pos[pos >= harr.size] = harr.size - 1
            win_hit = harr[pos] == h
            if win_hit.any():
                doc_of_win = np.searchsorted(offs[1:], np.flatnonzero(win_hit),
                                             side="right")
                for di in np.unique(doc_of_win):
                    t = toks[int(di)]          # string-verify (collision-proof)
                    if any(" ".join(t[s:s + n]) in gset
                           for s in range(len(t) - n + 1)):
                        hit[int(di)] = True
        return pa.table({
            "doc_id": pa.array(out_ids, pa.int64()),
            "contaminated": pa.array(hit.astype(np.int64), pa.int64()),
        })

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(scan, batch_format="pyarrow")
