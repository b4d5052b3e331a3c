"""Federated search: exact global BM25 over SEVERAL built indexes
without merging them.

The serving pattern for per-crawl / per-tenant index fleets: each crawl
slice keeps its own index directory (built, checkpointed, tombstoned
independently), and a query fans out to all of them. Naive federation
scores each index with ITS OWN (df, N, avgdl) and merges by score —
which is wrong (idf differs per slice, so ranks drift from the merged
truth). This implementation recomputes GLOBAL statistics at query time:

    df_global(t) = sum_i df_i(t)        N_global = sum_i N_i
    avgdl_global = sum_i N_i * avgdl_i / N_global

and re-scores the concatenated raw postings (tf / doclen / importance
round-trip losslessly through ``term_postings``) with the same
``bm25_scores`` + ``rank_topk`` core the local index uses — so the
result is RANK- AND SCORE-IDENTICAL to querying one merged index
(``tests/test_federated.py`` proves it against ``merge_indexes``).

Overlapping members (recrawl shards indexing the same url into two
slices — the same doc_id, and by the merge contract the same content)
are supported below ``_FED_OVERLAP_DOC_GATE``: construction reads the
members' docmeta (doc_id, token_count) columns once, dedups keep-first,
and recomputes (N, avgdl) exactly as ``merge_indexes`` would; at query
time duplicate postings rows keep the first member's copy and df drops
by the duplicates removed — rank- and score-identical to the deduped
merged index (``tests/test_federated.py``). ABOVE the gate the old
disjointness contract applies (stats from manifests, duplicate doc_ids
raise): a fleet that big with overlap should compact via
``merge_indexes`` — the scale path — rather than pay an O(corpus)
driver scan per serving process.

Tombstones: each member's tombstone set applies before scoring (the
``term_postings`` filter), exactly like local serving.

Reference scope: the reference serves one monolithic index
(search.py:205-227); this extends the serving surface for the
fleet-of-indexes layout that per-partition checkpointed builds produce.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import EngineConfig
from ..index.scoring import bm25_scores
from .engine import (SearchIndex, SearchResult, _MergedPostings,
                     block_bounds, rank_topk)


# one docmeta (doc_id, token_count) scan at construction costs 16 B/doc
# transiently (~1.6 GB at the gate); above it, disjointness is asserted
# per query as before and overlapping fleets must merge_indexes instead
_FED_OVERLAP_DOC_GATE = 100_000_000


class FederatedSearchIndex:
    """Query-time federation over built index directories."""

    def __init__(self, index_dirs: Sequence[str],
                 cfg: Optional[EngineConfig] = None,
                 overlap_doc_gate: Optional[int] = None):
        if not index_dirs:
            raise ValueError("need at least one index dir")
        self.members = [SearchIndex(d, cfg) for d in index_dirs]
        stems = {si.cfg.stem for si in self.members}
        if len(stems) != 1:
            raise ValueError(f"mixed stem settings: {stems}")
        k1s = {(si.cfg.bm25_k1, si.cfg.bm25_b) for si in self.members}
        if len(k1s) != 1:
            raise ValueError(f"mixed BM25 params: {k1s}")
        self.num_docs = sum(si.num_docs for si in self.members)
        total_len = sum(si.avgdl * si.num_docs for si in self.members)
        self.avgdl = total_len / self.num_docs if self.num_docs else 0.0
        self.cfg = self.members[0].cfg
        gate = (_FED_OVERLAP_DOC_GATE if overlap_doc_gate is None
                else int(overlap_doc_gate))
        self.overlap_ok = False
        self.n_shared_docs = 0
        if len(self.members) > 1 and 0 < self.num_docs <= gate:
            self._dedup_stats()

    def _dedup_stats(self) -> None:
        """Detect doc_id overlap across members and, if present, replace
        the manifest-sum stats with the exact deduped (N, avgdl) a
        merged index would compute (keep-first; int token_count sum ->
        one float divide, bit-identical to merge_indexes). Transient
        O(total docs) arrays; nothing O(corpus) is retained."""
        ids_parts, len_parts = [], []
        for si in self.members:
            t = pq.read_table(os.path.join(si.index_dir, "docmeta"),
                              columns=["doc_id", "token_count"])
            ids_parts.append(t.column("doc_id")
                             .to_numpy(zero_copy_only=False)
                             .astype(np.int64))
            len_parts.append(t.column("token_count")
                             .to_numpy(zero_copy_only=False)
                             .astype(np.int64))
        ids = np.concatenate(ids_parts)
        lens = np.concatenate(len_parts)
        order = np.argsort(ids, kind="stable")
        ids_s, lens_s = ids[order], lens[order]
        keep = np.concatenate(([True], ids_s[1:] != ids_s[:-1]))
        n_unique = int(keep.sum())
        self.n_shared_docs = int(ids.size - n_unique)
        self.overlap_ok = True
        if self.n_shared_docs and n_unique:
            self.num_docs = n_unique
            self.avgdl = float(lens_s[keep].sum()) / n_unique

    def tokenize_query(self, query: str) -> List[str]:
        return self.members[0].tokenize_query(query)

    def _merged(self, term: str) -> Optional[_MergedPostings]:
        parts = [si.term_postings(term) for si in self.members]
        parts = [p for p in parts if p is not None and p.doc_ids.size]
        if not parts:
            return None
        df = int(sum(p.df for p in parts))
        ids = np.concatenate([p.doc_ids for p in parts])
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        tf = np.concatenate([p.tf for p in parts])[order]
        dl = np.concatenate([p.doclen for p in parts])[order]
        imp = np.concatenate([p.importance for p in parts])[order]
        if ids.size > 1 and (ids[1:] == ids[:-1]).any():
            if not self.overlap_ok:
                raise ValueError(
                    "federated members share doc_ids — above the overlap "
                    "gate, overlapping corpora must be merged "
                    "(merge_indexes), not federated")
            # recrawl shards: same doc_id = same url = same content (the
            # merge contract); keep the FIRST member's copy (stable sort
            # preserves member order) and drop the duplicates from df
            keep = np.concatenate(([True], ids[1:] != ids[:-1]))
            df -= int(ids.size - keep.sum())
            ids, tf, dl, imp = ids[keep], tf[keep], dl[keep], imp[keep]
        s = bm25_scores(tf, imp, dl, df, self.num_docs, self.avgdl,
                        self.cfg.bm25_k1, self.cfg.bm25_b)
        bl, bm = block_bounds(ids, s, self.cfg.posting_block_size)
        return _MergedPostings(df, ids, s, bl, bm)

    def _resolve_meta(self, ids: List[int]) -> Dict[int, tuple]:
        """doc_id -> (url, title) via candidate-only filtered docmeta
        reads per member (never a full table load)."""
        out: Dict[int, tuple] = {}
        want = sorted(set(ids))
        if not want:
            return out
        arr = pa.array(want, pa.int64())
        for si in self.members:
            cols = ["doc_id", "url", "title"]
            try:
                t = pq.read_table(os.path.join(si.index_dir, "docmeta"),
                                  columns=cols,
                                  filters=[("doc_id", "in", arr)])
            except Exception:
                t = pq.read_table(os.path.join(si.index_dir, "docmeta"),
                                  columns=["doc_id", "url"],
                                  filters=[("doc_id", "in", arr)])
                t = t.append_column(
                    "title", pa.array([""] * t.num_rows, pa.string()))
            for d, u, ti in zip(t.column("doc_id").to_pylist(),
                                t.column("url").to_pylist(),
                                t.column("title").to_pylist()):
                # first member wins for docs shared across members
                out.setdefault(int(d), (u, ti or ""))
        return out

    def search(self, query: str, k: int = 10,
               algo: str = "auto") -> List[SearchResult]:
        terms = self.tokenize_query(query)
        if not terms:
            return []
        qtf: Dict[str, int] = {}
        for t in terms:
            qtf[t] = qtf.get(t, 0) + 1
        posts = {t: self._merged(t) for t in qtf}
        posts = {t: p for t, p in posts.items() if p is not None}
        if not posts:
            return []
        top_ids, top_scores = rank_topk(posts, qtf, k,
                                        self.cfg.posting_block_size, algo)
        meta = self._resolve_meta(top_ids)
        out = []
        for d, s in zip(top_ids, top_scores):
            matched = [t for t, p in posts.items()
                       if p.doc_ids[np.searchsorted(p.doc_ids, d):
                                    np.searchsorted(p.doc_ids, d) + 1].size
                       and p.doc_ids[np.searchsorted(p.doc_ids, d)] == d]
            url, title = meta.get(int(d), ("", ""))
            out.append(SearchResult(
                url=self.members[0]._defrag(url), doc_id=int(d),
                score=float(s), matched_terms=matched, title=title))
        return out
