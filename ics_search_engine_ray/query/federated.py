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

Assumption (documented, asserted): doc_ids are disjoint across member
indexes (doc_id = url hash, so this means disjoint url sets). Indexes
with overlapping documents must be merged (``merge_indexes`` dedups and
rebuilds stats); federation would double-count their df.

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


class FederatedSearchIndex:
    """Query-time federation over built index directories."""

    def __init__(self, index_dirs: Sequence[str],
                 cfg: Optional[EngineConfig] = None):
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
        if ids.size > 1 and (ids[1:] == ids[:-1]).any():
            raise ValueError(
                "federated members share doc_ids — overlapping corpora "
                "must be merged (merge_indexes), not federated")
        tf = np.concatenate([p.tf for p in parts])[order]
        dl = np.concatenate([p.doclen for p in parts])[order]
        imp = np.concatenate([p.importance for p in parts])[order]
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
                out[int(d)] = (u, ti or "")
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
