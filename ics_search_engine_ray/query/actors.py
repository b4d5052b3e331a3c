"""Query-serving actor layer (VERDICT r1 item 7; SURVEY §2 S11/T3 at scale).

``SearchIndex`` is a single-process library: every partition reader and the
whole doc_id→url map live in one process — fine at course scale, wrong for
concurrent serving over a big index. This module shards the SAME on-disk
index across a pool of long-lived Ray actors:

- each :class:`SearchShardActor` owns a subset of partitions (segment
  readers + per-actor LRU decode cache open once in ``__init__``),
- a query scatter-gathers: the client asks only the actors owning the query
  terms' partitions for per-term scored posting chunks, merges them in
  deterministic partition order, and ranks with the SAME
  :func:`~.engine.rank_topk` core as ``SearchIndex`` — results are
  bit-identical to the local path (tested),
- url/title lookup for the k result rows is a filtered docmeta parquet read
  (row-group pruned), cached per client; no full docmeta dict anywhere.

Scaling: partitions spread round-robin, so both index size (readers/caches)
and query fan-out scale with the pool; salted head terms already live in
their own partitions and so land on distinct actors.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import EngineConfig
from ..index.scoring import bm25_scores, tfidf_ref_scores
from ..index.segments import SegmentReader
from .engine import (SearchIndex, SearchResult, _MergedPostings, block_bounds,
                     filter_dead_postings, load_tombstones,
                     rank_topk, tfidf_ref_rank)


class SearchShardActor:
    """Owns a subset of index partitions; serves per-term scored chunks."""

    def __init__(self, index_dir: str, parts: Sequence[int],
                 k1: Optional[float] = None, b: Optional[float] = None):
        import json
        with open(os.path.join(index_dir, "manifest.json")) as f:
            m = json.load(f)
        self.num_docs = int(m["num_docs"])
        self.avgdl = float(m["avgdl"])
        # runtime cfg overrides (matching SearchIndex._scored, which honors
        # cfg k1/b over the manifest) keep the 'bit-identical to the local
        # path' claim true when a caller passes non-build BM25 params
        self.k1 = float(m["bm25_k1"] if k1 is None else k1)
        self.b = float(m["bm25_b"] if b is None else b)
        self.readers = {p: SegmentReader(os.path.join(index_dir, "segments",
                                                      f"part-{p:05d}"))
                        for p in parts}
        self._dead = load_tombstones(index_dir)

    def term_chunks(self, terms: List[str], scorer: str = "bm25"):
        """{term: [(part, doc_ids, scores, df), ...]} for OWNED partitions."""
        out: Dict[str, list] = {}
        for t in terms:
            chunks = []
            for p, reader in self.readers.items():
                tp = filter_dead_postings(reader.postings(t), self._dead)
                if tp is None or not tp.doc_ids.size:
                    continue
                if scorer == "bm25":
                    s = bm25_scores(tp.tf, tp.importance, tp.doclen, tp.df,
                                    self.num_docs, self.avgdl, self.k1, self.b)
                else:
                    s = tfidf_ref_scores(tp.tf, tp.importance, tp.doclen,
                                         tp.df, self.num_docs)
                chunks.append((p, tp.doc_ids, s, int(tp.df)))
            if chunks:
                out[t] = chunks
        return out

    def ping(self) -> bool:
        return True


class ShardedSearchIndex:
    """Client for a pool of SearchShardActors; same surface as SearchIndex.

    Results are identical to ``SearchIndex.search`` by construction: chunks
    merge in ascending-partition order then stable-sort by doc_id (exactly
    ``SearchIndex.term_postings``'s merge), scores are the same per-posting
    kernels, and ranking goes through the shared ``rank_topk``.
    """

    def __init__(self, index_dir: str, num_actors: int = 4,
                 cfg: Optional[EngineConfig] = None):
        import json
        import ray

        self.index_dir = index_dir
        with open(os.path.join(index_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        total = int(self.manifest["total_parts"])
        self.P = int(self.manifest["num_partitions"])
        self.S = int(self.manifest["head_term_salt"])
        self.head_df = self.manifest.get("head_df", {})
        self.block_size = int(EngineConfig().posting_block_size
                              if cfg is None else cfg.posting_block_size)
        from ..functions.tokenizer import Tokenizer
        self.tokenizer = Tokenizer(stem=bool(self.manifest["stem"]))
        num_actors = max(1, min(num_actors, total))
        self.part_of = {p: p % num_actors for p in range(total)}
        # plumb runtime BM25 overrides through to the shard actors so the
        # pool scores exactly like SearchIndex under the same cfg
        k1 = None if cfg is None else float(cfg.bm25_k1)
        b = None if cfg is None else float(cfg.bm25_b)
        Actor = ray.remote(SearchShardActor)
        self.actors = []
        for a in range(num_actors):
            parts = [p for p in range(total) if self.part_of[p] == a]
            self.actors.append(Actor.remote(index_dir, parts, k1, b))
        self._url_cache: Dict[int, Tuple[str, str]] = {}

    # ---- routing ----

    def _parts_for_term(self, term: str) -> List[int]:
        from ..pipelines.build import term_partition
        if self.S > 0 and term in self.head_df:
            return list(range(self.P, self.P + self.S))
        return [term_partition(term, self.P)]

    def _resolve_links(self, doc_ids):
        """(urls, auth, hub, pagerank) for the tfidf-ref CANDIDATE set via
        two filtered parquet reads (docmeta by doc_id, link_scores by url)
        — O(matching docs) per query, never a full-table actor load
        (r3 verdict item 9). Both lookups cache per client, bounded by the
        distinct docs actually queried."""
        import numpy as np
        import pyarrow.dataset as pads

        meta = self._meta_of([int(d) for d in doc_ids])
        urls = [meta.get(int(d), ("", ""))[0] for d in doc_ids]
        if not hasattr(self, "_link_cache"):
            self._link_cache = {}
        missing = sorted({u for u in urls if u and u not in self._link_cache})
        if missing:
            p = os.path.join(self.index_dir, "link_scores.parquet")
            if os.path.exists(p):
                t = pads.dataset(p).to_table(
                    columns=["url", "auth", "hub", "pagerank"],
                    filter=pads.field("url").isin(missing))
                for u, a, h, r in zip(t.column("url").to_pylist(),
                                      t.column("auth").to_pylist(),
                                      t.column("hub").to_pylist(),
                                      t.column("pagerank").to_pylist()):
                    self._link_cache[u] = (a, h, r)
            for u in missing:                     # negative-cache misses
                self._link_cache.setdefault(u, (0.0, 0.0, 0.0))
        z = (0.0, 0.0, 0.0)
        auth = np.array([self._link_cache.get(u, z)[0] for u in urls])
        hub = np.array([self._link_cache.get(u, z)[1] for u in urls])
        pr = np.array([self._link_cache.get(u, z)[2] for u in urls])
        return urls, auth, hub, pr

    # ---- lookup for result assembly (filtered parquet read, cached) ----

    def _meta_of(self, doc_ids: List[int]) -> Dict[int, Tuple[str, str]]:
        missing = [d for d in doc_ids if d not in self._url_cache]
        if missing:
            import pyarrow.dataset as pads
            ds = pads.dataset(os.path.join(self.index_dir, "docmeta"))
            cols = ["doc_id", "url"]
            if "title" in ds.schema.names:
                cols.append("title")
            t = ds.to_table(columns=cols,
                            filter=pads.field("doc_id").isin(missing))
            titles = (t.column("title").to_pylist() if "title" in cols
                      else [""] * t.num_rows)
            for d, u, ti in zip(t.column("doc_id").to_pylist(),
                                t.column("url").to_pylist(), titles):
                self._url_cache[d] = (u, ti or "")
        return {d: self._url_cache.get(d, ("", "")) for d in doc_ids}

    # ---- public API ----

    def search(self, query: str, k: int = 10, scorer: str = "bm25",
               algo: str = "auto") -> List[SearchResult]:
        import ray

        terms = self.tokenizer.tokens(query, for_query=True)
        if not terms:
            return []
        qtf: Dict[str, int] = {}
        for t in terms:
            qtf[t] = qtf.get(t, 0) + 1
        # scatter: only actors owning some needed partition, each asked once
        by_actor: Dict[int, set] = {}
        for t in qtf:
            for p in self._parts_for_term(t):
                by_actor.setdefault(self.part_of[p], set()).add(t)
        futs = {a: self.actors[a].term_chunks.remote(sorted(ts), scorer)
                for a, ts in by_actor.items()}
        gathered = ray.get(list(futs.values()))

        # gather: merge chunks per term in ascending-partition order, then
        # stable-sort by doc_id — identical to SearchIndex.term_postings
        chunks_of: Dict[str, list] = {}
        for res in gathered:
            for t, chunks in res.items():
                chunks_of.setdefault(t, []).extend(chunks)
        posts: Dict[str, _MergedPostings] = {}
        for t in qtf:                       # qtf order = SearchIndex order
            chunks = sorted(chunks_of.get(t, []), key=lambda c: c[0])
            if not chunks:
                continue
            ids = np.concatenate([c[1] for c in chunks])
            sc = np.concatenate([c[2] for c in chunks])
            if len(chunks) > 1:
                order = np.argsort(ids, kind="stable")
                ids, sc = ids[order], sc[order]
            bl, bm = block_bounds(ids, sc, self.block_size)
            posts[t] = _MergedPostings(chunks[0][3], ids, sc, bl, bm)
        if not posts:
            return []
        if scorer == "tfidf-ref":
            # reference-parity combined scorer: link signals enter BEFORE
            # ranking, resolved for the candidate set only (filtered reads)
            ranked = tfidf_ref_rank(posts, terms, k, self._resolve_links)
            meta = self._meta_of([d for d, _, _, _ in ranked])
            return [SearchResult(url=SearchIndex._defrag(url), doc_id=d,
                                 score=s, matched_terms=matched,
                                 title=meta.get(d, ("", ""))[1])
                    for d, s, matched, url in ranked]
        top_ids, top_scores = rank_topk(posts, qtf, k, self.block_size, algo)
        meta = self._meta_of([int(d) for d in top_ids])
        out = []
        for d, s in zip(top_ids, top_scores):
            d = int(d)
            matched = [t for t, p in posts.items()
                       if p.doc_ids[np.searchsorted(p.doc_ids, d):np.searchsorted(p.doc_ids, d) + 1].size
                       and p.doc_ids[np.searchsorted(p.doc_ids, d)] == d]
            url, title = meta.get(d, ("", ""))
            out.append(SearchResult(url=SearchIndex._defrag(url), doc_id=d,
                                    score=float(s), matched_terms=matched,
                                    title=title))
        return out

    def shutdown(self):
        import ray
        for a in self.actors:
            ray.kill(a)
        self.actors = []
