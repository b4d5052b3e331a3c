"""Query engine: BM25 top-k (default) + reference tf-idf parity scorer.

Query surface mirrors the reference (search.py:133-202): a query string in,
ranked ``SearchResult(url, score, matched_terms)`` out. Internals are the
Ray-native index: per-partition compressed segments (index/segments.py),
docmeta for url lookup, link_scores for the reference combined score.

Scorers:
- ``bm25`` (default, the north-star): per-term BM25 partial scores
  (recomputed vectorized from stored tf/importance/doclen + df/N/avgdl),
  weighted by the query term count. Two algorithms, guaranteed identical
  output: ``taat`` (vectorized exhaustive accumulation — np.unique + bincount)
  and ``wand`` (block-max WAND, query/wand.py). ``auto`` picks WAND when the
  candidate postings volume is large.
- ``tfidf-ref``: the reference's full Q3-Q5 combined score — tf-idf
  accumulation x query-frequency, the quirky shared-scalar cosine
  (search.py:101-130: the doc vector holds the doc's *accumulated combined
  score* at every matched-term index, not per-term tf-idf), term-match boost,
  and HITS/PageRank link signals with the 0.2/0.2/0.6/0.1/0.1/0.2 weights
  (search.py:183-190).

Determinism: all rankings tie-break by (-score, doc_id); the reference's
insertion-order ties were schedule-dependent (SURVEY.md §4 determinism).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow.parquet as pq

from ..config import EngineConfig, DEFAULT_CONFIG, STOP_WORDS
from ..functions.tokenizer import Tokenizer
from ..index.scoring import bm25_scores, tfidf_ref_scores
from ..index.segments import SegmentReader, TermPostings
from .wand import wand_topk


@dataclass
class SearchResult:
    url: str
    doc_id: int
    score: float
    matched_terms: List[str]
    title: str = ""          # from docmeta (reference main.py:29-53 surface)


@dataclass
class _MergedPostings:
    df: int
    doc_ids: np.ndarray
    scores: np.ndarray          # per-posting partial score for active scorer
    block_last: np.ndarray
    block_max: np.ndarray


def block_bounds(doc_ids: np.ndarray, scores: np.ndarray, B: int):
    """Per-block (last doc_id, max score) for WAND skipping, recomputed from
    the (merged, sorted) posting arrays."""
    nb = (doc_ids.size + B - 1) // B
    bl = doc_ids[np.minimum(np.arange(1, nb + 1) * B - 1, doc_ids.size - 1)]
    bm = np.maximum.reduceat(scores, np.arange(0, scores.size, B)) if scores.size else np.empty(0)
    return bl.astype(np.int64), bm


def rank_topk(posts: Dict[str, _MergedPostings], qtf: Dict[str, int], k: int,
              block_size: int, algo: str = "auto") -> Tuple[List[int], List[float]]:
    """Shared ranking core: BM25 top-k over per-term scored postings.

    Used by both the in-process SearchIndex and the sharded actor client —
    both paths produce identical results by construction (same accumulation
    order, same (-score, doc_id) tie-break)."""
    total = sum(p.doc_ids.size for p in posts.values())
    if algo == "auto":
        # vectorized TAAT (np.unique + bincount) beats the Python
        # document-at-a-time WAND loop until candidate volume is large
        # enough that block skipping wins over per-posting numpy kernels;
        # stopword-heavy queries skip poorly (flat block maxima), so the
        # crossover is high
        algo = "wand" if total > 5_000_000 and len(posts) > 1 else "taat"
    if algo == "wand_lazy":
        # callers with only merged arrays (the sharded client) can't skip
        # block IO — run eager WAND, which is result-identical
        algo = "wand"
    if algo == "wand":
        ranked = wand_topk(
            [(p.doc_ids, p.scores, p.block_last, p.block_max, float(qtf[t]))
             for t, p in posts.items()], k, block_size)
        return [d for d, _ in ranked], [s for _, s in ranked]
    all_ids = np.concatenate([p.doc_ids for p in posts.values()])
    all_sc = np.concatenate([p.scores * qtf[t] for t, p in posts.items()])
    uniq, inv = np.unique(all_ids, return_inverse=True)
    acc = np.bincount(inv, weights=all_sc, minlength=uniq.size)
    kk = min(k, uniq.size)
    # rank by (-score, doc_id): lexsort keys (primary last)
    order = np.lexsort((uniq, -acc))[:kk]
    return uniq[order].tolist(), acc[order].tolist()


def tfidf_ref_rank(posts: Dict[str, _MergedPostings], terms: List[str], k: int,
                   resolve_links):
    """Reference Q3-Q5 combined scoring (search.py:141-198), shared by the
    local index and the sharded actor client. Returns
    [(doc_id, combined_score, matched_terms, url)] ranked by
    (-score, doc_id).

    The combined score folds per-URL link signals in BEFORE ranking, so
    every CANDIDATE (doc matching >= 1 term) needs a url + link lookup.
    ``resolve_links(doc_ids)`` supplies them as
    (urls list, auth, hub, pagerank arrays) — the local index backs it
    with its cached maps, the sharded actors with filtered parquet reads
    over only the candidate ids (O(matching docs), never O(corpus))."""
    total_q = len(terms)
    qtf: Dict[str, int] = {}
    for t in terms:
        qtf[t] = qtf.get(t, 0) + 1
    qvec = {t: c / total_q for t, c in qtf.items()}       # search.py:84-99

    all_ids = np.concatenate([p.doc_ids for p in posts.values()])
    all_sc = np.concatenate([p.scores * qvec[t] for t, p in posts.items()])
    all_qc = np.concatenate([np.full(p.doc_ids.size, qtf[t], dtype=np.float64)
                             for t, p in posts.items()])
    uniq, inv = np.unique(all_ids, return_inverse=True)
    tfidf_sum = np.bincount(inv, weights=all_sc, minlength=uniq.size)
    n_matched = np.bincount(inv, minlength=uniq.size).astype(np.float64)
    qcnt_sum = np.bincount(inv, weights=all_qc, minlength=uniq.size)

    # cosine quirk (search.py:101-130): query vector = per-term counts
    # (csr duplicate indices sum); doc vector = the doc's accumulated
    # combined tf-idf score at each matched-term index.
    qnorm = float(np.sqrt(sum(c * c for c in qtf.values())))
    dnorm = np.abs(tfidf_sum) * np.sqrt(n_matched)
    dot = tfidf_sum * qcnt_sum
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = np.where((dnorm > 0) & (qnorm > 0), dot / (qnorm * dnorm), 0.0)

    term_boost = n_matched / total_q
    url_arr, auth, hub, pr = resolve_links(uniq)

    combined = (0.2 * tfidf_sum + 0.2 * cos + 0.6 * term_boost
                + 0.1 * auth + 0.1 * hub + 0.2 * pr)      # search.py:183-190
    kk = min(k, uniq.size)
    order = np.lexsort((uniq, -combined))[:kk]
    out = []
    for i in order:
        d = int(uniq[i])
        matched = [t for t, p in posts.items()
                   if p.doc_ids[np.searchsorted(p.doc_ids, d):np.searchsorted(p.doc_ids, d) + 1].size
                   and p.doc_ids[np.searchsorted(p.doc_ids, d)] == d]
        out.append((d, float(combined[i]), matched, url_arr[i]))
    return out


def load_tombstones(index_dir: str) -> np.ndarray:
    """Sorted int64 doc_ids deleted from this index (empty if none).
    Lucene-style semantics: tombstoned docs are EXCLUDED from every
    result set immediately, while corpus statistics (num_docs, avgdl,
    df) keep counting them until the next compaction (`merge`/`update`
    rebuild stats from the filtered docmeta)."""
    p = os.path.join(index_dir, "tombstones.json")
    if not os.path.exists(p):
        return np.empty(0, np.int64)
    with open(p) as f:
        return np.asarray(sorted(set(json.load(f)["doc_ids"])), np.int64)


def delete_docs(index_dir: str, doc_ids=None, urls=None) -> int:
    """Tombstone documents (by id and/or url) in a built index; returns
    the total tombstone count after the merge. Atomic (tmp + rename) so
    a concurrent reader sees either the old or the new set. URL
    resolution is a docmeta-filtered parquet read over ONLY the
    requested urls, never a full table load."""
    ids = set(int(d) for d in (doc_ids or []))
    if urls:
        import pyarrow as pa
        want = pa.array(sorted(set(urls)), pa.string())
        t = pq.read_table(os.path.join(index_dir, "docmeta"),
                          columns=["doc_id", "url"],
                          filters=[("url", "in", want)])
        ids.update(t.column("doc_id").to_pylist())
    dead = set(load_tombstones(index_dir).tolist()) | ids
    tmp = os.path.join(index_dir, "tombstones.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"doc_ids": sorted(dead)}, f)
    os.replace(tmp, os.path.join(index_dir, "tombstones.json"))
    return len(dead)


def filter_dead_postings(tp, dead: np.ndarray):
    """Drop tombstoned doc_ids from a TermPostings (positions too)."""
    if tp is None or dead.size == 0 or not tp.doc_ids.size:
        return tp
    pos = np.clip(np.searchsorted(dead, tp.doc_ids), 0, dead.size - 1)
    keep = dead[pos] != tp.doc_ids
    if keep.all():
        return tp
    kp = None
    if tp.positions is not None:
        kp = [p for p, k in zip(tp.positions, keep) if k]
    return TermPostings(
        term=tp.term, df=tp.df,
        doc_ids=tp.doc_ids[keep], tf=tp.tf[keep],
        doclen=tp.doclen[keep], importance=tp.importance[keep],
        positions=kp,
        # block metadata no longer describes the filtered stream
        block_last=np.empty(0, dtype=np.int64),
        block_max=np.empty(0, dtype=np.float32))


class SearchIndex:
    """Loads an index directory produced by pipelines/build.py."""

    def __init__(self, index_dir: str, cfg: Optional[EngineConfig] = None):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.num_docs = int(self.manifest["num_docs"])
        self.avgdl = float(self.manifest["avgdl"])
        self.P = int(self.manifest["num_partitions"])
        self.S = int(self.manifest["head_term_salt"])
        self.head_df: Dict[str, int] = self.manifest.get("head_df", {})
        self.cfg = cfg or DEFAULT_CONFIG.with_(
            bm25_k1=self.manifest["bm25_k1"], bm25_b=self.manifest["bm25_b"],
            stem=self.manifest["stem"],
            num_index_partitions=self.P, head_term_salt=self.S)
        self.tokenizer = Tokenizer(stem=self.cfg.stem)
        self._readers: Dict[int, SegmentReader] = {}
        self._dead = load_tombstones(index_dir)
        self._url_of: Optional[Dict[int, str]] = None
        self._title_of: Optional[Dict[int, str]] = None
        self._link_scores: Optional[Dict[str, Tuple[float, float, float]]] = None

    # ---- plumbing ----

    def _reader(self, part: int) -> SegmentReader:
        r = self._readers.get(part)
        if r is None:
            r = SegmentReader(os.path.join(self.index_dir, "segments", f"part-{part:05d}"))
            self._readers[part] = r
        return r

    def _parts_for_term(self, term: str) -> List[int]:
        from ..pipelines.build import term_partition
        if self.S > 0 and term in self.head_df:
            return list(range(self.P, self.P + self.S))
        return [term_partition(term, self.P)]

    def term_postings(self, term: str, with_positions: bool = False) -> Optional[TermPostings]:
        """Merged (across salted partitions) raw postings for one term."""
        parts = [self._reader(p).postings(term, with_positions) for p in self._parts_for_term(term)]
        if self._dead.size:
            parts = [filter_dead_postings(p, self._dead) for p in parts]
        parts = [p for p in parts if p is not None and p.doc_ids.size]
        if not parts:
            return None
        if len(parts) == 1:
            return parts[0]
        ids = np.concatenate([p.doc_ids for p in parts])
        order = np.argsort(ids, kind="stable")
        pos = None
        if with_positions:
            allpos = [x for p in parts for x in (p.positions or [])]
            pos = [allpos[i] for i in order]
        # block metadata from the source segments describes each partition's
        # own posting order — concatenating it would misdescribe the merged,
        # re-sorted stream. Empty signals "unavailable"; _scored recomputes
        # exact bounds from the merged scores anyway.
        return TermPostings(
            term=term, df=parts[0].df,
            doc_ids=ids[order],
            tf=np.concatenate([p.tf for p in parts])[order],
            doclen=np.concatenate([p.doclen for p in parts])[order],
            importance=np.concatenate([p.importance for p in parts])[order],
            positions=pos,
            block_last=np.empty(0, dtype=np.int64),
            block_max=np.empty(0, dtype=np.float32),
        )

    def _urls(self) -> Dict[int, str]:
        if self._url_of is None:
            t = pq.read_table(os.path.join(self.index_dir, "docmeta"),
                              columns=["doc_id", "url"])
            self._url_of = dict(zip(t.column("doc_id").to_pylist(),
                                    t.column("url").to_pylist()))
        return self._url_of

    def _titles(self) -> Dict[int, str]:
        if self._title_of is None:
            try:
                t = pq.read_table(os.path.join(self.index_dir, "docmeta"),
                                  columns=["doc_id", "title"])
                self._title_of = dict(zip(t.column("doc_id").to_pylist(),
                                          t.column("title").to_pylist()))
            except Exception:      # pre-title index layouts
                self._title_of = {}
        return self._title_of

    def link_scores(self) -> Dict[str, Tuple[float, float, float]]:
        if self._link_scores is None:
            p = os.path.join(self.index_dir, "link_scores.parquet")
            self._link_scores = {}
            if os.path.exists(p):
                t = pq.read_table(p)
                for u, a, h, r in zip(t.column("url").to_pylist(), t.column("auth").to_pylist(),
                                      t.column("hub").to_pylist(), t.column("pagerank").to_pylist()):
                    self._link_scores[u] = (a, h, r)
        return self._link_scores

    def _df_quick(self, term: str) -> int:
        """df without decoding postings (head_df for salted terms, term-dict
        lookup otherwise)."""
        if self.S > 0 and term in self.head_df:
            return int(self.head_df[term])
        from ..pipelines.build import term_partition
        return self._reader(term_partition(term, self.P)).df(term)

    def _scored(self, term: str, scorer: str) -> Optional[_MergedPostings]:
        tp = self.term_postings(term)
        if tp is None:
            return None
        if scorer == "bm25":
            s = bm25_scores(tp.tf, tp.importance, tp.doclen, tp.df,
                            self.num_docs, self.avgdl, self.cfg.bm25_k1, self.cfg.bm25_b)
        else:
            s = tfidf_ref_scores(tp.tf, tp.importance, tp.doclen, tp.df, self.num_docs)
        # block bounds recomputed from the f64 scores (stored f32 block_max is
        # for the IO-skipping scale path; bounds must be >= actual scores)
        bl, bm = block_bounds(tp.doc_ids, s, self.cfg.posting_block_size)
        return _MergedPostings(tp.df, tp.doc_ids, s, bl, bm)

    # ---- public API ----

    def tokenize_query(self, query: str) -> List[str]:
        return self.tokenizer.tokens(query, for_query=True)

    def suggest(self, word: str, n: int = 5) -> List[Tuple[str, int]]:
        """Edit-distance-<=1 spelling suggestions from the index
        vocabulary, highest document frequency first -> [(term, df)].
        SymSpell deletion neighborhoods (Garbe 2012) verified with an
        exact ed<=1 check; the deletion map builds lazily ONCE per index
        (O(vocab x term_len) driver memory — a serving-node cache like
        the url map; shard it by partition dictionary at web-scale
        vocabularies). The reference has no query correction
        (search.py:205-227); completeness add-on for the query surface.
        Input is tokenized+stemmed like any query term, so suggestions
        land in the same (stemmed) vocabulary the engine searches."""
        from ..stages.strings import _ed_le1

        import threading

        toks = self.tokenize_query(word)
        if not toks:
            return []
        q = toks[0]
        if getattr(self, "_del_map", None) is None:
            # webui serves from ThreadingHTTPServer handler threads: one
            # thread builds, others wait; _del_map is assigned LAST so a
            # reader never sees it without _vocab_df
            lock = self.__dict__.setdefault("_suggest_lock",
                                            threading.Lock())
            with lock:
                if getattr(self, "_del_map", None) is None:
                    dfs = self._vocab_dfs()
                    dm: Dict[str, List[str]] = {}
                    for t in dfs:
                        dm.setdefault(t, []).append(t)
                        for i in range(len(t)):
                            dm.setdefault(t[:i] + t[i + 1:], []).append(t)
                    self._vocab_df = dfs
                    self._del_map = dm
        cands = set()
        for v in {q, *(q[:i] + q[i + 1:] for i in range(len(q)))}:
            cands.update(self._del_map.get(v, ()))
        good = [(t, self._vocab_df[t]) for t in cands
                if t == q or _ed_le1(q, t)]
        good.sort(key=lambda x: (-x[1], x[0]))
        return good[:n]

    def _vocab_dfs(self) -> Dict[str, int]:
        """term -> df over the whole index vocabulary (one pass over the
        partition term DICTIONARIES — postings never decode). O(vocab)
        driver memory, same serving-node-cache class as the deletion map;
        shard by partition dictionary at web-scale vocabularies."""
        dfs: Dict[str, int] = {}
        for part in range(self.P + self.S):
            r = self._reader(part)
            for t in r.terms():
                if t in dfs:
                    continue  # salted terms span S partitions
                dfs[t] = (int(self.head_df[t])
                          if self.S > 0 and t in self.head_df
                          else r.df(t))  # _df_quick semantics
        return dfs

    def expand_prefix(self, prefix: str, max_expand: int = 50
                      ) -> List[Tuple[str, int]]:
        """Index-vocabulary wildcard expansion: terms starting with
        ``prefix``, highest document frequency first (ties -> term asc),
        capped at ``max_expand`` (the Lucene rewrite rule — an unbounded
        single-char expansion would fetch the whole dictionary). The
        sorted vocabulary array builds lazily ONCE per index; each call
        is two binary searches over it."""
        import bisect
        import threading

        if getattr(self, "_vocab_sorted", None) is None:
            lock = self.__dict__.setdefault("_suggest_lock",
                                            threading.Lock())
            with lock:
                if getattr(self, "_vocab_sorted", None) is None:
                    dfs = (self._vocab_df
                           if getattr(self, "_vocab_df", None) is not None
                           else self._vocab_dfs())
                    terms = sorted(dfs)
                    self._vocab_sorted = (terms,
                                          [dfs[t] for t in terms])
        terms, dfl = self._vocab_sorted
        lo = bisect.bisect_left(terms, prefix)
        hi = bisect.bisect_left(terms, prefix + "\U0010ffff")
        cands = [(terms[i], int(dfl[i])) for i in range(lo, hi)]
        cands.sort(key=lambda x: (-x[1], x[0]))
        return cands[:max_expand]

    def search_prefix(self, prefix: str, k: int = 10,
                      max_expand: int = 50) -> List[SearchResult]:
        """Wildcard query ``prefix*``: expand over the index vocabulary
        (top ``max_expand`` by df), then score the expansion as an OR
        query with the same TAAT BM25 accumulation ``search`` uses (each
        expanded term contributes once, qtf=1 — the standard wildcard
        rewrite). The reference has no wildcard queries; completeness
        add-on for the query surface. The prefix is lowercased but NOT
        stemmed/analyzed (the Lucene wildcard rule — analysis would move
        it out of the vocabulary keyspace it must prefix-match)."""
        import re as _re
        p = (prefix or "").lower().rstrip("*")
        if not _re.fullmatch(r"[a-z0-9]+", p):
            return []
        expanded = self.expand_prefix(p, max_expand)
        if not expanded:
            return []
        qtf = {t: 1 for t, _ in expanded}
        posts = {t: self._scored(t, "bm25") for t in qtf}
        posts = {t: p for t, p in posts.items() if p is not None}
        if not posts:
            return []
        top_ids, top_scores = rank_topk(posts, qtf, k,
                                        self.cfg.posting_block_size, "taat")
        urls, titles = self._urls(), self._titles()
        out = []
        for d, s in zip(top_ids, top_scores):
            matched = [t for t, p in posts.items()
                       if p.doc_ids[np.searchsorted(p.doc_ids, d):
                                    np.searchsorted(p.doc_ids, d) + 1].size
                       and p.doc_ids[np.searchsorted(p.doc_ids, d)] == d]
            out.append(SearchResult(
                url=self._defrag(urls.get(int(d), "")), doc_id=int(d),
                score=float(s), matched_terms=matched,
                title=titles.get(int(d), "") or ""))
        return out

    def search(self, query: str, k: int = 10, scorer: str = "bm25",
               algo: str = "auto") -> List[SearchResult]:
        terms = self.tokenize_query(query)
        if not terms:
            return []
        if scorer == "tfidf-ref":
            return self._search_tfidf_ref(terms, k)
        qtf: Dict[str, int] = {}
        for t in terms:
            qtf[t] = qtf.get(t, 0) + 1
        if algo == "auto":
            # candidate volume from the term DICTIONARY alone (no posting
            # decode): vectorized TAAT wins until the volume is large enough
            # that block skipping pays; then the lazy path avoids ever
            # decoding the skipped blocks
            est = sum(self._df_quick(t) for t in qtf)
            algo = "wand_lazy" if est > 5_000_000 and len(qtf) > 1 else "taat"
        if algo == "wand_lazy":
            if self._dead.size:
                # the lazy block reader scores straight off segment bytes
                # and cannot see tombstones; eager WAND is result-identical
                # (tested) and reads filtered postings
                algo = "wand"
            else:
                return self._search_bm25_lazy(qtf, k)
        posts = {t: self._scored(t, "bm25") for t in qtf}
        posts = {t: p for t, p in posts.items() if p is not None}
        if not posts:
            return []
        top_ids, top_scores = rank_topk(posts, qtf, k,
                                        self.cfg.posting_block_size, algo)
        urls = self._urls()
        titles = self._titles()
        out = []
        for d, s in zip(top_ids, top_scores):
            matched = [t for t, p in posts.items()
                       if p.doc_ids[np.searchsorted(p.doc_ids, d):np.searchsorted(p.doc_ids, d) + 1].size
                       and p.doc_ids[np.searchsorted(p.doc_ids, d)] == d]
            out.append(SearchResult(url=self._defrag(urls.get(int(d), "")),
                                    doc_id=int(d), score=float(s), matched_terms=matched,
                                    title=titles.get(int(d), "") or ""))
        return out

    def explain(self, query: str, k: int = 10) -> dict:
        """Query-plan observability: what the engine WOULD do for this
        query and why — per-term df / partitions / candidate volume
        (tombstone-filtered), the algorithm the auto planner picks and
        the crossover it reasons about, tombstone count, and the final
        top-k. Serving-side debugging (why is this query slow / why did
        that doc disappear) without touching any internals."""
        terms = self.tokenize_query(query)
        qtf: Dict[str, int] = {}
        for t in terms:
            qtf[t] = qtf.get(t, 0) + 1
        per_term = []
        est = 0
        for t in qtf:
            df_q = self._df_quick(t)
            est += df_q
            tp = self.term_postings(t)
            per_term.append({
                "term": t,
                "df": int(tp.df) if tp is not None else 0,
                "dict_df_estimate": int(df_q),
                "postings_after_tombstones":
                    int(tp.doc_ids.size) if tp is not None else 0,
                "partitions": self._parts_for_term(t),
                "salted_head_term": t in self.head_df,
            })
        auto = "wand_lazy" if est > 5_000_000 and len(qtf) > 1 else "taat"
        if auto == "wand_lazy" and self._dead.size:
            auto = "wand"
        results = self.search(query, k=k, scorer="bm25")
        return {
            "query": query,
            "terms": terms,
            "per_term": per_term,
            "candidate_volume_estimate": int(est),
            "algo_auto": auto,
            "algo_crossover": "wand_lazy above 5M candidate postings "
                              "(block skipping beats vectorized TAAT); "
                              "eager wand under tombstones",
            "tombstones": int(self._dead.size),
            "num_docs": self.num_docs,
            "avgdl": self.avgdl,
            "topk": [{"doc_id": r.doc_id, "score": round(r.score, 6),
                      "url": r.url, "matched": r.matched_terms}
                     for r in results],
        }

    def search_boolean(self, query: str, k: int = 10) -> List[SearchResult]:
        """Boolean-filtered BM25: ``+word`` MUST match, ``-word`` MUST NOT,
        bare words are optional rank contributors — the standard web-search
        operators (a completeness add-on; the reference's UI has no boolean
        syntax). Candidates = docs containing EVERY must term and NO
        excluded term; score = BM25 TAAT over must+optional terms with the
        usual (-score, doc_id) tie-break. Operators bind to the word they
        prefix; each word tokenizes/stems like any query term (a word that
        stems to several terms keeps the operator on each).

        Quoted segments are PHRASE constraints resolved against the
        positional index (:meth:`phrase_match`): ``"exact phrase"`` and
        ``+"exact phrase"`` require the consecutive phrase,
        ``-"exact phrase"`` excludes docs containing it; the phrase's
        words still contribute to the BM25 score (for + and bare)."""
        import re as _re

        must: List[str] = []
        nots: List[str] = []
        opt: List[str] = []
        phrase_must: List[np.ndarray] = []
        phrase_not: List[np.ndarray] = []

        def take_phrase(mt) -> str:
            op, phrase = mt.group(1), mt.group(2)
            ids = np.array(self.phrase_match(phrase), np.int64)
            if op == "-":
                phrase_not.append(ids)
            else:
                phrase_must.append(ids)
                opt.extend(self.tokenize_query(phrase))
            return " "

        query = _re.sub(r'([+-]?)"([^"]*)"', take_phrase, query)
        for w in query.split():
            op, word = (w[0], w[1:]) if w[:1] in "+-" else ("", w)
            for t in self.tokenize_query(word):
                (must if op == "+" else nots if op == "-" else opt).append(t)
        score_terms = must + opt
        if not score_terms:
            return []
        qtf: Dict[str, int] = {}
        for t in score_terms:
            qtf[t] = qtf.get(t, 0) + 1
        posts = {t: self._scored(t, "bm25") for t in qtf}
        posts = {t: p for t, p in posts.items() if p is not None}
        cand: Optional[np.ndarray] = None
        for t in must:
            p = posts.get(t)
            if p is None:
                return []                     # a must term matches nothing
            cand = p.doc_ids if cand is None \
                else np.intersect1d(cand, p.doc_ids, assume_unique=True)
        for ids in phrase_must:
            if ids.size == 0:
                return []                     # phrase matches nothing
            cand = ids if cand is None \
                else np.intersect1d(cand, ids, assume_unique=True)
        if cand is None:                      # no must terms: union of opts
            if not posts:
                return []
            cand = np.unique(np.concatenate(
                [p.doc_ids for p in posts.values()]))
        for t in set(nots):
            tp = self.term_postings(t)
            if tp is not None and tp.doc_ids.size:
                cand = cand[~np.isin(cand, tp.doc_ids, assume_unique=True)]
        for ids in phrase_not:
            if ids.size:
                cand = cand[~np.isin(cand, ids, assume_unique=True)]
        if not cand.size:
            return []
        # TAAT accumulate restricted to the candidate set (posting lists
        # are doc_id-sorted: membership via searchsorted, no hashing)
        all_ids = np.concatenate([p.doc_ids for p in posts.values()])
        all_sc = np.concatenate([p.scores * qtf[t]
                                 for t, p in posts.items()])
        pos = np.searchsorted(cand, all_ids)
        keep = (pos < cand.size) & (cand[np.minimum(pos, cand.size - 1)]
                                    == all_ids)
        uniq, inv = np.unique(all_ids[keep], return_inverse=True)
        if not uniq.size:
            return []
        acc = np.bincount(inv, weights=all_sc[keep], minlength=uniq.size)
        order = np.lexsort((uniq, -acc))[:min(k, uniq.size)]
        urls, titles = self._urls(), self._titles()
        out = []
        for i in order:
            d = int(uniq[i])
            matched = [t for t, p in posts.items()
                       if p.doc_ids[np.searchsorted(p.doc_ids, d):
                                    np.searchsorted(p.doc_ids, d) + 1].size
                       and p.doc_ids[np.searchsorted(p.doc_ids, d)] == d]
            out.append(SearchResult(
                url=self._defrag(urls.get(d, "")), doc_id=d,
                score=float(acc[i]), matched_terms=matched,
                title=titles.get(d, "") or ""))
        return out

    @staticmethod
    def _defrag(url: str) -> str:
        # reference defrags at result-render time (search.py:194)
        return url.split("#", 1)[0]

    def _search_bm25_lazy(self, qtf: Dict[str, int], k: int) -> List[SearchResult]:
        """Block-skipping WAND: the IO-scale query path. Unsalted terms get
        a lazy cursor that decodes ONLY the blocks the document-at-a-time
        loop lands in (seeks driven by block_last skip whole blocks without
        IO); salted / legacy-layout terms fall back to eager merged cursors
        — the two kinds mix freely in one query. Results are identical to
        TAAT/eager WAND (same per-posting scores, same canonical-order
        accumulation, same tie-break; tested)."""
        from .wand import _Cursor, _LazyCursor, wand_topk_cursors

        # stored block maxima were computed with the BUILD's k1/b; a runtime
        # cfg override changes the scores, so the lazy bounds would no longer
        # dominate them — fall back to eager cursors (bounds recomputed)
        lazy_ok = (float(self.cfg.bm25_k1) == float(self.manifest["bm25_k1"])
                   and float(self.cfg.bm25_b) == float(self.manifest["bm25_b"]))
        term_list = list(qtf)
        cursors = []
        for oi, t in enumerate(term_list):
            parts = self._parts_for_term(t)
            handle = reader = None
            if lazy_ok and len(parts) == 1:
                reader = self._reader(parts[0])
                handle = reader.term_handle(t)
            if handle is not None:
                df = handle[1]
                score_fn = (lambda df_: lambda tf, imp, dl: bm25_scores(
                    tf, imp, dl, df_, self.num_docs, self.avgdl,
                    self.cfg.bm25_k1, self.cfg.bm25_b))(df)
                cursors.append(_LazyCursor(reader, handle, score_fn,
                                           float(qtf[t]), oi))
            else:
                mp = self._scored(t, "bm25")
                if mp is not None:
                    cursors.append(_Cursor(mp.doc_ids, mp.scores,
                                           mp.block_last, mp.block_max,
                                           float(qtf[t]), oi))
        ranked = wand_topk_cursors(cursors, k)
        urls = self._urls()
        titles = self._titles()
        out = []
        for d, s, ords in ranked:
            d = int(d)
            out.append(SearchResult(
                url=self._defrag(urls.get(d, "")), doc_id=d, score=float(s),
                matched_terms=[term_list[o] for o in ords],
                title=titles.get(d, "") or ""))
        return out

    def phrase_match(self, phrase: str) -> List[int]:
        """doc_ids containing the phrase as CONSECUTIVE index tokens.

        Uses the stored per-posting positions (which the reference wrote but
        never queried — index_manager.py:17-23). Index-side tokenization
        (stopwords kept, len-1 tokens dropped before position assignment),
        so e.g. 'spark x join' indexes spark/join as adjacent.

        The chain runs VECTORIZED over all candidate docs at once: positions
        flatten to sorted (doc_rank << 32 | pos) keys and each step is one
        galloping ``searchsorted`` membership of (prev + 1) in the next
        term's keys — no per-doc Python loop, so stopword phrases (many
        candidate docs x many positions each) stay a few array passes."""
        terms = self.tokenizer.tokens(phrase)
        if not terms:
            return []
        tps = [self.term_postings(t, with_positions=True) for t in terms]
        if any(tp is None for tp in tps):
            return []
        common = tps[0].doc_ids
        for tp in tps[1:]:
            common = common[np.isin(common, tp.doc_ids, assume_unique=True)]
        if common.size == 0:
            return []
        m = int(common.size)
        shift = np.int64(1) << np.int64(32)   # positions are < 2^32
        pos_of = [dict(zip(tp.doc_ids.tolist(),
                           range(tp.doc_ids.size))) for tp in tps]

        def flat_keys(tp, pmap) -> np.ndarray:
            """Strictly ascending (doc_rank, pos) keys for the common docs —
            docs ascend, positions ascend within a doc."""
            arrs = [tp.positions[pmap[d]] for d in common.tolist()]
            lens = np.fromiter((a.size for a in arrs), np.int64, m)
            pos = (np.concatenate(arrs).astype(np.int64)
                   if m else np.empty(0, np.int64))
            docr = np.repeat(np.arange(m, dtype=np.int64), lens)
            return docr * shift + pos

        cur = flat_keys(tps[0], pos_of[0])
        for tp, pmap in zip(tps[1:], pos_of[1:]):
            nxt = flat_keys(tp, pmap)
            tgt = cur + 1                     # same doc, next position
            idx = np.searchsorted(nxt, tgt)
            ok = idx < nxt.size
            ok[ok] = nxt[idx[ok]] == tgt[ok]
            cur = tgt[ok]
            if cur.size == 0:
                return []
        return sorted(int(common[i]) for i in np.unique(cur >> np.int64(32)))

    def min_window(self, doc_id: int, terms) -> Optional[int]:
        """Length (inclusive, in token positions) of the SMALLEST window
        of the document containing every distinct term at least once —
        the classic minimal-interval proximity signal (Clarke, Cormack &
        Tudhope 2000). None if the doc lacks any of the terms. One
        two-pointer sweep over the doc's merged tagged positions,
        O(total positions in this doc) — used on top-k candidates only,
        never corpus-wide."""
        distinct = sorted(set(terms))
        if not distinct:
            return None
        plists = []
        for t in distinct:
            tp = self.term_postings(t, with_positions=True)
            if tp is None:
                return None
            i = int(np.searchsorted(tp.doc_ids, doc_id))
            if i >= tp.doc_ids.size or tp.doc_ids[i] != doc_id:
                return None
            plists.append(np.asarray(tp.positions[i], np.int64))
        if len(plists) == 1:
            return 1
        pos = np.concatenate(plists)
        tag = np.repeat(np.arange(len(plists)), [p.size for p in plists])
        order = np.argsort(pos, kind="stable")
        pos, tag = pos[order], tag[order]
        need = len(plists)
        count = np.zeros(need, np.int64)
        covered = 0
        best = None
        left = 0
        for right in range(pos.size):
            if count[tag[right]] == 0:
                covered += 1
            count[tag[right]] += 1
            while covered == need:
                w = int(pos[right] - pos[left] + 1)
                if best is None or w < best:
                    best = w
                count[tag[left]] -= 1
                if count[tag[left]] == 0:
                    covered -= 1
                left += 1
        return best

    def proximity_rerank(self, query: str, k: int = 10,
                         k_candidates: int = 50,
                         beta: float = 0.5) -> List[SearchResult]:
        """BM25 retrieve-then-rerank with a proximity bonus:
        final = bm25 + beta * n_matched / min_window(matched terms) —
        docs whose matched terms sit close together rise (a phrase-tight
        doc gets the full beta * n/n = beta bonus; scattered terms decay
        toward 0). Only the ``k_candidates`` BM25 finalists pay the
        position decode, so the extra cost is O(k_candidates) seeks.
        Ties break (score desc, doc_id) like every other ranking."""
        cands = self.search(query, k_candidates, scorer="bm25")
        rescored = []
        for r in cands:
            w = (self.min_window(r.doc_id, r.matched_terms)
                 if r.matched_terms else None)
            bonus = beta * len(set(r.matched_terms)) / w if w else 0.0
            rescored.append(SearchResult(
                url=r.url, doc_id=r.doc_id, score=r.score + bonus,
                matched_terms=r.matched_terms, title=r.title))
        rescored.sort(key=lambda r: (-r.score, r.doc_id))
        return rescored[:k]

    def search_near(self, query: str, k: int = 10,
                    window: int = 8) -> List[SearchResult]:
        """NEAR operator: BM25-ranked results restricted to documents
        where ALL query terms co-occur inside a ``window``-token minimal
        interval (unordered — the classic proximity constraint between
        exact phrase and bare AND). Candidates come from the posting-list
        intersection ordered by ascending df (cheapest list first), the
        window test is :meth:`min_window` per surviving candidate, and
        scores/tie-breaks match plain BM25 restricted to that set."""
        terms = self.tokenize_query(query)
        distinct = sorted(set(terms))
        if not distinct:
            return []
        tps = []
        for t in distinct:
            tp = self.term_postings(t)
            if tp is None:
                return []
            tps.append(tp)
        tps.sort(key=lambda tp: tp.doc_ids.size)
        cand = tps[0].doc_ids
        for tp in tps[1:]:
            cand = cand[np.isin(cand, tp.doc_ids, assume_unique=True)]
            if cand.size == 0:
                return []
        # score the intersection first (vectorized TAAT), then walk
        # candidates in final rank order and stop after k window
        # survivors — min_window's per-doc Python sweep stays bounded by
        # O(k + rejects-before-the-kth), never the whole intersection
        qtf: Dict[str, int] = {}
        for t in terms:
            qtf[t] = qtf.get(t, 0) + 1
        posts = {t: p for t, p in
                 ((t, self._scored(t, "bm25")) for t in qtf)
                 if p is not None}
        acc = np.zeros(cand.size, np.float64)
        for t, p in posts.items():
            pos = np.searchsorted(p.doc_ids, cand)
            hit = (pos < p.doc_ids.size) & \
                (p.doc_ids[np.minimum(pos, p.doc_ids.size - 1)] == cand)
            acc[hit] += p.scores[pos[hit]] * qtf[t]
        order = np.lexsort((cand, -acc))
        urls, titles = self._urls(), self._titles()
        out: List[SearchResult] = []
        for i in order:
            d = int(cand[i])
            if (self.min_window(d, distinct) or window + 1) > window:
                continue
            out.append(SearchResult(
                url=self._defrag(urls.get(d, "")), doc_id=d,
                score=float(acc[i]), matched_terms=distinct,
                title=titles.get(d, "") or ""))
            if len(out) >= k:
                break
        return out

    def _search_tfidf_ref(self, terms: List[str], k: int) -> List[SearchResult]:
        """Reference Q3-Q5 semantics (search.py:141-198)."""
        qtf: Dict[str, int] = {}
        for t in terms:
            qtf[t] = qtf.get(t, 0) + 1
        posts = {t: self._scored(t, "tfidf") for t in qtf}
        posts = {t: p for t, p in posts.items() if p is not None}
        if not posts:
            return []
        titles = self._titles()

        def resolve(doc_ids):
            url_of, links = self._urls(), self.link_scores()
            urls = [url_of.get(int(d), "") for d in doc_ids]
            auth = np.array([links.get(u, (0.0, 0.0, 0.0))[0] for u in urls])
            hub = np.array([links.get(u, (0.0, 0.0, 0.0))[1] for u in urls])
            pr = np.array([links.get(u, (0.0, 0.0, 0.0))[2] for u in urls])
            return urls, auth, hub, pr

        out = []
        for d, score, matched, url in tfidf_ref_rank(posts, terms, k, resolve):
            out.append(SearchResult(url=self._defrag(url), doc_id=d,
                                    score=score, matched_terms=matched,
                                    title=titles.get(d, "") or ""))
        return out

    def close(self):
        for r in self._readers.values():
            r.close()
        self._readers.clear()
