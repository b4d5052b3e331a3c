"""PageRank and HITS over the crawl link graph (SURVEY.md §2 G1/G2).

Quirk-compatible re-implementations of the reference's dense-matrix versions
(utils/pagerank.py:7-44, utils/hits.py:8-69) as sparse edge-list power
iterations (numpy bincount — the reference's dense n x n adjacency would be
2.5e9 cells at 50k docs, let alone at web scale).

Replicated reference quirks (required for rank parity of the tfidf-ref mode):
- PageRank divides by the count of ALL outgoing links but only internal edges
  carry mass (pagerank.py:26-31) -> mass leaks on external links; dangling
  nodes contribute only teleport mass. NOT a proper stochastic matrix.
- Both algorithms break out of the iteration BEFORE assigning the newly
  computed vector, so on convergence the returned scores are the previous
  iterate (pagerank.py:36-41, hits.py:56-66).
- PageRank scores are scaled x1000, HITS x10 (pagerank.py:43, hits.py:67-69).
- HITS L1-normalizes each update; an empty internal-link graph would divide
  by zero in the reference — we keep zeros instead (documented divergence).

Node order: the reference iterates ``list({...})`` (hash-seed dependent);
scores don't depend on node order, so we sort URLs for determinism.

At our scope the iteration runs driver-side over collected edge arrays
(SURVEY.md §2.8: driver-side at this scale; dataset ``groupby(dst).sum``
passes at web scale).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

import numpy as np


def build_edges(doc_links: Iterable[Tuple[str, List[str]]]):
    """(url, outgoing_links) rows -> (urls, src_idx, dst_idx, out_degree).

    out_degree counts ALL outgoing links (external included); edges keep only
    internal targets. Mirrors pagerank.py:26-31 / hits.py:27-35.
    """
    pairs = list(doc_links)
    urls = sorted({u for u, _ in pairs})
    idx = {u: i for i, u in enumerate(urls)}
    src, dst = [], []
    out_deg = np.zeros(len(urls), dtype=np.int64)
    for u, links in pairs:
        links = links or []
        fi = idx[u]
        out_deg[fi] = len(links)   # divisor counts ALL links incl. duplicates
        seen = set()
        for ln in links:
            ti = idx.get(ln)
            # duplicate edges collapse: the reference assigns (not adds) into
            # the dense matrix, so a repeated link contributes once
            if ti is not None and ti not in seen:
                seen.add(ti)
                src.append(fi)
                dst.append(ti)
    return urls, np.asarray(src, dtype=np.int64), np.asarray(dst, dtype=np.int64), out_deg


def pagerank(urls, src, dst, out_deg, damping: float = 0.85,
             max_iterations: int = 100, threshold: float = 1e-4) -> Dict[str, float]:
    n = len(urls)
    if n == 0:
        return {}
    scores = np.ones(n) / n
    inv_deg = np.zeros(n)
    nz = out_deg > 0
    inv_deg[nz] = 1.0 / out_deg[nz]
    for _ in range(max_iterations):
        contrib = np.bincount(dst, weights=scores[src] * inv_deg[src], minlength=n) if src.size else np.zeros(n)
        new_scores = (1 - damping) / n + damping * contrib
        if np.abs(new_scores - scores).sum() < threshold:
            break  # reference breaks BEFORE assignment: returns old iterate
        scores = new_scores
    return {u: float(s) * 1000 for u, s in zip(urls, scores)}


def hits(urls, src, dst, max_iterations: int = 20,
         threshold: float = 1e-4) -> Tuple[Dict[str, float], Dict[str, float]]:
    n = len(urls)
    if n == 0:
        return {}, {}
    hub = np.ones(n) / n
    auth = np.ones(n) / n
    for _ in range(max_iterations):
        new_auth = np.bincount(dst, weights=hub[src], minlength=n) if src.size else np.zeros(n)
        na = np.abs(new_auth).sum()
        if na == 0:
            break  # divergence from reference (it would raise / NaN)
        new_auth /= na
        new_hub = np.bincount(src, weights=new_auth[dst], minlength=n) if src.size else np.zeros(n)
        nh = np.abs(new_hub).sum()
        if nh == 0:
            break
        new_hub /= nh
        if (np.abs(new_auth - auth) < threshold).all() and (np.abs(new_hub - hub) < threshold).all():
            break  # reference returns previous iterate
        auth = new_auth
        hub = new_hub
    auth_scores = {u: float(s) * 10 for u, s in zip(urls, auth)}
    hub_scores = {u: float(s) * 10 for u, s in zip(urls, hub)}
    return auth_scores, hub_scores


def link_scores_from_docmeta(docmeta_rows: Iterable[Tuple[str, List[str]]]):
    """Compute the link_scores table rows (url, auth, hub, pagerank)."""
    urls, src, dst, out_deg = build_edges(docmeta_rows)
    pr = pagerank(urls, src, dst, out_deg)
    auth, hub = hits(urls, src, dst)
    return [
        {"url": u, "auth": auth.get(u, 0.0), "hub": hub.get(u, 0.0),
         "pagerank": pr.get(u, 0.0)}
        for u in urls
    ]
