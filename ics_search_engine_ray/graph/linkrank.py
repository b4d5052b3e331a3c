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

import os
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


def pagerank_arr(n: int, src: np.ndarray, dst: np.ndarray, out_deg: np.ndarray,
                 damping: float = 0.85, max_iterations: int = 100,
                 threshold: float = 1e-4) -> np.ndarray:
    """Dense-position PageRank (scores scaled x1000, quirk-compatible)."""
    if n == 0:
        return np.empty(0)
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
    return scores * 1000


def hits_arr(n: int, src: np.ndarray, dst: np.ndarray,
             max_iterations: int = 20,
             threshold: float = 1e-4) -> Tuple[np.ndarray, np.ndarray]:
    """Dense-position HITS (auth, hub; scaled x10, quirk-compatible)."""
    if n == 0:
        return np.empty(0), np.empty(0)
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
    return auth * 10, hub * 10


def pagerank(urls, src, dst, out_deg, damping: float = 0.85,
             max_iterations: int = 100, threshold: float = 1e-4) -> Dict[str, float]:
    s = pagerank_arr(len(urls), src, dst, out_deg, damping, max_iterations, threshold)
    return {u: float(v) for u, v in zip(urls, s)}


def hits(urls, src, dst, max_iterations: int = 20,
         threshold: float = 1e-4) -> Tuple[Dict[str, float], Dict[str, float]]:
    auth, hub = hits_arr(len(urls), src, dst, max_iterations, threshold)
    return ({u: float(v) for u, v in zip(urls, auth)},
            {u: float(v) for u, v in zip(urls, hub)})


def link_scores_from_docmeta(docmeta_rows: Iterable[Tuple[str, List[str]]]):
    """Compute the link_scores table rows (url, auth, hub, pagerank).

    Driver-side variant over collected (url, links) rows — kept for tests
    and small corpora; the build pipeline uses :func:`link_scores_dataset`.
    """
    urls, src, dst, out_deg = build_edges(docmeta_rows)
    pr = pagerank(urls, src, dst, out_deg)
    auth, hub = hits(urls, src, dst)
    return [
        {"url": u, "auth": auth.get(u, 0.0), "hub": hub.get(u, 0.0),
         "pagerank": pr.get(u, 0.0)}
        for u in urls
    ]


# ---------------------------------------------------------------------------
# distributed edge extraction + score join-back (the build-pipeline path)
# ---------------------------------------------------------------------------


def edge_dataset(meta_ds):
    """docmeta Dataset (url, outgoing_links) -> (node_hash_sorted, edges_ds,
    out_deg) — edges stay a (materialized) Dataset of (src, dst) positions;
    the driver receives only O(V) arrays (node hashes + out-degrees).

    Node identity is the 63-bit md5 url hash (the same function as page
    doc_ids); positions index the sorted hash array. Internal-edge detection
    is a broadcast membership test against the sorted node hashes (8 bytes x
    N — broadcastable far past this scope; at 10^9+ nodes switch to a
    hash-partitioned semi-join). Reference semantics preserved: out-degree
    counts ALL links incl. external and duplicates; duplicate internal edges
    collapse (dense-matrix assignment, pagerank.py:26-31, hits.py:27-35).
    """
    import pyarrow as pa
    import ray
    from ..stages.tokenize import url_doc_id

    hd = meta_ds.map_batches(lambda b: pa.table({
        "h": pa.array([url_doc_id(u) for u in b.column("url").to_pylist()],
                      pa.int64())}), batch_format="pyarrow")
    h_parts = [b.column("h").to_numpy(zero_copy_only=False)
               for b in hd.iter_batches(batch_format="pyarrow") if b.num_rows]
    node_h = np.sort(np.concatenate(h_parts)) if h_parts else np.empty(0, np.int64)
    n = int(node_h.size)
    nodes_ref = ray.put(node_h)

    def edge_rows(b: pa.Table) -> pa.Table:
        nodes = ray.get(nodes_ref)
        nn = nodes.size
        srcs, dsts = [], []
        for u, links in zip(b.column("url").to_pylist(),
                            b.column("outgoing_links").to_pylist()):
            links = links or []
            sh = url_doc_id(u)
            sp = int(np.searchsorted(nodes, sh))
            # kind=1 degree row: (src_pos, total link count incl. external)
            srcs.append(-sp - 1)                 # negative marks degree rows
            dsts.append(len(links))
            if not links:
                continue
            dh = np.fromiter((url_doc_id(l) for l in links),
                             dtype=np.int64, count=len(links))
            pos = np.searchsorted(nodes, dh)
            ok = pos < nn
            ok[ok] = nodes[pos[ok]] == dh[ok]    # exact membership
            tpos = np.unique(pos[ok])            # duplicate edges collapse
            srcs.extend([sp] * tpos.size)
            dsts.extend(tpos.tolist())
        return pa.table({"src": pa.array(srcs, pa.int64()),
                         "dst": pa.array(dsts, pa.int64())})

    all_rows = meta_ds.map_batches(edge_rows, batch_format="pyarrow").materialize()
    # degree rows (one per node, O(V)) come to the driver; real edges stay out
    out_deg = np.zeros(n, dtype=np.int64)
    for b in all_rows.filter(expr="src < 0").iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            s = b.column("src").to_numpy(zero_copy_only=False)
            out_deg[-s - 1] = b.column("dst").to_numpy(zero_copy_only=False)
    edges_ds = all_rows.filter(expr="src >= 0").materialize()
    return node_h, edges_ds, out_deg


def extract_edges_dataset(meta_ds):
    """Back-compat wrapper: (node_hash_sorted, src_pos, dst_pos, out_deg)
    with the edge arrays collected to the driver (the small-graph path)."""
    node_h, edges_ds, out_deg = edge_dataset(meta_ds)
    src, dst = collect_edges(edges_ds)
    return node_h, src, dst, out_deg


def collect_edges(edges_ds):
    """Materialized edges Dataset -> driver (src, dst) int64 arrays."""
    src_parts, dst_parts = [], []
    for b in edges_ds.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            src_parts.append(b.column("src").to_numpy(zero_copy_only=False))
            dst_parts.append(b.column("dst").to_numpy(zero_copy_only=False))
    src = np.concatenate(src_parts) if src_parts else np.empty(0, np.int64)
    dst = np.concatenate(dst_parts) if dst_parts else np.empty(0, np.int64)
    return src, dst


def _scatter_sum_ds(edges_ds, n: int, w: np.ndarray, group_col: str,
                    gather_col: str) -> np.ndarray:
    """Dataset pass computing out[g] = sum over edges grouped by `group_col`
    of w[edge[gather_col]] — the distributed scatter-add one power-iteration
    step needs. Per-batch local combine (np.unique + bincount) shrinks the
    shuffled relation to unique group keys per block before the native
    ``groupby(g).sum(w)``; the driver receives only the O(V) aggregate.
    """
    import pyarrow as pa
    import ray

    w_ref = ray.put(np.ascontiguousarray(w, dtype=np.float64))

    def part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"g": pa.array([], pa.int64()),
                             "w": pa.array([], pa.float64())})
        wv = ray.get(w_ref)
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        s = b.column(gather_col).to_numpy(zero_copy_only=False)
        ug, inv = np.unique(g, return_inverse=True)
        ps = np.bincount(inv, weights=wv[s])
        return pa.table({"g": pa.array(ug, pa.int64()),
                         "w": pa.array(ps, pa.float64())})

    agg = edges_ds.map_batches(part, batch_format="pyarrow").groupby("g").sum("w")
    out = np.zeros(n)
    for b in agg.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            out[b.column("g").to_numpy(zero_copy_only=False)] = \
                b.column("sum(w)").to_numpy(zero_copy_only=False)
    return out


def pagerank_arr_ds(n: int, edges_ds, out_deg: np.ndarray,
                    damping: float = 0.85, max_iterations: int = 100,
                    threshold: float = 1e-4) -> np.ndarray:
    """Dataset-pass PageRank: each iteration is one ``groupby(dst).sum``
    over the (materialized) edges Dataset; the driver holds only the O(V)
    score/degree vectors. Quirk-identical control flow to
    :func:`pagerank_arr` (break before assignment, x1000 scaling); values
    match up to float summation order (groupby partials vs bincount).

    Scale path: edges never reside on the driver. The O(V) score broadcast
    (8 B/node) holds to ~10^8 nodes; past that, scores become a keyed
    Dataset joined to edges by src (documented in SCALE.md).
    """
    if n == 0:
        return np.empty(0)
    scores = np.ones(n) / n
    inv_deg = np.zeros(n)
    nz = out_deg > 0
    inv_deg[nz] = 1.0 / out_deg[nz]
    for _ in range(max_iterations):
        contrib = _scatter_sum_ds(edges_ds, n, scores * inv_deg, "dst", "src")
        new_scores = (1 - damping) / n + damping * contrib
        if np.abs(new_scores - scores).sum() < threshold:
            break  # reference breaks BEFORE assignment: returns old iterate
        scores = new_scores
    return scores * 1000


def hits_arr_ds(n: int, edges_ds, max_iterations: int = 20,
                threshold: float = 1e-4):
    """Dataset-pass HITS: two ``groupby().sum`` passes per iteration
    (auth over dst, hub over src). Quirk-identical control flow to
    :func:`hits_arr`; L1 normalization on the driver-held O(V) vectors."""
    if n == 0:
        return np.empty(0), np.empty(0)
    hub = np.ones(n) / n
    auth = np.ones(n) / n
    for _ in range(max_iterations):
        new_auth = _scatter_sum_ds(edges_ds, n, hub, "dst", "src")
        na = np.abs(new_auth).sum()
        if na == 0:
            break
        new_auth /= na
        new_hub = _scatter_sum_ds(edges_ds, n, new_auth, "src", "dst")
        nh = np.abs(new_hub).sum()
        if nh == 0:
            break
        new_hub /= nh
        if (np.abs(new_auth - auth) < threshold).all() and (np.abs(new_hub - hub) < threshold).all():
            break  # reference returns previous iterate
        auth = new_auth
        hub = new_hub
    return auth * 10, hub * 10


_DIST_EDGE_GATE = int(os.environ.get("ICSER_LINKRANK_DIST_EDGES", 50_000_000))


def link_scores_dataset(meta_ds, dist_edge_gate: int = None):
    """docmeta Dataset -> link_scores Dataset (url, auth, hub, pagerank).

    Edge extraction and the final url join-back are always dataset passes.
    The power iteration has two variants selected by an edge-count gate
    (``ICSER_LINKRANK_DIST_EDGES``, default 50M): below it the edges are
    collected and iterated driver-side in numpy (fast — no per-iteration
    shuffle); above it the edges stay a Dataset and each iteration is a
    ``groupby().sum`` pass (:func:`pagerank_arr_ds` / :func:`hits_arr_ds`) —
    the driver never holds O(E), only the O(V) score vectors. Both variants
    are tested equal (tests/test_graph.py).
    """
    import pyarrow as pa
    import ray
    from ..stages.tokenize import url_doc_id

    gate = _DIST_EDGE_GATE if dist_edge_gate is None else dist_edge_gate
    node_h, edges_ds, out_deg = edge_dataset(
        meta_ds.select_columns(["url", "outgoing_links"]))
    n = int(node_h.size)
    if edges_ds.count() > gate:
        pr = pagerank_arr_ds(n, edges_ds, out_deg)
        auth, hub = hits_arr_ds(n, edges_ds)
    else:
        src, dst = collect_edges(edges_ds)
        pr = pagerank_arr(n, src, dst, out_deg)
        auth, hub = hits_arr(n, src, dst)
    sc_ref = ray.put((node_h, auth, hub, pr))

    def join_scores(b: pa.Table) -> pa.Table:
        nodes, auth_a, hub_a, pr_a = ray.get(sc_ref)
        urls = b.column("url").to_pylist()
        hs = np.fromiter((url_doc_id(u) for u in urls), dtype=np.int64,
                         count=len(urls))
        pos = np.searchsorted(nodes, hs)
        return pa.table({
            "url": b.column("url"),
            "auth": pa.array(auth_a[pos], pa.float64()),
            "hub": pa.array(hub_a[pos], pa.float64()),
            "pagerank": pa.array(pr_a[pos], pa.float64()),
        })

    return meta_ds.select_columns(["url"]).map_batches(
        join_scores, batch_format="pyarrow")
