"""PageRank/HITS parity: sparse implementation vs a dense replica of the
reference's exact math (utils/pagerank.py:7-44, utils/hits.py:8-69),
including the mass-leak and break-before-assign quirks (SURVEY.md §2.8)."""

import numpy as np
import pytest

from ics_search_engine_ray.graph.linkrank import build_edges, pagerank, hits


def dense_pagerank_reference(doc_links, damping=0.85, max_iterations=100, threshold=1e-4):
    """Line-for-line re-derivation of the reference's dense PageRank."""
    urls = sorted({u for u, _ in doc_links})
    idx = {u: i for i, u in enumerate(urls)}
    n = len(urls)
    adj = np.zeros((n, n))
    for u, links in doc_links:
        fi = idx[u]
        links = links or []
        if len(links) > 0:
            for ln in links:
                if ln in idx:
                    adj[idx[ln]][fi] = 1.0 / len(links)   # ALL links in divisor
    scores = np.ones(n) / n
    for _ in range(max_iterations):
        new = (1 - damping) / n + damping * (adj @ scores)
        if np.abs(new - scores).sum() < threshold:
            break
        scores = new
    return {u: float(s) * 1000 for u, s in zip(urls, scores)}


def dense_hits_reference(doc_links, max_iterations=20, threshold=1e-4):
    urls = sorted({u for u, _ in doc_links})
    idx = {u: i for i, u in enumerate(urls)}
    n = len(urls)
    adj = np.zeros((n, n))
    for u, links in doc_links:
        for ln in (links or []):
            if ln in idx:
                adj[idx[u]][idx[ln]] = 1
    hub = np.ones(n) / n
    auth = np.ones(n) / n
    for _ in range(max_iterations):
        na = adj.T @ hub
        na = na / np.linalg.norm(na, 1)
        nh = adj @ na
        nh = nh / np.linalg.norm(nh, 1)
        if (np.abs(na - auth) < threshold).all() and (np.abs(nh - hub) < threshold).all():
            break
        auth = na
        hub = nh
    return ({u: s * 10 for u, s in zip(urls, auth)},
            {u: s * 10 for u, s in zip(urls, hub)})


def random_graph(rng, n, external_frac=0.3):
    urls = [f"https://s.edu/{i}" for i in range(n)]
    rows = []
    for i, u in enumerate(urls):
        k = int(rng.integers(0, 5))
        links = [urls[int(x)] for x in rng.integers(0, n, size=k) if int(x) != i]
        if rng.random() < external_frac:
            links.append(f"http://external.example.com/e{i}")   # mass leak
        rows.append((u, links))
    return rows


def test_pagerank_matches_dense_reference():
    rng = np.random.default_rng(5)
    for n in (5, 23, 60):
        rows = random_graph(rng, n)
        urls, src, dst, deg = build_edges(rows)
        got = pagerank(urls, src, dst, deg)
        want = dense_pagerank_reference(rows)
        assert set(got) == set(want)
        for u in got:
            assert got[u] == pytest.approx(want[u], rel=1e-10), u


def test_hits_matches_dense_reference():
    rng = np.random.default_rng(6)
    for n in (5, 23, 60):
        rows = random_graph(rng, n)
        urls, src, dst, deg = build_edges(rows)
        auth, hub = hits(urls, src, dst)
        wa, wh = dense_hits_reference(rows)
        for u in auth:
            assert auth[u] == pytest.approx(wa[u], rel=1e-9, abs=1e-12)
            assert hub[u] == pytest.approx(wh[u], rel=1e-9, abs=1e-12)


def test_pagerank_hand_computed_two_nodes():
    # a -> b (internal); b -> external only (dangling for internal mass)
    rows = [("a", ["b"]), ("b", ["http://x.com/e"])]
    urls, src, dst, deg = build_edges(rows)
    got = pagerank(urls, src, dst, deg)
    # fixpoint: pr(a) = 0.075, pr(b) = 0.075 + 0.85*pr(a)
    # (external link leaks b's mass: proper PR would teleport it)
    assert got["a"] == pytest.approx(75.0, rel=1e-3)
    assert got["b"] == pytest.approx((0.075 + 0.85 * 0.075) * 1000, rel=1e-3)


def test_hits_empty_graph_returns_zeros():
    rows = [("a", []), ("b", ["http://x.com/e"])]
    urls, src, dst, deg = build_edges(rows)
    auth, hub = hits(urls, src, dst)
    assert all(v == 0 or v == pytest.approx(5.0) for v in auth.values())


def test_link_scores_dataset_matches_driver_path(ray_session):
    """The distributed edge-extraction + join-back path must equal the
    driver-side reference implementation url-for-url."""
    import ray.data as rd
    import pyarrow as pa
    from ics_search_engine_ray.graph.linkrank import (
        link_scores_dataset, link_scores_from_docmeta)

    urls = [f"https://s{i % 7}.test/p{i}" for i in range(60)]
    rows = []
    for i, u in enumerate(urls):
        links = []
        if i % 3 == 0:
            links.append(urls[(i + 5) % 60])
        if i % 4 == 0:
            links.append(urls[(i + 11) % 60])
            links.append(urls[(i + 11) % 60])      # duplicate edge collapses
        if i % 5 == 0:
            links.append("http://external.example/x")
        rows.append({"url": u, "outgoing_links": links})
    ds = rd.from_arrow(pa.table({
        "url": [r["url"] for r in rows],
        "outgoing_links": pa.array([r["outgoing_links"] for r in rows],
                                   pa.list_(pa.string())),
    })).repartition(4)

    got = {r["url"]: (r["auth"], r["hub"], r["pagerank"])
           for b in link_scores_dataset(ds).iter_batches(batch_format="pyarrow")
           for r in b.to_pylist()}
    want = {r["url"]: (r["auth"], r["hub"], r["pagerank"])
            for r in link_scores_from_docmeta(
                [(r["url"], r["outgoing_links"]) for r in rows])}
    assert set(got) == set(want)
    for u in want:
        for g, w in zip(got[u], want[u]):
            assert g == pytest.approx(w, rel=1e-9, abs=1e-12), u

    # gate=0 forces the dataset-pass power iteration (groupby().sum per
    # step); must match the driver-side numpy iteration up to float
    # summation order (groupby partials vs bincount)
    got_ds = {r["url"]: (r["auth"], r["hub"], r["pagerank"])
              for b in link_scores_dataset(ds, dist_edge_gate=0)
                       .iter_batches(batch_format="pyarrow")
              for r in b.to_pylist()}
    assert set(got_ds) == set(want)
    for u in want:
        for g, w in zip(got_ds[u], want[u]):
            assert g == pytest.approx(w, rel=1e-9, abs=1e-12), u


def test_distributed_power_iteration_kernels(ray_session):
    """pagerank_arr_ds / hits_arr_ds == pagerank_arr / hits_arr on the same
    edge set (the two gate branches of link_scores_dataset)."""
    import ray.data as rd
    import pyarrow as pa
    from ics_search_engine_ray.graph.linkrank import (
        pagerank_arr, hits_arr, pagerank_arr_ds, hits_arr_ds)

    rng = np.random.default_rng(11)
    n = 80
    src = rng.integers(0, n, size=400).astype(np.int64)
    dst = rng.integers(0, n, size=400).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    out_deg = np.bincount(src, minlength=n) + rng.integers(0, 3, size=n)
    edges_ds = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()),
    })).repartition(5).materialize()

    # bounded iteration counts keep the test fast; equality is per-step so
    # the cap exercises the same math as a converged run
    pr_drv = pagerank_arr(n, src, dst, out_deg, max_iterations=8)
    pr_ds = pagerank_arr_ds(n, edges_ds, out_deg, max_iterations=8)
    np.testing.assert_allclose(pr_ds, pr_drv, rtol=1e-9, atol=1e-12)

    a_drv, h_drv = hits_arr(n, src, dst, max_iterations=5)
    a_ds, h_ds = hits_arr_ds(n, edges_ds, max_iterations=5)
    np.testing.assert_allclose(a_ds, a_drv, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(h_ds, h_drv, rtol=1e-9, atol=1e-12)

    # empty edge set: both variants return the teleport-only fixpoint
    empty = rd.from_arrow(pa.table({
        "src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
    })).materialize()
    np.testing.assert_allclose(
        pagerank_arr_ds(4, empty, np.zeros(4, np.int64)),
        pagerank_arr(4, np.empty(0, np.int64), np.empty(0, np.int64),
                     np.zeros(4, np.int64)))
