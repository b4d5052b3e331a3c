"""connected_components (graph/concomp.py) vs a union-find reference on
adversarial shapes: long paths (worst case for plain label propagation),
stars, disjoint cliques, random sparse graphs, empty input."""

import numpy as np
import pyarrow as pa
import pytest


def _uf(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min id per component
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    out = {}
    for mem in comp.values():
        m = min(mem)
        for n in mem:
            out[n] = m
    return out


def _run(edges, ray_session, **kw):
    import ray.data as rd
    from ics_search_engine_ray.graph.concomp import connected_components

    t = pa.table({
        "src": pa.array([u for u, _ in edges], pa.int64()),
        "dst": pa.array([v for _, v in edges], pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(4)
    got = {r["node"]: r["component"]
           for r in connected_components(ds, **kw).take_all()}
    return got


def _check(edges, ray_session, **kw):
    nodes = sorted({n for e in edges for n in e})
    want = _uf(edges, nodes)
    got = _run(edges, ray_session, **kw)
    assert got == want


def test_cc_long_path(ray_session):
    # 300-node path: O(diameter) algorithms need 300 rounds; this must
    # converge well inside max_iters=50
    _check([(i, i + 1) for i in range(300)], ray_session)


def test_cc_star_and_cliques(ray_session):
    edges = [(1000, i) for i in range(50)]                 # star, big root
    edges += [(u, v) for u in range(2000, 2010)
              for v in range(u + 1, 2010)]                  # clique
    edges += [(5000, 5001)]                                 # pair
    _check(edges, ray_session)


def test_cc_random_sparse(ray_session):
    rng = np.random.default_rng(17)
    n = 800
    edges = [(int(a), int(b))
             for a, b in rng.integers(0, n, size=(900, 2))
             if a != b]
    _check(edges, ray_session, num_groups=5)


def test_cc_duplicate_reversed_and_self_edges(ray_session):
    # self-loops are dropped at ingest; (7,7) introduces no node
    edges = [(1, 2), (2, 1), (1, 2), (3, 2), (2, 3), (7, 7)]
    want = _uf([(1, 2), (2, 3)], [1, 2, 3])
    got = _run(edges, ray_session)
    assert got == want


def test_cc_empty(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.graph.concomp import connected_components

    ds = rd.from_arrow(pa.table({
        "src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}))
    assert connected_components(ds).take_all() == []


def test_cc_raises_on_nonconvergence(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.graph.concomp import connected_components

    edges = [(i, i + 1) for i in range(64)]
    ds = rd.from_arrow(pa.table({
        "src": pa.array([u for u, _ in edges], pa.int64()),
        "dst": pa.array([v for _, v in edges], pa.int64())}))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(ds, max_iters=1).take_all()


def _tri_ref(edges):
    """Brute-force triangle set on the undirected simple graph."""
    import itertools
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tris = set()
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tris.add((a, b, c))
    return sorted(tris)


def _run_tri(edges, ray_session):
    import ray.data as rd
    from ics_search_engine_ray.graph.concomp import triangles
    t = pa.table({
        "src": pa.array([u for u, _ in edges], pa.int64()),
        "dst": pa.array([v for _, v in edges], pa.int64())})
    out = triangles(rd.from_arrow(t).repartition(4)).take_all()
    return sorted((r["u"], r["v"], r["w"]) for r in out)


def test_triangles_random_graph(ray_session):
    rng = np.random.default_rng(7)
    edges = [tuple(e) for e in rng.integers(0, 30, (150, 2)).tolist()]
    assert _run_tri(edges, ray_session) == _tri_ref(edges)


def test_triangles_ids_beyond_32_bits(ray_session):
    # doc_ids in this repo are 63-bit url hashes; node ids must survive
    # >= 2^32 (the old packed lo<<32|hi key silently corrupted these).
    base = 1 << 62
    rng = np.random.default_rng(11)
    small = rng.integers(0, 25, (120, 2))
    edges = [(int(base + u * 2654435761), int(base + v * 2654435761))
             for u, v in small.tolist()]
    assert _run_tri(edges, ray_session) == _tri_ref(edges)


def _bfs_ref(edges, source, max_rounds=15):
    """Plain dict/set BFS reference."""
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {source: 0}
    frontier = [source]
    for r in range(1, max_rounds + 1):
        nxt = []
        for u in frontier:
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = r
                    nxt.append(w)
        if not nxt:
            break
        frontier = nxt
    return sorted(dist.items())


def test_bfs_levels_fast_path_matches_reference_and_dataset(ray_session):
    import ray.data as rd

    from ics_search_engine_ray.graph.concomp import bfs_levels

    rng = np.random.default_rng(23)
    edges = [tuple(e) for e in rng.integers(0, 80, (200, 2)).tolist()]
    src_node = int(edges[0][0])
    t = pa.table({"src": pa.array([u for u, _ in edges], pa.int64()),
                  "dst": pa.array([v for _, v in edges], pa.int64())})
    want = _bfs_ref(edges, src_node)

    fast = sorted((r["node"], r["dist"]) for r in bfs_levels(
        rd.from_arrow(t).repartition(4), source=src_node).take_all())
    assert fast == want

    # force the dataset-superstep path (gate=0) -> identical output
    slow = sorted((r["node"], r["dist"]) for r in bfs_levels(
        rd.from_arrow(t).repartition(4), source=src_node,
        dist_edge_gate=0).take_all())
    assert slow == want


def test_bfs_levels_fast_path_isolated_source(ray_session):
    import ray.data as rd

    from ics_search_engine_ray.graph.concomp import bfs_levels

    t = pa.table({"src": pa.array([1, 2], pa.int64()),
                  "dst": pa.array([2, 3], pa.int64())})
    out = sorted((r["node"], r["dist"]) for r in bfs_levels(
        rd.from_arrow(t), source=99).take_all())
    assert out == [(99, 0)]


def _naive_kcore(edges, k):
    """Sequential peeling over an undirected edge list (set-based)."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for u in [u for u, ns in adj.items() if len(ns) < k]:
            for v in adj.pop(u):
                adj[v].discard(u)
            changed = True
    return sorted((u, len(ns)) for u, ns in adj.items())


def test_kcore_hand_computed(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.graph.concomp import kcore_nodes

    # K4 clique {0,1,2,3} + a pendant chain 3-4-5 + duplicate/self edges
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (3, 4), (4, 5), (1, 0), (2, 2)]
    t = pa.table({"src": pa.array([a for a, _ in edges], pa.int64()),
                  "dst": pa.array([b for _, b in edges], pa.int64())})
    got = sorted((r["node"], r["deg"]) for r in
                 kcore_nodes(rd.from_arrow(t), k=3).take_all())
    assert got == [(0, 3), (1, 3), (2, 3), (3, 3)]
    assert got == _naive_kcore(edges, 3)
    # k=1: everything with an edge survives, self-loop ignored
    got1 = sorted((r["node"], r["deg"]) for r in
                  kcore_nodes(rd.from_arrow(t), k=1).take_all())
    assert got1 == _naive_kcore(edges, 1)


def test_kcore_dataset_path_matches_driver(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.graph.concomp import kcore_nodes

    rng = np.random.default_rng(23)
    n = 200
    s = rng.integers(0, n, size=900)
    d = rng.integers(0, n, size=900)
    t = pa.table({"src": pa.array(s, pa.int64()),
                  "dst": pa.array(d, pa.int64())})
    want = _naive_kcore(list(zip(s.tolist(), d.tolist())), 4)
    for gate in (None, 0):       # driver fast path vs dataset supersteps
        got = sorted((r["node"], r["deg"]) for r in
                     kcore_nodes(rd.from_arrow(t).repartition(5), k=4,
                                 dist_edge_gate=gate).take_all())
        assert got == want, f"gate={gate}"


def test_kcore_empty_core(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.graph.concomp import kcore_nodes

    t = pa.table({"src": pa.array([0, 1], pa.int64()),
                  "dst": pa.array([1, 2], pa.int64())})
    assert kcore_nodes(rd.from_arrow(t), k=3).count() == 0
