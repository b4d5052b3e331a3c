"""Hashed random-projection text embeddings (stages/embed.py)."""

import numpy as np
import pyarrow as pa


def _docs(texts):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string())}))


def _dense(rows, dim):
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], np.zeros(dim))[r["j"]] = r["e"]
    return out


def test_embed_unit_norm_and_determinism(ray_session):
    from ics_search_engine_ray.stages.embed import embed_docs
    texts = ["streaming data engines shuffle blocks",
             "zebra zonal zesty zippy zooms",
             ""]                              # tokenless doc drops
    a = _dense(embed_docs(_docs(texts), dim=16).take_all(), 16)
    b = _dense(embed_docs(_docs(texts), dim=16).take_all(), 16)
    assert set(a) == {0, 1} and set(b) == {0, 1}
    for d in a:
        assert np.array_equal(a[d], b[d])
        assert abs(np.linalg.norm(a[d]) - 1.0) < 1e-4   # rounded to 6dp


def test_embed_preserves_similarity_structure(ray_session):
    # identical docs embed identically; docs sharing most terms are closer
    # than docs sharing none (JL sign projection preserves cosine
    # geometry in expectation)
    from ics_search_engine_ray.stages.embed import embed_docs
    t_same = "alpha apple arrow audit amber alpha apple"
    t_near = "alpha apple arrow audit amber alpha zebra"
    t_far = "zebra zonal zesty zippy zooms zebra zonal"
    v = _dense(embed_docs(_docs([t_same, t_same, t_near, t_far]),
                          dim=32).take_all(), 32)
    assert np.array_equal(v[0], v[1])
    cos = lambda a, b: float(a @ b)
    assert cos(v[0], v[2]) > cos(v[0], v[3])


def test_knn_text_matches_bruteforce(ray_session):
    from ics_search_engine_ray.stages.embed import embed_docs, knn_text
    rng = np.random.default_rng(11)
    vocab = ["alpha", "apple", "arrow", "zebra", "zonal", "zesty",
             "merge", "батч", "data9", "scan2"]
    texts = [" ".join(rng.choice(vocab, size=15)) for _ in range(80)]
    docs = _docs(texts)
    got = [(r["doc_id"], r["cos"])
           for r in knn_text(docs, query_doc_id=42, k=10).take_all()]
    # brute force over the SAME generated (rounded) embeddings
    dim = 16
    v = _dense(embed_docs(docs, dim=dim).take_all(), dim)
    q = v[42]
    qn = np.linalg.norm(q)
    cand = []
    for d, e in v.items():
        if d == 42:
            continue
        n = np.linalg.norm(e)
        if n == 0:
            continue
        c = float(e @ q) / (n * qn)
        c = np.floor(abs(c) * 1e6 + 0.5) / 1e6 * np.sign(c) + 0.0
        cand.append((d, c))
    cand.sort(key=lambda t: (-t[1], t[0]))
    assert got == cand[:10]
