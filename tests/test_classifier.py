"""Distributed logistic-regression trainer (stages/classifier.py):
parity with a driver-local numpy reference on the same features, actual
learning on separable data, and batch-layout invariance."""

import numpy as np
import pyarrow as pa
import pytest


def _mk_docs(n_per=60, seed=3):
    """Two separable 'languages': one vocab of a-initial terms, one of
    z-initial terms (distinct feature buckets by construction)."""
    rng = np.random.default_rng(seed)
    a_vocab = ["alpha", "apple", "arrow", "audit", "amber"]
    z_vocab = ["zebra", "zonal", "zesty", "zippy", "zooms"]
    texts, labels, ids = [], [], []
    for i in range(n_per * 2):
        en = i % 2 == 0
        vocab = a_vocab if en else z_vocab
        texts.append(" ".join(rng.choice(vocab, size=12)))
        labels.append(1.0 if en else 0.0)
        ids.append(i)
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "y": pa.array(labels, pa.float64())})), texts, np.array(labels)


def _local_gd(texts, ys, n_features=64, iters=5, lr=1.0):
    from ics_search_engine_ray.functions.tokenizer import TOKEN_RE
    from ics_search_engine_ray.stages.classifier import _bucket
    rows = []
    keep = []
    for i, x in enumerate(texts):
        toks = np.asarray([t for t in TOKEN_RE.findall(x.lower())
                           if len(t) > 1], object)
        if not toks.size:
            continue
        keep.append(i)
        cnt = np.bincount(_bucket(toks, n_features), minlength=n_features)
        rows.append(np.append(cnt / toks.size, 1.0))
    X = np.array(rows)
    y = ys[keep]
    w = np.zeros(n_features + 1)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - lr * (X.T @ (p - y)) / X.shape[0]
    return w, X, y


def test_train_logreg_matches_local_gd(ray_session):
    from ics_search_engine_ray.stages.classifier import (featurize,
                                                         train_logreg)
    docs, texts, ys = _mk_docs()
    feats = featurize(
        docs, lambda b: b.column("y").to_numpy(zero_copy_only=False))
    w = train_logreg(feats, n_features=64, iters=5, lr=1.0)
    w_ref, _, _ = _local_gd(texts, ys)
    assert np.allclose(w, w_ref, atol=1e-12)


def test_logreg_learns_separable_data(ray_session):
    from ics_search_engine_ray.stages.classifier import (featurize,
                                                         predict_logreg,
                                                         train_logreg)
    docs, texts, ys = _mk_docs()
    feats = featurize(
        docs, lambda b: b.column("y").to_numpy(zero_copy_only=False))
    feats = feats.materialize()
    w = train_logreg(feats, n_features=64, iters=50, lr=5.0)
    preds = {r["doc_id"]: r["pred"]
             for r in predict_logreg(feats, w).take_all()}
    acc = np.mean([preds[i] == int(ys[i]) for i in range(len(ys))])
    assert acc >= 0.95, acc


def test_train_logreg_batch_layout_invariant(ray_session):
    from ics_search_engine_ray.stages.classifier import (featurize,
                                                         train_logreg)
    docs, _, _ = _mk_docs()
    lbl = lambda b: b.column("y").to_numpy(zero_copy_only=False)
    w1 = train_logreg(featurize(docs, lbl), n_features=64, iters=3)
    w2 = train_logreg(featurize(docs.repartition(11), lbl),
                      n_features=64, iters=3)
    assert np.allclose(w1, w2, atol=1e-12)


def test_featurize_drops_tokenless_docs(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.classifier import featurize
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["", "hello world"]),
        "y": pa.array([0.0, 1.0], pa.float64())}))
    rows = featurize(
        docs, lambda b: b.column("y").to_numpy(zero_copy_only=False)
    ).take_all()
    assert [r["doc_id"] for r in rows] == [2]
    x = np.asarray(rows[0]["x"])
    assert x[-1] == 1.0 and abs(x[:-1].sum() - 1.0) < 1e-12


def test_nb_lang_learns_separable_vocab(ray_session):
    """Two languages with disjoint vocabularies: the trained model must
    classify every training doc correctly (NB is exact on disjoint
    support), and token-less docs fall back to the majority prior."""
    import ray.data as rd
    from ics_search_engine_ray.stages.classifier import nb_lang_scores
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "lang": pa.array(["aa", "aa", "aa", "zz", "zz", "xx"],
                         pa.string()),
        "text": pa.array(["alpha apple", "apple arrow", "alpha alpha",
                          "zebra zonal", "zonal zooms", ""],
                         pa.string())})
    rows = {r["doc_id"]: r for r in
            nb_lang_scores(rd.from_arrow(t).repartition(3)).take_all()}
    assert [rows[i]["lang_pred"] for i in (1, 2, 3)] == ["aa"] * 3
    assert [rows[i]["lang_pred"] for i in (4, 5)] == ["zz"] * 2
    # doc 6 has no tokens: argmax prior = 'aa' (3/6 docs)
    assert rows[6]["lang_pred"] == "aa"


def test_nb_lang_matches_duckdb(ray_session, sf_dir):
    import duckdb
    from ics_search_engine_ray.stages.classifier import (
        nb_lang_scores, nb_lang_sql)
    import ray.data as rd
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    got = [(r["doc_id"], r["lang_pred"], r["score"])
           for r in nb_lang_scores(docs).take_all()]
    cte = ("SELECT doc_id, unnest(list_filter(regexp_extract_all("
           "lower(text), '[a-z0-9]+'), x -> length(x) > 1)) AS term "
           f"FROM '{sf_dir}/documents.parquet'")
    sql = nb_lang_sql(cte).replace(
        "FROM documents", f"FROM '{sf_dir}/documents.parquet'").replace(
        "JOIN documents", f"JOIN '{sf_dir}/documents.parquet'")
    want = [tuple(r) for r in duckdb.sql(sql).fetchall()]
    assert got == want and len(got) > 0


def test_nb_lang_vocab_gate_raises(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.classifier import nb_lang_scores
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "lang": pa.array(["aa", "zz"], pa.string()),
        "text": pa.array(["alpha beta gamma", "delta epsilon"],
                         pa.string())})
    with pytest.raises(ValueError, match="model gate"):
        nb_lang_scores(rd.from_arrow(t), vocab_gate=2)
