"""Federated search (query/federated.py): querying two disjoint built
indexes through FederatedSearchIndex must be rank- AND score-identical
to querying the single index merge_indexes produces from them — the
global-stats-at-query-time property that naive per-index scoring
violates."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ics_search_engine_ray.config import DEFAULT_CONFIG
from ics_search_engine_ray.query.engine import SearchIndex, delete_docs
from ics_search_engine_ray.query.federated import FederatedSearchIndex

QUERIES = ["alpha beta", "alpha w010 w020", "gamma", "the alpha"]


def _write_texts(path, rows):
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
    }), path)


@pytest.fixture(scope="module")
def fleet(ray_session, tmp_path_factory):
    from ics_search_engine_ray.pipelines.build import build_index_from_texts
    from ics_search_engine_ray.pipelines.merge import merge_indexes

    rng = np.random.default_rng(31)
    words = [f"w{i:03d}" for i in range(90)]
    mk = lambda n: " ".join(rng.choice(words, size=n).tolist())
    rows_a = [(i, f"alpha {mk(18)}") for i in range(60)]
    rows_b = [(1000 + i, f"alpha beta gamma {mk(18)}") for i in range(60)]
    d = tmp_path_factory.mktemp("fed")
    pa_p, pb_p = str(d / "a.parquet"), str(d / "b.parquet")
    _write_texts(pa_p, rows_a)
    _write_texts(pb_p, rows_b)
    cfg = DEFAULT_CONFIG.with_(stem=False, num_index_partitions=4)
    ia, ib = os.path.join(str(d), "ia"), os.path.join(str(d), "ib")
    im = os.path.join(str(d), "im")
    build_index_from_texts(pa_p, ia, cfg, skip_dedup=True)
    build_index_from_texts(pb_p, ib, cfg, skip_dedup=True)
    merge_indexes([ia, ib], im, cfg, near_dedup=False)
    return ia, ib, im


def test_federated_equals_merged(fleet):
    ia, ib, im = fleet
    fed = FederatedSearchIndex([ia, ib])
    si = SearchIndex(im)
    assert fed.num_docs == si.num_docs
    assert fed.avgdl == pytest.approx(si.avgdl)
    for q in QUERIES:
        for algo in ("taat", "wand"):
            a = [(r.doc_id, round(r.score, 9))
                 for r in fed.search(q, k=25, algo=algo)]
            b = [(r.doc_id, round(r.score, 9))
                 for r in si.search(q, k=25, scorer="bm25", algo=algo)]
            assert a == b, (q, algo)
    # urls resolve through candidate-only filtered reads
    r0 = fed.search("alpha beta", k=3)[0]
    assert r0.url


def test_federated_naive_would_differ(fleet):
    """Sanity that the parity test can actually FAIL a naive
    implementation: each member's local df for 'alpha' (present in
    both) differs from the merged index's GLOBAL df, so per-index
    scoring would produce different BM25 scores than the merged truth
    the parity test pins."""
    ia, ib, im = fleet
    a, b, m = SearchIndex(ia), SearchIndex(ib), SearchIndex(im)
    ta, tb, tm = (a.term_postings("alpha"), b.term_postings("alpha"),
                  m.term_postings("alpha"))
    assert ta is not None and tb is not None and tm is not None
    assert tm.df == ta.df + tb.df          # global = sum of members
    assert ta.df < tm.df and tb.df < tm.df  # a member alone is wrong


def test_federated_respects_member_tombstones(fleet):
    ia, ib, _ = fleet
    fed = FederatedSearchIndex([ia, ib])
    victim = fed.search("alpha beta", k=1)[0].doc_id
    # victim lives in index b (doc_ids >= 1000)
    delete_docs(ib if victim >= 1000 else ia, doc_ids=[victim])
    fed2 = FederatedSearchIndex([ia, ib])
    got = [r.doc_id for r in fed2.search("alpha beta", k=30)]
    assert victim not in got and got


def test_federated_rejects_overlap_above_gate(fleet):
    ia, _, _ = fleet
    # above the overlap gate the old disjointness contract applies
    fed = FederatedSearchIndex([ia, ia], overlap_doc_gate=0)
    with pytest.raises(ValueError, match="share doc_ids"):
        fed.search("alpha", k=5)


def test_federated_total_overlap_equals_single(fleet):
    """[ia, ia] (100% shared) must behave exactly like ia alone."""
    ia, _, _ = fleet
    fed = FederatedSearchIndex([ia, ia])
    si = SearchIndex(ia)
    assert fed.overlap_ok and fed.n_shared_docs == si.num_docs
    assert fed.num_docs == si.num_docs
    assert fed.avgdl == pytest.approx(si.avgdl)
    for algo in ("taat", "wand"):
        a = [(r.doc_id, round(r.score, 9))
             for r in fed.search("alpha w010", k=25, algo=algo)]
        b = [(r.doc_id, round(r.score, 9))
             for r in si.search("alpha w010", k=25, scorer="bm25",
                                algo=algo)]
        assert a == b


def test_federated_partial_overlap_equals_deduped_merged(
        ray_session, tmp_path_factory):
    """The recrawl-shard case (round-5 verdict item 7): two members
    sharing ~10% of docs (same doc_id, same content) must be rank- and
    score-identical to the deduped index merge_indexes builds."""
    from ics_search_engine_ray.pipelines.build import build_index_from_texts
    from ics_search_engine_ray.pipelines.merge import merge_indexes

    rng = np.random.default_rng(47)
    words = [f"w{i:03d}" for i in range(90)]
    mk = lambda n: " ".join(rng.choice(words, size=n).tolist())
    rows_a = [(i, f"alpha {mk(18)}") for i in range(60)]
    rows_b = [(1000 + i, f"alpha beta gamma {mk(18)}") for i in range(54)]
    rows_b += rows_a[:6]                        # 10% of a recrawled into b
    d = tmp_path_factory.mktemp("fedov")
    pa_p, pb_p = str(d / "a.parquet"), str(d / "b.parquet")
    _write_texts(pa_p, rows_a)
    _write_texts(pb_p, rows_b)
    cfg = DEFAULT_CONFIG.with_(stem=False, num_index_partitions=4)
    ia, ib = os.path.join(str(d), "ia"), os.path.join(str(d), "ib")
    im = os.path.join(str(d), "im")
    build_index_from_texts(pa_p, ia, cfg, skip_dedup=True)
    build_index_from_texts(pb_p, ib, cfg, skip_dedup=True)
    merge_indexes([ia, ib], im, cfg, near_dedup=False)

    fed = FederatedSearchIndex([ia, ib])
    si = SearchIndex(im)
    assert fed.overlap_ok and fed.n_shared_docs == 6
    assert fed.num_docs == si.num_docs
    assert fed.avgdl == pytest.approx(si.avgdl)
    for q in QUERIES:
        for algo in ("taat", "wand"):
            a = [(r.doc_id, round(r.score, 9))
                 for r in fed.search(q, k=30, algo=algo)]
            b = [(r.doc_id, round(r.score, 9))
                 for r in si.search(q, k=30, scorer="bm25", algo=algo)]
            assert a == b, (q, algo)
    # shared docs resolve meta through the first member
    r0 = fed.search("alpha", k=3)[0]
    assert r0.url
