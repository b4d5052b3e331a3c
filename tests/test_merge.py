"""Incremental index merge (pipelines/merge.py): merging per-slice indexes
must produce the same search results as a from-scratch build over the union
— including cross-slice near-dedup and merged global stats."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ics_search_engine_ray.config import DEFAULT_CONFIG
from ics_search_engine_ray.query.engine import SearchIndex

QUERIES = ["spark merge", "w010 w020 w030", "zonly1 zonly2", "the a w005"]


def _write_texts(path, rows):
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
    }), path)


@pytest.fixture(scope="module")
def slices(ray_session, tmp_path_factory):
    rng = np.random.default_rng(11)
    words = [f"w{i:03d}" for i in range(150)]
    mk = lambda n: " ".join(rng.choice(words, size=n).tolist())
    rows_a = [(i, f"spark merge {mk(25)}") for i in range(0, 120)]
    rows_b = [(i, f"zonly1 zonly2 {mk(25)}") for i in range(200, 320)]
    # overlap: 10 docs present in BOTH slices with identical id+text
    shared = [(500 + i, f"shared doc {mk(20)}") for i in range(10)]
    rows_a += shared
    rows_b += shared
    d = tmp_path_factory.mktemp("slices")
    pa_path, pb_path = str(d / "a.parquet"), str(d / "b.parquet")
    _write_texts(pa_path, rows_a)
    _write_texts(pb_path, rows_b)
    union_path = str(d / "u.parquet")
    seen = {}
    for i, t in rows_a + rows_b:
        seen.setdefault(i, t)
    _write_texts(union_path, sorted(seen.items()))
    return pa_path, pb_path, union_path, str(d)


def test_merge_equals_scratch_build(slices):
    from ics_search_engine_ray.pipelines.build import build_index_from_texts
    from ics_search_engine_ray.pipelines.merge import merge_indexes

    pa_path, pb_path, union_path, d = slices
    cfg = DEFAULT_CONFIG.with_(stem=False, num_index_partitions=8)
    out_a, out_b = os.path.join(d, "ia"), os.path.join(d, "ib")
    out_m, out_u = os.path.join(d, "im"), os.path.join(d, "iu")
    build_index_from_texts(pa_path, out_a, cfg, skip_dedup=True)
    build_index_from_texts(pb_path, out_b, cfg, skip_dedup=True)
    build_index_from_texts(union_path, out_u, cfg, skip_dedup=True)

    man = merge_indexes([out_a, out_b], out_m, cfg, near_dedup=False)
    si_m, si_u = SearchIndex(out_m), SearchIndex(out_u)
    assert si_m.num_docs == si_u.num_docs == 250     # 120 + 120 + 10 shared
    assert si_m.avgdl == pytest.approx(si_u.avgdl)
    # per-term postings identical (df, docs, tf) for a spread of terms
    for t in ("spark", "zonly1", "shared", "w010", "the"):
        tp_m, tp_u = si_m.term_postings(t), si_u.term_postings(t)
        if tp_u is None:
            assert tp_m is None
            continue
        assert tp_m.df == tp_u.df, t
        assert np.array_equal(tp_m.doc_ids, tp_u.doc_ids), t
        assert np.array_equal(tp_m.tf, tp_u.tf), t
        assert np.array_equal(tp_m.doclen, tp_u.doclen), t
    # search parity
    for q in QUERIES:
        rm = [(r.doc_id, round(r.score, 10)) for r in si_m.search(q, k=10)]
        ru = [(r.doc_id, round(r.score, 10)) for r in si_u.search(q, k=10)]
        assert rm == ru, q


def test_merge_cross_corpus_near_dedup(slices, tmp_path):
    """Near-identical docs split across slices are deduped at merge time."""
    from ics_search_engine_ray.pipelines.build import build_index
    from ics_search_engine_ray.pipelines.merge import merge_indexes

    base = ("data engine pipeline " * 30).strip()
    near = base + " tail"
    # slice A holds the original, slice B a near-duplicate under another url
    pages_a = str(tmp_path / "pa")
    pages_b = str(tmp_path / "pb")
    for path, url, text in ((pages_a, "https://s.test/orig", base),
                            (pages_b, "https://s.test/copy", near)):
        html = f"<html><body><p>{text}</p></body></html>".encode()
        filler = (f"<p>completely different {url[-4:]} words appear here "
                  f"nothing alike {url[-4:] * 3}</p>").encode()
        os.makedirs(path, exist_ok=True)
        pq.write_table(pa.table({"url": [url, "https://s.test/other" + url[-4:]],
                                 "html": [html, filler]}),
                       os.path.join(path, "part-0.parquet"))
    out_a, out_b = str(tmp_path / "ia"), str(tmp_path / "ib")
    cfg = DEFAULT_CONFIG.with_(num_index_partitions=4)
    build_index(pages_a, out_a, cfg)
    build_index(pages_b, out_b, cfg)
    assert SearchIndex(out_a).num_docs == 2
    assert SearchIndex(out_b).num_docs == 2

    out_m = str(tmp_path / "im")
    merge_indexes([out_a, out_b], out_m, cfg, near_dedup=True)
    si = SearchIndex(out_m)
    # one of orig/copy dropped by the cross-corpus near-dedup
    assert si.num_docs == 3
    urls = {r.url for r in si.search("data engine pipeline", k=5)}
    assert len(urls & {"https://s.test/orig", "https://s.test/copy"}) == 1
