"""Dense doc_id build option (config.docid_mode="dense", stages/docid.py):
same corpus built with hash ids and dense sorted-url-rank ids must be
rank- AND score-identical on every query path, while the dense segments
must be strictly smaller (posting doc-id gaps shrink from ~2^63/N to ~P,
so delta+varint encoding wins; r4 verdict item 6)."""

import glob
import os

import pytest

from ics_search_engine_ray.config import DEFAULT_CONFIG

QUERIES = [
    "spark batch merge",
    "fast join the order",
    "tok5r0x1",
    "value stream big table hash sort filter",
]


def _seg_bytes(index_dir: str) -> int:
    return sum(os.path.getsize(p)
               for p in glob.glob(os.path.join(index_dir, "segments", "*"))
               if os.path.isfile(p))


@pytest.fixture(scope="module")
def both_modes(ray_session, sf_dir, tmp_path_factory):
    from ics_search_engine_ray.sources.pages import generate_pages
    from ics_search_engine_ray.pipelines.build import build_index

    pages_dir = generate_pages(sf_dir)
    d = tmp_path_factory.mktemp("dense")
    idx_h = os.path.join(str(d), "hash")
    idx_d = os.path.join(str(d), "dense")
    build_index(pages_dir, idx_h, DEFAULT_CONFIG)
    build_index(pages_dir, idx_d, DEFAULT_CONFIG.with_(docid_mode="dense"))
    return idx_h, idx_d


def test_dense_rank_and_score_identical(both_modes):
    from ics_search_engine_ray.query.engine import SearchIndex

    idx_h, idx_d = both_modes
    sh, sd = SearchIndex(idx_h), SearchIndex(idx_d)
    assert sh.num_docs == sd.num_docs
    assert sh.avgdl == pytest.approx(sd.avgdl)
    for q in QUERIES:
        for algo in ("taat", "wand"):
            rh = [(r.url, round(r.score, 9))
                  for r in sh.search(q, k=15, algo=algo)]
            rd_ = [(r.url, round(r.score, 9))
                   for r in sd.search(q, k=15, algo=algo)]
            assert rh == rd_, f"query={q!r} algo={algo}"


def test_dense_ids_are_dense_and_segments_smaller(both_modes):
    import pyarrow.parquet as pq

    idx_h, idx_d = both_modes
    t = pq.read_table(os.path.join(idx_d, "docmeta"), columns=["doc_id"])
    ids = sorted(t.column("doc_id").to_pylist())
    # dense rank over the tokenized relation (pre-dedup-drop), so ids are
    # a subset of 0..N_tok-1 — tiny compared to 63-bit hashes
    assert ids[0] >= 0 and ids[-1] < 4 * len(ids)
    bh, bd = _seg_bytes(idx_h), _seg_bytes(idx_d)
    assert bd < bh, f"dense segments {bd} should beat hash {bh}"


def test_dense_phrase_and_delete(both_modes):
    from ics_search_engine_ray.query.engine import SearchIndex, delete_docs

    _, idx_d = both_modes
    si = SearchIndex(idx_d)
    res = si.search("spark batch merge", k=5)
    assert res
    # tombstone the top hit by url; it must vanish from results
    top_url = res[0].url
    delete_docs(idx_d, urls=[top_url])
    si2 = SearchIndex(idx_d)
    assert all(r.url != top_url for r in si2.search("spark batch merge", k=5))
