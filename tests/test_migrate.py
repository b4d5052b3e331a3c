"""Migration of reference-layout JSON artifacts into our index format
(SURVEY §2 S10). Fixture is a hand-built miniature of the reference's
full_analytics/ layout (utils/index_generator.py, indexer.py:119-150)."""

import json

import numpy as np
import pytest

from ics_search_engine_ray.config import DEFAULT_CONFIG
from ics_search_engine_ray.index.scoring import bm25_scores


@pytest.fixture()
def ref_dir(tmp_path):
    """3-term, 4-doc reference index: postings are (doc_id, freq, importance,
    tf_idf, positions) tuples; documents keyed by stringified doc_id."""
    docs = {
        "0": {"url": "https://a.test/0", "simhash": "01" * 64,
              "token_count": 10, "outgoing_links": ["https://a.test/1"]},
        "1": {"url": "https://a.test/1", "simhash": "10" * 64,
              "token_count": 20, "outgoing_links": []},
        "2": {"url": "https://a.test/2#frag", "simhash": "0" * 128,
              "token_count": 5, "outgoing_links": ["http://x.ext/"]},
        "3": {"url": "https://a.test/3", "simhash": "1" * 128,
              "token_count": 8, "outgoing_links": []},
    }
    index = {
        "spark": [[0, 3, 2.0, 0.9, [1, 4, 7]], [2, 1, 0.0, 0.3, [0]]],
        "merg":  [[1, 2, 0.5, 0.5, [3, 9]], [3, 1, 0.0, 0.2, [2]]],
        "rare":  [[3, 5, 1.5, 1.1, [0, 1, 2, 3, 4]]],
    }
    link_scores = {
        "https://a.test/0": {"hits": {"authority": 0.1, "hub": 0.4}, "pagerank": 2.5},
        "https://a.test/1": {"hits": {"authority": 0.6, "hub": 0.0}, "pagerank": 1.0},
    }
    d = tmp_path / "full_analytics"
    d.mkdir()
    (d / "documents.json").write_text(json.dumps(docs))
    (d / "index.json").write_text(json.dumps(index))
    (d / "link_scores.json").write_text(json.dumps(link_scores))
    return str(d)


def test_migrate_reference_index_end_to_end(ray_session, ref_dir, tmp_path):
    from ics_search_engine_ray.pipelines.migrate import migrate_reference_index
    from ics_search_engine_ray.query.engine import SearchIndex

    out = str(tmp_path / "idx")
    cfg = DEFAULT_CONFIG.with_(num_index_partitions=4)
    man = migrate_reference_index(ref_dir, out, cfg)
    assert man["num_docs"] == 4
    assert man["avgdl"] == pytest.approx((10 + 20 + 5 + 8) / 4)

    si = SearchIndex(out)
    # postings round-trip: tf/importance/doclen/positions preserved
    tp = si.term_postings("spark", with_positions=True)
    assert tp.doc_ids.tolist() == [0, 2]
    assert tp.tf.tolist() == [3, 1]
    assert tp.importance.tolist() == [2.0, 0.0]
    assert tp.doclen.tolist() == [10, 5]
    assert [p.tolist() for p in tp.positions] == [[1, 4, 7], [0]]
    # BM25 search over the migrated index matches hand-computed scores
    res = si.search("spark", k=5)
    want = bm25_scores(np.array([3, 1]), np.array([2.0, 0.0]),
                       np.array([10, 5]), 2.0, 4, 43 / 4,
                       cfg.bm25_k1, cfg.bm25_b)
    by_doc = {r.doc_id: r.score for r in res}
    assert by_doc[0] == pytest.approx(float(want[0]), rel=1e-9)
    assert by_doc[2] == pytest.approx(float(want[1]), rel=1e-9)
    # urls defragged at render, link scores migrated
    res2 = si.search("spark rare", k=5)
    assert all("#" not in r.url for r in res2)
    ls = si.link_scores()
    assert ls["https://a.test/0"] == (0.1, 0.4, 2.5)
    # tfidf-ref scorer runs over migrated link signals
    ref = si.search("spark", k=5, scorer="tfidf-ref")
    assert ref and all(r.score > 0 for r in ref)
