"""Tombstone deletions (query/engine.py delete_docs + load_tombstones):
deleted docs vanish from EVERY query path immediately (BM25 TAAT/WAND,
phrase, boolean, sharded actors), top-k refills from survivors, and
merge compacts tombstones so the result equals a scratch build without
the deleted docs."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ics_search_engine_ray.config import DEFAULT_CONFIG
from ics_search_engine_ray.query.engine import (SearchIndex, delete_docs,
                                                load_tombstones)


def _write_texts(path, rows):
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
    }), path)


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    rng = np.random.default_rng(23)
    words = [f"w{i:03d}" for i in range(80)]
    mk = lambda n: " ".join(rng.choice(words, size=n).tolist())
    rows = [(i, f"alpha beta {mk(20)}") for i in range(40)]
    rows += [(100 + i, f"alpha {mk(20)}") for i in range(40)]
    d = tmp_path_factory.mktemp("del")
    p = str(d / "docs.parquet")
    _write_texts(p, rows)
    from ics_search_engine_ray.pipelines.build import build_index_from_texts
    cfg = DEFAULT_CONFIG.with_(stem=False, num_index_partitions=4)
    out = os.path.join(str(d), "idx")
    build_index_from_texts(p, out, cfg, skip_dedup=True)
    return out, p, str(d), rows


def test_delete_excludes_from_all_paths(built):
    out, _, _, _ = built
    si = SearchIndex(out)
    top = si.search("alpha beta", k=5, scorer="bm25")
    victim = top[0].doc_id
    survivors = [r.doc_id for r in top[1:]]
    n = delete_docs(out, doc_ids=[victim])
    assert n == 1
    si2 = SearchIndex(out)               # fresh load sees tombstones
    for algo in ("taat", "wand"):
        got = [r.doc_id for r in si2.search("alpha beta", k=5,
                                            scorer="bm25", algo=algo)]
        assert victim not in got
        # top-k refills: previous survivors shift up
        assert got[:len(survivors)] == survivors
    # phrase + boolean paths
    ph = si2.phrase_match("alpha beta")
    assert victim not in ph and len(ph) > 0
    bo = [r.doc_id for r in si2.search_boolean("+alpha +beta", k=50)]
    assert victim not in bo and len(bo) > 0
    # tfidf-ref path
    tr = [r.doc_id for r in si2.search("alpha beta", k=50,
                                       scorer="tfidf-ref")]
    assert victim not in tr and len(tr) > 0


def test_delete_by_url_and_idempotent(built):
    out, _, _, _ = built
    si = SearchIndex(out)
    # resolve some url from the docmeta of a live doc
    t = pq.read_table(os.path.join(out, "docmeta"),
                      columns=["doc_id", "url"])
    url0 = t.column("url")[0].as_py()
    id0 = t.column("doc_id")[0].as_py()
    before = load_tombstones(out).size
    total = delete_docs(out, urls=[url0])
    assert total >= before
    assert id0 in set(load_tombstones(out).tolist())
    # idempotent
    assert delete_docs(out, urls=[url0]) == total


def test_sharded_actors_see_tombstones(built):
    out, _, _, _ = built
    from ics_search_engine_ray.query.actors import ShardedSearchIndex

    dead = set(load_tombstones(out).tolist())
    assert dead                          # prior tests tombstoned docs
    pool = ShardedSearchIndex(out, num_actors=2)
    try:
        got = [r.doc_id for r in pool.search("alpha beta", 50)]
        assert not (set(got) & dead)
        # parity with the local path under tombstones
        local = [r.doc_id for r in SearchIndex(out).search(
            "alpha beta", k=50, scorer="bm25")]
        assert got == local
    finally:
        pool.shutdown()


def test_merge_compacts_tombstones(built, tmp_path_factory):
    from ics_search_engine_ray.pipelines.build import build_index_from_texts
    from ics_search_engine_ray.pipelines.merge import merge_indexes

    out, p, d, rows = built
    dead = set(load_tombstones(out).tolist())
    assert dead
    # scratch build over the corpus WITHOUT the deleted docs
    d2 = tmp_path_factory.mktemp("delcmp")
    p2 = str(d2 / "docs2.parquet")
    _write_texts(p2, [r for r in rows if r[0] not in dead])
    cfg = DEFAULT_CONFIG.with_(stem=False, num_index_partitions=4)
    out_ref = os.path.join(str(d2), "idx_ref")
    build_index_from_texts(p2, out_ref, cfg, skip_dedup=True)
    # compaction = merge of the single tombstoned index
    out_c = os.path.join(str(d2), "idx_compact")
    merge_indexes([out], out_c, cfg, near_dedup=False)
    si_c, si_r = SearchIndex(out_c), SearchIndex(out_ref)
    assert not os.path.exists(os.path.join(out_c, "tombstones.json"))
    assert si_c.num_docs == si_r.num_docs
    assert si_c.avgdl == pytest.approx(si_r.avgdl)
    for q in ("alpha beta", "alpha w010"):
        a = [(r.doc_id, round(r.score, 9))
             for r in si_c.search(q, k=20, scorer="bm25")]
        b = [(r.doc_id, round(r.score, 9))
             for r in si_r.search(q, k=20, scorer="bm25")]
        assert a == b, q


def test_explain_reports_plan_and_tombstones(built):
    out, _, _, _ = built
    si = SearchIndex(out)
    ex = si.explain("alpha beta", k=3)
    assert ex["terms"] == ["alpha", "beta"]
    assert ex["algo_auto"] in ("taat", "wand", "wand_lazy")
    assert ex["tombstones"] == load_tombstones(out).size > 0
    per = {p["term"]: p for p in ex["per_term"]}
    assert per["alpha"]["df"] >= per["alpha"]["postings_after_tombstones"]
    assert len(ex["topk"]) == 3
    dead = set(load_tombstones(out).tolist())
    assert not ({r["doc_id"] for r in ex["topk"]} & dead)
