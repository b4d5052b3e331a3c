"""End-to-end build + query tests with an independent brute-force oracle
(SURVEY.md §5 items 3-4: golden top-k, determinism across physical layouts,
resume)."""

import glob
import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from ics_search_engine_ray.config import DEFAULT_CONFIG, head_terms
from ics_search_engine_ray.index.scoring import bm25_scores
from ics_search_engine_ray.query.engine import SearchIndex

QUERIES = [
    "spark batch merge",
    "fast join the order",
    "machine learning",          # reference query wording; mostly absent terms
    "tok5r0x1",                  # doc-specific rare token
    "scan scan scan window",     # repeated query term
    "the a of with",             # all stopwords -> empty
    "q",                         # single char -> dropped
    "value stream big table hash sort filter",
]


@pytest.fixture(scope="session")
def built_index(ray_session, sf_dir, tmp_path_factory):
    from ics_search_engine_ray.sources.pages import generate_pages
    from ics_search_engine_ray.pipelines.build import build_index

    pages_dir = generate_pages(sf_dir)
    out = str(tmp_path_factory.mktemp("index_main"))
    res = build_index(pages_dir, out, DEFAULT_CONFIG)
    return pages_dir, out, res


@pytest.fixture(scope="session")
def oracle(built_index):
    """Brute-force in-memory oracle built from the tokenized checkpoint."""
    _, out, _ = built_index
    tok = pq.read_table(os.path.join(out, "docs_tokenized"),
                        columns=["doc_id", "url", "terms", "tfs", "imps", "token_count"])
    with open(os.path.join(out, "dedup.json")) as f:
        dropped = set(json.load(f)["dropped"])
    docs = {}
    for did, url, terms, tfs, imps, tc in zip(
            tok.column("doc_id").to_pylist(), tok.column("url").to_pylist(),
            tok.column("terms").to_pylist(), tok.column("tfs").to_pylist(),
            tok.column("imps").to_pylist(), tok.column("token_count").to_pylist()):
        if did in dropped:
            continue
        docs[did] = (url, dict(zip(terms, zip(tfs, imps))), tc)
    df = {}
    for _, tmap, _ in docs.values():
        for t in tmap:
            df[t] = df.get(t, 0) + 1
    N = len(docs)
    avgdl = sum(tc for _, _, tc in docs.values()) / N
    return docs, df, N, avgdl


def brute_topk(oracle, terms, k=10):
    docs, df, N, avgdl = oracle
    qtf = {}
    for t in terms:
        qtf[t] = qtf.get(t, 0) + 1
    scores = []
    for did, (url, tmap, dl) in docs.items():
        s = 0.0
        for t, cnt in qtf.items():
            if t in tmap:
                tf, imp = tmap[t]
                s += cnt * float(bm25_scores(
                    np.array([tf]), np.array([imp]), np.array([dl]),
                    float(df[t]), N, avgdl,
                    DEFAULT_CONFIG.bm25_k1, DEFAULT_CONFIG.bm25_b)[0])
        if s != 0.0:
            scores.append((did, s))
    scores.sort(key=lambda x: (-x[1], x[0]))
    return scores[:k]


def test_build_stats(built_index):
    _, _, res = built_index
    assert res.num_docs > 300
    assert res.avgdl > 10
    assert sum(r["num_postings"] for r in res.manifest) > 5000
    assert all(r["status"] == "complete" for r in res.manifest)


def test_df_consistency(built_index, oracle):
    _, out, _ = built_index
    si = SearchIndex(out)
    docs, df, N, avgdl = oracle
    assert si.num_docs == N
    assert abs(si.avgdl - avgdl) < 1e-6
    for term in ["spark", "merg", "the", "valu", "tok5r0x1"]:
        tp = si.term_postings(term)
        if term not in df:
            assert tp is None
            continue
        assert tp is not None
        assert tp.df == df[term], term
        assert tp.doc_ids.size == df[term]
        assert np.all(np.diff(tp.doc_ids) > 0)  # sorted unique


def test_postings_roundtrip_values(built_index, oracle):
    _, out, _ = built_index
    si = SearchIndex(out)
    docs, df, N, avgdl = oracle
    for term in ["spark", "the", "order"]:
        tp = si.term_postings(term, with_positions=True)
        for i in range(0, tp.doc_ids.size, max(1, tp.doc_ids.size // 7)):
            did = int(tp.doc_ids[i])
            url, tmap, dl = docs[did]
            tf, imp = tmap[term]
            assert tp.tf[i] == tf
            assert abs(tp.importance[i] - imp) < 1e-6
            assert tp.doclen[i] == dl
            assert np.all(np.diff(tp.positions[i]) > 0) if tp.positions[i].size > 1 else True


@pytest.mark.parametrize("query", QUERIES)
def test_bm25_matches_bruteforce(built_index, oracle, query):
    _, out, _ = built_index
    si = SearchIndex(out)
    terms = si.tokenize_query(query)
    expect = brute_topk(oracle, terms, k=10)
    got = si.search(query, k=10, scorer="bm25", algo="taat")
    assert [(r.doc_id,) for r in got] == [(d,) for d, _ in expect], query
    for r, (d, s) in zip(got, expect):
        assert r.score == pytest.approx(s, rel=1e-9), query


@pytest.mark.parametrize("query", QUERIES)
def test_wand_equals_taat(built_index, query):
    _, out, _ = built_index
    si = SearchIndex(out)
    a = si.search(query, k=10, algo="taat")
    b = si.search(query, k=10, algo="wand")
    assert [(r.doc_id, round(r.score, 10)) for r in a] == \
           [(r.doc_id, round(r.score, 10)) for r in b], query


def test_matched_terms_and_defrag(built_index):
    _, out, _ = built_index
    si = SearchIndex(out)
    res = si.search("spark batch merge", k=5)
    assert res and all("#" not in r.url for r in res)
    assert all(set(r.matched_terms) <= {"spark", "batch", "merg"} for r in res)


def test_rank_identical_across_partitioning(built_index, tmp_path_factory):
    """north_rule determinism: a different physical layout (partition count,
    salt width) must produce rank-identical top-k with identical scores."""
    from ics_search_engine_ray.pipelines.build import build_index

    pages_dir, out, _ = built_index
    out2 = str(tmp_path_factory.mktemp("index_alt"))
    cfg2 = DEFAULT_CONFIG.with_(num_index_partitions=5, head_term_salt=2,
                                tokenize_batch_size=64)
    build_index(pages_dir, out2, cfg2)
    s1, s2 = SearchIndex(out), SearchIndex(out2)
    for q in QUERIES:
        r1 = [(r.doc_id, round(r.score, 10)) for r in s1.search(q, k=10)]
        r2 = [(r.doc_id, round(r.score, 10)) for r in s2.search(q, k=10)]
        assert r1 == r2, q


def test_resume_skips_done_and_rebuilds_missing(built_index, tmp_path_factory):
    from ics_search_engine_ray.pipelines.build import build_index

    pages_dir, out, _ = built_index
    out3 = str(tmp_path_factory.mktemp("index_resume"))
    # full build, then damage two partitions and resume
    res_a = build_index(pages_dir, out3, DEFAULT_CONFIG)
    seg_dir = os.path.join(out3, "segments")
    victims = [0, 7]
    before = {}
    for p in victims:
        base = os.path.join(seg_dir, f"part-{p:05d}")
        before[p] = open(base + ".seg", "rb").read()
        os.remove(base + ".done.json")
        os.remove(base + ".seg")
    kept_mtime = os.path.getmtime(os.path.join(seg_dir, "part-00003.seg"))
    res_b = build_index(pages_dir, out3, DEFAULT_CONFIG, resume=True)
    # untouched partition was not rewritten
    assert os.path.getmtime(os.path.join(seg_dir, "part-00003.seg")) == kept_mtime
    for p in victims:
        base = os.path.join(seg_dir, f"part-{p:05d}")
        assert os.path.exists(base + ".done.json")
        assert open(base + ".seg", "rb").read() == before[p]  # bit-identical rebuild
    # query results identical to the pristine index
    s1, s3 = SearchIndex(out), SearchIndex(out3)
    for q in QUERIES[:4]:
        assert [(r.doc_id, round(r.score, 10)) for r in s1.search(q)] == \
               [(r.doc_id, round(r.score, 10)) for r in s3.search(q)]


def test_tfidf_ref_scorer_shape(built_index):
    _, out, _ = built_index
    si = SearchIndex(out)
    res = si.search("spark batch merge", k=10, scorer="tfidf-ref")
    assert res
    # combined score components bounded: 0.2*tfidf + 0.2*cos + 0.6*boost + links
    assert all(r.score > 0 for r in res)
    assert all(r.matched_terms for r in res)
    # descending with deterministic tie-break
    for a, b in zip(res, res[1:]):
        assert (a.score, -a.doc_id) >= (b.score, -b.doc_id)


def test_sharded_actor_pool_matches_local_index(built_index):
    """VERDICT r1 item 7: N concurrent queries through the partition-sharded
    actor pool must return results identical to the local SearchIndex
    (doc_ids, scores, matched terms, urls, titles)."""
    from concurrent.futures import ThreadPoolExecutor
    from ics_search_engine_ray.query.actors import ShardedSearchIndex

    _, out, _ = built_index
    local = SearchIndex(out)
    pool = ShardedSearchIndex(out, num_actors=3)
    try:
        def run_one(q):
            return q, pool.search(q, k=10)
        with ThreadPoolExecutor(max_workers=6) as tp:
            results = list(tp.map(run_one, QUERIES * 2))
        for q, got in results:
            want = local.search(q, k=10)
            assert [(r.doc_id, r.score, sorted(r.matched_terms), r.url, r.title)
                    for r in got] == \
                   [(r.doc_id, r.score, sorted(r.matched_terms), r.url, r.title)
                    for r in want], q
    finally:
        pool.shutdown()


def test_search_results_carry_titles(built_index):
    _, out, _ = built_index
    si = SearchIndex(out)
    res = si.search("spark batch merge", k=5)
    assert res and any(r.title for r in res)


def test_dynamic_salting_of_corpus_hot_term(ray_session, tmp_path):
    """SURVEY §5 item 5 / VERDICT r1 item 8: a corpus-specific hot term (not
    a stopword) must be routed to the salt partitions by the dynamic df
    pre-pass, with postings and search results identical to an unsalted
    build."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ics_search_engine_ray.pipelines.build import build_index_from_texts, term_partition

    rng = np.random.default_rng(5)
    words = [f"w{i:03d}" for i in range(300)]
    texts = []
    for i in range(400):
        body = " ".join(rng.choice(words, size=30).tolist())
        # 'zebrahot' stuffed into 90% of docs -> df far above the 10% bar
        if i % 10 != 0:
            body = "zebrahot " + body + " zebrahot"
        texts.append(body)
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(range(400), pa.int64()),
                             "text": pa.array(texts)}), src)

    from ics_search_engine_ray.config import DEFAULT_CONFIG
    cfg_salted = DEFAULT_CONFIG.with_(stem=False, num_index_partitions=8,
                                      head_term_salt=4)
    cfg_plain = DEFAULT_CONFIG.with_(stem=False, num_index_partitions=8,
                                     head_term_salt=0, dynamic_salt_df_frac=0)
    out_s = str(tmp_path / "idx_salted")
    out_p = str(tmp_path / "idx_plain")
    build_index_from_texts(src, out_s, cfg_salted, skip_dedup=True)
    build_index_from_texts(src, out_p, cfg_plain, skip_dedup=True)

    s_salted, s_plain = SearchIndex(out_s), SearchIndex(out_p)
    # the hot term was dynamically salted: routed to salt partitions, with
    # its exact global df recorded
    assert "zebrahot" in s_salted.head_df
    assert s_salted.head_df["zebrahot"] == 360
    assert s_salted._parts_for_term("zebrahot") == [8, 9, 10, 11]
    # each salt partition holds a shard, none holds everything (no straggler)
    sizes = [s_salted._reader(p).postings("zebrahot").doc_ids.size
             for p in (8, 9, 10, 11)]
    assert sum(sizes) == 360 and max(sizes) < 360 and min(sizes) > 0
    # merged postings identical to the unsalted build
    tp_s = s_salted.term_postings("zebrahot")
    tp_p = s_plain.term_postings("zebrahot")
    assert tp_s.df == tp_p.df == 360
    assert np.array_equal(tp_s.doc_ids, tp_p.doc_ids)
    assert np.array_equal(tp_s.tf, tp_p.tf)
    # search results identical
    for q in ("zebrahot", "zebrahot w001 w002", "w005 w250"):
        rs = [(r.doc_id, round(r.score, 10)) for r in s_salted.search(q, k=10)]
        rp = [(r.doc_id, round(r.score, 10)) for r in s_plain.search(q, k=10)]
        assert rs == rp, q


def test_web_ui_serves_results(built_index):
    """Q7 surface: the stdlib web UI serves HTML + a JSON API with titles."""
    import json as _json
    import threading
    import urllib.request
    from ics_search_engine_ray.pipelines.webui import serve

    _, out, _ = built_index
    srv = serve(out, port=0)          # ephemeral port
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/?q=spark+batch+merge").read().decode()
        assert "results in" in page and "score" in page
        api = _json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api?q=spark+batch+merge&k=5").read())
        assert len(api) == 5
        assert all(r["url"] and "score" in r for r in api)
        assert any(r["title"] for r in api)
        # typo'd query -> no results + a "Did you mean" suggestion
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/?q=sprk").read().decode()
        assert "No results found" in page
        assert "Did you mean" in page and "spark" in page
        assert "scorer=bm25" in page   # suggestion links keep the scorer
        # boolean mode: +must -not operators through the API ('+' must be
        # %2B-encoded in a query string)
        from ics_search_engine_ray.query.engine import SearchIndex
        si = SearchIndex(out)
        want = si.search_boolean("+data query -merge", k=5)
        api = _json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api?q=%2Bdata+query+-merge&k=5"
            "&scorer=boolean").read())
        assert [(r["doc_id"], r["score"]) for r in api] == \
            [(r.doc_id, round(r.score, 6)) for r in want]
    finally:
        srv.shutdown()


def test_phrase_match_positions(ray_session, tmp_path):
    """Positional phrase query: consecutive index tokens, including the
    len-1-token-drop adjacency quirk and 3-term phrases."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ics_search_engine_ray.pipelines.build import build_index_from_texts

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha x beta"),              # 'x' dropped -> alpha/beta adjacent
        (3, "beta alpha"),                # wrong order
        (4, "alpha beta alpha beta gamma"),
        (5, "gamma alpha"),
    ]
    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                             "text": pa.array([r[1] for r in rows])}), src)
    out = str(tmp_path / "idx")
    build_index_from_texts(src, out, DEFAULT_CONFIG.with_(stem=False),
                           skip_dedup=True)
    si = SearchIndex(out)
    assert si.phrase_match("alpha beta") == [1, 2, 4]
    assert si.phrase_match("alpha beta gamma") == [1, 4]
    assert si.phrase_match("beta alpha") == [3, 4]
    assert si.phrase_match("gamma delta") == [1]
    assert si.phrase_match("delta gamma") == []
    assert si.phrase_match("missingterm beta") == []
    assert si.phrase_match("alpha") == [1, 2, 3, 4, 5]


@pytest.mark.parametrize("query", QUERIES)
def test_wand_lazy_equals_taat(built_index, query):
    """Block-skipping lazy WAND (mixed lazy + eager-salted cursors) must be
    result-identical to exhaustive TAAT."""
    _, out, _ = built_index
    si = SearchIndex(out)
    a = si.search(query, k=10, algo="taat")
    b = si.search(query, k=10, algo="wand_lazy")
    assert [(r.doc_id, round(r.score, 10), sorted(r.matched_terms), r.url, r.title)
            for r in a] == \
           [(r.doc_id, round(r.score, 10), sorted(r.matched_terms), r.url, r.title)
            for r in b], query


def test_wand_lazy_skips_blocks(ray_session, tmp_path):
    """The lazy path must actually SKIP block decodes: a selective query
    (rare high-scoring term + broad common term) over many small blocks
    decodes only a fraction of the common term's blocks."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ics_search_engine_ray.pipelines.build import build_index_from_texts

    rng = np.random.default_rng(9)
    rows = []
    for i in range(3000):
        # doclen grows with doc_id -> BM25 for 'common' decays across blocks,
        # so block maxima fall below theta after the first blocks (prunable)
        size = 5 + 3 * (i // 64)
        body = " ".join(rng.choice([f"w{j:03d}" for j in range(400)], size=size).tolist())
        text = f"common {body}"                  # 'common' in every doc
        if i == 2345:
            text = "needle " + text              # rare term, one doc
        rows.append((i, text))
    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                             "text": pa.array([r[1] for r in rows])}), src)
    out = str(tmp_path / "idx")
    cfg = DEFAULT_CONFIG.with_(stem=False, posting_block_size=64,
                               num_index_partitions=1, head_term_salt=0)
    build_index_from_texts(src, out, cfg, skip_dedup=True)
    si = SearchIndex(out, cfg=cfg)
    lazy = si.search("needle common", k=3, algo="wand_lazy")
    taat = si.search("needle common", k=3, algo="taat")
    assert [(r.doc_id, round(r.score, 10)) for r in lazy] == \
           [(r.doc_id, round(r.score, 10)) for r in taat]
    stats = si._reader(0).stats
    total_common_blocks = (3000 + 63) // 64
    # eager would decode all ~47 blocks of 'common'; lazy must prune most of
    # them (theta from the short-doc blocks dominates later block maxima)
    assert 0 < stats["blocks_decoded"] <= total_common_blocks // 3


def test_sharded_actor_pool_tfidf_ref_parity(built_index):
    """The sharded client must apply the FULL reference combined scorer
    (tfidf + cosine quirk + term boost + link signals), not raw tfidf sums."""
    from ics_search_engine_ray.query.actors import ShardedSearchIndex

    _, out, _ = built_index
    local = SearchIndex(out)
    pool = ShardedSearchIndex(out, num_actors=2)
    try:
        for q in ("spark batch merge", "fast join the order"):
            got = pool.search(q, k=10, scorer="tfidf-ref")
            want = local.search(q, k=10, scorer="tfidf-ref")
            assert [(r.doc_id, round(r.score, 10), sorted(r.matched_terms), r.url)
                    for r in got] == \
                   [(r.doc_id, round(r.score, 10), sorted(r.matched_terms), r.url)
                    for r in want], q
    finally:
        pool.shutdown()


def test_wand_lazy_falls_back_on_bm25_param_override(built_index):
    """A runtime k1/b override invalidates the STORED block maxima; the lazy
    path must fall back to eager bound recomputation and still match TAAT."""
    _, out, _ = built_index
    si = SearchIndex(out, cfg=DEFAULT_CONFIG.with_(bm25_k1=3.0, bm25_b=0.5))
    for q in ("spark batch merge", "value stream big table hash sort filter"):
        a = si.search(q, k=10, algo="taat")
        b = si.search(q, k=10, algo="wand_lazy")
        assert [(r.doc_id, round(r.score, 10)) for r in a] == \
               [(r.doc_id, round(r.score, 10)) for r in b], q
    # and the stored-param index still skips (sanity that the guard is
    # comparing, not always falling back)
    si2 = SearchIndex(out)
    r1 = si2.search("spark batch merge", k=10, algo="wand_lazy")
    assert r1


def test_suggest_edit_distance_one(built_index, oracle):
    """SymSpell suggestions: typo'd vocab terms come back with exact dfs,
    ranked df-desc; exact in-vocab terms rank themselves; unknown-shaped
    words with no ed<=1 neighbor return nothing."""
    from ics_search_engine_ray.query.engine import SearchIndex
    from ics_search_engine_ray.stages.strings import _ed_le1
    _, out, _ = built_index
    si = SearchIndex(out)
    docs, df, _, _ = oracle

    # pick a reasonably frequent stemmed vocab term of length >= 5
    term = max((t for t in df if len(t) >= 5 and t.isalpha()),
               key=lambda t: df[t])
    typo = term[:2] + term[3:]                  # one deletion
    got = si.suggest(typo, n=5)
    assert got, f"no suggestion for {typo!r} (from {term!r})"
    assert all(c == typo or _ed_le1(typo, c) for c, _ in got)
    assert (term, df[term]) in got
    # ranked by (-df, term)
    assert got == sorted(got, key=lambda x: (-x[1], x[0]))
    # an exact vocabulary word suggests itself first when it's the top df
    got_exact = si.suggest(term, n=5)
    assert got_exact[0][0] == term or df[got_exact[0][0]] >= df[term]
    assert si.suggest("zzqqxxv") == []
    si.close()


def test_verify_index_fsck(built_index, tmp_path):
    """`verify` CLI: a healthy index passes; a tampered manifest fails."""
    import shutil
    from ics_search_engine_ray.pipelines.cli import main as cli_main
    _, out, _ = built_index
    assert cli_main(["verify", "--index", out]) == 0

    bad = str(tmp_path / "bad_idx")
    shutil.copytree(out, bad)
    mpath = os.path.join(bad, "manifest.json")
    with open(mpath) as f:
        man = json.load(f)
    man["num_docs"] = int(man["num_docs"]) + 1
    man["partitions"][0]["num_postings"] += 7
    with open(mpath, "w") as f:
        json.dump(man, f)
    assert cli_main(["verify", "--index", bad]) == 1


def test_min_window_and_proximity_rerank(ray_session, tmp_path):
    """Minimal-interval proximity: min_window matches an O(n^2) brute
    force over the raw token stream, and proximity_rerank prefers the
    phrase-tight doc over an equal-BM25 scattered one."""
    import itertools
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ics_search_engine_ray.pipelines.build import build_index_from_texts

    filler = " ".join(f"f{i:02d}" for i in range(10))
    rows = [
        (1, f"alpha beta {filler}"),              # tight pair
        (2, f"alpha {filler} beta"),              # scattered pair
        (3, f"beta gamma alpha {filler}"),        # 3 terms within 3
        (4, f"alpha {filler}"),                   # missing beta
        (5, f"alpha alpha beta beta {filler}"),   # repeats
    ]
    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows])}), src)
    out = str(tmp_path / "idx")
    build_index_from_texts(src, out, DEFAULT_CONFIG.with_(stem=False),
                           skip_dedup=True)
    si = SearchIndex(out)

    def brute(text, terms):
        toks = [t for t in text.split() if len(t) > 1]
        best = None
        for i, j in itertools.combinations(range(len(toks) + 1), 2):
            if set(terms) <= set(toks[i:j]):
                w = j - i
                best = w if best is None or w < best else best
        return best

    for did, text in rows:
        for terms in (["alpha", "beta"], ["alpha", "beta", "gamma"],
                      ["alpha"]):
            want = brute(text, terms)
            got = si.min_window(did, terms)
            assert got == want, (did, terms)
    assert si.min_window(99, ["alpha"]) is None

    ranked = si.proximity_rerank("alpha beta", k=5, beta=0.5)
    ids = [r.doc_id for r in ranked]
    assert ids.index(1) < ids.index(2)      # tight pair beats scattered
    plain = {r.doc_id: r.score for r in si.search("alpha beta", k=10)}
    for r in ranked:                         # bonus is additive and bounded
        assert plain[r.doc_id] <= r.score <= plain[r.doc_id] + 0.5
    si.close()


def test_search_boolean_semantics(built_index, oracle):
    """+must / -not / optional semantics against the brute-force oracle:
    candidates contain every must term and no excluded term; scores equal
    plain BM25 restricted to that set."""
    from ics_search_engine_ray.query.engine import SearchIndex
    _, out, _ = built_index
    si = SearchIndex(out)
    docs, df, N, avgdl = oracle
    toks = lambda w: si.tokenize_query(w)
    q_must, q_opt, q_not = toks("data")[0], toks("query")[0], toks("merge")[0]

    res = si.search_boolean("+data query -merge", k=10)
    assert res, "query should match documents"
    for r in res:
        tmap = docs[r.doc_id][1]
        assert q_must in tmap and q_not not in tmap
        assert q_must in r.matched_terms

    # scores: plain bm25 search filtered to the boolean-valid docs must
    # give the same ranking and scores
    plain = si.search("data query", k=len(docs), scorer="bm25", algo="taat")
    valid = [r for r in plain
             if q_must in docs[r.doc_id][1] and q_not not in docs[r.doc_id][1]]
    assert [(r.doc_id, round(r.score, 9)) for r in res] == \
        [(r.doc_id, round(r.score, 9)) for r in valid[:10]]

    # a must term that matches nothing empties the result
    assert si.search_boolean("+zzzzunseen data", k=5) == []
    # pure negation with no positive terms is empty by definition
    assert si.search_boolean("-data", k=5) == []


def test_search_boolean_no_must_is_union(built_index):
    from ics_search_engine_ray.query.engine import SearchIndex
    _, out, _ = built_index
    si = SearchIndex(out)
    a = si.search_boolean("data query", k=10)
    b = si.search("data query", k=10, scorer="bm25", algo="taat")
    assert [(r.doc_id, round(r.score, 9)) for r in a] == \
        [(r.doc_id, round(r.score, 9)) for r in b]
