"""Round-4 wave-4 operators: winnow_fingerprints (vs a brute reference),
c4_line_filter (hand fixture), search_prefix (expansion + score parity
with plain OR search)."""

import hashlib

import numpy as np
import pyarrow as pa


def _docs(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array(rows, pa.string())})).repartition(3)


def _brute_winnow(text, k, w):
    toks = [t for t in __import__("re").findall(r"[a-z0-9]+", text.lower())
            if len(t) > 1]
    m = len(toks) - k + 1
    if m <= 0:
        return []
    hs = [hashlib.md5(" ".join(toks[i:i + k]).encode()).hexdigest()
          for i in range(m)]
    ww = min(w, m)
    sel = set()
    for s in range(m - ww + 1):
        mn = min(hs[s:s + ww])                 # min hash, ties -> rightmost
        best = max(i for i in range(s, s + ww) if hs[i] == mn)
        sel.add((best, hs[best]))
    return sorted(sel)


def test_winnow_matches_bruteforce(ray_session):
    from ics_search_engine_ray.stages.text_analysis import winnow_fingerprints
    rng = np.random.default_rng(5)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    texts = [" ".join(vocab[i] for i in rng.integers(0, 6, n))
             for n in (0, 2, 3, 4, 5, 9, 30, 80)]
    got = {}
    out = winnow_fingerprints(_docs(texts), k=4, w=5)
    for b in out.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            got.setdefault(r["doc_id"], []).append((r["pos"], r["gram_md5"]))
    for i, t in enumerate(texts):
        assert sorted(got.get(i, [])) == _brute_winnow(t, 4, 5), i


def test_winnow_guarantee(ray_session):
    """Any shared run of >= w+k-1 tokens shares a fingerprint."""
    from ics_search_engine_ray.stages.text_analysis import winnow_fingerprints
    shared = "qq ww ee rr tt yy uu ii"          # 8 tokens = w+k-1
    texts = ["xx zz " + shared + " mm nn", shared + " oo pp aa bb cc dd"]
    out = winnow_fingerprints(_docs(texts), k=4, w=5).to_pandas()
    h0 = set(out[out.doc_id == 0].gram_md5)
    h1 = set(out[out.doc_id == 1].gram_md5)
    assert h0 & h1


def test_c4_line_filter(ray_session):
    from ics_search_engine_ray.stages.text_analysis import c4_line_filter
    texts = [
        "one two three four five.\nshort.\nsix seven eight nine ten!\n"
        "and four more words here.\ntrailing no punct",   # 3 kept lines
        "good line with five words.\nanother good line right here!\n"
        "third fine line goes here.",                      # 3 kept
        "good line with five words.\nonly one more line x",  # 1 kept -> drop
        "lorem ipsum a b c d e.\nf g h i j k.\nl m n o p q.",  # bad substr
        "brace { a b c d e.\nf g h i j k.\nl m n o p q.",      # bad substr
        "",
    ]
    out = {r["doc_id"]: r for b in c4_line_filter(_docs(texts)).iter_batches(
        batch_format="pyarrow") for r in b.to_pylist()}
    assert sorted(out) == [0, 1]
    assert out[0]["n_lines"] == 5 and out[0]["n_kept"] == 3
    assert out[0]["clean_text"] == (
        "one two three four five.\nsix seven eight nine ten!\n"
        "and four more words here.")
    assert out[1]["n_kept"] == 3
    assert out[1]["clean_text"] == texts[1]


def test_search_prefix(ray_session, tmp_path):
    """Prefix expansion + OR scoring over a tiny built index: the score
    of every hit equals a plain search() for the same expanded term set
    (single-occurrence terms), and expansion caps by df."""
    from ics_search_engine_ray.config import DEFAULT_CONFIG
    from ics_search_engine_ray.pipelines.build import build_index_from_texts
    from ics_search_engine_ray.query.engine import SearchIndex
    import pyarrow.parquet as pq

    texts = ["alpha alpine amber", "alpha beta", "alpine gamma",
             "beta gamma delta", "amber alpha alpine"]
    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}), src)
    out = tmp_path / "idx"
    cfg = DEFAULT_CONFIG.with_(stem=False)
    build_index_from_texts(str(src), str(out), cfg, skip_dedup=True)
    si = SearchIndex(str(out))

    exp = si.expand_prefix("al", 50)
    assert [t for t, _ in exp] == ["alpha", "alpine"]   # df 3 vs 3 -> term asc
    assert si.expand_prefix("al", 1) == [("alpha", 3)]
    assert si.expand_prefix("zz", 50) == []
    assert si.search_prefix("zz*") == []

    res = si.search_prefix("al", k=10)
    assert {r.doc_id for r in res} == {0, 1, 2, 4}
    # parity with an explicit OR query over the expansion
    want = si.search("alpha alpine", k=10)
    assert [(r.doc_id, round(r.score, 9)) for r in res] == \
        [(r.doc_id, round(r.score, 9)) for r in want]
