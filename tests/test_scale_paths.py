"""Round-4 scale-path and advice-fix regressions:

- the four text-analysis operators' above-``vocab_gate`` hash-join paths
  (no vocabulary broadcast) produce the SAME output as the broadcast
  paths — the r3 verdict item-1 done criterion ("a test exercising the
  >gate path without ValueError");
- simhash_pairs equals a brute-force hamming scan;
- duplicate-span hash hits are string-verified (a fabricated 64-bit
  collision cannot mark a span);
- user_running cents use half-away-from-zero rounding (DuckDB round());
- value_histogram accepts a non-string key column.
"""

import numpy as np
import pyarrow as pa
import pytest


def _docs(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(60):
        n = int(rng.integers(5, 60))
        words = [vocab[int(j)] for j in rng.integers(0, len(vocab), n)]
        rows.append({"doc_id": i, "text": " ".join(words)})
    rows.append({"doc_id": 60, "text": ""})
    return rd.from_items(rows)


def _df(ds, keys):
    t = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow") if b.num_rows])
    return t.to_pandas().sort_values(keys).reset_index(drop=True)


@pytest.mark.parametrize("op", ["unigram_surprisal", "bigram_surprisal",
                                "doc_tfidf_topk",
                                "similar_docs", "association_pairs"])
def test_hash_join_path_equals_broadcast(ray_session, op):
    import pandas as pd

    from ics_search_engine_ray.stages import text_analysis as ta

    docs = _docs(ray_session)
    fns = {
        "unigram_surprisal": lambda g: ta.unigram_surprisal(docs, vocab_gate=g),
        "bigram_surprisal": lambda g: ta.bigram_surprisal(docs, vocab_gate=g),
        "doc_tfidf_topk": lambda g: ta.doc_tfidf_topk(docs, vocab_gate=g),
        "similar_docs": lambda g: ta.similar_docs(docs, 3, vocab_gate=g),
        "association_pairs": lambda g: ta.association_pairs(
            docs, min_count=3, vocab_gate=g),
    }
    keys = {"unigram_surprisal": ["doc_id"],
            "bigram_surprisal": ["doc_id"],
            "doc_tfidf_topk": ["doc_id", "rank"],
            "similar_docs": ["doc_id"],
            "association_pairs": ["a", "b"]}[op]
    # vocab_gate=1 forces the hash-join path end to end — must NOT raise
    lo = _df(fns[op](1), keys)
    hi = _df(fns[op](10_000_000), keys)
    assert len(lo) > 0
    pd.testing.assert_frame_equal(lo, hi, check_exact=False, atol=2e-6,
                                  rtol=0)


def test_prefix_terms_native_merge(ray_session):
    from ics_search_engine_ray.stages.text_analysis import prefix_terms

    docs = _docs(ray_session)
    rows = prefix_terms(docs, "w1", k=5).take_all()
    # naive recount
    import collections
    df = collections.Counter()
    for r in docs.take_all():
        for t in set((r["text"] or "").split()):
            if t.startswith("w1"):
                df[t] += 1
    want = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["term"], r["df"]) for r in rows] == want


def test_simhash_pairs_vs_brute(ray_session):
    import ray.data as rd

    from ics_search_engine_ray.config import DEFAULT_CONFIG
    from ics_search_engine_ray.functions.simhash import SimHasher
    from ics_search_engine_ray.stages.dedup import simhash_pairs

    rng = np.random.default_rng(11)
    sh = SimHasher()
    vocab = [f"t{i}" for i in range(30)]
    fps, rows = [], []
    base = [vocab[int(j)] for j in rng.integers(0, 30, 40)]
    for i in range(50):
        if i % 7 == 3:
            toks = list(base)                      # exact-dup cluster
        elif i % 7 == 4:
            toks = base + [f"rare{i}"]             # near dup of the cluster
        else:
            toks = [vocab[int(j)] for j in rng.integers(0, 30, 25)] \
                + [f"only{i}a", f"only{i}b", f"only{i}c"]
        fp = sh.fingerprint(toks)
        fps.append(np.frombuffer(fp, np.uint8))
        rows.append({"doc_id": i, "simhash": fp})
    got = simhash_pairs(rd.from_items(rows), DEFAULT_CONFIG)
    got_pairs = set(zip(got.column("a").to_pylist(),
                        got.column("b").to_pylist()))
    mat = np.unpackbits(np.vstack(fps), axis=1)
    want = set()
    for i in range(50):
        for j in range(i + 1, 50):
            if int((mat[i] != mat[j]).sum()) <= DEFAULT_CONFIG.max_hamming:
                want.add((i, j))
    assert got_pairs == want and len(want) > 0


def test_duplicate_span_hash_hit_needs_string_match():
    from ics_search_engine_ray.stages.dedup_text import (_verified_hits,
                                                         _win_tokens)

    texts = ["alpha beta gamma delta epsilon zeta eta theta iota kappa"]
    k = 8
    h, offs, toks, _ = _win_tokens(texts, k)
    assert h.size == 3
    # fabricate a dup table where window 0's hash maps to a DIFFERENT
    # string (collision) and window 2's hash maps to its true string
    true2 = " ".join(toks[0][2:2 + k])
    dup_h = np.sort(np.array([h[0], h[2]], np.int64))
    strs = {int(h[0]): "not the real gram text here at all xx",
            int(h[2]): true2}
    dup_strs = np.asarray([strs[int(v)] for v in dup_h], object)
    wd, ws = _verified_hits(h, offs, toks, dup_h, dup_strs, k)
    assert ws.tolist() == [2]          # collision window 0 rejected
    # and an equal-hash run is walked: two entries with the same hash
    dup_h2 = np.array(sorted([int(h[2]), int(h[2])]), np.int64)
    dup_strs2 = np.asarray(["decoy gram string first in the run xx",
                            true2], object)
    wd2, ws2 = _verified_hits(h, offs, toks, dup_h2, dup_strs2, k)
    assert ws2.tolist() == [2]


def test_user_running_half_away_rounding(ray_session):
    import ray.data as rd

    from ics_search_engine_ray.stages.events import user_running

    ev = rd.from_items([
        {"event_id": 1, "user_id": 1, "ts": 1_000_000, "value": 0.125},
        {"event_id": 2, "user_id": 1, "ts": 2_000_000, "value": 0.125},
    ])
    rows = sorted(user_running(ev).take_all(), key=lambda r: r["seq"])
    # DuckDB round(0.125*100, 0) = 13 (half away), np.round would give 12
    assert rows[0]["cum_value"] == pytest.approx(0.13)
    assert rows[1]["cum_value"] == pytest.approx(0.26)


def test_value_histogram_int_key(ray_session):
    import ray.data as rd

    from ics_search_engine_ray.stages.events import value_histogram

    ev = rd.from_items([{"cat": i % 3, "value": float(i)}
                        for i in range(30)])
    rows = value_histogram(ev, key="cat", value="value", bins=4).take_all()
    assert sum(r["n"] for r in rows) == 30
    assert {type(r["cat"]) for r in rows} == {int}


# ---- round-5: the four remaining above-gate scale paths (r4 verdict
# item 1) — forced gates must take the wired fallback, not raise ----

_SF = "/root/testdata/sf0.001"


def _tpch(name, columns=None):
    import os

    import ray.data as rd
    return rd.read_parquet(os.path.join(_SF, f"{name}.parquet"),
                           columns=columns)


def test_min_cost_supplier_forced_hash_join(ray_session):
    from ics_search_engine_ray.stages.relational import min_cost_supplier

    def run(gate):
        li = _tpch("lineitem", ["l_partkey", "l_suppkey",
                                "l_extendedprice", "l_quantity"])
        out = min_cost_supplier(li, _tpch("supplier"), _tpch("nation"),
                                _tpch("region"), region_name="EUROPE",
                                k=100, max_bcast_rows=gate)
        return _df(out, ["s_acctbal", "n_name", "s_name", "p_partkey"])

    import pandas as pd
    bcast = run(10_000_000)
    joined = run(1)                 # forces the supplier hash-join path
    assert len(bcast) > 0
    pd.testing.assert_frame_equal(bcast, joined)


def test_small_qty_revenue_forced_join(ray_session):
    from ics_search_engine_ray.stages.relational import small_qty_revenue

    def run(gate):
        li = _tpch("lineitem")
        return small_qty_revenue(li, _tpch("part"), brand="Brand#12",
                                 max_bcast_rows=gate).to_pandas()

    import pandas as pd
    bcast = run(10_000_000)
    joined = run(1)        # forces co-partition semi + stats hash-join
    pd.testing.assert_frame_equal(bcast, joined)


def test_source_vocab_jaccard_forced_pair_join(ray_session):
    import pandas as pd

    from ics_search_engine_ray.stages.text_analysis import (
        source_vocab_jaccard)

    docs = _docs_sources()
    mask = source_vocab_jaccard(docs, source_gate=20).to_pandas()
    pair = source_vocab_jaccard(docs, source_gate=1).to_pandas()
    assert len(mask) > 0
    pd.testing.assert_frame_equal(
        mask.sort_values(["s1", "s2"]).reset_index(drop=True),
        pair.sort_values(["s1", "s2"]).reset_index(drop=True))


def test_ks_per_source_forced_histogram(ray_session):
    from ics_search_engine_ray.stages.text_analysis import ks_per_source

    docs = _docs_sources()
    exact = _df(ks_per_source(docs, val_col="n", source_col="source"),
                ["source"])
    binned = _df(ks_per_source(docs, val_col="n", source_col="source",
                               value_gate=8), ["source"])
    assert list(exact["source"]) == list(binned["source"])
    assert (exact["n_s"] == binned["n_s"]).all()
    # binned KS evaluates the exact CDFs on the bin-edge subgrid: a
    # lower bound on the exact KS, within the largest bin mass
    for e, b in zip(exact["ks"], binned["ks"]):
        assert b <= e + 1e-12
        assert e - b <= 0.35


def _docs_sources():
    import ray.data as rd

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    for i in range(120):
        src = f"s{int(rng.integers(0, 4))}"
        n = int(rng.integers(4, 40))
        words = [vocab[int(j)] for j in rng.integers(0, len(vocab), n)]
        rows.append({"doc_id": i, "source": src, "text": " ".join(words),
                     "n": n + int(rng.integers(0, 60))})
    return rd.from_items(rows)
