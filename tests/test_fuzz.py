"""Property-based fuzz over the codec/kernel layer (hypothesis).

The segment format and dedup kernels are the least-inspectable code in the
engine; these properties pin them against randomly generated inputs far
beyond the hand-written cases.
"""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from ics_search_engine_ray.functions.varint import decode_varints, encode_varints
from ics_search_engine_ray.index.segments import _ids_from_block_deltas


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    enc = encode_varints(arr)
    dec = decode_varints(enc, len(vals))
    assert np.array_equal(dec, arr)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1,
                max_size=300, unique=True),
       st.sampled_from([1, 3, 16, 64, 128]))
def test_block_delta_roundtrip(ids, block_size):
    """Per-block delta encode (writer semantics) -> reconstruct == original."""
    doc_ids = np.sort(np.array(ids, dtype=np.int64))
    n = doc_ids.size
    blk_start = (np.arange(n) % block_size) == 0
    d = doc_ids.astype(np.uint64).copy()
    d[1:] = doc_ids[1:].astype(np.uint64) - doc_ids[:-1].astype(np.uint64)
    d[blk_start] = doc_ids[blk_start].astype(np.uint64)
    got = _ids_from_block_deltas(d, block_size)
    assert np.array_equal(got, doc_ids)


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=2**31))
def test_porter_stem_is_total_and_short(seed):
    """Stemming never raises and never returns < 2 chars for >= 2-char input."""
    import random
    from ics_search_engine_ray.functions.porter import porter_stem
    rng = random.Random(seed)
    w = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(rng.randint(2, 15)))
    s = porter_stem(w)
    assert isinstance(s, str) and len(s) >= 2


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_wand_matches_brute_on_fuzzed_postings(seed):
    from ics_search_engine_ray.query.wand import wand_topk

    rng = np.random.default_rng(seed)
    n_terms = int(rng.integers(1, 5))
    block = int(rng.choice([2, 7, 32]))
    tps = []
    for _ in range(n_terms):
        size = int(rng.integers(1, 120))
        ids = np.sort(rng.choice(2000, size=size, replace=False)).astype(np.int64)
        scores = np.round(rng.random(size) * 8, 3)
        nb = (size + block - 1) // block
        bl = ids[np.minimum(np.arange(1, nb + 1) * block - 1, size - 1)]
        bm = np.maximum.reduceat(scores, np.arange(0, size, block))
        tps.append((ids, scores, bl.astype(np.int64), bm, float(rng.integers(1, 3))))
    k = int(rng.integers(1, 12))
    got = wand_topk(tps, k, block)
    acc = {}
    for ids, scores, _, _, qw in tps:
        for d, s in zip(ids.tolist(), scores.tolist()):
            acc[d] = acc.get(d, 0.0) + s * qw
    want = sorted(acc.items(), key=lambda x: (-x[1], x[0]))[:k]
    assert [(d, round(s, 9)) for d, s in got] == [(d, round(s, 9)) for d, s in want]


# ---------------- corpus-prep kernels (round 3) ----------------


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
                         min_size=0, max_size=30), min_size=1, max_size=12),
       st.integers(min_value=2, max_value=6))
def test_doc_grams_match_pure_python(docs_tokens, n):
    """decontam._doc_grams window hashes == hash-equality of the pure
    string n-grams: equal windows hash equal, distinct windows distinct
    (over this 5-token alphabet the 64-bit space makes collisions
    impossible in practice)."""
    import numpy as np
    from ics_search_engine_ray.stages.decontam import _doc_grams
    texts = [" ".join(t) for t in docs_tokens]
    h, offs, toks = _doc_grams(texts, n)
    # offsets shape: one window per n-window of docs with >= n tokens
    want_counts = [max(len(t) - n + 1, 0) if len(t) >= n else 0
                   for t in docs_tokens]
    assert list(np.diff(offs)) == want_counts
    # build the string windows in the same order
    strs = []
    for t in docs_tokens:
        if len(t) >= n:
            strs.extend(" ".join(t[i:i + n]) for i in range(len(t) - n + 1))
    assert len(strs) == h.size
    by_hash = {}
    for hv, sv in zip(h.tolist(), strs):
        by_hash.setdefault(hv, set()).add(sv)
    assert all(len(v) == 1 for v in by_hash.values())   # no collisions
    by_str = {}
    for hv, sv in zip(h.tolist(), strs):
        by_str.setdefault(sv, set()).add(hv)
    assert all(len(v) == 1 for v in by_str.values())    # equal -> equal


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=40), min_size=1,
                max_size=50),
       st.integers(min_value=1, max_value=64),
       st.integers(min_value=1, max_value=64))
def test_chunk_starts_cover_exactly(token_counts, chunk, stride):
    """The chunk start/length arithmetic used by chunk_tokens covers every
    token index exactly once per window membership (pure-python model)."""
    if stride > chunk:
        stride = chunk
    for n in token_counts:
        starts = list(range(0, n, stride))
        lens = [min(chunk, n - s) for s in starts]
        assert all(l > 0 for l in lens)
        covered = set()
        for s, l in zip(starts, lens):
            covered.update(range(s, s + l))
        assert covered == set(range(n))


@settings(max_examples=15, deadline=None)
@given(st.lists(st.lists(st.sampled_from(
    [f"w{i:02d}" for i in range(12)] + ["x"]),        # "x" dropped (len 1)
    max_size=12), min_size=1, max_size=40),
    st.sampled_from([2, 3]))
def test_ngram_counts_fuzz_vs_counter(ray_session, doclists, n):
    """Hash-combined distributed n-gram counting == a naive Counter over
    adjacent same-doc token windows, across random corpora and batch
    boundaries (pins the wordhash combine + groupby-sum plan)."""
    from collections import Counter

    import ray.data as rd

    from ics_search_engine_ray.stages.text_analysis import ngram_counts

    texts = [" ".join(ws) for ws in doclists]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(3)
    got = sorted((r["gram"], r["n"])
                 for r in ngram_counts(ds, n=n, min_count=1).take_all())
    want = Counter()
    for ws in doclists:
        toks = [w for w in ws if len(w) > 1]
        for i in range(len(toks) - n + 1):
            want[" ".join(toks[i:i + n])] += 1
    assert got == sorted(want.items())
