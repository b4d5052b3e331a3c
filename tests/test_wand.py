"""Randomized equivalence: block-max WAND vs exhaustive accumulation.

No Ray needed — pure numpy posting lists.
"""

import numpy as np

from ics_search_engine_ray.query.wand import wand_topk


def brute(term_postings, k):
    acc = {}
    for ids, scores, _, _, qw in term_postings:
        for d, s in zip(ids.tolist(), scores.tolist()):
            acc[d] = acc.get(d, 0.0) + s * qw
    ranked = sorted(acc.items(), key=lambda x: (-x[1], x[0]))
    return ranked[:k]


def make_postings(rng, n_docs, n_terms, block_size):
    out = []
    for _ in range(n_terms):
        size = rng.integers(1, n_docs)
        ids = np.sort(rng.choice(n_docs * 10, size=size, replace=False)).astype(np.int64)
        scores = rng.random(size) * rng.integers(1, 10)
        nb = (size + block_size - 1) // block_size
        bl = ids[np.minimum(np.arange(1, nb + 1) * block_size - 1, size - 1)]
        bm = np.maximum.reduceat(scores, np.arange(0, size, block_size))
        qw = float(rng.integers(1, 4))
        out.append((ids, scores, bl.astype(np.int64), bm, qw))
    return out


def test_wand_random_equivalence():
    rng = np.random.default_rng(42)
    for trial in range(60):
        n_docs = int(rng.integers(5, 400))
        n_terms = int(rng.integers(1, 6))
        block = int(rng.choice([4, 16, 128]))
        k = int(rng.integers(1, 15))
        tp = make_postings(rng, n_docs, n_terms, block)
        got = wand_topk(tp, k, block)
        want = brute(tp, k)
        assert [(d, round(s, 9)) for d, s in got] == \
               [(d, round(s, 9)) for d, s in want], (trial, n_docs, n_terms, block, k)


def test_wand_sums_in_canonical_term_order():
    """ADVICE r1 (wand.py:106): per-doc contributions must be summed in the
    original term order, not dynamic cursor order — FP addition-order noise
    (e.g. 18.438 vs 18.438000000000002) flips (-score, doc_id) ties for
    duplicated docs. With the fix, WAND == brute EXACTLY (no rounding)."""
    rng = np.random.default_rng(7)
    for trial in range(40):
        n_terms = int(rng.integers(2, 5))
        block = int(rng.choice([2, 4, 16]))
        dup_scores = rng.random(n_terms) * 20
        tp = []
        for ti in range(n_terms):
            extra = np.sort(rng.choice(900, size=int(rng.integers(3, 12)),
                                       replace=False) + 300).astype(np.int64)
            # docs 100 and 200 are exact duplicates: same score in every term
            ids = np.concatenate(([100, 200], extra))
            scores = np.concatenate(([dup_scores[ti], dup_scores[ti]],
                                     rng.random(extra.size) * 10))
            nb = (ids.size + block - 1) // block
            bl = ids[np.minimum(np.arange(1, nb + 1) * block - 1, ids.size - 1)]
            bm = np.maximum.reduceat(scores, np.arange(0, ids.size, block))
            tp.append((ids, scores, bl.astype(np.int64), bm, float(rng.integers(1, 3))))
        k = int(rng.integers(1, 6))
        got = wand_topk(tp, k, block)
        want = brute(tp, k)
        assert got == want, (trial, k)   # exact float equality, exact order


def test_wand_with_score_ties():
    # identical scores everywhere: tie-break purely by doc_id
    ids1 = np.array([1, 5, 9, 12, 20], dtype=np.int64)
    ids2 = np.array([2, 5, 9, 13, 21], dtype=np.int64)
    ones = np.ones(5)
    bl = ids1[[4]]
    bm = np.array([1.0])
    tp = [(ids1, ones, bl, bm, 1.0), (ids2, ones.copy(), ids2[[4]], bm.copy(), 1.0)]
    got = wand_topk(tp, 3, 128)
    assert got == [(5, 2.0), (9, 2.0), (1, 1.0)]
