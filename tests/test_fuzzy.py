"""Deletion-neighborhood edit-distance pairs (stages/fuzzy.py)."""
import random

import numpy as np
import pyarrow as pa
import pytest

from ics_search_engine_ray.stages.fuzzy import (_pad_matrix,
                                                _variant_hashes,
                                                _verify_pairs,
                                                edit_distance_pairs)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _fuzz_keys(seed: int, n: int = 300):
    rng = random.Random(seed)
    base = ["".join(rng.choices("abcx", k=rng.randint(0, 10)))
            for _ in range(n // 2)]
    mut = []
    for s in base[:n // 2]:
        p = rng.randint(0, max(len(s) - 1, 0))
        op = rng.choice(["del", "ins", "sub", "same"])
        if op == "del" and s:
            mut.append(s[:p] + s[p + 1:])
        elif op == "ins":
            mut.append(s[:p] + rng.choice("abcx") + s[p:])
        elif op == "sub" and s:
            mut.append(s[:p] + rng.choice("abcx") + s[p + 1:])
        else:
            mut.append(s)
    return base + mut


@pytest.mark.parametrize("seed", [0, 1])
def test_verify_kernel_matches_levenshtein(seed):
    keys = _fuzz_keys(seed)
    mat, lens = _pad_matrix(keys, 16)
    ia, ib = np.triu_indices(len(keys), k=1)
    dist = _verify_pairs(mat, lens, ia, ib)
    for p in range(ia.size):
        t = _lev(keys[ia[p]], keys[ib[p]])
        if t <= 1:
            assert dist[p] == t, (keys[ia[p]], keys[ib[p]])
        else:
            assert dist[p] > 1, (keys[ia[p]], keys[ib[p]])


def test_variant_hash_blocking_is_complete():
    """Two keys within distance 1 MUST share a variant hash (the
    SymSpell completeness guarantee the groupby relies on)."""
    keys = _fuzz_keys(2, 200)
    mat, lens = _pad_matrix(keys, 16)
    vh = _variant_hashes(mat, lens)
    sets = []
    for i, s in enumerate(keys):
        cols = list(range(len(s))) + [16]
        sets.append({int(vh[i, c]) for c in cols})
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            if _lev(keys[i], keys[j]) <= 1:
                assert sets[i] & sets[j], (keys[i], keys[j])


def test_end_to_end_matches_brute_force(ray_session, sf_dir):
    import ray.data as rd
    docs = rd.read_parquet(sf_dir + "/documents.parquet",
                           columns=["doc_id", "text"])
    got = pa.concat_tables([
        b for b in edit_distance_pairs(docs, key_len=12)
        .iter_batches(batch_format="pyarrow") if b.num_rows])
    rows = docs.take_all()
    keys = {r["doc_id"]: (r["text"] or "")[:12] for r in rows}
    ids = sorted(keys)
    want = {}
    for x, i in enumerate(ids):
        for j in ids[x + 1:]:
            d = _lev(keys[i], keys[j])
            if d <= 1:
                want[(i, j)] = d
    got_map = {(a, b): d for a, b, d in zip(
        got.column("a").to_pylist(), got.column("b").to_pylist(),
        got.column("dist").to_pylist())}
    assert got_map == want
    assert all(a < b for a, b in got_map)


def _brute_snm(rows, window, threshold, shingle_k=3):
    from ics_search_engine_ray.functions.wordhash import \
        batch_shingle_hashes
    from ics_search_engine_ray.stages.fuzzy import _prefix_sortv
    texts = [r["text"] or "" for r in rows]
    ids = [r["doc_id"] for r in rows]
    sortv = _prefix_sortv(texts)
    order = np.lexsort((np.array(ids), sortv))
    flat, offs = batch_shingle_hashes(texts, shingle_k)
    sets = {ids[i]: np.unique(flat[offs[i]:offs[i + 1]])
            for i in range(len(ids))}
    ordered = [ids[i] for i in order]
    want = {}
    for x in range(len(ordered)):
        for y in range(x + 1, min(x + window, len(ordered))):
            i, j = ordered[x], ordered[y]
            inter = np.intersect1d(sets[i], sets[j],
                                   assume_unique=True).size
            union = sets[i].size + sets[j].size - inter
            jac = inter / union if union else 0.0
            if jac >= threshold - 1e-12:
                want[(min(i, j), max(i, j))] = round(
                    float(np.round(jac, 6)), 6)
    return want


@pytest.mark.parametrize("window,threshold", [(4, 0.5), (8, 0.3)])
def test_snm_matches_brute_force(ray_session, sf_dir, window, threshold):
    import ray.data as rd
    from ics_search_engine_ray.stages.fuzzy import snm_pairs
    docs = rd.read_parquet(sf_dir + "/documents.parquet",
                           columns=["doc_id", "text"])
    got = {(r["a"], r["b"]): r["jaccard"]
           for r in snm_pairs(docs, window=window,
                              threshold=threshold).take_all()}
    assert got == _brute_snm(docs.take_all(), window, threshold)


def test_snm_chunk_boundaries(ray_session):
    """1500 docs at window=2 span 3 rank-chunks (B = w*256 = 512):
    fringe rows must carry cross-chunk pairs, ownership must not
    double-emit."""
    import ray.data as rd
    from ics_search_engine_ray.stages.fuzzy import snm_pairs
    rng = random.Random(3)
    rows = [{"doc_id": i,
             "text": f"{rng.choice('abcdefgh')} common tail words here"}
            for i in range(1500)]
    docs = rd.from_items(rows)
    got_list = snm_pairs(docs, window=2, threshold=0.5).take_all()
    got = {(r["a"], r["b"]): r["jaccard"] for r in got_list}
    assert len(got_list) == len(got)          # no duplicate pairs
    assert got == _brute_snm(rows, 2, 0.5)


def test_empty_and_tiny_keys(ray_session):
    import ray.data as rd
    docs = rd.from_items([
        {"doc_id": 1, "text": ""}, {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "a"}, {"doc_id": 4, "text": "b"},
        {"doc_id": 5, "text": "ab"}])
    got = {(r["a"], r["b"]): r["dist"]
           for r in edit_distance_pairs(docs, key_len=16).take_all()}
    # both empties pair with both 1-char keys; "ab" pairs with "a"/"b"
    assert got == {(1, 2): 0, (1, 3): 1, (1, 4): 1, (2, 3): 1,
                   (2, 4): 1, (3, 4): 1, (3, 5): 1, (4, 5): 1}
