"""assign_split / stratified_sample (stages/splits.py): hash-rule parity
with a brute-force reference, growth stability, and payload carrying."""

import numpy as np
import pyarrow as pa
import pytest

from ics_search_engine_ray.stages.splits import (
    _MOD, _WEYL, split_case_sql, split_thresholds, weyl_hash)

FRACS = {"train": 0.8, "valid": 0.1, "test": 0.1}


def _brute_split(ids, seed=0):
    bounds = split_thresholds(FRACS)
    out = []
    for i in ids:
        h = ((int(i) + seed) * _WEYL) % _MOD
        out.append(next(n for n, hi in bounds if h < hi))
    return out


def test_thresholds_cover_hash_space():
    b = split_thresholds(FRACS)
    assert b[-1][1] == _MOD
    assert [n for n, _ in b] == ["train", "valid", "test"]
    assert all(b[i][1] < b[i + 1][1] for i in range(len(b) - 1))


def test_split_case_sql_matches_python():
    import duckdb
    ids = list(range(0, 5000, 7))
    case = split_case_sql("i", FRACS, seed=9)
    got = duckdb.sql(
        f"SELECT {case} AS s FROM (SELECT unnest({ids}) AS i)").fetchall()
    assert [r[0] for r in got] == _brute_split(ids, seed=9)


def test_assign_split_matches_brute_and_fractions(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.splits import assign_split

    ids = np.arange(20_000)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())})) \
        .repartition(5)
    out = {r["doc_id"]: r["split"]
           for r in assign_split(ds, "doc_id", FRACS, seed=3).take_all()}
    want = _brute_split(ids, seed=3)
    assert [out[i] for i in ids] == want
    from collections import Counter
    c = Counter(want)
    assert abs(c["train"] / len(ids) - 0.8) < 0.02
    assert abs(c["valid"] / len(ids) - 0.1) < 0.01


def test_split_stable_under_growth(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.splits import assign_split

    def run(n):
        ds = rd.from_arrow(pa.table(
            {"doc_id": pa.array(np.arange(n), pa.int64())}))
        return {r["doc_id"]: r["split"]
                for r in assign_split(ds, "doc_id", FRACS, seed=1).take_all()}

    small, big = run(500), run(2000)
    assert all(big[i] == small[i] for i in small)


def test_stratified_sample_matches_brute(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.splits import stratified_sample

    rng = np.random.default_rng(5)
    n = 600
    langs = [f"l{i % 4}" for i in range(n)]
    ids = rng.permutation(n * 3)[:n]
    chars = rng.integers(10, 99, n)
    ds = rd.from_arrow(pa.table({
        "lang": pa.array(langs, pa.string()),
        "doc_id": pa.array(ids, pa.int64()),
        "n_chars": pa.array(chars, pa.int64()),
    })).repartition(6)
    out = stratified_sample(ds, key="lang", n=7, id_col="doc_id", seed=2,
                            extra_cols=["n_chars"]).take_all()
    got = sorted((r["lang"], r["rank"], r["doc_id"], r["n_chars"])
                 for r in out)
    want = []
    for g in sorted(set(langs)):
        rows = sorted(((int(weyl_hash(np.array([ids[i]]), 2)[0]), int(ids[i]),
                        int(chars[i]))
                       for i in range(n) if langs[i] == g))[:7]
        want += [(g, rk + 1, di, ch)
                 for rk, (_, di, ch) in enumerate(rows)]
    assert got == sorted(want)
