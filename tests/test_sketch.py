"""KMV distinct-count sketch (stages/sketch.py): estimate accuracy vs the
exact path, saturation/exact regimes, and partition invariance."""

import numpy as np
import pyarrow as pa
import pytest


def _make_ds(rd, n_keys, vals_per_key, n_distinct, parts, seed=0):
    rng = np.random.default_rng(seed)
    keys, vals = [], []
    for ki in range(n_keys):
        v = rng.integers(0, n_distinct, size=vals_per_key)
        keys += [f"k{ki}"] * vals_per_key
        vals += v.tolist()
    return rd.from_arrow(pa.table({
        "key": pa.array(keys, pa.string()),
        "val": pa.array(vals, pa.int64()),
    })).repartition(parts)


def test_kmv_exact_below_k(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.sketch import distinct_count_kmv
    ds = _make_ds(rd, n_keys=3, vals_per_key=500, n_distinct=100, parts=4)
    got = {r["key"]: r["estimate"]
           for r in distinct_count_kmv(ds, "key", "val", k=256).take_all()}
    # fewer distinct values than k -> the sketch is exact
    for ki in range(3):
        assert got[f"k{ki}"] == 100.0


def test_kmv_estimate_and_partition_invariance(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.sketch import (
        distinct_count_exact, distinct_count_kmv)
    ds = _make_ds(rd, n_keys=2, vals_per_key=20_000, n_distinct=5_000, parts=6)
    exact = {r["key"]: r["n_distinct"]
             for r in distinct_count_exact(ds, "key", "val").take_all()}
    est = {r["key"]: r["estimate"]
           for r in distinct_count_kmv(ds, "key", "val", k=256).take_all()}
    for k in exact:
        # k=256 -> relative error ~1/sqrt(k-2) ~ 6%; assert a loose 20%
        assert est[k] == pytest.approx(exact[k], rel=0.2)
    # estimate is a pure function of the value SET: repartitioning must
    # not change it
    est2 = {r["key"]: r["estimate"]
            for r in distinct_count_kmv(ds.repartition(13), "key", "val",
                                        k=256).take_all()}
    assert est == est2


def test_quantile_sketch_rank_error_bound(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ics_search_engine_ray.stages.sketch import quantile_sketch

    rng = np.random.default_rng(47)
    n = 30_000
    keys = rng.choice(["a", "b", "c"], n, p=[0.7, 0.2, 0.1])
    vals = np.where(keys == "a", rng.lognormal(0, 2, n),
                    rng.uniform(-100, 100, n))    # skewed + uniform mix
    parts = 6
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(keys, pa.string()),
        "value": pa.array(vals, pa.float64()),
    })).repartition(parts)
    k = 64
    got = {(r["event_type"], r["q"]): r["value"]
           for r in quantile_sketch(ds, "event_type", "value",
                                    qs=(0.5, 0.95),
                                    k_per_batch=k).take_all()}
    for g in ("a", "b", "c"):
        sub = np.sort(vals[keys == g])
        # bound: parts batches, stride <= ceil(per-batch-seg/k); the
        # estimate's true rank must be within that many ranks of q*n
        bound = parts * (-(-sub.size // (parts * k) + 1)) + parts
        for q in (0.5, 0.95):
            est = got[(g, q)]
            true_rank = np.searchsorted(sub, est, side="right")
            assert abs(true_rank - q * sub.size) <= bound + 1, \
                (g, q, true_rank, q * sub.size, bound)


def test_quantile_sketch_int_key_with_empty_batches(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ics_search_engine_ray.stages.sketch import quantile_sketch

    rng = np.random.default_rng(61)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(rng.integers(0, 3, 500), pa.int64()),
        "value": pa.array(rng.uniform(0, 1, 500), pa.float64()),
    })).repartition(40)            # some empty blocks
    out = quantile_sketch(ds, "k", "value", qs=(0.5,)).take_all()
    assert sorted({r["k"] for r in out}) == [0, 1, 2]
    assert all(0.3 < r["value"] < 0.7 for r in out)


def test_hll_estimate_and_partition_invariance(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.sketch import (
        distinct_count_exact, distinct_count_hll)
    ds = _make_ds(rd, n_keys=2, vals_per_key=20_000, n_distinct=5_000,
                  parts=6)
    exact = {r["key"]: r["n_distinct"]
             for r in distinct_count_exact(ds, "key", "val").take_all()}
    est = {r["key"]: r["estimate"]
           for r in distinct_count_hll(ds, "key", "val", p=12).take_all()}
    for k in exact:
        # m=4096 -> std error 1.04/sqrt(m) ~ 1.6%; assert a loose 8%
        assert est[k] == pytest.approx(exact[k], rel=0.08)
    # register-wise max is associative/commutative: block layout is
    # irrelevant to the estimate
    est2 = {r["key"]: r["estimate"]
            for r in distinct_count_hll(ds.repartition(13), "key", "val",
                                        p=12).take_all()}
    assert est == est2


def test_hll_high_cardinality_harmonic_path(ray_session):
    # Past ~m*ln(m) (~34k at p=12) every register is hit, linear counting
    # disengages, and the raw harmonic estimator is what answers. This is
    # the regime the left-shift rho bug corrupted (estimates ~2^p low:
    # 60k distinct returned ~15), so pin it against the exact count.
    import ray.data as rd
    from ics_search_engine_ray.stages.sketch import (
        distinct_count_exact, distinct_count_hll)
    ds = _make_ds(rd, n_keys=1, vals_per_key=120_000, n_distinct=60_000,
                  parts=8)
    exact = {r["key"]: r["n_distinct"]
             for r in distinct_count_exact(ds, "key", "val").take_all()}
    assert exact["k0"] > 40_000          # genuinely above linear range
    est = {r["key"]: r["estimate"]
           for r in distinct_count_hll(ds, "key", "val", p=12).take_all()}
    assert est["k0"] == pytest.approx(exact["k0"], rel=0.08)


def test_hll_small_range_linear_counting(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.sketch import (
        distinct_count_exact, distinct_count_hll)
    ds = _make_ds(rd, n_keys=3, vals_per_key=500, n_distinct=100, parts=4)
    exact = {r["key"]: r["n_distinct"]
             for r in distinct_count_exact(ds, "key", "val").take_all()}
    est = {r["key"]: r["estimate"]
           for r in distinct_count_hll(ds, "key", "val", p=12).take_all()}
    for k in exact:
        # far below 2.5m with empty registers -> linear counting, which
        # is near-exact at this load factor
        assert est[k] == pytest.approx(exact[k], rel=0.05)


def test_hll_bitlen64_exact():
    from ics_search_engine_ray.stages.sketch import _bitlen64
    w = np.array([0, 1, 2, 3, (1 << 53) - 1, 1 << 53, (1 << 63) - 1,
                  1 << 63, (1 << 64) - 1], np.uint64)
    want = np.array([0, 1, 2, 2, 53, 54, 63, 64, 64], np.int64)
    assert (_bitlen64(w) == want).all()


def _overlap_ds(rd, parts=4):
    """Two keys with controlled overlap: key a = users [0, 12000),
    key b = users [8000, 20000) -> true intersection 4000; key c tiny
    = users [0, 50) (below-k exact regime vs both)."""
    rows_k, rows_v = [], []
    for kk, lo, hi in (("a", 0, 12_000), ("b", 8_000, 20_000),
                       ("c", 0, 50)):
        ids = np.arange(lo, hi, dtype=np.int64)
        rows_k += [kk] * ids.size
        rows_v += ids.tolist()
    return rd.from_arrow(pa.table({
        "key": pa.array(rows_k, pa.string()),
        "val": pa.array(rows_v, pa.int64()),
    })).repartition(parts)


def test_kmv_intersection_accuracy_and_exact_regime(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.sketch import distinct_intersection_kmv

    out = distinct_intersection_kmv(_overlap_ds(rd), "key", "val", k=256)
    got = {(r["s1"], r["s2"]): r["est_shared"] for r in out.to_pylist()}
    # theta estimator: |a ∩ b| = 4000 of ~16k union; k=256 -> ~1/sqrt(k)
    # relative error on the union scale
    assert got[("a", "b")] == pytest.approx(4000, rel=0.30)
    # c is below k on BOTH sides only when the PAIR theta is 1.0 — here
    # a saturates, so the estimate uses min-theta; c ⊂ a means the truth
    # is 50 and the estimate must be nonnegative and bounded sane
    assert 0 <= got[("a", "c")] <= 1500
    assert got[("b", "c")] == 0.0     # disjoint: no shared hash survives


def test_kmv_intersection_exact_when_both_below_k(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.sketch import distinct_intersection_kmv

    t = pa.table({
        "key": pa.array(["x"] * 80 + ["y"] * 90, pa.string()),
        "val": pa.array(list(range(80)) + list(range(50, 140)), pa.int64()),
    })
    out = distinct_intersection_kmv(rd.from_arrow(t).repartition(3),
                                    "key", "val", k=256)
    got = {(r["s1"], r["s2"]): r["est_shared"] for r in out.to_pylist()}
    # both sketches unsaturated -> theta = 1.0 -> EXACT intersection
    assert got[("x", "y")] == 30.0


def test_kmv_intersection_partition_invariance(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.sketch import distinct_intersection_kmv

    outs = []
    for parts in (1, 7):
        out = distinct_intersection_kmv(_overlap_ds(rd, parts=parts),
                                        "key", "val", k=64)
        outs.append(sorted((r["s1"], r["s2"], r["est_shared"])
                           for r in out.to_pylist()))
    assert outs[0] == outs[1]


def test_cms_one_sided_and_near_exact(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.sketch import term_counts_cms

    rng = np.random.default_rng(17)
    vocab = [f"word{i:04d}" for i in range(2_000)]
    texts, truth = [], {}
    for _ in range(300):
        ws = rng.choice(vocab, size=40).tolist()
        texts.append(" ".join(ws))
        for w in ws:
            truth[w] = truth.get(w, 0) + 1
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())})) \
        .repartition(5)
    qs = vocab[:20] + ["neverpresentterm"]
    got = {r["term"]: r["est_count"]
           for r in term_counts_cms(ds, query_terms=qs).to_pylist()}
    for t in qs:
        want = truth.get(t, 0)
        # CMS never underestimates; at 12k tokens over 4x65536 cells the
        # collision overshoot is tiny
        assert got[t] >= want
        assert got[t] - want <= 3
    # partition invariance: the merge is an elementwise counter sum
    ds1 = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    got1 = {r["term"]: r["est_count"]
            for r in term_counts_cms(ds1, query_terms=qs).to_pylist()}
    assert got1 == got
