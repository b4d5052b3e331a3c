"""broadcast_join / hash_join primitives and the revenue_by_nation
pipeline (stages/relational.py) vs pandas brute force; the broadcast and
forced-hash-join customer paths must agree bit-for-bit."""

import numpy as np
import pyarrow as pa
import pytest


def _mk(rows_dict):
    import ray.data as rd
    return rd.from_arrow(pa.table(rows_dict)).repartition(3)


def test_broadcast_join_matches_pandas(ray_session):
    import pandas as pd
    from ics_search_engine_ray.stages.joins import broadcast_join

    rng = np.random.default_rng(7)
    left = {"k": pa.array(rng.integers(0, 20, 200), pa.int64()),
            "x": pa.array(rng.standard_normal(200), pa.float64())}
    right = {"kk": pa.array(np.arange(0, 15), pa.int64()),
             "name": pa.array([f"n{i}" for i in range(15)], pa.string())}
    out = broadcast_join(_mk(left), pa.table(right),
                         on="k", right_on="kk").to_pandas()
    want = pd.DataFrame({"k": left["k"].to_pylist(),
                         "x": left["x"].to_pylist()}) \
        .merge(pd.DataFrame({"kk": right["kk"].to_pylist(),
                             "name": right["name"].to_pylist()}),
               left_on="k", right_on="kk").drop(columns=["kk"])
    key = ["k", "x", "name"]
    assert sorted(map(tuple, out[key].values.tolist())) == \
        sorted(map(tuple, want[key].values.tolist()))


def test_broadcast_join_size_gate(ray_session):
    from ics_search_engine_ray.stages.joins import broadcast_join

    small = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    with pytest.raises(ValueError, match="use hash_join"):
        broadcast_join(_mk({"k": pa.array([1], pa.int64())}), small,
                       on="k", max_rows=2)


def test_hash_join_matches_pandas(ray_session):
    import pandas as pd
    from ics_search_engine_ray.stages.joins import hash_join

    rng = np.random.default_rng(11)
    lk = rng.integers(0, 50, 300)
    rk = rng.integers(0, 50, 120)
    left = _mk({"a": pa.array(lk, pa.int64()),
                "x": pa.array(np.arange(300), pa.int64())})
    right = _mk({"b": pa.array(rk, pa.int64()),
                 "y": pa.array(np.arange(120), pa.int64())})
    out = hash_join(left, right, on="a", right_on="b",
                    num_partitions=4).to_pandas()
    want = pd.DataFrame({"a": lk, "x": np.arange(300)}).merge(
        pd.DataFrame({"b": rk, "y": np.arange(120)}),
        left_on="a", right_on="b")
    cols = ["a", "x", "y"]
    assert sorted(map(tuple, out[cols].values.tolist())) == \
        sorted(map(tuple, want[cols].values.tolist()))


def _rev_fixture(rng, n_li=500, n_ord=120, n_cust=30, n_nat=5):
    li = {"l_orderkey": rng.integers(1, n_ord + 1, n_li),
          "l_extendedprice": np.round(rng.uniform(10, 5000, n_li), 2),
          "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2)}
    orders = {"o_orderkey": np.arange(1, n_ord + 1),
              "o_custkey": rng.integers(1, n_cust + 1, n_ord)}
    cust = {"c_custkey": np.arange(1, n_cust + 1),
            "c_nationkey": rng.integers(0, n_nat, n_cust)}
    nation = {"n_nationkey": np.arange(n_nat),
              "n_name": [f"NAT_{i}" for i in range(n_nat)]}
    return li, orders, cust, nation


def _rev_brute(li, orders, cust, nation):
    import pandas as pd
    df = pd.DataFrame(li)
    df["rev"] = (np.rint(df.l_extendedprice * 100).astype(np.int64)
                 * (100 - np.rint(df.l_discount * 100).astype(np.int64)))
    df = df.merge(pd.DataFrame(orders), left_on="l_orderkey",
                  right_on="o_orderkey")
    df = df.merge(pd.DataFrame(cust), left_on="o_custkey",
                  right_on="c_custkey")
    df = df.merge(pd.DataFrame(nation), left_on="c_nationkey",
                  right_on="n_nationkey")
    g = df.groupby("n_name")["rev"].sum() / 10000.0
    return sorted(g.items())


@pytest.mark.parametrize("force_hash", [False, True])
def test_revenue_by_nation_both_cust_paths(ray_session, force_hash):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import revenue_by_nation

    rng = np.random.default_rng(3)
    li, orders, cust, nation = _rev_fixture(rng)

    def ds(d, i32=()):
        t = pa.table({k: pa.array(v, pa.int32() if k in i32 else None)
                      for k, v in d.items()})
        return rd.from_arrow(t).repartition(4)

    out = revenue_by_nation(
        ds(li), ds(orders), ds(cust, i32=("c_nationkey",)), ds(nation),
        num_partitions=3,
        bcast_max_rows=0 if force_hash else 2_000_000).to_pandas()
    got = sorted(zip(out.n_name, out.revenue))
    assert got == _rev_brute(li, orders, cust, nation)


def test_revenue_by_nation_sf0001_matches_duckdb(ray_session):
    import duckdb
    from ics_search_engine_ray.stages.relational import (
        read_revenue_inputs, revenue_by_nation)

    sf = "/root/testdata/sf0.001"
    out = revenue_by_nation(*read_revenue_inputs(sf)).to_pandas()
    want = duckdb.sql(f"""
        SELECT n_name,
               CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT) *
                        (100 - CAST(round(l_discount*100,0) AS BIGINT)))
                    / 10000.0 AS DOUBLE) AS revenue
        FROM read_parquet('{sf}/lineitem.parquet') l
        JOIN read_parquet('{sf}/orders.parquet') o ON l_orderkey = o_orderkey
        JOIN read_parquet('{sf}/customer.parquet') c ON o_custkey = c_custkey
        JOIN read_parquet('{sf}/nation.parquet') n ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name""").df()
    assert out.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_revenue_rollup_levels_consistent(ray_session):
    import math
    from ics_search_engine_ray.stages.relational import (
        read_rollup_inputs, revenue_rollup)

    out = revenue_rollup(*read_rollup_inputs("/root/testdata/sf0.001")) \
        .to_pandas()
    base = out[out.o_year.notna() & out.n_name.notna()]
    nat = out[out.o_year.isna() & out.n_name.notna()]
    grand = out[out.n_name.isna()]
    assert len(grand) == 1
    # each rollup level must sum to the one above (exact: integer cents)
    per_nation = base.groupby("n_name")["revenue"].sum()
    for name, rev in nat.set_index("n_name")["revenue"].items():
        assert math.isclose(per_nation[name], rev, rel_tol=0, abs_tol=1e-6)
    assert math.isclose(base.revenue.sum(), grand.revenue.iloc[0],
                        rel_tol=0, abs_tol=1e-5)


@pytest.mark.parametrize("explicit_hot", [False, True])
def test_skew_join_equals_hash_join(ray_session, explicit_hot):
    from ics_search_engine_ray.stages.joins import hash_join, skew_join

    rng = np.random.default_rng(5)
    n = 6000
    lk = np.where(rng.uniform(size=n) < 0.5, 7,
                  rng.integers(0, 100, n))      # key 7 = half the rows
    left = _mk({"a": pa.array(lk, pa.int64()),
                "x": pa.array(np.arange(n), pa.int64())})
    rk = rng.integers(0, 100, 300)
    right = _mk({"b": pa.array(rk, pa.int64()),
                 "y": pa.array(np.arange(300), pa.int64())})
    plain = hash_join(left, right, on="a", right_on="b",
                      num_partitions=4).to_pandas()
    sk = skew_join(left, right, on="a", right_on="b", num_partitions=4,
                   salt=4,
                   hot_keys=[7] if explicit_hot else None).to_pandas()
    assert sorted(sk.columns) == sorted(plain.columns)
    cols = ["a", "x", "y"]
    assert sorted(map(tuple, sk[cols].values.tolist())) == \
        sorted(map(tuple, plain[cols].values.tolist()))


def test_skew_join_no_hot_keys_fallback(ray_session):
    from ics_search_engine_ray.stages.joins import hash_join, skew_join

    rng = np.random.default_rng(9)
    lk = rng.permutation(500)                    # uniform: nothing hot
    left = _mk({"a": pa.array(lk, pa.int64()),
                "x": pa.array(np.arange(500), pa.int64())})
    right = _mk({"b": pa.array(np.arange(0, 500, 3), pa.int64()),
                 "y": pa.array(np.arange(167), pa.int64())})
    plain = hash_join(left, right, on="a", right_on="b",
                      num_partitions=3).to_pandas()
    sk = skew_join(left, right, on="a", right_on="b", num_partitions=3,
                   hot_ppm=600_000).to_pandas()
    cols = ["a", "x", "y"]
    assert sorted(map(tuple, sk[cols].values.tolist())) == \
        sorted(map(tuple, plain[cols].values.tolist()))


def test_int_group_sums_exact_past_2_53():
    from ics_search_engine_ray.stages.relational import _int_group_sums

    big = (1 << 53) + 1          # representable in int64, not in float64
    keys = np.array([1, 1, 2], np.int64)
    vals = np.array([big, 2, 5], np.int64)
    uk, sums = _int_group_sums(keys, vals)
    assert list(uk) == [1, 2]
    assert list(sums) == [big + 2, 5]       # bincount would round this


def test_revenue_rollup_forced_hash_path(ray_session):
    from ics_search_engine_ray.stages.relational import (
        read_rollup_inputs, revenue_rollup)

    sf = "/root/testdata/sf0.001"
    a = revenue_rollup(*read_rollup_inputs(sf)).to_pandas()
    b = revenue_rollup(*read_rollup_inputs(sf),
                       bcast_max_rows=0).to_pandas()
    key = ["n_name", "o_year"]
    a = a.sort_values(key, na_position="last").reset_index(drop=True)
    b = b.sort_values(key, na_position="last").reset_index(drop=True)
    assert a.equals(b)


def test_broadcast_join_rejects_unsafe_types(ray_session):
    from ics_search_engine_ray.stages.joins import broadcast_join

    small = pa.table({"k": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="per-batch-safe"):
        broadcast_join(_mk({"k": pa.array([1], pa.int64())}), small,
                       on="k", join_type="full outer")
