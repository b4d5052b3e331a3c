"""Round-4 wave-6 operators: ntile (vs DuckDB across n%k cases and n<k),
event_gaps (brute reference + tie order), part_type_revenue (vs DuckDB
on a random fixture)."""

import numpy as np
import pyarrow as pa


def test_ntile_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.rank import ntile
    rng = np.random.default_rng(3)
    con = duckdb.connect()
    for n, k in ((100, 8), (96, 8), (5, 8), (1, 3), (17, 4)):
        tbl = pa.table({
            "event_id": pa.array(rng.permutation(n).astype(np.int64)),
            "value": pa.array(rng.integers(0, 20, n).astype(float))})
        con.register("t", tbl)
        want = dict(con.execute(
            "SELECT event_id, ntile(?) OVER (ORDER BY value, event_id) "
            "FROM t", [k]).fetchall())
        out = ntile(rd.from_arrow(tbl).repartition(3),
                    value_col="value", id_col="event_id", k=k)
        got = {r["event_id"]: r["bucket"] for b in out.iter_batches(
            batch_format="pyarrow") for r in b.to_pylist()}
        assert got == want, (n, k)


def test_event_gaps_brute(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.events import event_gaps
    rng = np.random.default_rng(9)
    n = 300
    users = rng.integers(0, 12, n)
    ts = rng.integers(0, 10**9, n)          # microseconds, with dup risk
    ts[5] = ts[6]                           # force a tie inside a user
    users[5] = users[6] = 3
    tbl = pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_id": pa.array(np.arange(n), pa.int64())})

    rows = sorted(zip(users.tolist(), ts.tolist(), range(n)))
    gaps = {}
    for i in range(1, len(rows)):
        if rows[i][0] == rows[i - 1][0]:
            gaps.setdefault(rows[i][0], []).append(rows[i][1] - rows[i - 1][1])
    out = event_gaps(rd.from_arrow(tbl).repartition(4))
    got = {r["user_id"]: r for b in out.iter_batches(batch_format="pyarrow")
           for r in b.to_pylist()}
    assert sorted(got) == sorted(gaps)
    for u, d in gaps.items():
        assert got[u]["n_gaps"] == len(d)
        assert got[u]["max_gap_s"] == max(d) / 1e6
        assert abs(got[u]["avg_gap_s"]
                   - round(sum(d) / len(d) / 1e6, 6)) < 1e-9


def test_part_type_revenue(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import part_type_revenue
    rng = np.random.default_rng(2)
    nparts, nli = 40, 500
    part = pa.table({
        "p_partkey": pa.array(np.arange(nparts), pa.int64()),
        "p_type": pa.array([f"TYPE{i % 5}" for i in range(nparts)],
                           pa.string())})
    li = pa.table({
        "l_partkey": pa.array(rng.integers(0, nparts, nli), pa.int64()),
        "l_extendedprice": pa.array(np.round(rng.uniform(1, 999, nli), 2)),
        "l_discount": pa.array(rng.integers(0, 11, nli) / 100.0)})
    con = duckdb.connect()
    con.register("lineitem", li)
    con.register("part", part)
    want = con.execute("""
SELECT p_type, count(*) AS n_items,
       CAST(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
            AS BIGINT) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_type ORDER BY p_type""").df()
    got = part_type_revenue(
        rd.from_arrow(li).repartition(4),
        rd.from_arrow(part)).to_pandas().sort_values(
        "p_type").reset_index(drop=True)
    for c in want.columns:
        assert list(got[c]) == list(want[c]), c
