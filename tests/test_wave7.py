"""Round-4 wave-7 operators: TPC-H Q6/Q14/Q3/Q18 shapes
(forecast_revenue, promo_revenue, top_unshipped_orders, large_orders)
against DuckDB on random fixtures, and cross-corpus incremental dedup
(dedup_against) on both the broadcast and the co-partitioned scale path."""

import numpy as np
import pyarrow as pa


def _li_fixture(rng, n=4000, n_orders=800):
    return pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_orders, n), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, 150, n), pa.int64()),
        "l_quantity": pa.array(rng.integers(1, 51, n).astype(float)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(10, 90000, n), 2)),
        "l_discount": pa.array(
            np.round(rng.integers(0, 11, n) / 100.0, 2))})


def test_forecast_revenue_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import forecast_revenue
    rng = np.random.default_rng(11)
    li = _li_fixture(rng)
    con = duckdb.connect()
    con.register("lineitem", li)
    want = con.execute("""
        SELECT count(*) AS n,
               sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
                   * CAST(round(l_discount*100,0) AS BIGINT)) AS rev
        FROM lineitem
        WHERE round(l_discount*100,0) BETWEEN 5 AND 7
          AND l_quantity < 24""").fetchone()
    out = forecast_revenue(rd.from_arrow(li).repartition(5))
    assert out.column("n_items")[0].as_py() == want[0]
    assert out.column("revenue")[0].as_py() == want[1] / 10000.0


def test_promo_revenue_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import promo_revenue
    rng = np.random.default_rng(12)
    li = _li_fixture(rng)
    part = pa.table({
        "p_partkey": pa.array(np.arange(150), pa.int64()),
        "p_type": pa.array(
            [["PROMO", "LARGE", "SMALL"][i % 3] for i in range(150)])})
    con = duckdb.connect()
    con.register("lineitem", li)
    con.register("part", part)
    want = con.execute("""
        WITH f AS (SELECT CAST(round(l_extendedprice*100,0) AS BIGINT)
                          * (100 - CAST(round(l_discount*100,0) AS BIGINT))
                            AS rev, p_type
                   FROM lineitem JOIN part ON l_partkey = p_partkey)
        SELECT round(100.0 * CAST(sum(CASE WHEN p_type='PROMO' THEN rev
                                           ELSE 0 END) AS DOUBLE)
                     / CAST(sum(rev) AS DOUBLE), 6) FROM f""").fetchone()[0]
    out = promo_revenue(rd.from_arrow(li).repartition(4),
                        rd.from_arrow(part))
    assert out.column("promo_pct")[0].as_py() == want


def test_top_unshipped_orders_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import top_unshipped_orders
    rng = np.random.default_rng(13)
    li = _li_fixture(rng, n=3000, n_orders=400)
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(400), pa.int64()),
        "o_orderdate": pa.array(
            rng.integers(0, 10**15, 400), pa.timestamp("us")),
        "o_custkey": pa.array(rng.integers(0, 60, 400), pa.int64())})
    customer = pa.table({
        "c_custkey": pa.array(np.arange(0, 60, 2), pa.int64())})
    con = duckdb.connect()
    con.register("lineitem", li)
    con.register("orders", orders)
    want = con.execute("""
        WITH li AS (SELECT l_orderkey,
                           sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
                               * (100 - CAST(round(l_discount*100,0)
                                             AS BIGINT))) AS rev
                    FROM lineitem GROUP BY l_orderkey)
        SELECT o_orderkey, o_orderdate, CAST(rev AS DOUBLE)/10000.0
        FROM li JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey % 2 = 0
        ORDER BY rev DESC, o_orderdate, o_orderkey LIMIT 10""").fetchall()
    out = top_unshipped_orders(
        rd.from_arrow(li).repartition(4), rd.from_arrow(orders),
        rd.from_arrow(customer), k=10)
    got = [(r["o_orderkey"], r["o_orderdate"], r["revenue"])
           for b in out.iter_batches(batch_format="pyarrow")
           for r in b.to_pylist()]
    assert got == want


def test_large_orders_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import large_orders
    rng = np.random.default_rng(14)
    li = _li_fixture(rng, n=5000, n_orders=300)
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(300), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, 40, 300), pa.int64()),
        "o_orderdate": pa.array(
            rng.integers(0, 10**15, 300), pa.timestamp("us")),
        "o_totalprice": pa.array(np.round(rng.uniform(1e3, 5e5, 300), 2))})
    customer = pa.table({
        "c_custkey": pa.array(np.arange(40), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(40)])})
    con = duckdb.connect()
    con.register("lineitem", li)
    con.register("orders", orders)
    con.register("customer", customer)
    want = con.execute("""
        WITH q AS (SELECT l_orderkey,
                          sum(CAST(round(l_quantity*100,0) AS BIGINT)) AS qu
                   FROM lineitem GROUP BY l_orderkey
                   HAVING sum(CAST(round(l_quantity*100,0) AS BIGINT))
                          > 45000)
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(qu AS DOUBLE)/100.0
        FROM q JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""").fetchall()
    assert want, "fixture must produce qualifying orders"
    out = large_orders(rd.from_arrow(li).repartition(4),
                       rd.from_arrow(orders), rd.from_arrow(customer),
                       min_qty=450.0, k=20)
    got = [tuple(r.values())
           for b in out.iter_batches(batch_format="pyarrow")
           for r in b.to_pylist()]
    assert got == [tuple(w) for w in want]


def _recrawl_fixture(rng, n_old=120, n_dup=40, n_new=30):
    old = pa.table({
        "doc_id": pa.array(np.arange(n_old), pa.int64()),
        "text": pa.array([f"old page {i} body" for i in range(n_old)])})
    dup_ids = rng.choice(n_old, n_dup, replace=False)
    new = pa.table({
        "doc_id": pa.array(
            np.concatenate([dup_ids + 10_000,
                            np.arange(n_new) + 20_000]), pa.int64()),
        "text": pa.array([f"old page {i} body" for i in dup_ids]
                         + [f"fresh page {i}" for i in range(n_new)])})
    survivors = sorted(range(20_000, 20_000 + n_new))
    return old, new, survivors


def test_dedup_against_broadcast_path(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup_text import dedup_against
    rng = np.random.default_rng(15)
    old, new, survivors = _recrawl_fixture(rng)
    out = dedup_against(rd.from_arrow(new).repartition(3),
                        rd.from_arrow(old).repartition(3))
    got = sorted(r["doc_id"] for b in out.iter_batches(
        batch_format="pyarrow") for r in b.to_pylist())
    assert got == survivors


def test_dedup_against_copartition_path(ray_session):
    """Force the above-gate lexsort-run membership path with a tiny gate
    and check it matches the broadcast path exactly."""
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup_text import dedup_against
    rng = np.random.default_rng(16)
    old, new, survivors = _recrawl_fixture(rng)
    out = dedup_against(rd.from_arrow(new).repartition(3),
                        rd.from_arrow(old).repartition(3),
                        max_bcast_rows=10, num_groups=7)
    got = sorted(r["doc_id"] for b in out.iter_batches(
        batch_format="pyarrow") for r in b.to_pylist())
    assert got == survivors


def test_rev_units_half_away_boundary():
    """0.045 * 100 is EXACTLY 4.5 in float64: DuckDB round() gives 5
    (half-away), np.rint would give 4 (half-even). _rev_units must take
    the half-away branch or Q6's BETWEEN 5 AND 7 silently diverges on
    any >2-decimal data."""
    import numpy as np
    from ics_search_engine_ray.stages.relational import (_half_away_100,
                                                         _rev_units)
    assert (0.045 * 100.0) == 4.5
    assert _half_away_100(np.array([0.045]))[0] == 5
    assert _half_away_100(np.array([-0.045]))[0] == -5
    assert _half_away_100(np.array([0.125]))[0] == 13     # 12.5 -> 13
    # discount 0.045 -> 5%: complement 95
    assert _rev_units(np.array([1.0]), np.array([0.045]))[0] == 100 * 95


def test_dup_rate_empty_corpus(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup_text import dup_rate_per_source
    docs = pa.table({"doc_id": pa.array([], pa.int64()),
                     "text": pa.array([], pa.string()),
                     "source": pa.array([], pa.string())})
    out = dup_rate_per_source(rd.from_arrow(docs))
    assert out.num_rows == 0
    assert out.column_names == ["source", "n_docs", "n_unique",
                                "dup_rate"]
