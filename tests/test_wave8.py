"""Round-4 wave-8 operators: TPC-H Q13/Q15/Q22/Q17/Q10/Q7 shapes vs
DuckDB on random fixtures (order_count_distribution, top_suppliers,
idle_rich_customers, small_qty_revenue, returned_item_report,
nation_volume)."""

import numpy as np
import pyarrow as pa


def _rng_tables(seed, n_li=4000, n_orders=500, n_cust=80, n_supp=25,
                n_nat=6):
    rng = np.random.default_rng(seed)
    li = pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_orders, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, 60, n_li), pa.int64()),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(float)),
        "l_extendedprice": pa.array(np.round(rng.uniform(10, 9e4, n_li), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) / 100.0, 2)),
        "l_returnflag": pa.array(
            np.where(rng.random(n_li) < 0.3, "R", "N")),
        "l_shipdate": pa.array(
            rng.integers(8 * 10**14, 9 * 10**14, n_li), pa.timestamp("us"))})
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
        # leave some customers order-less for Q13/Q22
        "o_custkey": pa.array(rng.integers(0, n_cust - 15, n_orders),
                              pa.int64())})
    customer = pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_cust), 2)),
        "c_nationkey": pa.array(rng.integers(0, n_nat, n_cust), pa.int32())})
    supplier = pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, n_nat, n_supp), pa.int32())})
    nation = pa.table({
        "n_nationkey": pa.array(np.arange(n_nat), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(n_nat)])})
    return li, orders, customer, supplier, nation


def _con(**tables):
    import duckdb
    con = duckdb.connect()
    for name, t in tables.items():
        con.register(name, t)
    return con


def _rows(ds):
    return [tuple(r.values()) for b in ds.iter_batches(
        batch_format="pyarrow") for r in b.to_pylist()]


def test_order_count_distribution(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import \
        order_count_distribution
    li, orders, customer, *_ = _rng_tables(21)
    con = _con(orders=orders, customer=customer)
    want = con.execute("""
        WITH c AS (SELECT c_custkey, count(o_custkey) AS c_count
                   FROM customer LEFT JOIN orders ON c_custkey = o_custkey
                   GROUP BY c_custkey)
        SELECT c_count, count(*) FROM c GROUP BY c_count
        ORDER BY c_count""").fetchall()
    out = order_count_distribution(rd.from_arrow(orders).repartition(4),
                                   rd.from_arrow(customer))
    assert sorted(_rows(out)) == [tuple(w) for w in want]


def test_top_suppliers_ties(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import top_suppliers
    # engineered tie: two suppliers with identical exact revenue
    li = pa.table({
        "l_suppkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([100.0, 200.0, 150.0, 150.0, 10.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0, 0.0])})
    supplier = pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["a", "b", "c"])})
    out = top_suppliers(rd.from_arrow(li).repartition(3),
                        rd.from_arrow(supplier))
    got = sorted(_rows(out))
    assert got == [(1, "a", 300.0), (2, "b", 300.0)]


def test_top_suppliers_empty(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import top_suppliers
    li = pa.table({"l_suppkey": pa.array([], pa.int64()),
                   "l_extendedprice": pa.array([], pa.float64()),
                   "l_discount": pa.array([], pa.float64())})
    supplier = pa.table({"s_suppkey": pa.array([1], pa.int64()),
                         "s_name": pa.array(["a"])})
    out = top_suppliers(rd.from_arrow(li), rd.from_arrow(supplier))
    assert out.num_rows == 0


def test_idle_rich_customers(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import idle_rich_customers
    li, orders, customer, *_ = _rng_tables(22)
    con = _con(orders=orders, customer=customer)
    want = con.execute("""
        WITH b AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nk,
                          CAST(round(c_acctbal*100,0) AS BIGINT) AS cents
                   FROM customer),
        s AS (SELECT sum(cents) sc, count(*) cnt FROM b WHERE cents > 0)
        SELECT nk, count(*), CAST(sum(cents) AS DOUBLE)/100.0
        FROM b, s WHERE cents * cnt > sc
          AND c_custkey NOT IN (SELECT o_custkey FROM orders)
        GROUP BY nk ORDER BY nk""").fetchall()
    assert want, "fixture must leave some idle rich customers"
    out = idle_rich_customers(rd.from_arrow(customer).repartition(3),
                              rd.from_arrow(orders).repartition(3))
    assert sorted(_rows(out)) == [tuple(w) for w in want]


def test_small_qty_revenue(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import small_qty_revenue
    li, *_ = _rng_tables(23)
    part = pa.table({
        "p_partkey": pa.array(np.arange(60), pa.int64()),
        "p_brand": pa.array([f"Brand#{i % 4}" for i in range(60)])})
    con = _con(lineitem=li, part=part)
    want = con.execute("""
        WITH a AS (SELECT l_partkey,
                          sum(CAST(round(l_quantity*100,0) AS BIGINT)) sq,
                          count(*) cnt
                   FROM lineitem
                   WHERE l_partkey IN (SELECT p_partkey FROM part
                                       WHERE p_brand = 'Brand#2')
                   GROUP BY l_partkey)
        SELECT round(CAST(coalesce(sum(CAST(round(l_extendedprice*100,0)
                     AS BIGINT)), 0) AS DOUBLE)/100.0/7.0, 6)
        FROM lineitem JOIN a USING (l_partkey)
        WHERE CAST(round(l_quantity*100,0) AS BIGINT)*5*cnt < sq
        """).fetchone()[0]
    out = small_qty_revenue(rd.from_arrow(li).repartition(4),
                            rd.from_arrow(part), brand="Brand#2")
    assert out.column("avg_yearly")[0].as_py() == want


def test_returned_item_report(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import returned_item_report
    li, orders, customer, _, nation = _rng_tables(24)
    con = _con(lineitem=li, orders=orders, customer=customer,
               nation=nation)
    want = con.execute("""
        WITH l AS (SELECT l_orderkey,
                          sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
                              * (100 - CAST(round(l_discount*100,0)
                                            AS BIGINT))) AS rev
                   FROM lineitem WHERE l_returnflag='R'
                   GROUP BY l_orderkey),
        p AS (SELECT o_custkey, sum(rev) AS rev
              FROM l JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_custkey)
        SELECT c_custkey, c_name, CAST(rev AS DOUBLE)/10000.0,
               c_acctbal, n_name
        FROM p JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
        ORDER BY rev DESC, c_custkey LIMIT 10""").fetchall()
    out = returned_item_report(
        rd.from_arrow(li).repartition(4), rd.from_arrow(orders),
        rd.from_arrow(customer), rd.from_arrow(nation), k=10)
    assert _rows(out) == [tuple(w) for w in want]


def test_nation_volume(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import nation_volume
    li, orders, customer, supplier, nation = _rng_tables(25)
    con = _con(lineitem=li, orders=orders, customer=customer,
               supplier=supplier, nation=nation)
    want = con.execute("""
        SELECT n1.n_name, n2.n_name, CAST(year(l_shipdate) AS BIGINT),
               CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
                        * (100 - CAST(round(l_discount*100,0) AS BIGINT)))
                    AS DOUBLE)/10000.0
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation n1 ON s_nationkey = n1.n_nationkey
             JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name='NATION_1' AND n2.n_name='NATION_3')
           OR (n1.n_name='NATION_3' AND n2.n_name='NATION_1')
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""").fetchall()
    assert want, "fixture must produce cross-nation volume"
    out = nation_volume(
        rd.from_arrow(li).repartition(4), rd.from_arrow(orders),
        rd.from_arrow(customer), rd.from_arrow(supplier),
        rd.from_arrow(nation), nation_a="NATION_1", nation_b="NATION_3")
    assert sorted(_rows(out)) == [tuple(w) for w in want]


def test_market_share_matches_duckdb(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import market_share
    li, orders, customer, supplier, nation = _rng_tables(26, n_li=3000)
    rng = np.random.default_rng(27)
    orders = orders.append_column(
        "o_orderdate", pa.array(
            rng.integers(8 * 10**14, 9 * 10**14, orders.num_rows),
            pa.timestamp("us")))
    nation = nation.append_column(
        "n_regionkey", pa.array([i % 2 for i in range(6)], pa.int32()))
    region = pa.table({
        "r_regionkey": pa.array([0, 1], pa.int32()),
        "r_name": pa.array(["EAST", "WEST"])})
    part = pa.table({
        "p_partkey": pa.array(np.arange(60), pa.int64()),
        "p_type": pa.array([["PROMO", "LARGE"][i % 2] for i in range(60)])})
    con = _con(lineitem=li, orders=orders, customer=customer,
               supplier=supplier, nation=nation, region=region, part=part)
    want = con.execute("""
        WITH f AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                          CASE WHEN n1.n_name = 'NATION_1' THEN 1 ELSE 0
                          END AS tflag,
                          CAST(round(l_extendedprice*100,0) AS BIGINT)
                          * (100 - CAST(round(l_discount*100,0) AS BIGINT))
                            AS rev
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                        JOIN customer ON o_custkey = c_custkey
                        JOIN nation n2 ON c_nationkey = n2.n_nationkey
                        JOIN region ON n2.n_regionkey = r_regionkey
                        JOIN part ON l_partkey = p_partkey
                        JOIN supplier ON l_suppkey = s_suppkey
                        JOIN nation n1 ON s_nationkey = n1.n_nationkey
                   WHERE r_name = 'WEST' AND p_type = 'PROMO')
        SELECT o_year, round(CAST(sum(tflag*rev) AS DOUBLE)
                             / CAST(sum(rev) AS DOUBLE), 6)
        FROM f GROUP BY o_year ORDER BY o_year""").fetchall()
    assert want
    out = market_share(
        rd.from_arrow(li).repartition(4), rd.from_arrow(orders),
        rd.from_arrow(customer), rd.from_arrow(supplier),
        rd.from_arrow(nation), rd.from_arrow(region),
        target_nation="NATION_1", region_name="WEST",
        part_type="PROMO", part=rd.from_arrow(part))
    assert sorted(_rows(out)) == [tuple(w) for w in want]


def test_dup_rate_per_source(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup_text import dup_rate_per_source
    texts = [f"unique doc {i}" for i in range(40)] \
        + ["repeated body"] * 10 + ["other repeat"] * 4
    srcs = [f"s{i % 3}" for i in range(40)] + ["s0"] * 10 + ["s1"] * 4
    docs = pa.table({"doc_id": pa.array(np.arange(54), pa.int64()),
                     "text": pa.array(texts),
                     "source": pa.array(srcs)})
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute("""
        SELECT source, count(*), count(DISTINCT md5(text)),
               round(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE)
                     / count(*), 6)
        FROM documents GROUP BY source ORDER BY source""").fetchall()
    out = dup_rate_per_source(rd.from_arrow(docs).repartition(4))
    got = sorted((r["source"], r["n_docs"], r["n_unique"], r["dup_rate"])
                 for r in out.to_pylist())
    assert got == [tuple(w) for w in want]
    d = {s: r for s, _, _, r in got}
    assert d["s0"] > 0 and d["s2"] == 0.0


def test_large_orders_hash_fallback(ray_session):
    """Force the above-gate path (max_bcast_rows=1): two hash joins must
    give exactly the broadcast plan's rows."""
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import large_orders
    li, orders, customer, *_ = _rng_tables(28, n_li=3000, n_orders=200)
    rng = np.random.default_rng(28)
    orders = orders.append_column(
        "o_orderdate", pa.array(
            rng.integers(0, 10**15, orders.num_rows), pa.timestamp("us")))
    orders = orders.append_column(
        "o_totalprice", pa.array(
            np.round(rng.uniform(1e3, 5e5, orders.num_rows), 2)))
    args = (rd.from_arrow(li).repartition(4), rd.from_arrow(orders),
            rd.from_arrow(customer))
    want = _rows(large_orders(*args, min_qty=400.0, k=15))
    got = _rows(large_orders(*args, min_qty=400.0, k=15,
                             max_bcast_rows=1))
    assert want and got == want


def test_idle_rich_customers_copartition_path(ray_session):
    """Force anti_join_keys' above-gate complement path and compare with
    the broadcast path."""
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import idle_rich_customers
    li, orders, customer, *_ = _rng_tables(29)
    args = (rd.from_arrow(customer).repartition(3),
            rd.from_arrow(orders).repartition(3))
    want = sorted(_rows(idle_rich_customers(*args)))
    got = sorted(_rows(idle_rich_customers(*args, max_bcast_rows=2)))
    assert want and got == want
