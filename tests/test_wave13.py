"""Wave-13 operators: exact embedding covariance, min-max scalar
quantization, per-source stopword density."""
import duckdb
import numpy as np
import pyarrow as pa


def _emb(sf_dir):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def test_embed_covariance_matches_duckdb(ray_session, sf_dir):
    from ics_search_engine_ray.stages.similarity import embed_covariance
    t = embed_covariance(_emb(sf_dir))
    got = list(zip(t.column("i").to_pylist(), t.column("j").to_pylist(),
                   t.column("n").to_pylist(),
                   t.column("cov").to_pylist()))
    want = [tuple(r) for r in duckdb.sql(f"""
WITH v AS (SELECT vec_id,
        CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
        CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000, 0)
             AS BIGINT) AS u
    FROM '{sf_dir}/embeddings.parquet'),
nn AS (SELECT count(DISTINCT vec_id) AS n FROM v),
sx AS (SELECT i, sum(u) AS s FROM v GROUP BY i),
sxy AS (SELECT a.i AS i, b.i AS j, sum(a.u * b.u) AS s
        FROM v a JOIN v b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY a.i, b.i)
SELECT sxy.i, sxy.j, nn.n,
       CAST(nn.n * sxy.s - sa.s * sb.s AS DOUBLE)
         / CAST(nn.n * (nn.n - 1) AS DOUBLE) / 1000000000000.0
FROM sxy, nn
JOIN sx sa ON sa.i = sxy.i
JOIN sx sb ON sb.i = sxy.j
ORDER BY sxy.i, sxy.j""").fetchall()]
    assert got == want and len(got) == 64 * 65 // 2
    # diagonal is a variance: strictly positive for real data
    assert all(c > 0 for i, j, _, c in got if i == j)


def test_embed_covariance_agrees_with_numpy(ray_session, sf_dir):
    from ics_search_engine_ray.stages.similarity import embed_covariance
    import pyarrow.parquet as pq
    t = embed_covariance(_emb(sf_dir))
    x = np.array(pq.read_table(f"{sf_dir}/embeddings.parquet")
                 .column("embedding").to_pylist(), np.float64)
    q = (np.floor(np.abs(x * 1e6) + 0.5) * np.sign(x * 1e6))
    ref = np.cov(q.T, ddof=1) / 1e12
    for i, j, _, c in zip(t.column("i").to_pylist(),
                          t.column("j").to_pylist(),
                          t.column("n").to_pylist(),
                          t.column("cov").to_pylist()):
        assert abs(c - ref[i, j]) < 1e-9


def test_quantize_embeddings_matches_duckdb(ray_session, sf_dir):
    from ics_search_engine_ray.stages.similarity import quantize_embeddings
    rows = quantize_embeddings(_emb(sf_dir)).take_all()
    got = sorted((r["vec_id"], r["dim"], r["code"]) for r in rows)
    want = [tuple(r) for r in duckdb.sql(f"""
WITH v AS (SELECT vec_id,
        CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
        CAST(unnest(embedding) AS DOUBLE) AS x
    FROM '{sf_dir}/embeddings.parquet'),
r AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM v GROUP BY dim)
SELECT v.vec_id, v.dim,
       CASE WHEN r.mx > r.mn
            THEN CAST(round((v.x - r.mn) / (r.mx - r.mn) * 255, 0)
                      AS BIGINT)
            ELSE 0 END
FROM v JOIN r ON v.dim = r.dim ORDER BY v.vec_id, v.dim""").fetchall()]
    assert got == want and len(got) > 0
    codes = [c for _, _, c in got]
    assert min(codes) == 0 and max(codes) == 255


def test_quantize_constant_dim_codes_zero(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.similarity import quantize_embeddings
    tbl = pa.table({"vec_id": pa.array([0, 1, 2], pa.int64()),
                    "embedding": pa.array(
                        [[1.0, 0.0], [1.0, 0.5], [1.0, 1.0]],
                        pa.list_(pa.float32()))})
    rows = quantize_embeddings(rd.from_arrow(tbl)).take_all()
    got = {(r["vec_id"], r["dim"]): r["code"] for r in rows}
    assert got[(0, 0)] == got[(1, 0)] == got[(2, 0)] == 0  # constant dim
    assert got[(0, 1)] == 0 and got[(1, 1)] == 128 and got[(2, 1)] == 255


def test_stopword_density_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import stopword_density
    from __ray_entry__ import _SQL_STOPLIST
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])
    t = pa.concat_tables([pa.Table.from_batches([b]) if not
                          isinstance(b, pa.Table) else b
                          for b in stopword_density(docs)
                          .iter_batches(batch_format="pyarrow")])
    got = list(zip(t.column("source").to_pylist(),
                   t.column("n_tokens").to_pylist(),
                   t.column("n_stop").to_pylist(),
                   t.column("stop_frac").to_pylist()))
    want = [tuple(r) for r in duckdb.sql(f"""
WITH toks AS (SELECT source,
        unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
    FROM '{sf_dir}/documents.parquet')
SELECT source, count(*),
       CAST(sum(CASE WHEN term IN ({_SQL_STOPLIST}) THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(sum(CASE WHEN term IN ({_SQL_STOPLIST}) THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(count(*) AS DOUBLE)
FROM toks GROUP BY source ORDER BY source""").fetchall()]
    assert got == want and len(got) > 0
    assert all(0.0 <= f <= 1.0 for _, _, _, f in got)


def test_pareto_share_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.events import pareto_share
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "value"])
    t = pareto_share(ev)
    got = (t.column("n_users").to_pylist()[0],
           t.column("k_users").to_pylist()[0],
           t.column("top_value").to_pylist()[0],
           t.column("total_value").to_pylist()[0],
           t.column("share").to_pylist()[0])
    want = duckdb.sql(f"""
WITH pu AS (SELECT user_id, CAST(sum(CAST(round(value * 100, 0)
                AS BIGINT)) AS BIGINT) AS cents
            FROM '{sf_dir}/events.parquet' GROUP BY user_id),
st AS (SELECT count(*) AS n,
              greatest(1, (count(*) + 99) // 100) AS k,
              CAST(sum(cents) AS BIGINT) AS tt FROM pu),
r AS (SELECT cents,
             row_number() OVER (ORDER BY cents, user_id) AS rn FROM pu),
tp AS (SELECT CAST(coalesce(sum(r.cents), 0) AS BIGINT) AS tc
       FROM r, st WHERE r.rn > st.n - st.k)
SELECT st.n, CAST(st.k AS BIGINT),
       CAST(tp.tc AS DOUBLE) / 100.0,
       CAST(st.tt AS DOUBLE) / 100.0,
       CAST(tp.tc AS DOUBLE) / CAST(st.tt AS DOUBLE)
FROM st, tp""").fetchall()[0]
    assert got == tuple(want)
    assert 0.0 < got[4] <= 1.0 and got[1] >= 1


def test_pareto_share_single_user(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.events import pareto_share
    tbl = pa.table({"user_id": pa.array([7, 7, 7], pa.int64()),
                    "value": pa.array([1.0, 2.0, 3.0], pa.float64())})
    t = pareto_share(rd.from_arrow(tbl))
    assert t.column("n_users").to_pylist() == [1]
    assert t.column("k_users").to_pylist() == [1]
    assert t.column("share").to_pylist() == [1.0]


def test_char_frequency_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import \
        char_frequency_per_source
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])
    t = char_frequency_per_source(docs)
    got = list(zip(t.column("source").to_pylist(),
                   t.column("symbol").to_pylist(),
                   t.column("n").to_pylist(),
                   t.column("frac").to_pylist()))
    want = [tuple(r) for r in duckdb.sql(f"""
WITH ch AS (SELECT source,
        unnest(regexp_extract_all(lower(text), '[a-z0-9]')) AS symbol
    FROM '{sf_dir}/documents.parquet'),
c AS (SELECT source, symbol, count(*) AS n FROM ch
      GROUP BY source, symbol)
SELECT source, symbol, n,
       CAST(n AS DOUBLE)
         / CAST(sum(n) OVER (PARTITION BY source) AS DOUBLE)
FROM c ORDER BY source, symbol""").fetchall()]
    assert got == want and len(got) > 0
    # fracs per source sum to ~1
    tot = {}
    for s, _, _, f in got:
        tot[s] = tot.get(s, 0.0) + f
    assert all(abs(v - 1.0) < 1e-9 for v in tot.values())


def test_customer_value_deciles_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import \
        customer_value_deciles
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])
    got = [(r["decile"], r["n_customers"], r["min_spend"],
            r["max_spend"], r["total_spend"], r["avg_spend"])
           for r in customer_value_deciles(od).take_all()]
    want = [tuple(r) for r in duckdb.sql(f"""
WITH pc AS (SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100, 0)
                AS BIGINT)) AS BIGINT) AS cents
            FROM '{sf_dir}/orders.parquet' GROUP BY o_custkey),
nn AS (SELECT count(*) AS n FROM pc),
r AS (SELECT cents,
             CAST((row_number() OVER (ORDER BY cents, o_custkey) - 1)
                  * 10 // (SELECT n FROM nn) AS BIGINT) AS decile
      FROM pc)
SELECT decile, count(*),
       CAST(min(cents) AS DOUBLE) / 100.0,
       CAST(max(cents) AS DOUBLE) / 100.0,
       CAST(sum(cents) AS DOUBLE) / 100.0,
       (CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE)) / 100.0
FROM r GROUP BY decile ORDER BY decile""").fetchall()]
    assert got == want and len(got) == 10
    # deciles are rank bands: monotone min/max across bands
    for a, b in zip(got, got[1:]):
        assert a[3] <= b[2] or abs(a[3] - b[2]) < 1e-9


def test_revenue_cube_matches_duckdb(ray_session, sf_dir):
    from ics_search_engine_ray.stages.relational import (
        read_rollup_inputs, revenue_cube)
    t = pa.concat_tables(
        [b for b in revenue_cube(*read_rollup_inputs(sf_dir))
         .iter_batches(batch_format="pyarrow") if b.num_rows])
    got = sorted(zip(t.column("n_name").to_pylist(),
                     t.column("o_year").to_pylist(),
                     t.column("revenue").to_pylist()),
                 key=lambda r: (r[0] is None, r[0], r[1] is None, r[1]))
    want = [tuple(r) for r in duckdb.sql(f"""
SELECT n_name,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT) *
                (100 - CAST(round(l_discount*100,0) AS BIGINT))) / 10000.0
            AS DOUBLE) AS revenue
FROM '{sf_dir}/lineitem.parquet'
JOIN '{sf_dir}/orders.parquet' ON l_orderkey = o_orderkey
JOIN '{sf_dir}/customer.parquet' ON o_custkey = c_custkey
JOIN '{sf_dir}/nation.parquet' ON c_nationkey = n_nationkey
GROUP BY CUBE(n_name, year(o_orderdate))
ORDER BY n_name NULLS LAST, o_year NULLS LAST""").fetchall()]
    want = sorted(want, key=lambda r: (r[0] is None, r[0] or "",
                                       r[1] is None, r[1] or 0))
    got = sorted(got, key=lambda r: (r[0] is None, r[0] or "",
                                     r[1] is None, r[1] or 0))
    assert got == want and len(got) > 0
    # cube ⊃ rollup: must contain year-only rows
    assert any(n is None and y is not None for n, y, _ in got)


def test_excess_suppliers_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import excess_suppliers
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey", "l_quantity"])
    pt = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    su = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"])
    t = excess_suppliers(li, pt, su)
    got = list(zip(t.column("s_name").to_pylist(),
                   t.column("qty").to_pylist()))
    want = [tuple(r) for r in duckdb.sql(f"""
WITH m AS (SELECT p_partkey FROM '{sf_dir}/part.parquet'
           WHERE p_name LIKE '%widget%'),
q AS (SELECT l_suppkey,
             CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT))
                  AS BIGINT) AS qc
      FROM '{sf_dir}/lineitem.parquet'
      JOIN m ON p_partkey = l_partkey GROUP BY l_suppkey),
t AS (SELECT CAST(sum(qc) AS BIGINT) AS tt, count(*) AS ns FROM q)
SELECT s_name, CAST(q.qc AS DOUBLE) / 100.0
FROM q JOIN '{sf_dir}/supplier.parquet' s ON s.s_suppkey = q.l_suppkey, t
WHERE q.qc * t.ns * 10 > 11 * t.tt
ORDER BY s_name""").fetchall()]
    assert got == want and len(got) > 0


def test_dominant_suppliers_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import dominant_suppliers
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])
    su = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"])
    got = [(r["s_name"], r["n_orders"])
           for r in dominant_suppliers(li, su).take_all()]
    want = [tuple(r) for r in duckdb.sql(f"""
WITH os AS (SELECT l_orderkey, l_suppkey, CAST(sum(
        CAST(round(l_extendedprice * 100, 0) AS BIGINT)
        * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
        AS BIGINT) AS u
    FROM '{sf_dir}/lineitem.parquet' GROUP BY l_orderkey, l_suppkey),
tot AS (SELECT l_orderkey, CAST(sum(u) AS BIGINT) AS t,
               count(*) AS ns FROM os GROUP BY l_orderkey)
SELECT s_name, count(*) AS n_orders
FROM os JOIN tot ON os.l_orderkey = tot.l_orderkey
JOIN '{sf_dir}/supplier.parquet' ON s_suppkey = os.l_suppkey
WHERE tot.ns >= 2 AND 2 * os.u > tot.t
GROUP BY s_name ORDER BY n_orders DESC, s_name""").fetchall()]
    assert got == want and len(got) > 0


def test_dominant_suppliers_group_count_invariant(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import dominant_suppliers

    def run(g):
        li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                             columns=["l_orderkey", "l_suppkey",
                                      "l_extendedprice", "l_discount"])
        su = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                             columns=["s_suppkey", "s_name"])
        return [(r["s_name"], r["n_orders"])
                for r in dominant_suppliers(li, su,
                                            num_groups=g).take_all()]
    assert run(3) == run(17)
