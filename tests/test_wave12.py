"""Wave-12 operators: seasonality/clock profiles, Q9-adapted profit,
hapax diagnostics, and later additions from this wave."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def test_product_profit_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import product_profit
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"])
    pt = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    su = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    na = rd.read_parquet(f"{sf_dir}/nation.parquet",
                         columns=["n_nationkey", "n_name"])
    got = [(r["nation"], r["l_year"], r["profit"])
           for r in product_profit(li, pt, su, na,
                                   name_substr="red").take_all()]
    want = [tuple(r) for r in duckdb.sql(f"""
WITH f AS (SELECT n_name AS nation,
  CAST(year(l_shipdate) AS BIGINT) AS l_year,
  CAST(round(l_extendedprice * 100, 0) AS BIGINT)
  * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS ru
  FROM '{sf_dir}/lineitem.parquet'
  JOIN '{sf_dir}/part.parquet' ON p_partkey = l_partkey
  JOIN '{sf_dir}/supplier.parquet' ON s_suppkey = l_suppkey
  JOIN '{sf_dir}/nation.parquet' ON n_nationkey = s_nationkey
  WHERE p_name LIKE '%red%')
SELECT nation, l_year,
       CAST(CAST(sum(ru) AS BIGINT) AS DOUBLE) / 10000.0
FROM f GROUP BY nation, l_year ORDER BY nation, l_year""").fetchall()]
    assert got == want and len(got) > 0


def test_product_profit_above_gate_hash_join(ray_session, sf_dir):
    """Forcing max_bcast_rows below both small sides exercises the
    hash-join scale path; results must be identical to broadcast."""
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import product_profit

    def inputs():
        return (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                                columns=["l_partkey", "l_suppkey",
                                         "l_shipdate", "l_extendedprice",
                                         "l_discount"]),
                rd.read_parquet(f"{sf_dir}/part.parquet",
                                columns=["p_partkey", "p_name"]),
                rd.read_parquet(f"{sf_dir}/supplier.parquet",
                                columns=["s_suppkey", "s_nationkey"]),
                rd.read_parquet(f"{sf_dir}/nation.parquet",
                                columns=["n_nationkey", "n_name"]))

    broad = product_profit(*inputs(), name_substr="blue").take_all()
    gated = product_profit(*inputs(), name_substr="blue",
                           max_bcast_rows=1).take_all()
    assert broad == gated and len(broad) > 0


def test_hapax_ratio_hand_computed(ray_session):
    """'aa bb aa cc' -> distinct 3, hapax 2 (bb, cc); single-token and
    sub-2-char terms drop, per the shared tokenizer contract."""
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import (
        hapax_ratio_per_source)
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "source": pa.array(["s1", "s1", "s2"], pa.string()),
        "text": pa.array(["aa bb aa", "cc x", "dd dd"], pa.string())})
    got = hapax_ratio_per_source(rd.from_arrow(t).repartition(3)) \
        .take_all()
    assert got == [
        {"source": "s1", "n_distinct": 3, "n_hapax": 2,
         "hapax_ratio": round(2 / 3, 6)},
        {"source": "s2", "n_distinct": 1, "n_hapax": 0,
         "hapax_ratio": 0.0}]


def test_hapax_ratio_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import (
        hapax_ratio_per_source)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source"])
    got = [(r["source"], r["n_distinct"], r["n_hapax"], r["hapax_ratio"])
           for r in hapax_ratio_per_source(docs).take_all()]
    want = [tuple(r) for r in duckdb.sql(f"""
WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_extract_all(
                lower(text), '[a-z0-9]+'), x -> length(x) > 1)) AS term
              FROM '{sf_dir}/documents.parquet'),
tc AS (SELECT d.source, t.term, count(*) AS ct
       FROM toks t JOIN '{sf_dir}/documents.parquet' d USING (doc_id)
       GROUP BY d.source, t.term)
SELECT source, count(*),
       CAST(sum(CASE WHEN ct = 1 THEN 1 ELSE 0 END) AS BIGINT),
       round(CAST(sum(CASE WHEN ct = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6)
FROM tc GROUP BY source ORDER BY source""").fetchall()]
    assert got == want and len(got) > 0


def test_important_suppliers_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import important_suppliers
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_extendedprice",
                                  "l_discount"])
    got = [(r["l_suppkey"], r["value"])
           for r in important_suppliers(li, per_mille=2).take_all()]
    want = [tuple(r) for r in duckdb.sql(f"""
WITH f AS (SELECT l_suppkey,
  CAST(round(l_extendedprice * 100, 0) AS BIGINT)
  * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS ru
  FROM '{sf_dir}/lineitem.parquet'),
s AS (SELECT l_suppkey, CAST(sum(ru) AS BIGINT) AS u FROM f
      GROUP BY l_suppkey)
SELECT l_suppkey, CAST(u AS DOUBLE) / 10000.0
FROM s WHERE u * 1000 > (SELECT sum(u) FROM s) * 2
ORDER BY 2 DESC, l_suppkey""").fetchall()]
    assert got == want and len(got) > 0


def test_important_suppliers_threshold_is_strict(ray_session):
    """Exactly-at-threshold suppliers are excluded (strict >), and the
    cross-multiplication never materializes a float fraction."""
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import important_suppliers
    # two suppliers at 499 and 501 per-mille of total revenue
    t = pa.table({
        "l_suppkey": pa.array([1, 2], pa.int64()),
        "l_extendedprice": pa.array([499.0, 501.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.0], pa.float64())})
    got = important_suppliers(rd.from_arrow(t), per_mille=500).take_all()
    assert [(r["l_suppkey"], r["value"]) for r in got] == [(2, 501.0)]


def test_supplier_part_variety_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import (
        supplier_part_variety)
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])
    pt = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_type",
                                  "p_size"])
    got = sorted((r["p_brand"], r["p_type"], r["p_size"],
                  r["supplier_cnt"])
                 for r in supplier_part_variety(li, pt).take_all())
    want = sorted(tuple(r) for r in duckdb.sql(f"""
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey
               FROM '{sf_dir}/lineitem.parquet'),
j AS (SELECT DISTINCT p_brand, p_type, p_size, l_suppkey
      FROM pairs JOIN '{sf_dir}/part.parquet' ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#1')
SELECT p_brand, p_type, CAST(p_size AS BIGINT), count(*)
FROM j GROUP BY p_brand, p_type, p_size""").fetchall())
    assert got == want and len(got) > 0


def test_supplier_part_variety_dedups_multi_part_supplier(ray_session):
    """One supplier shipping TWO different parts of the same class must
    count once for that class."""
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import (
        supplier_part_variety)
    li = rd.from_arrow(pa.table({
        "l_partkey": pa.array([1, 2, 1, 1], pa.int64()),
        "l_suppkey": pa.array([7, 7, 7, 9], pa.int64())}))
    pt = rd.from_arrow(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["Brand#2", "Brand#2"], pa.string()),
        "p_type": pa.array(["SMALL", "SMALL"], pa.string()),
        "p_size": pa.array([5, 5], pa.int64())}))
    got = supplier_part_variety(li, pt).take_all()
    assert got == [{"p_brand": "Brand#2", "p_type": "SMALL", "p_size": 5,
                    "supplier_cnt": 2}]


def test_dau_wau_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.events import dau_wau
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])
    got = [(r["day"], r["dau"], r["wau"], r["stickiness"])
           for r in dau_wau(ev).take_all()]
    want = [tuple(r) for r in duckdb.sql(f"""
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
            FROM '{sf_dir}/events.parquet'),
days AS (SELECT d, count(*) AS dau FROM du GROUP BY d),
w AS (SELECT days.d, count(DISTINCT du.user_id) AS wau
      FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
      GROUP BY days.d)
SELECT days.d, days.dau, w.wau,
       round(CAST(days.dau AS DOUBLE) / w.wau, 6)
FROM days JOIN w ON days.d = w.d ORDER BY 1""").fetchall()]
    assert got == want and len(got) > 0


def test_dau_wau_window_excludes_future_and_gaps(ray_session):
    """WAU for a day counts only users from THAT day and the 6 days
    before; a user active only 7+ days earlier or any day later never
    counts. Days with no events produce no row."""
    import datetime
    import ray.data as rd
    from ics_search_engine_ray.stages.events import dau_wau
    day = 86_400_000_000  # us
    ts = pa.array([0, 6 * day, 7 * day, 20 * day], pa.timestamp("us"))
    t = pa.table({"ts": ts,
                  "user_id": pa.array([1, 2, 3, 4], pa.int64())})
    rows = {r["day"]: r for r in
            dau_wau(rd.from_arrow(t).repartition(3)).take_all()}
    d = datetime.date
    assert set(rows) == {d(1970, 1, 1), d(1970, 1, 7), d(1970, 1, 8),
                         d(1970, 1, 21)}
    assert rows[d(1970, 1, 7)]["wau"] == 2      # users 1 and 2
    assert rows[d(1970, 1, 8)]["wau"] == 2      # users 2 and 3 (1 aged out)
    assert rows[d(1970, 1, 21)]["wau"] == 1
    assert rows[d(1970, 1, 7)]["stickiness"] == 0.5


def test_readability_hand_computed(ray_session):
    """'Hello world. How are you?' -> 5 words, 2 sentences, 7 vowel
    groups; fragment without punctuation floors sentences at 1; empty
    doc drops."""
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import readability
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["Hello world. How are you?", "go go go",
                          "   "], pa.string())})
    rows = {r["doc_id"]: r for r in
            readability(rd.from_arrow(t)).take_all()}
    assert set(rows) == {1, 2}
    r1 = rows[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) \
        == (5, 2, 7)
    assert r1["flesch"] == round(206.835 - 1.015 * (5 / 2)
                                 - 84.6 * (7 / 5), 4)
    assert rows[2]["n_sentences"] == 1


def test_readability_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import readability
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    got = sorted((r["doc_id"], r["n_words"], r["n_sentences"],
                  r["n_syllables"], r["flesch"])
                 for r in readability(docs).take_all())
    want = sorted(tuple(r) for r in duckdb.sql(f"""
WITH c AS (SELECT doc_id,
  len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
  greatest(len(regexp_extract_all(lower(text), '[.!?]+')), 1) AS s,
  len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
  FROM '{sf_dir}/documents.parquet')
SELECT doc_id, CAST(w AS BIGINT), CAST(s AS BIGINT), CAST(y AS BIGINT),
       round(206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
             - 84.6 * (CAST(y AS DOUBLE) / w), 4)
FROM c WHERE w > 0""").fetchall())
    assert got == want and len(got) > 0


def test_order_intervals_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import order_intervals
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"])
    got = [(r["o_custkey"], r["n_gaps"], r["avg_gap_days"],
            r["max_gap_days"])
           for r in order_intervals(od).take_all()]
    want = [tuple(r) for r in duckdb.sql(f"""
WITH g AS (SELECT o_custkey,
  date_diff('day', lag(o_orderdate) OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate), o_orderdate) AS gap
  FROM '{sf_dir}/orders.parquet')
SELECT o_custkey, count(gap),
       round(CAST(sum(gap) AS DOUBLE) / count(gap), 6),
       CAST(max(gap) AS BIGINT)
FROM g WHERE gap IS NOT NULL GROUP BY o_custkey
ORDER BY o_custkey""").fetchall()]
    assert got == want and len(got) > 0


def _brute_semdedup(ids, vecs, cent, threshold):
    """Driver-side reference: identical semantics, plain numpy."""
    norm = np.linalg.norm(vecs, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    vn = vecs / norm
    cl = np.argmax(vn @ cent.T, axis=1)
    out = {}
    for c in np.unique(cl):
        m = cl == c
        cids, cvn = ids[m], vn[m]
        order = np.lexsort((cids, cvn @ cent[c]))
        kept_idx = []
        for i in order:
            if all(float(cvn[i] @ cvn[j]) < threshold - 1e-12
                   for j in kept_idx):
                kept_idx.append(i)
        for i in range(cids.size):
            out[int(cids[i])] = (int(c), i in kept_idx)
    return out


def test_semdedup_matches_brute_reference(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup_text import semdedup
    from ics_search_engine_ray.stages.similarity import kmeans_fit
    em = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    got = {r["vec_id"]: (r["cluster"], r["keep"])
           for r in semdedup(em, k=4, iters=3, threshold=0.9).take_all()}
    tbl = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"'{sf_dir}/embeddings.parquet'").arrow()
    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
    vecs = np.array(tbl.column("embedding").to_pylist(), np.float64)
    cent = kmeans_fit(em, k=4, iters=3)
    want = _brute_semdedup(ids, vecs, cent, 0.9)
    assert got == want and len(got) == ids.size
    assert any(not keep for _, keep in got.values()) or \
        all(keep for _, keep in got.values())


def test_semdedup_drops_near_duplicate(ray_session):
    """Two near-identical vectors: exactly one survives, and the
    survivor is the one FURTHER from its centroid (lower centroid
    cosine wins keep priority), per the SemDeDup recipe."""
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup_text import semdedup
    base = np.array([1.0, 0.0, 0.0])
    nearly = np.array([0.999, 0.01, 0.0])
    other = np.array([0.0, 1.0, 0.0])
    t = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array([list(base), list(nearly), list(other)],
                              pa.list_(pa.float64()))})
    rows = {r["vec_id"]: r["keep"] for r in
            semdedup(rd.from_arrow(t).repartition(3), k=2, iters=2,
                     threshold=0.98).take_all()}
    assert sum(rows[i] for i in (1, 2)) == 1
    assert rows[3] is True


def test_basket_affinity_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import basket_affinity
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    pt = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    got = [(r["type_a"], r["type_b"], r["n_orders"])
           for r in basket_affinity(li, pt).take_all()]
    want = [tuple(r) for r in duckdb.sql(f"""
WITH dt AS (SELECT DISTINCT l_orderkey, p_type
            FROM '{sf_dir}/lineitem.parquet'
            JOIN '{sf_dir}/part.parquet' ON p_partkey = l_partkey)
SELECT a.p_type, b.p_type, count(*)
FROM dt a JOIN dt b ON a.l_orderkey = b.l_orderkey
                   AND a.p_type < b.p_type
GROUP BY 1, 2 ORDER BY 1, 2""").fetchall()]
    assert got == want and len(got) > 0


def test_basket_affinity_counts_orders_not_items(ray_session):
    """Duplicate (order, type) lineitems collapse before pairing; a
    3-type basket yields all three unordered pairs once."""
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import basket_affinity
    li = rd.from_arrow(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "l_partkey": pa.array([10, 10, 20, 30, 10], pa.int64())}))
    pt = rd.from_arrow(pa.table({
        "p_partkey": pa.array([10, 20, 30], pa.int64()),
        "p_type": pa.array(["A", "B", "C"], pa.string())}))
    got = [(r["type_a"], r["type_b"], r["n_orders"])
           for r in basket_affinity(li.repartition(3), pt).take_all()]
    assert got == [("A", "B", 1), ("A", "C", 1), ("B", "C", 1)]


def test_daily_anomaly_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.events import daily_anomaly
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])
    got = [(r["event_type"], r["day"], r["n_events"], r["z"],
            r["anomaly"])
           for r in daily_anomaly(ev).take_all()]
    want = [tuple(r) for r in duckdb.sql(f"""
WITH pd AS (SELECT event_type, CAST(ts AS DATE) AS day,
                   count(*) AS n_events
            FROM '{sf_dir}/events.parquet' GROUP BY 1, 2),
m AS (SELECT event_type, count(*) AS d,
             CAST(sum(n_events) AS BIGINT) AS s1,
             CAST(sum(n_events * n_events) AS BIGINT) AS s2
      FROM pd GROUP BY event_type),
mm AS (SELECT event_type, CAST(s1 AS DOUBLE) / d AS mean,
       sqrt(greatest(CAST(s2 AS DOUBLE) / d
            - (CAST(s1 AS DOUBLE) / d) * (CAST(s1 AS DOUBLE) / d),
            0.0)) AS sd
       FROM m),
zz AS (SELECT pd.event_type, pd.day,
       CAST(pd.n_events AS BIGINT) AS n_events,
       round(CASE WHEN mm.sd > 0
                  THEN (CAST(pd.n_events AS DOUBLE) - mm.mean) / mm.sd
                  ELSE 0.0 END, 6) AS z
       FROM pd JOIN mm USING (event_type))
SELECT event_type, day, n_events, z, (abs(z) > 2.0)
FROM zz ORDER BY event_type, day""").fetchall()]
    assert got == want and len(got) > 0


def test_daily_anomaly_flags_spike_and_zero_variance(ray_session):
    """A 10x spike day flags; a type with identical daily counts has
    sd = 0 and scores z = 0 everywhere (never flags)."""
    import ray.data as rd
    from ics_search_engine_ray.stages.events import daily_anomaly
    day = 86_400_000_000
    ts, ty = [], []
    for d in range(6):                 # 'a': 5 quiet days then a spike
        for _ in range(2 if d < 5 else 40):
            ts.append(d * day)
            ty.append("a")
    for d in range(3):                 # 'b': constant
        ts.append(d * day)
        ty.append("b")
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                  "event_type": pa.array(ty, pa.string())})
    rows = [(r["event_type"], r["n_events"], r["anomaly"], r["z"])
            for r in daily_anomaly(
                rd.from_arrow(t).repartition(4)).take_all()]
    spikes = [r for r in rows if r[0] == "a" and r[1] == 40]
    assert len(spikes) == 1 and spikes[0][2] is True
    bs = [r for r in rows if r[0] == "b"]
    assert len(bs) == 3 and all(r[3] == 0.0 and r[2] is False
                                for r in bs)


def test_trade_balance_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import trade_balance
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    cu = rd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    su = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    na = rd.read_parquet(f"{sf_dir}/nation.parquet",
                         columns=["n_nationkey", "n_name"])
    t = trade_balance(li, od, cu, su, na)
    got = list(zip(t.column("nation").to_pylist(),
                   t.column("supp_revenue").to_pylist(),
                   t.column("cust_revenue").to_pylist(),
                   t.column("balance").to_pylist()))
    want = [tuple(r) for r in duckdb.sql(f"""
WITH s AS (SELECT n_name AS nation, CAST(sum(
    CAST(round(l_extendedprice * 100, 0) AS BIGINT)
    * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT)
      AS su
    FROM '{sf_dir}/lineitem.parquet'
    JOIN '{sf_dir}/supplier.parquet' ON s_suppkey = l_suppkey
    JOIN '{sf_dir}/nation.parquet' ON n_nationkey = s_nationkey
    GROUP BY n_name),
c AS (SELECT n_name AS nation, CAST(sum(
    CAST(round(l_extendedprice * 100, 0) AS BIGINT)
    * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT)
      AS cu
    FROM '{sf_dir}/lineitem.parquet'
    JOIN '{sf_dir}/orders.parquet' ON o_orderkey = l_orderkey
    JOIN '{sf_dir}/customer.parquet' ON c_custkey = o_custkey
    JOIN '{sf_dir}/nation.parquet' ON n_nationkey = c_nationkey
    GROUP BY n_name)
SELECT coalesce(s.nation, c.nation),
       CAST(coalesce(s.su, 0) AS DOUBLE) / 10000.0,
       CAST(coalesce(c.cu, 0) AS DOUBLE) / 10000.0,
       CAST(coalesce(s.su, 0) - coalesce(c.cu, 0) AS DOUBLE) / 10000.0
FROM s FULL OUTER JOIN c ON s.nation = c.nation
ORDER BY 1""").fetchall()]
    assert got == want and len(got) > 0
    assert abs(sum(r[3] for r in got)) < 1e-6   # ledger sums to zero


def test_rfm_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import rfm
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate",
                                  "o_totalprice"])
    got = [(r["o_custkey"], r["recency_days"], r["frequency"],
            r["monetary"]) for r in rfm(od).take_all()]
    want = [tuple(r) for r in duckdb.sql(f"""
WITH pc AS (SELECT o_custkey,
    max(o_orderdate) AS last_d, count(*) AS frequency,
    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
      AS cents
  FROM '{sf_dir}/orders.parquet' GROUP BY o_custkey),
a AS (SELECT max(last_d) AS anchor FROM pc)
SELECT o_custkey, CAST(date_diff('day', last_d, anchor) AS BIGINT),
       frequency, CAST(cents AS DOUBLE) / 100.0
FROM pc, a ORDER BY o_custkey""").fetchall()]
    assert got == want and len(got) > 0
    assert min(r[1] for r in got) == 0    # someone ordered on anchor day


def test_local_supplier_volume_matches_duckdb(ray_session, sf_dir):
    import pyarrow.compute as pc
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import \
        local_supplier_volume
    lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1998-01-01", "us"), pa.timestamp("us"))
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"],
                         filter=(pc.field("o_orderdate") >= lo)
                                & (pc.field("o_orderdate") < hi))
    cu = rd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    su = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    na = rd.read_parquet(f"{sf_dir}/nation.parquet",
                         columns=["n_nationkey", "n_name", "n_regionkey"])
    re = rd.read_parquet(f"{sf_dir}/region.parquet",
                         columns=["r_regionkey", "r_name"])
    t = local_supplier_volume(li, od, cu, su, na, re, region_name="ASIA")
    got = list(zip(t.column("nation").to_pylist(),
                   t.column("revenue").to_pylist()))
    want = [tuple(r) for r in duckdb.sql(f"""
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM '{sf_dir}/lineitem.parquet'
JOIN '{sf_dir}/orders.parquet' ON o_orderkey = l_orderkey
JOIN '{sf_dir}/customer.parquet' ON c_custkey = o_custkey
JOIN '{sf_dir}/supplier.parquet' ON s_suppkey = l_suppkey
JOIN '{sf_dir}/nation.parquet' ON n_nationkey = s_nationkey
JOIN '{sf_dir}/region.parquet' ON r_regionkey = n_regionkey
WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name ORDER BY revenue DESC, n_name""").fetchall()]
    assert got == want and len(got) > 0


def test_banded_revenue_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import banded_revenue
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice", "l_discount"])
    pt = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    t = banded_revenue(li, pt)
    got = t.column("revenue").to_pylist()
    want = duckdb.sql(f"""
SELECT CAST(coalesce(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
         * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))), 0)
       AS DOUBLE) / 10000.0
FROM '{sf_dir}/lineitem.parquet'
JOIN '{sf_dir}/part.parquet' ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 40)""").fetchall()[0][0]
    assert got == [want] and want > 0


def test_banded_revenue_no_match_is_zero(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import banded_revenue
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice", "l_discount"])
    pt = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    t = banded_revenue(li, pt, bands=(("Brand#99", 1, 1, 1, 1),))
    assert t.column("revenue").to_pylist() == [0.0]


def test_priority_returns_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import priority_returns
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag"])
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_orderpriority"])
    got = [(r["o_orderpriority"], r["order_count"])
           for r in priority_returns(li, od).take_all()]
    want = [tuple(r) for r in duckdb.sql(f"""
SELECT o_orderpriority, count(*)
FROM '{sf_dir}/orders.parquet'
WHERE EXISTS (SELECT 1 FROM '{sf_dir}/lineitem.parquet'
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority""").fetchall()]
    assert got == want and len(got) > 0


def test_priority_returns_forced_hash_path(ray_session, sf_dir):
    # max_bcast_rows=0 forces the co-partitioned membership scan
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import priority_returns
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag"])
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_orderpriority"])
    a = [(r["o_orderpriority"], r["order_count"])
         for r in priority_returns(li, od).take_all()]
    li2 = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                          columns=["l_orderkey", "l_returnflag"])
    od2 = rd.read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_orderpriority"])
    b = [(r["o_orderpriority"], r["order_count"])
         for r in priority_returns(li2, od2,
                                   max_bcast_rows=0).take_all()]
    assert a == b
