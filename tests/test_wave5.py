"""Round-4 wave-5 operators: pricing_summary (integer-exact Q1), URL
canonicalization/dedup (adversarial forms), group_percent_rank (ties,
degenerate groups, layout invariance)."""

import numpy as np
import pyarrow as pa


def test_pricing_summary_exact(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import pricing_summary
    rng = np.random.default_rng(7)
    n = 400
    tbl = pa.table({
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[
            rng.integers(0, 3, n)], pa.string()),
        "l_linestatus": pa.array(np.array(["F", "O"])[
            rng.integers(0, 2, n)], pa.string()),
        "l_quantity": pa.array(rng.integers(1, 50, n).astype(float)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(10, 9000, n), 2)),
        "l_discount": pa.array(rng.integers(0, 11, n) / 100.0),
        "l_tax": pa.array(rng.integers(0, 9, n) / 100.0),
    })
    got = pricing_summary(rd.from_arrow(tbl).repartition(5)).to_pandas() \
        .sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("lineitem", tbl)
    want = con.execute("""
WITH s AS (SELECT l_returnflag, l_linestatus,
                  CAST(round(l_quantity * 100, 0) AS BIGINT) AS q,
                  CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS bp,
                  CAST(round(l_discount * 100, 0) AS BIGINT) AS dc,
                  CAST(round(l_tax * 100, 0) AS BIGINT) AS tx
           FROM lineitem)
SELECT l_returnflag, l_linestatus,
       CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) / 100.0 AS sum_qty,
       CAST(CAST(sum(bp) AS BIGINT) AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(CAST(sum(bp * (100 - dc)) AS BIGINT) AS DOUBLE) / 10000.0
         AS sum_disc_price,
       CAST(CAST(sum(bp * (100 - dc) * (100 + tx)) AS BIGINT) AS DOUBLE)
         / 1000000.0 AS sum_charge,
       round(CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) / 100.0 / count(*), 6)
         AS avg_qty,
       round(CAST(CAST(sum(bp) AS BIGINT) AS DOUBLE) / 100.0 / count(*), 6)
         AS avg_price,
       round(CAST(CAST(sum(dc) AS BIGINT) AS DOUBLE) / 100.0 / count(*), 6)
         AS avg_disc,
       count(*) AS count_order
FROM s GROUP BY 1, 2 ORDER BY 1, 2""").df()
    for c in want.columns:
        assert list(got[c]) == list(want[c]), c


def test_url_canonicalize_cases(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.urls import canonicalize_urls
    cases = [
        ("HTTPS://WWW.Foo.COM/Path/", "https://www.foo.com/path"),
        ("http://a.io/x#frag", "http://a.io/x"),
        ("http://a.io/x?utm_source=t", "http://a.io/x"),
        ("http://a.io/x?utm_source=t&id=2", "http://a.io/x?id=2"),
        ("http://a.io/x?id=2&utm_campaign=c", "http://a.io/x?id=2"),
        ("http://a.io/x?id=2&utm_a=1&utm_b=2#f", "http://a.io/x?id=2"),
        ("http://a.io///", "http://a.io"),
        ("http://a.io/x?utm_only=1#frag/", "http://a.io/x"),
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(cases)), pa.int64()),
        "url": pa.array([c[0] for c in cases], pa.string())}))
    out = canonicalize_urls(ds).to_pandas().sort_values("doc_id")
    assert list(out["canon_url"]) == [c[1] for c in cases]


def test_url_dedup_keep_first(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.urls import url_dedup
    urls = ["http://A.io/x/", "http://a.io/x", "http://a.io/x#f",
            "http://b.io/y?utm_z=1", "http://b.io/y"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([7, 3, 9, 5, 4], pa.int64()),
        "url": pa.array(urls, pa.string())})).repartition(3)
    out = sorted((r["canon_url"], r["keep_id"], r["n_dups"])
                 for b in url_dedup(ds).iter_batches(batch_format="pyarrow")
                 for r in b.to_pylist())
    assert out == [("http://a.io/x", 3, 3), ("http://b.io/y", 4, 2)]


def test_group_percent_rank(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.rank import group_percent_rank
    rows = [("a", 10), ("a", 20), ("a", 20), ("a", 30),   # tie -> same pr
            ("b", 5),                                     # single row -> 0
            ("c", 1), ("c", 2)]
    tbl = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "source": pa.array([r[0] for r in rows], pa.string()),
        "n_chars": pa.array([r[1] for r in rows], pa.int64())})
    want = {0: 0.0, 1: 1 / 3, 2: 1 / 3, 3: 1.0, 4: 0.0, 5: 0.0, 6: 1.0}
    for parts in (1, 4):
        ds = rd.from_arrow(tbl).repartition(parts)
        out = group_percent_rank(ds, group="source", order_col="n_chars",
                                 id_col="doc_id")
        got = {r["doc_id"]: r["pr"] for b in out.iter_batches(
            batch_format="pyarrow") for r in b.to_pylist()}
        assert got == {k: round(v, 6) for k, v in want.items()}, parts
