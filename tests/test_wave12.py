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
