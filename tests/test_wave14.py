"""Wave-14 operators: lexical diversity, n-gram coverage, term cf/df
stats, active-day histogram."""
import duckdb
import numpy as np
import pyarrow as pa


def _docs(sf_dir):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])


def test_lexical_diversity_matches_duckdb(ray_session, sf_dir):
    from ics_search_engine_ray.stages.text_analysis import \
        lexical_diversity
    got = sorted((r["doc_id"], r["n_tokens"], r["n_types"], r["ttr"])
                 for r in lexical_diversity(_docs(sf_dir)).take_all())
    want = [tuple(r) for r in duckdb.sql(f"""
WITH toks AS (SELECT doc_id, list_filter(regexp_extract_all(lower(text),
              '[a-z0-9]+'), x -> length(x) > 1) AS l
              FROM '{sf_dir}/documents.parquet')
SELECT doc_id, CAST(len(l) AS BIGINT), CAST(len(list_distinct(l))
       AS BIGINT),
       CAST(len(list_distinct(l)) AS DOUBLE) / CAST(len(l) AS DOUBLE)
FROM toks WHERE len(l) > 0 ORDER BY doc_id""").fetchall()]
    assert got == want and len(got) > 0
    assert all(0.0 < t <= 1.0 for _, _, _, t in got)


def test_lexical_diversity_drops_empty_docs(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import \
        lexical_diversity
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["big data table", "! ? ."],
                                     pa.string())})
    rows = lexical_diversity(rd.from_arrow(tbl)).take_all()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["n_tokens"] == 3 and rows[0]["ttr"] == 1.0


def test_ngram_coverage_matches_duckdb(ray_session, sf_dir):
    from ics_search_engine_ray.stages.text_analysis import ngram_coverage
    t = ngram_coverage(_docs(sf_dir), n=4, k=100)
    got = (t.column("distinct_grams").to_pylist()[0],
           t.column("total_occurrences").to_pylist()[0],
           t.column("top_occurrences").to_pylist()[0],
           t.column("coverage").to_pylist()[0])
    want = tuple(duckdb.sql(f"""
WITH toks AS (SELECT doc_id, list_filter(regexp_extract_all(lower(text),
              '[a-z0-9]+'), x -> length(x) > 1) AS l
              FROM '{sf_dir}/documents.parquet'),
g AS (SELECT unnest(list_transform(range(1, len(l) - 2),
      i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]))
        AS gram
      FROM toks WHERE len(l) >= 4),
c AS (SELECT gram, count(*) AS n FROM g GROUP BY gram),
tot AS (SELECT count(*) AS d, CAST(sum(n) AS BIGINT) AS t FROM c),
top AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS s FROM
        (SELECT n FROM c ORDER BY n DESC, gram LIMIT 100))
SELECT tot.d, tot.t, top.s,
       CAST(top.s AS DOUBLE) / CAST(tot.t AS DOUBLE)
FROM tot, top""").fetchall()[0])
    assert got == want
    assert 0.0 < got[3] <= 1.0


def test_term_stats_matches_duckdb(ray_session, sf_dir):
    from ics_search_engine_ray.stages.text_analysis import term_stats
    t = term_stats(_docs(sf_dir), k=100)
    got = list(zip(t.column("term").to_pylist(),
                   t.column("cf").to_pylist(),
                   t.column("df").to_pylist()))
    want = [tuple(r) for r in duckdb.sql(f"""
WITH toks AS (SELECT doc_id, list_filter(regexp_extract_all(lower(text),
              '[a-z0-9]+'), x -> length(x) > 1) AS l
              FROM '{sf_dir}/documents.parquet'),
flat AS (SELECT doc_id, unnest(l) AS term FROM toks),
s AS (SELECT term, count(*) AS cf, count(DISTINCT doc_id) AS df
      FROM flat GROUP BY term)
SELECT term, CAST(cf AS BIGINT), CAST(df AS BIGINT)
FROM s ORDER BY cf DESC, term LIMIT 100""").fetchall()]
    assert got == want and len(got) > 0
    assert all(cf >= df >= 1 for _, cf, df in got)


def test_active_days_histogram_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.events import active_days_histogram
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])
    got = [(r["n_active_days"], r["n_users"])
           for r in active_days_histogram(ev).take_all()]
    want = [tuple(r) for r in duckdb.sql(f"""
WITH pd AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
            FROM '{sf_dir}/events.parquet'),
pu AS (SELECT user_id, count(*) AS nd FROM pd GROUP BY user_id)
SELECT CAST(nd AS BIGINT), count(*) FROM pu GROUP BY nd
ORDER BY nd""").fetchall()]
    assert got == want and len(got) > 0
    # histogram accounts for every user exactly once
    n_users = duckdb.sql(f"SELECT count(DISTINCT user_id) FROM "
                         f"'{sf_dir}/events.parquet'").fetchall()[0][0]
    assert sum(c for _, c in got) == n_users
