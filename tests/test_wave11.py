"""Wave-11 operators: collocation mining, distribution diagnostics,
embedding column stats, inequality metrics, blocklist filtering."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session, sf_dir):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])


def test_pmi_collocations_matches_duckdb(docs_ds, sf_dir):
    from ics_search_engine_ray.stages.text_analysis import pmi_collocations
    got = sorted((r["a"], r["b"], r["n_ab"], r["lift"])
                 for r in pmi_collocations(docs_ds, min_count=5,
                                           k=50).take_all())
    want = sorted(duckdb.sql(f"""
WITH toks AS (SELECT doc_id, list_filter(regexp_extract_all(lower(text),
              '[a-z0-9]+'), x -> length(x) > 1) AS l
              FROM '{sf_dir}/documents.parquet'),
flat AS (SELECT unnest(l) AS term FROM toks),
nn AS (SELECT count(*) AS n FROM flat),
uni AS (SELECT term, count(*) AS c FROM flat GROUP BY term),
big AS (SELECT z[1] AS a, z[2] AS b, count(*) AS n_ab FROM (
          SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS z
          FROM toks WHERE len(l) >= 2)
        GROUP BY a, b HAVING count(*) >= 5)
SELECT big.a, big.b, CAST(big.n_ab AS BIGINT),
       (CAST(big.n_ab AS DOUBLE) * (SELECT n FROM nn))
         / (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE))
FROM big JOIN uni ua ON big.a = ua.term
         JOIN uni ub ON big.b = ub.term
ORDER BY 4 DESC, 1, 2 LIMIT 50""").fetchall())
    assert got == want and len(got) == 50


def test_pmi_collocations_hand_computed(ray_session):
    """lift on a corpus small enough to verify by hand: N=12 tokens,
    'aa bb' appears 3 times, c(aa)=4, c(bb)=4 -> lift = 3*12/16 = 2.25.
    Bigrams never cross doc boundaries; min_count prunes."""
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import pmi_collocations
    rows = ["aa bb cc", "aa bb cc", "aa bb cc", "aa cc bb"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array(rows, pa.string())})).repartition(3)
    got = {(r["a"], r["b"]): (r["n_ab"], r["lift"])
           for r in pmi_collocations(ds, min_count=3, k=10).take_all()}
    assert got[("aa", "bb")] == (3, 3 * 12 / (4.0 * 4.0))
    assert got[("bb", "cc")] == (3, 3 * 12 / (4.0 * 4.0))
    assert ("aa", "cc") not in got  # n_ab=1 < min_count
