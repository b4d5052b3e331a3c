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


@pytest.fixture(scope="module")
def emb_ds(ray_session, sf_dir):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def test_embedding_dim_stats_matches_duckdb(emb_ds, sf_dir):
    from ics_search_engine_ray.stages.similarity import embedding_dim_stats
    got = sorted((r["dim"], r["n"], r["sum_q"], r["sumsq_q"], r["min_q"],
                  r["max_q"], r["mean"])
                 for r in embedding_dim_stats(emb_ds).take_all())
    want = sorted(duckdb.sql(f"""
WITH e AS (SELECT unnest(embedding) AS x,
                  generate_subscripts(embedding, 1) AS d
           FROM '{sf_dir}/embeddings.parquet'),
q AS (SELECT CAST(d - 1 AS BIGINT) AS dim,
             CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT) AS q
      FROM e)
SELECT dim, count(*), CAST(sum(q) AS BIGINT), CAST(sum(q * q) AS BIGINT),
       min(q), max(q), (CAST(sum(q) AS DOUBLE) / count(*)) / 1000000.0
FROM q GROUP BY dim""").fetchall())
    assert got == want and len(got) == 64


def test_embedding_dim_stats_hand_computed(ray_session):
    """2 vectors, 2 dims: micro-unit quantization, sums/min/max exact."""
    import ray.data as rd
    from ics_search_engine_ray.stages.similarity import embedding_dim_stats
    t = pa.table({"embedding": pa.array(
        [[0.000001, 1.0], [-0.000003, 3.0]],
        pa.list_(pa.float32()))})
    got = {r["dim"]: r for r in
           embedding_dim_stats(rd.from_arrow(t)).take_all()}
    assert got[0]["sum_q"] == -2 and got[0]["min_q"] == -3 \
        and got[0]["max_q"] == 1
    assert got[1]["sum_q"] == 4_000_000 and got[1]["mean"] == 2.0


def test_embedding_norm_topk_matches_duckdb(emb_ds, sf_dir):
    from ics_search_engine_ray.stages.similarity import embedding_norm_topk
    got = [(r["vec_id"], r["normsq_q"])
           for r in embedding_norm_topk(emb_ds, k=15).take_all()]
    want = duckdb.sql(f"""
WITH e AS (SELECT vec_id, unnest(embedding) AS x
           FROM '{sf_dir}/embeddings.parquet'),
q AS (SELECT vec_id,
             CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT) AS q
      FROM e),
n AS (SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS nsq FROM q
      GROUP BY vec_id)
SELECT vec_id, nsq FROM n ORDER BY nsq DESC, vec_id LIMIT 15""").fetchall()
    assert got == want and len(got) == 15


def test_embedding_norm_topk_smallest(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.similarity import embedding_norm_topk
    t = pa.table({"vec_id": pa.array([1, 2, 3], pa.int64()),
                  "embedding": pa.array([[2.0], [1.0], [3.0]],
                                        pa.list_(pa.float32()))})
    got = [r["vec_id"] for r in
           embedding_norm_topk(rd.from_arrow(t), k=2,
                               largest=False).take_all()]
    assert got == [2, 1]


def test_ks_per_source_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import ks_per_source
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "n_chars"])
    got = sorted((r["source"], r["n_s"], r["ks"])
                 for r in ks_per_source(ds).take_all())
    want = sorted(duckdb.sql(f"""
WITH c AS (SELECT source, CAST(n_chars AS BIGINT) AS v, count(*) AS c
           FROM '{sf_dir}/documents.parquet' GROUP BY source, v),
tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM c GROUP BY source),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS n_g FROM c),
grid AS (SELECT s.source, v.v
         FROM (SELECT DISTINCT source FROM c) s
         CROSS JOIN (SELECT DISTINCT v FROM c) v),
cum AS (SELECT grid.source, grid.v,
               CAST(sum(coalesce(c.c, 0)) OVER (
                 PARTITION BY grid.source ORDER BY grid.v) AS BIGINT) AS cum_s
        FROM grid LEFT JOIN c ON c.source = grid.source AND c.v = grid.v),
gcum AS (SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum_g
         FROM (SELECT v, sum(c) AS c FROM c GROUP BY v)),
d AS (SELECT cum.source, t.n_s,
             abs(CAST(cum_s AS DOUBLE) / t.n_s
                 - CAST(cum_g - cum_s AS DOUBLE) / (nn.n_g - t.n_s)) AS dd
      FROM cum JOIN gcum USING (v)
      JOIN tot t ON t.source = cum.source CROSS JOIN nn
      WHERE t.n_s < nn.n_g)
SELECT source, any_value(n_s), max(dd) FROM d GROUP BY source""").fetchall())
    assert got == want and len(got) > 1


def test_ks_per_source_hand_computed(ray_session):
    """Two sources with disjoint supports have KS = 1; identical
    distributions have KS ~ 0. Single-source input yields no rows."""
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import ks_per_source
    t = pa.table({
        "source": pa.array(["a"] * 4 + ["b"] * 4, pa.string()),
        "n_chars": pa.array([1, 2, 1, 2, 9, 8, 9, 8], pa.int64())})
    got = {r["source"]: r["ks"]
           for r in ks_per_source(rd.from_arrow(t)).take_all()}
    assert got == {"a": 1.0, "b": 1.0}
    t2 = pa.table({
        "source": pa.array(["a", "a", "b", "b"], pa.string()),
        "n_chars": pa.array([1, 2, 1, 2], pa.int64())})
    got2 = {r["source"]: r["ks"]
            for r in ks_per_source(rd.from_arrow(t2)).take_all()}
    assert got2 == {"a": 0.0, "b": 0.0}
    t3 = pa.table({"source": pa.array(["a", "a"], pa.string()),
                   "n_chars": pa.array([1, 2], pa.int64())})
    assert ks_per_source(rd.from_arrow(t3)).count() == 0


def test_ks_per_source_gate(ray_session):
    # Above value_gate the op no longer refuses: it falls back to the
    # equi-width histogram grid (round-5 scale path). The binned KS is a
    # lower bound on the exact KS, never negative, one row per source.
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import ks_per_source
    t = pa.table({
        "source": pa.array(["a", "b", "a", "b"], pa.string()),
        "n_chars": pa.array([1, 2, 3, 4], pa.int64())})
    exact = {r["source"]: r["ks"]
             for r in ks_per_source(rd.from_arrow(t)).take_all()}
    binned = {r["source"]: r["ks"]
              for r in ks_per_source(rd.from_arrow(t),
                                     value_gate=2).take_all()}
    assert set(binned) == set(exact) == {"a", "b"}
    for s in exact:
        assert 0.0 <= binned[s] <= exact[s] + 1e-12


def test_gini_per_nation_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import gini_per_nation
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_nationkey", "c_acctbal"])
    got = sorted((r["c_nationkey"], r["n_customers"], r["gini"])
                 for r in gini_per_nation(cust).take_all())
    want = sorted(duckdb.sql(f"""
WITH x AS (SELECT c_nationkey,
                  CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
           FROM '{sf_dir}/customer.parquet'),
r AS (SELECT c_nationkey, cents,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY cents) AS i,
             count(*) OVER (PARTITION BY c_nationkey) AS n
      FROM x)
SELECT CAST(c_nationkey AS BIGINT), CAST(any_value(n) AS BIGINT),
       CAST(2 * sum(i * cents) - (any_value(n) + 1) * sum(cents) AS DOUBLE)
         / (CAST(any_value(n) AS DOUBLE) * CAST(sum(cents) AS DOUBLE))
FROM r GROUP BY c_nationkey""").fetchall())
    assert got == want and len(got) == 25


def test_gini_hand_computed(ray_session):
    """Perfect equality -> G = 0; one customer holds everything ->
    G = (n-1)/n. Tie order does not change the value."""
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import gini_per_nation
    t = pa.table({
        "c_nationkey": pa.array([1] * 4 + [2] * 4, pa.int64()),
        "c_acctbal": pa.array([5.0, 5.0, 5.0, 5.0,
                               0.0, 0.0, 0.0, 8.0], pa.float64())})
    got = {r["c_nationkey"]: r["gini"]
           for r in gini_per_nation(rd.from_arrow(t)).take_all()}
    assert got[1] == 0.0
    assert got[2] == (4 - 1) / 4.0


def test_blocklist_filter_matches_duckdb(docs_ds, sf_dir):
    from ics_search_engine_ray.stages.pii import blocklist_filter
    bl = ["slow", "panic"]
    got = sorted((r["doc_id"], r["n_tokens"], r["n_blocked"],
                  r["blocked_frac"], r["keep"])
                 for r in blocklist_filter(docs_ds, bl).take_all())
    want = sorted(duckdb.sql(f"""
WITH toks AS (SELECT doc_id, list_filter(regexp_extract_all(lower(text),
              '[a-z0-9]+'), x -> length(x) > 1) AS l
              FROM '{sf_dir}/documents.parquet'),
c AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(l, x -> x IN ('slow', 'panic')))
             AS BIGINT) AS n_blocked
      FROM toks)
SELECT doc_id, n_tokens, n_blocked,
       CASE WHEN n_tokens = 0 THEN 0.0
            ELSE CAST(n_blocked AS DOUBLE) / n_tokens END,
       (CASE WHEN n_tokens = 0 THEN 0.0
             ELSE CAST(n_blocked AS DOUBLE) / n_tokens END) <= 0.0
FROM c""").fetchall())
    assert got == want and len(got) > 0
    assert any(not k for *_, k in got)  # the filter actually drops docs


def test_blocklist_filter_edge_cases(ray_session):
    """Empty docs keep; max_frac thresholding; single-char tokens are
    not tokens; blocklist matching is case-insensitive both ways."""
    import ray.data as rd
    from ics_search_engine_ray.stages.pii import blocklist_filter
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["", "ok ok BAD ok", "bad bad ok ok", "b bad"],
                         pa.string())})
    rows = {r["doc_id"]: r for r in
            blocklist_filter(rd.from_arrow(t), ["BAD"],
                             max_frac=0.25).take_all()}
    assert rows[1]["keep"] and rows[1]["n_tokens"] == 0
    assert rows[2]["n_blocked"] == 1 and rows[2]["keep"]       # 1/4 <= .25
    assert rows[3]["n_blocked"] == 2 and not rows[3]["keep"]   # 1/2 > .25
    assert rows[4]["n_tokens"] == 1 and not rows[4]["keep"]    # 1/1 > .25


def test_source_vocab_jaccard_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import (
        source_vocab_jaccard)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "source"])
    got = sorted(map(tuple, source_vocab_jaccard(ds).to_pandas().values
                     .tolist()))
    want = sorted(duckdb.sql(f"""
WITH ts AS (SELECT DISTINCT source,
  unnest(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                     x -> length(x) > 1)) AS term
  FROM '{sf_dir}/documents.parquet'),
v AS (SELECT source, CAST(count(*) AS BIGINT) AS nv FROM ts
      GROUP BY source),
p AS (SELECT a.source AS s1, b.source AS s2,
             CAST(count(*) AS BIGINT) AS inter
      FROM ts a JOIN ts b ON a.term = b.term AND a.source < b.source
      GROUP BY s1, s2),
grid AS (SELECT a.source AS s1, b.source AS s2, a.nv AS v1, b.nv AS v2
         FROM v a JOIN v b ON a.source < b.source)
SELECT grid.s1, grid.s2, coalesce(p.inter, 0), grid.v1, grid.v2,
       CASE WHEN grid.v1 + grid.v2 - coalesce(p.inter, 0) = 0 THEN 0.0
            ELSE CAST(coalesce(p.inter, 0) AS DOUBLE)
                 / (grid.v1 + grid.v2 - coalesce(p.inter, 0)) END
FROM grid LEFT JOIN p ON p.s1 = grid.s1 AND p.s2 = grid.s2""").fetchall())
    assert got == want and len(got) == 190


def test_source_vocab_jaccard_hand_computed(ray_session):
    """Disjoint vocabularies -> 0; identical -> 1; partial overlap
    exact; zero-pair rows are emitted (unlike a bare inner join)."""
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import (
        source_vocab_jaccard)
    t = pa.table({
        "source": pa.array(["a", "b", "c"], pa.string()),
        "text": pa.array(["aa bb", "aa bb", "xx yy"], pa.string())})
    rows = {(r["s1"], r["s2"]): r
            for r in source_vocab_jaccard(rd.from_arrow(t)).to_pylist()}
    assert rows[("a", "b")]["jaccard"] == 1.0
    assert rows[("a", "c")]["jaccard"] == 0.0
    assert rows[("a", "c")]["inter"] == 0
    assert len(rows) == 3


def test_source_vocab_jaccard_gate(ray_session):
    """Above the 2^S mask gate the pair-join scale path takes over (r4
    verdict item 1 — no gate-refusal): same schema, sane values. Path
    equality vs the mask path is proven in test_scale_paths.py."""
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import (
        source_vocab_jaccard)
    t = pa.table({"source": pa.array(["a", "b", "c"], pa.string()),
                  "text": pa.array(["apple berry", "apple cherry",
                                    "durian fig"], pa.string())})
    out = source_vocab_jaccard(rd.from_arrow(t), source_gate=2).to_pandas()
    got = {(r.s1, r.s2): r.jaccard for r in out.itertuples()}
    assert got[("a", "b")] == pytest.approx(1 / 3)   # {apple,berry} vs {apple,cherry}
    assert got.get(("a", "c"), 0.0) == 0.0


def test_cluster_canonical_hand_computed(ray_session):
    """Max quality wins; ties break to the lowest id; singleton clusters
    pass through; member counts exact."""
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup_text import cluster_canonical
    t = pa.table({
        "cluster": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
        "doc_id": pa.array([10, 11, 12, 20, 31, 30], pa.int64()),
        "n_chars": pa.array([5, 9, 9, 7, 4, 4], pa.int64())})
    got = [(r["cluster"], r["keep_id"], r["quality"], r["n_members"])
           for r in cluster_canonical(rd.from_arrow(t)).take_all()]
    assert got == [(1, 11, 9, 3), (2, 20, 7, 1), (3, 30, 4, 2)]


def test_cluster_canonical_limb_guard(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup_text import cluster_canonical
    t = pa.table({"cluster": pa.array([1], pa.int64()),
                  "doc_id": pa.array([1 << 33], pa.int64()),
                  "n_chars": pa.array([1], pa.int64())})
    with pytest.raises(Exception, match="limb"):
        cluster_canonical(rd.from_arrow(t)).take_all()


def test_user_features_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.events import user_features
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts", "value"])
    got = sorted(map(tuple,
                     user_features(ev).to_pandas().values.tolist()))
    want = sorted(map(tuple, duckdb.sql(f"""
WITH q AS (SELECT user_id, CAST(round(value * 100, 0) AS BIGINT) AS cents,
                  ts, event_type FROM '{sf_dir}/events.parquet')
SELECT user_id, count(*), CAST(count(DISTINCT event_type) AS BIGINT),
       CAST(sum(cents) AS BIGINT), max(cents), min(ts), max(ts),
       CAST(date_diff('microsecond', min(ts), max(ts)) // 86400000000
            AS BIGINT),
       (CAST(sum(cents) AS DOUBLE) / count(*)) / 100.0
FROM q GROUP BY user_id""").df().values.tolist()))
    assert got == want and len(got) > 0


def test_user_features_mask_merges_across_batches(ray_session):
    """A user whose events land in different partitions still gets an
    exact distinct-type count (partial masks OR together)."""
    import ray.data as rd
    from ics_search_engine_ray.stages.events import user_features
    ts = pa.array([1_000_000 * i for i in range(6)], pa.timestamp("us"))
    t = pa.table({
        "user_id": pa.array([7, 7, 7, 7, 8, 8], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "c", "a", "a"],
                               pa.string()),
        "ts": ts,
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 0.5, 0.125],
                          pa.float64())})
    ds = rd.from_arrow(t).repartition(4)
    rows = {r["user_id"]: r for r in user_features(ds).take_all()}
    assert rows[7]["n_types"] == 3 and rows[7]["n_events"] == 4
    assert rows[7]["total_value_cents"] == 1000
    # half-away: 0.125*100 = 12.5 -> 13 cents (not banker's 12)
    assert rows[8]["total_value_cents"] == 50 + 13
    assert rows[8]["span_days"] == 0


def test_ngram_containment_asymmetric(ray_session):
    """A small doc fully quoted inside a big one: containment = 1.0 even
    though Jaccard is far below threshold (the PPJoin prune must NOT
    fire for containment)."""
    import ray.data as rd
    from ics_search_engine_ray.stages.dedup_text import (
        ngram_containment_pairs, ngram_jaccard_pairs)
    small = "alpha beta gamma delta"
    big = small + " " + " ".join(f"w{i} x{i} y{i}" for i in range(30))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([small, big], pa.string())}))
    got = ngram_containment_pairs(ds, n=3, threshold=0.9)
    assert got == [(1, 2, 1.0)]
    assert ngram_jaccard_pairs(ds, n=3, threshold=0.9) == []


def test_ngram_containment_matches_duckdb(docs_ds, sf_dir):
    from ics_search_engine_ray.stages.dedup_text import (
        ngram_containment_pairs)
    got = ngram_containment_pairs(docs_ds, n=3, threshold=0.4)
    want = [tuple(r) for r in duckdb.sql(f"""
WITH w AS (SELECT doc_id,
        CASE WHEN trim(text) = '' THEN []::VARCHAR[]
             ELSE string_split_regex(trim(text), '\\s+') END AS ws
  FROM '{sf_dir}/documents.parquet'),
s AS (SELECT doc_id,
    CASE WHEN len(ws) = 0 THEN []::VARCHAR[]
         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
         ELSE list_distinct(list_transform(range(1, len(ws) - 1),
              i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) END AS sh
  FROM w)
SELECT a.doc_id, b.doc_id,
       CAST(round(len(list_intersect(a.sh, b.sh)) * 1.0
             / least(len(a.sh), len(b.sh)), 6) AS DOUBLE)
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE len(a.sh) > 0 AND len(b.sh) > 0
  AND len(list_intersect(a.sh, b.sh)) * 1.0
      / least(len(a.sh), len(b.sh)) >= 0.4
ORDER BY 1, 2""").fetchall()]
    assert got == want and len(got) > 0


def test_referential_integrity_detects_violations(ray_session):
    """Each direction counts its own violation class exactly."""
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import referential_integrity
    li = rd.from_arrow(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 99], pa.int64())}))  # 99 orphan
    od = rd.from_arrow(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),        # 3 childless
        "o_custkey": pa.array([10, 10, 77], pa.int64())}))    # 77 orphan
    cu = rd.from_arrow(pa.table({
        "c_custkey": pa.array([10, 20], pa.int64())}))        # 20 inactive
    got = {r["check_name"]: r["n"]
           for r in referential_integrity(li, od, cu).to_pylist()}
    assert got == {"customers_no_orders": 1, "lineitem_orphans": 1,
                   "orders_childless": 1, "orders_orphan_cust": 1}


def test_referential_integrity_clean(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import referential_integrity
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"])
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    cu = rd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey"])
    got = {r["check_name"]: r["n"]
           for r in referential_integrity(li, od, cu).to_pylist()}
    want = {c: duckdb.sql(q).fetchone()[0] for c, q in {
        "customers_no_orders": f"""SELECT count(*) FROM
          '{sf_dir}/customer.parquet' WHERE NOT EXISTS (SELECT 1 FROM
          '{sf_dir}/orders.parquet' WHERE o_custkey = c_custkey)""",
        "lineitem_orphans": f"""SELECT count(*) FROM
          '{sf_dir}/lineitem.parquet' WHERE NOT EXISTS (SELECT 1 FROM
          '{sf_dir}/orders.parquet' WHERE o_orderkey = l_orderkey)""",
        "orders_childless": f"""SELECT count(*) FROM
          '{sf_dir}/orders.parquet' WHERE NOT EXISTS (SELECT 1 FROM
          '{sf_dir}/lineitem.parquet' WHERE l_orderkey = o_orderkey)""",
        "orders_orphan_cust": f"""SELECT count(*) FROM
          '{sf_dir}/orders.parquet' WHERE NOT EXISTS (SELECT 1 FROM
          '{sf_dir}/customer.parquet' WHERE c_custkey = o_custkey)""",
    }.items()}
    assert got == want


def test_revenue_seasonality_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import revenue_seasonality
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_shipdate", "l_extendedprice",
                                  "l_discount"])
    got = [(r["month"], r["n_items"], r["revenue"])
           for r in revenue_seasonality(li).take_all()]
    want = [tuple(r) for r in duckdb.sql(f"""
WITH f AS (SELECT month(l_shipdate) AS m,
  CAST(round(l_extendedprice * 100, 0) AS BIGINT)
  * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS ru
  FROM '{sf_dir}/lineitem.parquet')
SELECT CAST(m AS BIGINT), count(*),
       CAST(CAST(sum(ru) AS BIGINT) AS DOUBLE) / 10000.0
FROM f GROUP BY m ORDER BY m""").fetchall()]
    assert got == want and len(got) == 12


def test_hourly_activity_matches_duckdb(ray_session, sf_dir):
    import ray.data as rd
    from ics_search_engine_ray.stages.events import hourly_activity
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    got = [(r["event_type"], r["hour"], r["n_events"], r["total_value"])
           for r in hourly_activity(ev).take_all()]
    want = [tuple(r) for r in duckdb.sql(f"""
WITH q AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS h,
  CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM '{sf_dir}/events.parquet')
SELECT event_type, h, count(*),
       CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100.0
FROM q GROUP BY event_type, h ORDER BY event_type, h""").fetchall()]
    assert got == want and len(got) > 0


def test_hourly_activity_cross_partition_merge(ray_session):
    """The same (type, hour) cell split across partitions merges exactly;
    half-away cent rounding applies (0.125 -> 13)."""
    import ray.data as rd
    from ics_search_engine_ray.stages.events import hourly_activity
    ts = pa.array([3_600_000_000 * 5 + i for i in range(4)],
                  pa.timestamp("us"))
    t = pa.table({"event_type": pa.array(["a"] * 4, pa.string()),
                  "ts": ts,
                  "value": pa.array([1.0, 2.0, 0.125, 0.125],
                                    pa.float64())})
    got = hourly_activity(rd.from_arrow(t).repartition(4)).take_all()
    assert got == [{"event_type": "a", "hour": 5, "n_events": 4,
                    "total_value": (100 + 200 + 13 + 13) / 100.0}]
