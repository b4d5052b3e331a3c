"""Round-4 wave-9b: quoted-phrase constraints in boolean search,
per-source vocabulary stats and exact distributed value/hour correlation
(both vs DuckDB)."""

import numpy as np
import pyarrow as pa


def test_boolean_phrase_constraints(ray_session, tmp_path):
    import pyarrow.parquet as pq
    from ics_search_engine_ray.config import DEFAULT_CONFIG
    from ics_search_engine_ray.pipelines.build import build_index_from_texts
    from ics_search_engine_ray.query.engine import SearchIndex

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta merge"),
        (3, "beta alpha gamma"),          # phrase in wrong order
        (4, "alpha beta alpha beta"),
        (5, "gamma delta alpha"),
    ]
    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows])}), src)
    out = str(tmp_path / "idx")
    build_index_from_texts(src, out, DEFAULT_CONFIG.with_(stem=False),
                           skip_dedup=True)
    si = SearchIndex(out)

    # bare phrase: only docs with consecutive "alpha beta"
    ids = {r.doc_id for r in si.search_boolean('"alpha beta"', k=10)}
    assert ids == {1, 2, 4}
    # phrase + exclusion word
    ids = {r.doc_id for r in si.search_boolean('"alpha beta" -merge', k=10)}
    assert ids == {1, 4}
    # negated phrase: docs with both words but NOT consecutively still pass
    ids = {r.doc_id for r in si.search_boolean('alpha -"alpha beta"', k=10)}
    assert ids == {3, 5}
    # phrase that matches nothing empties the result
    assert si.search_boolean('"delta gamma" alpha', k=10) == []
    # scores equal plain BM25 restricted to the phrase candidates
    res = si.search_boolean('"alpha beta"', k=10)
    plain = {r.doc_id: r.score for r in si.search("alpha beta", k=10)}
    for r in res:
        assert r.score == plain[r.doc_id]
    si.close()


def test_vocab_stats_per_source(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import \
        vocab_stats_per_source
    rng = np.random.default_rng(41)
    words = [f"w{i}" for i in range(40)] + ["a"]      # 'a' dropped (len 1)
    n = 150
    docs = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array([" ".join(rng.choice(words,
                                               rng.integers(3, 25)))
                          for _ in range(n)]),
        "source": pa.array([f"s{i % 4}" for i in range(n)])})
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute("""
        WITH toks AS (SELECT doc_id, unnest(list_filter(
               regexp_extract_all(lower(text), '[a-z0-9]+'),
               x -> length(x) > 1)) AS term FROM documents),
        st AS (SELECT d.source, t.term
               FROM toks t JOIN documents d USING (doc_id))
        SELECT source, count(*), count(DISTINCT term),
               round(CAST(count(DISTINCT term) AS DOUBLE)/count(*), 6)
        FROM st GROUP BY source ORDER BY source""").fetchall()
    out = vocab_stats_per_source(rd.from_arrow(docs).repartition(4))
    got = sorted((r["source"], r["n_tokens"], r["n_distinct"], r["ttr"])
                 for b in out.iter_batches(batch_format="pyarrow")
                 for r in b.to_pylist())
    assert got == [tuple(w) for w in want]


def test_value_hour_corr(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.events import value_hour_corr
    rng = np.random.default_rng(42)
    n = 3000
    ev = pa.table({
        "user_id": pa.array(rng.integers(0, 40, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 10**15, n), pa.timestamp("us")),
        "value": pa.array(np.round(rng.uniform(0, 500, n), 2))})
    # one constant-value user: zero variance must emit nothing
    const_rows = pa.table({
        "user_id": pa.array([99] * 5, pa.int64()),
        "ts": pa.array(rng.integers(0, 10**15, 5), pa.timestamp("us")),
        "value": pa.array([7.0] * 5)})
    ev = pa.concat_tables([ev, const_rows])
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute("""
        WITH z AS (SELECT user_id,
                          CAST(round(value*100,0) AS BIGINT) AS cents,
                          CAST(hour(ts) AS BIGINT) AS hr FROM events),
        m AS (SELECT user_id, count(*) n, sum(cents) sx, sum(hr) sy,
                     sum(cents*hr) sxy, sum(cents*cents) sx2,
                     sum(hr*hr) sy2 FROM z GROUP BY user_id)
        SELECT user_id,
               round(CAST(n*sxy - sx*sy AS DOUBLE)
                     / (sqrt(CAST(n*sx2 - sx*sx AS DOUBLE))
                        * sqrt(CAST(n*sy2 - sy*sy AS DOUBLE))), 6)
        FROM m WHERE n*sx2 > sx*sx AND n*sy2 > sy*sy
        ORDER BY user_id""").fetchall()
    out = value_hour_corr(rd.from_arrow(ev).repartition(5))
    got = sorted((r["user_id"], r["corr_vh"])
                 for b in out.iter_batches(batch_format="pyarrow")
                 for r in b.to_pylist())
    assert got == [tuple(w) for w in want]
    assert 99 not in dict(got)


def test_burst_max_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.events import burst_max
    rng = np.random.default_rng(43)
    n = 2500
    ts = rng.integers(0, 3600 * 10**6, n)      # one hour, dense bursts
    ts[10] = ts[11] = ts[12]                   # exact-tie peers
    ev = pa.table({
        "user_id": pa.array(rng.integers(0, 30, n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us"))})
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute("""
        WITH c AS (SELECT user_id,
                          count(*) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 60 SECONDS PRECEDING
                          AND CURRENT ROW) AS burst FROM events)
        SELECT user_id, CAST(max(burst) AS BIGINT) FROM c
        GROUP BY user_id ORDER BY user_id""").fetchall()
    out = burst_max(rd.from_arrow(ev).repartition(5), window_s=60,
                    num_groups=7)
    got = sorted((r["user_id"], r["max_burst"])
                 for b in out.iter_batches(batch_format="pyarrow")
                 for r in b.to_pylist())
    assert got == [tuple(w) for w in want]


def test_weighted_sample_matches_duckdb_and_is_biased(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.splits import (weighted_sample,
                                                     weighted_sample_sql)
    rng = np.random.default_rng(44)
    n = 4000
    # heavy tail: ids < 200 get 100x the weight of the rest
    w = np.where(np.arange(n) < 200, 1000, 10).astype(np.int64)
    docs = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                     "n_chars": pa.array(w, pa.int64())})
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(
        weighted_sample_sql(100, "n_chars", "doc_id",
                            "documents")).fetchall()
    out = weighted_sample(rd.from_arrow(docs).repartition(6), k=100,
                          weight_col="n_chars")
    got = [(r["doc_id"], r["samp_key"])
           for b in out.iter_batches(batch_format="pyarrow")
           for r in b.to_pylist()]
    assert sorted(got) == sorted(tuple(x) for x in want)
    # heavy rows must be strongly over-represented
    heavy = sum(1 for d, _ in got if d < 200)
    assert heavy > 50


def test_search_near_window_semantics(ray_session, tmp_path):
    import pyarrow.parquet as pq
    from ics_search_engine_ray.config import DEFAULT_CONFIG
    from ics_search_engine_ray.pipelines.build import build_index_from_texts
    from ics_search_engine_ray.query.engine import SearchIndex

    filler = " ".join(f"pad{i}" for i in range(20))
    rows = [
        (1, "alpha beta nearby"),                       # window 2
        (2, f"alpha {filler} beta"),                    # window 22
        (3, "beta words alpha"),                        # window 3
        (4, "alpha only here"),
    ]
    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows])}), src)
    out = str(tmp_path / "idx")
    build_index_from_texts(src, out, DEFAULT_CONFIG.with_(stem=False),
                           skip_dedup=True)
    si = SearchIndex(out)
    assert {r.doc_id for r in si.search_near("alpha beta", window=4)} \
        == {1, 3}
    assert {r.doc_id for r in si.search_near("alpha beta", window=30)} \
        == {1, 2, 3}
    assert si.search_near("alpha beta", window=1) == []
    # scores equal plain BM25 on the same docs
    plain = {r.doc_id: r.score for r in si.search("alpha beta", k=10)}
    for r in si.search_near("alpha beta", window=30):
        assert r.score == plain[r.doc_id]
    si.close()
