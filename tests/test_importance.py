"""DSIR importance weights (stages/importance.py) and retention cohorts
(stages/events.py): DuckDB-oracle parity on random fixtures plus
semantic sanity (target-domain docs must score higher)."""

import numpy as np
import pyarrow as pa


def _corpus(rng, n=120):
    # two vocabularies with some overlap: target docs talk about
    # "neural gradient tensor", raw about "market price trade"
    tgt_words = ["neural", "gradient", "tensor", "model", "train",
                 "shared", "common"]
    raw_words = ["market", "price", "trade", "stock", "bond",
                 "shared", "common"]
    docs, srcs = [], []
    for i in range(n):
        is_t = i % 4 == 0
        words = tgt_words if is_t else raw_words
        k = rng.integers(5, 30)
        docs.append(" ".join(rng.choice(words, k)))
        srcs.append("target" if is_t else f"src{i % 3}")
    return pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                     "text": pa.array(docs),
                     "source": pa.array(srcs)})


def test_dsir_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.importance import (dsir_logweights,
                                                         dsir_sql)
    rng = np.random.default_rng(31)
    docs = _corpus(rng)
    con = duckdb.connect()
    con.register("documents", docs)
    toks = ("SELECT doc_id, unnest(list_filter(regexp_extract_all("
            "lower(text), '[a-z0-9]+'), x -> length(x) > 1)) AS term "
            "FROM documents")
    want = con.execute(dsir_sql(256, "target", toks)).fetchall()
    out = dsir_logweights(rd.from_arrow(docs).repartition(4),
                          target_source="target", k=256)
    got = sorted((r["doc_id"], r["dsir_logw"])
                 for b in out.iter_batches(batch_format="pyarrow")
                 for r in b.to_pylist())
    assert got == [tuple(w) for w in want]
    # semantic check: target docs outrank raw docs on average
    w = dict(got)
    t_ids = [i for i in range(120) if i % 4 == 0]
    r_ids = [i for i in range(120) if i % 4 != 0]
    assert (np.mean([w[i] for i in t_ids])
            > np.mean([w[i] for i in r_ids]))


def test_dsir_empty_and_tokenless_docs(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.importance import dsir_logweights
    docs = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                     "text": pa.array(["a b c words here", "!!!", ""]),
                     "source": pa.array(["t", "r", "r"])})
    out = dsir_logweights(rd.from_arrow(docs), target_source="t", k=64)
    ids = sorted(r["doc_id"] for b in out.iter_batches(
        batch_format="pyarrow") for r in b.to_pylist())
    assert ids == [1]          # token-less docs emit nothing (SQL join)


def test_retention_cohorts_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.events import retention_cohorts
    rng = np.random.default_rng(32)
    n = 2000
    week = 7 * 24 * 3600 * 10**6
    ev = pa.table({
        "user_id": pa.array(rng.integers(0, 60, n), pa.int64()),
        "ts": pa.array(rng.integers(1400 * week, 1412 * week, n),
                       pa.timestamp("us"))})
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute("""
        WITH w AS (SELECT user_id,
                          CAST(epoch_us(ts) // 604800000000 AS BIGINT)
                            AS wk FROM events),
        f AS (SELECT user_id, min(wk) AS cw FROM w GROUP BY user_id),
        d AS (SELECT DISTINCT w.user_id, f.cw AS cohort_week,
                     w.wk - f.cw AS week_offset
              FROM w JOIN f USING (user_id))
        SELECT cohort_week, week_offset, count(*) FROM d
        GROUP BY 1, 2 ORDER BY 1, 2""").fetchall()
    out = retention_cohorts(rd.from_arrow(ev).repartition(5),
                            num_groups=7)
    got = sorted((r["cohort_week"], r["week_offset"], r["n_users"])
                 for b in out.iter_batches(batch_format="pyarrow")
                 for r in b.to_pylist())
    assert got == [tuple(w) for w in want]
    assert len(got) > 10       # fixture spans many cohort cells


def test_source_divergence_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.importance import (
        source_divergence, source_divergence_sql)
    rng = np.random.default_rng(33)
    docs = _corpus(rng)
    con = duckdb.connect()
    con.register("documents", docs)
    toks = ("SELECT doc_id, unnest(list_filter(regexp_extract_all("
            "lower(text), '[a-z0-9]+'), x -> length(x) > 1)) AS term "
            "FROM documents")
    want = con.execute(source_divergence_sql(256, toks)).fetchall()
    out = source_divergence(rd.from_arrow(docs).repartition(4), k=256)
    got = sorted((r["source"], r["kl_nats"]) for r in out.to_pylist())
    assert got == [tuple(w) for w in want]
    # the distinct-vocabulary target source must diverge most
    kl = dict(got)
    assert kl["target"] == max(kl.values())
