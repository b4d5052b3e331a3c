"""Round-4 wave-10 event operators vs DuckDB: per-key median/MAD,
LAG-semantics debounce, A/B funnel conversion."""

import numpy as np
import pyarrow as pa


def _events(rng, n=3000, n_users=40):
    return pa.table({
        "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
        "event_type": pa.array(
            rng.choice(["signup", "view", "purchase", "error"], n)),
        "ts": pa.array(rng.integers(0, 10**12, n), pa.timestamp("us")),
        "event_id": pa.array(np.arange(n), pa.int64()),
        "value": pa.array(np.round(rng.uniform(0, 500, n), 2))})


def test_median_abs_dev_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.events import median_abs_dev
    rng = np.random.default_rng(51)
    ev = _events(rng)
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute("""
        WITH z AS (SELECT user_id,
                          CAST(CAST(round(value*100,0) AS BIGINT)
                               AS DOUBLE) AS cents FROM events),
        m AS (SELECT user_id, median(cents) AS med FROM z
              GROUP BY user_id),
        d AS (SELECT z.user_id, abs(z.cents - m.med) AS dev, m.med
              FROM z JOIN m USING (user_id))
        SELECT user_id, round(any_value(med)/100.0, 6),
               round(median(dev)/100.0, 6)
        FROM d GROUP BY user_id ORDER BY user_id""").fetchall()
    out = median_abs_dev(rd.from_arrow(ev).repartition(5), num_groups=7)
    got = sorted((r["user_id"], r["median_value"], r["mad"])
                 for b in out.iter_batches(batch_format="pyarrow")
                 for r in b.to_pylist())
    assert got == [tuple(w) for w in want]


def test_drop_rapid_repeats_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.events import drop_rapid_repeats
    rng = np.random.default_rng(52)
    n = 2000
    ev = pa.table({
        "user_id": pa.array(rng.integers(0, 10, n), pa.int64()),
        "event_type": pa.array(rng.choice(["a", "b"], n)),
        # dense second-scale timestamps: many sub-threshold gaps
        "ts": pa.array(rng.integers(0, 2 * 10**9, n),
                       pa.timestamp("us")),
        "event_id": pa.array(np.arange(n), pa.int64())})
    con = duckdb.connect()
    con.register("events", ev)
    want = [r[0] for r in con.execute("""
        WITH g AS (SELECT event_id,
                          date_diff('microsecond',
                                    lag(ts) OVER (PARTITION BY user_id,
                                                  event_type
                                                  ORDER BY ts, event_id),
                                    ts) AS gap FROM events)
        SELECT event_id FROM g
        WHERE gap IS NULL OR gap >= 5000000
        ORDER BY event_id""").fetchall()]
    assert 0 < len(want) < n, "fixture must drop some and keep some"
    out = drop_rapid_repeats(rd.from_arrow(ev).repartition(4),
                             min_gap_s=5.0, num_groups=3)
    got = sorted(r["event_id"] for b in out.iter_batches(
        batch_format="pyarrow") for r in b.to_pylist())
    assert got == want


def test_ab_funnel_matches_brute(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.events import ab_funnel
    from ics_search_engine_ray.stages.splits import weyl_hash
    rng = np.random.default_rng(53)
    ev = _events(rng, n=5000, n_users=60)
    out = ab_funnel(rd.from_arrow(ev).repartition(5))
    rows = {r["variant"]: r for r in out.to_pylist()}
    assert set(rows) == {"A", "B"}

    # brute-force reference
    by_user: dict = {}
    for r in ev.to_pylist():
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"]))
    n_users = {"A": 0, "B": 0}
    n_conv = {"A": 0, "B": 0}
    for u, evs in by_user.items():
        evs.sort()
        if not any(t == "signup" for _, _, t in evs):
            continue
        v = "A" if weyl_hash(np.array([u]), 5)[0] % 2 == 0 else "B"
        n_users[v] += 1
        want_i = 0
        steps = ["signup", "view", "purchase"]
        for _, _, t in evs:
            if want_i < 3 and t == steps[want_i]:
                want_i += 1
        if want_i == 3:
            n_conv[v] += 1
    for v in ("A", "B"):
        assert rows[v]["n_users"] == n_users[v]
        assert rows[v]["n_converted"] == n_conv[v]


def test_window_topk_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.events import window_topk
    rng = np.random.default_rng(54)
    ev = _events(rng, n=4000, n_users=25)
    con = duckdb.connect()
    con.register("events", ev)
    w = 3600 * 10**6                 # 1-hour windows on the us clock
    want = con.execute(f"""
        WITH z AS (SELECT user_id, epoch_us(ts) // {w} AS win,
                          CAST(round(value*100,0) AS BIGINT) AS cents
                   FROM events),
        s AS (SELECT win, user_id, sum(cents) AS cents FROM z
              GROUP BY 1, 2),
        r AS (SELECT win, user_id, cents,
                     row_number() OVER (PARTITION BY win
                                        ORDER BY cents DESC, user_id)
                       AS rk FROM s)
        SELECT make_timestamp(win * {w}), CAST(rk AS BIGINT), user_id,
               CAST(cents AS DOUBLE)/100.0
        FROM r WHERE rk <= 2 ORDER BY 1, 2""").fetchall()
    out = window_topk(rd.from_arrow(ev).repartition(5),
                      window_s=3600, k=2)
    got = sorted((r["win_start"], r["rank"], r["user_id"],
                  r["total_value"])
                 for b in out.iter_batches(batch_format="pyarrow")
                 for r in b.to_pylist())
    assert got == [tuple(x) for x in want]


def test_overlap_topk_brute(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import overlap_topk
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "alpha beta gamma",          # 3 overlap
            "alpha alpha alpha",         # 1 (distinct!)
            "beta gamma",                # 2
            "nothing relevant here",     # 0 -> excluded
            "alpha beta gamma delta"])}) # 3, tie with doc 1
    out = overlap_topk(rd.from_arrow(docs).repartition(3),
                       ["alpha", "beta", "gamma"], k=3)
    got = [(r["doc_id"], r["overlap"]) for r in
           pa.concat_tables([b for b in out.iter_batches(
               batch_format="pyarrow")]).to_pylist()]
    assert got == [(1, 3), (5, 3), (3, 2)]


def test_profile_table_with_nulls(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.relational import profile_table
    t = pa.table({
        "a": pa.array([1, 2, 2, None, 5], pa.int64()),
        "b": pa.array(["x", None, None, "x", "y"]),
        "c": pa.array([1.5, -0.0, 0.0, 1.5, None], pa.float64())})
    con = duckdb.connect()
    con.register("orders", t)
    want = con.execute("""
        SELECT 'a', count(*), count(*)-count(a), count(DISTINCT a)
        FROM orders UNION ALL
        SELECT 'b', count(*), count(*)-count(b), count(DISTINCT b)
        FROM orders UNION ALL
        SELECT 'c', count(*), count(*)-count(c), count(DISTINCT c)
        FROM orders ORDER BY 1""").fetchall()
    out = profile_table(rd.from_arrow(t).repartition(3), ["a", "b", "c"])
    got = sorted(tuple(r.values()) for r in out.to_pylist())
    assert got == [tuple(w) for w in want]


def test_winsorize_values_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.events import winsorize_values
    rng = np.random.default_rng(55)
    ev = _events(rng, n=2500)
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute("""
        WITH b AS (SELECT event_type,
                          round(quantile_cont(value, 0.05), 6) AS lo,
                          round(quantile_cont(value, 0.95), 6) AS hi
                   FROM events GROUP BY event_type)
        SELECT event_id, least(greatest(value, lo), hi)
        FROM events JOIN b USING (event_type)
        ORDER BY event_id""").fetchall()
    out = winsorize_values(rd.from_arrow(ev).repartition(5))
    got = sorted((r["event_id"], r["value_w"])
                 for b in out.iter_batches(batch_format="pyarrow")
                 for r in b.to_pylist())
    assert got == [tuple(w) for w in want]
    # clipping is real: some rows changed, most did not
    orig = dict(zip(ev.column("event_id").to_pylist(),
                    ev.column("value").to_pylist()))
    changed = sum(1 for i, v in got if v != orig[i])
    assert 0 < changed < len(got) // 2


def test_distinctive_terms_semantics(ray_session):
    """The planted marker word of each source must top its z ranking."""
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import \
        distinctive_terms
    rng = np.random.default_rng(56)
    common = ["the", "quick", "brown", "fox", "jumps"]
    docs, srcs = [], []
    for i in range(90):
        s = f"s{i % 3}"
        words = list(rng.choice(common, 12)) + [f"marker{i % 3}"] * 3
        docs.append(" ".join(words))
        srcs.append(s)
    t = pa.table({"doc_id": pa.array(np.arange(90), pa.int64()),
                  "text": pa.array(docs), "source": pa.array(srcs)})
    out = distinctive_terms(rd.from_arrow(t).repartition(4), k=3)
    rows = [r for b in out.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()]
    top = {r["source"]: r["term"] for r in rows if r["rank"] == 1}
    assert top == {"s0": "marker0", "s1": "marker1", "s2": "marker2"}


def test_event_type_entropy_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.events import event_type_entropy
    rng = np.random.default_rng(57)
    ev = _events(rng, n=2500, n_users=30)
    # one single-action user: entropy must be exactly 0
    ev = pa.concat_tables([ev, pa.table({
        "user_id": pa.array([99] * 6, pa.int64()),
        "event_type": pa.array(["view"] * 6),
        "ts": pa.array(range(6), pa.timestamp("us")),
        "event_id": pa.array(range(10000, 10006), pa.int64()),
        "value": pa.array([1.0] * 6)})])
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute("""
        WITH c AS (SELECT user_id, event_type,
                          CAST(count(*) AS DOUBLE) AS c FROM events
                   GROUP BY 1, 2),
        n AS (SELECT user_id, sum(c) AS n FROM c GROUP BY user_id),
        e AS (SELECT c.user_id,
                     CAST(round((c.c/n.n) * ln(c.c/n.n) * 1e9, 0)
                          AS BIGINT) AS nano
              FROM c JOIN n USING (user_id))
        SELECT e.user_id, CAST(any_value(n.n) AS BIGINT),
               CAST(-sum(e.nano) AS DOUBLE) / 1e9
        FROM e JOIN n USING (user_id) GROUP BY e.user_id
        ORDER BY e.user_id""").fetchall()
    out = event_type_entropy(rd.from_arrow(ev).repartition(5),
                             num_groups=7)
    got = sorted((r["user_id"], r["n_events"], r["entropy_nats"])
                 for b in out.iter_batches(batch_format="pyarrow")
                 for r in b.to_pylist())
    assert got == [tuple(w) for w in want]
    assert dict((u, e) for u, _, e in got)[99] == 0.0


def test_lang_mix_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.text_analysis import lang_mix
    rng = np.random.default_rng(58)
    n = 400
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "source": pa.array([f"s{i % 5}" for i in range(n)]),
        "lang": pa.array(rng.choice(["en", "de", "fr"], n))})
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute("""
        WITH p AS (SELECT source, lang, count(*) AS n FROM documents
                   GROUP BY 1, 2),
        t AS (SELECT source, sum(n) AS tot FROM p GROUP BY source)
        SELECT p.source, p.lang, p.n,
               round(CAST(p.n AS DOUBLE)/CAST(t.tot AS DOUBLE), 6)
        FROM p JOIN t USING (source) ORDER BY 1, 2""").fetchall()
    out = lang_mix(rd.from_arrow(t).repartition(4))
    got = sorted((r["source"], r["lang"], r["n_docs"], r["frac"])
                 for b in out.iter_batches(batch_format="pyarrow")
                 for r in b.to_pylist())
    assert got == [tuple(w) for w in want]


def test_window_buckets_truncate_like_sql(ray_session):
    """numpy // floors, DuckDB // truncates toward zero: pre-epoch
    timestamps must bucket identically on both sides."""
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.events import (retention_cohorts,
                                                     window_topk)
    ev = pa.table({
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "ts": pa.array([-7 * 604800000000 // 2, -1, 1,
                        3 * 604800000000], pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0])})
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
    out = retention_cohorts(rd.from_arrow(ev), num_groups=2)
    got = sorted((r["cohort_week"], r["week_offset"], r["n_users"])
                 for b in out.iter_batches(batch_format="pyarrow")
                 for r in b.to_pylist())
    assert got == [tuple(w) for w in want]
    # window_topk on the same pre-epoch data must not crash and must
    # produce one row per (window, rank)
    rows = [r for b in window_topk(rd.from_arrow(ev), window_s=604800,
                                   k=1).iter_batches(
                batch_format="pyarrow") for r in b.to_pylist()]
    assert len(rows) == len({(r["win_start"], r["rank"]) for r in rows})


def test_empty_input_guards(ray_session):
    """ab_funnel / winsorize_values / distinctive_terms return typed
    empty results (not ArrowInvalid) on inputs with no qualifying rows."""
    import ray.data as rd
    from ics_search_engine_ray.stages.events import (ab_funnel,
                                                     winsorize_values)
    from ics_search_engine_ray.stages.text_analysis import \
        distinctive_terms
    ev = pa.table({"user_id": pa.array([1, 2], pa.int64()),
                   "event_type": pa.array(["error", "error"]),
                   "ts": pa.array([1, 2], pa.timestamp("us")),
                   "event_id": pa.array([1, 2], pa.int64()),
                   "value": pa.array([1.0, 2.0])})
    out = ab_funnel(rd.from_arrow(ev))       # zero 'signup' rows
    assert out.num_rows == 0
    empty_ev = ev.slice(0, 0)
    assert winsorize_values(rd.from_arrow(empty_ev)).count() == 0
    docs = pa.table({"doc_id": pa.array([1], pa.int64()),
                     "text": pa.array(["!!!"]),     # no 2+-char tokens
                     "source": pa.array(["s"])})
    assert distinctive_terms(rd.from_arrow(docs)).num_rows == 0


def test_value_trend_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.events import value_trend
    rng = np.random.default_rng(59)
    n = 2500
    ev = pa.table({
        "user_id": pa.array(rng.integers(0, 30, n), pa.int64()),
        "ts": pa.array(rng.integers(788918400 * 10**6,
                                    999918400 * 10**6, n),
                       pa.timestamp("us")),
        "value": pa.array(np.round(rng.uniform(0, 500, n), 2))})
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute("""
        WITH z AS (SELECT user_id,
                          (epoch_us(ts) - 788918400000000)
                            // 3600000000 AS x,
                          CAST(round(value*100,0) AS BIGINT) AS y
                   FROM events),
        m AS (SELECT user_id, count(*) n, sum(x) sx, sum(y) sy,
                     sum(x*y) sxy, sum(x*x) sx2 FROM z GROUP BY user_id)
        SELECT user_id, CAST(n AS BIGINT),
               round(CAST(n*sxy - sx*sy AS DOUBLE)
                     / CAST(n*sx2 - sx*sx AS DOUBLE), 6)
        FROM m WHERE n*sx2 > sx*sx ORDER BY user_id""").fetchall()
    out = value_trend(rd.from_arrow(ev).repartition(5))
    got = sorted((r["user_id"], r["n_events"], r["slope"])
                 for b in out.iter_batches(batch_format="pyarrow")
                 for r in b.to_pylist())
    assert got == [tuple(w) for w in want]
