"""Event-stream operators: tumbling-window aggregate + sessionization
(hand-computed goldens; the driver additionally hash-verifies both against
DuckDB window-function oracles at sf0.01)."""

import datetime as dt

import pyarrow as pa
import pytest


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60, second)


def _events(rows):
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })


def test_tumbling_window_agg(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.events import tumbling_window_agg

    rows = [
        (0, _ts(5), 1, "click", 1.0),
        (1, _ts(59), 1, "click", 2.0),
        (2, _ts(60), 2, "click", 4.0),      # next hour
        (3, _ts(61), 2, "view", 8.0),
    ]
    out = tumbling_window_agg(rd.from_arrow(_events(rows))).take_all()
    got = {(r["window_start"].hour, r["event_type"]):
           (r["n_events"], r["sum_value"]) for r in out}
    assert got == {(0, "click"): (2, 3.0), (1, "click"): (1, 4.0),
                   (1, "view"): (1, 8.0)}


def test_sessionize_gap_semantics(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.events import sessionize

    rows = [
        # user 1: events at 0, 20, 70 min -> gap 20 <= 30 (same session),
        # gap 50 > 30 (new session)
        (0, _ts(0), 1, "c", 1.0),
        (1, _ts(20), 1, "c", 2.0),
        (2, _ts(70), 1, "c", 4.0),
        # user 2: single event
        (3, _ts(10), 2, "c", 8.0),
        # exactly-30-min gap stays in session (strictly-greater breaks)
        (4, _ts(100), 3, "c", 16.0),
        (5, _ts(130), 3, "c", 32.0),
    ]
    out = sessionize(rd.from_arrow(_events(rows)), gap_secs=1800).take_all()
    got = sorted((r["user_id"], r["session_start"].minute + 60 * r["session_start"].hour,
                  r["n_events"], r["sum_value"]) for r in out)
    assert got == [(1, 0, 2, 3.0), (1, 70, 1, 4.0),
                   (2, 10, 1, 8.0), (3, 100, 2, 48.0)]


def test_sessionize_order_ties_by_event_id(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.events import sessionize

    # two events with the SAME ts: run detection must order by event_id
    rows = [(1, _ts(0), 7, "c", 1.0), (0, _ts(0), 7, "c", 2.0),
            (2, _ts(29), 7, "c", 4.0)]
    out = sessionize(rd.from_arrow(_events(rows)), gap_secs=1800).take_all()
    assert len(out) == 1
    assert out[0]["n_events"] == 3 and out[0]["sum_value"] == 7.0


def test_sliding_window_agg(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.events import sliding_window_agg

    rows = [
        (0, _ts(5), 1, "click", 2.0),     # windows starting 23:15..00:00
        (1, _ts(50), 1, "click", 4.0),
        (2, _ts(70), 1, "view", 8.0),
    ]
    out = sliding_window_agg(rd.from_arrow(_events(rows)),
                             window_secs=3600, slide_secs=900).take_all()
    got = {(r["window_start"].isoformat(), r["event_type"]):
           (r["n_events"], r["sum_value"]) for r in out}
    # the 00:00 window (covers 00:00-01:00) holds both clicks
    assert got[("2024-01-01T00:00:00", "click")] == (2, 6.0)
    # 00:45 window covers 00:45-01:45: click@50, view@70
    assert got[("2024-01-01T00:45:00", "click")] == (1, 4.0)
    assert got[("2024-01-01T00:45:00", "view")] == (1, 8.0)
    # each event appears in exactly 4 windows
    assert sum(n for n, _ in got.values()) == 12


def test_quantile_agg_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ics_search_engine_ray.stages.events import quantile_agg

    rng = np.random.default_rng(9)
    keys = [f"t{i % 3}" for i in range(300)]
    vals = rng.normal(50, 20, size=300)
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(keys, pa.string()),
        "value": pa.array(vals, pa.float64()),
    })).repartition(5)
    got = {(r["event_type"], r["q"]): r["value"]
           for r in quantile_agg(ds, qs=(0.5, 0.95)).take_all()}
    for t in ("t0", "t1", "t2"):
        sub = vals[np.array([k == t for k in keys])]
        for q in (0.5, 0.95):
            assert got[(t, q)] == round(float(np.quantile(sub, q)), 6)


def test_top_k_per_group_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ics_search_engine_ray.stages.events import top_k_per_group

    rng = np.random.default_rng(13)
    n = 400
    keys = [f"g{i % 5}" for i in range(n)]
    vals = rng.integers(0, 50, size=n).astype(float)   # many value ties
    ids = np.arange(n)
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(keys, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "event_id": pa.array(ids, pa.int64()),
    })).repartition(7)

    got = [(r["event_type"], r["rank"], r["event_id"])
           for r in top_k_per_group(ds, "event_type", "value", k=4,
                                    tiebreak="event_id").take_all()]
    want = []
    for g in sorted(set(keys)):
        rows = sorted(((vals[i], ids[i]) for i in range(n) if keys[i] == g),
                      key=lambda t: (-t[0], t[1]))[:4]
        want += [(g, rk + 1, int(i)) for rk, (_, i) in enumerate(rows)]
    assert sorted(got) == sorted(want)


def test_funnel_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ics_search_engine_ray.stages.events import funnel

    rng = np.random.default_rng(29)
    n = 900
    users = rng.integers(0, 40, n)
    tss = rng.integers(0, 50, n)          # many ts ties -> id tiebreak
    types = rng.choice(["view", "click", "purchase", "noise"], n)
    ids = np.arange(n)
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(tss, pa.int64()),
        "event_id": pa.array(ids, pa.int64()),
        "event_type": pa.array(types, pa.string()),
    })).repartition(5)
    steps = ["view", "click", "purchase"]
    got = sorted((r["user_id"], r["view_id"], r["click_id"],
                  r["purchase_id"])
                 for r in funnel(ds, steps, num_groups=7).take_all())

    want = []
    for u in sorted(set(users)):
        evs = sorted((tss[i], ids[i], types[i])
                     for i in range(n) if users[i] == u)
        cur, picked = (-1, -1), []
        ok = True
        for s in steps:
            nxt = next(((t, i) for t, i, ty in evs
                        if ty == s and (t, i) > cur), None)
            if nxt is None:
                ok = False
                break
            picked.append(nxt[1])
            cur = nxt
        if ok:
            want.append((u, *picked))
    assert got == sorted(want)


def test_pivot_sum_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ics_search_engine_ray.stages.events import pivot_sum

    rng = np.random.default_rng(43)
    n = 700
    users = rng.integers(0, 25, n)
    types = rng.choice(["a", "b", "c", "zz"], n)   # zz not in categories
    vals = np.round(rng.uniform(-5, 5, n), 3)
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(vals, pa.float64()),
    })).repartition(6)
    out = {r["user_id"]: (r["a"], r["b"], r["c"])
           for r in pivot_sum(ds, "user_id", "event_type", "value",
                              ["a", "b", "c"], num_groups=4).take_all()}
    for u in np.unique(users):
        want = tuple(
            round(float(vals[(users == u) & (types == t)].sum()), 6)
            for t in ("a", "b", "c"))
        assert out[int(u)] == pytest.approx(want, abs=1e-9)


def test_latest_per_key_matches_duckdb(ray_session, sf_dir):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.events import latest_per_key
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    got = sorted((r["user_id"], r["ts"], r["event_id"], r["value"])
                 for r in latest_per_key(ev).take_all())
    want = sorted(map(tuple, duckdb.sql(f"""
SELECT user_id, ts, event_id, value
FROM (SELECT user_id, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM '{sf_dir}/events.parquet')
WHERE rn = 1""").fetchall()))
    assert got == want


def test_latest_per_key_combiner_tie_break(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from ics_search_engine_ray.stages.events import latest_per_key
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([100, 100, 50, 200], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 9], pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
    })
    # split across 2 blocks so the merge path runs
    got = sorted((r["user_id"], r["event_id"])
                 for r in latest_per_key(
                     rd.from_arrow(t).repartition(2)).take_all())
    assert got == [(7, 2), (9, 4)]     # ts tie at 100 -> higher event_id


def test_value_histogram_matches_duckdb(ray_session, sf_dir):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.events import value_histogram
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    got = sorted((r["event_type"], r["bin"], r["n"])
                 for r in value_histogram(ev, bins=20).take_all())
    want = sorted(duckdb.sql(f"""
WITH st AS (SELECT min(value) AS lo, max(value) AS hi
            FROM '{sf_dir}/events.parquet')
SELECT event_type,
       CAST(LEAST(FLOOR((value - st.lo) * 20 / (st.hi - st.lo)), 19)
            AS BIGINT),
       count(*)
FROM '{sf_dir}/events.parquet' CROSS JOIN st
GROUP BY 1, 2""").fetchall())
    assert got == want and len(got) > 0
    # every count accounted for
    assert sum(n for _, _, n in got) == ev.count()


def test_value_histogram_degenerate_single_value(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from ics_search_engine_ray.stages.events import value_histogram
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["a", "a", "b"], pa.string()),
        "value": pa.array([5.0, 5.0, 5.0], pa.float64())}))
    got = sorted((r["event_type"], r["bin"], r["n"])
                 for r in value_histogram(ds, bins=4).take_all())
    assert got == [("a", 0, 2), ("b", 0, 1)]


def test_event_transitions_matches_duckdb(ray_session, sf_dir):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.events import event_transitions
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    got = sorted((r["src"], r["dst"], r["n"])
                 for r in event_transitions(ev).take_all())
    want = sorted(duckdb.sql(f"""
WITH s AS (SELECT event_type AS src,
                  LEAD(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS dst
           FROM '{sf_dir}/events.parquet')
SELECT src, dst, count(*) FROM s WHERE dst IS NOT NULL
GROUP BY src, dst""").fetchall())
    assert got == want and len(got) > 0
    # pair totals = events - distinct users (each user drops one)
    n_users = duckdb.sql(f"SELECT count(DISTINCT user_id) FROM "
                         f"'{sf_dir}/events.parquet'").fetchone()[0]
    assert sum(n for _, _, n in got) == ev.count() - n_users


def test_window_distinct_users_matches_duckdb(ray_session, sf_dir):
    import duckdb
    import ray.data as rd
    from ics_search_engine_ray.stages.events import window_distinct_users
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "user_id"])
    got = sorted((str(r["window_start"]), r["event_type"], r["n_users"])
                 for r in window_distinct_users(ev).take_all())
    want = sorted((str(w), t, int(n)) for w, t, n in duckdb.sql(f"""
SELECT date_trunc('hour', ts), event_type, count(DISTINCT user_id)
FROM '{sf_dir}/events.parquet' GROUP BY 1, 2""").fetchall())
    assert got == want and len(got) > 0


def test_value_histogram_empty_input(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from ics_search_engine_ray.stages.events import value_histogram
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64())}))
    assert value_histogram(ds, bins=4).take_all() == []
