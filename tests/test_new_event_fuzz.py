"""Fuzz the late-round-4 event operators against naive single-process
reference implementations over random streams (ties in ts, multi-block
layouts, negative values) — the oracle checks one dataset; these check
the kernel logic across many."""

import numpy as np
import pyarrow as pa
import pytest


def _stream(seed, n_users=12, n_events=400):
    rng = np.random.default_rng(seed)
    day_us = 86_400 * 1_000_000
    rows = []
    for eid in range(n_events):
        rows.append({
            "event_id": eid,
            "user_id": int(rng.integers(0, n_users)),
            # coarse hourly grid over 5 days -> plenty of exact ties
            "ts": int(rng.integers(0, 5 * 24)) * 3_600 * 1_000_000,
            "event_type": ["click", "view", "purchase", "error"][
                int(rng.integers(0, 4))],
            "value": float(rng.integers(-200, 500)) / 8.0,
        })
    return rows


def _ds(ray_session, rows, parts=7):
    import ray.data as rd
    return rd.from_items(rows).repartition(parts)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_attribution_fuzz(ray_session, seed):
    from ics_search_engine_ray.stages.events import attribution

    rows = _stream(seed)
    got = {r["attributed_type"]: r["n"]
           for r in attribution(_ds(ray_session, rows)).take_all()}
    # naive
    want: dict = {}
    by_user: dict = {}
    for r in sorted(rows, key=lambda r: (r["ts"], r["event_id"])):
        u = r["user_id"]
        if r["event_type"] == "purchase":
            who = by_user.get(u, "none")
            want[who] = want.get(who, 0) + 1
        if r["event_type"] in ("click", "view"):
            by_user[u] = r["event_type"]
    assert got == want


@pytest.mark.parametrize("seed", [4, 5])
def test_peak_concurrency_fuzz(ray_session, seed):
    from ics_search_engine_ray.stages.events import peak_concurrency

    day_us = 86_400 * 1_000_000
    rows = _stream(seed)
    got = {r["day"]: r["peak"]
           for r in peak_concurrency(_ds(ray_session, rows)).take_all()}
    # naive sweep per day
    iv: dict = {}
    for r in rows:
        d = r["ts"] // day_us
        k = (r["user_id"], d)
        lo, hi = iv.get(k, (r["ts"], r["ts"]))
        iv[k] = (min(lo, r["ts"]), max(hi, r["ts"]))
    want: dict = {}
    for d in {k[1] for k in iv}:
        pts = []
        for (u, dd), (lo, hi) in iv.items():
            if dd == d:
                pts.append((lo, 1))
                pts.append((hi, -1))
        pts.sort(key=lambda p: (p[0], -p[1]))
        run = peak = 0
        for _, delta in pts:
            run += delta
            peak = max(peak, run)
        want[d] = peak
    got_days = {int(np.datetime64(k, "us").astype(np.int64)) // day_us: v
                for k, v in got.items()}
    assert got_days == want


@pytest.mark.parametrize("seed", [6, 7])
def test_validity_intervals_fuzz(ray_session, seed):
    from ics_search_engine_ray.stages.events import validity_intervals

    rows = _stream(seed)
    out = validity_intervals(_ds(ray_session, rows)).take_all()
    got = {r["event_id"]: (r["valid_from"], r["valid_to"])
           for r in out}
    assert len(got) == len(rows)
    per_user: dict = {}
    for r in sorted(rows, key=lambda r: (r["ts"], r["event_id"])):
        per_user.setdefault(r["user_id"], []).append(r)
    import datetime
    for u, rs in per_user.items():
        for i, r in enumerate(rs):
            vf, vt = got[r["event_id"]]
            assert vf == datetime.datetime.utcfromtimestamp(
                r["ts"] / 1e6)
            if i + 1 < len(rs):
                assert vt == datetime.datetime.utcfromtimestamp(
                    rs[i + 1]["ts"] / 1e6)
            else:
                assert vt is None


def test_decay_score_fuzz(ray_session):
    from ics_search_engine_ray.stages.events import decay_score

    rows = _stream(8)
    got = {r["user_id"]: r["decay_score"]
           for r in decay_score(_ds(ray_session, rows),
                                tau_days=2.0,
                                ref_ts="1970-01-10").take_all()}
    ref_us = 9 * 86_400 * 1_000_000
    tau_us = 2.0 * 86_400 * 1e6
    acc: dict = {}
    for r in rows:
        cents = np.floor(abs(r["value"] * 100) + 0.5) * np.sign(
            r["value"] * 100)
        c = cents * np.exp(-(ref_us - r["ts"]) / tau_us) * 1e6
        micro = int(np.floor(abs(c) + 0.5) * np.sign(c))
        acc[r["user_id"]] = acc.get(r["user_id"], 0) + micro
    want = {u: float(np.round(v / 1e8, 6)) for u, v in acc.items()}
    assert got == pytest.approx(want, abs=1e-9)


def test_attribution_conversion_in_sources_no_self_credit(ray_session):
    """A conversion whose type is ALSO a source type must credit the
    strictly-prior source, never itself (the SQL oracle's 1-PRECEDING
    window) — through both the plain and salted kernels."""
    import ray.data as rd
    from ics_search_engine_ray.stages.events import attribution

    rows = [
        {"event_id": 0, "user_id": 1, "ts": 100, "event_type": "view"},
        # 'view' conversion: prior source is the first view, not itself
        {"event_id": 1, "user_id": 1, "ts": 200, "event_type": "click"},
        {"event_id": 2, "user_id": 1, "ts": 300, "event_type": "view"},
        # user 2: leading 'view' conversion with nothing before -> none
        {"event_id": 3, "user_id": 2, "ts": 50, "event_type": "view"},
    ]
    ds = rd.from_items(rows).repartition(1)
    # view@100 converts with no prior -> none; view@300 -> click@200;
    # user 2's lone view -> none
    want = {"click": 1, "none": 2}
    got = {r["attributed_type"]: r["n"]
           for r in attribution(ds, conversion="view",
                                sources=("click", "view"),
                                hot_frac=2.0).take_all()}
    assert got == want
    # salted path (user 1 holds 3/4 rows -> hot at frac=0.5)
    got2 = {r["attributed_type"]: r["n"]
            for r in attribution(ds, conversion="view",
                                 sources=("click", "view"),
                                 hot_frac=0.5).take_all()}
    assert got2 == want
