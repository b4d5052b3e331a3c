"""asof_join (stages/joins.py) vs a brute-force reference, plus
group-count invariance and edge cases (no match, equal timestamps)."""

import numpy as np
import pyarrow as pa
import pytest


def _brute_asof(left, right):
    """left/right: list of dicts with user_id, ts, event_id(, value)."""
    out = []
    for l in left:
        cands = [r for r in right
                 if r["user_id"] == l["user_id"] and r["ts"] <= l["ts"]]
        if cands:
            r = max(cands, key=lambda r: r["ts"])
            out.append((l["event_id"], r["event_id"]))
    return sorted(out)


def _run(left_rows, right_rows, **kw):
    import ray.data as rd
    from ics_search_engine_ray.stages.joins import asof_join

    def tbl(rows, with_value):
        cols = {
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "ts": pa.array([r["ts"] for r in rows], pa.int64()),
            "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        }
        if with_value:
            cols["value"] = pa.array([r["value"] for r in rows], pa.float64())
        return rd.from_arrow(pa.table(cols)).repartition(3)

    out = asof_join(tbl(left_rows, False), tbl(right_rows, True),
                    by="user_id", on="ts", left_cols=["event_id"],
                    right_cols=["event_id", "value"], **kw)
    return sorted((r["l_event_id"], r["r_event_id"])
                  for b in out.iter_batches(batch_format="pyarrow")
                  for r in b.to_pylist())


def test_asof_join_matches_bruteforce(ray_session):
    rng = np.random.default_rng(3)
    left = [{"user_id": int(rng.integers(0, 12)), "ts": int(rng.integers(0, 1000)),
             "event_id": i} for i in range(120)]
    right = [{"user_id": int(rng.integers(0, 12)), "ts": int(t),
              "event_id": 1000 + j, "value": float(j)}
             for j, t in enumerate(rng.choice(1000, size=80, replace=False))]
    want = _brute_asof(left, right)
    assert _run(left, right) == want
    # group-count invariance (each user must land wholly in one group)
    assert _run(left, right, num_groups=1) == want
    assert _run(left, right, num_groups=7) == want


def test_asof_join_edges(ray_session):
    left = [{"user_id": 1, "ts": 10, "event_id": 0},   # match at equal ts
            {"user_id": 1, "ts": 5, "event_id": 1},    # before any right -> drop
            {"user_id": 2, "ts": 50, "event_id": 2}]   # user with no right -> drop
    right = [{"user_id": 1, "ts": 10, "event_id": 100, "value": 1.0},
             {"user_id": 1, "ts": 8, "event_id": 101, "value": 2.0},
             {"user_id": 3, "ts": 1, "event_id": 102, "value": 3.0}]
    assert _run(left, right) == [(0, 100)]
    # empty right side -> empty result with the full schema
    assert _run(left, [{"user_id": 9, "ts": 1, "event_id": 5, "value": 0.0}]) == []


def test_interval_join_matches_bruteforce(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.joins import interval_join

    rng = np.random.default_rng(5)
    left = [{"user_id": int(rng.integers(0, 8)), "ts": int(rng.integers(0, 500)),
             "event_id": i} for i in range(80)]
    right = [{"user_id": int(rng.integers(0, 8)), "lo": int(t),
              "hi": int(t) + int(rng.integers(0, 60)), "event_id": 1000 + j}
             for j, t in enumerate(rng.integers(0, 500, size=40))]
    want = sorted((l["event_id"], r["event_id"])
                  for l in left for r in right
                  if l["user_id"] == r["user_id"]
                  and r["lo"] <= l["ts"] <= r["hi"])

    lt = rd.from_arrow(pa.table({
        "user_id": pa.array([r["user_id"] for r in left], pa.int64()),
        "ts": pa.array([r["ts"] for r in left], pa.int64()),
        "event_id": pa.array([r["event_id"] for r in left], pa.int64()),
    })).repartition(3)
    rt = rd.from_arrow(pa.table({
        "user_id": pa.array([r["user_id"] for r in right], pa.int64()),
        "lo": pa.array([r["lo"] for r in right], pa.int64()),
        "hi": pa.array([r["hi"] for r in right], pa.int64()),
        "event_id": pa.array([r["event_id"] for r in right], pa.int64()),
    })).repartition(2)

    for kw in ({}, {"num_groups": 1}, {"num_groups": 5}):
        out = interval_join(lt, rt, by="user_id", on="ts", lo="lo", hi="hi",
                            left_cols=["event_id"], right_cols=["event_id"], **kw)
        got = sorted((r["l_event_id"], r["r_event_id"])
                     for b in out.iter_batches(batch_format="pyarrow")
                     for r in b.to_pylist())
        assert got == want


# ---------------- forced hot-key (skew) salting tests ----------------
#
# r4 verdict item 8: one pathological key must spread across tasks via
# (key, time-bucket) salting with output IDENTICAL to the plain path.


def test_asof_join_forced_skew_identical(ray_session):
    rng = np.random.default_rng(11)
    # key 7 pathological (300 rows), plus background keys
    left = [{"user_id": 7, "ts": int(rng.integers(0, 10_000)),
             "event_id": i} for i in range(300)]
    left += [{"user_id": int(rng.integers(0, 5)),
              "ts": int(rng.integers(0, 10_000)),
              "event_id": 1000 + i} for i in range(60)]
    # sparse right side: most lefts must resolve via the carry relation
    right = [{"user_id": 7, "ts": int(t), "event_id": 5000 + j,
              "value": float(j)}
             for j, t in enumerate(rng.choice(10_000, size=25,
                                              replace=False))]
    right += [{"user_id": int(rng.integers(0, 5)), "ts": int(t),
               "event_id": 6000 + j, "value": 1.0}
              for j, t in enumerate(rng.choice(10_000, size=20,
                                               replace=False))]
    want = _brute_asof(left, right)
    # default pigeonhole routing (key 7 >= 10% of every batch)
    assert _run(left, right) == want
    # force EVERY key through the salted path, several bucket widths
    # (salt_secs scales by 1e6 -> salt_us of 500 / 2000 / 10_000 ticks;
    # 500 means ~20 buckets for key 7, heavy carry traffic)
    all_keys = {r["user_id"] for r in left} | {r["user_id"] for r in right}
    for salt in (0.0005, 0.002, 0.01, 86_400):
        got = _run(left, right, _force_hot=all_keys, salt_secs=salt)
        assert got == want, f"salt_secs={salt}"
    # hot set covering only the pathological key: base union salted
    assert _run(left, right, _force_hot={7}, salt_secs=0.0005) == want


def test_interval_join_forced_skew_identical(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.joins import interval_join

    rng = np.random.default_rng(13)
    left = [{"user_id": 3, "ts": int(rng.integers(0, 5_000)),
             "event_id": i} for i in range(200)]
    left += [{"user_id": int(rng.integers(0, 4)),
              "ts": int(rng.integers(0, 5_000)),
              "event_id": 1000 + i} for i in range(40)]
    # intervals span multiple salt buckets (length up to 1500 vs 500 salt)
    right = [{"user_id": 3 if j % 2 else int(rng.integers(0, 4)),
              "lo": int(t), "hi": int(t) + int(rng.integers(0, 1_500)),
              "event_id": 2000 + j}
             for j, t in enumerate(rng.integers(0, 5_000, size=50))]
    right.append({"user_id": 3, "lo": 100, "hi": 90,
                  "event_id": 9999})  # empty interval: matches nothing
    want = sorted((l["event_id"], r["event_id"])
                  for l in left for r in right
                  if l["user_id"] == r["user_id"]
                  and r["lo"] <= l["ts"] <= r["hi"])

    lt = rd.from_arrow(pa.table({
        "user_id": pa.array([r["user_id"] for r in left], pa.int64()),
        "ts": pa.array([r["ts"] for r in left], pa.int64()),
        "event_id": pa.array([r["event_id"] for r in left], pa.int64()),
    })).repartition(3)
    rt = rd.from_arrow(pa.table({
        "user_id": pa.array([r["user_id"] for r in right], pa.int64()),
        "lo": pa.array([r["lo"] for r in right], pa.int64()),
        "hi": pa.array([r["hi"] for r in right], pa.int64()),
        "event_id": pa.array([r["event_id"] for r in right], pa.int64()),
    })).repartition(2)

    all_keys = {r["user_id"] for r in left} | {r["user_id"] for r in right}
    for kw in ({},                                    # pigeonhole default
               {"_force_hot": all_keys, "salt_secs": 0.0005},
               {"_force_hot": all_keys, "salt_secs": 0.002},
               {"_force_hot": {3}, "salt_secs": 0.0005}):
        out = interval_join(lt, rt, by="user_id", on="ts", lo="lo", hi="hi",
                            left_cols=["event_id"], right_cols=["event_id"],
                            **kw)
        got = sorted((r["l_event_id"], r["r_event_id"])
                     for b in out.iter_batches(batch_format="pyarrow")
                     for r in b.to_pylist())
        assert got == want, f"kw={kw}"


def test_asof_interval_salted_fuzz(ray_session):
    """Randomized parity: forced-salted (every key hot, several bucket
    widths incl. degenerate single-bucket and finer-than-data) must
    equal brute force on irregular shapes — duplicate left timestamps,
    keys on one side only, empty right buckets."""
    import ray.data as rd
    from ics_search_engine_ray.stages.joins import interval_join

    for seed in (101, 202, 303):
        rng = np.random.default_rng(seed)
        nl, nr = int(rng.integers(30, 160)), int(rng.integers(5, 60))
        left = [{"user_id": int(rng.integers(0, 6)),
                 "ts": int(rng.integers(0, 3_000)), "event_id": i}
                for i in range(nl)]
        right = [{"user_id": int(rng.integers(0, 8)),
                  "ts": int(t), "event_id": 1000 + j, "value": float(j)}
                 for j, t in enumerate(rng.choice(3_000, size=nr,
                                                  replace=False))]
        want = _brute_asof(left, right)
        keys = ({r["user_id"] for r in left}
                | {r["user_id"] for r in right})
        salt = float(rng.choice([0.0002, 0.001, 0.005, 86_400]))
        got = _run(left, right, _force_hot=keys, salt_secs=salt)
        assert got == want, f"asof seed={seed} salt={salt}"

        ivs = [{"user_id": int(rng.integers(0, 6)), "lo": int(t),
                "hi": int(t) + int(rng.integers(0, 800)),
                "event_id": 2000 + j}
               for j, t in enumerate(rng.integers(0, 3_000, size=25))]
        want_iv = sorted((l["event_id"], r["event_id"])
                         for l in left for r in ivs
                         if l["user_id"] == r["user_id"]
                         and r["lo"] <= l["ts"] <= r["hi"])
        lt = rd.from_arrow(pa.table({
            "user_id": pa.array([r["user_id"] for r in left], pa.int64()),
            "ts": pa.array([r["ts"] for r in left], pa.int64()),
            "event_id": pa.array([r["event_id"] for r in left],
                                 pa.int64())})).repartition(3)
        rt = rd.from_arrow(pa.table({
            "user_id": pa.array([r["user_id"] for r in ivs], pa.int64()),
            "lo": pa.array([r["lo"] for r in ivs], pa.int64()),
            "hi": pa.array([r["hi"] for r in ivs], pa.int64()),
            "event_id": pa.array([r["event_id"] for r in ivs],
                                 pa.int64())})).repartition(2)
        out = interval_join(lt, rt, by="user_id", on="ts", lo="lo",
                            hi="hi", left_cols=["event_id"],
                            right_cols=["event_id"],
                            _force_hot=keys, salt_secs=salt)
        got_iv = sorted((r["l_event_id"], r["r_event_id"])
                        for b in out.iter_batches(batch_format="pyarrow")
                        for r in b.to_pylist())
        assert got_iv == want_iv, f"interval seed={seed} salt={salt}"
