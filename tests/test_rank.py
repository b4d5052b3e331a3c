"""global_rank (stages/rank.py) vs numpy argsort rank: uniform, skewed,
duplicate-heavy and tiny inputs across partition layouts."""

import numpy as np
import pyarrow as pa
import pytest


def _run(vals, ids, ray_session, parts=5, **kw):
    import ray.data as rd
    from ics_search_engine_ray.stages.rank import global_rank

    ds = rd.from_arrow(pa.table({
        "value": pa.array(vals, pa.float64()),
        "event_id": pa.array(ids, pa.int64()),
    })).repartition(parts)
    out = global_rank(ds, "value", "event_id", **kw).take_all()
    return {r["event_id"]: r["rank"] for r in out}


def _want(vals, ids):
    order = np.lexsort((ids, vals))
    return {int(ids[j]): i + 1 for i, j in enumerate(order)}


@pytest.mark.parametrize("dist", ["uniform", "zipf", "dupes"])
def test_global_rank_exact(ray_session, dist):
    rng = np.random.default_rng(41)
    n = 3000
    if dist == "uniform":
        vals = rng.uniform(0, 1, n)
    elif dist == "zipf":
        vals = rng.zipf(1.5, n).astype(np.float64)   # heavy ties + skew
    else:
        vals = rng.integers(0, 5, n).astype(np.float64)  # 5 distinct
    ids = rng.permutation(n).astype(np.int64)
    assert _run(vals, ids, ray_session) == _want(vals, ids)


def test_global_rank_tiny_and_bins(ray_session):
    vals = np.array([3.0, 1.0, 2.0])
    ids = np.array([10, 20, 30])
    assert _run(vals, ids, ray_session, parts=2, num_bins=2) == \
        {20: 1, 30: 2, 10: 3}
