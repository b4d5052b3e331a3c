"""heavy_hitters (stages/heavy.py): exact counts vs brute force, the
pigeonhole no-false-negative guarantee across batch layouts, gates and
empty inputs."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from ics_search_engine_ray.stages.heavy import TOKEN_RE


def _brute(texts, ppm):
    toks = [t for x in texts
            for t in TOKEN_RE.findall((x or "").lower()) if len(t) > 1]
    c = Counter(toks)
    total = len(toks)
    return sorted((t, n) for t, n in c.items()
                  if n * 1_000_000 >= ppm * total)


def _run(texts, ppm, parts, ray_session, **kw):
    import ray.data as rd
    from ics_search_engine_ray.stages.heavy import heavy_hitters

    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())})) \
        .repartition(parts)
    out = heavy_hitters(ds, ppm=ppm, **kw).take_all()
    return sorted((r["term"], r["cnt"]) for r in out)


@pytest.mark.parametrize("parts", [1, 4, 9])
def test_heavy_hitters_exact_any_layout(ray_session, parts):
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(60)]
    # zipfish draw so a handful of terms dominate
    p = 1.0 / np.arange(1, 61)
    p /= p.sum()
    texts = [" ".join(rng.choice(vocab, size=40, p=p)) for _ in range(80)]
    texts += ["", None, "x @@ !!"]     # empties and all-filtered rows
    ppm = 20_000
    assert _run(texts, ppm, parts, ray_session) == _brute(texts, ppm)


def test_heavy_hitters_empty_and_gate(ray_session):
    assert _run(["", None], 1000, 2, ray_session) == []
    with pytest.raises(ValueError, match="gate"):
        _run(["aa bb cc dd ee ff gg hh"] * 4, 1, 2, ray_session,
             cand_gate=3)
