"""edit_distance_pairs (stages/strings.py) vs brute-force Levenshtein
over adversarial string sets (substitutions, indels, unicode, dupes)."""

import numpy as np
import pyarrow as pa
import pytest

from ics_search_engine_ray.stages.strings import _ed_le1


def _lev(a, b):
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                   prev + (a[i - 1] != b[j - 1]))
    return d[lb]


def _brute(names):
    uniq = sorted(set(names))
    return sorted((a, b) for i, a in enumerate(uniq)
                  for b in uniq[i + 1:] if _lev(a, b) == 1)


def _run(names, ray_session, parts=4):
    import ray.data as rd
    from ics_search_engine_ray.stages.strings import edit_distance_pairs

    ds = rd.from_arrow(pa.table({"name": pa.array(names, pa.string())})) \
        .repartition(parts)
    out = edit_distance_pairs(ds, "name", num_groups=7).take_all()
    return sorted((r["a"], r["b"]) for r in out)


def test_ed_le1_unit():
    assert _ed_le1("abc", "abd")
    assert _ed_le1("abc", "ab")
    assert _ed_le1("abc", "xabc")
    assert not _ed_le1("abc", "abc")
    assert not _ed_le1("abc", "adc1")
    assert not _ed_le1("ab", "ba")


def test_pairs_basic_shapes(ray_session):
    names = ["red widget", "red wídget", "red widgets", "blue bolt",
             "red widget", "rd widget", "red midget", "xyz"]
    assert _run(names, ray_session) == _brute(names)


def test_pairs_sequential_ids(ray_session):
    names = [f"Item#{i:04d}" for i in range(120)]
    assert _run(names, ray_session) == _brute(names)


def test_pairs_random_fuzz(ray_session):
    rng = np.random.default_rng(31)
    alpha = list("ab1")
    names = ["".join(rng.choice(alpha, size=rng.integers(1, 5)))
             for _ in range(300)]
    assert _run(names, ray_session, parts=6) == _brute(names)


def test_pairs_empty(ray_session):
    assert _run(["solo"], ray_session, parts=1) == []


def test_pairs_one_char_strings_and_nulls(ray_session):
    # 1-char strings produce the "" delete variant (pinned bucket);
    # (a, b) is a substitution pair found via that variant
    names = ["a", "b", "ab", "a", None, "c"]
    valid = [n for n in names if n]
    got = _run(names, ray_session, parts=3)
    assert got == _brute(valid)
