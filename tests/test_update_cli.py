"""Incremental `update` CLI command: indexing only a delta pages dir and
merging into an existing index must equal a from-scratch build over all
pages (rank-identical search, same global stats). Exercises the real CLI
surface in a subprocess (own Ray session), against in-process builds."""

import glob
import json
import os
import shutil
import subprocess
import sys

import pytest

from ics_search_engine_ray.config import DEFAULT_CONFIG
from ics_search_engine_ray.query.engine import SearchIndex

QUERIES = ["spark batch merge", "the a value", "customer stream"]


@pytest.fixture(scope="module")
def split_pages(ray_session, sf_dir, tmp_path_factory):
    """pages dir + a base/delta file split, shared by the update tests."""
    from ics_search_engine_ray.sources.pages import generate_pages

    tmp = tmp_path_factory.mktemp("upd_pages")
    pages = str(tmp / "pages")
    generate_pages(sf_dir, out_dir=pages)
    files = sorted(glob.glob(os.path.join(pages, "*.parquet")))
    assert len(files) >= 2, "need >= 2 files to split into base + delta"
    base_dir, delta_dir = str(tmp / "a"), str(tmp / "b")
    os.makedirs(base_dir), os.makedirs(delta_dir)
    half = max(1, len(files) // 2)
    for f in files[:half]:
        shutil.copy(f, base_dir)
    for f in files[half:]:
        shutil.copy(f, delta_dir)
    return pages, base_dir, delta_dir


def _run_update(index_dir, pages_dir, out_dir):
    return subprocess.run(
        [sys.executable, "-m", "ics_search_engine_ray", "update",
         "--index", index_dir, "--pages", pages_dir, "--out", out_dir,
         "--num-cpus", "4"],
        capture_output=True, text=True, timeout=600,
        cwd="/tmp",                       # foreign cwd, like the driver
        env={**os.environ, "PYTHONPATH": os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))})


@pytest.mark.slow
def test_update_cli_equals_scratch(split_pages, tmp_path):
    from ics_search_engine_ray.pipelines.build import build_index

    pages, base_dir, delta_dir = split_pages
    ia = str(tmp_path / "ia")
    iu = str(tmp_path / "iu")
    build_index(base_dir, ia, DEFAULT_CONFIG)
    build_index(pages, iu, DEFAULT_CONFIG)

    iu2 = str(tmp_path / "iu2")
    p = _run_update(ia, delta_dir, iu2)
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads(
        [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1])

    si_u, si_2 = SearchIndex(iu), SearchIndex(iu2)
    assert stats["num_docs"] == si_u.num_docs == si_2.num_docs
    assert si_2.avgdl == pytest.approx(si_u.avgdl)
    for q in QUERIES:
        r2 = [(r.doc_id, round(r.score, 10)) for r in si_2.search(q, k=10)]
        ru = [(r.doc_id, round(r.score, 10)) for r in si_u.search(q, k=10)]
        assert r2 == ru, q


@pytest.mark.slow
def test_update_cli_no_stem_base(split_pages, tmp_path):
    """update derives the delta's config from the BASE manifest
    (regression: a DEFAULT_CONFIG delta against a --no-stem base made
    merge_indexes reject the pair after the delta build)."""
    from ics_search_engine_ray.pipelines.build import build_index

    _, base_dir, delta_dir = split_pages
    ia = str(tmp_path / "ia_ns")
    build_index(base_dir, ia, DEFAULT_CONFIG.with_(stem=False))
    base_docs = SearchIndex(ia).num_docs

    iu2 = str(tmp_path / "iu2_ns")
    p = _run_update(ia, delta_dir, iu2)
    assert p.returncode == 0, p.stderr[-2000:]
    si = SearchIndex(iu2)
    assert si.num_docs > base_docs
    assert si.manifest["stem"] is False
