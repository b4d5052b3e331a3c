"""Round-5 verdict item 2: no schema-divergence warnings leak from
empty-heavy groupby/sort plans, and REAL divergences still warn.

The schema-less empty blocks are manufactured inside Ray's sort-based
shuffle (see functions/raylog.py for the arrow_block.py trace); the
package installs a surgical filter at import. These tests pin both
directions: the benign variant is silenced, the signal variant is not.
"""

import io
import logging

import numpy as np
import pyarrow as pa
import pytest

import ics_search_engine_ray  # noqa: F401  (installs the log filter)


def _capture_ray_data_warnings(fn):
    logger = logging.getLogger("ray.data")
    buf = io.StringIO()
    h = logging.StreamHandler(buf)
    h.setLevel(logging.WARNING)
    logger.addHandler(h)
    try:
        fn()
    finally:
        logger.removeHandler(h)
    return buf.getvalue()


def _empty_heavy_ds():
    """64 blocks, half of whose map outputs are 0-row (typed) tables —
    the shape that makes Ray's sort emit schema-less empties."""
    import ray.data as rd

    ds = rd.range(1000, override_num_blocks=64)

    def f(b: pa.Table) -> pa.Table:
        n = b.num_rows
        first = b.column("id")[0].as_py() if n else 0
        if first % 2 == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        return pa.table({"k": pa.array(np.arange(n) % 4, pa.int64()),
                         "v": pa.array(np.ones(n, np.int64))})

    return ds.map_batches(f, batch_format="pyarrow")


def test_empty_heavy_aggregate_no_schema_warnings(ray_session):
    from ray.data.aggregate import Sum

    out = _capture_ray_data_warnings(
        lambda: _empty_heavy_ds().groupby("k")
        .aggregate(Sum("v", alias_name="s")).materialize())
    assert "different schema" not in out


def test_empty_heavy_map_groups_no_schema_warnings(ray_session):
    out = _capture_ray_data_warnings(
        lambda: _empty_heavy_ds().groupby("k").map_groups(
            lambda t: pa.table({"k": t.column("k")[:1],
                                "n": pa.array([t.num_rows], pa.int64())}),
            batch_format="pyarrow").materialize())
    assert "different schema" not in out


def test_triangles_no_schema_warnings(ray_session):
    """The verdict's named repro: a map_groups-heavy graph pipeline."""
    import ray.data as rd

    from ics_search_engine_ray.graph.concomp import triangles

    rng = np.random.default_rng(7)
    n = 400
    u = rng.integers(0, 60, n).astype(np.int64)
    v = rng.integers(0, 60, n).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src": pa.array(u), "dst": pa.array(v)}))
    out = _capture_ray_data_warnings(
        lambda: triangles(edges).materialize())
    assert "different schema" not in out


def test_real_schema_divergence_still_warns():
    """The filter is surgical at the installed logger: the benign
    empty-new-schema record is dropped before propagation, a typed->
    typed divergence (an actual pipeline bug) still reaches ray.data
    handlers."""
    from ics_search_engine_ray.functions.raylog import _EXECUTOR_LOGGER

    src = logging.getLogger(_EXECUTOR_LOGGER)
    benign = ("Operator produced a RefBundle with a different schema "
              "than the previous one. Previous schema: u: int64\n"
              "v: int64, new schema: . This may lead to unexpected "
              "behavior.")
    real = ("Operator produced a RefBundle with a different schema "
            "than the previous one. Previous schema: u: int64, new "
            "schema: q: float. This may lead to unexpected behavior.")
    out = _capture_ray_data_warnings(lambda: src.warning(benign))
    assert "different schema" not in out
    out = _capture_ray_data_warnings(lambda: src.warning(real))
    assert "different schema" in out


def test_filter_unit():
    from ics_search_engine_ray.functions.raylog import (
        _EmptySchemaDivergenceFilter)

    f = _EmptySchemaDivergenceFilter()

    def rec(msg):
        return logging.LogRecord("x", logging.WARNING, "p", 1, msg, (), None)

    benign = ("Operator produced a RefBundle with a different schema "
              "than the previous one. Previous schema: u: int64\n"
              "v: int64, new schema: . This may lead to unexpected "
              "behavior.")
    real = ("Operator produced a RefBundle with a different schema "
            "than the previous one. Previous schema: u: int64, new "
            "schema: q: float. This may lead to unexpected behavior.")
    assert f.filter(rec(benign)) is False
    assert f.filter(rec(real)) is True
    assert f.filter(rec("unrelated warning")) is True


def test_metadata_schema_hash_warning_silenced(ray_session):
    """Parquet-sourced blocks carry b'pandas' schema metadata, which
    makes hash(schema) raise inside Ray's unify_schemas early-exit —
    the benign 'unhashable type: dict' warning must be silenced while
    the unify result stays correct."""
    import os
    import tempfile

    import pyarrow.parquet as pq
    import ray.data as rd

    with tempfile.TemporaryDirectory() as d:
        # pandas-written parquet => schema-level b'pandas' metadata
        import pandas as pd
        p = os.path.join(d, "t.parquet")
        pd.DataFrame({"k": np.arange(200) % 3,
                      "v": np.ones(200)}).to_parquet(p)
        assert pq.read_schema(p).metadata    # the precondition

        def run():
            ds = rd.read_parquet(p, override_num_blocks=8)
            ds.groupby("k").sum("v").materialize()

        out = _capture_ray_data_warnings(run)
    assert "Failed to hash the schemas" not in out


def test_other_schema_hash_failures_still_warn():
    """Only the pyarrow-metadata variant is dropped by the filter."""
    from ics_search_engine_ray.functions.raylog import (
        _SchemaHashDictFilter, _HASH_PREFIX)

    f = _SchemaHashDictFilter()

    def rec(msg):
        return logging.LogRecord("x", logging.WARNING, "f", 1, msg,
                                 None, None)

    assert not f.filter(rec(_HASH_PREFIX + "unhashable type: 'dict'"))
    assert f.filter(rec(_HASH_PREFIX + "something else entirely"))
    assert f.filter(rec("unrelated warning"))
