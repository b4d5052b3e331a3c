"""Persistable IVF vector index (pipelines/vector.py): exact parity with
brute force at n_probe = n_lists, recall at partial probe, partition
pruning in the layout, rebuild-over-existing safety."""

import glob
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb_ds(ray_session, sf_dir):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


@pytest.fixture(scope="module")
def built(emb_ds, tmp_path_factory):
    from ics_search_engine_ray.pipelines.vector import build_vector_index
    out = str(tmp_path_factory.mktemp("vidx") / "idx")
    man = build_vector_index(emb_ds, out, n_lists=8, iters=4)
    return out, man


def test_build_layout_and_manifest(built, emb_ds):
    out, man = built
    assert man["n_lists"] == 8
    assert man["num_vectors"] == emb_ds.count()
    parts = sorted(glob.glob(os.path.join(out, "vectors", "list_id=*")))
    assert 1 <= len(parts) <= 8
    # every vector is in exactly one list
    import pyarrow.dataset as pds
    t = pds.dataset(os.path.join(out, "vectors"),
                    partitioning="hive").to_table(columns=["vec_id"])
    assert sorted(t.column("vec_id").to_pylist()) == sorted(
        r["vec_id"] for r in emb_ds.take_all())


def test_full_probe_equals_brute(built, emb_ds):
    from ics_search_engine_ray.pipelines.vector import VectorIndex
    from ics_search_engine_ray.stages.similarity import knn_brute
    out, man = built
    vi = VectorIndex(out)
    rows = emb_ds.take_all()
    for r in rows[:5]:
        q = np.asarray(r["embedding"], np.float64)
        got = vi.search(q, k=10, n_probe=man["n_lists"])
        want = knn_brute(emb_ds, q[None, :], k=10)[0]
        assert [g[0] for g in got] == [w[0] for w in want]
        for g, w in zip(got, want):
            assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_partial_probe_recall_and_pruning(built, emb_ds):
    from ics_search_engine_ray.pipelines.vector import VectorIndex
    from ics_search_engine_ray.stages.similarity import knn_brute
    out, man = built
    vi = VectorIndex(out)
    rows = emb_ds.take_all()
    hits = total = 0
    for r in rows[:10]:
        q = np.asarray(r["embedding"], np.float64)
        got = {v for v, _ in vi.search(q, k=10, n_probe=4)}
        want = {v for v, _ in knn_brute(emb_ds, q[None, :], k=10)[0]}
        hits += len(got & want)
        total += len(want)
    assert hits / total >= 0.5          # half the lists probed
    # the query vector itself always comes back first at its own list
    q0 = np.asarray(rows[0]["embedding"], np.float64)
    top = vi.search(q0, k=1, n_probe=1)
    assert top and top[0][0] == rows[0]["vec_id"]


def test_rebuild_does_not_append(built, emb_ds):
    from ics_search_engine_ray.pipelines.vector import (
        VectorIndex, build_vector_index)
    out, _ = built
    build_vector_index(emb_ds, out, n_lists=8, iters=4)   # second build
    import pyarrow.dataset as pds
    t = pds.dataset(os.path.join(out, "vectors"),
                    partitioning="hive").to_table(columns=["vec_id"])
    assert t.num_rows == emb_ds.count()                   # not doubled


def test_incremental_update_exact_at_full_probe(emb_ds, tmp_path):
    """Build on half the corpus, append the other half with the EXISTING
    centroids: at n_probe = n_lists the result is exact brute force over
    the union regardless of centroid quality."""
    import pyarrow as pa
    from ics_search_engine_ray.pipelines.vector import (
        VectorIndex, build_vector_index, update_vector_index)
    from ics_search_engine_ray.stages.similarity import knn_brute

    half_a = emb_ds.map_batches(
        lambda b: b.filter(pa.compute.less(b.column("vec_id"), 250)),
        batch_format="pyarrow")
    half_b = emb_ds.map_batches(
        lambda b: b.filter(pa.compute.greater_equal(b.column("vec_id"),
                                                    250)),
        batch_format="pyarrow")
    out = str(tmp_path / "idx")
    man0 = build_vector_index(half_a, out, n_lists=8, iters=4)
    man1 = update_vector_index(half_b, out)
    assert man1["num_vectors"] == man0["num_vectors"] + half_b.count() \
        == emb_ds.count()

    vi = VectorIndex(out)
    for r in emb_ds.take_all()[:5]:
        q = np.asarray(r["embedding"], np.float64)
        got = vi.search(q, k=10, n_probe=8)
        want = knn_brute(emb_ds, q[None, :], k=10)[0]
        assert [g[0] for g in got] == [w[0] for w in want]


def test_update_retry_after_simulated_crash(emb_ds, tmp_path):
    """A crashed update (generation dir renamed into place but manifest
    never rewritten) leaves only unreferenced debris: the retry replaces
    it and the index serves exactly one copy of every vector."""
    import json
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ics_search_engine_ray.pipelines.vector import (
        VectorIndex, build_vector_index, update_vector_index)

    half_a = emb_ds.map_batches(
        lambda b: b.filter(pa.compute.less(b.column("vec_id"), 250)),
        batch_format="pyarrow")
    half_b = emb_ds.map_batches(
        lambda b: b.filter(pa.compute.greater_equal(b.column("vec_id"),
                                                    250)),
        batch_format="pyarrow")
    out = str(tmp_path / "idx")
    build_vector_index(half_a, out, n_lists=8, iters=4)

    # simulate the crash: the next generation dir exists with stale rows
    # but the manifest was never updated to reference it
    debris = os.path.join(out, "vectors-g0001", "list_id=0")
    os.makedirs(debris)
    pq.write_table(pa.table({
        "vec_id": pa.array([999_999], pa.int64()),
        "embedding": pa.array([[0.0] * 64],
                              pa.list_(pa.float32()))}),
        os.path.join(debris, "stale.parquet"))

    man = update_vector_index(half_b, out)
    assert man["generations"] == ["vectors", "vectors-g0001"]
    assert man["num_vectors"] == emb_ds.count()

    vi = VectorIndex(out)
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f)["num_vectors"] == emb_ds.count()
    # full probe over everything: every id exactly once, no stale row
    import pyarrow.dataset as pds
    t = pds.dataset([pds.dataset(d, partitioning="hive")
                     for d in vi.gen_dirs]).to_table(columns=["vec_id"])
    ids = sorted(t.column("vec_id").to_pylist())
    assert ids == sorted(r["vec_id"] for r in emb_ds.take_all())


def test_kmeans_and_vindex_custom_columns(ray_session, emb_ds, tmp_path):
    """Non-default id/vector column names flow through kmeans_assign and
    the vector-index build + search (regression: ivf_assign hardcoded
    'embedding')."""
    import pyarrow as pa
    from ics_search_engine_ray.pipelines.vector import (
        VectorIndex, build_vector_index)
    from ics_search_engine_ray.stages.similarity import kmeans_assign

    renamed = emb_ds.map_batches(
        lambda b: pa.table({"id": b.column("vec_id"),
                            "emb": b.column("embedding")}),
        batch_format="pyarrow")
    got = kmeans_assign(renamed, k=4, iters=2, vec_col="emb", id_col="id")
    rows = got.take_all()
    assert len(rows) == emb_ds.count()
    assert set(rows[0]) == {"id", "cluster"}

    out = str(tmp_path / "idx_custom")
    man = build_vector_index(renamed, out, n_lists=4, iters=2,
                             vec_col="emb", id_col="id")
    assert man["id_col"] == "id"
    vi = VectorIndex(out)
    q = emb_ds.take_all()[0]["embedding"]
    top = vi.search(q, k=1, n_probe=4)
    assert top and top[0][1] == pytest.approx(1.0, abs=1e-9)
