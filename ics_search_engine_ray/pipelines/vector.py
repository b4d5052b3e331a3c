"""Persistable IVF vector index: build once with Ray, serve point queries
from the partitioned layout — the vector-search counterpart of the text
index lifecycle (build -> segments -> SearchIndex).

Layout (``out_dir/``)::

    manifest.json               n_lists, dim, num_vectors, iters, version
    centroids.json              n_lists x dim row-major floats (tiny)
    vectors/list_id=K/*.parquet hive-partitioned (vec_id, embedding)

Build is fully distributed: :func:`..stages.similarity.kmeans_fit` trains
the coarse quantizer in streaming Lloyd passes (vectors never shuffle),
``ivf_assign`` labels each vector in one map pass, and Ray's
``write_parquet(partition_cols=["list_id"])`` lays the corpus out so a
query touches ONLY its probed lists (partition pruning at the read — the
same "prune at the read" rule the text index follows with row groups).

Query is the FAISS-style serving path: nearest ``n_probe`` centroids ->
read just those hive partitions -> one matmul. Driver memory is bounded
by the probed fraction (n_probe / n_lists); size ``n_lists`` with the
corpus so individual lists stay serveable (the standard IVF contract).
For full-corpus batch queries at scale use the streaming
``stages.similarity.knn_ivf`` instead.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import List, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_VERSION = 1


def build_vector_index(embeds, out_dir: str, n_lists: int = 32,
                       iters: int = 8,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> dict:
    """Train + assign + write; returns the manifest. Clears any previous
    ``vectors/`` layout first (Ray ``write_parquet`` APPENDS)."""
    from ..stages.similarity import ivf_assign, kmeans_fit

    cent = kmeans_fit(embeds, k=n_lists, iters=iters,
                      vec_col=vec_col, id_col=id_col)
    if cent.size == 0:
        raise ValueError("cannot build a vector index from an empty corpus")
    n_total = embeds.count()
    vec_dir = os.path.join(out_dir, "vectors")
    shutil.rmtree(vec_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    assigned = ivf_assign(embeds.select_columns([id_col, vec_col]), cent,
                          vec_col=vec_col)
    assigned.write_parquet(vec_dir, partition_cols=["list_id"])

    manifest = {"version": _VERSION, "n_lists": int(cent.shape[0]),
                "dim": int(cent.shape[1]), "num_vectors": int(n_total),
                "iters": int(iters), "id_col": id_col, "vec_col": vec_col,
                "generations": ["vectors"]}
    # atomic writes so a killed build never leaves a half manifest
    for name, obj in (("centroids.json", cent.tolist()),
                      ("manifest.json", manifest)):
        tmp = os.path.join(out_dir, name + ".tmp")
        with open(tmp, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, os.path.join(out_dir, name))
    return manifest


def update_vector_index(embeds_new, index_dir: str) -> dict:
    """Incremental append: assign NEW vectors with the EXISTING centroids
    (the IVF contract — centroids stay fixed between retrains, recall
    degrades gracefully as the corpus drifts).

    TRANSACTIONAL: each update writes a fresh hive-partitioned
    GENERATION dir (staged under a temp name, os.rename'd into place)
    and only then atomically rewrites the manifest to reference it. A
    crashed or retried update therefore never double-counts — an
    unreferenced staging dir is the only debris (safe to delete; it is
    invisible to readers). The caller guarantees new ids are disjoint
    from the existing corpus (url-hash ids satisfy this by
    construction)."""
    from ..stages.similarity import ivf_assign

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    with open(os.path.join(index_dir, "centroids.json")) as f:
        cent = np.asarray(json.load(f), np.float64)
    id_col, vec_col = manifest["id_col"], manifest["vec_col"]
    gens = manifest.get("generations", ["vectors"])
    gen_name = f"vectors-g{len(gens):04d}"
    stage_name = gen_name + ".staging"
    stage_dir = os.path.join(index_dir, stage_name)
    shutil.rmtree(stage_dir, ignore_errors=True)   # debris from a retry

    n_new = embeds_new.count()
    assigned = ivf_assign(embeds_new.select_columns([id_col, vec_col]),
                          cent, vec_col=vec_col)
    assigned.write_parquet(stage_dir, partition_cols=["list_id"])
    final_dir = os.path.join(index_dir, gen_name)
    # a crash between rename and manifest write leaves final_dir as
    # unreferenced (hence invisible) debris; a retry replaces it
    shutil.rmtree(final_dir, ignore_errors=True)
    os.rename(stage_dir, final_dir)

    manifest["generations"] = gens + [gen_name]
    manifest["num_vectors"] = int(manifest["num_vectors"]) + int(n_new)
    tmp = os.path.join(index_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, "manifest.json"))
    return manifest


class VectorIndex:
    """Point-query reader over a built index dir. No Ray needed: loads the
    tiny centroid matrix, prunes to the probed hive partitions with a
    pyarrow dataset filter, one matmul, deterministic (-cos, vec_id)
    top-k tie-break (same order as ``knn_brute``)."""

    def __init__(self, index_dir: str):
        with open(os.path.join(index_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        with open(os.path.join(index_dir, "centroids.json")) as f:
            self.centroids = np.asarray(json.load(f), np.float64)
        # one dir per update generation (see update_vector_index); only
        # manifest-referenced generations are visible
        self.gen_dirs = [os.path.join(index_dir, g)
                         for g in self.manifest.get("generations",
                                                    ["vectors"])]
        self.id_col = self.manifest["id_col"]
        self.vec_col = self.manifest["vec_col"]

    def search(self, qvec: Sequence[float], k: int = 10,
               n_probe: int = 8) -> List[Tuple[int, float]]:
        import pyarrow.dataset as pds

        q = np.asarray(qvec, np.float64)
        qn = np.linalg.norm(q)
        if qn:
            q = q / qn
        n_probe = max(1, min(n_probe, self.centroids.shape[0]))
        probes = np.argsort(-(self.centroids @ q))[:n_probe]
        dset = pds.dataset([pds.dataset(d, partitioning="hive")
                            for d in self.gen_dirs])
        t = dset.to_table(
            filter=pc.field("list_id").isin([int(p) for p in probes]),
            columns=[self.id_col, self.vec_col])
        if t.num_rows == 0:
            return []
        from ..stages.similarity import _list_col_np
        ids = t.column(self.id_col).to_numpy(zero_copy_only=False)
        mat = _list_col_np(t.column(self.vec_col))
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        cos = (mat / norms[:, None]) @ q
        order = np.lexsort((ids, -cos))[:k]
        return [(int(ids[i]), float(cos[i])) for i in order]
