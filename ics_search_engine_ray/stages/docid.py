"""Dense deterministic doc_id assignment: global sorted-key rank (T4 option).

The default doc_id is the coordination-free ``md5(url)`` hash
(stages/tokenize.py:url_doc_id). When *compact* ids matter (e.g. dense
arrays indexed by doc_id, smaller delta-encoded postings), this stage
assigns ``doc_id = rank of url in the globally sorted url order`` —
deterministic across runs and parallelism levels, replacing the reference's
arrival-order counter (reference: indexer.py:32,76,
multithread_indexer.py:102-104) without any shared mutable state.

Distributed plan (no full materialization on the driver):

1. sample keys -> P-1 range boundaries (driver holds only the boundaries),
2. ``map_batches``: pkey = searchsorted(boundaries, key)  (range partition),
3. ``groupby(pkey).count()``: per-partition counts -> driver cumsum gives
   each partition's global rank offset (a P-row table),
4. ``groupby(pkey).map_groups``: sort the partition by key, ids =
   offset[pkey] + arange — exact global rank because range partitioning
   guarantees every key in partition k sorts before every key in k+1.

Skew note: boundaries come from a uniform sample, so hot ranges get at most
~2x the mean partition size w.h.p.; at 100 TB raise ``num_partitions`` and
``sample_size`` together.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def assign_dense_doc_ids(ds, key: str = "url", id_col: str = "doc_id",
                         num_partitions: int = 64, sample_size: int = 4096):
    """Dataset with a unique string ``key`` column -> same rows plus
    ``id_col`` = dense rank of ``key`` in global sort order (0..N-1).

    Duplicate keys get distinct consecutive ids (ties broken by position
    within the sorted partition — deterministic given a deterministic sort).
    """
    import ray

    # 1. boundaries from a sample (driver holds ~sample_size strings, once)
    n = ds.count()
    if n == 0:
        return ds.map_batches(
            lambda b: b.append_column(id_col, pa.array([], pa.int64())),
            batch_format="pyarrow")
    frac = min(1.0, sample_size / max(n, 1))
    sample = ds.select_columns([key]).random_sample(frac, seed=7).take_all()
    keys = sorted(r[key] for r in sample)
    P = min(num_partitions, max(1, len(keys)))
    bounds: List[str] = [keys[int(i * len(keys) / P)] for i in range(1, P)] if keys else []

    def add_pkey(batch: pa.Table) -> pa.Table:
        ks = batch.column(key).to_pylist()
        pk = np.searchsorted(np.array(bounds, dtype=object), np.array(ks, dtype=object),
                             side="right") if bounds else np.zeros(len(ks), dtype=np.int64)
        return batch.append_column("_pkey", pa.array(pk.astype(np.int64), pa.int64()))

    keyed = ds.map_batches(add_pkey, batch_format="pyarrow").materialize()

    # 3. per-partition counts -> global offsets (tiny: P rows)
    counts = {int(r["_pkey"]): int(r["count()"])
              for r in keyed.groupby("_pkey").count().take_all()}
    offsets = np.zeros(P + 1, dtype=np.int64)
    for p in range(P):
        offsets[p + 1] = offsets[p] + counts.get(p, 0)
    off_ref = ray.put(offsets)

    # 4. rank within each range partition
    def rank_group(g: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        p = int(g.column("_pkey")[0].as_py())
        order = pc.sort_indices(g, sort_keys=[(key, "ascending")])
        g = g.take(order)
        ids = offs[p] + np.arange(g.num_rows, dtype=np.int64)
        return g.drop(["_pkey"]).append_column(id_col, pa.array(ids, pa.int64()))

    return keyed.groupby("_pkey").map_groups(rank_group, batch_format="pyarrow")
