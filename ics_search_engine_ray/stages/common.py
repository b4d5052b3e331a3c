"""Shared small-side broadcast filters for Dataset pipelines."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def filter_dropped_ids(dropped_ref, id_col: str = "doc_id"):
    """batch-fn factory: drop rows whose ``id_col`` is in the broadcast set.

    The drop set rides in the object store (``ray.put`` once by the driver);
    tasks ``ray.get`` it — Ray caches the object per worker process, so it is
    fetched once per worker, not per batch (broadcast-small-side pattern).
    The sorted Arrow value-set array is likewise built once per worker.
    """
    import ray

    state: dict = {}     # per-worker cache (Ray caches the deserialized fn
                         # per worker process, so this survives across batches)

    def fn(batch: pa.Table) -> pa.Table:
        if "arr" not in state:
            dropped = ray.get(dropped_ref)
            state["arr"] = pa.array(sorted(dropped), pa.int64()) if dropped else None
        arr = state["arr"]
        if arr is None:
            return batch
        mask = pc.invert(pc.is_in(batch.column(id_col), value_set=arr))
        return batch.filter(mask)

    return fn
