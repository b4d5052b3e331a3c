"""Per-process reusable numpy buffer pool.

This sandbox VM's page-fault path is globally serialized (see BASELINE.md):
every *fresh* allocation's first touch costs far more than the compute on it.
Hot stages therefore reuse grow-only per-worker arenas instead of allocating
per batch/group — on real hardware this is still a mild win (no faults, no
zeroing), here it is the difference between ms and seconds per task.

Not thread-safe; Ray workers run tasks single-threaded, which is the only
context these are used from.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

_ARENAS: Dict[Tuple[str, str], np.ndarray] = {}


def get_buf(key: str, shape, dtype) -> np.ndarray:
    """An uninitialised array view of `shape` backed by a reused arena.

    Two calls with the same `key` return views over the SAME memory — callers
    must be done with the previous view before asking again under that key.
    """
    dt = np.dtype(dtype)
    k = (key, dt.str)
    need = int(np.prod(shape, dtype=np.int64))
    arena = _ARENAS.get(k)
    if arena is None or arena.size < need:
        cap = max(need, 2 * (arena.size if arena is not None else 0))
        arena = np.empty(cap, dt)
        _ARENAS[k] = arena
    return arena[:need].reshape(shape)


def fsb_to_numpy(col, nbytes: int) -> np.ndarray:
    """Zero-copy view of a pyarrow fixed_size_binary column as (n, nbytes)
    uint8 — avoids the to_pylist + b''.join copy in hot paths."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, nbytes), dtype=np.uint8)
    if col.null_count:
        raise ValueError("fsb_to_numpy: nulls not supported")
    if not pa.types.is_fixed_size_binary(col.type):
        # variable-length binary with uniform item size: raises on mismatch
        col = col.cast(pa.binary(nbytes))
    buf = col.buffers()[1]
    flat = np.frombuffer(buf, dtype=np.uint8)
    return flat[col.offset * nbytes:(col.offset + n) * nbytes].reshape(n, nbytes)
