"""Work around pathologically slow first-touch page faults in Ray processes.

Measured on this machine (Linux 6.18, Ray 2.49 local mode): in any process
that has called ``ray.init`` — driver or long-lived worker — writing to a
freshly ``mmap``-ed region runs ~100x slower than normal (4-20 s to first-
touch 512 MB vs 0.07 s on re-write; a fresh non-Ray process is fast).  Every
large numpy allocation (>128 KB, glibc's default mmap threshold) lands in a
new mmap, so each big ``astype``/``unpackbits``/accumulator in a hot path
pays the penalty again.

Raising the malloc mmap threshold makes glibc serve large allocations from
the main heap, which keeps its pages faulted-in across allocations, and
disabling trim stops the heap from being released back.  One slow first
touch, then steady-state speed.  Idempotent; call from any hot entry point
(worker-side code may be cloudpickled by value, so the package ``__init__``
alone does not cover it).
"""

from __future__ import annotations

_done = False


def tune_malloc() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import ctypes
        import os
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD = -1
        M_MMAP_THRESHOLD = -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, -1)
        # optional heap pre-fault (off by default: fault handling is
        # globally serialized on this VM, so 32 workers warming 256 MB each
        # cost more wall time than the workload's own first allocations —
        # with trim disabled the heap reaches its true working-set size
        # after the first batch and stays there)
        mb = int(os.environ.get("ICSER_MALLOC_WARMUP_MB", "0"))
        if mb > 0:
            buf = bytearray(mb << 20)      # malloc + memset: touches every page
            del buf
    except Exception:
        pass
