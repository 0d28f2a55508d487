"""Per-worker runtime tuning for Arrow-batched UDFs.

Spark runs one Python worker per core; pyarrow's default CPU/IO thread
pools are sized to the whole machine, so N workers x N arrow threads
oversubscribes the box quadratically (32 workers x 32 threads = 1024
runnable threads at local[32]) — thread thrash and allocator contention
that shows up as collapsing per-core throughput as parallelism rises.
Every mapInArrow/applyInArrow entrypoint in this package calls
``limit_worker_threads()`` once per process: each worker is a single
lane; parallelism comes from Spark's task scheduling, not nested pools.
"""

from __future__ import annotations

_done = False


def limit_worker_threads() -> None:
    global _done
    if _done:
        return
    import pyarrow as pa

    try:
        if pa.cpu_count() > 1:
            pa.set_cpu_count(1)
        if pa.io_thread_count() > 2:
            pa.set_io_thread_count(2)
    except Exception:  # pragma: no cover - best effort on older pyarrow
        pass
    _done = True
