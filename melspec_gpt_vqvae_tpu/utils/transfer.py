"""Device->host transfer tuned for slow links.

On a directly-attached TPU host, ``jax.device_get`` moves GB/s and none of
this matters.  Through the remote-TPU tunnel used in development
(``axon`` backend) single-stream d2h is erratic — measured anywhere from
~0.2 to ~12 MB/s on incompressible data (the tunnel compresses constants,
so ones() benchmarks lie) — but it is per-stream limited: 4 concurrent
16 MB row-slice fetches sustained ~34 MB/s in the same minute a plain
64 MB fetch ran at 0.2 MB/s (measured 2026-08, BENCH_NOTES.md
"checkpoint d2h").  ``chunked_device_get`` therefore fans leaf
row-slices across a small thread pool into preallocated numpy buffers.
The threaded path engages only when the backend reports the remote
platform ("axon"), since real hosts gain nothing from it.
"""

from __future__ import annotations

import concurrent.futures
from typing import Any, List, Tuple

import jax
import numpy as np

_CHUNK_BYTES = 16 * 1024 * 1024
_WORKERS = 4


def _remote_backend() -> bool:
    try:
        return jax.default_backend() == "axon"
    except Exception:
        return False


def chunked_device_get(tree: Any, chunk_bytes: int = _CHUNK_BYTES,
                       workers: int = _WORKERS,
                       force: bool = False) -> Any:
    """Host snapshot of a pytree.  Threaded row-sliced fetch on remote
    backends (or when ``force``), plain ``jax.device_get`` otherwise."""
    if not force and not _remote_backend():
        return jax.tree_util.tree_map(np.asarray, jax.device_get(tree))

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out: List[Any] = [None] * len(leaves)
    tasks: List[Tuple[int, int, int]] = []   # (leaf index, row start, stop)
    for i, x in enumerate(leaves):
        if not hasattr(x, "shape") or not hasattr(x, "dtype"):
            out[i] = x
            continue
        nbytes = (int(np.prod(x.shape)) if x.shape else 1) \
            * np.dtype(x.dtype).itemsize
        if x.ndim == 0 or nbytes <= chunk_bytes:
            tasks.append((i, -1, -1))        # whole-leaf fetch
        else:
            out[i] = np.empty(x.shape, np.dtype(x.dtype))
            rows = max(1, int(chunk_bytes // (nbytes / x.shape[0])))
            for s in range(0, x.shape[0], rows):
                tasks.append((i, s, min(s + rows, x.shape[0])))

    def fetch(task):
        i, s, e = task
        if s < 0:
            out[i] = np.asarray(jax.device_get(leaves[i]))
        else:
            out[i][s:e] = jax.device_get(leaves[i][s:e])

    with concurrent.futures.ThreadPoolExecutor(workers) as ex:
        list(ex.map(fetch, tasks))
    return jax.tree_util.tree_unflatten(treedef, out)
