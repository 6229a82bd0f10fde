"""Host→device prefetching loader.

Keeps the input pipeline off the critical path (SURVEY.md §7): a background
thread runs the host loader (decode + augment + collate) and issues
device_put ahead of consumption, so the TPU step never waits on host work.
Double-buffered by default; with a mesh, batches land pre-sharded on the
'data' axis.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

_SENTINEL = object()


def device_prefetch(host_iter: Iterator, mesh=None, buffer_size: int = 2,
                    keys=None):
    """Wrap a host batch iterator with background transfer.

    ``keys`` restricts which dict entries are transferred (others pass
    through untouched, e.g. meta strings stay on host).
    """
    import jax

    if mesh is not None:
        from ..parallel import batch_sharding
        sharding = batch_sharding(mesh)
        put = lambda x: jax.device_put(x, sharding)   # noqa: E731
    else:
        put = jax.device_put

    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    err = []

    def worker():
        try:
            for batch in host_iter:
                if isinstance(batch, dict):
                    out = {}
                    for k, v in batch.items():
                        if keys is None or k in keys:
                            try:
                                out[k] = put(v)
                            except TypeError:
                                out[k] = v          # non-array meta
                        else:
                            out[k] = v
                else:
                    out = put(batch)
                q.put(out)
        except BaseException as e:                   # surface in consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
