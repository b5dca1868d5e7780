"""Host→device prefetching for the training data feed.

Builds batches (h5 reads, bag sampling, stacking) on a background thread and
issues ``jax.device_put`` ahead of consumption, so host data work and device
transfers overlap with the jitted train step — the same double-buffering role
the reference delegates to torch DataLoader workers (SURVEY.md §3.2).
"""

from __future__ import annotations

import queue
import threading
from collections.abc import Iterable, Iterator
from typing import Any

import jax
import jax.numpy as jnp


def prefetch_to_device(
    iterable: Iterable[Any], *, size: int = 2, device=None
) -> Iterator[Any]:
    """Yield batches moved to device, keeping up to ``size`` in flight."""
    q: queue.Queue = queue.Queue(maxsize=size)
    _SENTINEL = object()
    error: list[BaseException] = []

    def producer() -> None:
        try:
            for batch in iterable:
                moved = jax.tree_util.tree_map(
                    lambda x: jax.device_put(jnp.asarray(x), device), batch
                )
                q.put(moved)
        except BaseException as e:  # noqa: BLE001 — reraised on consumer side
            error.append(e)
        finally:
            q.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        yield item
    thread.join()
    if error:
        raise error[0]
