"""Host→device input prefetching.

The reference overlaps host work with the accelerator only implicitly via
torch ``DataLoader`` workers (``contrastive_RBVAE_train.py:713-714``); the
device copy itself (``.to(device)`` at ``:490``) still blocks the training
loop. Here a background thread gathers the next host batch and issues its
``jax.device_put`` while the current jitted step runs, so the transfer rides
under compute (JAX dispatch is async; ``device_put`` from a side thread is
safe and returns immediately with a future-backed array).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import jax
import jax.numpy as jnp

_END = object()


def prefetch_to_device(iterator: Iterable, sharding,
                       depth: int = 2) -> Iterator:
    """Yield device arrays for each host batch, ``depth`` steps ahead.

    Args:
      iterator: yields host ``np.ndarray`` batches.
      sharding: a ``jax.sharding.Sharding`` for the placed batches.
      depth: max in-flight device batches (2 ≈ double buffering).

    Exceptions raised by ``iterator`` propagate to the consumer at the
    point the failing batch would have been yielded.
    """
    q: queue.Queue = queue.Queue(maxsize=max(1, depth))

    def _worker():
        try:
            for item in iterator:
                q.put(("ok", jax.device_put(jnp.asarray(item), sharding)))
        except BaseException as e:  # noqa: BLE001 — re-raised on main thread
            q.put(("err", e))
            return
        q.put(("end", _END))

    t = threading.Thread(target=_worker, daemon=True,
                         name="svtpu-prefetch")
    t.start()
    while True:
        kind, val = q.get()
        if kind == "ok":
            yield val
        elif kind == "err":
            raise val
        else:
            return
