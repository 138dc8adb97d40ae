"""Device-mesh and sharding helpers.

The reference's only parallelism is dormant NCCL DDP in the vendored SD
harness (``src/stable-diffusion/main.py:521``; SURVEY.md §2.9). Here data
parallelism is first-class: a ``Mesh`` over all devices, batches sharded on
the ``data`` axis, parameters replicated (or sharded on ``model`` for the
big dense layers of the perceptual encoder), gradients all-reduced by XLA
collectives under ``jit`` — no external comm library.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = (-1,),
              axes: Sequence[str] = ("data",),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a mesh over the available devices.

    ``shape`` may contain one ``-1`` which absorbs all remaining devices
    (so ``(-1,)`` = pure data parallel over every chip).
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Pad ``x`` along ``axis`` (repeating row 0) to a multiple; returns
    (padded, original_len)."""
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    pad_block = np.take(x, [0] * pad, axis=axis)
    return np.concatenate([x, pad_block], axis=axis), n
