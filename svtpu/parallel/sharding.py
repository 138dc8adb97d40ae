"""Parameter partition rules: data + tensor parallelism via GSPMD.

The reference has no model parallelism anywhere (SURVEY.md §2.9). Here the
large parameters — the RBVAE's flatten-projection Dense layers (65,536 x L
pixels / 56,320 x L percep) and the AutoencoderKL's wide conv stacks — can
be sharded over a ``model`` mesh axis; XLA inserts the all-reduces. Batches
shard over ``data``. Everything small stays replicated (sharding a 32-wide
LSTM would only add latency).

Rules are (regex over the "/"-joined param path) → PartitionSpec, first
match wins; unmatched params are replicated.
"""
from __future__ import annotations

import re
from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# Row-parallel big projections: kernel [D_in, D_out] sharded on D_in, so the
# matmul's contraction is local and XLA emits one psum per layer.
RBVAE_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*encoder_cnn/fc/kernel", P("model", None)),
    (r".*decoder_cnn/fc/kernel", P(None, "model")),
)

# AutoencoderKL: shard wide conv output channels; the following layer's
# input-channel contraction then all-reduces. GroupNorm params follow their
# conv's channel sharding.
AUTOENCODER_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*(mid_attn_1)/(q|k|v)/kernel", P(None, None, None, "model")),
    (r".*(mid_attn_1)/proj_out/kernel", P(None, None, "model", None)),
    (r".*conv(1|2|_in|_out)/kernel", P(None, None, None, "model")),
)


def _spec_for(path: str, rules) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def params_shardings(params, mesh: Mesh, rules=RBVAE_TP_RULES):
    """Tree of NamedShardings matching ``params``' structure.

    Falls back to replication for any rule whose sharded dimension does not
    divide the parameter (tiny models under big meshes).
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    for key_path, leaf in flat:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in key_path)
        spec = _spec_for(path, rules)
        # Validate divisibility; replicate otherwise.
        ok = True
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            if dim >= leaf.ndim or leaf.shape[dim] % axis_sizes[axis]:
                ok = False
                break
        out.append(NamedSharding(mesh, spec if ok else P()))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_params(params, mesh: Mesh, rules=RBVAE_TP_RULES):
    return jax.device_put(params, params_shardings(params, mesh, rules))
