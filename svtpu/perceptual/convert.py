"""Torch SD-checkpoint → JAX parameter conversion for AutoencoderKL.

The reference loads ``sd-v1-4.ckpt`` with ``strict=False`` and only the
``first_stage_model.*`` tensors matter for the embedding pipeline
(``get_percep_embeddings.py:31-46``; SURVEY.md §2.8). This converter maps
exactly those tensors onto the ``svtpu.models.autoencoder_kl.AutoencoderKL``
parameter tree.

Layout changes: torch conv weights OIHW → flax HWIO; GroupNorm
``weight``/``bias`` → ``scale``/``bias``. Attention q/k/v/proj are 1x1 convs
on both sides, so the same transpose applies.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from svtpu.config import PerceptualConfig

PREFIX = "first_stage_model."


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _set(tree: dict, path, leaf, value):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = value


def _put(tree, sd, torch_name, path, kind):
    """kind: 'conv' or 'norm'."""
    w = np.asarray(sd[f"{torch_name}.weight"], np.float32)
    b = np.asarray(sd[f"{torch_name}.bias"], np.float32)
    if kind == "conv":
        _set(tree, path, "kernel", _conv_w(w))
        _set(tree, path, "bias", b)
    else:
        _set(tree, path, "scale", w)
        _set(tree, path, "bias", b)


def _resblock(tree, sd, tname, jpath):
    _put(tree, sd, f"{tname}.norm1", jpath + ("norm1", "norm"), "norm")
    _put(tree, sd, f"{tname}.conv1", jpath + ("conv1",), "conv")
    _put(tree, sd, f"{tname}.norm2", jpath + ("norm2", "norm"), "norm")
    _put(tree, sd, f"{tname}.conv2", jpath + ("conv2",), "conv")
    if f"{tname}.nin_shortcut.weight" in sd:
        _put(tree, sd, f"{tname}.nin_shortcut", jpath + ("nin_shortcut",),
             "conv")


def _attnblock(tree, sd, tname, jpath):
    _put(tree, sd, f"{tname}.norm", jpath + ("norm", "norm"), "norm")
    for name in ("q", "k", "v", "proj_out"):
        _put(tree, sd, f"{tname}.{name}", jpath + (name,), "conv")


def convert_autoencoder_kl(state_dict: Mapping[str, np.ndarray],
                           cfg: PerceptualConfig = PerceptualConfig(),
                           prefix: str | None = None) -> Dict:
    """Build the flax ``{"params": ...}`` tree from a torch state dict.

    ``prefix``: key prefix to strip; auto-detects ``first_stage_model.``
    (full SD checkpoint) vs bare AutoencoderKL dicts.
    """
    if prefix is None:
        prefix = PREFIX if any(k.startswith(PREFIX) for k in state_dict) \
            else ""
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    p: Dict = {}

    # Encoder
    _put(p, sd, "encoder.conv_in", ("encoder", "conv_in"), "conv")
    for i in range(len(cfg.ch_mult)):
        for b in range(cfg.num_res_blocks):
            _resblock(p, sd, f"encoder.down.{i}.block.{b}",
                      ("encoder", f"down_{i}_block_{b}"))
        if i != len(cfg.ch_mult) - 1:
            _put(p, sd, f"encoder.down.{i}.downsample.conv",
                 ("encoder", f"down_{i}_downsample", "conv"), "conv")
    _resblock(p, sd, "encoder.mid.block_1", ("encoder", "mid_block_1"))
    _attnblock(p, sd, "encoder.mid.attn_1", ("encoder", "mid_attn_1"))
    _resblock(p, sd, "encoder.mid.block_2", ("encoder", "mid_block_2"))
    _put(p, sd, "encoder.norm_out", ("encoder", "norm_out", "norm"), "norm")
    _put(p, sd, "encoder.conv_out", ("encoder", "conv_out"), "conv")

    # Decoder
    _put(p, sd, "decoder.conv_in", ("decoder", "conv_in"), "conv")
    _resblock(p, sd, "decoder.mid.block_1", ("decoder", "mid_block_1"))
    _attnblock(p, sd, "decoder.mid.attn_1", ("decoder", "mid_attn_1"))
    _resblock(p, sd, "decoder.mid.block_2", ("decoder", "mid_block_2"))
    for i in range(len(cfg.ch_mult)):
        for b in range(cfg.num_res_blocks + 1):
            _resblock(p, sd, f"decoder.up.{i}.block.{b}",
                      ("decoder", f"up_{i}_block_{b}"))
        if i != 0:
            _put(p, sd, f"decoder.up.{i}.upsample.conv",
                 ("decoder", f"up_{i}_upsample", "conv"), "conv")
    _put(p, sd, "decoder.norm_out", ("decoder", "norm_out", "norm"), "norm")
    _put(p, sd, "decoder.conv_out", ("decoder", "conv_out"), "conv")

    _put(p, sd, "quant_conv", ("quant_conv",), "conv")
    _put(p, sd, "post_quant_conv", ("post_quant_conv",), "conv")
    return {"params": p}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.ckpt``/``.pt`` file to a numpy state dict (CPU, no grad)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}
