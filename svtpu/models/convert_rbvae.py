"""Torch RBVAE checkpoint → svtpu parameter conversion.

Lets users of the reference load their trained ``best_model_*.pt``
checkpoints (saved as ``{.., model_state_dict, ..}`` —
``contrastive_RBVAE_train.py:668-673``, ``contrastive_RBVAE_wandb_sweep.py:
136-147``) into the svtpu ``Seq2SeqBinaryVAE``.

Torch module layout (``contrastive_RBVAE_model.py``):
  encoder_cnn.conv.{0,3,6}   Conv2d           (simple variant: {0,2,4})
  encoder_cnn.fc             Linear
  decoder_cnn.fc             Linear
  decoder_cnn.deconv.{0,3,6} ConvTranspose2d  (simple variant: {0,2,4})
  encoder_rnn.lstm / decoder_rnn.lstm  nn.LSTM weight_ih/hh_l{k}, bias_*_l{k}
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from svtpu.config import RBVAEConfig


def _conv_w(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w, np.float32),
                                             (2, 3, 1, 0)))


def _convT_w(w):
    w = np.asarray(w, np.float32)[:, :, ::-1, ::-1]   # [I, O, kh, kw], flip
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def _linear(sd, name):
    return {"kernel": np.ascontiguousarray(
        np.asarray(sd[f"{name}.weight"], np.float32).T),
        "bias": np.asarray(sd[f"{name}.bias"], np.float32)}


def _lstm(sd, name, num_layers):
    out = {}
    for k in range(num_layers):
        w_ih = np.asarray(sd[f"{name}.weight_ih_l{k}"], np.float32)
        w_hh = np.asarray(sd[f"{name}.weight_hh_l{k}"], np.float32)
        b = (np.asarray(sd[f"{name}.bias_ih_l{k}"], np.float32)
             + np.asarray(sd[f"{name}.bias_hh_l{k}"], np.float32))
        out[f"w_ih_{k}"] = np.ascontiguousarray(w_ih.T)
        out[f"w_hh_{k}"] = np.ascontiguousarray(w_hh.T)
        out[f"b_{k}"] = b
    return out


def convert_rbvae(state_dict: Mapping[str, np.ndarray],
                  cfg: RBVAEConfig) -> Dict:
    """Build the flax ``{"params": ...}`` tree for ``Seq2SeqBinaryVAE``."""
    sd = state_dict
    if "model_state_dict" in sd:          # full checkpoint dict
        sd = sd["model_state_dict"]
    sd = {k: (v.detach().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}

    n_stages = len(cfg.conv_features)
    # Sequential indices of the Conv modules: stride 3 with dropout
    # (Conv,ReLU,Dropout), stride 2 without.
    step = 3 if cfg.conv_dropout > 0 else 2
    conv_idx = [i * step for i in range(n_stages)]

    # torch flattens NCHW (channel-major); svtpu flattens NHWC — the fc
    # weights must be permuted between the two orderings.
    C = cfg.conv_features[-1]
    H, W = cfg.encoded_hw

    def chw_to_hwc_cols(w_lat_flat):          # [latent, C*H*W] → [latent, HWC]
        return w_lat_flat.reshape(-1, C, H, W).transpose(0, 2, 3, 1) \
            .reshape(w_lat_flat.shape[0], -1)

    enc = {}
    for s, i in enumerate(conv_idx):
        enc[f"conv_{s}"] = {
            "kernel": _conv_w(sd[f"encoder_cnn.conv.{i}.weight"]),
            "bias": np.asarray(sd[f"encoder_cnn.conv.{i}.bias"], np.float32)}
    enc_fc_w = np.asarray(sd["encoder_cnn.fc.weight"], np.float32)
    enc["fc"] = {
        "kernel": np.ascontiguousarray(chw_to_hwc_cols(enc_fc_w).T),
        "bias": np.asarray(sd["encoder_cnn.fc.bias"], np.float32)}

    dec_fc_w = np.asarray(sd["decoder_cnn.fc.weight"], np.float32)  # [flat, L]
    dec_fc_b = np.asarray(sd["decoder_cnn.fc.bias"], np.float32)
    dec = {"fc": {
        "kernel": np.ascontiguousarray(chw_to_hwc_cols(dec_fc_w.T)),
        "bias": dec_fc_b.reshape(C, H, W).transpose(1, 2, 0).reshape(-1)}}
    for s, i in enumerate(conv_idx):
        dec[f"deconv_{s}"] = {
            "kernel": _convT_w(sd[f"decoder_cnn.deconv.{i}.weight"]),
            "bias": np.asarray(sd[f"decoder_cnn.deconv.{i}.bias"],
                               np.float32)}

    params = {
        "encoder_cnn": enc,
        "decoder_cnn": dec,
        "encoder_rnn": _lstm(sd, "encoder_rnn.lstm", cfg.lstm_layers),
        "decoder_rnn": _lstm(sd, "decoder_rnn.lstm", cfg.lstm_layers),
    }
    return {"params": params}


def load_rbvae_checkpoint(path: str, cfg: RBVAEConfig) -> Dict:
    """Load a reference ``.pt`` checkpoint file and convert."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return convert_rbvae(obj, cfg)
