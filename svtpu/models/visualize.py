"""Model smoke-test and architecture summary.

Rebuilds ``models/contrastive_RBVAE/visualize_RBVAE.py`` (reference :8-33 —
dummy-input forward pass while exporting a TensorBoard graph): here a dummy
forward plus ``nn.tabulate`` parameter table, optionally written into a
TensorBoard text summary.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from svtpu.config import RBVAEConfig, rbvae_variant
from svtpu.models.rbvae import Seq2SeqBinaryVAE


def summarize(cfg: RBVAEConfig, batch: int = 1, time_steps: int = 2,
              log_dir: Optional[str] = None) -> str:
    """Run a dummy forward and return the parameter/shape table."""
    model = Seq2SeqBinaryVAE(cfg)
    x = jnp.zeros((batch, time_steps) + cfg.input_hw + (cfg.in_channels,),
                  jnp.float32)
    table = nn.tabulate(
        model, {"params": jax.random.key(0)},
        compute_flops=False, compute_vjp_flops=False)(
            x, 1.0, False, deterministic=True)
    # Smoke-test an actual forward as the reference does.
    params = model.init({"params": jax.random.key(0)}, x, 1.0, False,
                        deterministic=True)
    out = model.apply(params, x, 1.0, False, deterministic=True)
    assert out.x_recon.shape == x.shape
    if log_dir:
        try:
            from tensorboardX import SummaryWriter

            w = SummaryWriter(log_dir)
            w.add_text("model_summary", f"```\n{table}\n```")
            w.close()
        except Exception:
            pass
    return table


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="contrastive")
    p.add_argument("--latent-dim", type=int, default=32)
    p.add_argument("--log-dir")
    a = p.parse_args()
    print(summarize(rbvae_variant(a.variant, a.latent_dim),
                    log_dir=a.log_dir))
