"""Headline benchmark: video→binary-symbol encode throughput per chip.

Measures the contrastive RBVAE encode path (uint8 frames → device →
normalize → conv trunk → LSTM → binary-concrete hard codes) on the first
available device, and compares against the measured reference-equivalent
torch pipeline (BENCH_BASELINE.json, best of its batch-1/batch-32 modes —
see scripts/measure_reference_baseline.py).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from svtpu.config import rbvae_variant
    from svtpu.models.rbvae import Seq2SeqBinaryVAE
    from svtpu.ops.image import to_float01

    latent = 50
    batch, reps = 256, 8
    cfg = rbvae_variant("contrastive", latent_dim=latent,
                        compute_dtype="bfloat16")
    model = Seq2SeqBinaryVAE(cfg)
    x0 = jnp.zeros((1, 1, 256, 256, 3), jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x0, 1.0, False,
                        deterministic=True)

    @jax.jit
    def encode(params, frames_u8, key):
        x = to_float01(frames_u8)[:, None]          # [B, T=1, H, W, C]
        z = model.apply(params, x, 0.2, True, 0.1,
                        method=Seq2SeqBinaryVAE.encode,
                        deterministic=False, bc_rng=key)
        return z.astype(jnp.uint8)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (batch, 256, 256, 3),
                                      dtype=np.uint8))
    key = jax.random.key(1)
    # Warmup + compile; np.asarray forces a device round-trip (plain
    # block_until_ready is unreliable through remote-execution relays).
    np.asarray(encode(params, frames, key))

    t0 = time.perf_counter()
    for i in range(reps):
        out = encode(params, frames, jax.random.fold_in(key, i))
    np.asarray(out)  # sync: device stream is sequential
    dt = time.perf_counter() - t0
    fps = batch * reps / dt

    baseline = None
    try:
        with open(os.path.join(os.path.dirname(__file__) or ".",
                               "BENCH_BASELINE.json")) as f:
            b = json.load(f)
        baseline = max(b.get("frames_per_sec_batch1", 0),
                       b.get("frames_per_sec_batch32", 0))
    except Exception:
        pass

    result = {
        "metric": "video->binary-symbol encode throughput "
                  "(contrastive RBVAE 256x256, latent 50)",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline, 2) if baseline else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
