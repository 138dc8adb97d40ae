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
    # Batch 512 is the measured throughput knee on v5e (73.8k f/s vs
    # 46.9k at 256 — RESULTS.md round-2 breakdown); the encode is an
    # offline/streaming path, so the larger batch is free to use.
    batch, reps = 512, 24
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
    # Compile + warm up. The first 1-3 post-compile invocations through the
    # remote-execution relay run ~50x slower than steady state, and plain
    # block_until_ready does not reliably block, so: >=8 warmup calls, each
    # synced by a (small) readback.
    for i in range(8):
        np.asarray(encode(params, frames, jax.random.fold_in(key, 100 + i)))

    # Median of >=5 timed trials; device stream is sequential, so one
    # readback at the end of each trial syncs the whole trial.
    trial_fps = []
    for t in range(5):
        t0 = time.perf_counter()
        for i in range(reps):
            out = encode(params, frames, jax.random.fold_in(key, t * reps + i))
        np.asarray(out)
        dt = time.perf_counter() - t0
        trial_fps.append(batch * reps / dt)
    fps = float(np.median(trial_fps))
    spread = (max(trial_fps) - min(trial_fps)) / fps

    # FLOP count for MFU: XLA's own cost analysis of the compiled encode.
    flops_per_call = None
    try:
        cost = (jax.jit(encode).lower(params, frames, key)
                .compile().cost_analysis())
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_call = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

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
        "trial_spread": round(spread, 3),
    }
    if flops_per_call:
        tflops = flops_per_call * fps / batch / 1e12
        result["tflops"] = round(tflops, 1)
        # v5e bf16 peak: 197 TFLOP/s (TPU v5e datasheet).
        result["mfu"] = round(tflops / 197.0, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
