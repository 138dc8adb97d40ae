"""Extended benchmark suite (beyond the driver's headline bench.py).

Measures, on the available TPU:
  * RBVAE encode throughput (pixels → binary codes), batch sweep
  * RBVAE train-step throughput (frames/sec through the full fused pair step)
  * AutoencoderKL encoder throughput at SD resolution (1280x704 → latents)
  * flash-attention kernel TFLOPS at the mid-block shape
  * host data plane: native JPEG batch decode vs PIL

All timings force a device readback (remote relays make block_until_ready
unreliable). Prints one JSON object per line.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args_list):
    import jax.numpy as jnp

    out = fn(*args_list[0])
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # warm + sync
    t0 = time.perf_counter()
    for a in args_list:
        out = fn(*a)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / len(args_list)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def bench_rbvae_encode():
    from svtpu.config import rbvae_variant
    from svtpu.models.rbvae import Seq2SeqBinaryVAE
    from svtpu.ops.image import to_float01

    cfg = rbvae_variant("contrastive", latent_dim=50,
                        compute_dtype="bfloat16")
    model = Seq2SeqBinaryVAE(cfg)
    x0 = jnp.zeros((1, 1, 256, 256, 3), jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x0, 1.0, False,
                        deterministic=True)

    @jax.jit
    def enc(p, f, k):
        return model.apply(p, to_float01(f)[:, None], 0.2, True, 0.1,
                           method=Seq2SeqBinaryVAE.encode,
                           deterministic=False, bc_rng=k).astype(jnp.uint8)

    rng = np.random.default_rng(0)
    for batch in (64, 256, 512):
        frames = jnp.asarray(rng.integers(0, 255, (batch, 256, 256, 3),
                                          dtype=np.uint8))
        args = [(params, frames, jax.random.key(i)) for i in range(6)]
        dt = timed(enc, args)
        print(json.dumps({"bench": "rbvae_encode", "batch": batch,
                          "frames_per_sec": round(batch / dt, 1)}))


def bench_conv0_ab(batch=512, reps=24):
    """A/B: plain vs space-to-depth first conv (``RBVAEConfig.conv0_s2d``)
    on the full headline encode path. Identical math (parity test in
    tests/test_rbvae.py); this measures whether the 9C->16C contraction-
    axis growth pays on real hardware."""
    from svtpu.config import rbvae_variant
    from svtpu.models.rbvae import Seq2SeqBinaryVAE
    from svtpu.ops.image import to_float01

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (batch, 256, 256, 3),
                                      dtype=np.uint8))
    out = {}
    for tag, s2d in (("plain", False), ("s2d", True)):
        cfg = rbvae_variant("contrastive", latent_dim=50,
                            compute_dtype="bfloat16", conv0_s2d=s2d)
        model = Seq2SeqBinaryVAE(cfg)
        params = model.init({"params": jax.random.key(0)},
                            jnp.zeros((1, 1, 256, 256, 3), jnp.float32),
                            1.0, False, deterministic=True)

        @jax.jit
        def enc(p, f, k, model=model):
            return model.apply(p, to_float01(f)[:, None], 0.2, True, 0.1,
                               method=Seq2SeqBinaryVAE.encode,
                               deterministic=False,
                               bc_rng=k).astype(jnp.uint8)

        for i in range(8):
            np.asarray(enc(params, frames, jax.random.key(100 + i)))
        trials = []
        for t in range(5):
            t0 = time.perf_counter()
            for i in range(reps):
                o = enc(params, frames, jax.random.key(t * reps + i))
            np.asarray(o)
            trials.append(batch * reps / (time.perf_counter() - t0))
        out[tag] = float(np.median(trials))
        print(json.dumps({"bench": "conv0_ab", "path": tag,
                          "frames_per_sec": round(out[tag], 1)}))
    print(json.dumps({"bench": "conv0_ab", "s2d_over_plain":
                      round(out["s2d"] / out["plain"], 3)}))


def bench_sampler_ab():
    """A/B: XLA vs fused-Pallas Binary-Concrete sampler on the full encode
    path (VERDICT r1 item 4), plus the sampler op in isolation at a large
    shape (where the grid/blocking matters)."""
    from svtpu.config import rbvae_variant
    from svtpu.models.rbvae import Seq2SeqBinaryVAE
    from svtpu.ops.binarize import binary_concrete
    from svtpu.ops.binarize_pallas import binary_concrete_pallas
    from svtpu.ops.image import to_float01

    rng = np.random.default_rng(0)
    batch = 512
    frames = jnp.asarray(rng.integers(0, 255, (batch, 256, 256, 3),
                                      dtype=np.uint8))
    results = {}
    for name, flag in (("xla", False), ("pallas", True)):
        cfg = rbvae_variant("contrastive", latent_dim=50,
                            compute_dtype="bfloat16", pallas_sampler=flag)
        model = Seq2SeqBinaryVAE(cfg)
        x0 = jnp.zeros((1, 1, 256, 256, 3), jnp.float32)
        params = model.init({"params": jax.random.key(0)}, x0, 1.0, False,
                            deterministic=True)

        @jax.jit
        def enc(p, f, k):
            return model.apply(p, to_float01(f)[:, None], 0.2, True, 0.1,
                               method=Seq2SeqBinaryVAE.encode,
                               deterministic=False,
                               bc_rng=k).astype(jnp.uint8)

        for i in range(8):
            np.asarray(enc(params, frames, jax.random.key(i)))
        trials = []
        for t in range(5):
            t0 = time.perf_counter()
            for i in range(16):
                out = enc(params, frames, jax.random.key(100 + t * 16 + i))
            np.asarray(out)
            trials.append(batch * 16 / (time.perf_counter() - t0))
        results[name] = float(np.median(trials))
    print(json.dumps({"bench": "sampler_ab_encode_path", "batch": batch,
                      "xla_fps": round(results["xla"], 1),
                      "pallas_fps": round(results["pallas"], 1),
                      "pallas_speedup": round(
                          results["pallas"] / results["xla"], 3)}))

    # Op in isolation at a shape far beyond one VMEM block: [2^20, 64].
    big = jnp.asarray(rng.normal(size=(1 << 20, 64)), jnp.float32)
    xla_op = jax.jit(lambda x, k: binary_concrete(
        x, k, 0.2, True, noise_scale=0.1))
    pl_op = jax.jit(lambda x, s: binary_concrete_pallas(
        x, s, 0.2, 0.1, hard=True))
    op_res = {}
    for name, fn, arg in (("xla", xla_op, jax.random.key(0)),
                          ("pallas", pl_op, jnp.int32(7))):
        for i in range(8):
            np.asarray(fn(big, arg)[0, :1])
        trials = []
        for t in range(5):
            t0 = time.perf_counter()
            for i in range(8):
                out = fn(big, arg)
            np.asarray(out[0, :1])
            trials.append(8 * big.size / (time.perf_counter() - t0))
        op_res[name] = float(np.median(trials))
    print(json.dumps({"bench": "sampler_ab_op_64M",
                      "xla_gelem_s": round(op_res["xla"] / 1e9, 2),
                      "pallas_gelem_s": round(op_res["pallas"] / 1e9, 2),
                      "pallas_speedup": round(
                          op_res["pallas"] / op_res["xla"], 3)}))


def bench_rbvae_train_step():
    from svtpu.config import TrainConfig, VideoMeta, rbvae_variant
    from svtpu.data.segments import split_segments
    from svtpu.training.trainer import Trainer

    class Store:
        def __init__(self):
            r = np.random.default_rng(0)
            self.array = r.integers(0, 255, (480, 256, 256, 3),
                                    dtype=np.uint8)

        @property
        def item_shape(self):
            return self.array.shape[1:]

        def gather(self, idx):
            return self.array[np.asarray(idx)]

    meta = VideoMeta("b", flags=(74, 206, 282, 389), last_frame=479,
                     grey_out=10)
    splits = split_segments(meta.state_segments())
    mcfg = rbvae_variant("contrastive", latent_dim=50,
                         compute_dtype="bfloat16")
    tcfg = TrainConfig(batch_size=32)
    tr = Trainer(mcfg, tcfg, Store(), splits, meta.flags)
    state = tr.init_state()
    step = tr._make_train_step()
    batch = next(iter(tr.train_batcher.epoch(0)))
    b = jax.device_put(jnp.asarray(batch), tr._bsh)
    key = jax.random.key(0)
    # Warm thoroughly: the first few post-compile invocations through the
    # remote relay run orders of magnitude slower than steady state.
    for _ in range(8):
        state, m = step(state, b, key, tr._temp_floor)
    float(m["total_loss"])  # sync
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, b, key, tr._temp_floor)
    float(m["total_loss"])
    dt = (time.perf_counter() - t0) / n
    frames = int(np.prod(batch.shape[:3]))
    print(json.dumps({"bench": "rbvae_train_step", "batch_frames": frames,
                      "frames_per_sec": round(frames / dt, 1),
                      "step_ms": round(dt * 1e3, 2)}))


def bench_trunk_ab(batch=512, reps=24):
    """A/B: XLA vs fused-Pallas conv1->conv2 trunk on the full headline
    encode path (``RBVAEConfig.pallas_trunk``)."""
    from svtpu.config import rbvae_variant
    from svtpu.models.rbvae import Seq2SeqBinaryVAE
    from svtpu.ops.image import to_float01

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (batch, 256, 256, 3),
                                      dtype=np.uint8))
    out = {}
    for tag, flag, blk in (("xla", False, 1), ("pallas_trunk", True, 1),
                           ("pallas_trunk_b2", True, 2),
                           ("pallas_trunk_b4", True, 4)):
        cfg = rbvae_variant("contrastive", latent_dim=50,
                            compute_dtype="bfloat16", pallas_trunk=flag,
                            pallas_trunk_block=blk)
        model = Seq2SeqBinaryVAE(cfg)
        params = model.init({"params": jax.random.key(0)},
                            jnp.zeros((1, 1, 256, 256, 3), jnp.float32),
                            1.0, False, deterministic=True)

        @jax.jit
        def enc(p, f, k, model=model):
            return model.apply(p, to_float01(f)[:, None], 0.2, True, 0.1,
                               method=Seq2SeqBinaryVAE.encode,
                               deterministic=False,
                               bc_rng=k).astype(jnp.uint8)

        try:
            for i in range(8):
                np.asarray(enc(params, frames, jax.random.key(100 + i)))
        except Exception as e:  # e.g. VMEM overflow at big blocks
            print(json.dumps({"bench": "trunk_ab", "path": tag,
                              "error": str(e)[:200]}))
            continue
        trials = []
        for t in range(5):
            t0 = time.perf_counter()
            for i in range(reps):
                o = enc(params, frames, jax.random.key(t * reps + i))
            np.asarray(o)
            trials.append(batch * reps / (time.perf_counter() - t0))
        out[tag] = float(np.median(trials))
        print(json.dumps({"bench": "trunk_ab", "path": tag,
                          "frames_per_sec": round(out[tag], 1)}))
    pal = [v for k, v in out.items() if k != "xla"]
    if pal and "xla" in out:
        print(json.dumps({
            "bench": "trunk_ab",
            "pallas_over_xla": round(out.get("pallas_trunk", 0)
                                     / out["xla"], 3),
            "best_pallas_over_xla": round(max(pal) / out["xla"], 3)}))


def bench_int8_probe(batch=512, reps=24, m=8192):
    """Op-level probe: does int8 reach its 2x-over-bf16 MXU rate through
    XLA on this chip, for (a) a big square matmul and (b) the headline
    conv1 shape (stride-2 3x3 64->64 at 128^2, 83% of the encode path)?

    Decides whether a quantized encode path is worth building: v5e peak
    is 197 bf16 TFLOPS vs 394 int8 TOPS, and the encode path's output is
    binary codes behind a hard threshold, so precision headroom exists.
    Pure timing, scalar readback, 8 warmups, median of 5."""
    def run(fn, args, work):
        for i in range(8):
            np.asarray(fn(*args))
        trials = []
        for _ in range(5):
            t0 = time.perf_counter()
            for i in range(reps):
                o = fn(*args)
            np.asarray(o)
            trials.append(work * reps / (time.perf_counter() - t0))
        return float(np.median(trials))

    rng = np.random.default_rng(0)
    # (a) square matmul (default 8192^3: 1.1 TFLOP)
    mm_work = 2 * m * m * m
    a8 = jnp.asarray(rng.integers(-127, 127, (m, m), dtype=np.int8))
    ab = a8.astype(jnp.bfloat16)

    @jax.jit
    def mm_bf16(a, b):
        return (a @ b).sum()

    @jax.jit
    def mm_int8(a, b):
        return jax.lax.dot(a, b,
                           preferred_element_type=jnp.int32).sum()

    r_bf = run(mm_bf16, (ab, ab), mm_work)
    r_i8 = run(mm_int8, (a8, a8), mm_work)
    print(json.dumps({"bench": "int8_probe", "op": "matmul8192",
                      "bf16_tflops": round(r_bf / 1e12, 1),
                      "int8_tops": round(r_i8 / 1e12, 1),
                      "int8_over_bf16": round(r_i8 / r_bf, 2)}))

    # (b) conv1 shape: [B,128,128,64] (x) [3,3,64,64] stride 2 SAME
    cv_work = 2 * batch * 64 * 64 * 3 * 3 * 64 * 64
    x8 = jnp.asarray(rng.integers(-127, 127, (batch, 128, 128, 64),
                                  dtype=np.int8))
    k8 = jnp.asarray(rng.integers(-127, 127, (3, 3, 64, 64),
                                  dtype=np.int8))
    xb, kb = x8.astype(jnp.bfloat16), k8.astype(jnp.bfloat16)
    dn = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def cv_bf16(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (2, 2), "SAME", dimension_numbers=dn).sum()

    @jax.jit
    def cv_int8(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (2, 2), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32).sum()

    c_bf = run(cv_bf16, (xb, kb), cv_work)
    try:
        c_i8 = run(cv_int8, (x8, k8), cv_work)
    except Exception as e:
        print(json.dumps({"bench": "int8_probe", "op": "conv1",
                          "bf16_tflops": round(c_bf / 1e12, 1),
                          "int8_error": str(e)[:200]}))
        return
    print(json.dumps({"bench": "int8_probe", "op": "conv1",
                      "bf16_tflops": round(c_bf / 1e12, 1),
                      "int8_tops": round(c_i8 / 1e12, 1),
                      "int8_over_bf16": round(c_i8 / c_bf, 2)}))


def bench_int8_ab(batch=512, reps=24):
    """A/B: bf16-XLA vs int8_trunk on the full headline encode path,
    same params — frames/sec plus deterministic hard-code mismatch
    fraction (the quantized path is NOT bit-exact by construction; this
    records how far off it lands).

    Random-init logits sit near zero, where any quantization noise flips
    the hard threshold, so the mismatch number is only meaningful on
    TRAINED weights: set ``SVTPU_INT8_CKPT`` (orbax dir, with
    ``SVTPU_INT8_LATENT``, default 25) and optionally
    ``SVTPU_INT8_FRAMES`` (frame dir → real frames instead of noise)."""
    from svtpu.config import rbvae_variant
    from svtpu.models.rbvae import Seq2SeqBinaryVAE
    from svtpu.ops.image import to_float01

    ckpt = os.environ.get("SVTPU_INT8_CKPT")
    latent = int(os.environ.get("SVTPU_INT8_LATENT", "25")) if ckpt else 50
    frames_dir = os.environ.get("SVTPU_INT8_FRAMES")
    if frames_dir:
        from svtpu.data.datasets import FrameStore
        n = len([f for f in os.listdir(frames_dir) if f.endswith(".jpg")])
        idx = np.linspace(0, n - 1, min(batch, n)).astype(int)
        store = FrameStore(frames_dir, list(range(n)), resolution=(256, 256))
        frames = jnp.asarray(store.gather(idx))
        batch = frames.shape[0]
    else:
        rng = np.random.default_rng(0)
        frames = jnp.asarray(rng.integers(0, 255, (batch, 256, 256, 3),
                                          dtype=np.uint8))
    params = None
    out, codes = {}, {}
    for tag, flag in (("xla", False), ("int8", True)):
        cfg = rbvae_variant("contrastive", latent_dim=latent,
                            compute_dtype="bfloat16", int8_trunk=flag)
        model = Seq2SeqBinaryVAE(cfg)
        if params is None and ckpt:
            from svtpu.evaluation.common import RBVAEBundle
            # .params is the checkpoint's full variables dict already.
            params = RBVAEBundle.from_checkpoint(ckpt, cfg).params
        if params is None:
            params = model.init({"params": jax.random.key(0)},
                                jnp.zeros((1, 1, 256, 256, 3), jnp.float32),
                                1.0, False, deterministic=True)

        @jax.jit
        def enc(p, f, k, model=model):
            return model.apply(p, to_float01(f)[:, None], 0.2, True, 0.1,
                               method=Seq2SeqBinaryVAE.encode,
                               deterministic=False,
                               bc_rng=k).astype(jnp.uint8)

        @jax.jit
        def enc_det(p, f, model=model):
            return model.apply(p, to_float01(f)[:, None], 0.2, True, 0.1,
                               method=Seq2SeqBinaryVAE.encode,
                               deterministic=True).astype(jnp.uint8)

        codes[tag] = np.asarray(enc_det(params, frames))
        for i in range(8):
            np.asarray(enc(params, frames, jax.random.key(100 + i)))
        trials = []
        for t in range(5):
            t0 = time.perf_counter()
            for i in range(reps):
                o = enc(params, frames, jax.random.key(t * reps + i))
            np.asarray(o)
            trials.append(batch * reps / (time.perf_counter() - t0))
        out[tag] = float(np.median(trials))
        print(json.dumps({"bench": "int8_ab", "path": tag,
                          "frames_per_sec": round(out[tag], 1)}))
    mismatch = float((codes["xla"] != codes["int8"]).mean())
    print(json.dumps({"bench": "int8_ab",
                      "int8_over_xla": round(out["int8"] / out["xla"], 3),
                      "det_code_mismatch": round(mismatch, 5)}))


def bench_convopt_train_ab():
    """A/B the MXU conv transforms (conv0_s2d encoder + deconv_d2s
    decoder) on the full jitted train step (fwd+bwd+Adam)."""
    from svtpu.config import TrainConfig, VideoMeta, rbvae_variant
    from svtpu.data.segments import split_segments
    from svtpu.training.trainer import Trainer

    class Store:
        def __init__(self):
            r = np.random.default_rng(0)
            self.array = r.integers(0, 255, (480, 256, 256, 3),
                                    dtype=np.uint8)

        @property
        def item_shape(self):
            return self.array.shape[1:]

        def gather(self, idx):
            return self.array[np.asarray(idx)]

    meta = VideoMeta("b", flags=(74, 206, 282, 389), last_frame=479,
                     grey_out=10)
    splits = split_segments(meta.state_segments())
    out = {}
    for tag, kw in (("plain", {}),
                    ("mxu_opt", {"conv0_s2d": True, "deconv_d2s": True})):
        mcfg = rbvae_variant("contrastive", latent_dim=50,
                             compute_dtype="bfloat16", **kw)
        tr = Trainer(mcfg, TrainConfig(batch_size=32), Store(), splits,
                     meta.flags)
        state = tr.init_state()
        step = tr._make_train_step()
        batch = next(iter(tr.train_batcher.epoch(0)))
        b = jax.device_put(jnp.asarray(batch), tr._bsh)
        key = jax.random.key(0)
        for _ in range(8):
            state, m = step(state, b, key, tr._temp_floor)
        float(m["total_loss"])
        trials = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(4):
                state, m = step(state, b, key, tr._temp_floor)
            float(m["total_loss"])
            trials.append((time.perf_counter() - t0) / 4)
        dt = float(np.median(trials))
        frames = int(np.prod(batch.shape[:3]))
        out[tag] = frames / dt
        print(json.dumps({"bench": "convopt_train_ab", "path": tag,
                          "batch_frames": frames,
                          "frames_per_sec": round(out[tag], 1),
                          "step_ms": round(dt * 1e3, 2)}))
    print(json.dumps({"bench": "convopt_train_ab", "opt_over_plain":
                      round(out["mxu_opt"] / out["plain"], 3)}))


def bench_sd_encoder():
    from svtpu.config import PerceptualConfig
    from svtpu.models.autoencoder_kl import AutoencoderKL

    cfg = PerceptualConfig()
    model = AutoencoderKL(cfg)
    x0 = jnp.zeros((1, 704, 1280, 3), jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x0)

    @jax.jit
    def enc(p, x):
        return model.apply(p, x, method=AutoencoderKL.encode)

    rng = np.random.default_rng(0)
    for batch in (1, 4, 8):
        x = jnp.asarray(rng.normal(size=(batch, 704, 1280, 3)),
                        jnp.float32)
        args = [(params, x * (1 + 0.01 * i)) for i in range(4)]
        dt = timed(enc, args)
        print(json.dumps({"bench": "sd_encoder_1280x704", "batch": batch,
                          "frames_per_sec": round(batch / dt, 2),
                          "ms_per_frame": round(dt / batch * 1e3, 1)}))


def bench_flash_attention():
    from svtpu.ops.attention import flash_attention

    rng = np.random.default_rng(0)
    B, N, D = 1, 14080, 512
    mk = lambda: jnp.asarray(rng.normal(size=(B, N, D)), jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    f = jax.jit(flash_attention)
    args = [(q * (1 + 0.01 * i), k, v) for i in range(5)]
    dt = timed(f, args)
    print(json.dumps({"bench": "flash_attention_midblock",
                      "tokens": N, "dim": D,
                      "tflops": round(4 * N * N * D / dt / 1e12, 1),
                      "ms": round(dt * 1e3, 2)}))


def bench_attention_backward():
    """Cost of training THROUGH the perceptual AE's mid-block attention:
    the forward is the Pallas flash kernel, the backward a query-chunked
    XLA recompute (ops/attention.py). Decides whether a Pallas backward
    is warranted (VERDICT r1 item 8)."""
    from svtpu.ops.attention import attention

    rng = np.random.default_rng(0)
    B, N, D = 1, 14080, 512
    q, k, v = (jnp.asarray(rng.normal(size=(B, N, D)), jnp.bfloat16)
               for _ in range(3))

    # Random cotangent via vjp — a constant cotangent (grad of sum) lets
    # XLA collapse the dp/dv matmuls into reductions and fakes >peak TFLOPS.
    # Outputs are reduced to a scalar INSIDE the jit so the readback is a
    # genuine full-dependency sync (tiny-slice readbacks through the relay
    # under-measure).
    g = jnp.asarray(rng.normal(size=(B, N, D)), jnp.bfloat16)

    @jax.jit
    def fwd(q, k, v):
        return attention(q, k, v).astype(jnp.float32).sum()

    @jax.jit
    def grad(q, k, v):
        _, pull = jax.vjp(attention, q, k, v)
        dq, dk, dv = pull(g)
        return sum(t.astype(jnp.float32).sum() for t in (dq, dk, dv))

    def med(fn, n=5, reps=4):
        for _ in range(8):
            float(fn(q, k, v))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(q, k, v)
            float(out)
            ts.append((time.perf_counter() - t0) / reps)
        return float(np.median(ts))

    t_fwd, t_full = med(fwd), med(grad)
    t_bwd = t_full - t_fwd
    print(json.dumps({
        "bench": "attention_fwd_bwd_midblock", "tokens": N, "dim": D,
        "fwd_ms": round(t_fwd * 1e3, 2),
        "fwd_bwd_ms": round(t_full * 1e3, 2),
        "bwd_ms": round(t_bwd * 1e3, 2),
        "fwd_tflops": round(4 * N * N * D / t_fwd / 1e12, 1),
        "bwd_tflops": round(10 * N * N * D / max(t_bwd, 1e-9) / 1e12, 1),
        "bwd_over_fwd": round(t_bwd / t_fwd, 2)}))


def bench_encode_breakdown(batch=512, reps=32):
    """Per-stage timing + analytic roofline of the headline encode path.

    Every stage is timed with the scalar-in-graph sync protocol (stage →
    f32 sum inside the jit; the standalone sum of the stage's output is
    timed too and subtracted), so relay readback quirks cancel. Alongside
    achieved TFLOPS, prints each stage's MXU tiling ceiling — the fraction
    of the 128x128 systolic array the stage's GEMM shape can fill — which
    is the roofline argument for what the headline number *can* reach.
    """
    from svtpu.config import rbvae_variant
    from svtpu.models.rbvae import Seq2SeqBinaryVAE
    from svtpu.ops.binarize import binary_concrete
    from svtpu.ops.conv import Conv2dTorch, Dense
    from svtpu.ops.image import to_float01
    from svtpu.ops.lstm import LSTM

    latent = 50
    cfg = rbvae_variant("contrastive", latent_dim=latent,
                        compute_dtype="bfloat16")
    model = Seq2SeqBinaryVAE(cfg)
    params = model.init({"params": jax.random.key(0)},
                        jnp.zeros((1, 1, 256, 256, 3), jnp.float32),
                        1.0, False, deterministic=True)["params"]
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 255, (batch, 256, 256, 3),
                                  dtype=np.uint8))
    key = jax.random.key(1)

    enc = params["encoder_cnn"]
    conv = Conv2dTorch(64, 3, 2, 1, dtype=dt)
    fc = Dense(latent, dtype=dt)
    lstm = LSTM(latent, 2, dtype=dt)

    def s_norm(x):
        return to_float01(x, dt)

    def s_conv0(x):
        return jax.nn.relu(conv.apply({"params": enc["conv_0"]}, x))

    def s_conv1(x):
        return jax.nn.relu(conv.apply({"params": enc["conv_1"]}, x))

    def s_conv2(x):
        return conv.apply({"params": enc["conv_2"]}, x)

    def s_fc(x):
        return fc.apply({"params": enc["fc"]}, x.reshape(x.shape[0], -1))

    def s_lstm(x):
        return lstm.apply({"params": params["encoder_rnn"]}, x[:, None])

    def s_bin(x):
        return binary_concrete(x, key, 0.2, True, noise_scale=0.1)

    # FLOPs per frame (MACs*2) and the MXU tiling ceiling of the GEMM each
    # stage lowers to ([M, K] @ [K, N]): the fraction of the 128x128
    # systolic array the K (contraction) and N (output-lane) axes can fill
    # after padding to 128-tiles. M (= batch x positions) is large for
    # every stage, so it never limits.
    def mxu_ceiling(k_dim, n_dim):
        fill = lambda d: d / (-(-d // 128) * 128)  # noqa: E731
        return fill(k_dim) * fill(n_dim)

    stages = [
        # name, fn, flops/frame, K, N
        ("u8->f01", s_norm, 0, None, None),
        ("conv0 3->64 s2 (+relu)", s_conv0,
         2 * 128 * 128 * 64 * 27, 27, 64),
        ("conv1 64->64 s2 (+relu)", s_conv1,
         2 * 64 * 64 * 64 * 576, 576, 64),
        ("conv2 64->64 s2", s_conv2, 2 * 32 * 32 * 64 * 576, 576, 64),
        ("fc 65536->50", s_fc, 2 * 65536 * latent, 65536, latent),
        ("lstm x2 (T=1)", s_lstm, 2 * (latent * 4 * latent * 2) * 2,
         latent, 4 * latent),
        ("binarize", s_bin, 0, None, None),
    ]

    def timed_scalar(fn, x):
        f = jax.jit(lambda a: jnp.sum(fn(a), dtype=jnp.float32))
        for _ in range(8):
            float(np.asarray(f(x)))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(x)
        float(np.asarray(out))
        return (time.perf_counter() - t0) / reps

    x = u8
    total_ms = 0.0
    rows = []
    for name, fn, flops, k_dim, n_dim in stages:
        t_with = timed_scalar(fn, x)
        out = jax.jit(fn)(x)
        t_sum = timed_scalar(lambda a: a, out)
        t = max(t_with - t_sum, 1e-9)
        total_ms += t * 1e3
        row = {"stage": name, "ms": round(t * 1e3, 3)}
        if flops:
            tf = flops * batch / t / 1e12
            row["tflops"] = round(tf, 1)
            row["pct_peak"] = round(tf / 197.0 * 100, 1)
            if k_dim:
                row["mxu_tiling_ceiling_pct"] = round(
                    mxu_ceiling(k_dim, n_dim) * 100, 1)
        rows.append(row)
        x = out

    full = timed_scalar(
        lambda f: model.apply(
            {"params": params}, to_float01(f, jnp.float32)[:, None], 0.2,
            True, 0.1, method=Seq2SeqBinaryVAE.encode, deterministic=False,
            bc_rng=key).astype(jnp.uint8), u8)
    for r in rows:
        print(json.dumps({"bench": "encode_breakdown", **r,
                          "pct_of_path": round(r["ms"] / total_ms * 100, 1)}))
    print(json.dumps({"bench": "encode_breakdown", "stage": "SUM",
                      "ms": round(total_ms, 3),
                      "full_path_ms": round(full * 1e3, 3),
                      "batch": batch,
                      "full_fps": round(batch / full, 0)}))


def _xla_flops(compiled) -> float:
    """XLA's own FLOP count for a compiled executable (0 if unavailable)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _mk_trainer(batch=32, remat=False, ctxfree=False, stage=True,
                contrast_on="p", n_frames=480):
    """Flagship-geometry trainer on synthetic chinchess-shaped data."""
    from svtpu.config import TrainConfig, VideoMeta, rbvae_variant
    from svtpu.data.segments import split_segments
    from svtpu.training.trainer import Trainer

    class Store:
        def __init__(self):
            r = np.random.default_rng(0)
            self.array = r.integers(0, 255, (n_frames, 256, 256, 3),
                                    dtype=np.uint8)
            self._row = {i: i for i in range(n_frames)}

        @property
        def item_shape(self):
            return self.array.shape[1:]

        def rows(self, idx):
            return np.asarray(idx)

        def gather(self, idx):
            return self.array[np.asarray(idx)]

    meta = VideoMeta("b", flags=(74, 206, 282, 389), last_frame=n_frames - 1,
                     grey_out=10)
    splits = split_segments(meta.state_segments())
    mcfg = rbvae_variant("contrastive", latent_dim=50,
                         compute_dtype="bfloat16", remat=remat)
    tcfg = TrainConfig(batch_size=batch, contrast_on=contrast_on,
                       contextfree_contrast=ctxfree, margin=3.5,
                       noise_ratio=0.3, beta_kl=0.2, alpha=4.0,
                       stage_frames=stage)
    return Trainer(mcfg, tcfg, Store(), splits, meta.flags)


def _step_time(tr, reps=4, trials=5, warmup=8):
    """(median step seconds, frames/step, XLA flops/step) for one config."""
    state = tr.init_state()
    step = tr._make_train_step()
    staged = tr._bank is not None
    batches = (tr.train_batcher.epoch_indices(0) if staged
               else tr.train_batcher.epoch(0))
    b = jax.device_put(jnp.asarray(next(iter(batches))), tr._bsh)
    key = jax.random.key(0)
    # AOT-compile once and EXECUTE the compiled object (calling the jit
    # wrapper after lower().compile() would compile a second time through
    # the relay's ~3 min/compile service).
    lowered = step.lower(state, b, key, tr._temp_floor, tr._bank)
    compiled = lowered.compile()
    flops = _xla_flops(compiled)
    for _ in range(warmup):
        state, m = compiled(state, b, key, tr._temp_floor, tr._bank)
    float(m["total_loss"])
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            state, m = compiled(state, b, key, tr._temp_floor, tr._bank)
        float(m["total_loss"])
        ts.append((time.perf_counter() - t0) / reps)
    if staged:
        frames = int(np.prod(np.asarray(b).shape[:3]))
    else:
        frames = int(np.prod(b.shape[:3]))
    return float(np.median(ts)), frames, flops


def bench_train_path():
    """The round-2 encode treatment applied to the TRAIN path (VERDICT r2
    item 5): FLOP-counted MFU for the fused pair step (flagship objective),
    the contextfree_contrast extra-encode cost, the remat A/B, and staged
    HBM bank vs host-gather epoch time — all measured, flagship geometry
    (contrastive 256², latent 50, bf16, batch 32 pairs x 5 states)."""
    PEAK = 197e12   # v5e bf16

    results = {}
    for tag, kw in (("flagship (ctxfree)", dict(ctxfree=True)),
                    ("plain contrast", dict(ctxfree=False)),
                    ("plain + remat", dict(ctxfree=False, remat=True))):
        tr = _mk_trainer(**kw)
        dt, frames, flops = _step_time(tr)
        row = {"bench": "train_path", "config": tag,
               "batch_frames": frames,
               "step_ms": round(dt * 1e3, 2),
               "frames_per_sec": round(frames / dt, 1)}
        if flops:
            row["xla_gflops_per_step"] = round(flops / 1e9, 1)
            row["tflops"] = round(flops / dt / 1e12, 1)
            row["mfu_pct"] = round(flops / dt / PEAK * 100, 1)
        results[tag] = row
        print(json.dumps(row), flush=True)

    # remat's actual payoff: max per-chip batch. Probe growing batches.
    for remat in (False, True):
        best = None
        for batch in (64, 128, 256):
            try:
                tr = _mk_trainer(batch=batch, ctxfree=False, remat=remat)
                dt, frames, _ = _step_time(tr, reps=2, trials=3)
                best = {"batch_pairs": batch, "batch_frames": frames,
                        "step_ms": round(dt * 1e3, 2),
                        "frames_per_sec": round(frames / dt, 1)}
                print(json.dumps({"bench": "train_path_maxbatch",
                                  "remat": remat, **best}), flush=True)
            except Exception as e:  # OOM etc.
                print(json.dumps({"bench": "train_path_maxbatch",
                                  "remat": remat, "batch_pairs": batch,
                                  "error": str(e)[:200]}), flush=True)
                break


def bench_staged_vs_host(epochs=3):
    """Staged HBM frame bank vs per-step host gather+transfer: full train
    epoch wall time (train batches only; same batcher, same seed) —
    replaces the previously uncited '5-6x' claim with a measured number."""
    from svtpu.data.prefetch import prefetch_to_device

    out = {}
    for tag, stage in (("staged_bank", True), ("host_gather", False)):
        tr = _mk_trainer(ctxfree=True, stage=stage)
        state = tr.init_state()
        step = tr._make_train_step()
        key = jax.random.key(0)
        staged = tr._bank is not None
        assert staged == stage

        def one_epoch(epoch):
            nonlocal state
            batches = (tr.train_batcher.epoch_indices(epoch) if staged
                       else tr.train_batcher.epoch(epoch))
            m = None
            for b in prefetch_to_device(batches, tr._bsh):
                state, m = step(state, b, key, tr._temp_floor, tr._bank)
            float(m["total_loss"])

        one_epoch(0)   # compile + warm
        one_epoch(1)
        t0 = time.perf_counter()
        for e in range(2, 2 + epochs):
            one_epoch(e)
        dt = (time.perf_counter() - t0) / epochs
        out[tag] = dt
        print(json.dumps({"bench": "staged_vs_host", "path": tag,
                          "epoch_sec": round(dt, 3)}), flush=True)
    print(json.dumps({"bench": "staged_vs_host", "staged_speedup":
                      round(out["host_gather"] / out["staged_bank"], 2)}),
          flush=True)


def bench_val_cadence(epochs=6):
    """Full train-LOOP wall-clock per epoch vs the val_every probe
    cadence, flagship geometry. The measured per-epoch cost on small
    datasets is dominated by the validation block (val losses +
    consistency/separation probes), not the train updates (RESULTS.md
    "Training path"); ``val_every=N`` skips the block on non-probe
    epochs, so this bench puts a number on the lever the reference
    cannot express (it validates every epoch unconditionally,
    ``contrastive_RBVAE_train.py:640-676``)."""
    import dataclasses

    out = {}
    for ve in (1, 5):
        tr = _mk_trainer(ctxfree=True)
        tr.cfg = dataclasses.replace(tr.cfg, val_every=ve)
        tr.train(num_epochs=2)                  # compile + warm every path
        t0 = time.perf_counter()
        hist = tr.train(num_epochs=epochs)
        dt = (time.perf_counter() - t0) / epochs
        probed = sum(1 for v in hist["val_losses"] if v)
        out[ve] = dt
        print(json.dumps({"bench": "val_cadence", "val_every": ve,
                          "epoch_sec": round(dt, 3),
                          "probed_epochs": probed}), flush=True)
    print(json.dumps({"bench": "val_cadence",
                      "speedup_val_every_5": round(out[1] / out[5], 2)}),
          flush=True)


def bench_fused_epoch(epochs=6, batch=32):
    """Full train-LOOP wall-clock per epoch: scan-fused epochs (ONE device
    dispatch per epoch — the staged bank's same-shape index batches stack
    to [steps, B, 2, S] and ``lax.scan`` runs the whole epoch inside one
    jit call, one summed-metric readback) vs the per-step dispatch loop
    (one relay round-trip per optimizer step plus a per-step metric
    readback). Targets the residual per-epoch host-side overhead the
    val_cadence bench pinned (RESULTS.md "Training path"): through the
    axon relay, dispatch — not probe compute — dominates small-dataset
    epochs. The reference dispatches every step from Python by
    construction (``contrastive_RBVAE_train.py:521-560``)."""
    import dataclasses

    out = {}
    for tag, fused in (("per_step", False), ("fused", True)):
        tr = _mk_trainer(ctxfree=True, batch=batch)
        tr.cfg = dataclasses.replace(tr.cfg, fused_epoch=fused)
        # Warm with >=8 invocations of the OUTER program being timed: the
        # first 1-3 post-compile calls through the relay run ~50x slow
        # (CLAUDE.md), and for the fused arm one epoch = ONE program call,
        # so 2 warm epochs would leave residual slow calls inside the
        # timed window (the per-step arm gets many warm step calls either
        # way — warming both arms 8 epochs keeps the comparison symmetric).
        tr.train(num_epochs=8)                  # compile + warm every path
        t0 = time.perf_counter()
        tr.train(num_epochs=epochs)
        dt = (time.perf_counter() - t0) / epochs
        out[tag] = dt
        print(json.dumps({"bench": "fused_epoch", "batch": batch,
                          "path": tag,
                          "epoch_sec": round(dt, 3)}), flush=True)
    print(json.dumps({"bench": "fused_epoch", "batch": batch,
                      "fused_speedup":
                      round(out["per_step"] / out["fused"], 2)}),
          flush=True)


def bench_sd_encoder_breakdown(batch=8, reps=4):
    """SD AutoencoderKL encoder at 1280x704: FLOP-counted MFU for the full
    path + per-stage (conv_in / levels / mid attn / out) timing with the
    readback-cancelling protocol (VERDICT r2 item 8)."""
    from svtpu.config import PerceptualConfig
    from svtpu.models.autoencoder_kl import (AttnBlock, AutoencoderKL,
                                             Downsample, GroupNormSiLU,
                                             ResnetBlock, _conv)

    PEAK = 197e12
    cfg = PerceptualConfig()
    model = AutoencoderKL(cfg)
    x0 = jnp.zeros((1, 704, 1280, 3), jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x0)
    enc = params["params"]["encoder"]
    dtype = jnp.dtype(cfg.compute_dtype)
    rng = np.random.default_rng(0)
    x_in = jnp.asarray(rng.normal(size=(batch, 704, 1280, 3)), jnp.float32)

    # --- full path: time + XLA FLOPs
    @jax.jit
    def full(p, x):
        return model.apply(p, x, method=AutoencoderKL.encode)

    lowered = full.lower(params, x_in)
    compiled = lowered.compile()
    flops = _xla_flops(compiled)

    def timed_scalar(fn, *args):
        f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
        for _ in range(8):
            float(np.asarray(f(*args)))
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f(*args)
        float(np.asarray(o))
        return (time.perf_counter() - t0) / reps

    t_full = timed_scalar(lambda x: model.apply(params, x,
                                                method=AutoencoderKL.encode),
                          x_in)
    row = {"bench": "sd_encoder_mfu", "batch": batch,
           "ms_per_frame": round(t_full / batch * 1e3, 2),
           "frames_per_sec": round(batch / t_full, 2)}
    if flops:
        row["xla_gflops_per_frame"] = round(flops / batch / 1e9, 1)
        row["tflops"] = round(flops / t_full / 1e12, 1)
        row["mfu_pct"] = round(flops / t_full / PEAK * 100, 1)
    print(json.dumps(row), flush=True)

    # --- per-stage: rebuild the encoder stage sequence with bound params
    ch = cfg.ch

    def conv_flops(h, w, cin, cout, k=3):
        return 2.0 * h * w * cout * k * k * cin

    def res_flops(h, w, cin, cout):
        f = conv_flops(h, w, cin, cout) + conv_flops(h, w, cout, cout)
        if cin != cout:
            f += conv_flops(h, w, cin, cout, k=1)
        return f

    stages = []

    def add_res(name, cout):
        mod = ResnetBlock(cout, dtype=dtype, name=None)
        p = enc[name]
        stages.append((name,
                       lambda x, mod=mod, p=p: mod.apply({"params": p}, x),
                       lambda h, w, cin, cout=cout: res_flops(h, w, cin,
                                                              cout),
                       cout))

    stages.append(("conv_in",
                   lambda x: _conv(ch, dtype=dtype).apply(
                       {"params": enc["conv_in"]}, x.astype(dtype)),
                   lambda h, w, cin: conv_flops(h, w, cin, ch), ch))
    for i, mult in enumerate(cfg.ch_mult):
        for b in range(cfg.num_res_blocks):
            add_res(f"down_{i}_block_{b}", ch * mult)
        if i != len(cfg.ch_mult) - 1:
            cout = ch * mult
            p = enc[f"down_{i}_downsample"]
            stages.append((f"down_{i}_downsample",
                           lambda x, p=p: Downsample(dtype=dtype).apply(
                               {"params": p}, x),
                           lambda h, w, cin, cout=cout: conv_flops(
                               h // 2, w // 2, cin, cout), cout))
    add_res("mid_block_1", ch * cfg.ch_mult[-1])
    C = ch * cfg.ch_mult[-1]
    p_attn = enc["mid_attn_1"]
    stages.append(("mid_attn_1",
                   lambda x: AttnBlock(dtype=dtype).apply(
                       {"params": p_attn}, x),
                   lambda h, w, cin: (4 * conv_flops(h, w, cin, cin, k=1)
                                      + 2 * 2.0 * (h * w) ** 2 * cin), C))
    add_res("mid_block_2", C)
    p_no, p_co = enc["norm_out"], enc["conv_out"]
    stages.append(("norm_out+conv_out+quant",
                   lambda x: _conv(2 * cfg.embed_dim, 1, 1, 0,
                                   dtype=dtype).apply(
                       {"params": params["params"]["quant_conv"]},
                       _conv(2 * cfg.z_channels, dtype=dtype).apply(
                           {"params": p_co},
                           GroupNormSiLU(dtype=dtype).apply(
                               {"params": p_no}, x))),
                   lambda h, w, cin: (conv_flops(h, w, cin,
                                                 2 * cfg.z_channels)
                                      + conv_flops(h, w, 2 * cfg.z_channels,
                                                   2 * cfg.embed_dim, k=1)),
                   2 * cfg.embed_dim))

    # Per-stage times by PREFIX differencing: time jit(stage_0..k -> scalar)
    # for each k and attribute t_k - t_{k-1} to stage k. One remote compile
    # per stage (the naive 3-compiles-per-stage protocol costs hours at the
    # relay's ~3 min/compile service latency); the final scalar sum makes
    # every prefix readback-cancelling, and the differencing cancels the
    # sum-reduction overhead up to the (small) output-size delta. The SUM
    # row vs full_path_ms quantifies the residual + fusion error.
    def prefix(k):
        def f(x):
            for _, fn, _, _ in stages[:k + 1]:
                x = fn(x)
            return jnp.sum(x.astype(jnp.float32))
        return f

    shapes, x = [], x_in
    for name, fn, fl, cout in stages:
        shapes.append(tuple(x.shape))
        x = jax.eval_shape(fn, x)
    rows, total, t_prev = [], 0.0, 0.0
    for k, (name, fn, fl, cout) in enumerate(stages):
        t_k = timed_scalar(prefix(k), x_in)
        t = max(t_k - t_prev, 1e-9)
        t_prev = t_k
        _, h, w, cin = shapes[k]
        f = fl(h, w, cin) * batch
        rows.append({"stage": name, "ms": round(t * 1e3, 2),
                     "tflops": round(f / t / 1e12, 1),
                     "pct_peak": round(f / t / PEAK * 100, 1)})
        total += t
    for r in rows:
        r["pct_of_path"] = round(r["ms"] / (total * 1e3) * 100, 1)
        print(json.dumps({"bench": "sd_encoder_breakdown", **r}),
              flush=True)
    print(json.dumps({"bench": "sd_encoder_breakdown", "stage": "SUM",
                      "ms": round(total * 1e3, 2),
                      "full_path_ms": round(t_full * 1e3, 2)}), flush=True)


def bench_data_plane(tmpdir="/tmp/svtpu_bench_frames"):
    import os
    from pathlib import Path

    from PIL import Image

    from svtpu.data import native

    Path(tmpdir).mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(128):
        p = Path(tmpdir) / f"{i:010d}.jpg"
        if not p.exists():
            yy, xx = np.mgrid[0:432, 0:768]
            img = np.stack([(yy + i) % 256, xx % 256, (yy + xx) % 256],
                           -1).astype(np.uint8)
            Image.fromarray(img).save(p, quality=92)
        paths.append(p)

    t0 = time.perf_counter()
    native.decode_jpeg_batch(paths, (256, 256))
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = np.stack([np.asarray(Image.open(p).convert("RGB")
                             .resize((256, 256), Image.BILINEAR))
                  for p in paths])
    t_pil = time.perf_counter() - t0
    print(json.dumps({"bench": "jpeg_decode_128",
                      "native_fps": round(128 / t_native, 0),
                      "pil_fps": round(128 / t_pil, 0),
                      "speedup": round(t_pil / t_native, 2)}))


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "fused_epoch" and len(sys.argv) > 2:
        bench_fused_epoch(batch=int(sys.argv[2]))
        sys.exit(0)
    benches = {
        "rbvae_encode": bench_rbvae_encode,
        "sampler_ab": bench_sampler_ab,
        "train_step": bench_rbvae_train_step,
        "sd_encoder": bench_sd_encoder,
        "attention": bench_flash_attention,
        "attention_bwd": bench_attention_backward,
        "breakdown": bench_encode_breakdown,
        "train_path": bench_train_path,
        "staged_vs_host": bench_staged_vs_host,
        "val_cadence": bench_val_cadence,
        "fused_epoch": bench_fused_epoch,
        "sd_breakdown": bench_sd_encoder_breakdown,
        "conv0_ab": bench_conv0_ab,
        "convopt_train_ab": bench_convopt_train_ab,
        "trunk_ab": bench_trunk_ab,
        "int8_probe": bench_int8_probe,
        "int8_ab": bench_int8_ab,
        "data": bench_data_plane,
    }
    for name, fn in benches.items():
        if which in ("all", name):
            fn()
