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
        state, m = step(state, b, key)
    float(m["total_loss"])  # sync
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, b, key)
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
    for tag, flag in (("xla", False), ("pallas_trunk", True)):
        cfg = rbvae_variant("contrastive", latent_dim=50,
                            compute_dtype="bfloat16", pallas_trunk=flag)
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
        print(json.dumps({"bench": "trunk_ab", "path": tag,
                          "frames_per_sec": round(out[tag], 1)}))
    print(json.dumps({"bench": "trunk_ab", "pallas_over_xla":
                      round(out["pallas_trunk"] / out["xla"], 3)}))


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
            state, m = step(state, b, key)
        float(m["total_loss"])
        trials = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(4):
                state, m = step(state, b, key)
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
    benches = {
        "rbvae_encode": bench_rbvae_encode,
        "sampler_ab": bench_sampler_ab,
        "train_step": bench_rbvae_train_step,
        "sd_encoder": bench_sd_encoder,
        "attention": bench_flash_attention,
        "attention_bwd": bench_attention_backward,
        "breakdown": bench_encode_breakdown,
        "conv0_ab": bench_conv0_ab,
        "convopt_train_ab": bench_convopt_train_ab,
        "trunk_ab": bench_trunk_ab,
        "data": bench_data_plane,
    }
    for name, fn in benches.items():
        if which in ("all", name):
            fn()
