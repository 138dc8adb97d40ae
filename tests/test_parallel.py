"""Mesh/sharding tests on the 8-device virtual CPU mesh: pure data
parallelism, data+tensor parallelism, and the partition-rule machinery."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from svtpu.config import TrainConfig, VideoMeta, rbvae_variant
from svtpu.data.segments import split_segments
from svtpu.parallel.mesh import batch_sharding, make_mesh, pad_to_multiple
from svtpu.parallel.sharding import (RBVAE_TP_RULES, params_shardings,
                                     shard_params)
from svtpu.training.trainer import Trainer


class ArrayStore:
    def __init__(self, n=48, hwc=(32, 32, 3)):
        rng = np.random.default_rng(0)
        self.array = rng.integers(0, 255, (n,) + hwc, dtype=np.uint8)

    @property
    def item_shape(self):
        return self.array.shape[1:]

    def gather(self, idx):
        return self.array[np.asarray(idx)]

    def rows(self, idx):
        # Frame index == bank row (contiguous synthetic store); having
        # ``rows`` alongside ``array`` makes the store HBM-stageable.
        return np.asarray(idx)


def _trainer(mesh, batch_size=None):
    meta = VideoMeta("p", flags=(16, 32), last_frame=47, grey_out=0)
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    mcfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))
    if batch_size is None:
        batch_size = 2 * mesh.devices.shape[0]
    tcfg = TrainConfig(batch_size=batch_size, objective="contrastive")
    return Trainer(mcfg, tcfg, ArrayStore(), splits, meta.flags, mesh=mesh)


def test_make_mesh_shapes():
    m = make_mesh((-1,), ("data",))
    assert m.devices.size == len(jax.devices())
    m2 = make_mesh((4, 2), ("data", "model"))
    assert m2.devices.shape == (4, 2)
    m3 = make_mesh((-1, 2), ("data", "model"))
    assert m3.devices.shape == (len(jax.devices()) // 2, 2)


def test_pad_to_multiple():
    x = np.arange(10).reshape(5, 2)
    p, n = pad_to_multiple(x, 4)
    assert p.shape == (8, 2) and n == 5
    np.testing.assert_array_equal(p[5:], np.tile(x[:1], (3, 1)))


def test_dp_train_step_runs_on_8_devices():
    mesh = make_mesh((8,), ("data",))
    tr = _trainer(mesh)
    state = tr.init_state()
    step = tr._make_train_step()
    batch = next(iter(tr.train_batcher.epoch(0)))
    b = jax.device_put(jnp.asarray(batch), tr._bsh)
    state, metrics = step(state, b, jax.random.key(0), tr._temp_floor)
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state.step) == 1


def test_tp_shards_big_dense_and_trains():
    mesh = make_mesh((4, 2), ("data", "model"))
    tr = _trainer(mesh)
    state = tr.init_state()
    # fc kernel [1024, 8] should be sharded over "model" on dim 0.
    fc = state.params["params"]["encoder_cnn"]["fc"]["kernel"]
    assert fc.sharding.spec == P("model", None)
    # LSTM weights stay replicated.
    lstm = state.params["params"]["encoder_rnn"]["w_hh_0"]
    assert lstm.sharding.spec in (P(), P(None, None))

    step = tr._make_train_step()
    batch = next(iter(tr.train_batcher.epoch(0)))
    b = jax.device_put(jnp.asarray(batch), tr._bsh)
    state, metrics = step(state, b, jax.random.key(0), tr._temp_floor)
    assert np.isfinite(float(metrics["total_loss"]))


def test_fused_epoch_trains_on_dp_tp_mesh():
    """The scan-fused epoch program (one dispatch per epoch) compiles and
    executes over the 2-D data x model mesh: stacked [steps, B, 2, S]
    index batches shard their BATCH axis over "data" while the TP-sharded
    projections train through the scan."""
    mesh = make_mesh((4, 2), ("data", "model"))
    tr = _trainer(mesh)
    assert tr._bank is not None          # rows+array => staged HBM bank
    state = tr.init_state()
    fc = state.params["params"]["encoder_cnn"]["fc"]["kernel"]
    assert fc.sharding.spec == P("model", None)
    epoch = tr._make_train_epoch()
    idx = np.stack(list(tr.train_batcher.epoch_indices(0)))
    ib = jax.device_put(jnp.asarray(idx), tr._bsh_epoch)
    state, vec = epoch(state, ib, jax.random.key(0), tr._temp_floor,
                       tr._bank)
    assert int(state.step) == idx.shape[0]
    assert np.all(np.isfinite(np.asarray(vec)))
    assert "total_loss" in tr._epoch_metric_names


def test_dp_matches_single_device_loss():
    """Same data + params → same loss on a 1-dev and an 8-dev mesh."""
    mesh1 = make_mesh((1,), ("data",), devices=jax.devices()[:1])
    mesh8 = make_mesh((8,), ("data",))
    t1, t8 = _trainer(mesh1, batch_size=8), _trainer(mesh8, batch_size=8)
    s1 = t1.init_state()
    batch = next(iter(t1.train_batcher.epoch(0)))
    step1 = t1._make_train_step()
    _, m1 = step1(s1, jax.device_put(jnp.asarray(batch), t1._bsh),
                  jax.random.key(0), t1._temp_floor)

    s8 = t8.init_state()
    step8 = t8._make_train_step()
    _, m8 = step8(s8, jax.device_put(jnp.asarray(batch),
                                     batch_sharding(mesh8)),
                  jax.random.key(0), t8._temp_floor)
    assert abs(float(m1["total_loss"]) - float(m8["total_loss"])) < 1e-3


def test_sharding_rules_fallback_when_indivisible():
    mesh = make_mesh((1, 8), ("data", "model"))
    params = {"encoder_cnn": {"fc": {"kernel": jnp.zeros((12, 5))}}}
    sh = params_shardings(params, mesh, RBVAE_TP_RULES)
    # 12 % 8 != 0 → replicate instead of erroring.
    assert sh["encoder_cnn"]["fc"]["kernel"].spec == P()


def test_batch_roundup_scales_lr_linearly():
    """Implicit global-batch growth (round-up to the data axis) rescales
    the LR under the linear policy (reference DDP convention,
    ``main.py:686-690``, applied to the quantity that changes here) and
    leaves it untouched under lr_scaling="none"."""
    mesh8 = make_mesh((8,), ("data",))
    meta = VideoMeta("p", flags=(16, 32), last_frame=47, grey_out=0)
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    mcfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))

    tcfg = TrainConfig(batch_size=6, learning_rate=1e-3)
    tr = Trainer(mcfg, tcfg, ArrayStore(), splits, meta.flags, mesh=mesh8)
    assert tr.cfg.batch_size == 8
    np.testing.assert_allclose(tr.cfg.learning_rate, 1e-3 * 8 / 6)

    tcfg = TrainConfig(batch_size=6, learning_rate=1e-3, lr_scaling="none")
    tr = Trainer(mcfg, tcfg, ArrayStore(), splits, meta.flags, mesh=mesh8)
    assert tr.cfg.batch_size == 8
    assert tr.cfg.learning_rate == 1e-3

    # No round-up → no rescale either way.
    tcfg = TrainConfig(batch_size=16, learning_rate=1e-3)
    tr = Trainer(mcfg, tcfg, ArrayStore(), splits, meta.flags, mesh=mesh8)
    assert tr.cfg.learning_rate == 1e-3


def test_two_process_distributed():
    """REAL multi-process path: two CPU processes, explicit coordinator,
    jax.distributed.initialize via svtpu initialize(), a 2-process global
    mesh, local_batch_to_global assembly, and one cross-process psum
    (reference role: the dormant DDP harness, ``main.py:521``)."""
    import socket
    import subprocess
    import sys
    from pathlib import Path

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    worker = str(Path(__file__).parent / "_dist_worker.py")

    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               PYTHONPATH=str(Path(__file__).parents[1]))
    procs = [subprocess.Popen(
                 [sys.executable, worker, addr, "2", str(pid)],
                 env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                 text=True)
             for pid in range(2)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK {pid} total=24.0" in out, out
