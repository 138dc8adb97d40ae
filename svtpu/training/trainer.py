"""Jitted RBVAE trainers for all four reference objectives.

Re-designs the reference trainer classes (SURVEY.md §2.5:
``ContrastiveRBVAETrainer`` in ``contrastive_RBVAE_train.py:343-690`` /
``percep_RBVAE_train.py:375-719`` / ``triplet_RBVAE_train.py:380-624`` and
the bare simple loop ``simple_RBVAE_train.py:143-188``) as one engine:

  * One jit-compiled train step per config — both pair members fused into a
    single forward (the reference runs them sequentially), uint8→float
    normalization on device, gradients all-reduced by XLA over the ``data``
    mesh axis.
  * The temperature schedule is a pure traced function, so no recompiles.
  * State consistency is a *batched* jitted encode (the reference encodes one
    frame per step — its biggest eval bottleneck, ``percep_RBVAE_train.py:439``).
  * Fixes the reference's ``validate()`` NameError (undefined
    ``consistency_score``, ``contrastive_RBVAE_train.py:623``) by actually
    computing the metric, as its percep twin does.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from flax import struct

import optax

from svtpu.config import RBVAEConfig, TrainConfig
from svtpu.data.datasets import PairBatcher
from svtpu.data.segments import SplitIndices, assign_label
from svtpu.models.rbvae import Seq2SeqBinaryVAE
from svtpu.ops import losses
from svtpu.ops.image import to_float01
from svtpu.parallel.mesh import batch_sharding, make_mesh, replicated
from svtpu.training.checkpoints import BestCheckpointer
from svtpu.training.metrics import MetricsWriter
from svtpu.training.schedules import temperature_schedule


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: dict
    opt_state: optax.OptState


def _staging_nbytes(store) -> int:
    """Cheap HBM-bank size probe for the staging gate.

    Never touches ``MultiStore.array`` (which would eagerly concatenate
    every sub-store into a full host copy even if staging is then
    declined) — sums the already-materialized sub-store arrays instead.
    Returns 0 when the store cannot stage (no array/rows interface).
    """
    subs = getattr(store, "stores", None)
    if subs is not None:
        if not all(hasattr(s, "array") and hasattr(s, "rows")
                   for s in subs):
            return 0
        return sum(int(s.array.nbytes) for s in subs)
    if hasattr(store, "array") and hasattr(store, "rows"):
        return int(getattr(store.array, "nbytes", 0))
    return 0


def _prep(batch: jax.Array) -> jax.Array:
    """uint8 frames → float [0,1]; float embeddings pass through."""
    if batch.dtype == jnp.uint8:
        return to_float01(batch)
    return batch.astype(jnp.float32)


def pair_objective(model: Seq2SeqBinaryVAE, cfg: TrainConfig,
                   params, batch, temperature, hard: bool, key: jax.Array,
                   deterministic: bool):
    """Shared loss for contrastive and triplet objectives.

    ``batch``: ``[B, 2, S, H, W, C]`` — member 0/1 of the pair per state.
    Both members run through the model as one ``[2B, S, ...]`` batch.
    """
    x = _prep(batch)
    B, two, S = x.shape[:3]
    extra_metrics = {}
    xm = jnp.swapaxes(x, 0, 1).reshape((2 * B, S) + x.shape[3:])
    k_drop, k_bin = jax.random.split(key)
    out = model.apply(
        params, xm, temperature, hard, cfg.noise_ratio,
        deterministic=deterministic,
        rngs=(None if deterministic
              else {"dropout": k_drop, "binary": k_bin}),
        bc_rng=k_bin)
    recon = losses.recon_mse(out.x_recon, xm)
    # The reference feeds the *binarized* z_seq to the Bernoulli KL
    # (``contrastive_RBVAE_train.py:500``) — preserved.
    kl = losses.kl_binary_concrete(out.z_seq, p=cfg.bernoulli_p)
    rep = {"h": out.h_seq,
           "z": out.z_seq,
           # Deterministic bit probabilities at unit temperature: couples
           # the margin to the binarization boundary like "z" but keeps a
           # live gradient after the sampling temperature anneals low
           # (sigmoid((h+noise)/T) saturates as T→final; sigmoid(h) does
           # not). Only meaningful for post_rnn variants, where h_seq is
           # the logit feeding binarize.
           "p": jax.nn.sigmoid(out.h_seq)}[cfg.contrast_on]
    h0, h1 = rep[:B], rep[B:]

    if cfg.objective == "contrastive":
        sim = losses.contrastive(h0, h1, 0.0, margin=cfg.margin)
        # Adjacent-state dissimilarity on member 0
        # (``contrastive_RBVAE_train.py:508-513``): per-state mean over the
        # batch, averaged over the S-1 adjacent pairs == one global mean.
        dis = losses.contrastive(h0[:, :-1], h0[:, 1:], 1.0,
                                 margin=cfg.margin)
        aux = sim + dis
        if cfg.contextfree_contrast:
            # The eval protocol encodes each frame as a T=1 sequence, but
            # the losses above act on in-context (T=S) codes — the two
            # representations drift apart late in training (in-context
            # separation holds while single-frame codes merge). Apply the
            # same margins to a context-free encode of the identical
            # frames so the hinge constrains what the metric measures.
            xf = xm.reshape((2 * B * S, 1) + xm.shape[2:])
            outf = model.apply(
                params, xf, temperature, hard, cfg.noise_ratio,
                deterministic=deterministic,
                rngs=(None if deterministic
                      else {"dropout": jax.random.fold_in(k_drop, 1),
                            "binary": jax.random.fold_in(k_bin, 1)}),
                bc_rng=jax.random.fold_in(k_bin, 1))
            repf = {"h": outf.h_seq, "z": outf.z_seq,
                    "p": jax.nn.sigmoid(outf.h_seq)}[cfg.contrast_on]
            repf = repf.reshape(2, B, S, repf.shape[-1])
            f0, f1 = repf[0], repf[1]
            aux = 0.5 * aux + 0.5 * (
                losses.contrastive(f0, f1, 0.0, margin=cfg.margin)
                + losses.contrastive(f0[:, :-1], f0[:, 1:], 1.0,
                                     margin=cfg.margin))
        aux_name = "contrast_loss"
    elif cfg.objective == "triplet":
        # anchor = state t (member 0), positive = state t (member 1),
        # negative = state t+1 (member 0); swap=True
        # (``triplet_RBVAE_train.py:461-468``). The reference averages the
        # per-state means; flattening (B, S-1) into the batch gives the same
        # value since every state has batch-B triplets.
        if cfg.triplet_distance == "js":
            # Bernoulli-JS triplet on the relaxed z probabilities
            # (the reference's defined-but-unused variant, fixed).
            z0, z1 = out.z_seq[:B], out.z_seq[B:]
            a = z0[:, :-1].reshape(-1, z0.shape[-1])
            p = z1[:, :-1].reshape(-1, z0.shape[-1])
            n = z0[:, 1:].reshape(-1, z0.shape[-1])
            aux = losses.triplet_js(a, p, n, margin=cfg.margin)
        else:
            a = h0[:, :-1].reshape(-1, h0.shape[-1])
            p = h1[:, :-1].reshape(-1, h0.shape[-1])
            n = h0[:, 1:].reshape(-1, h0.shape[-1])
            aux = losses.triplet_margin(a, p, n, margin=cfg.margin,
                                        swap=True)
        if cfg.triplet_pull:
            # The constructive repair of the measured triplet-topology
            # collapse (RESULTS.md "triplet_on='p'"): an explicit
            # anchor<->positive pull — the contrastive similar-pair term
            # (label 0: plain squared distance) on the unit-temperature
            # bit probabilities — rewards within-state code IDENTITY,
            # the one force the reference's margins
            # (``triplet_RBVAE_train.py:461-468``) never supply.
            pp0 = jax.nn.sigmoid(out.h_seq[:B])
            pp1 = jax.nn.sigmoid(out.h_seq[B:])
            pull = losses.contrastive(pp0, pp1, 0.0, margin=cfg.margin)
            aux = aux + cfg.triplet_pull * pull
            extra_metrics = {"pull_loss": pull}
        if cfg.triplet_push:
            # The mechanism-matched repair (round 5): the pull above is
            # inert at the collapsed fixed point (|h| ≈ 0 ⇒ p-space
            # distances ~1e-9 while det codes are hair-trigger unique —
            # measured, RESULTS.md "triplet repair"), because the
            # RELATIVE triplet margin is satisfiable at any logit scale.
            # The contrastive objective's scale-growing force is its
            # dissimilar hinge; wire exactly that, as an ABSOLUTE margin
            # on the triplet's own (anchor, negative) frames in p-space.
            pa = jax.nn.sigmoid(out.h_seq[:B])
            push = losses.contrastive(pa[:, :-1], pa[:, 1:], 1.0,
                                      margin=cfg.margin)
            if cfg.contextfree_contrast:
                # Round-5 push1 measurement: the in-context push grows
                # in-context separation (0 → 2.5 bits) but the PROBE
                # axis (T=1 encodes) stays collapsed — the same
                # in-context/context-free drift the flagship objective
                # closes with its ctx-free margin terms. Apply the push
                # (and, if enabled, the pull) to a T=1 encode of the
                # identical frames so the repair constrains what the
                # metric measures.
                xf = xm.reshape((2 * B * S, 1) + xm.shape[2:])
                outf = model.apply(
                    params, xf, temperature, hard, cfg.noise_ratio,
                    deterministic=deterministic,
                    rngs=(None if deterministic
                          else {"dropout": jax.random.fold_in(k_drop, 2),
                                "binary": jax.random.fold_in(k_bin, 2)}),
                    bc_rng=jax.random.fold_in(k_bin, 2))
                pf = jax.nn.sigmoid(
                    outf.h_seq.reshape(2, B, S, outf.h_seq.shape[-1]))
                push = 0.5 * push + 0.5 * losses.contrastive(
                    pf[0][:, :-1], pf[0][:, 1:], 1.0, margin=cfg.margin)
                if cfg.triplet_pull:
                    pullf = losses.contrastive(pf[0], pf[1], 0.0,
                                               margin=cfg.margin)
                    aux = aux + cfg.triplet_pull * pullf
                    extra_metrics = {**extra_metrics,
                                     "pullf_loss": pullf}
            aux = aux + cfg.triplet_push * push
            extra_metrics = {**extra_metrics, "push_loss": push}
        aux_name = "triplet_loss"
    else:
        raise ValueError(cfg.objective)

    total = recon + cfg.beta_kl * kl + cfg.alpha * aux
    if cfg.l1_logits:
        # L1 on the binarization logits (the reference defines but never
        # uses an L1 sparsity term, ``contrastive_RBVAE_train.py:28-30``;
        # svtpu wires it as the mechanism-rooted brake on the unbounded
        # |h| growth that drives the late-anneal gradient trap —
        # RESULTS.md "trap guard": |h| grew 16x under a pinned-ratio
        # temperature and the run still eroded). Sum over latent, mean
        # over the rest — the KL's reduction convention.
        l1 = cfg.l1_logits * jnp.abs(out.h_seq).sum(-1).mean()
        total = total + l1
    metrics = {"total_loss": total, "recon_loss": recon, "kl_loss": kl,
               aux_name: aux, **extra_metrics}
    if cfg.l1_logits:
        metrics["l1_loss"] = l1
    return total, metrics


def simple_objective(model, cfg: TrainConfig, params, batch, temperature,
                     hard, key, deterministic, mask=None):
    """Bare recon+KL loss on whole state segments
    (``simple_RBVAE_train.py:169-188``). ``batch``: ``[B, T, H, W, C]``;
    ``mask``: optional ``[B, T]`` validity (SegmentBatcher pads every
    segment to the longest one for static shapes — padded steps must not
    contribute, since the reference runs exact-length segments)."""
    x = _prep(batch)
    k_drop, k_bin = jax.random.split(key)
    out = model.apply(
        params, x, temperature, hard,
        deterministic=deterministic,
        rngs=None if deterministic else {"dropout": k_drop, "binary": k_bin},
        bc_rng=k_bin)
    if mask is None:
        recon = losses.recon_mse(out.x_recon, x)
        kl = losses.kl_binary_concrete(out.logits, p=cfg.bernoulli_p)
    else:
        m = mask.astype(jnp.float32)                         # [B, T]
        per_frame = jnp.mean((out.x_recon - x) ** 2,
                             axis=tuple(range(2, x.ndim)))   # [B, T]
        recon = jnp.sum(per_frame * m) / jnp.maximum(jnp.sum(m), 1.0)
        q = jnp.clip(jax.nn.sigmoid(out.logits), 1e-8, 1 - 1e-8)
        log_p = jnp.log(cfg.bernoulli_p)
        log_1mp = jnp.log1p(-cfg.bernoulli_p)
        kl_bt = jnp.sum(q * (jnp.log(q + 1e-8) - log_p)
                        + (1 - q) * (jnp.log(1 - q + 1e-8) - log_1mp),
                        axis=-1)                             # [B, T]
        kl = jnp.sum(kl_bt * m) / jnp.maximum(jnp.sum(m), 1.0)
    total = recon + cfg.beta_kl * kl
    return total, {"total_loss": total, "recon_loss": recon, "kl_loss": kl}


class Trainer:
    """Data-parallel RBVAE trainer.

    Args:
      model_cfg / train_cfg: typed configs.
      store: FrameStore or EmbeddingStore.
      splits: SplitIndices for the video.
      flags: transition-flag list (for consistency labels).
    """

    def __init__(self, model_cfg: RBVAEConfig, train_cfg: TrainConfig,
                 store, splits: SplitIndices, flags: Sequence[int],
                 mesh=None, seed: Optional[int] = None,
                 labels_by_index: Optional[dict] = None):
        self.mcfg = model_cfg
        self.cfg = train_cfg
        self.store = store
        self.splits = splits
        self.flags = list(flags)
        # Multi-video runs pass an explicit frame-id → state-id map
        # (svtpu.data.multi); single-video runs derive labels from flags.
        self.labels_by_index = labels_by_index
        self.seed = train_cfg.seed if seed is None else seed
        self.mesh = mesh if mesh is not None else make_mesh(
            train_cfg.mesh_shape, train_cfg.mesh_axes)
        # Batches shard over the data axis — round the batch size up to a
        # multiple so sweeps/configs never hit divisibility errors.
        ndata = int(self.mesh.devices.shape[0])
        if train_cfg.batch_size % ndata:
            new_bs = -(-train_cfg.batch_size // ndata) * ndata
            # Linear LR/batch scaling (TrainConfig.lr_scaling): when the
            # global batch grows to fit the data axis, scale lr with it —
            # the reference's dormant-DDP convention (``main.py:686-690``)
            # applied to the quantity that actually changed here.
            new_lr = (train_cfg.learning_rate * new_bs / train_cfg.batch_size
                      if train_cfg.lr_scaling == "linear"
                      else train_cfg.learning_rate)
            train_cfg = dataclasses.replace(
                train_cfg, batch_size=new_bs, learning_rate=new_lr)
            self.cfg = train_cfg
        self.model = Seq2SeqBinaryVAE(model_cfg)
        self.tx = optax.adam(train_cfg.learning_rate)
        self.writer = MetricsWriter(train_cfg.log_dir)

        self._rep = replicated(self.mesh)
        self._bsh = batch_sharding(self.mesh)
        # Stacked-epoch sharding: [steps, B, ...] index batches split the
        # BATCH (second) axis over "data"; the steps axis stays whole.
        self._bsh_epoch = NamedSharding(self.mesh, P(None, "data"))
        self._compiled_train = None
        self._compiled_epoch = None
        self._compiled_val_epoch = None
        self._epoch_metric_names = []
        self._val_metric_names = []
        # Effective temperature floor fed to the jitted step as a traced
        # scalar; the trap guard (TrainConfig.trap_guard_ratio) raises it.
        self._temp_floor = jnp.asarray(train_cfg.final_temperature,
                                       jnp.float32)
        self._h_probe = None
        self._compiled_val = None
        self._compiled_encode = {}

        if train_cfg.objective != "simple":
            self.train_batcher = PairBatcher(
                store, splits.train, train_cfg.batch_size, seed=self.seed)
            self.val_batcher = PairBatcher(
                store, splits.val, train_cfg.batch_size, seed=self.seed + 1,
                shuffle=False)

        # Device-resident frame bank: when the whole store fits comfortably
        # in HBM, upload it ONCE and feed the jitted steps row *indices* —
        # the per-step host→device transfer drops from the full frame batch
        # (e.g. 125 MB at batch 64x2x5 pairs) to KBs, and the gather runs
        # on-chip. Decisive through thin links (remote relays); on real
        # hosts it removes the PCIe stream entirely.
        self._bank = None
        if train_cfg.objective != "simple" and train_cfg.stage_frames:
            nbytes = _staging_nbytes(store)
            if nbytes > 0 and (train_cfg.stage_frames != "auto"
                               or nbytes <= 2 * 1024**3):
                self._bank = jax.device_put(jnp.asarray(store.array),
                                            self._rep)

    # ------------------------------------------------------------------ init

    def init_state(self, seed_offset: int = 0) -> TrainState:
        item = self.store.item_shape
        x0 = jnp.zeros((1, 2) + tuple(item), jnp.float32)
        params = self.model.init(
            {"params": jax.random.key(self.seed + seed_offset)}, x0, 1.0,
            False, deterministic=True)
        if "model" in self.mesh.axis_names:
            # Tensor-parallel placement of the big projections; optimizer
            # state inherits the same shardings through jit propagation.
            from svtpu.parallel.sharding import shard_params
            params = shard_params(params, self.mesh)
        else:
            params = jax.device_put(params, self._rep)
        opt_state = jax.jit(self.tx.init)(params["params"])
        step = jax.device_put(jnp.zeros((), jnp.int32), self._rep)
        return TrainState(step=step, params=params, opt_state=opt_state)

    # ----------------------------------------------------------- train step

    def _objective(self):
        if self.cfg.objective in ("contrastive", "triplet"):
            return pair_objective
        return simple_objective

    def _ctxfree_h_scale(self, params) -> float:
        """Mean context-free |h| on a val probe batch — the quantity whose
        ratio to the temperature marks the late-anneal gradient trap
        (RESULTS.md "7-seed replication": trigger temps 0.41–0.92 across
        runs, scaling with each run's logit scale)."""
        if self._h_probe is None:
            model = self.model

            @jax.jit
            def h_of(p, x):
                out = model.apply(p, x, 1.0, False, 0.0, deterministic=True)
                return jnp.abs(out.h_seq[:, 0]).mean()

            self._h_probe = h_of
        idx = np.asarray([i for s in self.splits.val for i in s][:64])
        if self._bank is not None:
            x = _prep(self._bank[jnp.asarray(self.store.rows(idx))])[:, None]
        else:
            x = _prep(jnp.asarray(self.store.gather(idx)))[:, None]
        return float(self._h_probe(params, x))

    def _train_step_body(self):
        """The (unjitted) train-step body shared by the per-step path and
        the scan-fused epoch path — one definition so the two modes cannot
        drift."""
        cfg, model, tx = self.cfg, self.model, self.tx
        obj = self._objective()

        def train_step(state: TrainState, batch, key, temp_floor, bank=None):
            if bank is not None:
                # Device-staged input: ``batch`` is row indices into the
                # HBM-resident frame bank; the gather happens on-chip so the
                # host→device transfer is KBs of indices instead of the
                # frames themselves.
                batch = bank[batch]
            step = state.step + 1
            # temp_floor is a traced scalar (not a static constant) so the
            # adaptive trap guard can raise it without a recompile.
            temp = jnp.maximum(temperature_schedule(
                step, cfg.init_temperature, cfg.final_temperature,
                cfg.anneal_rate, cfg.num_steps_to_update), temp_floor)
            key = jax.random.fold_in(key, step)

            def loss_fn(p):
                return obj(model, cfg, {"params": p}, batch, temp, False,
                           key, deterministic=False)

            grads, metrics = jax.grad(loss_fn, has_aux=True)(
                state.params["params"])
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params["params"])
            params = optax.apply_updates(state.params["params"], updates)
            metrics["temperature"] = temp
            return TrainState(step=step, params={"params": params},
                              opt_state=opt_state), metrics

        return train_step

    def _make_train_step(self):
        # Output shardings propagate from the (possibly tensor-parallel)
        # input state; donation reuses its buffers.
        return jax.jit(self._train_step_body(), donate_argnums=(0,))

    def _make_train_epoch(self):
        """One-dispatch epoch: ``lax.scan`` of the train step over the
        stacked ``[steps, B, 2, S]`` row-index batches of a staged bank.

        Returns ``(state, metric_vector)`` where the vector holds the
        per-epoch SUM of each step metric in ``sorted(metrics)`` order
        (one array → one host readback through the relay; the caller
        divides by the step count). The metric names are recorded at trace
        time in ``self._epoch_metric_names``. The reference dispatches
        every optimizer step from Python
        (``contrastive_RBVAE_train.py:521-560``); under XLA the whole
        epoch is one compiled program."""
        body = self._train_step_body()
        names = self._epoch_metric_names = []

        def train_epoch(state: TrainState, idx_batches, key, temp_floor,
                        bank):
            def step(st, b):
                st, metrics = body(st, b, key, temp_floor, bank)
                return st, metrics
            state, ms = jax.lax.scan(step, state, idx_batches)
            if not names:
                names.extend(sorted(ms))
            vec = jnp.stack([ms[k].sum() for k in sorted(ms)])
            return state, vec

        return jax.jit(train_epoch, donate_argnums=(0,))

    def _val_step_body(self):
        """The (unjitted) val-step body shared by the per-batch path and
        the fused one-dispatch validation — one definition so the two
        modes cannot drift."""
        cfg, model = self.cfg, self.model
        obj = self._objective()
        # Contrastive/percep validate with hard=True; triplet with hard=False
        # (``contrastive_RBVAE_train.py:577-583`` vs
        # ``triplet_RBVAE_train.py:525-530``).
        hard = cfg.objective == "contrastive"
        # Contrastive/percep normalize the val total by the coefficient sum
        # (``contrastive_RBVAE_train.py:562-565``); triplet does not.
        normalize = cfg.objective == "contrastive"

        def val_step(params, batch, key, bank=None):
            if bank is not None:
                batch = bank[batch]
            total, m = obj(model, cfg, params, batch,
                           cfg.final_temperature, hard, key,
                           deterministic=True)
            if normalize:
                coeff = 1.0 + cfg.beta_kl + cfg.alpha
                aux_key = ("contrast_loss" if cfg.objective == "contrastive"
                           else "triplet_loss")
                m = dict(m)
                m["total_loss"] = (m["recon_loss"] + cfg.beta_kl * m["kl_loss"]
                                   + cfg.alpha * m[aux_key]) / coeff
            return m

        return val_step

    def _make_val_step(self):
        return jax.jit(self._val_step_body())

    def _make_val_epoch(self):
        """One-dispatch validation: ``lax.map`` of the val step over the
        stacked ``[nv, B, 2, S]`` row-index batches of a staged bank.

        Returns one summed metric vector (names recorded at trace time in
        ``self._val_metric_names``; the caller divides by the batch
        count) — a single relay round-trip replaces one dispatch plus
        per-key ``float()`` readbacks per val batch. The val set is fixed
        across epochs, so the stacked indices upload ONCE per run."""
        body = self._val_step_body()
        names = self._val_metric_names = []

        def val_epoch(params, idx_batches, key, bank):
            ms = jax.lax.map(lambda b: body(params, b, key, bank),
                             idx_batches)
            if not names:
                names.extend(sorted(ms))
            return jnp.stack([ms[k].sum() for k in sorted(ms)])

        return jax.jit(val_epoch)

    # ------------------------------------------------------------- encoding

    def encode_frames(self, params, frames: np.ndarray, temperature: float,
                      hard: bool = True, noise: bool = True,
                      seed: int = 0, chunk: int = 128,
                      from_bank: bool = False) -> np.ndarray:
        """Batched single-frame encode → codes ``[N, latent]``.

        Each frame is a T=1 sequence, exactly like the reference's
        consistency path (``percep_RBVAE_train.py:459-462``) but batched
        ``chunk`` frames at a time instead of one by one.

        ``from_bank=True``: ``frames`` are row indices into the staged
        device bank; only the indices travel to the device.
        """
        model, cfg = self.model, self.cfg
        use_bank = from_bank and self._bank is not None

        if "enc" not in self._compiled_encode:
            # Metric encodes use the eval-protocol noise, which may differ
            # from the training noise (noise-hardened training: train at a
            # high noise_ratio, select checkpoints under the standard
            # protocol).
            enc_noise = (cfg.eval_noise_ratio
                         if cfg.eval_noise_ratio is not None
                         else cfg.noise_ratio)

            def enc_plain(params, x, key, temp, hard, noise):
                return model.apply(
                    params, x[:, None], temp, hard, enc_noise,
                    method=Seq2SeqBinaryVAE.encode,
                    deterministic=not noise, bc_rng=key if noise else None)
            # temperature is traced; hard/noise are static (they change the
            # computation graph).
            self._compiled_encode["enc"] = jax.jit(enc_plain,
                                                   static_argnums=(4, 5))

            def enc_rows(params, rows, bank, key, temp, hard, noise):
                return enc_plain(params, _prep(bank[rows]), key, temp,
                                 hard, noise)
            self._compiled_encode["enc_rows"] = jax.jit(
                enc_rows, static_argnums=(5, 6))
        enc = self._compiled_encode["enc_rows" if use_bank else "enc"]

        n = len(frames)
        out = []
        key = jax.random.key(seed)
        for i in range(0, n, chunk):
            part = frames[i:i + chunk]
            pad = chunk - len(part)
            if pad:
                part = np.concatenate([part, np.repeat(part[-1:], pad, 0)])
            x = jax.device_put(jnp.asarray(part), self._bsh)
            if use_bank:
                z = enc(params, x, self._bank, jax.random.fold_in(key, i),
                        jnp.float32(temperature), hard, noise)
            else:
                z = enc(params, _prep(x), jax.random.fold_in(key, i),
                        jnp.float32(temperature), hard, noise)
            out.append(np.asarray(z)[:, 0][:len(frames[i:i + chunk])])
        return np.concatenate(out) if out else np.zeros((0,))

    def _val_codes(self, params, val_idx, temperature, noise: bool,
                   seed: int) -> np.ndarray:
        """Codes for the validation frames, via the staged bank when
        available (indices-only transfer) else a host gather."""
        if self._bank is not None:
            rows = self.store.rows(np.asarray(val_idx)).astype(np.int32)
            return self.encode_frames(params, rows, temperature, hard=True,
                                      noise=noise, seed=seed,
                                      from_bank=True)
        frames = self.store.gather(np.asarray(val_idx))
        return self.encode_frames(params, frames, temperature, hard=True,
                                  noise=noise, seed=seed)

    def state_consistency(self, params, temperature: float,
                          noise: bool = True, seed: int = 0):
        """Weighted modal-code match over validation frames
        (``percep_RBVAE_train.py:439-497``)."""
        val_idx = [i for s in self.splits.val for i in s]
        if not val_idx:
            return 0.0, []
        codes = self._val_codes(params, val_idx, temperature, noise, seed)
        if self.labels_by_index is not None:
            labels = np.asarray([self.labels_by_index[i] for i in val_idx])
            num_states = int(max(self.labels_by_index.values())) + 1
        else:
            labels = np.asarray([assign_label(i, self.flags)
                                 for i in val_idx])
            num_states = len(self.flags) + 1
        return modal_consistency(codes, labels, num_states)

    def state_separation(self, params, temperature: float,
                         seed: int = 0):
        """``(separation, det_consistency, ham_vector)`` from one
        deterministic encode of the validation frames.

        Separation = ``sep_aggregate``-reduced adjacent-state Hamming
        distance of deterministic modal codes (svtpu addition: the
        reference's consistency metric only measures within-state
        agreement and is blind to all states collapsing onto one code).
        det_consistency = the same modal-match consistency but noise-off —
        its gap to the stochastic score measures how close the logits sit
        to the binarization boundary. ``ham_vector`` is the full per-pair
        vector (np.ndarray, possibly empty) so callers can log/select on
        the weakest pair — queue14's seed-7 delivered [20, 23, 23, 1]
        while its mean-aggregated selection score read 0.949 (RESULTS.md
        "Preset v2 measured")."""
        from svtpu.evaluation.hamming import adjacent_hamming, modal_codes

        val_idx = [i for s in self.splits.val for i in s]
        if not val_idx:
            return 0.0, 0.0, np.zeros(0)
        codes = self._val_codes(params, val_idx, temperature, noise=False,
                                seed=seed)
        if self.labels_by_index is not None:
            labels = np.asarray([self.labels_by_index[i] for i in val_idx])
            num_states = int(max(self.labels_by_index.values())) + 1
        else:
            labels = np.asarray([assign_label(i, self.flags)
                                 for i in val_idx])
            num_states = len(self.flags) + 1
        det_w, _ = modal_consistency(codes, labels, num_states)
        ham = adjacent_hamming(modal_codes(codes, labels, num_states))
        if len(ham) == 0:
            sep = 0.0
        elif self.cfg.sep_aggregate == "min":
            sep = float(ham.min())
        else:
            sep = float(ham.mean())
        return sep, float(det_w), ham

    # ------------------------------------------------------------ main loop

    def train_simple(self, state_segments, num_epochs: Optional[int] = None,
                     temperature: float = 0.5) -> dict:
        """Bare recon+KL loop over whole state segments at fixed temperature
        (``simple_RBVAE_train.py:143-188``)."""
        from svtpu.data.datasets import SegmentBatcher
        cfg = self.cfg
        num_epochs = num_epochs or cfg.num_epochs
        batcher = SegmentBatcher(self.store, state_segments, seed=self.seed)
        state = self.init_state()
        model = self.model

        @jax.jit
        def step_fn(state, batch, mask, key):
            key = jax.random.fold_in(key, state.step)

            def loss_fn(p):
                return simple_objective(model, cfg, {"params": p}, batch,
                                        temperature, False, key,
                                        deterministic=False, mask=mask)

            grads, metrics = jax.grad(loss_fn, has_aux=True)(
                state.params["params"])
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params["params"])
            params = optax.apply_updates(state.params["params"], updates)
            return TrainState(step=state.step + 1,
                              params={"params": params},
                              opt_state=opt_state), metrics

        base_key = jax.random.key(self.seed + 1)
        history = {"train_losses": []}
        for epoch in range(num_epochs):
            last = {}
            for batch, mask in batcher.epoch(epoch):
                b = jax.device_put(jnp.asarray(batch), self._rep)
                m = jax.device_put(jnp.asarray(mask), self._rep)
                state, metrics = step_fn(state, b, m, base_key)
                last = {k: float(v) for k, v in metrics.items()}
            history["train_losses"].append(last)
        history["final_state"] = state
        return history

    def train(self, num_epochs: Optional[int] = None,
              save_path: Optional[str] = None,
              log_every: int = 0, resume: bool = False) -> dict:
        """Run the full training loop.

        ``resume=True`` restores the ``latest`` checkpoint from
        ``save_path`` and continues from its epoch — mid-training resume the
        reference's live pipeline lacks (SURVEY.md §5.4). A SIGUSR1 during
        training checkpoints ``latest`` at the next epoch boundary (the
        dormant SD harness's "melk" behavior, ``main.py:699-710``)."""
        cfg = self.cfg
        if cfg.objective == "simple":
            raise ValueError("use train_simple() for the simple objective")
        num_epochs = num_epochs or cfg.num_epochs
        state = self.init_state()
        # Scan-fused epochs need a staged bank (same-shape index batches)
        # and are incompatible with per-BATCH TB logging (the steps run
        # inside one compiled program).
        fused = (cfg.fused_epoch and self._bank is not None
                 and not log_every)
        if fused:
            train_epoch = self._compiled_epoch or self._make_train_epoch()
            self._compiled_epoch = train_epoch
            val_epoch = self._compiled_val_epoch or self._make_val_epoch()
            self._compiled_val_epoch = val_epoch
            train_step = val_step = None
        else:
            train_step = self._compiled_train or self._make_train_step()
            self._compiled_train = train_step
            val_step = self._compiled_val or self._make_val_step()
            self._compiled_val = val_step

        maximize = cfg.select_by != "val_loss"
        ckpt = BestCheckpointer(
            save_path, mode="max" if maximize else "min") if save_path else None
        base_key = jax.random.key(self.seed + 1)

        worst_key = [-np.inf, -np.inf, -np.inf, -np.inf]
        history = {"train_losses": [], "val_losses": [], "best_epoch": 0,
                   "best_metric": -np.inf if maximize else np.inf,
                   "best_key": list(worst_key)}
        start_epoch = 0
        if resume and ckpt and ckpt.exists("latest"):
            tree, meta = ckpt.restore(
                "latest", target={"params": state.params,
                                  "opt_state": state.opt_state})
            state = TrainState(step=state.step,
                               params=jax.device_put(tree["params"],
                                                     self._rep),
                               opt_state=jax.device_put(
                                   tree["opt_state"], self._rep))
            start_epoch = int(meta["epoch"]) + 1
            history["best_metric"] = float(meta.get("best_metric",
                                                    history["best_metric"]))
            if "best_key" in meta:
                history["best_key"] = [float(x) for x in meta["best_key"]]
            elif np.isfinite(history["best_metric"]):
                # Pre-tie-break checkpoint: reconstruct a key that keeps the
                # old strict-greater semantics (ties never displace it).
                history["best_key"] = [
                    (1.0 if maximize else -1.0) * history["best_metric"],
                    np.inf, np.inf, np.inf]
            if np.isfinite(history["best_metric"]):
                ckpt.best_metric = history["best_metric"]
                ckpt.best_key = tuple(history["best_key"])
            # Restore the global step so the temperature schedule resumes
            # where it left off instead of re-annealing from init.
            state = state.replace(step=jax.device_put(
                jnp.asarray(int(meta.get("global_step", 0)), jnp.int32),
                self._rep))

        melk_requested = [False]
        try:
            import signal

            prev_handler = signal.signal(
                signal.SIGUSR1, lambda *_: melk_requested.__setitem__(0, True))
        except (ValueError, OSError):      # non-main thread etc.
            prev_handler = None

        t0 = time.time()
        frames_seen = 0
        from svtpu.data.prefetch import prefetch_to_device

        staged = self._bank is not None
        vib = None
        if fused:
            # The val set is fixed across epochs (and across stream
            # restarts — restart_reroll keeps it so probe metrics stay
            # comparable), so its stacked row-index batches upload ONCE.
            vb = list(self.val_batcher.epoch_indices(0))
            if vb:
                vib = jax.device_put(jnp.asarray(np.stack(vb)),
                                     self._bsh_epoch)
                n_vb = len(vb)

        # Auto-restart on basin failure (see TrainConfig.restart_check_epoch).
        restarts = 0
        run_max_sep = 0.0
        next_check = (start_epoch + cfg.restart_check_epoch
                      if cfg.restart_check_epoch else None)
        history["restarts"] = []

        # Probe state carried across non-probe epochs (cfg.val_every > 1):
        # periodic/melk "latest" saves between probes reuse the last probed
        # metric/selection key (never promotable — the key already lost or
        # won its comparison at its own probe epoch) and Hamming vector.
        metric = history["best_metric"]
        sel_key = tuple(history["best_key"])
        ham = np.zeros(0, dtype=np.int64)
        det_w, sep_mean = 0.0, 0.0

        for epoch in range(start_epoch, num_epochs):
            # ---- train. Fused: the whole epoch is ONE dispatch — the
            # same-shape index batches stack to [steps, B, 2, S] and a
            # lax.scan of the train step runs on-device; one summed metric
            # vector comes back (single relay round-trip). Per-step: batches
            # prefetched to device 2 steps ahead; with a staged bank only
            # row indices travel, the gather runs on-chip.
            if fused:
                batches = list(self.train_batcher.epoch_indices(epoch))
                nb = len(batches)
                if nb:
                    idx = np.stack(batches)
                    ib = jax.device_put(jnp.asarray(idx), self._bsh_epoch)
                    state, vec = train_epoch(state, ib, base_key,
                                             self._temp_floor, self._bank)
                    frames_seen += int(np.prod(idx.shape[:4]))
                    sums = dict(zip(self._epoch_metric_names,
                                    np.asarray(vec, np.float64)))
                else:
                    # Empty epoch: degrade like the per-step loop (nb=0,
                    # max(nb,1) divisor) instead of np.stack raising.
                    sums = {}
                train_losses = {k: v / max(nb, 1) for k, v in sums.items()}
            else:
                sums, nb = {}, 0
                batches = (self.train_batcher.epoch_indices(epoch) if staged
                           else self.train_batcher.epoch(epoch))
                for b in prefetch_to_device(batches, self._bsh):
                    state, metrics = train_step(state, b, base_key,
                                                self._temp_floor, self._bank)
                    nb += 1
                    frames_seen += int(np.prod(b.shape[:3]))
                    if log_every and nb % log_every == 0:
                        m = {k: float(v) for k, v in metrics.items()}
                        self.writer.scalars("Batch", m, int(state.step))
                    for k, v in metrics.items():
                        sums[k] = sums.get(k, 0.0) + float(v)
                train_losses = {k: v / max(nb, 1) for k, v in sums.items()}

            # ---- validate (every cfg.val_every epochs — on small datasets
            # the probes dominate the per-epoch wall-clock, RESULTS.md
            # "Training path"; the final epoch and the restart-check epoch
            # are always probed so selection and the basin check see them)
            probe = (cfg.val_every <= 1
                     or (epoch - start_epoch) % cfg.val_every == 0
                     or epoch == num_epochs - 1
                     or (next_check is not None
                         and restarts < cfg.max_restarts
                         and epoch + 1 == next_check))
            val_losses = {}
            better = False
            if probe:
                vkey = jax.random.fold_in(base_key, 10_000_000 + epoch)
                if fused and vib is not None:
                    # One dispatch + one summed-vector readback for the
                    # whole val set (the indices are device-resident).
                    vec = val_epoch(state.params, vib, vkey, self._bank)
                    val_losses = {
                        k: v / max(n_vb, 1) for k, v in
                        zip(self._val_metric_names,
                            np.asarray(vec, np.float64))}
                else:
                    vsums, vn = {}, 0
                    vbatches = (self.val_batcher.epoch_indices(0) if staged
                                else self.val_batcher.epoch(0))
                    for batch in vbatches:
                        b = jax.device_put(jnp.asarray(batch), self._bsh)
                        # One host transfer per batch (device_get of the
                        # whole dict), not one readback per metric key.
                        m = jax.device_get(
                            val_step(state.params, b, vkey, self._bank))
                        vn += 1
                        for k, v in m.items():
                            vsums[k] = vsums.get(k, 0.0) + float(v)
                    val_losses = {k: v / max(vn, 1)
                                  for k, v in vsums.items()}

                score, per_state = self.state_consistency(
                    state.params, cfg.final_temperature, seed=epoch)
                val_losses["consistency_score"] = float(score)
                sep, det_w, ham = self.state_separation(
                    state.params, cfg.final_temperature)
                sep_mean = float(ham.mean()) if len(ham) else 0.0
                val_losses["state_separation"] = sep
                val_losses["sep_mean"] = sep_mean
                val_losses["sep_min"] = float(ham.min()) if len(ham) else 0.0
                # Full per-pair vector (one scalar key per adjacent pair) so
                # a delivered checkpoint's weakest pair is visible in every
                # history/TB record, not just at eval time (queue14 seed 7
                # shipped [20, 23, 23, 1] invisibly; RESULTS.md).
                for i, h in enumerate(ham):
                    val_losses[f"sep_pair_{i}"] = float(h)
                val_losses["det_consistency_score"] = det_w
                val_losses["combined_score"] = float(score) * min(
                    sep / cfg.sep_target, 1.0)
                for i, p in enumerate(per_state):
                    val_losses[f"state_{i}_consistency"] = float(p)

                # Adaptive trap guard: keep the measured |h|/T ratio at or
                # below the configured band by RAISING the temperature floor
                # to |h|/ratio as the logit scale grows. A one-time freeze is
                # not enough — the causal seed-8 arm froze at T=1.59 and
                # still eroded 460 epochs later because |h| kept growing at
                # the frozen temperature (RESULTS.md "trap guard").
                if cfg.trap_guard_ratio > 0:
                    abs_h = self._ctxfree_h_scale(state.params)
                    val_losses["ctxfree_abs_h"] = abs_h
                    needed = abs_h / cfg.trap_guard_ratio
                    if needed > float(self._temp_floor):
                        self._temp_floor = jnp.asarray(needed, jnp.float32)
                        ev = history.setdefault(
                            "trap_guard", {"first_raise_epoch": epoch,
                                           "raises": 0})
                        ev["raises"] += 1
                        ev["floor"] = float(needed)
                        ev["abs_h"] = abs_h
                        ev["epoch"] = epoch

            self.writer.scalars("Epoch/Train", train_losses, epoch)
            if probe:
                self.writer.scalars("Epoch/Val", val_losses, epoch)

                metric = val_losses[{
                    "consistency": "consistency_score",
                    "separation": "state_separation",
                    "combined": "combined_score",
                    "val_loss": "total_loss"}[cfg.select_by]]
                # Lexicographic selection key: primary metric first, then
                # det-consistency, mean separation, and epoch as tie-breaks.
                # A strict-greater scalar compare degenerates when the
                # metric never moves off its initialization — queue15's
                # min-aggregated multi-video run had combined ≡ 0
                # throughout, so "best" stayed the FIRST epoch (clean 0.143
                # vs 0.887 for "latest", results/multi_diagnose/eval_braked).
                # The reference shares the blind spot
                # (contrastive_RBVAE_train.py:662-673, same greater-than
                # pattern); the tie-breaks fix it here.
                sign = 1.0 if maximize else -1.0
                sel_key = (sign * metric, det_w, sep_mean, epoch)
                better = sel_key > tuple(history["best_key"])
            if better:
                history["best_metric"] = metric
                history["best_key"] = list(sel_key)
                history["best_epoch"] = epoch
                history["best_ham_vector"] = [int(h) for h in ham]
            periodic = (cfg.latest_every > 0
                        and (epoch - start_epoch) % cfg.latest_every == 0)
            if ckpt and (better or melk_requested[0] or periodic
                         or epoch == num_epochs - 1):
                ckpt.save(
                    {"params": state.params, "opt_state": state.opt_state},
                    epoch=epoch, metric=metric, sel_key=sel_key,
                    extra={"select_by": cfg.select_by,
                           "best_metric": history["best_metric"],
                           "best_key": list(history["best_key"]),
                           "ham_vector": [int(h) for h in ham],
                           "global_step": int(state.step)})
                melk_requested[0] = False
            history["train_losses"].append(train_losses)
            history["val_losses"].append(val_losses)
            # Stdout heartbeat for long unattended runs (sweeps through a
            # relay): SVTPU_EPOCH_LOG=N prints every N epochs.
            hb = int(os.environ.get("SVTPU_EPOCH_LOG", "0") or 0)
            if hb and (epoch % hb == 0 or epoch == num_epochs - 1):
                vals = (f"cons {val_losses['consistency_score']:.3f} "
                        f"det {val_losses['det_consistency_score']:.3f} "
                        f"sep {val_losses['state_separation']:.2f} "
                        if probe else "(no probe) ")
                print(f"[epoch {epoch}] "
                      f"train {train_losses.get('total_loss', 0):.4f} "
                      f"{vals}"
                      f"best {history['best_metric']:.4f}"
                      f"@{history['best_epoch']}", flush=True)

            # ---- auto-restart: never left the collapsed basin by the check
            # epoch -> re-roll the init within the same epoch budget.
            # The basin check reduces the per-pair vector by cfg.restart_on,
            # independent of sep_aggregate (selection): "mean" by default —
            # restart_min_sep thresholds were calibrated on the mean
            # (converged seeds sit at 17-21 mean bits by epoch 250,
            # RESULTS.md), and a healthy run whose weakest pair is still
            # closing would otherwise be re-rolled spuriously under
            # min-aggregated selection. "min" targets multi-video per-VIDEO
            # basin failure (one pair pinned at 0 behind a healthy mean).
            # Only probed epochs contribute to the running max (val_every>1
            # subsamples the trajectory; the check epoch itself is always
            # probed, so the fire decision never reads stale separation).
            sep_check = (float(ham.min()) if len(ham) else 0.0) \
                if cfg.restart_on == "min" else sep_mean
            if probe:
                run_max_sep = max(run_max_sep, sep_check)
            if (next_check is not None and restarts < cfg.max_restarts
                    and epoch + 1 >= next_check
                    and run_max_sep < cfg.restart_min_sep):
                restarts += 1
                state = self.init_state(seed_offset=1000 * restarts)
                if cfg.restart_reroll == "stream":
                    # Re-roll the DATA stream along with the init: the
                    # s7_v2minrestart arm showed three param inits failing
                    # identically (pair 3 merged every leg) on the one
                    # run-fixed thing a plain restart keeps — the pair
                    # table and noise key (RESULTS.md round 4). Val stays
                    # fixed so probe metrics remain comparable across legs.
                    self.train_batcher = PairBatcher(
                        self.store, self.splits.train, cfg.batch_size,
                        seed=self.seed + 1000 * restarts)
                    base_key = jax.random.key(
                        self.seed + 1 + 1000 * restarts)
                run_max_sep = 0.0
                # Restart re-runs the schedule from step 0; lift any frozen
                # floor along with it.
                self._temp_floor = jnp.asarray(cfg.final_temperature,
                                               jnp.float32)
                history.pop("trap_guard", None)
                next_check = epoch + 1 + cfg.restart_check_epoch
                # The re-rolled run replaces the failed one: drop the failed
                # basin's best. A collapsed basin can score HIGH on pure
                # consistency (all states on one code), so keeping its
                # best_metric would block the restarted run from ever
                # checkpointing under select_by="consistency".
                history["best_metric"] = -np.inf if maximize else np.inf
                history["best_key"] = list(worst_key)
                history["best_epoch"] = epoch + 1
                # Drop the failed run's carried probe state too: a periodic
                # "latest" save before the first post-restart probe must not
                # promote fresh-init params under the old run's key.
                metric = history["best_metric"]
                sel_key = tuple(worst_key)
                ham = np.zeros(0, dtype=np.int64)
                det_w, sep_mean = 0.0, 0.0
                if ckpt:
                    ckpt.best_metric = None
                    ckpt.best_key = None
                history["restarts"].append(
                    {"epoch": epoch, "restart": restarts,
                     "seed_offset": 1000 * restarts})
                print(f"[epoch {epoch}] {cfg.restart_on} separation "
                      f"{sep_check:.2f} < "
                      f"{cfg.restart_min_sep} after "
                      f"{cfg.restart_check_epoch} epochs — restart "
                      f"{restarts}/{cfg.max_restarts} with seed offset "
                      f"{1000 * restarts}", flush=True)

        if prev_handler is not None:
            import signal

            signal.signal(signal.SIGUSR1, prev_handler)
        history["wall_time_s"] = time.time() - t0
        history["frames_seen"] = frames_seen
        history["final_state"] = state
        self.writer.close()
        return history


def modal_consistency(codes: np.ndarray, labels: np.ndarray,
                      num_states: int):
    """Fraction of codes equal to each state's modal code, weighted by state
    size (``percep_RBVAE_train.py:464-497``)."""
    pct, counts = [], []
    bits = np.asarray(codes) > 0.5
    for s in range(num_states):
        mask = labels == s
        counts.append(int(mask.sum()))
        if not mask.any():
            pct.append(0.0)
            continue
        vecs = bits[mask]
        uniq, cnt = np.unique(vecs, axis=0, return_counts=True)
        modal = uniq[np.argmax(cnt)]
        pct.append(float(np.mean(np.all(vecs == modal, axis=1))))
    total = sum(counts)
    weighted = float(np.dot(pct, counts) / total) if total else 0.0
    return weighted, pct
