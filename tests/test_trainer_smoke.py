"""End-to-end training smoke tests on a synthetic tiny video.

The synthetic video has 3 clearly distinct "states" (solid color blocks with
noise); a couple of epochs should run green, produce finite losses, a valid
consistency score, and a working checkpoint round-trip. Runs on the 8-device
virtual CPU mesh from conftest, so the data-parallel path is exercised.
"""
import numpy as np
import pytest

import jax

from svtpu.config import VideoMeta, TrainConfig, rbvae_variant
from svtpu.data.datasets import EmbeddingStore, FrameStore, PairBatcher
from svtpu.data.segments import split_segments
from svtpu.training.trainer import Trainer, modal_consistency


@pytest.fixture(scope="module")
def synth_video(tmp_path_factory):
    """60 frames, states = [0,20), [20,40), [40,60): R/G/B blocks."""
    from PIL import Image

    d = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    for i in range(60):
        base = np.zeros((32, 32, 3), np.uint8)
        base[..., i // 20] = 200
        img = np.clip(base + rng.integers(0, 30, base.shape), 0,
                      255).astype(np.uint8)
        Image.fromarray(img).save(d / f"{i:010d}.jpg")
    meta = VideoMeta("synth", flags=(20, 40), last_frame=59, grey_out=1)
    return d, meta


def _setup(synth_video, objective="contrastive", variant="contrastive"):
    frames_dir, meta = synth_video
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    all_idx = (list(splits.flat("train")) + list(splits.flat("val"))
               + list(splits.flat("test")))
    store = FrameStore(frames_dir, all_idx, resolution=(32, 32))
    mcfg = rbvae_variant(variant, latent_dim=8, input_hw=(32, 32))
    tcfg = TrainConfig(batch_size=8, num_epochs=2, objective=objective,
                       num_steps_to_update=2,
                       select_by="consistency" if objective == "contrastive"
                       else "val_loss")
    return Trainer(mcfg, tcfg, store, splits, meta.flags), store, splits


def test_contrastive_end_to_end(synth_video, tmp_path):
    trainer, store, splits = _setup(synth_video)
    hist = trainer.train(num_epochs=2, save_path=str(tmp_path / "ckpt"))
    assert len(hist["train_losses"]) == 2
    for tl in hist["train_losses"]:
        assert np.isfinite(tl["total_loss"])
        assert {"recon_loss", "kl_loss", "contrast_loss"} <= set(tl)
    vl = hist["val_losses"][-1]
    assert 0.0 <= vl["consistency_score"] <= 1.0
    # checkpoint round-trip
    from svtpu.training.checkpoints import BestCheckpointer
    ck = BestCheckpointer(str(tmp_path / "ckpt"))
    tree, meta_d = ck.restore("best")
    assert "params" in tree and "epoch" in meta_d


def test_triplet_end_to_end(synth_video):
    trainer, _, _ = _setup(synth_video, objective="triplet",
                           variant="triplet")
    hist = trainer.train(num_epochs=1)
    assert np.isfinite(hist["train_losses"][0]["triplet_loss"])
    # triplet selects best by val loss
    assert np.isfinite(hist["best_metric"])


def test_simple_end_to_end(synth_video):
    frames_dir, meta = synth_video
    segs = meta.state_segments()
    all_idx = [i for s, e in segs for i in range(s, e)]
    store = FrameStore(frames_dir, all_idx, resolution=(64, 64))
    mcfg = rbvae_variant("simple", latent_dim=8)
    tcfg = TrainConfig(batch_size=1, objective="simple")
    splits = split_segments(segs)
    tr = Trainer(mcfg, tcfg, store, splits, meta.flags)
    hist = tr.train_simple(segs, num_epochs=1)
    assert np.isfinite(hist["train_losses"][0]["total_loss"])


def test_percep_path_with_embedding_store(synth_video):
    _, meta = synth_video
    rng = np.random.default_rng(1)
    emb = {f"{i:010d}.jpg": rng.normal(
        size=(1, 4, 8, 16)).astype(np.float32) + 3.0 * (i // 20)
        for i in range(60)}
    store = EmbeddingStore(emb)
    assert store.array.shape == (60, 8, 16, 4)
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    mcfg = rbvae_variant("percep", latent_dim=8, input_hw=(8, 16),
                         conv_features=(32, 32, 32), lstm_layers=2)
    tcfg = TrainConfig(batch_size=8, objective="contrastive")
    trainer = Trainer(mcfg, tcfg, store, splits, meta.flags)
    hist = trainer.train(num_epochs=1)
    assert np.isfinite(hist["train_losses"][0]["total_loss"])


def test_modal_consistency_math():
    codes = np.array([[1, 0], [1, 0], [0, 0],      # state 0: modal [1,0] 2/3
                      [0, 1], [0, 1]])             # state 1: modal [0,1] 2/2
    labels = np.array([0, 0, 0, 1, 1])
    w, pct = modal_consistency(codes, labels, 2)
    assert pct[0] == pytest.approx(2 / 3)
    assert pct[1] == pytest.approx(1.0)
    assert w == pytest.approx((2 / 3 * 3 + 1.0 * 2) / 5)


def test_pair_batcher_shapes(synth_video):
    frames_dir, meta = synth_video
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    store = FrameStore(frames_dir, splits.flat("train"), resolution=(32, 32))
    b = PairBatcher(store, splits.train, batch_size=4, seed=0)
    batches = list(b.epoch(0))
    assert all(x.shape == (4, 2, 3, 32, 32, 3) for x in batches)
    assert all(x.dtype == np.uint8 for x in batches)


def test_resume_from_latest(synth_video, tmp_path):
    trainer, _, _ = _setup(synth_video)
    hist1 = trainer.train(num_epochs=1, save_path=str(tmp_path / "ck"))
    hist2 = trainer.train(num_epochs=3, save_path=str(tmp_path / "ck"),
                          resume=True)
    # Resumed run starts after the saved epoch: only epochs 1..2 run.
    assert len(hist2["train_losses"]) == 2


def test_latest_checkpoint_tracks_plateaus(synth_video, tmp_path):
    """``latest`` must advance even when the selection metric never
    improves (regression: it was only written on improvement, so a resume
    after a long plateau lost every plateau epoch)."""
    import dataclasses
    import json

    trainer, _, _ = _setup(synth_video)
    trainer.cfg = dataclasses.replace(trainer.cfg, latest_every=1)
    trainer.train(num_epochs=4, save_path=str(tmp_path / "ck"))
    latest = json.loads((tmp_path / "ck" / "latest.json").read_text())
    assert latest["epoch"] == 3


def test_utils_profiling_steptimer():
    from svtpu.utils.profiling import StepTimer

    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            pass
    s = t.summary()
    assert s["steps"] == 3 and s["mean_s"] >= 0


def test_triplet_js_objective(synth_video):
    frames_dir, meta = synth_video
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    store = FrameStore(frames_dir, splits.flat("train")
                       + splits.flat("val") + splits.flat("test"),
                       resolution=(32, 32))
    mcfg = rbvae_variant("triplet", latent_dim=8, input_hw=(32, 32))
    tcfg = TrainConfig(batch_size=8, objective="triplet",
                       triplet_distance="js", select_by="val_loss")
    tr = Trainer(mcfg, tcfg, store, splits, meta.flags)
    hist = tr.train(num_epochs=1)
    assert np.isfinite(hist["train_losses"][0]["triplet_loss"])


def test_triplet_pull_term(synth_video):
    """``triplet_pull`` adds exactly weight x the contrastive similar-pair
    term on sigmoid(h) to the triplet aux loss — the constructive repair
    of the measured triplet-topology collapse (RESULTS.md
    "triplet_on='p'"). weight=0 must be the reference objective
    (``triplet_RBVAE_train.py:461-468``) bit-for-bit."""
    import dataclasses

    from svtpu.training.trainer import pair_objective

    frames_dir, meta = synth_video
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    store = FrameStore(frames_dir, splits.flat("train")
                       + splits.flat("val") + splits.flat("test"),
                       resolution=(32, 32))
    mcfg = rbvae_variant("triplet", latent_dim=8, input_hw=(32, 32))
    tcfg = TrainConfig(batch_size=4, objective="triplet",
                       select_by="val_loss", triplet_pull=2.0)
    tr = Trainer(mcfg, tcfg, store, splits, meta.flags)
    params = tr.init_state().params
    import jax.numpy as jnp

    batch = jnp.asarray(next(iter(tr.train_batcher.epoch(0))))
    key = jax.random.key(0)

    _, m_pull = pair_objective(tr.model, tcfg, params, batch, 1.0, False,
                               key, deterministic=True)
    cfg0 = dataclasses.replace(tcfg, triplet_pull=0.0)
    _, m_ref = pair_objective(tr.model, cfg0, params, batch, 1.0, False,
                              key, deterministic=True)
    assert "pull_loss" in m_pull and "pull_loss" not in m_ref
    pull = float(m_pull["pull_loss"])
    assert pull > 0
    np.testing.assert_allclose(
        float(m_pull["triplet_loss"]),
        float(m_ref["triplet_loss"]) + 2.0 * pull, rtol=1e-5)

    # And the wired trainer runs with it.
    hist = tr.train(num_epochs=1)
    assert np.isfinite(hist["train_losses"][0]["pull_loss"])


def test_triplet_push_term(synth_video):
    """``triplet_push`` adds exactly weight x the contrastive DISSIMILAR
    hinge on the triplet's own (anchor, negative) frames in p-space — the
    scale-growing force the relative margin lacks (the round-5 measured
    mechanism: the pull alone is inert at the |h|~0 collapsed fixed
    point). weight=0 must be the reference objective
    (``triplet_RBVAE_train.py:461-468``) bit-for-bit. Unlike the pull
    (O(1e-9) at init), the push must be LARGE at init: p ~ 0.5 everywhere
    means d(p_a, p_n) ~ 0, so the hinge reads ~margin^2."""
    import dataclasses

    from svtpu.training.trainer import pair_objective

    frames_dir, meta = synth_video
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    store = FrameStore(frames_dir, splits.flat("train")
                       + splits.flat("val") + splits.flat("test"),
                       resolution=(32, 32))
    mcfg = rbvae_variant("triplet", latent_dim=8, input_hw=(32, 32))
    tcfg = TrainConfig(batch_size=4, objective="triplet", margin=2.0,
                       select_by="val_loss", triplet_push=1.5)
    tr = Trainer(mcfg, tcfg, store, splits, meta.flags)
    params = tr.init_state().params
    import jax.numpy as jnp

    batch = jnp.asarray(next(iter(tr.train_batcher.epoch(0))))
    key = jax.random.key(0)

    _, m_push = pair_objective(tr.model, tcfg, params, batch, 1.0, False,
                               key, deterministic=True)
    cfg0 = dataclasses.replace(tcfg, triplet_push=0.0)
    _, m_ref = pair_objective(tr.model, cfg0, params, batch, 1.0, False,
                              key, deterministic=True)
    assert "push_loss" in m_push and "push_loss" not in m_ref
    push = float(m_push["push_loss"])
    # Active at init (the pull's failure mode): hinge ~ margin^2 = 4.
    assert push > 1.0
    np.testing.assert_allclose(
        float(m_push["triplet_loss"]),
        float(m_ref["triplet_loss"]) + 1.5 * push, rtol=1e-5)

    # And the wired trainer runs with it.
    hist = tr.train(num_epochs=1)
    assert np.isfinite(hist["train_losses"][0]["push_loss"])


def test_best_checkpointer_modes(tmp_path):
    from svtpu.training.checkpoints import BestCheckpointer

    ck = BestCheckpointer(tmp_path / "max", mode="max")
    assert ck.save({"w": np.ones(2)}, epoch=0, metric=0.5)
    assert not ck.save({"w": np.ones(2) * 2}, epoch=1, metric=0.4)
    assert ck.save({"w": np.ones(2) * 3}, epoch=2, metric=0.9)
    tree, meta = ck.restore("best")
    assert meta["metric"] == 0.9 and tree["w"][0] == 3
    _, latest = ck.restore("latest")
    assert latest["epoch"] == 2

    ck2 = BestCheckpointer(tmp_path / "min", mode="min")
    assert ck2.save({"w": np.zeros(1)}, epoch=0, metric=1.0)
    assert ck2.save({"w": np.zeros(1)}, epoch=1, metric=0.2)
    assert not ck2.save({"w": np.zeros(1)}, epoch=2, metric=0.7)


def test_ema_litema_semantics():
    import jax.numpy as jnp
    from svtpu.training.ema import ema_init, ema_update

    p0 = {"w": jnp.zeros(3)}
    st = ema_init(p0)
    p1 = {"w": jnp.ones(3)}
    st = ema_update(st, p1, decay=0.9999)
    # First update uses the warmup-capped decay d = min(0.9999, 2/11);
    # ema = d*ema + (1-d)*p = (1-d).
    d = 2.0 / 11.0
    np.testing.assert_allclose(np.asarray(st.ema["w"]), np.full(3, 1.0 - d),
                               rtol=1e-6)
    assert int(st.updates) == 1


def test_lambda_linear_schedule():
    from svtpu.training.ema import lambda_linear_schedule

    s = lambda_linear_schedule(1e-3, warmup_steps=100, f_start=0.0)
    assert float(s(0)) == 0.0
    assert abs(float(s(50)) - 5e-4) < 1e-8
    assert abs(float(s(100)) - 1e-3) < 1e-9
    assert abs(float(s(1000)) - 1e-3) < 1e-9


def test_simple_objective_mask_excludes_padding():
    import jax
    import jax.numpy as jnp
    from svtpu.training.trainer import simple_objective

    mcfg = rbvae_variant("simple", latent_dim=4, input_hw=(64, 64))
    from svtpu.models.rbvae import Seq2SeqBinaryVAE

    model = Seq2SeqBinaryVAE(mcfg)
    x_valid = jax.random.uniform(jax.random.key(0), (1, 3, 64, 64, 3))
    params = model.init({"params": jax.random.key(1)}, x_valid, 1.0, False,
                        deterministic=True)
    cfg = TrainConfig(objective="simple", bernoulli_p=0.1)

    # Pad with garbage frames; masked loss must equal the unpadded loss.
    garbage = jnp.ones((1, 2, 64, 64, 3))
    x_pad = jnp.concatenate([x_valid, garbage], axis=1)
    mask = jnp.asarray([[1.0, 1.0, 1.0, 0.0, 0.0]])

    l_ref, _ = simple_objective(model, cfg, params, x_valid, 0.5, False,
                                jax.random.key(2), True)
    l_mask, _ = simple_objective(model, cfg, params, x_pad, 0.5, False,
                                 jax.random.key(2), True, mask=mask)
    # Not exactly equal (the LSTM sees the padded steps downstream of the
    # valid ones? No — padding is after, so valid-step outputs are
    # unaffected by later inputs in a causal LSTM).
    assert abs(float(l_ref) - float(l_mask)) < 1e-5


def test_state_separation_metric(synth_video):
    trainer, _, _ = _setup(synth_video)
    hist = trainer.train(num_epochs=1)
    assert "state_separation" in hist["val_losses"][0]
    sep = hist["val_losses"][0]["state_separation"]
    assert 0.0 <= sep <= trainer.mcfg.latent_dim


def test_contrast_on_z(synth_video):
    frames_dir, meta = synth_video
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    store = FrameStore(frames_dir, splits.flat("train")
                       + splits.flat("val") + splits.flat("test"),
                       resolution=(32, 32))
    mcfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))
    tcfg = TrainConfig(batch_size=8, objective="contrastive",
                       contrast_on="z")
    tr = Trainer(mcfg, tcfg, store, splits, meta.flags)
    hist = tr.train(num_epochs=1)
    assert np.isfinite(hist["train_losses"][0]["contrast_loss"])


def test_contrast_on_p_keeps_gradient_at_low_temperature(synth_video):
    """contrast_on="p" (sigmoid(h) at unit temperature) must carry a
    nonzero contrastive gradient even when the sampling temperature is at
    its floor — exactly where the "z" formulation's gradient dies
    (sigmoid((h+noise)/T) saturates as T→0)."""
    import jax
    import jax.numpy as jnp
    from svtpu.training.trainer import pair_objective

    frames_dir, meta = synth_video
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    store = FrameStore(frames_dir, splits.flat("train")
                       + splits.flat("val") + splits.flat("test"),
                       resolution=(32, 32))
    mcfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))
    tcfg = TrainConfig(batch_size=4, objective="contrastive",
                       contrast_on="p", alpha=1.0, beta_kl=0.0)
    tr = Trainer(mcfg, tcfg, store, splits, meta.flags)
    batch = jnp.asarray(next(iter(tr.train_batcher.epoch(0))))
    state = tr.init_state()

    import optax

    def loss(p):
        _, m = pair_objective(tr.model, tcfg, p, batch,
                              jnp.float32(0.05), False,
                              jax.random.key(0), deterministic=True)
        return m["contrast_loss"]

    gp = float(optax.global_norm(jax.grad(loss)(state.params)))
    assert gp > 0 and np.isfinite(gp)

    # The mechanism itself, on a sharpened logit (|h| >> T): the "z"
    # representation's gradient d sigmoid(h/T)/dh vanishes, the "p"
    # representation's d sigmoid(h)/dh does not.
    h = jnp.float32(4.0)
    gz_unit = float(jax.grad(lambda v: jax.nn.sigmoid(v / 0.05))(h))
    gp_unit = float(jax.grad(jax.nn.sigmoid)(h))
    assert gz_unit < 1e-6
    assert gp_unit > 1e-2


def test_staged_bank_matches_unstaged(synth_video):
    """Device-staged input (HBM frame bank + index-only transfer) must
    reproduce the host-upload path exactly: same batches, same keys, same
    math — only where the gather happens differs."""
    import dataclasses

    frames_dir, meta = synth_video
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    all_idx = (list(splits.flat("train")) + list(splits.flat("val"))
               + list(splits.flat("test")))
    store = FrameStore(frames_dir, all_idx, resolution=(32, 32))
    mcfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))
    tcfg = TrainConfig(batch_size=8, num_epochs=2, num_steps_to_update=2,
                       stage_frames=True)
    tr_s = Trainer(mcfg, tcfg, store, splits, meta.flags, seed=3)
    tr_u = Trainer(mcfg, dataclasses.replace(tcfg, stage_frames=False),
                   store, splits, meta.flags, seed=3)
    assert tr_s._bank is not None and tr_u._bank is None

    hs = tr_s.train(num_epochs=2)
    hu = tr_u.train(num_epochs=2)
    for ls, lu in zip(hs["train_losses"] + hs["val_losses"],
                      hu["train_losses"] + hu["val_losses"]):
        for k in ls:
            np.testing.assert_allclose(ls[k], lu[k], rtol=1e-5, atol=1e-7,
                                       err_msg=k)


def test_fused_epoch_matches_per_step_loop(synth_video):
    """The scan-fused epoch (one dispatch per epoch) must reproduce the
    per-step dispatch loop exactly: identical step sequence, PRNG folds
    and update math — the scan body IS the train step. Checks per-epoch
    losses, selection, and the final parameters."""
    import dataclasses

    frames_dir, meta = synth_video
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    all_idx = (list(splits.flat("train")) + list(splits.flat("val"))
               + list(splits.flat("test")))
    store = FrameStore(frames_dir, all_idx, resolution=(32, 32))
    mcfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))
    tcfg = TrainConfig(batch_size=8, num_epochs=3, num_steps_to_update=2,
                       stage_frames=True, select_by="combined")
    tr_f = Trainer(mcfg, tcfg, store, splits, meta.flags, seed=5)
    tr_u = Trainer(mcfg, dataclasses.replace(tcfg, fused_epoch=False),
                   store, splits, meta.flags, seed=5)
    assert tr_f._bank is not None and tr_u._bank is not None

    hf = tr_f.train(num_epochs=3)
    hu = tr_u.train(num_epochs=3)
    for lf, lu in zip(hf["train_losses"] + hf["val_losses"],
                      hu["train_losses"] + hu["val_losses"]):
        assert set(lf) == set(lu)
        for k in lf:
            np.testing.assert_allclose(lf[k], lu[k], rtol=1e-5, atol=1e-7,
                                       err_msg=k)
    assert hf["best_epoch"] == hu["best_epoch"]
    assert hf["frames_seen"] == hu["frames_seen"]
    # Final params: the scan body IS the per-step fn, but XLA fuses the
    # whole epoch as one program, so accumulation order can differ by
    # float-rounding (observed max |diff| 1.7e-6 over 3 epochs).
    pf = jax.tree_util.tree_leaves(hf["final_state"].params)
    pu = jax.tree_util.tree_leaves(hu["final_state"].params)
    for a, b in zip(pf, pu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_epoch_empty_train_epoch(synth_video):
    """An empty train epoch (batcher yields zero batches) must degrade
    gracefully on the fused path — like the per-step loop's nb=0 — not
    raise from np.stack([]) (ADVICE r4)."""
    frames_dir, meta = synth_video
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    store = FrameStore(frames_dir, splits.flat("train")
                       + splits.flat("val") + splits.flat("test"),
                       resolution=(32, 32))
    mcfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))
    tcfg = TrainConfig(batch_size=8, stage_frames=True)
    tr = Trainer(mcfg, tcfg, store, splits, meta.flags)
    assert tr._bank is not None
    tr.train_batcher.epoch_indices = lambda epoch: iter(())
    hist = tr.train(num_epochs=1)
    assert hist["train_losses"][0] == {}
    assert np.isfinite(hist["val_losses"][0]["consistency_score"])


def test_contextfree_contrast_trains(synth_video):
    """contextfree_contrast adds T=1-encode margins to the pair objective
    (the representation the eval protocol actually measures)."""
    import dataclasses

    frames_dir, meta = synth_video
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    store = FrameStore(frames_dir, splits.flat("train")
                       + splits.flat("val") + splits.flat("test"),
                       resolution=(32, 32))
    mcfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))
    tcfg = TrainConfig(batch_size=8, objective="contrastive",
                       contrast_on="p", contextfree_contrast=True)
    tr = Trainer(mcfg, tcfg, store, splits, meta.flags)
    hist = tr.train(num_epochs=1)
    cf = hist["train_losses"][0]["contrast_loss"]
    assert np.isfinite(cf)

    # The context-free term changes the loss value vs the plain objective.
    tr2 = Trainer(mcfg, dataclasses.replace(tcfg,
                                            contextfree_contrast=False),
                  store, splits, meta.flags, seed=0)
    hist2 = tr2.train(num_epochs=1)
    assert not np.isclose(cf, hist2["train_losses"][0]["contrast_loss"])


def test_params_npz_roundtrip(tmp_path):
    """Portable npz export/import preserves the param tree exactly."""
    from svtpu.training.checkpoints import load_params_npz, save_params_npz

    params = {"params": {"enc": {"kernel": np.arange(12.0).reshape(3, 4),
                                 "bias": np.zeros(4)},
                         "fc": {"w": np.ones((2, 2), np.float32)}}}
    save_params_npz(params, tmp_path / "p.npz")
    back = load_params_npz(tmp_path / "p.npz")
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(flat_a) == len(flat_b)
    for (ka, va), (kb, vb) in zip(sorted(flat_a, key=str),
                                  sorted(flat_b, key=str)):
        np.testing.assert_array_equal(va, vb)


def test_flagship_archive_integrity():
    """The committed flagship parameter archive must load into the exact
    tree the latent-25 contrastive model expects (results/ artifact,
    RESULTS.md flagship)."""
    import pathlib

    import jax.numpy as jnp
    from svtpu.models.rbvae import Seq2SeqBinaryVAE
    from svtpu.training.checkpoints import load_params_npz

    path = (pathlib.Path(__file__).parent.parent / "results"
            / "p_hardened_params.npz")
    params = load_params_npz(path)
    mcfg = rbvae_variant("contrastive", latent_dim=25)
    ref = Seq2SeqBinaryVAE(mcfg).init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, 1, 256, 256, 3), jnp.float32), 1.0, False,
        deterministic=True)
    fa = jax.tree_util.tree_flatten_with_path(ref)[0]
    fb = jax.tree_util.tree_flatten_with_path(params)[0]
    assert len(fa) == len(fb)
    shapes_a = sorted((str(k), tuple(v.shape)) for k, v in fa)
    shapes_b = sorted((str(k), tuple(v.shape)) for k, v in fb)
    assert shapes_a == shapes_b


def test_auto_restart_on_basin_failure(synth_video):
    """svtpu auto-restart (TrainConfig.restart_check_epoch): with an
    unreachable separation bar the trainer must re-roll the init with a
    folded seed after the check epoch, within the same epoch budget."""
    frames_dir, meta = synth_video
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    all_idx = (list(splits.flat("train")) + list(splits.flat("val"))
               + list(splits.flat("test")))
    store = FrameStore(frames_dir, all_idx, resolution=(32, 32))
    mcfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))
    tcfg = TrainConfig(batch_size=8, num_epochs=4, objective="contrastive",
                       num_steps_to_update=2, select_by="combined",
                       restart_check_epoch=1, restart_min_sep=1e9,
                       max_restarts=2)
    trainer = Trainer(mcfg, tcfg, store, splits, meta.flags)
    hist = trainer.train(num_epochs=4)
    assert len(hist["train_losses"]) == 4          # budget unchanged
    assert len(hist["restarts"]) == 2              # capped by max_restarts
    assert hist["restarts"][0]["seed_offset"] == 1000
    assert hist["restarts"][1]["seed_offset"] == 2000
    for tl in hist["train_losses"]:
        assert np.isfinite(tl["total_loss"])


def test_restart_on_min_fires_when_mean_is_healthy(synth_video):
    """restart_on="min" thresholds the WEAKEST pair: a run whose mean
    separation is healthy but whose min pair is pinned at 0 must restart
    under "min" and must NOT under the default "mean" (multi-video
    per-video basin failure: queue15's braked arm held mean 21.9 with one
    chinchess pair at exactly 0 for 1500 epochs,
    results/multi_diagnose/braked.jsonl)."""
    import dataclasses

    def scripted_sep(trainer):
        # mean 12.5 (healthy), min 0 (one merged pair), det 0.5
        return lambda params, temperature, seed=0: (
            0.0, 0.5, np.array([25.0, 0.0]))

    frames_dir, meta = synth_video
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    all_idx = (list(splits.flat("train")) + list(splits.flat("val"))
               + list(splits.flat("test")))
    store = FrameStore(frames_dir, all_idx, resolution=(32, 32))
    mcfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))
    base = TrainConfig(batch_size=8, num_epochs=3, objective="contrastive",
                       num_steps_to_update=2, select_by="combined",
                       restart_check_epoch=1, restart_min_sep=5.0,
                       max_restarts=1)

    tr_min = Trainer(mcfg, dataclasses.replace(base, restart_on="min"),
                     store, splits, meta.flags)
    tr_min.state_separation = scripted_sep(tr_min)
    hist_min = tr_min.train(num_epochs=3)
    assert len(hist_min["restarts"]) == 1          # min 0 < 5 -> fires

    tr_mean = Trainer(mcfg, base, store, splits, meta.flags)
    tr_mean.state_separation = scripted_sep(tr_mean)
    hist_mean = tr_mean.train(num_epochs=3)
    assert hist_mean.get("restarts", []) == []     # mean 12.5 >= 5 -> holds


def test_restart_resets_best_metric(synth_video, tmp_path):
    """A restart replaces the failed run, so the failed basin's best
    metric must not gate the restarted run's checkpoints — a collapsed
    basin scores HIGH on pure consistency (all states one code), which
    would otherwise block every post-restart save under
    select_by="consistency"."""
    frames_dir, meta = synth_video
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    all_idx = (list(splits.flat("train")) + list(splits.flat("val"))
               + list(splits.flat("test")))
    store = FrameStore(frames_dir, all_idx, resolution=(32, 32))
    mcfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))
    tcfg = TrainConfig(batch_size=8, num_epochs=3, objective="contrastive",
                       num_steps_to_update=2, select_by="consistency",
                       restart_check_epoch=1, restart_min_sep=1e9,
                       max_restarts=1)
    trainer = Trainer(mcfg, tcfg, store, splits, meta.flags)
    hist = trainer.train(num_epochs=3, save_path=str(tmp_path / "ck"))
    assert len(hist["restarts"]) == 1
    restart_epoch = hist["restarts"][0]["epoch"]
    # The recorded best must come from AFTER the restart, even though the
    # pre-restart epochs also produced (possibly higher) consistency.
    assert hist["best_epoch"] > restart_epoch
    assert np.isfinite(hist["best_metric"])
    # And the best checkpoint on disk is the post-restart one.
    from svtpu.training.checkpoints import BestCheckpointer

    _, meta_b = BestCheckpointer(str(tmp_path / "ck")).restore("best")
    assert int(meta_b["epoch"]) > restart_epoch


def test_trap_guard_freezes_anneal(synth_video):
    """trap_guard_ratio: the anneal freezes the first time the measured
    ctx-free |h|/T ratio crosses the band — later epochs' train
    temperature stops decaying (RESULTS.md: the trap condition is the
    ratio, so a fixed floor cannot cover every run)."""
    import dataclasses

    frames_dir, meta = synth_video
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    all_idx = (list(splits.flat("train")) + list(splits.flat("val"))
               + list(splits.flat("test")))
    store = FrameStore(frames_dir, all_idx, resolution=(32, 32))
    mcfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))
    # Aggressive anneal so the temperature visibly decays within 4 epochs;
    # a tiny ratio so the guard fires on the very first check.
    tcfg = TrainConfig(batch_size=8, num_epochs=4, objective="contrastive",
                       init_temperature=2.0, final_temperature=0.1,
                       anneal_rate=0.1, num_steps_to_update=1,
                       trap_guard_ratio=1e-6, select_by="consistency")
    tr = Trainer(mcfg, tcfg, store, splits, meta.flags)
    hist = tr.train(num_epochs=4)
    assert "trap_guard" in hist
    ev = hist["trap_guard"]
    assert ev["first_raise_epoch"] == 0 and ev["abs_h"] > 0
    # The floor tracks |h|/ratio, which at ratio 1e-6 dwarfs the
    # schedule: every post-fire epoch trains at the guard floor instead
    # of decaying toward 0.1, and the floor equals abs_h/ratio.
    assert ev["floor"] == pytest.approx(ev["abs_h"] / 1e-6)
    temps = [tl["temperature"] for tl in hist["train_losses"]]
    assert temps[1] > 1.0 and temps[3] > 1.0
    assert "ctxfree_abs_h" in hist["val_losses"][-1]

    # Control: guard off → the temperature keeps decaying.
    tr2 = Trainer(mcfg, dataclasses.replace(tcfg, trap_guard_ratio=0.0),
                  store, splits, meta.flags)
    hist2 = tr2.train(num_epochs=4)
    assert "trap_guard" not in hist2
    temps2 = [tl["temperature"] for tl in hist2["train_losses"]]
    assert temps2[3] < temps[3]


def test_selection_tiebreak_never_improving_metric(synth_video, tmp_path):
    """Regression (queue15 degeneracy): when the selection metric never
    moves off its initialization — e.g. ``combined_score`` ≡ 0 because
    min-aggregated separation stays 0 — strict-greater selection kept the
    FIRST epoch as "best" (delivered clean 0.143 vs 0.887 for "latest",
    results/multi_diagnose/eval_braked). The lexicographic tie-breaks
    (det-consistency, then mean separation, then epoch) must promote the
    most-converged epoch instead. The reference shares the scalar blind
    spot (``contrastive_RBVAE_train.py:662-673``)."""
    import dataclasses

    from svtpu.training.checkpoints import BestCheckpointer

    trainer, _, _ = _setup(synth_video)
    trainer.cfg = dataclasses.replace(trainer.cfg, select_by="combined")
    # Scripted metric trajectory: separation pinned at 0 (=> combined ≡ 0
    # whatever consistency does), det-consistency peaking at epoch 2.
    det_by_epoch = [0.2, 0.5, 0.9, 0.7]
    calls = []

    def fake_sep(params, temperature, seed=0):
        e = len(calls)
        calls.append(e)
        return 0.0, det_by_epoch[e], np.zeros(2)

    trainer.state_separation = fake_sep
    hist = trainer.train(num_epochs=4, save_path=str(tmp_path / "ck"))
    assert all(v["combined_score"] == 0.0 for v in hist["val_losses"])
    assert hist["best_epoch"] == 2                  # det tie-break, not 0
    _, meta = BestCheckpointer(str(tmp_path / "ck")).restore("best")
    assert int(meta["epoch"]) == 2


def test_selection_tiebreak_mean_sep_then_epoch(synth_video, tmp_path):
    """Deeper tie levels: equal metric AND det-consistency falls through
    to mean separation; all-equal falls through to the later epoch (the
    most-trained among exact ties)."""
    import dataclasses

    from svtpu.training.checkpoints import BestCheckpointer

    trainer, _, _ = _setup(synth_video)
    trainer.cfg = dataclasses.replace(trainer.cfg, select_by="combined")
    # combined ≡ 0 (sep scalar 0), det constant, mean-sep via the ham
    # vector peaks at epoch 1; epochs 2-3 tie with epoch 1 nowhere.
    hams = [np.array([0.0, 2.0]), np.array([4.0, 6.0]),
            np.array([1.0, 1.0]), np.array([1.0, 1.0])]
    calls = []

    def fake_sep(params, temperature, seed=0):
        e = len(calls)
        calls.append(e)
        return 0.0, 0.5, hams[e]

    trainer.state_separation = fake_sep
    hist = trainer.train(num_epochs=4, save_path=str(tmp_path / "ck"))
    assert hist["best_epoch"] == 1                  # mean-sep tie-break
    assert hist["best_ham_vector"] == [4, 6]
    _, meta = BestCheckpointer(str(tmp_path / "ck")).restore("best")
    assert int(meta["epoch"]) == 1

    # All three levels equal -> the later epoch wins.
    trainer2, _, _ = _setup(synth_video)
    trainer2.cfg = dataclasses.replace(trainer2.cfg, select_by="combined")
    trainer2.state_separation = (
        lambda params, temperature, seed=0: (0.0, 0.5, np.array([3.0])))
    sc = trainer2.state_consistency

    def const_consistency(params, temperature, noise=True, seed=0):
        w, pct = sc(params, temperature, noise=noise, seed=seed)
        return 0.0, pct

    trainer2.state_consistency = const_consistency
    hist2 = trainer2.train(num_epochs=3, save_path=str(tmp_path / "ck2"))
    assert hist2["best_epoch"] == 2
    _, meta2 = BestCheckpointer(str(tmp_path / "ck2")).restore("best")
    assert int(meta2["epoch"]) == 2


def test_best_checkpointer_sel_key_lexicographic(tmp_path):
    """BestCheckpointer with sel_key promotes lexicographically and stays
    backward-compatible with the scalar path."""
    from svtpu.training.checkpoints import BestCheckpointer

    ck = BestCheckpointer(tmp_path / "lex", mode="max")
    assert ck.save({"w": np.zeros(1)}, epoch=0, metric=0.0,
                   sel_key=(0.0, 0.2, 1.0, 0))
    # Same metric, higher det tie-break -> promotes.
    assert ck.save({"w": np.ones(1)}, epoch=1, metric=0.0,
                   sel_key=(0.0, 0.9, 0.0, 1))
    # Lower det -> does not, even with a later epoch.
    assert not ck.save({"w": np.ones(1) * 2}, epoch=2, metric=0.0,
                       sel_key=(0.0, 0.5, 9.0, 2))
    _, meta = ck.restore("best")
    assert int(meta["epoch"]) == 1


def test_l1_logits_wiring(synth_video):
    """l1_logits adds a finite L1 term on h to the total and shrinks the
    trained logit scale vs an identical run without it."""
    import dataclasses

    frames_dir, meta = synth_video
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    all_idx = (list(splits.flat("train")) + list(splits.flat("val"))
               + list(splits.flat("test")))
    store = FrameStore(frames_dir, all_idx, resolution=(32, 32))
    mcfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))
    tcfg = TrainConfig(batch_size=8, num_epochs=3, objective="contrastive",
                       num_steps_to_update=2, l1_logits=1.0,
                       select_by="consistency")
    tr = Trainer(mcfg, tcfg, store, splits, meta.flags)
    hist = tr.train(num_epochs=3)
    tl = hist["train_losses"][-1]
    assert "l1_loss" in tl and np.isfinite(tl["l1_loss"]) and tl["l1_loss"] > 0
    h_l1 = tr._ctxfree_h_scale(hist["final_state"].params)

    tr2 = Trainer(mcfg, dataclasses.replace(tcfg, l1_logits=0.0),
                  store, splits, meta.flags)
    hist2 = tr2.train(num_epochs=3)
    assert "l1_loss" not in hist2["train_losses"][-1]
    h_free = tr2._ctxfree_h_scale(hist2["final_state"].params)
    assert h_l1 < h_free


def test_val_every_probe_cadence(synth_video, tmp_path):
    """val_every=3 runs the probe block only on cadence epochs plus the
    final epoch; skipped epochs record train losses only, and selection /
    the best checkpoint only ever see probed epochs (the wall-clock lever:
    on small datasets the probes dominate the per-epoch cost, RESULTS.md
    "Training path")."""
    frames_dir, meta = synth_video
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    all_idx = (list(splits.flat("train")) + list(splits.flat("val"))
               + list(splits.flat("test")))
    store = FrameStore(frames_dir, all_idx, resolution=(32, 32))
    mcfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))
    tcfg = TrainConfig(batch_size=8, num_epochs=8, objective="contrastive",
                       num_steps_to_update=2, select_by="combined",
                       val_every=3)
    trainer = Trainer(mcfg, tcfg, store, splits, meta.flags)
    hist = trainer.train(num_epochs=8, save_path=str(tmp_path / "ckpt"))
    probed = [e for e, v in enumerate(hist["val_losses"]) if v]
    assert probed == [0, 3, 6, 7]            # cadence + always-final
    for e in (1, 2, 4, 5):
        assert hist["val_losses"][e] == {}
        assert np.isfinite(hist["train_losses"][e]["total_loss"])
    assert hist["best_epoch"] in probed
    for v in (hist["val_losses"][e] for e in probed):
        assert {"consistency_score", "det_consistency_score",
                "sep_min"} <= set(v)
    from svtpu.training.checkpoints import BestCheckpointer
    ck = BestCheckpointer(str(tmp_path / "ckpt"))
    _, meta_d = ck.restore("best")
    assert int(meta_d["epoch"]) in probed


def test_val_every_restart_check_still_probes(synth_video):
    """The restart-check epoch is probed even when it falls off the
    val_every cadence, so the basin check never reads stale separation."""
    frames_dir, meta = synth_video
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    all_idx = (list(splits.flat("train")) + list(splits.flat("val"))
               + list(splits.flat("test")))
    store = FrameStore(frames_dir, all_idx, resolution=(32, 32))
    mcfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))
    tcfg = TrainConfig(batch_size=8, num_epochs=4, objective="contrastive",
                       num_steps_to_update=2, select_by="combined",
                       val_every=5, restart_check_epoch=2,
                       restart_min_sep=1e9, max_restarts=1)
    trainer = Trainer(mcfg, tcfg, store, splits, meta.flags)
    hist = trainer.train(num_epochs=4)
    # epoch 1 (= check epoch - 1, so "epoch+1 == next_check") is probed
    # off-cadence and the unreachable bar fires exactly one restart there.
    assert len(hist["restarts"]) == 1
    assert hist["restarts"][0]["epoch"] == 1
    assert hist["val_losses"][1] != {}
    assert hist["val_losses"][2] == {}       # back to cadence: skipped
    assert hist["val_losses"][3] != {}       # final epoch always probed


def test_restart_reroll_stream_rebuilds_pair_table(synth_video):
    """restart_reroll="stream" re-rolls the train pair table and noise key
    on restart; the default "init" keeps them run-fixed (the reference
    builds pairs once at __init__, contrastive_RBVAE_train.py:244-294).
    Motivation: three param inits failed identically on one seed's fixed
    stream (RESULTS.md round 4, s7_v2minrestart)."""
    import dataclasses

    frames_dir, meta = synth_video
    splits = split_segments(meta.state_segments(), 0.15, 0.15)
    all_idx = (list(splits.flat("train")) + list(splits.flat("val"))
               + list(splits.flat("test")))
    store = FrameStore(frames_dir, all_idx, resolution=(32, 32))
    mcfg = rbvae_variant("contrastive", latent_dim=8, input_hw=(32, 32))
    base = TrainConfig(batch_size=8, num_epochs=3, objective="contrastive",
                       num_steps_to_update=2, select_by="combined",
                       restart_check_epoch=1, restart_min_sep=1e9,
                       max_restarts=1)

    tr = Trainer(mcfg, dataclasses.replace(base, restart_reroll="stream"),
                 store, splits, meta.flags)
    table_before = tr.train_batcher.pair_table.copy()
    val_table_before = tr.val_batcher.pair_table.copy()
    hist = tr.train(num_epochs=3)
    assert len(hist["restarts"]) == 1
    assert not np.array_equal(tr.train_batcher.pair_table, table_before)
    # val stays fixed so probe metrics remain comparable across legs
    assert np.array_equal(tr.val_batcher.pair_table, val_table_before)

    tr2 = Trainer(mcfg, base, store, splits, meta.flags)
    table2 = tr2.train_batcher.pair_table.copy()
    hist2 = tr2.train(num_epochs=3)
    assert len(hist2["restarts"]) == 1
    assert np.array_equal(tr2.train_batcher.pair_table, table2)
