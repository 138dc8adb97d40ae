"""Evaluation-suite tests: perturbations, consistency protocol, hamming,
projections, linear probe — on a tiny randomly-initialized model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svtpu.config import rbvae_variant
from svtpu.evaluation.common import RBVAEBundle
from svtpu.evaluation.consistency import (evaluate_consistency,
                                          perturb_frames, plot_results,
                                          write_csv)
from svtpu.evaluation.hamming import (adjacent_hamming, evaluate_hamming,
                                      modal_codes)
from svtpu.evaluation.linear_probe import evaluate_linear_probe
from svtpu.evaluation.projections import evaluate_projections, project
from svtpu.models.rbvae import Seq2SeqBinaryVAE
from svtpu.ops.image import add_gaussian_noise, add_occlusion


@pytest.fixture(scope="module")
def bundle():
    cfg = rbvae_variant("contrastive", latent_dim=6, input_hw=(32, 32))
    model = Seq2SeqBinaryVAE(cfg)
    x0 = jnp.zeros((1, 1, 32, 32, 3))
    params = model.init({"params": jax.random.key(0)}, x0, 1.0, False,
                        deterministic=True)
    return RBVAEBundle(cfg=cfg, params=params, name="test_model")


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(0)
    f = np.zeros((30, 32, 32, 3), np.float32)
    for i in range(30):
        f[i, ..., i // 10] = 0.8
    return np.clip(f + rng.normal(0, 0.05, f.shape), 0, 1).astype(np.float32)


def test_perturbations_properties():
    x = jnp.full((2, 16, 16, 3), 0.5)
    noisy = add_gaussian_noise(x, jax.random.key(0), 0.1)
    assert noisy.shape == x.shape
    assert float(jnp.min(noisy)) >= 0 and float(jnp.max(noisy)) <= 1
    assert not np.allclose(np.asarray(noisy), 0.5)

    occ = np.asarray(add_occlusion(x, jax.random.key(1), 0.25))
    # exactly side^2 pixels become 0.5-grey... input already 0.5; use
    # a non-grey input instead:
    x2 = jnp.full((1, 16, 16, 3), 0.9)
    occ = np.asarray(add_occlusion(x2, jax.random.key(1), 0.25))
    side = int((0.25 * 16 * 16) ** 0.5)
    assert (occ == 0.5).all(axis=-1).sum() == side * side


def test_perturb_frames_dispatch(frames):
    assert perturb_frames(frames, "clean", 0) is frames
    n = perturb_frames(frames, "noise", 0)
    o = perturb_frames(frames, "occlusion", 0)
    assert n.shape == o.shape == frames.shape
    with pytest.raises(ValueError):
        perturb_frames(frames, "bogus", 0)


def test_consistency_protocol(bundle, frames, tmp_path):
    idx = list(range(30))
    flags = [10, 20]
    results = evaluate_consistency(bundle, frames, idx, flags, num_trials=2,
                                   perturbations=("clean", "noise"))
    assert len(results) == 2
    for r in results:
        assert 0.0 <= r.mean <= 1.0
        assert len(r.trials) == 2
    write_csv(results, tmp_path / "c.csv")
    assert (tmp_path / "c.csv").read_text().startswith("model,")
    plot_results(results, tmp_path / "c.png")
    assert (tmp_path / "c.png").exists()


def test_hamming(bundle, frames, tmp_path):
    idx = list(range(30))
    res = evaluate_hamming(bundle, frames, idx, [10, 20])
    assert res["modal_codes"].shape == (3, 6)
    assert res["hamming"].shape == (2,)

    modal = np.array([[0, 0, 1], [1, 0, 1], [1, 1, 0]], np.uint8)
    np.testing.assert_array_equal(adjacent_hamming(modal), [1, 2])

    codes = np.array([[1, 1], [1, 1], [0, 1]])
    labels = np.array([0, 0, 1])
    m = modal_codes(codes, labels, 2)
    np.testing.assert_array_equal(m, [[1, 1], [0, 1]])


def test_projections(bundle, frames, tmp_path):
    written = evaluate_projections(bundle, frames, list(range(30)),
                                   [10, 20], tmp_path, methods=("pca",))
    assert "pca" in written


def test_linear_probe(bundle, frames, tmp_path):
    m = evaluate_linear_probe(bundle, frames,
                              example_path=tmp_path / "ex.png")
    assert set(m) == {"r2", "mse", "mae", "explained_variance"}
    assert np.isfinite(m["mse"])
    assert (tmp_path / "ex.png").exists()


def test_consistency_explicit_labels(bundle, frames):
    """Explicit per-frame labels (the multi-video global-state path) give
    the same result as flags-derived labels when they encode the same
    assignment, and support non-contiguous global ids."""
    from svtpu.data.segments import assign_label

    idx = list(range(30))
    flags = [10, 20]
    ref = evaluate_consistency(bundle, frames, idx, flags, num_trials=2,
                               perturbations=("clean",))
    lab = [assign_label(i, flags) for i in idx]
    via_labels = evaluate_consistency(bundle, frames, idx, flags=[],
                                      num_trials=2,
                                      perturbations=("clean",), labels=lab)
    assert via_labels[0].trials == ref[0].trials


def test_consistency_pixel_to_input_hook(bundle, frames):
    """The percep-path hook (perturbed pixels → model-input space) is
    invoked per trial with the trial seed."""
    calls = []

    def fake_hook(frames01, seed):
        calls.append(seed)
        return frames01  # identity "encoder"

    res = evaluate_consistency(bundle, frames, list(range(30)), [10, 20],
                               num_trials=2, perturbations=("clean",),
                               pixel_to_input=fake_hook)
    assert len(calls) == 2 and calls[0] != calls[1]
    assert 0.0 <= res[0].mean <= 1.0


def test_distributed_initialize_noop():
    from svtpu.parallel.distributed import initialize

    assert initialize() is False      # single-process: safe no-op


def test_umap_min_separates_blobs():
    """First-party minimal UMAP (svtpu/evaluation/umap_min.py): three
    well-separated 10-D Gaussian blobs must land in three separated 2-D
    clusters (intra-cluster spread << inter-centroid distance)."""
    from svtpu.evaluation.umap_min import umap_embed

    rng = np.random.default_rng(0)
    centers = rng.normal(0, 10, (3, 10))
    x = np.concatenate([c + rng.normal(0, 0.3, (40, 10)) for c in centers])
    labels = np.repeat(np.arange(3), 40)
    xy = umap_embed(x, n_neighbors=10, n_epochs=150, seed=0)
    assert xy.shape == (120, 2) and np.isfinite(xy).all()
    cents = np.stack([xy[labels == k].mean(0) for k in range(3)])
    intra = max(np.linalg.norm(xy[labels == k] - cents[k], axis=1).mean()
                for k in range(3))
    inter = min(np.linalg.norm(cents[i] - cents[j])
                for i in range(3) for j in range(i + 1, 3))
    assert inter > 2.5 * intra, (inter, intra)


def test_projection_umap_fallback(tmp_path):
    """project(method='umap') produces coordinates via the minimal
    implementation when umap-learn is absent (it is, here)."""
    rng = np.random.default_rng(1)
    codes = rng.uniform(size=(60, 8))
    xy = project(codes, "umap", seed=0)
    assert xy is not None and xy.shape == (60, 2)
