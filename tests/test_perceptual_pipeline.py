"""Perceptual pipeline tests on a tiny AutoencoderKL: precompute →
reference-format .npy → EmbeddingStore round trip, deterministic vs
stochastic encoding, decode path, interpolation demo."""
import numpy as np
import pytest

import jax

from svtpu.config import PerceptualConfig
from svtpu.data.datasets import EmbeddingStore
from svtpu.models.autoencoder_kl import AutoencoderKL
from svtpu.perceptual.embed import (PerceptualEncoder, precompute_embeddings,
                                    preprocess_size)
from svtpu.perceptual.interpolate import interpolate_images, lerp, slerp

TINY = PerceptualConfig(embed_dim=4, z_channels=4, ch=32, ch_mult=(1, 2),
                        num_res_blocks=1, compute_dtype="float32",
                        resize_wh=(64, 64))


@pytest.fixture(scope="module")
def tiny_params():
    model = AutoencoderKL(TINY)
    import jax.numpy as jnp

    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return model.init({"params": jax.random.key(0)}, x0)


@pytest.fixture(scope="module")
def frames_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("pframes")
    rng = np.random.default_rng(0)
    for i in range(6):
        img = rng.integers(0, 255, (48, 80, 3), dtype=np.uint8)
        Image.fromarray(img).save(d / f"{i:010d}.jpg")
    return d


def test_preprocess_size_snap():
    assert preprocess_size((1280, 720)) == (1280, 704)
    assert preprocess_size((64, 64)) == (64, 64)


def test_precompute_reference_format(tiny_params, frames_dir, tmp_path):
    out = tmp_path / "perceps.npy"
    emb = precompute_embeddings(frames_dir, out, tiny_params, TINY,
                                batch_size=4, stochastic=False)
    assert len(emb) == 6
    # Reference artifact format: {"%010d.jpg": float32 [1, 4, H/8... ]}.
    v = emb["0000000000.jpg"]
    # TINY has 2 levels → 1 downsample → 64/2 = 32 latent resolution.
    assert v.shape == (1, 4, 32, 32)
    assert v.dtype == np.float32

    # np.load round trip + EmbeddingStore ingestion.
    loaded = np.load(out, allow_pickle=True).item()
    store = EmbeddingStore(loaded)
    assert len(store.indices) == 6
    assert store.array.shape[0] == 6


def test_deterministic_vs_stochastic(tiny_params, frames_dir):
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (4, 64, 64, 3), dtype=np.uint8)
    det = PerceptualEncoder(tiny_params, TINY, batch_size=4,
                            stochastic=False)
    z1 = det.encode_frames(frames)
    z2 = det.encode_frames(frames)
    np.testing.assert_array_equal(z1, z2)

    sto = PerceptualEncoder(tiny_params, TINY, batch_size=4,
                            stochastic=True, seed=0)
    sto2 = PerceptualEncoder(tiny_params, TINY, batch_size=4,
                             stochastic=True, seed=1)
    s1, s2 = sto.encode_frames(frames), sto2.encode_frames(frames)
    assert not np.allclose(s1, s2)        # different seeds → different draws


def test_decode_roundtrip_shape(tiny_params):
    rng = np.random.default_rng(2)
    enc = PerceptualEncoder(tiny_params, TINY, batch_size=2,
                            stochastic=False)
    frames = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    z = enc.encode_frames(frames)
    assert z.shape[0] == 2 and z.shape[-1] == 4
    x = enc.decode_latents(z)
    assert x.shape == (2, 64, 64, 3)
    assert x.min() >= 0.0 and x.max() <= 1.0


def test_interpolation(tiny_params, tmp_path):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    enc = PerceptualEncoder(tiny_params, TINY, batch_size=4,
                            stochastic=False)
    out = interpolate_images(enc, a, b, steps=4, mode="slerp",
                             out_path=tmp_path / "interp.png")
    assert out.shape == (4, 64, 64, 3)
    assert (tmp_path / "interp.png").exists()


def test_lerp_slerp_endpoints():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(8,)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    np.testing.assert_allclose(lerp(a, b, 0.0), a)
    np.testing.assert_allclose(lerp(a, b, 1.0), b)
    np.testing.assert_allclose(slerp(a, b, 0.0), a, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(slerp(a, b, 1.0), b, rtol=1e-5, atol=1e-6)
    # Nearly-parallel vectors fall back to lerp without NaNs.
    np.testing.assert_allclose(slerp(a, a * 2.0, 0.5), lerp(a, a * 2.0, 0.5))
