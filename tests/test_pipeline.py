"""VideoSymbolPipeline tests (tiny model, synthetic video, CPU)."""
import numpy as np
import pytest

import jax

from svtpu.config import rbvae_variant
from svtpu.models.rbvae import Seq2SeqBinaryVAE
from svtpu.pipeline import VideoSymbolPipeline


@pytest.fixture(scope="module")
def tiny_bundle():
    cfg = rbvae_variant("contrastive", latent_dim=6, input_hw=(32, 32))
    model = Seq2SeqBinaryVAE(cfg)
    import jax.numpy as jnp

    x0 = jnp.zeros((1, 1, 32, 32, 3))
    params = model.init({"params": jax.random.key(0)}, x0, 1.0, False,
                        deterministic=True)
    return cfg, params


@pytest.fixture(scope="module")
def tiny_video(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("vid")
    path = str(d / "v.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                        (64, 48))
    for i in range(20):
        w.write(np.full((48, 64, 3), (i * 12) % 255, np.uint8))
    w.release()
    return path


def test_run_frames_shapes_and_binary(tiny_bundle):
    cfg, params = tiny_bundle
    pipe = VideoSymbolPipeline(cfg, params, batch=8)
    frames = np.random.default_rng(0).integers(
        0, 255, (8, 48, 64, 3), dtype=np.uint8)
    codes = pipe.run_frames(frames)
    assert codes.shape == (8, 6)
    assert set(np.unique(codes)) <= {0, 1}


def test_run_video_end_to_end(tiny_bundle, tiny_video):
    cfg, params = tiny_bundle
    pipe = VideoSymbolPipeline(cfg, params, batch=8)
    codes = pipe.run_video(tiny_video)
    assert codes.shape == (20, 6)

    limited = pipe.run_video(tiny_video, limit=5)
    assert limited.shape == (5, 6)


def test_deterministic_mode_stable(tiny_bundle):
    cfg, params = tiny_bundle
    pipe = VideoSymbolPipeline(cfg, params, batch=4, noise=False)
    frames = np.random.default_rng(1).integers(
        0, 255, (4, 48, 64, 3), dtype=np.uint8)
    c1, c2 = pipe.run_frames(frames), pipe.run_frames(frames)
    np.testing.assert_array_equal(c1, c2)
