"""Native C++ IO library tests (skipped when the .so isn't built) and
frame-extraction tool tests."""
import numpy as np
import pytest

from svtpu.data import native
from svtpu.data.frames import (BACKENDS, convert_video, extract_frames,
                               video_info)

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="libsvtpu_io.so not built")


@pytest.fixture(scope="module")
def tiny_video(tmp_path_factory):
    """Synthesize a short mp4 with cv2 (falls back to avi/MJPG)."""
    import cv2

    d = tmp_path_factory.mktemp("vid")
    path = str(d / "tiny.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                        (64, 48))
    rng = np.random.default_rng(0)
    for i in range(12):
        frame = np.full((48, 64, 3), i * 20, np.uint8)
        frame += rng.integers(0, 10, frame.shape, dtype=np.uint8)
        w.write(frame)
    w.release()
    return path


def test_extract_cv2(tiny_video, tmp_path):
    n = extract_frames(tiny_video, tmp_path / "frames", backend="cv2")
    assert n == 12
    assert (tmp_path / "frames" / "0000000000.jpg").exists()
    assert (tmp_path / "frames" / "0000000011.jpg").exists()


def test_extract_every_n_and_limit(tiny_video, tmp_path):
    n = extract_frames(tiny_video, tmp_path / "f2", backend="cv2",
                       every_n=3)
    assert n == 4
    n = extract_frames(tiny_video, tmp_path / "f3", backend="cv2", limit=5)
    assert n == 5


def test_video_info(tiny_video):
    info = video_info(tiny_video)
    assert info["frames"] == 12
    assert (info["width"], info["height"]) == (64, 48)


def test_convert_roundtrip(tiny_video, tmp_path):
    dst = tmp_path / "out.avi"
    convert_video(tiny_video, dst)
    assert video_info(dst)["frames"] == 12


def test_unknown_backend(tiny_video, tmp_path):
    with pytest.raises(ValueError):
        extract_frames(tiny_video, tmp_path / "x", backend="nope")


@needs_native
def test_native_video_reader(tiny_video):
    with native.VideoReader(tiny_video) as vr:
        assert (vr.width, vr.height) == (64, 48)
        frames = list(vr)
    assert len(frames) == 12
    assert frames[0].shape == (48, 64, 3)
    # Brightness ramps with frame index in the synthetic video.
    assert frames[-1].mean() > frames[0].mean() + 50


@needs_native
def test_native_jpeg_batch(tmp_path):
    from PIL import Image

    paths = []
    imgs = []
    yy, xx = np.mgrid[0:40, 0:60]
    for i in range(8):
        # Smooth gradients (JPEG-friendly; random noise is worst-case lossy).
        img = np.stack([(yy * 4 + i * 10) % 256, (xx * 3) % 256,
                        ((yy + xx) * 2) % 256], -1).astype(np.uint8)
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(img).save(p, quality=95)
        imgs.append(img)
        paths.append(p)
    out = native.decode_jpeg_batch(paths, (40, 60))
    assert out.shape == (8, 40, 60, 3)
    # JPEG is lossy; decoded content should still correlate strongly.
    err = np.abs(out.astype(int) - np.stack(imgs).astype(int)).mean()
    assert err < 20

    resized = native.decode_jpeg_batch(paths, (20, 30))
    assert resized.shape == (8, 20, 30, 3)


@needs_native
def test_native_matches_cv2_decode(tiny_video):
    cv2_frames = list(BACKENDS["cv2"](tiny_video))
    nat_frames = list(BACKENDS["native"](tiny_video))
    assert len(cv2_frames) == len(nat_frames)
    diff = np.abs(cv2_frames[0].astype(int) - nat_frames[0].astype(int))
    assert diff.mean() < 5


@needs_native
def test_native_read_batch(tiny_video):
    with native.VideoReader(tiny_video) as vr:
        b1 = vr.read_batch(5)
        assert b1.shape == (5, 48, 64, 3)
        b2 = vr.read_batch(100)          # rest of the 12-frame video
        assert b2.shape == (7, 48, 64, 3)
        assert vr.read_batch(4).shape[0] == 0   # EOF
