"""Video → frame-directory extraction and video conversion (layer L0).

One unified tool replacing the reference's four near-identical scripts
(``scripts/cv2_frame_extraction.py``, ``decord_frame_extraction.py:60``,
``pyav_frame_extraction.py:18``, ``frame_extraction.py:6``) and
``video_conversion.py:6``. Backends:

  * ``cv2``    — OpenCV VideoCapture (always available here)
  * ``native`` — the C++ libav reader in ``svtpu.data.native`` (decord's
                 role in the reference, rebuilt first-party)
  * ``pyav`` / ``decord`` — used when installed, otherwise a clear error

Frames are written as ``%010d.jpg``, the naming every downstream layer
keys on (reference ``cv2_frame_extraction.py:11``).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, Iterator, Optional, Tuple

import numpy as np

FRAME_PATTERN = "{:010d}.jpg"


def iter_frames_cv2(video_path: str) -> Iterator[np.ndarray]:
    import cv2

    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        raise IOError(f"cannot open video: {video_path}")
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    finally:
        cap.release()


def iter_frames_pyav(video_path: str) -> Iterator[np.ndarray]:
    try:
        import av
    except ImportError as e:
        raise ImportError("pyav backend requested but 'av' is not "
                          "installed; use backend='cv2' or 'native'") from e
    with av.open(str(video_path)) as container:
        for frame in container.decode(video=0):
            yield frame.to_ndarray(format="rgb24")


def iter_frames_decord(video_path: str) -> Iterator[np.ndarray]:
    try:
        import decord
    except ImportError as e:
        raise ImportError("decord backend requested but not installed; "
                          "use backend='cv2' or 'native'") from e
    vr = decord.VideoReader(str(video_path))
    for i in range(len(vr)):
        yield vr[i].asnumpy()


def iter_frames_native(video_path: str) -> Iterator[np.ndarray]:
    from svtpu.data.native import VideoReader

    with VideoReader(str(video_path)) as vr:
        yield from vr


BACKENDS = {
    "cv2": iter_frames_cv2,
    "pyav": iter_frames_pyav,
    "decord": iter_frames_decord,
    "native": iter_frames_native,
}


def extract_frames(video_path: str | Path, out_dir: str | Path,
                   backend: str = "cv2", every_n: int = 1,
                   limit: Optional[int] = None,
                   quality: int = 95) -> int:
    """Decode ``video_path`` and write RGB JPEG frames to ``out_dir``.

    Returns the number of frames written. Frame index in the filename is the
    *source* frame number (matching the reference, which writes every frame
    with its running index)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    try:
        it = BACKENDS[backend](str(video_path))
    except KeyError:
        raise ValueError(f"unknown backend {backend!r}; "
                         f"choose from {sorted(BACKENDS)}")
    from PIL import Image

    written = 0
    for i, frame in enumerate(it):
        if i % every_n:
            continue
        Image.fromarray(frame).save(out_dir / FRAME_PATTERN.format(i),
                                    quality=quality)
        written += 1
        if limit is not None and written >= limit:
            break
    return written


def video_info(video_path: str | Path) -> dict:
    import cv2

    cap = cv2.VideoCapture(str(video_path))
    try:
        return {
            "frames": int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
            "fps": float(cap.get(cv2.CAP_PROP_FPS)),
            "width": int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            "height": int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        }
    finally:
        cap.release()


def convert_video(src: str | Path, dst: str | Path,
                  fourcc: str = "MJPG") -> None:
    """Container/codec conversion (reference ``video_conversion.py:6-26``
    shells out to ffmpeg; here OpenCV's writer keeps it dependency-free)."""
    import cv2

    cap = cv2.VideoCapture(str(src))
    if not cap.isOpened():
        raise IOError(f"cannot open video: {src}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = cv2.VideoWriter(str(dst), cv2.VideoWriter_fourcc(*fourcc),
                             fps, (w, h))
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            writer.write(frame)
    finally:
        cap.release()
        writer.release()


def download_sd_weights(out_dir: str | Path,
                        repo_id: str = "CompVis/stable-diffusion-v-1-4-original",
                        filename: str = "sd-v1-4.ckpt") -> str:
    """HF-hub download of the SD checkpoint (reference
    ``scripts/download_weights.py:1-3``). Raises a clear error in
    zero-egress environments."""
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:
        raise ImportError(
            "huggingface_hub is not installed; download sd-v1-4.ckpt "
            "manually and pass its path to "
            "svtpu.perceptual.convert.load_torch_checkpoint") from e
    return hf_hub_download(repo_id=repo_id, filename=filename,
                           local_dir=str(out_dir))
