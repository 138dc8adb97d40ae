"""In-memory frame / embedding stores and the pair-batch pipeline.

Replaces the reference's torch ``Dataset``/``DataLoader`` stack
(``contrastive_RBVAE_train.py:119-327``, ``percep_RBVAE_train.py:120-360``)
with a TPU-shaped pipeline:

  * Frames are decoded once (parallel CPU decode) into a contiguous uint8
    NHWC array at target resolution; every epoch then only *gathers* rows —
    no per-item PIL work, no worker processes.
  * Batches keep static shapes ``[B, 2, S, H, W, C]`` so the train step jits
    once; uint8 travels host→device and normalization happens on device
    (``svtpu.ops.image``), cutting host→device bytes 4x vs float32.
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, Iterable, Optional, Sequence, Tuple

import numpy as np

from svtpu.data.pairs import build_pairs, epoch_batches
from svtpu.data.segments import SplitIndices, split_segments


def _decode_frame(path: str, hw: Tuple[int, int]) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    # torchvision T.Resize((H, W)) uses bilinear; match it.
    img = img.resize((hw[1], hw[0]), Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8)


class FrameStore:
    """All frames of one video, decoded to ``[N, H, W, 3]`` uint8.

    ``frame pattern``: ``%010d.jpg`` files, the layout written by the
    frame-extraction tools (reference ``cv2_frame_extraction.py:11``).
    """

    def __init__(self, frames_dir: str | Path, indices: Sequence[int],
                 resolution: Tuple[int, int] = (256, 256),
                 pattern: str = "{:010d}.jpg", workers: int = 16,
                 decoder: str = "auto"):
        self.frames_dir = str(frames_dir)
        self.resolution = resolution
        self.indices = np.asarray(sorted(set(int(i) for i in indices)))
        self._row = {int(f): r for r, f in enumerate(self.indices)}
        paths = [os.path.join(self.frames_dir, pattern.format(i))
                 for i in self.indices]
        if decoder == "auto":
            from svtpu.data import native
            decoder = "native" if native.available() else "pil"
        if not paths:
            self.array = np.zeros((0, *resolution, 3), np.uint8)
        elif decoder == "native":
            # C++ threaded libjpeg batch decode (svtpu.data.native) —
            # several-x faster than PIL; bilinear semantics differ from
            # PIL's antialiased resize by ~1-2% per pixel.
            from svtpu.data.native import decode_jpeg_batch
            self.array = decode_jpeg_batch(paths, resolution,
                                           threads=workers)
        else:
            with ThreadPoolExecutor(max_workers=workers) as ex:
                frames = list(ex.map(lambda p: _decode_frame(p, resolution),
                                     paths))
            self.array = np.stack(frames)

    @property
    def item_shape(self):
        return self.array.shape[1:]

    @property
    def dtype(self):
        return self.array.dtype

    def rows(self, frame_indices: np.ndarray) -> np.ndarray:
        flat = np.asarray(frame_indices).reshape(-1)
        rows = np.fromiter((self._row[int(i)] for i in flat), np.int64,
                           len(flat))
        return rows.reshape(np.shape(frame_indices))

    def gather(self, frame_indices: np.ndarray) -> np.ndarray:
        """Gather frames for an arbitrary-shaped index array → adds
        ``[H, W, C]`` trailing dims."""
        return self.array[self.rows(frame_indices)]


class EmbeddingStore:
    """Precomputed perceptual embeddings (``<video>_perceps.npy`` dict,
    reference ``get_percep_embeddings.py:112-113``), as ``[N, H, W, 4]``
    float32 NHWC."""

    def __init__(self, embeddings, indices: Optional[Sequence[int]] = None):
        if isinstance(embeddings, (str, Path)):
            embeddings = np.load(embeddings, allow_pickle=True).item()
        rows = {}
        for key, emb in embeddings.items():
            stem = os.path.splitext(os.path.basename(str(key)))[0]
            try:
                idx = int(stem)
            except ValueError:
                continue
            e = np.asarray(emb, np.float32)
            e = e.reshape(e.shape[-3:])          # [C, H, W] (drop batch dim)
            rows[idx] = np.transpose(e, (1, 2, 0))  # NHWC
        if indices is not None:
            rows = {i: rows[i] for i in indices}
        self.indices = np.asarray(sorted(rows))
        self._row = {int(f): r for r, f in enumerate(self.indices)}
        self.array = np.stack([rows[i] for i in self.indices]) if rows else \
            np.zeros((0, 0, 0, 4), np.float32)

    item_shape = FrameStore.item_shape
    dtype = FrameStore.dtype
    rows = FrameStore.rows
    gather = FrameStore.gather


class PairBatcher:
    """Epoch iterator over ``[B, 2, S, ...]`` pair batches.

    Pair tables are rebuilt once per dataset (like the reference, which
    builds pairs at ``__init__`` and only shuffles item order per epoch via
    the DataLoader).
    """

    def __init__(self, store, indices_per_state: Sequence[Sequence[int]],
                 batch_size: int, seed: int = 0, shuffle: bool = True):
        self.store = store
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.pair_table = build_pairs(indices_per_state, seed)  # [P, S, 2]
        self.num_pairs = len(self.pair_table)
        self.num_states = self.pair_table.shape[1]

    def num_batches(self) -> int:
        return -(-self.num_pairs // self.batch_size)

    def epoch(self, epoch_idx: int) -> Iterable[np.ndarray]:
        for idx in self.epoch_frame_indices(epoch_idx):
            yield self.store.gather(idx)

    def epoch_frame_indices(self, epoch_idx: int) -> Iterable[np.ndarray]:
        """Same batches as :meth:`epoch` but as frame-index arrays."""
        batches = epoch_batches(self.pair_table, self.batch_size,
                                self.seed + 7919 * (epoch_idx + 1),
                                shuffle=self.shuffle)
        for b in batches:                       # [B, S, 2]
            # → [B, 2, S]: member m of pair, per state.
            yield np.transpose(b, (0, 2, 1))

    def epoch_indices(self, epoch_idx: int) -> Iterable[np.ndarray]:
        """Row indices into ``store.array`` for device-staged gathers;
        identical batch order to :meth:`epoch` (same seeds)."""
        for idx in self.epoch_frame_indices(epoch_idx):
            yield self.store.rows(idx).astype(np.int32)


class RandomPairBatcher:
    """Legacy sampling mode: each item draws a fresh random frame-pair per
    state (reference ``SampleStatePairDataset``,
    ``contrastive_RBVAE_train.py:119-162``), with a virtual ``num_items``
    length. Kept for parity; ``PairBatcher`` is the workhorse."""

    def __init__(self, store, state_segments, batch_size: int,
                 num_items: int = 1000, seed: int = 0):
        self.store = store
        self.batch_size = batch_size
        self.num_items = num_items
        self.seed = seed
        self.state_indices = [np.arange(s, e) for s, e in state_segments]

    def num_batches(self) -> int:
        return -(-self.num_items // self.batch_size)

    def epoch(self, epoch_idx: int) -> Iterable[np.ndarray]:
        rng = np.random.default_rng(self.seed + 104729 * (epoch_idx + 1))
        S = len(self.state_indices)
        for _ in range(self.num_batches()):
            idx = np.zeros((self.batch_size, 2, S), np.int64)
            for s, frames in enumerate(self.state_indices):
                if len(frames) == 1:
                    idx[:, :, s] = frames[0]
                else:
                    for b in range(self.batch_size):
                        idx[b, :, s] = rng.choice(frames, 2, replace=False)
            yield self.store.gather(idx)


class SegmentBatcher:
    """Simple-variant data: one item = all frames of one state segment
    (reference ``StateSegmentDataset``, ``simple_RBVAE_train.py:91-140``),
    padded to the longest segment for static shapes. Yields
    ``[1, T_max, ...]`` plus a validity mask."""

    def __init__(self, store, state_segments: Sequence[Tuple[int, int]],
                 seed: int = 0):
        self.store = store
        self.segments = [np.arange(s, e) for s, e in state_segments]
        self.t_max = max(len(s) for s in self.segments)
        self.seed = seed

    def epoch(self, epoch_idx: int):
        rng = np.random.default_rng(self.seed + epoch_idx)
        order = rng.permutation(len(self.segments))
        for i in order:
            seg = self.segments[i]
            pad = self.t_max - len(seg)
            idx = np.concatenate([seg, np.full(pad, seg[-1])]) if pad else seg
            mask = np.concatenate([np.ones(len(seg), np.float32),
                                   np.zeros(pad, np.float32)])
            yield self.store.gather(idx)[None], mask[None]


def make_split_stores(frames_dir, video_meta, resolution=(256, 256),
                      test_pct=0.1, val_pct=0.1):
    """Convenience: split + one FrameStore covering train+val+test frames."""
    splits = split_segments(video_meta.state_segments(), test_pct, val_pct)
    all_idx = (list(splits.flat("train")) + list(splits.flat("val"))
               + list(splits.flat("test")))
    store = FrameStore(frames_dir, all_idx, resolution)
    return store, splits
