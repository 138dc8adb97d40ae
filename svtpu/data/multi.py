"""Multi-video dataset combination.

The reference trains strictly one video per run (each trainer ``__main__``
hard-codes a single frame dir + flag list, e.g.
``contrastive_RBVAE_train.py:692-747``). svtpu generalizes: several videos'
state segments concatenate into one global state axis, so the contrastive
"adjacent state" structure and the triplet anchor/negative arithmetic work
unchanged across video boundaries, and one model learns symbols for all of
them.

Frame indices are globalized into disjoint blocks of ``OFFSET`` per video
(video ``k``'s local frame ``i`` → ``k*OFFSET + i``), which keeps every
downstream consumer (pair tables, gathers, label maps) pure index
arithmetic with no per-video bookkeeping.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from svtpu.config import VideoMeta
from svtpu.data.segments import SplitIndices, assign_label, split_segments

# One video's frame ids live in [k*OFFSET, (k+1)*OFFSET). Far above any real
# frame count (the longest reference video is 12,298 frames).
OFFSET = 10_000_000


class MultiStore:
    """Routes gathers over global frame ids to the per-video stores."""

    def __init__(self, stores: Sequence):
        if not stores:
            raise ValueError("need at least one store")
        shapes = {tuple(s.item_shape) for s in stores}
        if len(shapes) != 1:
            raise ValueError(f"stores disagree on item_shape: {shapes}")
        self.stores = list(stores)
        self._array = None

    @property
    def item_shape(self):
        return self.stores[0].item_shape

    # -- device-staging support (Trainer stage_frames): one concatenated
    # bank + global-id → bank-row routing, so multi-video training gets
    # the same index-only host→device transfer as single-video.

    @property
    def array(self) -> np.ndarray:
        if not all(hasattr(s, "array") and hasattr(s, "rows")
                   for s in self.stores):
            # hasattr(multi_store, "array") → False, so the Trainer's
            # staging gate falls back to host gathers.
            raise AttributeError("sub-stores lack array/rows")
        if self._array is None:
            self._array = np.concatenate(
                [np.asarray(s.array) for s in self.stores])
        return self._array

    def rows(self, frame_indices) -> np.ndarray:
        idx = np.asarray(frame_indices)
        video = idx // OFFSET
        local = idx % OFFSET
        base, acc = [], 0
        for s in self.stores:
            base.append(acc)
            acc += len(s.array)
        out = np.empty(idx.shape, np.int64)
        for k, s in enumerate(self.stores):
            sel = video == k
            if sel.any():
                out[sel] = base[k] + s.rows(local[sel])
        return out

    def gather(self, idx) -> np.ndarray:
        idx = np.asarray(idx)
        flat = idx.reshape(-1)
        video = flat // OFFSET
        local = flat % OFFSET
        out = None
        for k, store in enumerate(self.stores):
            sel = np.nonzero(video == k)[0]
            if not len(sel):
                continue
            part = np.asarray(store.gather(local[sel]))
            if out is None:
                out = np.empty((len(flat),) + part.shape[1:], part.dtype)
            out[sel] = part
        if out is None:
            raise ValueError("empty index array")
        return out.reshape(idx.shape + out.shape[1:])


def combine_videos(specs: Sequence[Tuple[object, VideoMeta]],
                   test_pct: float = 0.1, val_pct: float = 0.1,
                   ) -> Tuple[MultiStore, SplitIndices, Dict[int, int]]:
    """Concatenate several videos into one global dataset.

    Args:
      specs: ``[(store, VideoMeta), ...]`` per video.

    Returns:
      ``(store, splits, labels)``: a routing :class:`MultiStore`, a
      :class:`SplitIndices` whose per-state tuples hold *global* frame ids
      with states concatenated across videos, and a ``global frame id →
      global state id`` map for the consistency metric (every frame of every
      video is labeled, including grey-out margins, matching single-video
      ``assign_label`` semantics).
    """
    train: List[Tuple[int, ...]] = []
    test: List[Tuple[int, ...]] = []
    val: List[Tuple[int, ...]] = []
    labels: Dict[int, int] = {}
    state_base = 0
    for k, (store, meta) in enumerate(specs):
        frame_base = k * OFFSET
        sp = split_segments(meta.state_segments(), test_pct, val_pct)
        for part, acc in ((sp.train, train), (sp.test, test), (sp.val, val)):
            acc.extend(tuple(frame_base + i for i in state)
                       for state in part)
        for i in range(meta.last_frame + 1):
            labels[frame_base + i] = state_base + assign_label(i, meta.flags)
        state_base += meta.num_states
    stores = MultiStore([s for s, _ in specs])
    return stores, SplitIndices(tuple(train), tuple(test), tuple(val)), labels
