"""Multi-video training demo: one model learns symbols for two videos.

The reference trains strictly one video per run (each trainer __main__
hard-codes one frame dir, ``contrastive_RBVAE_train.py:692-747``); svtpu's
``data/multi.py`` concatenates videos on a global state axis. This script
demonstrates it at real scale on hardware: the bundled chinchess clip plus
a synthetic 4-state clip train one contrastive RBVAE with the flagship
objective (contrast_on="p" + context-free + noise-hardened selection),
reporting the cross-video val consistency/separation trajectory.

Usage: python scripts/multi_video_demo.py [epochs]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from svtpu.config import BUILTIN_VIDEOS, TrainConfig, VideoMeta, rbvae_variant
from svtpu.data.datasets import FrameStore
from svtpu.data.multi import combine_videos
from svtpu.training.trainer import Trainer


def synth_video(n_frames=240, states=4, hw=(256, 256), seed=7):
    """A 4-state synthetic clip: colored quadrant patterns + noise."""
    rng = np.random.default_rng(seed)
    per = n_frames // states
    frames = np.empty((n_frames,) + hw + (3,), np.uint8)
    for s in range(states):
        base = np.zeros(hw + (3,), np.uint8)
        base[: hw[0] // 2 * (s % 2 + 1) // 1] = 0  # keep simple: color code
        base[..., s % 3] = 120 + 30 * s
        if s >= 2:
            base[hw[0] // 2:, :, (s + 1) % 3] = 200
        for i in range(per):
            frames[s * per + i] = np.clip(
                base.astype(np.int16)
                + rng.integers(-20, 20, base.shape), 0, 255)
    flags = tuple(per * (s + 1) for s in range(states - 1))
    meta = VideoMeta("synthB", flags=flags, last_frame=n_frames - 1,
                     grey_out=2)

    class ArrStore:
        def __init__(self, a):
            self.array = a

        @property
        def item_shape(self):
            return self.array.shape[1:]

        def rows(self, idx):
            return np.asarray(idx)

        def gather(self, idx):
            return self.array[np.asarray(idx)]

    return ArrStore(frames), meta


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    chin = BUILTIN_VIDEOS["chinese_chess"]
    all_idx = list(range(chin.last_frame + 1))
    store_a = FrameStore("data/frames/chinese_chess", all_idx,
                         resolution=(256, 256))
    store_b, meta_b = synth_video()
    store, splits, labels = combine_videos([(store_a, chin),
                                            (store_b, meta_b)])
    mcfg = rbvae_variant("contrastive", latent_dim=25,
                         compute_dtype="bfloat16")
    tcfg = TrainConfig(
        batch_size=32, learning_rate=3e-4, init_temperature=2.0,
        final_temperature=0.2, anneal_rate=3e-4, num_steps_to_update=4,
        margin=3.5, alpha=4.0, beta_kl=0.2, noise_ratio=0.3,
        eval_noise_ratio=0.1, contrast_on="p", contextfree_contrast=True,
        select_by="combined", objective="contrastive")
    tr = Trainer(mcfg, tcfg, store, splits, flags=[], seed=1,
                 labels_by_index=labels)
    print(f"staged={tr._bank is not None} "
          f"global_states={max(labels.values()) + 1} "
          f"bank_frames={len(store.array)}")
    hist = tr.train(num_epochs=epochs,
                    save_path="data/ckpt/multi_demo", resume=True)
    best = max(v.get("combined_score", 0.0) for v in hist["val_losses"])
    last = hist["val_losses"][-1]
    print(f"best_combined={best:.4f} "
          f"final cons={last['consistency_score']:.3f} "
          f"det={last['det_consistency_score']:.3f} "
          f"sep={last['state_separation']:.2f}")


if __name__ == "__main__":
    main()
