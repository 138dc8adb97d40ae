"""Flagship demo: raw video file → packed binary symbols, one call.

Streams the chinchess mp4 through the native decoder and the trained
contrastive RBVAE (VideoSymbolPipeline), writes a SymbolStore npz, and
prints per-state modal-code stats.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svtpu.config import BUILTIN_VIDEOS, rbvae_variant
from svtpu.data.segments import assign_label
from svtpu.data.symbols import SymbolStore
from svtpu.evaluation.hamming import adjacent_hamming, modal_codes
from svtpu.pipeline import VideoSymbolPipeline
from svtpu.training.checkpoints import BestCheckpointer


def main(video_path, ckpt_dir, out_path="data/chinchess_symbols.npz",
         latent_dim=25):
    meta = BUILTIN_VIDEOS["chinese_chess"]
    cfg = rbvae_variant("contrastive", latent_dim=latent_dim,
                        compute_dtype="bfloat16")
    tree, ck_meta = BestCheckpointer(ckpt_dir).restore("best")
    # Reference eval protocol: temp 0.2, hard=True, Binary-Concrete noise on
    # (``embedding_matching.py:264``); per-state *modal* codes are the
    # propositional symbols.
    pipe = VideoSymbolPipeline(cfg, tree["params"], batch=64,
                               temperature=0.2, hard=True, noise=True,
                               noise_ratio=0.3, resize_on="host")

    codes = pipe.run_video(video_path)      # warm (includes compile)
    t0 = time.time()
    codes = pipe.run_video(video_path)
    dt = time.time() - t0
    n = len(codes)
    labels = np.asarray([assign_label(i, meta.flags) for i in range(n)])
    store = SymbolStore(codes, np.arange(n), labels)
    store.save(out_path)

    modal = modal_codes(codes, labels, meta.num_states)
    ham = adjacent_hamming(modal)
    print(json.dumps({
        "frames": n,
        "latent_dim": latent_dim,
        "wall_s": round(dt, 2),
        "frames_per_sec_end_to_end": round(n / dt, 1),
        "ckpt_consistency": ck_meta.get("metric"),
        "adjacent_hamming": ham.tolist(),
        "unique_codes": int(len(np.unique(codes, axis=0))),
        "symbols_npz": out_path,
        "npz_bytes": os.path.getsize(out_path),
    }))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "/root/reference/videos/chinchess_gettyimages-148739276-640_adpp.mp4",
         sys.argv[2] if len(sys.argv) > 2 else "data/ckpt/chinchess_long")
