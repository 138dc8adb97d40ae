"""Dump the synthetic SD-latent-scale embeddings to a reference-format
.npy dict so CLI paths (sweep/train/eval --embeddings) can use them.

The generator is percep_flagship_demo.synth_embeddings: per-frame
[1,4,88,160] arrays, state-structured, matching real SD-latent statistics
(the format ``get_percep_embeddings.py`` writes and
``percep_RBVAE_train.py:204`` loads).

Usage: python scripts/make_synth_embeddings.py [out.npy]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from svtpu.config import VideoMeta

from percep_flagship_demo import synth_embeddings  # noqa: E402


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "data/embeddings_synth.npy"
    meta = VideoMeta("synth_percep", flags=(74, 206, 282, 389),
                     last_frame=479, grey_out=10)
    emb = synth_embeddings(meta)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    np.save(out, emb, allow_pickle=True)
    print(f"saved {len(emb)} embeddings to {out}")


if __name__ == "__main__":
    main()
