"""Measure the reference pipeline's video→binary-symbol throughput.

The reference publishes no benchmark numbers (BASELINE.md), so we measure
the GENUINE reference model here: the contrastive ``Seq2SeqBinaryVAE``
from ``models/contrastive_RBVAE/contrastive_RBVAE_model.py`` (imported via
svtpu.utils.reference's torchvision stub), running its ``.encode`` exactly
as the reference evaluation protocol does — one frame per call as a
[1, 1, C, 256, 256] sequence, hard=True, temp 0.2
(``embedding_matching.py:264``, ``percep_RBVAE_train.py:459-462``) — on
the torch device available (CPU here; the reference itself falls back to
CPU when CUDA is absent, ``contrastive_RBVAE_train.py:717``).

Writes BENCH_BASELINE.json with frames/sec for batch-1 (reference protocol)
and batch-32 (best case for the reference's architecture under torch).
"""
import json
import platform
import sys
import time
from pathlib import Path

import numpy as np
import torch
import torch.nn as nn

sys.path.append(str(Path(__file__).resolve().parents[1]))
from svtpu.utils.reference import load_reference_model_module  # noqa: E402

LATENT = 50
RES = 256


def genuine_rbvae():
    """The ACTUAL reference contrastive Seq2SeqBinaryVAE
    (``contrastive_RBVAE_model.py:125-190``), latent 50 (the reference's
    chinchess best-model latent, ``best_models.txt``), eval mode."""
    mod = load_reference_model_module("contrastive")
    if mod is None:
        raise SystemExit("/root/reference not available")
    torch.manual_seed(0)
    return mod.Seq2SeqBinaryVAE(3, 3, LATENT, LATENT).eval()


def throughput(model, batch, n_frames=64):
    x = torch.rand(batch, 1, 3, RES, RES)
    with torch.no_grad():
        model.encode(x, temperature=0.2, hard=True, noise_ratio=0.1)
        t0 = time.perf_counter()
        done = 0
        while done < n_frames:
            model.encode(x, temperature=0.2, hard=True, noise_ratio=0.1)
            done += batch
        dt = time.perf_counter() - t0
    return done / dt


REFERENCE_SD = "/root/reference/src/stable-diffusion"


def genuine_sd_encoder():
    """The ACTUAL vendored reference encoder
    (ldm/modules/diffusionmodules/model.py:368-459) + the AutoencoderKL
    quant conv (ldm/models/autoencoder.py:296, encode wiring :324-328),
    random weights, v1-inference.yaml config (ch 128, mult 1/2/4/4,
    2 res blocks, no attn resolutions, double_z). Returns None when the
    reference tree is absent (fall back to SDEncoderEquivalent)."""
    import sys
    if REFERENCE_SD not in sys.path:
        sys.path.append(REFERENCE_SD)  # append: untrusted tree must not shadow installed packages
    try:
        from ldm.modules.diffusionmodules.model import Encoder
    except ImportError:
        return None
    enc = Encoder(ch=128, out_ch=3, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
                  attn_resolutions=[], dropout=0.0, in_channels=3,
                  resolution=256, z_channels=4, double_z=True).eval()
    quant = nn.Conv2d(8, 8, 1).eval()

    class Composed(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc, self.quant = enc, quant

        def forward(self, x):
            return self.quant(self.enc(x))

    return Composed().eval()


class SDEncoderEquivalent(nn.Module):
    """Fallback when /root/reference is absent: torch model with the
    reference AutoencoderKL encoder's compute profile
    (ldm/modules/diffusionmodules/model.py:368-459 via
    v1-inference.yaml: ch 128, mult 1/2/4/4, 2 resblocks, single-head
    mid attention over the 88x160 bottleneck): conv stacks per level plus
    the quadratic attention, which dominate the reference's per-frame cost."""

    def __init__(self, ch=128, mults=(1, 2, 4, 4)):
        super().__init__()
        layers = [nn.Conv2d(3, ch, 3, 1, 1)]
        cin = ch
        for i, m in enumerate(mults):
            for _ in range(2):
                layers += [nn.GroupNorm(32, cin, eps=1e-6), nn.SiLU(),
                           nn.Conv2d(cin, ch * m, 3, 1, 1)]
                cin = ch * m
            if i != len(mults) - 1:
                layers += [nn.Conv2d(cin, cin, 3, 2, 1)]
        self.trunk = nn.Sequential(*layers)
        self.qkv = nn.Conv2d(cin, 3 * cin, 1)
        self.out = nn.Conv2d(cin, 8, 3, 1, 1)

    def forward(self, x):
        h = self.trunk(x)
        q, k, v = self.qkv(h).chunk(3, dim=1)
        b, c, hh, w = q.shape
        qf = q.reshape(b, c, hh * w).permute(0, 2, 1)
        kf = k.reshape(b, c, hh * w)
        att = torch.softmax(torch.bmm(qf, kf) * (c ** -0.5), dim=2)
        vf = v.reshape(b, c, hh * w)
        h = torch.bmm(vf, att.permute(0, 2, 1)).reshape(b, c, hh, w)
        return self.out(h)


def sd_encoder_seconds_per_frame():
    torch.manual_seed(0)
    m = genuine_sd_encoder()
    genuine = m is not None
    if not genuine:
        m = SDEncoderEquivalent().eval()
    x = torch.rand(1, 3, 704, 1280)
    with torch.no_grad():
        t0 = time.perf_counter()
        m(x)
        return time.perf_counter() - t0, genuine


def main():
    torch.manual_seed(0)
    model = genuine_rbvae()
    fps1 = throughput(model, 1, 32)
    fps32 = throughput(model, 32, 64)
    sd_spf, sd_genuine = sd_encoder_seconds_per_frame()
    out = {
        "description": "GENUINE reference torch encode throughput "
                       "(contrastive_RBVAE_model.py Seq2SeqBinaryVAE"
                       ".encode, 256x256, latent 50)",
        "device": "cpu",
        "cpu": platform.processor() or platform.machine(),
        "torch": torch.__version__,
        "frames_per_sec_batch1": round(fps1, 2),
        "frames_per_sec_batch32": round(fps32, 2),
        "protocol": "batch1 = reference eval protocol "
                    "(frame-at-a-time [1,1,C,H,W]); batch32 = batched",
        "rbvae_module": "genuine contrastive_RBVAE_model.Seq2SeqBinaryVAE"
                        ".encode (torchvision import stubbed)",
        "sd_encoder_sec_per_frame": round(sd_spf, 3),
        "sd_encoder_frames_per_sec": round(1.0 / sd_spf, 3),
        "sd_encoder_module": ("measured on the actual reference module "
                              "(ldm/modules/diffusionmodules/model.py "
                              "Encoder, random weights)" if sd_genuine
                              else "SDEncoderEquivalent fallback"),
    }
    with open("BENCH_BASELINE.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
