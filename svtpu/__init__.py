"""svtpu — symbols-from-video, TPU-native.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
`matt-suncy/symbols-from-video`: extraction of propositional (binary) state
representations from video via Recurrent Binary VAEs (RBVAE) with
Binary-Concrete latents, optionally on top of the Stable-Diffusion perceptual
autoencoder's latent space.

Layer map (mirrors reference SURVEY.md §1, rebuilt TPU-first):
  L0  svtpu.data.frames        — video → frame dirs (cv2/imageio/native C++)
  L1  svtpu.perceptual.embed   — batched, sharded SD-VAE embedding precompute
  L2  svtpu.models.autoencoder_kl — AutoencoderKL encoder/decoder in JAX
  L3  svtpu.models.rbvae       — the four Seq2SeqBinaryVAE variants (one module)
  L4  svtpu.training           — jitted trainers, datasets in svtpu.data
  L5  svtpu.sweeps             — hyperparameter sweeps (W&B or local)
  L6  svtpu.evaluation         — consistency/hamming/projection/probe evals
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level API (keeps `import svtpu` light; heavy deps load on use).
    _api = {
        "Seq2SeqBinaryVAE": ("svtpu.models.rbvae", "Seq2SeqBinaryVAE"),
        "AutoencoderKL": ("svtpu.models.autoencoder_kl", "AutoencoderKL"),
        "Trainer": ("svtpu.training.trainer", "Trainer"),
        "TrainConfig": ("svtpu.config", "TrainConfig"),
        "RBVAEConfig": ("svtpu.config", "RBVAEConfig"),
        "PerceptualConfig": ("svtpu.config", "PerceptualConfig"),
        "rbvae_variant": ("svtpu.config", "rbvae_variant"),
        "VideoMeta": ("svtpu.config", "VideoMeta"),
        "VideoSymbolPipeline": ("svtpu.pipeline", "VideoSymbolPipeline"),
        "PerceptualEncoder": ("svtpu.perceptual.embed", "PerceptualEncoder"),
        "RBVAEBundle": ("svtpu.evaluation.common", "RBVAEBundle"),
        "SymbolStore": ("svtpu.data.symbols", "SymbolStore"),
    }
    if name in _api:
        import importlib

        mod, attr = _api[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'svtpu' has no attribute {name!r}")
