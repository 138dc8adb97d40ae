"""Import helpers for the GENUINE reference code under /root/reference.

Used by parity tests and the baseline-measurement script so that every
fidelity/throughput claim is pinned to the actual reference classes, not
hand-written twins.

The reference RBVAE model files import ``torchvision.transforms`` at module
top (``contrastive_RBVAE_model.py:12`` and siblings) but never use it in
the model classes; :func:`stub_torchvision` makes them importable in this
torchvision-free environment. Modules load by file path
(``importlib.util.spec_from_file_location``) — no ``sys.path``
manipulation, so the untrusted vendored tree cannot shadow installed
packages.
"""
from __future__ import annotations

import contextlib
import importlib.util
import sys
import types
from pathlib import Path

REF_MODELS = Path("/root/reference/models")

VARIANTS = ("simple", "contrastive", "percep", "triplet")


def stub_torchvision() -> None:
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr


def load_reference_model_module(variant: str):
    """The genuine ``<variant>_RBVAE_model`` module, or None if absent."""
    assert variant in VARIANTS, variant
    stub_torchvision()
    name = f"{variant}_RBVAE_model"
    if name in sys.modules:
        return sys.modules[name]
    path = REF_MODELS / f"{variant}_RBVAE" / f"{name}.py"
    if not path.exists():
        return None
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@contextlib.contextmanager
def det_rand():
    """Patch ``torch.rand`` to return U = 0.5 so the reference's logistic
    noise ``log(U+eps) - log(1-U+eps)`` is exactly zero (deterministic
    forward for the simple/triplet variants, whose
    ``binary_concrete_logits`` has no ``noise_ratio``)."""
    import torch

    orig = torch.rand

    def rand05(*shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], (tuple, torch.Size)):
            shape = tuple(shape[0])
        kw.pop("generator", None)
        return torch.full(shape, 0.5, **kw)

    torch.rand = rand05
    try:
        yield
    finally:
        torch.rand = orig
