"""Test-local alias for the genuine-reference import helpers.

See svtpu/utils/reference.py — the single home of the torchvision stub,
the by-path module loader, and the U=0.5 determinism patch.
"""
from svtpu.utils.reference import (  # noqa: F401
    REF_MODELS, VARIANTS, det_rand, load_reference_model_module,
    stub_torchvision)
