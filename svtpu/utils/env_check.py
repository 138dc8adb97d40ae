"""Environment sanity check (reference ``scripts/version_check.ipynb``
role): versions, devices, native library, and a tiny device smoke test."""
from __future__ import annotations

import json


def environment_report() -> dict:
    report = {}
    import jax

    report["jax"] = jax.__version__
    report["backend"] = jax.default_backend()
    report["devices"] = [str(d) for d in jax.devices()]
    for mod in ("flax", "optax", "orbax.checkpoint", "numpy", "PIL", "cv2",
                "sklearn", "matplotlib", "tensorboardX", "torch"):
        try:
            m = __import__(mod)
            report[mod] = getattr(m, "__version__", "present")
        except ImportError:
            report[mod] = None
    try:
        from svtpu.data import native

        report["libsvtpu_io"] = native.available()
    except Exception:
        report["libsvtpu_io"] = False

    # Tiny device smoke test.
    try:
        import jax.numpy as jnp
        import numpy as np

        x = jnp.ones((8, 8))
        report["device_smoke_test"] = float(np.asarray(jnp.sum(x))) == 64.0
    except Exception as e:
        report["device_smoke_test"] = f"failed: {e}"
    return report


if __name__ == "__main__":
    print(json.dumps(environment_report(), indent=2))
