"""Platform detection.

TPU backends do not always present as platform "tpu": experimental PJRT
plugins (e.g. the axon tunnel used in this container) register under their
own name while still driving a real TPU and supporting Mosaic/Pallas. Detect
by device kind, not platform string.
"""

from __future__ import annotations

import functools

import jax


@functools.cache
def is_tpu() -> bool:
    import os

    if os.environ.get("INFINITPU_FORCE_JNP"):
        return False  # debugging/compile-time escape hatch: skip Pallas paths
    try:
        d = jax.devices()[0]
    except Exception:
        return False
    if d.platform == "tpu":
        return True
    return "tpu" in getattr(d, "device_kind", "").lower()
