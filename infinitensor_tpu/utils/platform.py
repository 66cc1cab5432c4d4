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


def pallas_interpret() -> bool:
    """True when Pallas kernel bodies should run under the Pallas
    interpreter (CPU CI): set INFINITPU_PALLAS_INTERPRET=1 (or
    config.set(pallas_interpret=True)). The value is read at TRACE time
    inside jitted callers, so config.set/override invalidate JAX's trace
    caches when it changes (utils/config.py _TRACED_KNOBS) — already-
    compiled callers re-trace under the new value. Every kernel also
    takes an explicit ``interpret=True`` kwarg — the analog of the
    reference's kernel-vs-oracle tests running without a GPU."""
    from infinitensor_tpu.utils.config import config

    return bool(config.pallas_interpret)


def use_pallas(interpret: bool = False) -> bool:
    """Gate for kernel dispatch: real chip, explicit interpret request, or
    the env toggle."""
    return bool(interpret) or is_tpu() or pallas_interpret()
