"""Device mesh construction.

The analog of the reference's communicator bootstrap (initComm + id-file
rendezvous, reference include/cuda/nccl_communicator.h:27-51) — on TPU the
runtime already knows the slice topology; multi-host setup is
``jax.distributed.initialize`` (Runtime.init_comm) and a mesh is just a named
view over ``jax.devices()``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(axes: dict[str, int], devices: Optional[Sequence] = None) -> Mesh:
    """Mesh from {axis_name: size}; sizes must multiply to #devices
    (a trailing -1 axis absorbs the remainder)."""
    devices = list(devices if devices is not None else jax.devices())
    names = list(axes)
    sizes = [axes[n] for n in names]
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total != len(devices):
        raise ValueError(
            f"mesh {dict(zip(names, sizes))} needs {total} devices, "
            f"have {len(devices)}")
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, tuple(names))


def local_mesh(tp: Optional[int] = None, dp: int = 1) -> Mesh:
    """Default serving mesh: data-parallel outer, tensor-parallel inner
    (tp rides ICI; dp may ride DCN on multi-host)."""
    n = len(jax.devices())
    tp = tp or (n // dp)
    return make_mesh({"dp": dp, "tp": tp})
