"""ctypes bindings for the native memory planner (native/allocator.cc).

The C++ planner mirrors the reference's LazyAllocator + dataMalloc simulation
(reference src/core/lazy_allocator.cc, src/core/graph.cc:341-560). Built on
demand with g++ (no pybind11 in this environment); the .so is cached next to
the sources and rebuilt when allocator.cc changes.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "allocator.cc")
_LIB: Optional[ctypes.CDLL] = None
_LIB_ERR: Optional[str] = None


def _build_lib() -> Optional[str]:
    if not os.path.exists(_SRC):
        return None
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(os.path.dirname(_SRC), f"liballocator-{digest}.so")
    if os.path.exists(out):
        return out
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", out]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_ERR
    if _LIB is not None or _LIB_ERR is not None:
        return _LIB
    try:
        path = _build_lib()
        if path is None:
            _LIB_ERR = "source missing"
            return None
        lib = ctypes.CDLL(path)
        lib.planner_create.restype = ctypes.c_int64
        for fn in ("planner_alloc", "planner_alloc_weight", "planner_peak",
                   "planner_used", "planner_arena_size",
                   "planner_weight_size", "planner_free_block_count"):
            getattr(lib, fn).restype = ctypes.c_int64
        lib.planner_alloc.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.planner_alloc_weight.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.planner_free.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.plan_graph_memory.restype = ctypes.c_int
        _LIB = lib
    except Exception as e:  # pragma: no cover
        _LIB_ERR = str(e)
    return _LIB


def native_available() -> bool:
    return _lib() is not None


class MemoryPlanner:
    """Best-fit offset-simulation allocator (native)."""

    def __init__(self):
        lib = _lib()
        if lib is None:
            raise RuntimeError(f"native planner unavailable: {_LIB_ERR}")
        self._lib = lib
        self._id = lib.planner_create()

    def __del__(self):
        try:
            self._lib.planner_destroy(ctypes.c_int64(self._id))
        except Exception:
            pass

    def alloc(self, size: int) -> int:
        return self._lib.planner_alloc(self._id, size)

    def free(self, addr: int) -> None:
        self._lib.planner_free(self._id, addr)

    def alloc_weight(self, size: int) -> int:
        return self._lib.planner_alloc_weight(self._id, size)

    @property
    def peak(self) -> int:
        return self._lib.planner_peak(self._id)

    @property
    def used(self) -> int:
        return self._lib.planner_used(self._id)

    @property
    def arena_size(self) -> int:
        return self._lib.planner_arena_size(self._id)

    @property
    def free_block_count(self) -> int:
        return self._lib.planner_free_block_count(self._id)


def plan_graph_memory(graph) -> dict:
    """Plan activation memory for a Graph; returns offsets + stats
    (engine-level peak-memory report, reference LazyAllocator::info)."""
    from infinitensor_tpu.core.tensor import TensorRole

    graph.require_sorted()
    tensors = list(graph.tensors)
    tidx = {t.guid: i for i, t in enumerate(tensors)}
    sizes = np.asarray([t.bytes() for t in tensors], np.int64)
    kind_map = {TensorRole.OTHERS: 0, TensorRole.WEIGHT: 1,
                TensorRole.INPUT: 2, TensorRole.OUTPUT: 3}
    kinds = np.asarray([kind_map[t.role] for t in tensors], np.int32)

    in_ptr, in_idx, out_ptr, out_idx = [0], [], [0], []
    for op in graph.operators:
        for t in op.present_inputs():
            in_idx.append(tidx[t.guid])
        in_ptr.append(len(in_idx))
        for t in op.outputs:
            out_idx.append(tidx[t.guid])
        out_ptr.append(len(out_idx))

    lib = _lib()
    if lib is None:
        raise RuntimeError(f"native planner unavailable: {_LIB_ERR}")
    offsets = np.zeros(len(tensors), np.int64)
    stats = np.zeros(3, np.int64)

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    in_ptr = np.asarray(in_ptr, np.int64)
    in_idx = np.asarray(in_idx, np.int64)
    out_ptr = np.asarray(out_ptr, np.int64)
    out_idx = np.asarray(out_idx, np.int64)
    rc = lib.plan_graph_memory(
        ctypes.c_int64(len(tensors)), p64(sizes),
        kinds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(graph.operators)),
        p64(in_ptr), p64(in_idx), p64(out_ptr), p64(out_idx),
        p64(offsets), p64(stats))
    if rc != 0:
        raise RuntimeError("plan_graph_memory failed")
    return {
        "offsets": {t.name: int(o) for t, o in zip(tensors, offsets)
                    if o >= 0},
        "peak_bytes": int(stats[0]),
        "arena_bytes": int(stats[1]),
        "weight_bytes": int(stats[2]),
    }
