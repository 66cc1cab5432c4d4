"""Central runtime configuration.

The reference scatters configuration over CMake options, constructor kwargs
and ad-hoc env vars (reference CMakeLists.txt:1-11, onnx.py:41-48,
ffi_infinitensor.cc:448-451); here one typed registry backs both
programmatic overrides and `INFINITPU_*` environment variables, so every
knob is discoverable in one place (`config.snapshot()`).

Usage:
    from infinitensor_tpu.utils.config import config
    config.executable_cache_capacity          # typed read (env-aware)
    config.set(pallas_interpret=True)         # programmatic override
    with config.override(naive_allocator=True):
        ...
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
from typing import Any


@dataclasses.dataclass(frozen=True)
class _Knob:
    name: str
    env: str
    default: Any
    type: type
    doc: str


_KNOBS = [
    _Knob("pallas_interpret", "INFINITPU_PALLAS_INTERPRET", False, bool,
          "Run Pallas kernel bodies under the interpreter off-chip."),
    _Knob("executable_cache_capacity", "INFINITPU_EXEC_CACHE", 16, int,
          "LRU capacity of GraphExecutor's executable cache "
          "(reference CUDA-Graph capture cache capacity)."),
    _Knob("naive_allocator", "INFINITPU_NAIVE_ALLOC", False, bool,
          "Memory planner gives every activation its own region (no "
          "reuse) — the reference's allocator debug mode "
          "(graph.cc:371-380)."),
    _Knob("validate_memory", "INFINITPU_VALIDATE_MEMORY", False, bool,
          "Cross-check planned offsets against liveness after planning "
          "(reference validateMemory, graph.cc:605-622)."),
    _Knob("log_level", "INFINITPU_LOG", "WARNING", str,
          "Log level for infinitensor_tpu structured logs."),
    _Knob("seed", "INFINITPU_SEED", 0, int,
          "Default RNG seed for data generators / tuning sweeps."),
]


def _parse(knob: _Knob, raw: str):
    if knob.type is bool:
        return raw.strip().lower() not in ("", "0", "false", "no", "off")
    return knob.type(raw)


class Config:
    def __init__(self):
        self._knobs = {k.name: k for k in _KNOBS}
        self._overrides: dict[str, Any] = {}

    def __getattr__(self, name: str):
        knobs = object.__getattribute__(self, "_knobs")
        if name not in knobs:
            raise AttributeError(name)
        overrides = object.__getattribute__(self, "_overrides")
        if name in overrides:
            return overrides[name]
        knob = knobs[name]
        raw = os.environ.get(knob.env)
        return knob.default if raw is None else _parse(knob, raw)

    # knobs read inside jit-traced code: changing one must invalidate
    # JAX's trace caches, or an executable compiled under the old value
    # keeps running (e.g. the jnp oracle instead of the Pallas kernel
    # body after toggling pallas_interpret)
    _TRACED_KNOBS = frozenset({"pallas_interpret"})

    def _invalidate_if_traced(self, names) -> None:
        if any(n in self._TRACED_KNOBS for n in names):
            try:
                import jax
                jax.clear_caches()
            except Exception:    # noqa: BLE001 — jax not imported yet
                pass

    def set(self, **kw) -> None:
        changed = []
        for name, value in kw.items():
            if name not in self._knobs:
                raise KeyError(f"unknown config knob {name!r}; "
                               f"have {sorted(self._knobs)}")
            if getattr(self, name) != value:
                changed.append(name)
            self._overrides[name] = value
        self._invalidate_if_traced(changed)

    def unset(self, *names: str) -> None:
        changed = []
        for name in names:
            before = getattr(self, name)
            self._overrides.pop(name, None)
            if getattr(self, name) != before:
                changed.append(name)
        self._invalidate_if_traced(changed)

    @contextlib.contextmanager
    def override(self, **kw):
        prev = dict(self._overrides)
        try:
            self.set(**kw)
            yield self
        finally:
            before = {n: getattr(self, n) for n in self._TRACED_KNOBS}
            self._overrides = prev
            self._invalidate_if_traced(
                n for n in self._TRACED_KNOBS if getattr(self, n)
                != before[n])

    def snapshot(self) -> dict:
        """Every knob with its effective value + provenance."""
        out = {}
        for name, knob in self._knobs.items():
            src = ("override" if name in self._overrides
                   else "env" if knob.env in os.environ else "default")
            out[name] = {"value": getattr(self, name), "source": src,
                         "env": knob.env, "doc": knob.doc}
        return out


config = Config()
