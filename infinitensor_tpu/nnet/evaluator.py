"""Expression evaluator: comprehension -> jax.numpy computation.

Plays both reference roles at once:
* the NNET ``Interpreter`` (reference src/nnet/Visitor/Interpreter.*) — the
  numeric oracle used to validate derivations;
* the MemBound kernel backend — the reference JIT-compiles unmatched
  expression residue via TVM (src/kernels/cuda/membound_tvm_packed_function
  .cc); here the same evaluation *is* a jax trace, so XLA compiles and fuses
  it with no extra machinery.

Strategy: loop/sum variables become broadcasted index grids; tensor accesses
become (possibly padded) advanced indexing; the whole computation is
vectorized — no per-element Python.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from infinitensor_tpu.nnet.expr import (
    Access, BinOp, Comprehension, Const, Expr, Func, TensorRef, Var,
)

_FUNCS = {
    "relu": lambda x: jnp.maximum(x, 0),
    "tanh": jnp.tanh,
    "exp": jnp.exp,
    "sigmoid": lambda x: 1.0 / (1.0 + jnp.exp(-x)),
}


def evaluate(comp: Comprehension, feeds: dict) -> jnp.ndarray:
    """feeds: {tensor_name: array}. Returns array of comp.shape."""
    all_vars = comp.loop_vars + comp.sum_vars
    n = len(all_vars)
    grids = {}
    for axis, (v, extent) in enumerate(all_vars):
        shape = [1] * n
        shape[axis] = extent
        grids[v.name] = jnp.arange(extent).reshape(shape)

    def ev(e: Expr):
        if isinstance(e, Const):
            return e.value
        if isinstance(e, Var):
            return grids[e.name]
        if isinstance(e, BinOp):
            l, r = ev(e.lhs), ev(e.rhs)
            return {"+": lambda: l + r, "-": lambda: l - r,
                    "*": lambda: l * r, "/": lambda: l / r,
                    "//": lambda: l // r, "%": lambda: l % r}[e.op]()
        if isinstance(e, Func):
            return _FUNCS[e.fn](ev(e.arg))
        if isinstance(e, Access):
            arr = jnp.asarray(feeds[e.tensor.name])
            idx = [ev(i) for i in e.indices]
            pads = e.tensor.paddings or (0,) * arr.ndim
            # out-of-range w/ paddings reads zero (reference RangeOp padding)
            valid = None
            clipped = []
            for d, (i, p) in enumerate(zip(idx, pads)):
                i = jnp.asarray(i)
                if p:
                    ok = (i >= 0) & (i < arr.shape[d])
                    valid = ok if valid is None else (valid & ok)
                    i = jnp.clip(i, 0, arr.shape[d] - 1)
                clipped.append(i)
            clipped = jnp.broadcast_arrays(*clipped) if len(clipped) > 1 \
                else clipped
            out = arr[tuple(clipped)]
            if valid is not None:
                out = jnp.where(valid, out, 0)
            return out
        raise TypeError(f"cannot evaluate {e!r}")

    val = ev(comp.body)
    val = jnp.asarray(val)
    # broadcast to the full grid then sum out the sum axes
    full_shape = tuple(ext for _, ext in all_vars)
    val = jnp.broadcast_to(val, np.broadcast_shapes(val.shape, full_shape))
    if comp.sum_vars:
        axes = tuple(range(len(comp.loop_vars), n))
        val = val.sum(axis=axes)
    return val


def evaluate_expr(comp: Comprehension, arrays: list) -> list:
    """MemBound-op lowering entry: positional inputs in comp.inputs() order."""
    names = [t.name for t in comp.inputs()]
    feeds = dict(zip(names, arrays))
    return [evaluate(comp, feeds)]


def evaluate_program(program, feeds: dict) -> jnp.ndarray:
    """Evaluate a multi-stage Program (nnet/rules.py) stage by stage; each
    stage's output becomes a feed for later stages. Returns the last stage's
    value (the reference evaluates nested RangeOps the same way)."""
    env = dict(feeds)
    val = None
    for stage in program.stages:
        val = evaluate(stage.comp, env)
        env[stage.name] = val
    return val
