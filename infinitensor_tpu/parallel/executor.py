"""Sharded graph executor: runs a TPPlan under shard_map on a mesh.

Replaces the reference's per-rank launcher processes (reference
examples/distributed/cuda/cuda_launch.py:79-157: mp.Process per GPU +
NCCL init_comm + per-rank OnnxStub) with one SPMD program: shard_map over
the mesh's tp axis, comm ops lowering to lax collectives over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from infinitensor_tpu.utils.platform import is_tpu

from infinitensor_tpu.core.tensor import TensorRole
from infinitensor_tpu.ops.lowering import LowerCtx, lower_op
from infinitensor_tpu.parallel.planner import TPPlan


class TPExecutor:
    def __init__(self, plan: TPPlan, mesh: Optional[Mesh] = None):
        self.plan = plan
        g = plan.graph
        g.require_sorted()
        if mesh is None:
            from infinitensor_tpu.parallel.mesh import make_mesh
            mesh = make_mesh({plan.axis_name: plan.tp})
        self.mesh = mesh
        self.ctx = LowerCtx(use_pallas=is_tpu(),
                            axis_name=plan.axis_name, world_size=plan.tp)
        self._inputs = g.inputs()
        self._outputs = g.outputs()
        self._weights = {t.name: t for t in g.weights()}
        self._fn = None
        self._weight_vals = None

    def _prepare_weights(self):
        if self._weight_vals is not None:
            return self._weight_vals
        vals = {}
        for name, t in self._weights.items():
            arr = t.numpy()
            if arr.dtype == np.float64:
                arr = arr.astype(np.float32)
            vals[name] = jnp.asarray(
                self.plan.stacked_weight(name, np.asarray(arr)),
                dtype=t.dtype.jnp())
        self._weight_vals = vals
        return vals

    def _local_eval(self, input_vals: dict, weight_vals: dict) -> dict:
        env = {}
        for t in self._inputs:
            env[t.guid] = input_vals[t.name]
        for name, t in self._weights.items():
            w = weight_vals[name]
            if self.plan.weight_layout.get(name) == "stacked":
                w = w[0]  # shard_map block [1, *local] -> local
            env[t.guid] = w
        for t in self.plan.graph.tensors:
            if t.guid not in env and t.has_data() and t.source is None:
                env[t.guid] = jnp.asarray(t.numpy(), dtype=t.dtype.jnp())
        for op in self.plan.graph.operators:
            ins = [env[t.guid] if t is not None else None for t in op.inputs]
            outs = lower_op(op, ins, self.ctx)
            for t, v in zip(op.outputs, outs):
                env[t.guid] = v
        return {t.name: env[t.guid] for t in self._outputs}

    def _build(self):
        if self._fn is not None:
            return self._fn
        ax = self.plan.axis_name
        in_specs_w = {
            name: P(ax) if self.plan.weight_layout.get(name) == "stacked"
            else P()
            for name in self._weights
        }
        def input_spec(t):
            dim = self.plan.input_placements.get(t.name)
            if dim is None:
                return P()
            entry = [None] * t.rank
            entry[dim] = ax
            return P(*entry)

        in_specs = ({t.name: input_spec(t) for t in self._inputs},
                    in_specs_w)
        out_specs = {t.name: P() for t in self._outputs}

        fn = jax.shard_map(self._local_eval, mesh=self.mesh,
                           in_specs=in_specs, out_specs=out_specs,
                           check_vma=False)
        self._fn = jax.jit(fn)
        return self._fn

    def run(self, inputs: Optional[dict] = None, return_numpy: bool = False
            ) -> dict:
        inputs = dict(inputs or {})
        for t in self._inputs:
            if t.name not in inputs:
                raise ValueError(f"missing graph input {t.name!r}")
            inputs[t.name] = jnp.asarray(inputs[t.name],
                                         dtype=t.dtype.jnp())
        out = self._build()(inputs, self._prepare_weights())
        if return_numpy:
            return {k: np.asarray(v) for k, v in out.items()}
        return out
