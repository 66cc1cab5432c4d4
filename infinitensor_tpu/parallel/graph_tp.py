"""Tensor parallelism over the GRAPH IR — parallel_opt.py, TPU-native.

The reference applies TP to the *user's imported model*: per-rank ONNX
surgery propagates placements node-by-node, shards Gemm/MatMul weights
column-then-row (Megatron), and inserts AllReduce after partial outputs
(reference examples/distributed/parallel_opt.py:9-247); a launcher then
runs each rank's graph through the engine
(examples/distributed/cuda/cuda_launch.py:79-157).

This module is the same transform over this framework's graph IR, built
TPU-first:

* ``tp_shard_graph`` walks a Graph in topo order with a DTensor-style
  placement environment (parallel/placement.py — the lattice the reference
  mirrors) and emits ONE rank-local graph: sharded dims divided by tp,
  Reshape/Split shape constants rewritten (parallel_opt.py:81-136's
  equivalent), fused-QKV/gate-up column shards split SEGMENT-wise so heads
  stay rank-local (the reference's `groups` handling, :188-193), and
  AllReduceSum/AllGather inserted as first-class graph comm ops.
* Weight values become stacked [tp, ...] host arrays. Packed-int4
  MatMulWOQ row shards are re-packed bit-exactly (quant/weight_only.py
  repack_int4_rows) — quantization groups run along the contraction dim,
  so a group-aligned shard of the quantized tensor IS the quantized shard.
* ``TPGraphExecutor`` runs the local graph under ``shard_map`` on a jax
  Mesh: each chip executes its shard's Pallas quant kernels (opaque to
  GSPMD — the reason this path exists; see parallel/tp_decode.py) and the
  graph's comm ops lower to lax.psum / all_gather on the mesh axis
  (ops/lowering.py collectives), riding ICI.

Per decode token the emitted collective set is exactly Megatron's:
2 psum per layer (row-parallel wo / w_down) + 1 lm_head all-gather —
asserted on the compiled HLO by tests/test_graph_tp.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import numpy as np

from infinitensor_tpu.core import dtype as dt
from infinitensor_tpu.core.graph import Graph
from infinitensor_tpu.core.handler import GraphHandler
from infinitensor_tpu.core.tensor import TensorObj, TensorRole
from infinitensor_tpu.parallel.placement import Placement, Replicate, Shard
from infinitensor_tpu.utils.platform import is_tpu

_R = Replicate()


def _norm(d: int, rank: int) -> int:
    return d % rank


@dataclasses.dataclass
class TPShardedGraph:
    """Result of tp_shard_graph: a rank-local graph + everything needed to
    run it under shard_map."""

    graph: Graph
    tp: int
    axis_name: str
    input_place: dict       # new input name -> Placement (global tensors)
    output_place: dict      # new output name -> Placement
    name_map: dict          # old boundary tensor name -> new name
    plans: dict             # new weight name -> shard plan tuple
    weight_values: dict     # new weight name -> host value (stacked if sharded)

    def stacked(self, name: str) -> bool:
        return self.plans[name][0] != "rep"

    def apply_plan(self, name: str, value) -> Any:
        """Shard a GLOBAL weight value per this graph's plan for `name`
        (the bind path for external-weights graphs)."""
        return _apply_plan(self.plans[name], np.asarray(value), self.tp)


def _apply_plan(plan: tuple, val: np.ndarray, tp: int):
    kind = plan[0]
    if kind == "rep":
        return val
    if kind == "col":
        # segment-wise column shard: each segment's columns split into tp
        # contiguous blocks; rank r keeps the concat of its blocks.
        segments = plan[1]
        shards = []
        offs = np.cumsum([0] + list(segments))
        for r in range(tp):
            parts = []
            for s0, seg in zip(offs[:-1], segments):
                n = seg // tp
                parts.append(val[..., s0 + r * n:s0 + (r + 1) * n])
            shards.append(np.concatenate(parts, axis=-1)
                          if len(parts) > 1 else parts[0])
        return np.stack(shards)
    if kind == "row":
        # plain row shard along `axis` (float weights / int8 qweight /
        # scale groups — all slice exactly)
        axis = plan[1]
        n = val.shape[axis] // tp
        return np.stack([np.take(val, range(r * n, (r + 1) * n), axis=axis)
                         for r in range(tp)])
    if kind == "row_q4":
        # packed int4 qweight: bit-exact unpack/slice/repack per rank
        from infinitensor_tpu.quant.weight_only import repack_int4_rows
        din = val.shape[0] * 2
        n = din // tp
        return np.stack([repack_int4_rows(val, r * n, n)
                         for r in range(tp)])
    raise ValueError(f"unknown shard plan {plan}")


class _Transform:
    def __init__(self, graph: Graph, tp: int, axis_name: str,
                 keep_replicated: Optional[set] = None):
        graph.require_sorted()
        self.old = graph
        self.tp = tp
        self.axis_name = axis_name
        self.keep_replicated = keep_replicated or set()
        self.h = GraphHandler(name=f"{graph.name}_tp{tp}")
        self.env: dict[int, TensorObj] = {}       # old guid -> new tensor
        self.place: dict[int, Placement] = {}     # old guid -> placement
        self.plans: dict[str, tuple] = {}
        self.weight_values: dict[str, Any] = {}
        self.input_place: dict[str, Placement] = {}
        self.name_map: dict[str, str] = {}

    # -- boundary tensor materialization (lazy: placement is known only
    # at the first consumer, e.g. KV-cache inputs shard heads only when
    # the attention they feed is sharded) --------------------------------
    def _local_shape(self, shape, p: Placement):
        if p.is_replicate():
            return tuple(shape)
        d = _norm(p.dim, len(shape))
        assert shape[d] % self.tp == 0, \
            f"dim {d} of {shape} not divisible by tp={self.tp}"
        s = list(shape)
        s[d] //= self.tp
        return tuple(s)

    def get(self, t: TensorObj, want: Optional[Placement] = None):
        """New-graph tensor for old tensor `t`. For graph inputs not yet
        materialized, `want` fixes the placement (default Replicate)."""
        if t.guid in self.env:
            if want is not None and self.place[t.guid] != want:
                raise ValueError(
                    f"tensor {t.name} consumed with conflicting placements "
                    f"{self.place[t.guid]} vs {want}")
            return self.env[t.guid]
        if t.role == TensorRole.INPUT:
            p = want or _R
            nt = self.h.input(self._local_shape(t.shape, p), t.dtype,
                              name=t.name)
            self.env[t.guid] = nt
            self.place[t.guid] = p
            self.input_place[t.name] = p
            self.name_map[t.name] = nt.name
            return nt
        if t.role == TensorRole.WEIGHT:
            # weights default to replicated when pulled generically
            return self.emit_weight(t, ("rep",))
        if t.has_data() and t.source is None:
            # constant: replicate
            nt = self.h.tensor(t.shape, t.dtype, role=TensorRole.OTHERS)
            nt.set_data(t.numpy())
            self.env[t.guid] = nt
            self.place[t.guid] = _R
            return nt
        raise KeyError(f"tensor {t.name} not yet produced (graph unsorted?)")

    def emit_weight(self, t: TensorObj, plan: tuple) -> TensorObj:
        if t.guid in self.env:
            return self.env[t.guid]
        if plan[0] == "rep":
            shape = tuple(t.shape)
        elif plan[0] == "col":
            shape = tuple(list(t.shape[:-1]) +
                          [sum(s // self.tp for s in plan[1])])
        elif plan[0] in ("row", "row_q4"):
            axis = plan[1] if plan[0] == "row" else 0
            s = list(t.shape)
            s[axis] //= self.tp
            shape = tuple(s)
        else:
            raise ValueError(plan)
        nt = self.h.weight_placeholder(shape, t.dtype, name=t.name)
        self.env[t.guid] = nt
        self.place[t.guid] = _R   # weights are never activations
        self.plans[nt.name] = plan
        self.name_map[t.name] = nt.name
        if t.has_data():
            self.weight_values[nt.name] = _apply_plan(plan, t.numpy(),
                                                      self.tp)
        return nt

    # -- placement helpers ----------------------------------------------
    def p_of(self, t: TensorObj) -> Placement:
        self.get(t)
        return self.place[t.guid]

    def put(self, old_outs, new_outs, places):
        if not isinstance(new_outs, (list, tuple)):
            new_outs = [new_outs]
        if not isinstance(places, (list, tuple)):
            places = [places] * len(new_outs)
        for ot, nt, p in zip(old_outs, new_outs, places):
            self.env[ot.guid] = nt
            self.place[ot.guid] = p
            self.name_map[ot.name] = nt.name

    # -- op handlers -----------------------------------------------------
    def run(self) -> TPShardedGraph:
        for op in self.old.operators:
            fn = getattr(self, f"_op_{op.op_type.lower()}", None)
            if fn is not None:
                fn(op)
            else:
                self._op_generic(op)
        # boundary: gather sharded user-facing outputs back to global
        out_place: dict[str, Placement] = {}
        for t in self.old.outputs():
            nt = self.env[t.guid]
            p = self.place[t.guid]
            if p.is_shard() and t.name not in self.keep_replicated \
                    and not self._is_state_output(t):
                d = _norm(p.dim, len(t.shape))
                parts = self.h.all_gather(nt, world_size=self.tp)
                nt = self.h.concat(parts, axis=d)
                p = _R
                self.name_map[t.name] = nt.name
            out_place[nt.name] = p
        self.h.graph.infer_output_roles()
        return TPShardedGraph(self.h.graph, self.tp, self.axis_name,
                              dict(self.input_place), out_place,
                              dict(self.name_map), dict(self.plans),
                              dict(self.weight_values))

    def _is_state_output(self, t: TensorObj) -> bool:
        """KV-cache state outputs stay sharded (they feed back as sharded
        inputs next step): any output produced by a cache-mutating op slot."""
        src = t.source
        if src is None:
            return False
        if src.op_type in ("AttentionKVCache", "AttentionKVCacheQ8"):
            # outputs[1:] are the cache (+scale) planes
            return any(o is t for o in src.outputs[1:])
        return False

    def _op_generic(self, op):
        """Ops with no special handling: legal when every input is
        replicated (the reference's default is the same — untouched nodes
        keep replicated placements)."""
        ins = []
        for t in op.inputs:
            if t is None:
                ins.append(None)
                continue
            p = self.p_of(t)
            if not p.is_replicate():
                raise NotImplementedError(
                    f"graph TP: op {op.op_type} ({op.name}) consumes "
                    f"sharded tensor {t.name} ({p}) but has no TP rule")
            ins.append(self.get(t))
        new = self.h._add(op.op_type, ins, dict(op.attrs),
                          n_outputs=len(op.outputs))
        self.put(op.outputs, new, _R)

    # elementwise: propagate a common placement
    def _op_elementwise(self, op):
        places = [self.p_of(t) for t in op.inputs if t is not None]
        p0 = places[0]
        if any(p != p0 for p in places):
            raise NotImplementedError(
                f"graph TP: {op.op_type} inputs disagree on placement "
                f"{places}")
        ins = [self.get(t) if t is not None else None for t in op.inputs]
        new = self.h._add(op.op_type, ins, dict(op.attrs),
                          n_outputs=len(op.outputs))
        self.put(op.outputs, new, p0)

    _op_add = _op_elementwise
    _op_sub = _op_elementwise
    _op_mul = _op_elementwise
    _op_div = _op_elementwise
    _op_sigmoid = _op_elementwise
    _op_silu = _op_elementwise
    _op_gelu = _op_elementwise
    _op_relu = _op_elementwise
    _op_tanh = _op_elementwise
    _op_cast = _op_elementwise
    _op_identity = _op_elementwise

    def _op_reshape(self, op):
        x = op.inputs[0]
        p = self.p_of(x)
        target = list(op.attrs["shape"])
        if p.is_replicate():
            self._op_generic(op)
            return
        if any(d in (-1, 0) for d in target):
            raise NotImplementedError(
                "graph TP: sharded Reshape with inferred dims")
        d = _norm(p.dim, len(x.shape))
        pre_in = int(np.prod(x.shape[:d])) if d else 1
        # candidate output dims starting at the same flat offset as the
        # sharded input dim; size-1 dims create ties, so pick the first
        # candidate the shard can actually divide
        cands = []
        acc = 1
        for i, dim in enumerate(target):
            if acc == pre_in:
                cands.append(i)
            acc *= dim
        o = next((i for i in cands if target[i] % self.tp == 0), None)
        if o is None:
            raise NotImplementedError(
                f"graph TP: cannot move Shard({d}) of {tuple(x.shape)} "
                f"through Reshape to {target}")
        local = list(target)
        local[o] //= self.tp
        new = self.h.reshape(self.get(x), local)
        self.put(op.outputs, new, Shard(o))

    def _op_transpose(self, op):
        x = op.inputs[0]
        p = self.p_of(x)
        perm = op.attrs.get("perm") or list(reversed(range(len(x.shape))))
        new = self.h.transpose(self.get(x), perm)
        if p.is_replicate():
            self.put(op.outputs, new, _R)
        else:
            d = _norm(p.dim, len(x.shape))
            self.put(op.outputs, new, Shard(perm.index(d)))

    def _op_split(self, op):
        x = op.inputs[0]
        p = self.p_of(x)
        axis = _norm(op.attrs["axis"], len(x.shape))
        sizes = op.attrs.get("split")
        if p.is_replicate() or _norm(p.dim, len(x.shape)) != axis:
            self._op_generic(op)
            return
        if sizes is None:
            sizes = [x.shape[axis] // len(op.outputs)] * len(op.outputs)
        assert all(s % self.tp == 0 for s in sizes), \
            f"split sizes {sizes} not divisible by tp (parallel_opt.py:81-136)"
        new = self.h.split(self.get(x), axis, [s // self.tp for s in sizes])
        self.put(op.outputs, new, [p] * len(op.outputs))

    def _op_rope(self, op):
        pos, x = op.inputs[0], op.inputs[1]
        px = self.p_of(x)
        if not px.is_replicate():
            d = _norm(px.dim, len(x.shape))
            assert d == len(x.shape) - 1, "RoPE shard must be the last dim"
            local = x.shape[d] // self.tp
            assert local % int(op.attrs.get("dim_head", 64)) == 0, \
                "TP shard must keep whole heads rank-local"
        new = self.h._add("RoPE", [self.get(pos, _R), self.get(x)],
                          dict(op.attrs))
        self.put(op.outputs, new, px)

    def _op_rmsnorm(self, op):
        x = op.inputs[0]
        if not self.p_of(x).is_replicate():
            raise NotImplementedError(
                "graph TP: RMSNorm over a sharded hidden dim (insert the "
                "psum before the norm — Megatron keeps norms replicated)")
        self._op_generic(op)

    _op_layernormalization = _op_rmsnorm
    _op_softmax = _op_rmsnorm

    def _op_gather(self, op):
        data, idx = op.inputs[0], op.inputs[1]
        ins = [self.get(data, _R) if data.role != TensorRole.WEIGHT
               else self.emit_weight(data, ("rep",)),
               self.get(idx, _R)]
        new = self.h._add("Gather", ins, dict(op.attrs))
        self.put(op.outputs, new, _R)

    # -- the Megatron decisions -----------------------------------------
    def _consumer_segments(self, out_t: TensorObj):
        """Column-shard segments: when the matmul output's only consumer is
        a Split along the output dim, each split segment shards
        independently so head groups stay rank-local (the reference's
        `groups`-aware sharding, parallel_opt.py:188-193)."""
        if len(out_t.targets) == 1 and out_t.targets[0].op_type == "Split":
            sp = out_t.targets[0]
            axis = _norm(sp.attrs["axis"], len(out_t.shape))
            if axis == len(out_t.shape) - 1:
                sizes = sp.attrs.get("split")
                if sizes is None:
                    n = len(sp.outputs)
                    sizes = [out_t.shape[axis] // n] * n
                return list(sizes)
        return [out_t.shape[-1]]

    def _op_matmulwoq(self, op):
        x, qw, sc = op.inputs[0], op.inputs[1], op.inputs[2]
        nw = op.inputs[3] if len(op.inputs) > 3 else None
        a = op.attrs
        bits, g = int(a["bits"]), int(a["group_size"])
        px = self.p_of(x)
        din = x.shape[-1]
        out_t = op.outputs[0]

        if px.is_replicate():
            segments = self._consumer_segments(out_t)
            sharded = (int(a.get("out_logical", 0)) == 0
                       and all(s % self.tp == 0 for s in segments)
                       and qw.name not in self.keep_replicated)
            if not sharded:
                self._emit_woq(op, x, qw, sc, nw, ("rep",), ("rep",), _R)
                return
            plan = ("col", tuple(segments))
            self._emit_woq(op, x, qw, sc, nw, plan, plan,
                           Shard(len(out_t.shape) - 1))
            return

        d = _norm(px.dim, len(x.shape))
        assert d == len(x.shape) - 1, \
            "matmul input sharded on a non-contraction dim"
        assert nw is None, \
            "fused RMSNorm needs the full hidden dim: row-parallel matmuls " \
            "cannot carry a fused norm (build the graph with the norm on " \
            "the column-parallel side, as graph_llama does)"
        local_rows = din // self.tp
        stored = local_rows // 2 if bits == 4 else local_rows
        assert stored % g == 0, \
            f"group_size {g} must divide the row shard ({stored} stored rows)"
        if bits == 4 and sc.shape[0] * g * 2 == din:
            # paired split-half scales (slab kernel): a contiguous row
            # shard mixes lo/hi rows of DIFFERENT paired groups, so the
            # scale rows of a shard are not a slice — re-quantize the
            # model without paired=True before applying row-parallel TP
            raise NotImplementedError(
                "row-parallel TP over PAIRED int4 scales is not "
                "supported; quantize without paired=True (or shard this "
                "matmul column-parallel)")
        qplan = ("row_q4",) if bits == 4 else ("row", 0)
        partial = self._emit_woq(op, x, qw, sc, nw, qplan, ("row", 0),
                                 None, defer_put=True)
        red = self.h.all_reduce_sum(partial)
        self.put(op.outputs, red, _R)

    def _emit_woq(self, op, x, qw, sc, nw, qplan, splan, out_place,
                  defer_put: bool = False):
        a = op.attrs
        ins = [self.get(x), self.emit_weight(qw, qplan),
               self.emit_weight(sc, splan)]
        if nw is not None:
            ins.append(self.emit_weight(nw, ("rep",)))
        attrs = dict(a)
        new = self.h._add("MatMulWOQ", ins, attrs)
        if defer_put:
            return new
        self.put(op.outputs, new, out_place)
        return new

    def _op_matmul(self, op):
        x, w = op.inputs[0], op.inputs[1]
        if w.role != TensorRole.WEIGHT or op.attrs.get("trans_a") \
                or op.attrs.get("trans_b"):
            self._op_elementwise_matmul(op)
            return
        px = self.p_of(x)
        out_t = op.outputs[0]
        if px.is_replicate():
            segments = self._consumer_segments(out_t)
            if all(s % self.tp == 0 for s in segments) \
                    and w.name not in self.keep_replicated:
                new = self.h.matmul(self.get(x),
                                    self.emit_weight(w, ("col",
                                                         tuple(segments))))
                self.put(op.outputs, new, Shard(len(out_t.shape) - 1))
            else:
                new = self.h.matmul(self.get(x),
                                    self.emit_weight(w, ("rep",)))
                self.put(op.outputs, new, _R)
            return
        d = _norm(px.dim, len(x.shape))
        assert d == len(x.shape) - 1, \
            "matmul input sharded on a non-contraction dim"
        partial = self.h.matmul(self.get(x), self.emit_weight(w, ("row", 0)))
        red = self.h.all_reduce_sum(partial)
        self.put(op.outputs, red, _R)

    def _op_elementwise_matmul(self, op):
        # activation x activation (or transposed) matmul: replicated only
        for t in op.inputs:
            if t is not None and not self.p_of(t).is_replicate():
                raise NotImplementedError(
                    "graph TP: dynamic matmul over sharded operands")
        self._op_generic(op)

    def _op_attentionkvcache(self, op):
        self._attention(op, q_idx=2, n_cache=2)

    def _op_attentionkvcacheq8(self, op):
        self._attention(op, q_idx=4, n_cache=4)

    def _attention(self, op, q_idx: int, n_cache: int):
        """caches [B, Hkv(, S, D)] + q/k/v [B, H, 1, D]: heads shard over
        tp when the projections were column-sharded; pos replicated."""
        q = op.inputs[q_idx]
        pq = self.p_of(q)
        if pq.is_replicate():
            cache_p: Placement = _R
        else:
            assert pq.is_shard() and _norm(pq.dim, len(q.shape)) == 1, \
                f"attention q sharded on {pq}, expected head dim"
            cache_p = Shard(1)
        ins = []
        for i, t in enumerate(op.inputs):
            if i < n_cache:                      # cache (+scale) inputs
                ins.append(self.get(t, cache_p))
            elif i == len(op.inputs) - 1:        # position id
                ins.append(self.get(t, _R))
            else:                                # q/k/v
                ins.append(self.get(t, cache_p if not pq.is_replicate()
                           else _R))
        if op.op_type == "AttentionKVCacheQ8":
            new = self.h.attention_kvcache_q8(*ins)
        else:
            new = self.h.attention_kvcache(
                *ins, functional_cache=len(op.outputs) >= 3)
        self.put(op.outputs, new, [cache_p] * len(op.outputs))


def tp_shard_graph(graph: Graph, tp: int, axis_name: str = "tp",
                   keep_replicated: Optional[set] = None) -> TPShardedGraph:
    """Megatron-TP transform of a user graph (see module docstring).
    keep_replicated: weight names to exclude from sharding."""
    if tp <= 1:
        raise ValueError("tp must be >= 2")
    return _Transform(graph, tp, axis_name, keep_replicated).run()


# ---------------------------------------------------------------------------
# shard_map execution
# ---------------------------------------------------------------------------


class TPGraphExecutor:
    """Run a TPShardedGraph under shard_map on `mesh`: the graph-IR analog
    of parallel/tp_decode.py's hand-written path. Inputs/outputs are GLOBAL
    arrays; weights are bound stacked (sharded) or plain (replicated)."""

    def __init__(self, sharded: TPShardedGraph, mesh,
                 weights: Optional[dict] = None):
        from infinitensor_tpu.ops.lowering import LowerCtx
        from infinitensor_tpu.runtime.executor import GraphExecutor

        self.sg = sharded
        self.mesh = mesh
        self.ex = GraphExecutor(
            sharded.graph,
            ctx=LowerCtx(use_pallas=is_tpu(), axis_name=sharded.axis_name,
                         world_size=sharded.tp))
        self._weights = dict(sharded.weight_values)
        if weights:
            self.bind(weights)
        self._jitted = {}
        self._placed = None

    def bind(self, global_weights: dict) -> None:
        """Bind GLOBAL weight values by ORIGINAL graph tensor name; each is
        sharded per its plan (external-weights graphs)."""
        for old_name, val in global_weights.items():
            new_name = self.sg.name_map.get(old_name, old_name)
            self._weights[new_name] = self.sg.apply_plan(new_name, val)
        self._placed = None

    def placed_weights(self) -> dict:
        """Weights committed to the mesh once (stacked shards P(tp),
        replicated plain) — host arrays passed per call would re-transfer
        every step."""
        if self._placed is None:
            import jax
            import jax.numpy as jnp
            from jax.sharding import NamedSharding, PartitionSpec as P
            ax = self.sg.axis_name
            self._placed = {
                n: jax.device_put(
                    jnp.asarray(v),
                    NamedSharding(self.mesh,
                                  P(ax) if self.sg.stacked(n) else P()))
                for n, v in self._weights.items()}
        return self._placed

    def _specs(self, input_names):
        from jax.sharding import PartitionSpec as P
        ax = self.sg.axis_name

        def pspec(p: Placement, rank: int):
            if p.is_replicate():
                return P()
            entry = [None] * rank
            entry[_norm(p.dim, rank)] = ax
            return P(*entry)

        g = self.sg.graph
        ispecs = {n: pspec(self.sg.input_place.get(n, _R),
                           len(g.tensor_by_name(n).shape))
                  for n in input_names}
        wspecs = {n: (P(ax,) if self.sg.stacked(n) else P())
                  for n in self._weights}
        ospecs = {n: pspec(p, len(g.tensor_by_name(n).shape))
                  for n, p in self.sg.output_place.items()}
        return ispecs, wspecs, ospecs

    def _fwd(self, inputs, weights):
        w = {k: (v[0] if self.sg.stacked(k) else v)
             for k, v in weights.items()}
        return self.ex._forward(inputs, w)

    def shard_mapped(self, input_names):
        """The shard_map-wrapped forward over (inputs dict, weights dict)."""
        from jax.experimental.shard_map import shard_map
        ispecs, wspecs, ospecs = self._specs(input_names)
        return shard_map(self._fwd, mesh=self.mesh,
                         in_specs=(ispecs, wspecs),
                         out_specs=ospecs, check_rep=False)

    def run(self, inputs: dict) -> dict:
        import jax
        import jax.numpy as jnp
        inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
        key = tuple(sorted((k, tuple(v.shape)) for k, v in inputs.items()))
        fn = self._jitted.get(key)
        if fn is None:
            fn = jax.jit(self.shard_mapped(sorted(inputs)))
            self._jitted[key] = fn
        return fn(inputs, self.placed_weights())

    def stepper(self, state_map_old: dict, init_state: Optional[dict] = None):
        """Stateful decode runner (GraphExecutor.stepper analog): state_map
        uses the ORIGINAL graph's tensor names; cache state stays SHARDED
        on device between steps and its buffers are donated."""
        return _TPStepper(self, state_map_old, init_state)


class _TPStepper:
    def __init__(self, tex: TPGraphExecutor, state_map_old: dict,
                 init_state: Optional[dict]):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.tex = tex
        sg = tex.sg
        # state inputs keep their (old == new) input names; outputs map
        # through name_map
        self.state_map = {k: sg.name_map[v] for k, v in state_map_old.items()}
        g = sg.graph
        by_name = {t.name: t for t in g.inputs()}
        ax = sg.axis_name
        self.state = {}
        for name in self.state_map:
            t = by_name[name]
            p = sg.input_place.get(name, _R)
            # global shape: un-divide the sharded dim
            shape = list(t.shape)
            spec = [None] * len(shape)
            if p.is_shard():
                d = _norm(p.dim, len(shape))
                shape[d] *= sg.tp
                spec[d] = ax
            init = None if init_state is None else init_state.get(name)
            val = jnp.zeros(tuple(shape), t.dtype.jnp()) if init is None \
                else jnp.asarray(init, t.dtype.jnp())
            self.state[name] = jax.device_put(
                val, NamedSharding(tex.mesh, P(*spec)))

        input_names = [t.name for t in g.inputs()]
        smfn = tex.shard_mapped(input_names)
        state_out = set(self.state_map.values())

        def fwd(inputs, weights, state):
            vals = dict(inputs)
            vals.update(state)
            out = smfn(vals, weights)
            new_state = {k: out[v] for k, v in self.state_map.items()}
            return {k: v for k, v in out.items()
                    if k not in state_out}, new_state

        self._fn = jax.jit(fwd, donate_argnums=(2,))

    def __call__(self, inputs: dict) -> dict:
        import jax.numpy as jnp
        inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
        out, self.state = self._fn(inputs, self.tex.placed_weights(),
                                   self.state)
        return out


# ---------------------------------------------------------------------------
# convenience: the flagship decoder through graph TP
# ---------------------------------------------------------------------------


def tp_shard_llama_decoder(dec, tp: int, axis_name: str = "tp"
                           ) -> TPShardedGraph:
    """Shard a models/graph_llama.py GraphLlamaDecoder's graph; KV-cache
    state outputs stay sharded automatically (head-dim TP)."""
    return tp_shard_graph(dec.graph, tp, axis_name=axis_name)
