"""Tensor-parallel planner: graph IR -> shard_map-ready local graph.

Reimplements the reference's TP transform (reference examples/distributed/
parallel_opt.py:9-247) on our IR, TPU-style. The reference rewrites the ONNX
graph *per rank* (physically slicing each weight and inserting AllReduce
nodes); here the planner produces ONE local graph (shapes divided by tp) plus
a weight layout, and execution is a single ``shard_map`` program where the
inserted comm ops lower to XLA collectives over the mesh axis
(ops/lowering.py) — rank loops, id-file rendezvous, and per-rank model copies
all disappear.

Placement propagation (parallel_opt.py semantics):
* MatMul/Gemm with a weight operand: column-parallel Shard(-1) when the
  activation is replicated; row-parallel Shard(0) + Partial output when the
  activation is sharded on the contraction dim; AllReduceSum materializes
  Partial (parallel_opt.py:196-209). Final graph-output matmul stays
  replicated. Fused-QKV weights followed by Split shard per head group
  (groups handling, parallel_opt.py:188-193).
* Elementwise/activations propagate; 1-D bias on a sharded channel shards.
* Reshape/Split/Transpose/Concat rewrite shape attrs (parallel_opt.py:81-136).
* AttentionKVCache shards on the head dim.
* Any op without a rule gets replicated inputs (planner inserts AllGather),
  so the plan is always correct, just not always maximally parallel.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from infinitensor_tpu.core.graph import Graph
from infinitensor_tpu.core.operator import Operator, UNARY_OPS
from infinitensor_tpu.core.tensor import TensorObj, TensorRole
from infinitensor_tpu.parallel.placement import Replicate, Shard, Partial

_PASSTHRU = UNARY_OPS | {"Cast", "Softmax", "Identity", "Dropout", "Clip"}
_BINARY = {"Add", "Sub", "Mul", "Div", "Max", "Min", "Pow", "Where"}


@dataclasses.dataclass
class TPPlan:
    graph: Graph                       # local-shape graph with comm ops
    tp: int
    axis_name: str
    weight_layout: dict                # name -> ("replicated" | "stacked")
    sharded_weights: dict              # name -> shard info (dim, groups)
    input_placements: dict = dataclasses.field(default_factory=dict)
    # name -> shard dim (int) for graph inputs the planner sharded
    # (e.g. KV caches on the head dim); absent = replicated

    def local_weight(self, name: str, array: np.ndarray, rank: int
                     ) -> np.ndarray:
        """Materialize rank's weight shard (for per-rank execution/tests)."""
        info = self.sharded_weights.get(name)
        if info is None:
            return array
        dim, groups = info
        return _slice_grouped(array, dim, self.tp, rank, groups)

    def stacked_weight(self, name: str, array: np.ndarray) -> np.ndarray:
        """[tp, *local_shape] layout for shard_map feeding."""
        info = self.sharded_weights.get(name)
        if info is None:
            return array
        dim, groups = info
        return np.stack([_slice_grouped(array, dim, self.tp, r, groups)
                         for r in range(self.tp)])


def _slice_grouped(array: np.ndarray, dim: int, tp: int, rank: int,
                   groups: int) -> np.ndarray:
    """Grouped slicing (reference shard_tensor, parallel_opt.py:20-44):
    dim is split into `groups` blocks; each rank takes its 1/tp of every
    block (needed for fused-QKV weights followed by Split)."""
    dim = dim % array.ndim
    n = array.shape[dim]
    shape = list(array.shape)
    shape[dim:dim + 1] = [groups, n // groups]
    a = array.reshape(shape)
    seg = (n // groups) // tp
    a = np.take(a, range(rank * seg, (rank + 1) * seg), axis=dim + 1)
    shape = list(array.shape)
    shape[dim] //= tp
    return a.reshape(shape)


class TPPlanner:
    def __init__(self, graph: Graph, tp: int, axis_name: str = "tp"):
        graph.require_sorted()
        self.g = graph.clone()
        self.g.topo_sort()
        self.tp = tp
        self.axis = axis_name
        self.place: dict[int, object] = {}
        self.sharded_weights: dict[str, tuple] = {}
        self.out_names = [t.name for t in self.g.outputs()]

    # -- helpers -----------------------------------------------------------
    def P(self, t: TensorObj):
        return self.place.get(t.guid, Replicate())

    def set(self, t: TensorObj, p):
        self.place[t.guid] = p

    def _shard_dim_local(self, t: TensorObj, dim: int, groups: int = 1):
        """Mark tensor sharded: local shape divided on dim."""
        dim = dim % t.rank
        shape = list(t.shape)
        assert shape[dim] % self.tp == 0
        shape[dim] //= self.tp
        t.shape = tuple(shape)
        self.set(t, Shard(dim))
        if t.role == TensorRole.WEIGHT:
            self.sharded_weights[t.name] = (dim, groups)

    def _insert_after(self, producer_op: Operator, op_type: str,
                      tensor: TensorObj, attrs: dict) -> TensorObj:
        """Reroute consumers of `tensor` through a new op."""
        new_out = TensorObj(tensor.shape, tensor.dtype,
                            name=tensor.name + f"_{op_type.lower()}")
        self.g.add_tensor(new_out)
        # move consumers
        consumers = [t for t in tensor.targets]
        for c in consumers:
            c.inputs = [new_out if x is tensor else x for x in c.inputs]
            tensor.remove_target(c)
            new_out.add_target(c)
        if tensor.role == TensorRole.OUTPUT:
            new_out.role = TensorRole.OUTPUT
            new_out.name, tensor.name = tensor.name, tensor.name + "_local"
            tensor.role = TensorRole.OTHERS
        op = Operator(op_type, [tensor], [new_out], attrs)
        tensor.add_target(op)
        new_out.source = op
        self.g.operators.append(op)
        self.g._mutated()
        return new_out

    def _materialize(self, t: TensorObj) -> None:
        """Insert collectives so `t`'s consumers see a replicated value."""
        p = self.P(t)
        if isinstance(p, Partial):
            out = self._insert_after(t.source, "AllReduceSum", t,
                                     {"axis_name": self.axis})
            self.set(out, Replicate())
            self.set(t, Partial())
        elif isinstance(p, Shard):
            # AllGather returns world_size shards; Concat restores the dim
            shards = [TensorObj(t.shape, t.dtype, name=f"{t.name}_ag{i}")
                      for i in range(self.tp)]
            for s in shards:
                self.g.add_tensor(s)
            consumers = list(t.targets)
            ag = Operator("AllGather", [t], shards,
                          {"world_size": self.tp, "axis_name": self.axis})
            t.add_target(ag)
            for s in shards:
                s.source = ag
            self.g.operators.append(ag)
            full_shape = list(t.shape)
            full_shape[p.dim] *= self.tp
            full = TensorObj(tuple(full_shape), t.dtype, name=t.name + "_full")
            self.g.add_tensor(full)
            cc = Operator("Concat", shards, [full], {"axis": p.dim})
            for s in shards:
                s.add_target(cc)
            full.source = cc
            self.g.operators.append(cc)
            for c in consumers:
                c.inputs = [full if x is t else x for x in c.inputs]
                t.remove_target(c)
                full.add_target(c)
            if t.role == TensorRole.OUTPUT:
                full.role = TensorRole.OUTPUT
                full.name, t.name = t.name, t.name + "_local"
                t.role = TensorRole.OTHERS
            self.set(full, Replicate())
            self.g._mutated()

    # -- op rules ----------------------------------------------------------
    def _find_split_successor(self, op: Operator, limit: int = 2
                              ) -> Optional[Operator]:
        idx = self.g.operators.index(op)
        for nxt in self.g.operators[idx + 1: idx + 1 + limit]:
            if nxt.op_type == "Split":
                return nxt
        return None

    def _plan_matmul_weight(self, op: Operator) -> None:
        a, w = op.inputs[0], op.inputs[1]
        trans_b = bool(op.attrs.get("transB", False))
        in_p = self.P(a)
        # final projection to a graph output stays replicated
        produces_output = op.outputs[0].role == TensorRole.OUTPUT or any(
            t.role == TensorRole.OUTPUT for c in op.outputs[0].targets
            for t in c.outputs)
        if produces_output and in_p.is_replicate():
            return
        groups = 1
        split = self._find_split_successor(op)
        if split is not None:
            groups = len(split.outputs)
        if in_p.is_replicate():
            wdim = -1 if not trans_b else 0
            n_out = op.outputs[0].shape[-1]
            if n_out % (self.tp * groups) or (n_out // groups) % self.tp:
                return
            self._shard_dim_local(w, wdim, groups)
            out = op.outputs[0]
            shape = list(out.shape)
            shape[-1] //= self.tp
            out.shape = tuple(shape)
            self.set(out, Shard(out.rank - 1))
        elif isinstance(in_p, Shard) and in_p.dim == a.rank - 1:
            wdim = 0 if not trans_b else -1
            self._shard_dim_local(w, wdim, 1)
            self.set(op.outputs[0], Partial())
            self._materialize(op.outputs[0])
        else:
            self._materialize(a)

    def _plan_binary(self, op: Operator) -> None:
        a, b = op.inputs[0], op.inputs[1]
        if op.op_type == "Where":
            a, b = op.inputs[1], op.inputs[2]
        if b.role == TensorRole.WEIGHT and a.role != TensorRole.WEIGHT:
            act, const = a, b
        elif a.role == TensorRole.WEIGHT:
            act, const = b, a
        else:
            act, const = a, b
            pa, pb = self.P(a), self.P(b)
            if type(pa) is not type(pb) or \
                    (isinstance(pa, Shard) and pa != pb):
                # mismatched activations: replicate both
                for t in (a, b):
                    if not self.P(t).is_replicate():
                        self._materialize(t)
                self.set(op.outputs[0], Replicate())
                self._fix_out_shapes(op)
                return
        p = self.P(act)
        if isinstance(p, Shard) and const is not act and \
                const.role == TensorRole.WEIGHT:
            # shard broadcast bias along the matching dim
            off = act.rank - const.rank
            cdim = p.dim - off
            if 0 <= cdim < const.rank and const.shape[cdim] > 1:
                if const.shape[cdim] % self.tp == 0:
                    self._shard_dim_local(const, cdim)
                else:
                    self._materialize(act)
                    p = self.P(act)
        self.set(op.outputs[0], p if not isinstance(p, Partial) else p)
        self._fix_out_shapes(op)

    def _fix_out_shapes(self, op: Operator) -> None:
        """Re-infer output shapes from (possibly sharded) input shapes."""
        from infinitensor_tpu.ops.shape_rules import infer_shapes
        specs = infer_shapes(op)
        for t, (shape, dtype) in zip(op.outputs, specs):
            t.shape = tuple(shape)

    def _plan_reshape(self, op: Operator) -> None:
        x = op.inputs[0]
        p = self.P(x)
        if not isinstance(p, Shard):
            self._fix_out_shapes(op)
            return
        # x.shape is already local; global target attr must localize the dim
        # that carries the shard (reference shard_reshape table,
        # parallel_opt.py:88-118 — generalized via size accounting).
        target = [int(d) for d in op.attrs["shape"]]
        # global input shape
        gshape = list(x.shape)
        gshape[p.dim] *= self.tp
        # resolve -1/0 against the global shape
        resolved = []
        neg = -1
        known = 1
        for i, d in enumerate(target):
            if d == 0:
                d = gshape[i]
            if d == -1:
                neg = len(resolved)
                resolved.append(-1)
                continue
            known *= d
            resolved.append(d)
        total = int(np.prod(gshape))
        if neg >= 0:
            resolved[neg] = total // known
        # find the output dim carrying the sharded axis: walk prefix products
        pre_in = int(np.prod(gshape[:p.dim]))
        acc = 1
        s_dim = -1
        for i, d in enumerate(resolved):
            if acc == pre_in and resolved[i] % self.tp == 0 and \
                    resolved[i] >= self.tp:
                s_dim = i
                break
            acc *= d
        if s_dim == -1:
            # fallback: replicate
            self._materialize(x)
            self._fix_out_shapes(op)
            return
        resolved[s_dim] //= self.tp
        op.attrs["shape"] = resolved
        self._fix_out_shapes(op)
        self.set(op.outputs[0], Shard(s_dim))

    def _plan_transpose(self, op: Operator) -> None:
        p = self.P(op.inputs[0])
        self._fix_out_shapes(op)
        if isinstance(p, Shard):
            perm = op.attrs.get("perm") or list(
                reversed(range(op.inputs[0].rank)))
            self.set(op.outputs[0], Shard(list(perm).index(p.dim)))

    def _plan_split(self, op: Operator) -> None:
        x = op.inputs[0]
        p = self.P(x)
        if isinstance(p, Shard):
            axis = op.attrs["axis"] % x.rank
            if axis == p.dim:
                if op.attrs.get("split"):
                    op.attrs["split"] = [s // self.tp
                                         for s in op.attrs["split"]]
            for o in op.outputs:
                self.set(o, p)
        self._fix_out_shapes(op)

    def _plan_concat(self, op: Operator) -> None:
        ps = [self.P(t) for t in op.present_inputs()]
        shard = next((p for p in ps if isinstance(p, Shard)), None)
        if shard is not None:
            for t, p in zip(op.present_inputs(), ps):
                if not isinstance(p, Shard):
                    self._materialize(t)  # conservative
            self.set(op.outputs[0], shard)
        self._fix_out_shapes(op)

    def _plan_attention_kvcache(self, op: Operator) -> None:
        # shard on head dim (dim 1 of [B, H, S, D]) when q/k/v are sharded
        kc = op.inputs[0]
        q = op.inputs[2]
        pq = self.P(q)
        if isinstance(pq, Shard) and pq.dim == 1:
            for t in op.inputs[:5]:
                if self.P(t).is_replicate():
                    if t.shape[1] % self.tp:
                        self._materialize(q)
                        self._fix_out_shapes(op)
                        return
                    self._shard_dim_local(t, 1)
            for o in op.outputs:
                self.set(o, Shard(1))
        self._fix_out_shapes(op)

    # -- main --------------------------------------------------------------
    def run(self) -> TPPlan:
        for op in list(self.g.operators):
            t = op.op_type
            if t in ("MatMul", "Gemm") and op.inputs[1].role == \
                    TensorRole.WEIGHT:
                if t == "Gemm" or len(op.inputs) > 2:
                    self._decompose_bias(op)
                self._plan_matmul_weight(op)
            elif t in ("MatMul", "Gemm"):
                # activation x activation (attention): legal if shard dims
                # line up on batch/head dims; contraction dim must be whole
                pa, pb = self.P(op.inputs[0]), self.P(op.inputs[1])
                if isinstance(pa, Shard) and pa.dim >= op.inputs[0].rank - 2:
                    self._materialize(op.inputs[0])
                    pa = self.P(op.inputs[0])
                if isinstance(pb, Shard) and pb.dim >= op.inputs[1].rank - 2:
                    self._materialize(op.inputs[1])
                    pb = self.P(op.inputs[1])
                out_p = pa if isinstance(pa, Shard) else pb
                self.set(op.outputs[0],
                         out_p if isinstance(out_p, Shard) else Replicate())
                self._fix_out_shapes(op)
            elif t in _PASSTHRU:
                self.set(op.outputs[0], self.P(op.inputs[0]))
                self._fix_out_shapes(op)
            elif t in _BINARY:
                self._plan_binary(op)
            elif t == "Reshape":
                self._plan_reshape(op)
            elif t == "Transpose":
                self._plan_transpose(op)
            elif t == "Split":
                self._plan_split(op)
            elif t == "Concat":
                self._plan_concat(op)
            elif t == "AttentionKVCache":
                self._plan_attention_kvcache(op)
            elif t in ("RMSNorm", "LayerNormalization", "RoPE"):
                # need full feature dim; RoPE input is (pos, x)
                xin = op.inputs[1] if t == "RoPE" else op.inputs[0]
                if not self.P(xin).is_replicate():
                    self._materialize(xin)
                self.set(op.outputs[0], Replicate())
                self._fix_out_shapes(op)
            else:
                for x in op.present_inputs():
                    if not self.P(x).is_replicate():
                        self._materialize(x)
                for o in op.outputs:
                    self.set(o, Replicate())
                self._fix_out_shapes(op)

        # graph outputs must be replicated
        for t in list(self.g.tensors):
            if t.role == TensorRole.OUTPUT and not self.P(t).is_replicate():
                self._materialize(t)
        self.g.topo_sort()
        layout = {w.name: ("stacked" if w.name in self.sharded_weights
                           else "replicated")
                  for w in self.g.weights()}
        input_placements = {}
        for t in self.g.inputs():
            plc = self.P(t)
            if isinstance(plc, Shard):
                input_placements[t.name] = plc.dim
        return TPPlan(self.g, self.tp, self.axis, layout,
                      dict(self.sharded_weights), input_placements)

    def _decompose_bias(self, op: Operator) -> None:
        """Gemm/MatMul with bias -> MatMul + Add so row-parallel bias adds
        after the AllReduce (reference 'split bias to add',
        parallel_opt.py:216-231)."""
        if len(op.inputs) < 3 or op.inputs[2] is None:
            return
        bias = op.inputs[2]
        out = op.outputs[0]
        mid = TensorObj(out.shape, out.dtype, name=out.name + "_nobias")
        self.g.add_tensor(mid)
        bias.remove_target(op)
        op.inputs = op.inputs[:2]
        op.outputs = [mid]
        mid.source = op
        out.source = None
        add = Operator("Add", [mid, bias], [out], {})
        mid.add_target(add)
        bias.add_target(add)
        out.source = add
        idx = self.g.operators.index(op)
        self.g.operators.insert(idx + 1, add)
        if op.op_type == "Gemm":
            # alpha/beta folded: planner only handles alpha=beta=1
            op.attrs.pop("beta", None)
        self.g._mutated()


def plan_tensor_parallel(graph: Graph, tp: int, axis_name: str = "tp"
                         ) -> TPPlan:
    return TPPlanner(graph, tp, axis_name).run()
