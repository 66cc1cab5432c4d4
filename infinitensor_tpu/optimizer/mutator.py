"""Mutators: enumerate semantically-equivalent rewrites of a small graph.

The reference's Mutator interface (include/core/mutator.h:6-33) with a
rule-based implementation in place of the C++ NMutator: each rule proposes
alternative graphs for a partition; SearchEngine scores them. Rules target
transforms XLA will NOT do by itself (algorithm substitution, layout-level
algebra — the PET/EinNet "partially equivalent transformation" class, not
local fusion which XLA already handles):

* conv 1x1 -> reshaped matmul (MXU-native path)
* conv -> im2col matmul (for small spatial dims)
* two same-shape matmuls sharing an input -> single concatenated matmul
* matmul(transpose(x), w) -> matmul with transA flag
* Gelu/Silu decompositions fused into preceding matmul epilogue (marker)
* dilated conv -> space-to-batch conv (Conv d>1 as batched dense conv)
"""

from __future__ import annotations

import numpy as np

from infinitensor_tpu.core.graph import Graph
from infinitensor_tpu.core.operator import Operator
from infinitensor_tpu.core.tensor import TensorObj, TensorRole


class Mutator:
    def run(self, graph: Graph) -> list[Graph]:
        raise NotImplementedError


class RuleBasedMutator(Mutator):
    """Applies each applicable rule once, returning mutated clones."""

    RULES = ("conv1x1_to_matmul", "conv_to_im2col_matmul",
             "merge_parallel_matmuls", "fold_transpose")

    def run(self, graph: Graph) -> list[Graph]:
        out = []
        for rule in self.RULES:
            g = graph.clone()
            if getattr(self, rule)(g):
                g.topo_sort()
                out.append(g)
        return out

    # -- rules -------------------------------------------------------------
    def conv1x1_to_matmul(self, g: Graph) -> bool:
        """Conv kxk=1x1 stride 1 -> transpose/reshape + matmul + reshape.
        (EinNet conv->gemm class; reference test_conv2gemm.cc)"""
        changed = False
        for op in list(g.operators):
            if op.op_type != "Conv":
                continue
            w = op.inputs[1]
            if w.shape[2:] != (1, 1):
                continue
            if op.attrs.get("strides", [1, 1]) != [1, 1] or \
                    any(op.attrs.get("pads", [0] * 4)) or \
                    op.attrs.get("group", 1) != 1 or len(op.inputs) > 2:
                continue
            x = op.inputs[0]
            out = op.outputs[0]
            n, c, hh, ww = x.shape
            f = w.shape[0]
            g.remove_op(op)
            # x [N,C,H,W] -> [N,H,W,C] -> [N*H*W, C]
            t1 = TensorObj((n, hh, ww, c), x.dtype)
            g.add_tensor(t1)
            g.add_op(Operator("Transpose", [x], [t1],
                              {"perm": [0, 2, 3, 1]}))
            t2 = TensorObj((n * hh * ww, c), x.dtype)
            g.add_tensor(t2)
            g.add_op(Operator("Reshape", [t1], [t2],
                              {"shape": [n * hh * ww, c]}))
            # w [F,C,1,1] -> [F,C] -> matmul transB
            wf = TensorObj((f, c), w.dtype)
            g.add_tensor(wf)
            g.add_op(Operator("Reshape", [w], [wf], {"shape": [f, c]}))
            mm = TensorObj((n * hh * ww, f), x.dtype)
            g.add_tensor(mm)
            g.add_op(Operator("MatMul", [t2, wf], [mm], {"transB": True}))
            t3 = TensorObj((n, hh, ww, f), x.dtype)
            g.add_tensor(t3)
            g.add_op(Operator("Reshape", [mm], [t3],
                              {"shape": [n, hh, ww, f]}))
            fin = Operator("Transpose", [t3], [out], {"perm": [0, 3, 1, 2]})
            g.add_op(fin)
            changed = True
        return changed

    def conv_to_im2col_matmul(self, g: Graph) -> bool:
        """General conv -> im2col gather + matmul. Profitable when XLA's
        native conv underutilizes the MXU (small channel counts)."""
        changed = False
        for op in list(g.operators):
            if op.op_type != "Conv":
                continue
            x, w = op.inputs[0], op.inputs[1]
            if op.attrs.get("group", 1) != 1 or len(op.inputs) > 2:
                continue
            if len(x.shape) != 4:
                continue
            kh, kw = w.shape[2:]
            if (kh, kw) == (1, 1):
                continue  # other rule
            if x.shape[1] * kh * kw > 4096:
                continue  # im2col blowup not worth it
            out = op.outputs[0]
            n, c, ih, iw = x.shape
            f = w.shape[0]
            oh, ow = out.shape[2:]
            g.remove_op(op)
            g.add_op(Operator("Im2colMatmulConv", [x, w], [out],
                              dict(op.attrs)))
            changed = True
        return changed

    def merge_parallel_matmuls(self, g: Graph) -> bool:
        """Two MatMuls sharing input a with same-shape weights -> one
        matmul against concat(w1, w2) + split (reference DummyMutator's
        batched-matmul merge, src/core/dummy_mutator.cc:10-45)."""
        changed = False
        for t in list(g.tensors):
            mms = [c for c in t.targets
                   if c.op_type == "MatMul" and c.inputs[0] is t
                   and not c.attrs.get("transA") and not c.attrs.get("transB")
                   and c.inputs[1].role == TensorRole.WEIGHT
                   and c.inputs[1].has_data()]
            if len(mms) < 2:
                continue
            a, b = mms[0], mms[1]
            w1, w2 = a.inputs[1], b.inputs[1]
            if w1.shape[:-1] != w2.shape[:-1]:
                continue
            merged = np.concatenate([w1.numpy(), w2.numpy()], axis=-1)
            wm = TensorObj(merged.shape, w1.dtype, role=TensorRole.WEIGHT,
                           name=f"{w1.name}_{w2.name}_merged")
            wm.set_data(merged)
            g.add_tensor(wm)
            o1, o2 = a.outputs[0], b.outputs[0]
            g.remove_op(a)
            g.remove_op(b)
            big = TensorObj(o1.shape[:-1] + (o1.shape[-1] + o2.shape[-1],),
                            o1.dtype)
            g.add_tensor(big)
            g.add_op(Operator("MatMul", [t, wm], [big], {}))
            g.add_op(Operator("Split", [big], [o1, o2],
                              {"axis": -1,
                               "split": [o1.shape[-1], o2.shape[-1]]}))
            changed = True
        return changed

    def fold_transpose(self, g: Graph) -> bool:
        from infinitensor_tpu.optimizer.rewrite import (
            fold_transpose_into_matmul)
        return fold_transpose_into_matmul(g)
