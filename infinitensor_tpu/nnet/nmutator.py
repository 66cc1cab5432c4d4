"""NMutator: expression-derivation-based graph mutator.

The analog of the reference NMutator (reference include/nnet/nmutator.h:7-57,
src/nnet/nmutator.cc): bridges the graph IR and the expression IR — convert
an op to a comprehension (opToExpression), derive equivalent forms, match
library calls back out (Rule-6), and wrap unmatched residue in a MemBound op
whose "kernel" is the expression evaluator (XLA-compiled at trace time,
replacing the reference's TVM JIT).

Every derivation is validated numerically against the evaluator oracle
before being offered as a mutant (the reference's Interpreter-check
pattern).
"""

from __future__ import annotations

import numpy as np

from infinitensor_tpu.core import dtype as dt
from infinitensor_tpu.core.graph import Graph
from infinitensor_tpu.core.operator import Operator
from infinitensor_tpu.core.tensor import TensorObj, TensorRole
from infinitensor_tpu.nnet.derivation import (
    conv1x1_to_matmul_expr, match_matmul, op_to_expr,
)
from infinitensor_tpu.nnet.evaluator import evaluate
from infinitensor_tpu.optimizer.mutator import Mutator


class NMutator(Mutator):
    """Rule-guided expression derivation over single ops (the reference's
    Mode::RuleBased runSingleOp path)."""

    def __init__(self, verify: bool = True):
        self.verify = verify

    def run(self, graph: Graph) -> list[Graph]:
        out = []
        for op in list(graph.operators):
            mutated = self._mutate_op(graph, op)
            out.extend(mutated)
        return out

    def _mutate_op(self, graph: Graph, op: Operator) -> list[Graph]:
        expr = op_to_expr(op)
        if expr is None:
            return []
        results = []
        if op.op_type == "Conv":
            derived = conv1x1_to_matmul_expr(expr)
            if derived is not None and self._equivalent(expr, derived, op):
                g = self._conv_as_membound(graph, op, derived)
                if g is not None:
                    results.append(g)
        return results

    def _equivalent(self, a, b, op) -> bool:
        """Numeric equivalence via the evaluator oracle on random data
        (modulo the known output reshape between conv and merged form)."""
        if not self.verify:
            return True
        rng = np.random.default_rng(0)
        x, w = op.inputs[0], op.inputs[1]
        feeds = {
            "X": rng.standard_normal(x.shape).astype(np.float32),
            "W": rng.standard_normal(w.shape).astype(np.float32),
        }
        va = np.asarray(evaluate(a, feeds))
        vb = np.asarray(evaluate(b, feeds))
        n, f, oh, ow = va.shape
        vb4 = vb.reshape(n, oh, ow, f).transpose(0, 3, 1, 2)
        return np.allclose(va, vb4, rtol=1e-4, atol=1e-5)

    def _conv_as_membound(self, graph: Graph, op: Operator, derived):
        """Replace the conv with a MemBound expression op + reshape/transpose
        back to NCHW (expressionToGraph with residue)."""
        m = match_matmul(derived)
        g = graph.clone()
        target = next(o for o in g.operators if o.name == op.name)
        x, w = target.inputs[0], target.inputs[1]
        out = target.outputs[0]
        n, f, oh, ow = out.shape
        g.remove_op(target)
        flat = TensorObj((n * oh * ow, f), out.dtype)
        g.add_tensor(flat)
        g.add_op(Operator("MemBound", [x, w], [flat], {
            "expr": derived,
            "out_specs": [((n * oh * ow, f), out.dtype)],
        }))
        shaped = TensorObj((n, oh, ow, f), out.dtype)
        g.add_tensor(shaped)
        g.add_op(Operator("Reshape", [flat], [shaped],
                          {"shape": [n, oh, ow, f]}))
        g.add_op(Operator("Transpose", [shaped], [out],
                          {"perm": [0, 3, 1, 2]}))
        g.topo_sort()
        return g
