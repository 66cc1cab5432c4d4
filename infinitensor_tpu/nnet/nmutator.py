"""NMutator: expression-derivation-based graph mutator.

The analog of the reference NMutator (reference include/nnet/nmutator.h:7-57,
src/nnet/nmutator.cc): bridges the graph IR and the expression IR — convert
an op to a comprehension (opToExpression), run the Derivator, and lower each
candidate program back to a graph (expressionToGraph): routine-matched stages
become library ops (MatMul), data-movement/DLT stages become MemBound ops
whose "kernel" is the expression evaluator (XLA-compiled at trace time,
replacing the reference's TVM JIT, src/kernels/cuda/
membound_tvm_packed_function.cc).

Every candidate is validated numerically against the evaluator oracle inside
the Derivator before being offered as a mutant (the reference's
Interpreter-check pattern).
"""

from __future__ import annotations

from typing import Optional

from infinitensor_tpu.core.graph import Graph
from infinitensor_tpu.core.operator import Operator
from infinitensor_tpu.core.tensor import TensorObj
from infinitensor_tpu.nnet.derivation import op_to_expr
from infinitensor_tpu.nnet.derivator import Derivator
from infinitensor_tpu.nnet.rules import Program, Stage
from infinitensor_tpu.optimizer.mutator import Mutator

#: comprehension input names in op-input order (matches op_to_expr naming)
OP_INPUT_NAMES = {
    "Conv": ["X", "W"],
    "MatMul": ["A", "B"],
    "G2BMM": ["A", "B"],
}


class NMutator(Mutator):
    """Rule-guided expression derivation over single ops (the reference's
    Mode::RuleBased runSingleOp path)."""

    def __init__(self, verify: bool = True, max_depth: int = 2,
                 max_candidates: int = 2):
        self.verify = verify
        self.max_depth = max_depth
        self.max_candidates = max_candidates

    def run(self, graph: Graph) -> list[Graph]:
        out = []
        for op in list(graph.operators):
            out.extend(self._mutate_op(graph, op))
        return out

    def _mutate_op(self, graph: Graph, op: Operator) -> list[Graph]:
        expr = op_to_expr(op)
        if expr is None or op.op_type not in OP_INPUT_NAMES:
            return []
        derivator = Derivator(max_depth=self.max_depth, verify=self.verify)
        candidates = derivator.derive(Program([Stage("out", expr)]))
        results = []
        for cand in candidates[: self.max_candidates]:
            if cand.n_routines == 0:
                continue  # pure-membound rewrite: no algorithmic gain
            g = program_to_graph(graph, op, cand.program)
            if g is not None:
                results.append(g)
        return results


def program_to_graph(graph: Graph, op: Operator, program: Program
                     ) -> Optional[Graph]:
    """expressionToGraph (reference nmutator.cc): splice a derived program
    into a clone of the graph in place of ``op``."""
    g = graph.clone()
    target = next((o for o in g.operators if o.name == op.name), None)
    if target is None or len(target.outputs) != 1:
        return None
    names = OP_INPUT_NAMES[op.op_type]
    env = dict(zip(names, target.inputs))
    out = target.outputs[0]
    if program.stages[-1].shape != tuple(out.shape):
        return None
    g.remove_op(target)

    for stage in program.stages:
        is_last = stage is program.stages[-1]
        if is_last:
            result = out
        else:
            result = g.add_tensor(TensorObj(stage.shape, out.dtype))
        routine = stage.routine or {}
        if routine.get("kind") == "MatMul":
            a = env.get(routine["A"].name)
            b = env.get(routine["B"].name)
            if a is None or b is None:
                return None
            g.add_op(Operator("MatMul", [a, b], [result], {
                "transA": int(routine["transA"]),
                "transB": int(routine["transB"]),
            }))
        else:
            try:
                inputs = [env[t.name] for t in stage.comp.inputs()]
            except KeyError:
                return None
            g.add_op(Operator("MemBound", inputs, [result], {
                "expr": stage.comp,
                "out_specs": [(stage.shape, out.dtype)],
            }))
        env[stage.name] = result
    g.topo_sort()
    return g
