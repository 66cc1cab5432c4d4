"""Derivation-engine search depth (VERDICT item: rules 1/2/3/5/9 wired into
Derivator._moves + an iterator-table matcher for permuted/strided accesses).
Reference: src/nnet/derivator.cc:40-150 rule dispatch,
include/nnet/iterator_table.h. The load-bearing check: a strided+dilated
conv -> gemm derivation found by SEARCH (rule 8 disabled), oracle-verified."""

import numpy as np
import pytest

from infinitensor_tpu.core.handler import GraphHandler
from infinitensor_tpu.nnet.derivation import conv_expr, matmul_expr
from infinitensor_tpu.nnet.derivator import Derivator
from infinitensor_tpu.nnet.evaluator import evaluate_program
from infinitensor_tpu.nnet.iterator_table import match_matmul_table
from infinitensor_tpu.nnet.expr import Comprehension, TensorRef, fresh_var
from infinitensor_tpu.nnet.nmutator import NMutator
from infinitensor_tpu.nnet.rules import (
    Program, Stage, rule1_loop_program, rule1_program, rule2_program,
    rule5_program, rule9_program)
from infinitensor_tpu.runtime.executor import GraphExecutor


NO_RULE8 = {1, 2, 3, 4, 5, 9, 90, 91}


def _prog(comp):
    return Program([Stage("out", comp)])


def _assert_equiv(rng, a, b):
    feeds = {t.name: rng.standard_normal(t.shape).astype(np.float32)
             for t in a.external_inputs()}
    va = np.asarray(evaluate_program(a, feeds))
    vb = np.asarray(evaluate_program(b, feeds))
    np.testing.assert_allclose(vb, va, rtol=1e-4, atol=1e-4)


def test_conv_to_gemm_found_by_search_not_rule8(rng):
    """Strided+dilated padded conv -> matmul candidate via rule-3 stage
    split + iterator-table match, with rule 8 OFF; interpreter-verified."""
    comp = conv_expr(1, 3, 10, 10, 4, 3, 3, pad=1, stride=2, dilation=2)
    d = Derivator(max_depth=2, max_states=512, verify=True,
                  enabled_rules=NO_RULE8)
    cands = d.derive(_prog(comp))
    dlt = [c for c in cands if any(
        s.routine and s.routine.get("kind") == "MatMulDLT"
        for s in c.program.stages)]
    assert dlt, "search did not find the conv->gemm derivation"


def test_iterator_table_matches_permuted_matmul():
    """out[j, i] = sum_k B[k, j] * A[i, k] — permuted operands/out order
    the plain matcher rejects."""
    A = TensorRef("A", (4, 6))
    B = TensorRef("B", (6, 5))
    i, j, k = fresh_var("i"), fresh_var("j"), fresh_var("k")
    comp = Comprehension([(j, 5), (i, 4)], [(k, 6)], B[k, j] * A[i, k])
    m = match_matmul_table(comp)
    assert m is not None and m["kind"] == "MatMulDLT"
    assert [n for n, _ in m["row"]] == [j.name]
    assert [n for n, _ in m["col"]] == [i.name]


def test_iterator_table_rejects_batched_and_broadcast():
    A = TensorRef("A", (2, 4, 6))
    B = TensorRef("B", (2, 6, 5))
    b, i, j, k = (fresh_var(n) for n in "bijk")
    batched = Comprehension([(b, 2), (i, 4), (j, 5)], [(k, 6)],
                            A[b, i, k] * B[b, k, j])
    assert match_matmul_table(batched) is None          # batch dim
    C = TensorRef("C", (4, 6))
    D = TensorRef("D", (6, 5))
    i2, j2, u, k2 = (fresh_var(n) for n in ("i", "j", "u", "k"))
    bcast = Comprehension([(i2, 4), (j2, 5), (u, 3)], [(k2, 6)],
                          C[i2, k2] * D[k2, j2])
    assert match_matmul_table(bcast) is None            # unused loop var


@pytest.mark.parametrize("rule_fn,args", [
    (rule1_program, ("k", 4)),           # sum split
    (rule1_loop_program, ("i", 2)),      # loop split + restore
    (rule5_program, ("i", 8)),           # range relax + restore slice
    (rule9_program, ("k", 8)),           # sum magnify + zero padding
])
def test_rules_preserve_semantics(rng, rule_fn, args):
    comp = matmul_expr(6, 12, 5)
    # name vars deterministically for the rule calls
    (i, _), (j, _) = comp.loop_vars
    (k, _) = comp.sum_vars[0]
    names = {"i": i.name, "j": j.name, "k": k.name}
    prog = _prog(comp)
    out = rule_fn(prog, "out", names[args[0]], args[1])
    assert out is not None
    _assert_equiv(rng, prog, out)


def test_rule2_sum_merge_preserves_semantics(rng):
    comp = conv_expr(1, 2, 6, 6, 3, 3, 3)
    prog = _prog(comp)
    (c, _), (r, _), (s, _) = comp.sum_vars
    out = rule2_program(prog, "out", c.name, r.name)
    assert out is not None
    assert len(out.stage("out").comp.sum_vars) == 2
    _assert_equiv(rng, prog, out)


def test_all_wired_rules_fire_in_search():
    """Every advertised rule produces at least one move from a conv state
    (the VERDICT gap: rules existed but never fired)."""
    comp = conv_expr(1, 4, 6, 6, 4, 3, 3, pad=1)
    d = Derivator(max_depth=1, verify=False)
    moves = {name for name, _ in d._moves(_prog(comp))}
    for expected in ("rule3_stage_split", "rule1_sum_split",
                     "rule1_loop_split", "rule2_sum_merge",
                     "rule9_range_magnify"):
        assert expected in moves, f"{expected} never fires"


def test_nmutator_strided_conv_to_gemm_graph(rng):
    """End-to-end: strided+dilated conv op -> mutant graph containing a
    MatMul, numerically equivalent (reference test_conv2gemm.cc analog)."""
    h = GraphHandler()
    x = h.input((1, 3, 10, 10), name="x")
    w = h.weight(rng.standard_normal((4, 3, 3, 3)).astype(np.float32))
    h.conv(x, w, pads=(1, 1), strides=(2, 2), dilations=(2, 2))
    h.graph.infer_output_roles()
    muts = NMutator(max_depth=2).run(h.graph)
    assert any("MatMul" in [op.op_type for op in m.operators] for m in muts)
    feeds = {"x": rng.standard_normal((1, 3, 10, 10)).astype(np.float32)}
    base = GraphExecutor(h.graph).run(feeds, return_numpy=True)
    for m in muts:
        got = GraphExecutor(m).run(feeds, return_numpy=True)
        for key in base:
            np.testing.assert_allclose(got[key], base[key],
                                       rtol=1e-4, atol=1e-4)
