"""Derivator / rules / visitors tests.

Mirrors the reference test/nnet suite (test_conv2gemm.cc, test_guidedDLT.cc,
test_Interpreter.cc, test_serializer.cc, test_oobChecker.cc, test_mutator.cc)
— every rule is validated against the evaluator oracle, exactly the
reference's Interpreter-check pattern.
"""

import json

import numpy as np
import pytest

from infinitensor_tpu.nnet.derivation import conv_expr, matmul_expr
from infinitensor_tpu.nnet.derivator import Derivator, derive_op_program
from infinitensor_tpu.nnet.evaluator import evaluate, evaluate_program
from infinitensor_tpu.nnet.expr import Comprehension, TensorRef, fresh_var
from infinitensor_tpu.nnet.rules import (
    Program, Stage, match_conv, match_g2bmm, match_routine,
    rule1_loop_var_split, rule1_sum_var_split, rule2_var_merge,
    rule3_stage_split, rule4_stage_merge, rule5_range_relax,
    rule8_guided_dlt, rule90_merge_elementwise,
)
from infinitensor_tpu.nnet.visitors import (
    check_oob, comp_hash, deserialize, serialize, simplify, substitute,
)
from infinitensor_tpu.nnet.expr import Access, BinOp, Const, Func, Var


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _mm_feeds(rng, m=4, k=8, n=6):
    return {"A": rng.standard_normal((m, k)).astype(np.float32),
            "B": rng.standard_normal((k, n)).astype(np.float32)}


# -- rule 1 / 2 / 5 ----------------------------------------------------------

def test_rule1_sum_split_preserves_value(rng):
    mm = matmul_expr(4, 8, 6)
    split = rule1_sum_var_split(mm, mm.sum_vars[0][0], 4)
    assert split is not None and len(split.sum_vars) == 2
    feeds = _mm_feeds(rng)
    np.testing.assert_allclose(evaluate(mm, feeds), evaluate(split, feeds),
                               rtol=1e-4, atol=1e-5)


def test_rule1_loop_split_reshapes(rng):
    mm = matmul_expr(4, 8, 6)
    split = rule1_loop_var_split(mm, mm.loop_vars[0][0], 2)
    assert split.shape == (2, 2, 6)
    feeds = _mm_feeds(rng)
    np.testing.assert_allclose(
        np.asarray(evaluate(mm, feeds)).reshape(2, 2, 6),
        evaluate(split, feeds), rtol=1e-4, atol=1e-5)


def test_rule1_rejects_non_divisible():
    mm = matmul_expr(4, 7, 6)
    assert rule1_sum_var_split(mm, mm.sum_vars[0][0], 2) is None


def test_rule2_loop_merge(rng):
    mm = matmul_expr(4, 8, 6)
    merged = rule2_var_merge(mm, mm.loop_vars[0][0], mm.loop_vars[1][0])
    assert merged.shape == (24,)
    feeds = _mm_feeds(rng)
    np.testing.assert_allclose(
        np.asarray(evaluate(mm, feeds)).reshape(-1),
        evaluate(merged, feeds), rtol=1e-4, atol=1e-5)


def test_rule5_range_relax():
    mm = matmul_expr(5, 8, 6)
    relaxed, pad = rule5_range_relax(mm, mm.loop_vars[0][0], 8)
    assert relaxed.shape == (8, 6) and pad == 3


# -- rule 3 / 4: stage split & merge round-trip ------------------------------

def test_rule3_rule4_roundtrip(rng):
    conv = conv_expr(1, 2, 5, 5, 3, 3, 3, pad=1)
    prog = Program([Stage("out", conv)])
    x_acc = conv.body.lhs  # X access
    split = rule3_stage_split(prog, "out", x_acc)
    assert split is not None and len(split.stages) == 2
    feeds = {"X": rng.standard_normal((1, 2, 5, 5)).astype(np.float32),
             "W": rng.standard_normal((3, 2, 3, 3)).astype(np.float32)}
    np.testing.assert_allclose(evaluate_program(prog, feeds),
                               evaluate_program(split, feeds),
                               rtol=1e-4, atol=1e-5)
    merged = rule4_stage_merge(split, split.stages[0].name)
    assert merged is not None and len(merged.stages) == 1
    np.testing.assert_allclose(evaluate_program(prog, feeds),
                               evaluate_program(merged, feeds),
                               rtol=1e-4, atol=1e-5)


# -- rule 8: guided DLT (conv2gemm family) -----------------------------------

@pytest.mark.parametrize("r,s,pad,stride", [(1, 1, 0, 1), (3, 3, 1, 1),
                                            (3, 3, 1, 2)])
def test_rule8_conv_to_matmul(rng, r, s, pad, stride):
    """test_conv2gemm.cc analog: guided DLT turns any conv into
    im2col-gather + exact matmul + layout restore."""
    conv = conv_expr(2, 3, 8, 8, 4, r, s, pad=pad, stride=stride)
    prog = Program([Stage("out", conv)])
    out = rule8_guided_dlt(prog, "out")
    assert out is not None and len(out.stages) == 4
    kinds = [match_routine(st.comp) and match_routine(st.comp)["kind"]
             for st in out.stages]
    assert "MatMul" in kinds
    feeds = {"X": rng.standard_normal((2, 3, 8, 8)).astype(np.float32),
             "W": rng.standard_normal((4, 3, r, s)).astype(np.float32)}
    np.testing.assert_allclose(evaluate_program(prog, feeds),
                               evaluate_program(out, feeds),
                               rtol=1e-3, atol=1e-4)


def test_rule90_elementwise_merge(rng):
    i = fresh_var("i")
    X = TensorRef("X", (8,))
    p = Stage("t", Comprehension([(i, 8)], [], X[i] * 2.0))
    j = fresh_var("j")
    T = TensorRef("t", (8,))
    f = Stage("out", Comprehension([(j, 8)], [], Func("relu", T[j])))
    prog = Program([p, f])
    fused = rule90_merge_elementwise(prog, "out")
    assert fused is not None and len(fused.stages) == 1
    feeds = {"X": rng.standard_normal(8).astype(np.float32)}
    np.testing.assert_allclose(evaluate_program(prog, feeds),
                               evaluate_program(fused, feeds), rtol=1e-5)


# -- rule 6: matching --------------------------------------------------------

def test_match_conv_inverse():
    conv = conv_expr(2, 3, 8, 8, 4, 3, 3, pad=1, stride=2)
    m = match_conv(conv)
    assert m is not None and m["kind"] == "Conv"
    assert m["strides"] == [2, 2] and m["pads"] == [1, 1]


def test_match_g2bmm():
    b, i, w, k = (fresh_var(n) for n in "biwk")
    A = TensorRef("A", (2, 16, 8))
    B = TensorRef("B", (2, 16, 8), paddings=(0, 4, 0))
    comp = Comprehension([(b, 2), (i, 16), (w, 9)], [(k, 8)],
                         A[b, i, k] * B[b, i + w - 4, k])
    m = match_g2bmm(comp)
    assert m is not None and m["width"] == 4 and m["window"] == 9


# -- visitors ----------------------------------------------------------------

def test_serializer_roundtrip_hash_stable():
    mm = matmul_expr(4, 8, 6, trans_b=True)
    blob = json.dumps(serialize(mm))
    back = deserialize(json.loads(blob))
    assert comp_hash(back) == comp_hash(mm)
    assert back.shape == mm.shape


def test_hash_alpha_invariant():
    a = matmul_expr(4, 8, 6)
    b = matmul_expr(4, 8, 6)  # fresh vars, distinct names
    assert comp_hash(a) == comp_hash(b)
    c = matmul_expr(4, 8, 7)
    assert comp_hash(a) != comp_hash(c)


def test_oob_checker_flags_and_passes():
    v = fresh_var("v")
    X = TensorRef("X", (4,))
    assert check_oob(Comprehension([(v, 6)], [], X[v]))
    assert not check_oob(Comprehension([(v, 4)], [], X[v]))
    # paddings make out-of-range reads legal (zero)
    Xp = TensorRef("X", (4,), paddings=(2,))
    assert not check_oob(Comprehension([(v, 6)], [], Xp[v]))


def test_simplify_affine():
    i = Var("i")
    e = simplify((i * 1 + 0) * Const(1) + Const(2) * Const(3))
    assert repr(e) in ("(i + 6)", "(6 + i)")


# -- derivator end-to-end ----------------------------------------------------

def test_derivator_conv2gemm_search():
    """Full search: conv -> (im2col, matmul, restore), oracle-verified,
    hash-pruned (reference test_OpSearch.cc)."""
    conv = conv_expr(1, 2, 6, 6, 3, 3, 3, pad=1)
    cands = derive_op_program(conv, max_depth=2, verify=True)
    assert cands
    best = cands[0]
    kinds = [s.routine and s.routine["kind"] for s in best.program.stages]
    # plain MatMul (rule-8 im2col) or the iterator-table matched form
    assert "MatMul" in kinds or "MatMulDLT" in kinds


def test_derivator_prunes_revisits():
    conv = conv_expr(1, 1, 4, 4, 1, 1, 1)
    # original rule set: hash pruning keeps the state count tiny
    d = Derivator(max_depth=3, verify=False, enabled_rules={4, 8, 90, 91})
    d.derive(Program([Stage("out", conv)]))
    # visited strictly less than the naive rule-application count
    assert d.n_states_visited < 64
    # full rule set: the max_states cap bounds the expanded move space
    d2 = Derivator(max_depth=3, verify=False)
    d2.derive(Program([Stage("out", conv)]))
    assert d2.n_states_visited <= d2.max_states


def test_nmutator_full_conv_to_matmul(rng):
    """3x3 conv graph mutates into a graph containing a real MatMul op with
    numeric parity (the im2col derivation landing in the graph IR)."""
    from infinitensor_tpu.core.handler import GraphHandler
    from infinitensor_tpu.nnet.nmutator import NMutator
    from infinitensor_tpu.runtime.executor import GraphExecutor
    h = GraphHandler()
    x = h.input((1, 3, 6, 6), name="x")
    w = h.weight(rng.standard_normal((4, 3, 3, 3)).astype(np.float32))
    h.conv(x, w, pads=[1, 1, 1, 1])
    h.graph.infer_output_roles()
    x_np = rng.standard_normal((1, 3, 6, 6)).astype(np.float32)
    ref = GraphExecutor(h.graph).run({"x": x_np}, return_numpy=True)
    muts = NMutator(max_depth=2).run(h.graph)
    assert muts
    withmm = [g for g in muts
              if any(op.op_type == "MatMul" for op in g.operators)]
    assert withmm, "no mutant lowered the conv to a MatMul routine"
    got = GraphExecutor(withmm[0]).run({"x": x_np}, return_numpy=True)
    for key, val in ref.items():
        np.testing.assert_allclose(got[key], val, rtol=1e-3, atol=1e-4)
