"""Optimizer tests: rewrites, subgraph match/replace, mutators, search
(analogs of reference test_graph_replace.cc, test_search.cc,
test_mutator.cc)."""

import numpy as np
import pytest

from infinitensor_tpu.core import dtype as dt
from infinitensor_tpu.core.handler import GraphHandler
from infinitensor_tpu.core.operator import Operator
from infinitensor_tpu.core.tensor import TensorObj
from infinitensor_tpu.optimizer.rewrite import optimize_graph
from infinitensor_tpu.optimizer.graph_match import SubGraphRewriter
from infinitensor_tpu.optimizer.mutator import RuleBasedMutator
from infinitensor_tpu.optimizer.search import SearchEngine


def _run(h, feeds):
    return h.run(feeds, return_numpy=True)


def test_identity_and_dce(rng):
    h = GraphHandler()
    x = h.input((2, 4), name="x")
    y = h.identity(x)
    z = h.relu(y)
    dead = h.neg(x)  # nobody consumes
    z.role = z.role.__class__.OUTPUT
    h.graph.infer_output_roles()
    dead.role = dead.role.__class__.OTHERS
    dead.targets = []
    n0 = len(h.graph.operators)
    h.optimize(level=1)
    types = [op.op_type for op in h.graph.operators]
    assert "Identity" not in types
    assert "Neg" not in types  # dead code removed


def test_transpose_fold_preserves_numerics(rng):
    h = GraphHandler()
    x = h.input((4, 6), name="x")
    t = h.transpose(x, perm=[1, 0])
    w = h.weight(rng.standard_normal((4, 5), dtype=np.float32))
    h.matmul(t, w)
    h.graph.infer_output_roles()
    x_np = rng.standard_normal((4, 6), dtype=np.float32)
    before = _run(h, {"x": x_np})
    h.optimize(level=2)
    assert all(op.op_type != "Transpose" for op in h.graph.operators)
    after = _run(h, {"x": x_np})
    for k in before:
        np.testing.assert_allclose(after[k], before[k], rtol=1e-5)


def test_conv_bias_fusion(rng):
    h = GraphHandler()
    x = h.input((1, 3, 8, 8), name="x")
    w = h.weight(rng.standard_normal((4, 3, 3, 3), dtype=np.float32))
    c = h.conv(x, w, pads=(1, 1))
    bias = h.weight(rng.standard_normal((1, 4, 1, 1), dtype=np.float32))
    h.add(c, bias)
    h.graph.infer_output_roles()
    x_np = rng.standard_normal((1, 3, 8, 8), dtype=np.float32)
    before = _run(h, {"x": x_np})
    h.optimize(level=2)
    types = [op.op_type for op in h.graph.operators]
    assert "Add" not in types
    after = _run(h, {"x": x_np})
    np.testing.assert_allclose(list(after.values())[0],
                               list(before.values())[0], rtol=1e-4, atol=1e-5)


def test_subgraph_match_and_replace(rng):
    # pattern: Relu -> Neg ; replace with single Neg(Relu(x)) == -relu(x)
    # via an equivalent Min(-x, 0)
    h = GraphHandler()
    x = h.input((3, 3), name="x")
    r = h.relu(x)
    h.neg(r)
    h.graph.infer_output_roles()

    ph = GraphHandler()
    px = ph.input((3, 3))
    pr = ph.relu(px)
    pn = ph.neg(pr)

    rw = SubGraphRewriter(h.graph)
    matches = rw.find_matches(ph.graph)
    assert len(matches) == 1

    def build(g, xin):
        zero = TensorObj((3, 3), dt.FLOAT32)
        g.add_tensor(zero)
        negd = Operator("Neg", [xin], [zero], {})
        g.add_op(negd)
        out = TensorObj((3, 3), dt.FLOAT32)
        g.add_tensor(out)
        g.add_op(Operator("Clip", [zero], [out], {"max": 0.0}))
        return out

    x_np = rng.standard_normal((3, 3), dtype=np.float32)
    before = _run(h, {"x": x_np})
    rw.replace(matches[0], ph.graph, build, [px], [pn])
    after = _run(h, {"x": x_np})
    np.testing.assert_allclose(list(after.values())[0],
                               list(before.values())[0], rtol=1e-6)


def test_mutator_conv1x1(rng):
    h = GraphHandler()
    x = h.input((2, 8, 4, 4), name="x")
    w = h.weight(rng.standard_normal((16, 8, 1, 1), dtype=np.float32))
    h.conv(x, w)
    h.graph.infer_output_roles()
    x_np = rng.standard_normal((2, 8, 4, 4), dtype=np.float32)
    ref = _run(h, {"x": x_np})
    muts = RuleBasedMutator().run(h.graph)
    assert muts, "no mutants produced"
    matmul_mut = next(g for g in muts
                      if any(op.op_type == "MatMul" for op in g.operators))
    from infinitensor_tpu.runtime.executor import GraphExecutor
    got = GraphExecutor(matmul_mut).run({"x": x_np}, return_numpy=True)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-4, atol=1e-5)


def test_mutator_im2col(rng):
    h = GraphHandler()
    x = h.input((1, 4, 6, 6), name="x")
    w = h.weight(rng.standard_normal((8, 4, 3, 3), dtype=np.float32))
    h.conv(x, w, pads=(1, 1))
    h.graph.infer_output_roles()
    x_np = rng.standard_normal((1, 4, 6, 6), dtype=np.float32)
    ref = _run(h, {"x": x_np})
    muts = RuleBasedMutator().run(h.graph)
    im2col = next(g for g in muts
                  if any(op.op_type == "Im2colMatmulConv"
                         for op in g.operators))
    from infinitensor_tpu.runtime.executor import GraphExecutor
    got = GraphExecutor(im2col).run({"x": x_np}, return_numpy=True)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-4, atol=1e-5)


def test_mutator_merge_matmuls(rng):
    h = GraphHandler()
    x = h.input((4, 8), name="x")
    w1 = h.weight(rng.standard_normal((8, 6), dtype=np.float32))
    w2 = h.weight(rng.standard_normal((8, 10), dtype=np.float32))
    h.matmul(x, w1)
    h.matmul(x, w2)
    h.graph.infer_output_roles()
    x_np = rng.standard_normal((4, 8), dtype=np.float32)
    ref = _run(h, {"x": x_np})
    muts = RuleBasedMutator().run(h.graph)
    merged = next(g for g in muts
                  if any(op.op_type == "Split" for op in g.operators))
    assert sum(1 for op in merged.operators if op.op_type == "MatMul") == 1
    from infinitensor_tpu.runtime.executor import GraphExecutor
    got = GraphExecutor(merged).run({"x": x_np}, return_numpy=True)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-4, atol=1e-5)


def test_search_engine_preserves_numerics(rng):
    h = GraphHandler()
    x = h.input((1, 8, 6, 6), name="x")
    w1 = h.weight(rng.standard_normal((8, 8, 1, 1), dtype=np.float32))
    c = h.conv(x, w1)
    r = h.relu(c)
    w2 = h.weight(rng.standard_normal((288, 10), dtype=np.float32))
    h.matmul(h.flatten(r, axis=1), w2)
    h.graph.infer_output_roles()
    x_np = rng.standard_normal((1, 8, 6, 6), dtype=np.float32)
    ref = _run(h, {"x": x_np})
    best = SearchEngine().run(h.graph)
    from infinitensor_tpu.runtime.executor import GraphExecutor
    got = GraphExecutor(best).run({"x": x_np}, return_numpy=True)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# nnet expression IR (reference test_Interpreter.cc / test_conv2gemm.cc)
# ---------------------------------------------------------------------------

def test_expr_matmul_evaluates(rng):
    from infinitensor_tpu.nnet.derivation import matmul_expr
    from infinitensor_tpu.nnet.evaluator import evaluate
    a = rng.standard_normal((4, 6), dtype=np.float32)
    b = rng.standard_normal((6, 5), dtype=np.float32)
    comp = matmul_expr(4, 6, 5)
    out = np.asarray(evaluate(comp, {"A": a, "B": b}))
    np.testing.assert_allclose(out, a @ b, rtol=1e-5)


def test_expr_conv_matches_lowering(rng):
    from infinitensor_tpu.nnet.derivation import conv_expr
    from infinitensor_tpu.nnet.evaluator import evaluate
    import torch
    x = rng.standard_normal((2, 3, 5, 5), dtype=np.float32)
    w = rng.standard_normal((4, 3, 3, 3), dtype=np.float32)
    comp = conv_expr(2, 3, 5, 5, 4, 3, 3, pad=1, stride=1)
    out = np.asarray(evaluate(comp, {"X": x, "W": w}))
    ref = torch.nn.functional.conv2d(torch.from_numpy(x),
                                     torch.from_numpy(w), padding=1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_conv1x1_derivation_equivalent(rng):
    from infinitensor_tpu.nnet.derivation import (
        conv_expr, conv1x1_to_matmul_expr, match_matmul)
    from infinitensor_tpu.nnet.evaluator import evaluate
    x = rng.standard_normal((2, 3, 4, 4), dtype=np.float32)
    w = rng.standard_normal((6, 3, 1, 1), dtype=np.float32)
    conv = conv_expr(2, 3, 4, 4, 6, 1, 1)
    derived = conv1x1_to_matmul_expr(conv)
    assert derived is not None
    ref = np.asarray(evaluate(conv, {"X": x, "W": w}))
    got = np.asarray(evaluate(derived, {"X": x, "W": w}))
    # derived is [n*oh*ow, f]; conv is [n, f, oh, ow]
    got4 = got.reshape(2, 4, 4, 6).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got4, ref, rtol=1e-4, atol=1e-5)


def test_match_matmul_recognizes_transposes():
    from infinitensor_tpu.nnet.derivation import matmul_expr, match_matmul
    for ta in (False, True):
        for tb in (False, True):
            comp = matmul_expr(3, 4, 5, ta, tb)
            m = match_matmul(comp)
            assert m is not None
            assert m["transA"] == ta and m["transB"] == tb


def test_membound_op_runs(rng):
    """MemBound op carrying an expression executes via the evaluator
    (reference MemBoundObj + TVM JIT path collapsed into XLA)."""
    from infinitensor_tpu.nnet.derivation import matmul_expr
    h = GraphHandler()
    x = h.input((4, 6), name="x")
    w = h.weight(rng.standard_normal((6, 5), dtype=np.float32), name="B")
    comp = matmul_expr(4, 6, 5, a_name="x", b_name="B")
    out_specs = [((4, 5), dt.FLOAT32)]
    out = h._add("MemBound", [x, w], {"expr": comp, "out_specs": out_specs})
    h.graph.infer_output_roles()
    x_np = rng.standard_normal((4, 6), dtype=np.float32)
    got = h.run({"x": x_np}, return_numpy=True)
    np.testing.assert_allclose(list(got.values())[0], x_np @ w.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_nmutator_conv1x1_membound(rng):
    """NMutator derives a MemBound matmul form of a 1x1 conv and the mutant
    matches numerically (reference test_mutator.cc / nmutator flow)."""
    from infinitensor_tpu.nnet.nmutator import NMutator
    from infinitensor_tpu.runtime.executor import GraphExecutor
    h = GraphHandler()
    x = h.input((2, 6, 5, 5), name="x")
    w = h.weight(rng.standard_normal((8, 6, 1, 1), dtype=np.float32))
    h.conv(x, w)
    h.graph.infer_output_roles()
    x_np = rng.standard_normal((2, 6, 5, 5), dtype=np.float32)
    ref = _run(h, {"x": x_np})
    muts = NMutator().run(h.graph)
    assert muts, "NMutator produced no mutants"
    mb = muts[0]
    assert any(op.op_type == "MemBound" for op in mb.operators)
    got = GraphExecutor(mb).run({"x": x_np}, return_numpy=True)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-4, atol=1e-5)


def test_search_with_nmutator(rng):
    from infinitensor_tpu.nnet.nmutator import NMutator
    from infinitensor_tpu.runtime.executor import GraphExecutor
    h = GraphHandler()
    x = h.input((1, 4, 4, 4), name="x")
    w = h.weight(rng.standard_normal((4, 4, 1, 1), dtype=np.float32))
    c = h.conv(x, w)
    h.relu(c)
    h.graph.infer_output_roles()
    x_np = rng.standard_normal((1, 4, 4, 4), dtype=np.float32)
    ref = _run(h, {"x": x_np})
    best = SearchEngine(mutator=NMutator()).run(h.graph)
    got = GraphExecutor(best).run({"x": x_np}, return_numpy=True)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-4, atol=1e-5)


def test_g2bmm_gbmm_vs_oracle(rng):
    """Longformer band matmuls vs a dense masked oracle
    (reference test/kernels cuda G2BMM/GBMM)."""
    h = GraphHandler()
    b, m, k, w_ = 2, 12, 8, 2
    a_np = rng.standard_normal((b, m, k), dtype=np.float32)
    b_np = rng.standard_normal((b, m, k), dtype=np.float32)
    A = h.input((b, m, k), name="A")
    B = h.input((b, m, k), name="B")
    band = h.g2bmm(A, B, width=w_)
    h.graph.infer_output_roles()
    out = h.run({"A": a_np, "B": b_np}, return_numpy=True)[band.name]
    # oracle: out[i, j] = <a_i, b_{i+j-w}> for valid offsets
    ref = np.zeros((b, m, 2 * w_ + 1), np.float32)
    for i in range(m):
        for jo in range(-w_, w_ + 1):
            src = i + jo
            if 0 <= src < m:
                ref[:, i, jo + w_] = np.einsum("bk,bk->b", a_np[:, i],
                                               b_np[:, src])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    h2 = GraphHandler()
    A2 = h2.input((b, m, 2 * w_ + 1), name="A2")
    B2 = h2.input((b, m, k), name="B2")
    o2 = h2.gbmm(A2, B2)
    h2.graph.infer_output_roles()
    band_np = rng.standard_normal((b, m, 2 * w_ + 1), dtype=np.float32)
    out2 = h2.run({"A2": band_np, "B2": b_np}, return_numpy=True)[o2.name]
    ref2 = np.zeros((b, m, k), np.float32)
    for i in range(m):
        for jo in range(-w_, w_ + 1):
            src = i + jo
            if 0 <= src < m:
                ref2[:, i] += band_np[:, i, jo + w_, None] * b_np[:, src]
    np.testing.assert_allclose(out2, ref2, rtol=1e-4, atol=1e-5)


def test_g2bmm_gbmm_scan_path_matches_gather(rng):
    """Large-band shift-scan lowering (no [b,m,2w+1,k] materialization)
    must equal the gather path (reference band kernel gbmm_g2bmm.cu)."""
    import infinitensor_tpu.ops.lowering as L
    from infinitensor_tpu.core.tensor import TensorRole

    def run_both(limit):
        old = L._BAND_GATHER_LIMIT
        L._BAND_GATHER_LIMIT = limit
        try:
            h = GraphHandler()
            a = h.input((2, 32, 8), name="a")
            b = h.input((2, 32, 8), name="b")
            g = h.g2bmm(a, b, width=2, dilation=2)
            v = h.gbmm(g, b, dilation=2)
            g.role = TensorRole.OUTPUT
            v.role = TensorRole.OUTPUT
            feeds = {"a": a_np, "b": b_np}
            return h.run(feeds, return_numpy=True), g.name, v.name
        finally:
            L._BAND_GATHER_LIMIT = old

    a_np = rng.standard_normal((2, 32, 8)).astype(np.float32)
    b_np = rng.standard_normal((2, 32, 8)).astype(np.float32)
    gather, gn, vn = run_both(1 << 24)
    scan, gn2, vn2 = run_both(1)
    np.testing.assert_allclose(scan[gn2], gather[gn], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(scan[vn2], gather[vn], rtol=1e-5, atol=1e-5)


def test_conv_act_fusion(rng):
    h = GraphHandler()
    x = h.input((1, 3, 8, 8), name="x")
    w = h.weight(rng.standard_normal((4, 3, 3, 3), dtype=np.float32))
    c = h.conv(x, w, pads=(1, 1))
    h.relu(c)
    h.graph.infer_output_roles()
    x_np = rng.standard_normal((1, 3, 8, 8), dtype=np.float32)
    before = _run(h, {"x": x_np})
    h.optimize(level=2)
    types = [op.op_type for op in h.graph.operators]
    assert "Relu" not in types
    assert h.graph.operators[0].attrs.get("act") == "Relu"
    after = _run(h, {"x": x_np})
    np.testing.assert_allclose(list(after.values())[0],
                               list(before.values())[0], rtol=1e-5)


def test_rewrite_speedup_workload_parity(rng):
    """tools/rewrite_speedup.py workload: QKV merge to fixpoint + transpose
    fold + identity/DCE preserve numerics exactly and shrink the graph."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.rewrite_speedup import build_graph
    from infinitensor_tpu.optimizer.rewrite import optimize_graph
    from infinitensor_tpu.optimizer.mutator import RuleBasedMutator
    from infinitensor_tpu.runtime.executor import GraphExecutor

    base = build_graph(layers=2, batch=4, dim=64)
    opt = build_graph(layers=2, batch=4, dim=64)
    optimize_graph(opt, level=2)
    mut = RuleBasedMutator()
    while mut.merge_parallel_matmuls(opt):
        pass
    opt.topo_sort()
    assert len(opt.operators) < len(base.operators)
    # per layer: 3 matmuls -> 1 matmul + 2 pairwise splits; transpose +
    # identity eliminated entirely
    assert sum(o.op_type == "MatMul" for o in opt.operators) == 2 * 2
    assert not any(o.op_type in ("Transpose", "Identity")
                   for o in opt.operators)
    feed = {"x": rng.standard_normal((4, 64), dtype=np.float32)}
    a = GraphExecutor(base).run(feed, return_numpy=True)[
        base.outputs()[0].name]
    b = GraphExecutor(opt).run(feed, return_numpy=True)[
        opt.outputs()[0].name]
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_band_attention_to_g2bmm_rewrite():
    """Standard-op Longformer band attention (full masked S x S scores)
    rewrites to G2BMM -> Softmax -> GBMM and matches numerically
    (round-5: the derivation-engine band win carried to model level)."""
    import numpy as np
    import infinitensor_tpu as it
    from infinitensor_tpu.optimizer.mutator import RuleBasedMutator
    from infinitensor_tpu.runtime import GraphExecutor

    bz, S, D, w = 2, 128, 64, 16
    rng = np.random.default_rng(0)
    h = it.GraphHandler(name="band_attn")
    q = h.input((bz, S, D), name="q")
    k = h.input((bz, S, D), name="k")
    v = h.input((bz, S, D), name="v")
    i, j = np.indices((S, S))
    mask = np.where(np.abs(i - j) <= w, np.float32(0), np.float32(-1e9))
    m = h.weight(mask, name="band_mask")
    scores = h.matmul(q, h.transpose(k, perm=[0, 2, 1]))
    probs = h.softmax(h.add(scores, m), axis=-1)
    out = h.matmul(probs, v)
    h.graph.infer_output_roles()

    g2 = h.graph.clone()
    mut = RuleBasedMutator()
    assert mut.band_attention_to_g2bmm(g2)
    g2.topo_sort()
    ops = {o.op_type for o in g2.operators}
    assert "G2BMM" in ops and "GBMM" in ops

    feed = {"q": rng.standard_normal((bz, S, D)).astype(np.float32),
            "k": rng.standard_normal((bz, S, D)).astype(np.float32),
            "v": rng.standard_normal((bz, S, D)).astype(np.float32)}
    r1 = np.asarray(GraphExecutor(h.graph).run(feed)[out.name])
    r2 = np.asarray(GraphExecutor(g2).run(feed)[g2.outputs()[0].name])
    err = np.max(np.abs(r1 - r2)) / (np.max(np.abs(r1)) + 1e-9)
    assert err < 2e-3, err
