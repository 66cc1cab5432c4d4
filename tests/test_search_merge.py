"""Horizontal multi-branch merge (reference searchMerge,
src/core/search_engine.cc:206-316 + dummy_mutator.cc mergeMultiBranch):
sibling compute ops fuse into one bigger op, numerics preserved."""

import numpy as np

from infinitensor_tpu.core.handler import GraphHandler
from infinitensor_tpu.optimizer.merge import (
    apply_merges, find_merge_groups, search_merge)
from infinitensor_tpu.optimizer.search import SearchEngine
from infinitensor_tpu.runtime.executor import GraphExecutor


def _outputs(graph, feeds):
    return GraphExecutor(graph).run(feeds, return_numpy=True)


def test_shared_input_matmuls_merge(rng):
    h = GraphHandler()
    x = h.input((6, 16), name="x")
    w1 = h.weight(rng.standard_normal((16, 8), dtype=np.float32))
    w2 = h.weight(rng.standard_normal((16, 12), dtype=np.float32))
    o1 = h.matmul(x, w1)
    o2 = h.matmul(x, w2)
    h.graph.infer_output_roles()
    groups = find_merge_groups(h.graph)
    assert ("shared_a_matmul" in {k for k, _ in groups})
    merged = apply_merges(h.graph, groups)
    assert merged is not None
    assert sum(op.op_type == "MatMul" for op in merged.operators) == 1
    feeds = {"x": rng.standard_normal((6, 16), dtype=np.float32)}
    before = _outputs(h.graph, feeds)
    after = _outputs(merged, feeds)
    for k in before:
        np.testing.assert_allclose(after[k], before[k], rtol=1e-5, atol=1e-5)


def test_stacked_matmuls_merge(rng):
    h = GraphHandler()
    a = h.input((4, 8), name="a")
    b = h.input((4, 8), name="b")
    w1 = h.weight(rng.standard_normal((8, 8), dtype=np.float32))
    w2 = h.weight(rng.standard_normal((8, 8), dtype=np.float32))
    h.matmul(a, w1)
    h.matmul(b, w2)
    h.graph.infer_output_roles()
    groups = find_merge_groups(h.graph)
    assert groups and groups[0][0] == "stacked_matmul"
    merged = apply_merges(h.graph, groups)
    assert sum(op.op_type == "MatMul" for op in merged.operators) == 1
    mm = next(op for op in merged.operators if op.op_type == "MatMul")
    assert mm.inputs[0].shape == (2, 4, 8)       # batched
    feeds = {"a": rng.standard_normal((4, 8), dtype=np.float32),
             "b": rng.standard_normal((4, 8), dtype=np.float32)}
    before = _outputs(h.graph, feeds)
    after = _outputs(merged, feeds)
    for k in before:
        np.testing.assert_allclose(after[k], before[k], rtol=1e-5, atol=1e-5)


def test_sibling_convs_merge(rng):
    h = GraphHandler()
    x = h.input((1, 3, 8, 8), name="x")
    w1 = h.weight(rng.standard_normal((4, 3, 3, 3), dtype=np.float32))
    w2 = h.weight(rng.standard_normal((6, 3, 3, 3), dtype=np.float32))
    h.conv(x, w1, pads=(1, 1))
    h.conv(x, w2, pads=(1, 1))
    h.graph.infer_output_roles()
    groups = [g for g in find_merge_groups(h.graph)
              if g[0] == "sibling_conv"]
    assert groups
    merged = apply_merges(h.graph, groups)
    assert sum(op.op_type == "Conv" for op in merged.operators) == 1
    conv = next(op for op in merged.operators if op.op_type == "Conv")
    assert conv.outputs[0].shape[1] == 10        # 4 + 6 channels
    feeds = {"x": rng.standard_normal((1, 3, 8, 8), dtype=np.float32)}
    before = _outputs(h.graph, feeds)
    after = _outputs(merged, feeds)
    for k in before:
        np.testing.assert_allclose(after[k], before[k], rtol=1e-4, atol=1e-4)


def test_no_merge_across_dependency(rng):
    """Chained matmuls (one feeds the other) must NOT merge."""
    h = GraphHandler()
    x = h.input((8, 8), name="x")
    w1 = h.weight(rng.standard_normal((8, 8), dtype=np.float32))
    w2 = h.weight(rng.standard_normal((8, 8), dtype=np.float32))
    y = h.matmul(x, w1)
    h.matmul(y, w2)
    h.graph.infer_output_roles()
    assert find_merge_groups(h.graph) == []


def test_search_engine_merges_two_branch_graph(rng):
    """End-to-end: SearchEngine.run on a two-branch graph returns an
    equivalent graph, and the merged variant is among those scored."""
    h = GraphHandler()
    x = h.input((4, 32), name="x")
    w1 = h.weight(rng.standard_normal((32, 16), dtype=np.float32))
    w2 = h.weight(rng.standard_normal((32, 16), dtype=np.float32))
    h.matmul(x, w1)
    h.matmul(x, w2)
    h.graph.infer_output_roles()
    variants = search_merge(h.graph)
    assert variants, "two-branch graph must yield a merged variant"
    out = SearchEngine().run(h.graph)
    feeds = {"x": rng.standard_normal((4, 32), dtype=np.float32)}
    before = _outputs(h.graph, feeds)
    after = _outputs(out, feeds)
    for k in before:
        np.testing.assert_allclose(after[k], before[k], rtol=1e-5, atol=1e-5)


def test_transposed_sibling_matmuls_merge(rng):
    """transB=True siblings (weights [n, k]) merge: concat on the OUT
    axis 0, merged matmul keeps transB (round-2 verdict item 7)."""
    h = GraphHandler()
    x = h.input((6, 16), name="x")
    w1 = h.weight(rng.standard_normal((8, 16), dtype=np.float32))
    w2 = h.weight(rng.standard_normal((12, 16), dtype=np.float32))
    h.matmul(x, w1, trans_b=True)
    h.matmul(x, w2, trans_b=True)
    h.graph.infer_output_roles()
    groups = find_merge_groups(h.graph)
    assert ("shared_a_matmul" in {k for k, _ in groups})
    merged = apply_merges(h.graph, groups)
    mm = next(op for op in merged.operators if op.op_type == "MatMul")
    assert mm.attrs.get("transB") and mm.inputs[1].shape == (20, 16)
    feeds = {"x": rng.standard_normal((6, 16), dtype=np.float32)}
    before = _outputs(h.graph, feeds)
    after = _outputs(merged, feeds)
    for k in before:
        np.testing.assert_allclose(after[k], before[k], rtol=1e-5, atol=1e-5)


def test_gemm_bias_siblings_fuse_bias(rng):
    """Siblings whose outputs each feed a 1-D bias Add (the importer's
    Gemm decomposition) merge bias and all: one matmul + one Add."""
    h = GraphHandler()
    x = h.input((4, 16), name="x")
    for i, n in enumerate((8, 12)):
        w = h.weight(rng.standard_normal((16, n), dtype=np.float32))
        b = h.weight(rng.standard_normal((n,), dtype=np.float32))
        h.add(h.matmul(x, w), b)
    h.graph.infer_output_roles()
    merged = apply_merges(h.graph, find_merge_groups(h.graph))
    assert sum(op.op_type == "MatMul" for op in merged.operators) == 1
    assert sum(op.op_type == "Add" for op in merged.operators) == 1
    feeds = {"x": rng.standard_normal((4, 16), dtype=np.float32)}
    before = _outputs(h.graph, feeds)
    after = _outputs(merged, feeds)
    assert set(after) == set(before)
    for k in before:
        np.testing.assert_allclose(after[k], before[k], rtol=1e-5, atol=1e-5)


def test_gemm_bias_fusion_skips_graph_output_pre_bias(rng):
    """A sibling whose PRE-bias matmul output is itself a declared graph
    OUTPUT must not be bias-fused: fusion would delete a graph boundary
    tensor. The siblings still merge; the bias Adds stay separate and
    every declared output survives."""
    from infinitensor_tpu.core.tensor import TensorRole
    h = GraphHandler()
    x = h.input((4, 16), name="x")
    pre = []
    for n in (8, 12):
        w = h.weight(rng.standard_normal((16, n), dtype=np.float32))
        b = h.weight(rng.standard_normal((n,), dtype=np.float32))
        o = h.matmul(x, w)
        pre.append(o)
        h.add(o, b)
    h.graph.infer_output_roles()
    pre[0].role = TensorRole.OUTPUT     # pre-bias tensor is a boundary
    merged = apply_merges(h.graph, find_merge_groups(h.graph))
    assert merged is not None
    names = {t.name for t in merged.tensors}
    assert pre[0].name in names
    feeds = {"x": rng.standard_normal((4, 16), dtype=np.float32)}
    before = _outputs(h.graph, feeds)
    after = _outputs(merged, feeds)
    assert set(after) >= set(before)
    for k in before:
        np.testing.assert_allclose(after[k], before[k], rtol=1e-5,
                                   atol=1e-5)


def test_batched_3d_sibling_matmuls_merge(rng):
    """Already-batched [b,m,k] x [b,k,n] siblings concatenate along the
    existing batch dim into one bigger batched matmul."""
    h = GraphHandler()
    a = h.input((2, 4, 8), name="a")
    b = h.input((2, 4, 8), name="b")
    w1 = h.weight(rng.standard_normal((2, 8, 6), dtype=np.float32))
    w2 = h.weight(rng.standard_normal((2, 8, 6), dtype=np.float32))
    h.matmul(a, w1)
    h.matmul(b, w2)
    h.graph.infer_output_roles()
    groups = find_merge_groups(h.graph)
    assert groups and groups[0][0] == "stacked_matmul"
    merged = apply_merges(h.graph, groups)
    mm = next(op for op in merged.operators if op.op_type == "MatMul")
    assert mm.inputs[0].shape == (4, 4, 8)
    feeds = {"a": rng.standard_normal((2, 4, 8), dtype=np.float32),
             "b": rng.standard_normal((2, 4, 8), dtype=np.float32)}
    before = _outputs(h.graph, feeds)
    after = _outputs(merged, feeds)
    for k in before:
        np.testing.assert_allclose(after[k], before[k], rtol=1e-5, atol=1e-5)


def test_subset_enumeration_produces_partial_merges(rng):
    """With 3 siblings, search_merge enumerates variants that merge only
    a 2-subset (reference searchMergeDfs plan space), and every variant
    stays numerically exact."""
    h = GraphHandler()
    x = h.input((4, 16), name="x")
    for n in (8, 8, 8):
        h.matmul(x, h.weight(rng.standard_normal((16, n),
                                                 dtype=np.float32)))
    h.graph.infer_output_roles()
    variants = search_merge(h.graph)
    assert len(variants) >= 2
    mm_counts = sorted(sum(op.op_type == "MatMul" for op in v.operators)
                       for v in variants)
    assert 1 in mm_counts          # all three merged
    assert 2 in mm_counts          # a 2-subset merged, one left alone
    feeds = {"x": rng.standard_normal((4, 16), dtype=np.float32)}
    before = _outputs(h.graph, feeds)
    for v in variants:
        after = _outputs(v, feeds)
        for k in before:
            np.testing.assert_allclose(after[k], before[k],
                                       rtol=1e-5, atol=1e-5)


def test_search_engine_scores_transposed_merge(rng):
    """SearchEngine.run on a transposed-sibling graph returns a variant
    with the merged matmul (cost model accepted it) — 'merged and wins'."""
    h = GraphHandler()
    x = h.input((32, 64), name="x")
    for n in (64, 64):
        h.matmul(x, h.weight(rng.standard_normal((n, 64),
                                                 dtype=np.float32)),
                 trans_b=True)
    h.graph.infer_output_roles()
    out = SearchEngine().run(h.graph)
    feeds = {"x": rng.standard_normal((32, 64), dtype=np.float32)}
    before = _outputs(h.graph, feeds)
    after = _outputs(out, feeds)
    for k in before:
        np.testing.assert_allclose(after[k], before[k], rtol=1e-4,
                                   atol=1e-4)


def test_fold_constants_after_merge(rng):
    """Merged sibling weights concat-fold into ONE weight tensor: the
    merged graph must not re-concatenate constants every execution."""
    from infinitensor_tpu.optimizer.rewrite import optimize_graph

    h = GraphHandler()
    x = h.input((4, 16), name="x")
    h.matmul(x, h.weight(rng.standard_normal((16, 8), dtype=np.float32)))
    h.matmul(x, h.weight(rng.standard_normal((16, 8), dtype=np.float32)))
    h.graph.infer_output_roles()
    merged = apply_merges(h.graph, find_merge_groups(h.graph))
    assert any(op.op_type == "Concat" for op in merged.operators)
    optimize_graph(merged, level=2)
    assert not any(op.op_type == "Concat" for op in merged.operators)
    feeds = {"x": rng.standard_normal((4, 16), dtype=np.float32)}
    before = _outputs(h.graph, feeds)
    after = _outputs(merged, feeds)
    for k in before:
        np.testing.assert_allclose(after[k], before[k], rtol=1e-5,
                                   atol=1e-5)
