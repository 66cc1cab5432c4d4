"""Distributed TP tests on the 8-virtual-device CPU mesh — the analog of the
reference's threaded NCCL tests + launcher parity harness
(test/kernels/cuda/test_cuda_all_reduce.cc, cuda_launch.py max-abs-diff)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from infinitensor_tpu.core import dtype as dt
from infinitensor_tpu.core.handler import GraphHandler
from infinitensor_tpu.parallel.mesh import make_mesh
from infinitensor_tpu.parallel.planner import plan_tensor_parallel
from infinitensor_tpu.parallel.executor import TPExecutor

needs_devices = pytest.mark.skipif(len(jax.devices()) < 4,
                                   reason="needs >=4 virtual devices")


def _mlp_graph(rng, din=16, dh=32, dout=8, bias=True):
    h = GraphHandler()
    x = h.input((4, din), name="x")
    w1 = h.weight(rng.standard_normal((din, dh), dtype=np.float32))
    y = h.matmul(x, w1)
    if bias:
        b1 = h.weight(rng.standard_normal((dh,), dtype=np.float32))
        y = h.add(y, b1)
    y = h.relu(y)
    w2 = h.weight(rng.standard_normal((dh, dh), dtype=np.float32))
    y2 = h.relu(h.matmul(y, w2))
    w3 = h.weight(rng.standard_normal((dh, dout), dtype=np.float32))
    h.matmul(y2, w3)
    h.graph.infer_output_roles()
    return h


def test_plan_shards_megatron_pattern(rng):
    h = _mlp_graph(rng)
    plan = plan_tensor_parallel(h.graph, tp=4)
    ops = [op.op_type for op in plan.graph.operators]
    # column-parallel w1, row-parallel w2 with AllReduce after
    assert "AllReduceSum" in ops
    assert len(plan.sharded_weights) >= 2
    dims = sorted(v[0] for v in plan.sharded_weights.values())
    assert -1 in dims or 1 in dims or 0 in dims


@needs_devices
def test_tp_mlp_parity(rng):
    h = _mlp_graph(rng)
    x = rng.standard_normal((4, 16), dtype=np.float32)
    ref = h.run({"x": x}, return_numpy=True)
    plan = plan_tensor_parallel(h.graph, tp=4)
    ex = TPExecutor(plan, make_mesh({"tp": 4}, jax.devices()[:4]))
    got = ex.run({"x": x}, return_numpy=True)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-4, atol=1e-4)


@needs_devices
def test_tp_fused_qkv_with_split_parity(rng):
    """Fused QKV matmul followed by Split: grouped weight sharding
    (reference groups handling, parallel_opt.py:188-193)."""
    h = GraphHandler()
    dim, heads = 16, 4
    x = h.input((2, 8, dim), name="x")
    wqkv = h.weight(rng.standard_normal((dim, 3 * dim), dtype=np.float32))
    qkv = h.matmul(x, wqkv)
    q, k, v = h.split(qkv, axis=-1, num_or_sizes=3)
    s = h.matmul(h.transpose(q, perm=[0, 2, 1]), k)  # odd but exercises rules
    att = h.softmax(s, axis=-1)
    wo = h.weight(rng.standard_normal((dim, dim), dtype=np.float32))
    vv = h.matmul(v, wo)
    h.graph.infer_output_roles()
    x_np = rng.standard_normal((2, 8, dim), dtype=np.float32)
    ref = h.run({"x": x_np}, return_numpy=True)
    plan = plan_tensor_parallel(h.graph, tp=4)
    ex = TPExecutor(plan, make_mesh({"tp": 4}, jax.devices()[:4]))
    got = ex.run({"x": x_np}, return_numpy=True)
    for key in ref:
        np.testing.assert_allclose(got[key], ref[key], rtol=1e-4, atol=1e-4)


@needs_devices
def test_tp_transformer_block_parity(rng):
    """Full transformer block (RMSNorm -> QKV -> attention-shaped ops ->
    row-parallel out proj -> MLP) through planner + shard_map."""
    dim, heads, hd, S = 32, 4, 8, 8
    h = GraphHandler()
    x = h.input((1, S, dim), name="x")
    nrm = h.rms_norm(x, h.weight(np.ones(dim, np.float32)))
    wq = h.weight(rng.standard_normal((dim, dim), dtype=np.float32))
    wk = h.weight(rng.standard_normal((dim, dim), dtype=np.float32))
    wv = h.weight(rng.standard_normal((dim, dim), dtype=np.float32))
    q = h.reshape(h.matmul(nrm, wq), (1, S, heads, hd))
    k = h.reshape(h.matmul(nrm, wk), (1, S, heads, hd))
    v = h.reshape(h.matmul(nrm, wv), (1, S, heads, hd))
    qT = h.transpose(q, perm=[0, 2, 1, 3])
    kT = h.transpose(k, perm=[0, 2, 3, 1])
    vT = h.transpose(v, perm=[0, 2, 1, 3])
    att = h.softmax(h.matmul(qT, kT), axis=-1)
    ctx = h.matmul(att, vT)                       # [1, H, S, hd]
    ctx2 = h.reshape(h.transpose(ctx, perm=[0, 2, 1, 3]), (1, S, dim))
    wo = h.weight(rng.standard_normal((dim, dim), dtype=np.float32))
    attn_out = h.add(x, h.matmul(ctx2, wo))
    n2 = h.rms_norm(attn_out, h.weight(np.ones(dim, np.float32)))
    wup = h.weight(rng.standard_normal((dim, 4 * dim), dtype=np.float32))
    wdn = h.weight(rng.standard_normal((4 * dim, dim), dtype=np.float32))
    mlp = h.matmul(h.gelu(h.matmul(n2, wup)), wdn)
    h.add(attn_out, mlp)
    h.graph.infer_output_roles()

    x_np = rng.standard_normal((1, S, dim), dtype=np.float32)
    ref = h.run({"x": x_np}, return_numpy=True)
    plan = plan_tensor_parallel(h.graph, tp=4)
    ops = [op.op_type for op in plan.graph.operators]
    assert "AllReduceSum" in ops
    ex = TPExecutor(plan, make_mesh({"tp": 4}, jax.devices()[:4]))
    got = ex.run({"x": x_np}, return_numpy=True)
    for key in ref:
        np.testing.assert_allclose(got[key], ref[key], rtol=5e-4, atol=5e-4)


@needs_devices
def test_comm_ops_via_shard_map(rng):
    """Direct comm-op lowering check (reference test_cuda_all_reduce.cc)."""
    from jax import shard_map as _sm  # availability probe
    mesh = make_mesh({"tp": 4}, jax.devices()[:4])
    x = jnp.arange(8, dtype=jnp.float32).reshape(4, 2)

    def f(xl):
        from infinitensor_tpu.core.operator import Operator
        from infinitensor_tpu.core.tensor import TensorObj
        from infinitensor_tpu.core import dtype as dtm
        from infinitensor_tpu.ops.lowering import lower_op, LowerCtx
        t = TensorObj((1, 2), dtm.FLOAT32)
        o = TensorObj((1, 2), dtm.FLOAT32)
        op = Operator("AllReduceSum", [t], [o], {})
        return lower_op(op, [xl], LowerCtx(axis_name="tp"))[0]

    out = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P("tp"),
                                out_specs=P("tp"), check_vma=False))(x)
    expected = np.tile(np.asarray(x).sum(0, keepdims=True), (4, 1))
    np.testing.assert_allclose(np.asarray(out), expected)


@needs_devices
def test_tp_attention_kvcache_parity(rng):
    """Decode-attention graph sharded on the head dim (reference
    distributed GPT-2/Llama harness pattern), through ONNX round-trip +
    planner + shard_map."""
    from infinitensor_tpu.onnx.exporter import export_onnx
    from infinitensor_tpu.onnx.importer import OnnxStub
    B, H, S, D = 1, 8, 32, 16
    dim = H * D
    h = GraphHandler()
    kc = h.input((B, H, S, D), name="kc")
    vc = h.input((B, H, S, D), name="vc")
    x = h.input((B, 1, dim), name="x")
    wq = h.weight(rng.standard_normal((dim, dim), dtype=np.float32))
    wk = h.weight(rng.standard_normal((dim, dim), dtype=np.float32))
    wv = h.weight(rng.standard_normal((dim, dim), dtype=np.float32))
    q = h.transpose(h.reshape(h.matmul(x, wq), (B, 1, H, D)),
                    perm=[0, 2, 1, 3])
    k = h.transpose(h.reshape(h.matmul(x, wk), (B, 1, H, D)),
                    perm=[0, 2, 1, 3])
    v = h.transpose(h.reshape(h.matmul(x, wv), (B, 1, H, D)),
                    perm=[0, 2, 1, 3])
    pos = h.weight(np.array([5], np.int32), name="pos")
    att, kco, vco = h.attention_kvcache(kc, vc, q, k, v, pos)
    merged = h.reshape(h.transpose(att, perm=[0, 2, 1, 3]), (B, 1, dim))
    wo = h.weight(rng.standard_normal((dim, dim), dtype=np.float32))
    h.matmul(merged, wo)
    h.graph.infer_output_roles()
    # drop cache outputs from the comparison surface: keep only final matmul
    for t in (kco, vco):
        t.role = t.role.__class__.OTHERS

    feeds = {"kc": rng.standard_normal((B, H, S, D), dtype=np.float32),
             "vc": rng.standard_normal((B, H, S, D), dtype=np.float32),
             "x": rng.standard_normal((B, 1, dim), dtype=np.float32)}
    ref = h.run(feeds, return_numpy=True)

    # ONNX round-trip first (custom-domain ops), then plan TP
    stub = OnnxStub(export_onnx(h.graph).serialize())
    plan = plan_tensor_parallel(stub.handler.graph, tp=4)
    assert plan.sharded_weights, "attention graph did not shard"
    ex = TPExecutor(plan, make_mesh({"tp": 4}, jax.devices()[:4]))
    got = ex.run(feeds, return_numpy=True)
    for key in ref:
        np.testing.assert_allclose(got[key], ref[key], rtol=5e-4, atol=5e-4)
