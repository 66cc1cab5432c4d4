"""Kernel-correctness tests: build graph -> run executor -> compare vs
numpy/torch oracle (the analog of reference test/kernels/* which compare
device kernels against the native-CPU kernels)."""

import numpy as np
import pytest

from infinitensor_tpu.core import dtype as dt
from infinitensor_tpu.core.handler import GraphHandler


def run1(h, feeds=None):
    outs = h.run(feeds or {}, return_numpy=True)
    assert len(outs) >= 1
    return list(outs.values())[0] if len(outs) == 1 else outs


def test_matmul_vs_numpy(rng):
    h = GraphHandler()
    a_np = rng.standard_normal((3, 4, 5), dtype=np.float32)
    b_np = rng.standard_normal((5, 6), dtype=np.float32)
    a = h.input((3, 4, 5))
    b = h.weight(b_np)
    h.matmul(a, b)
    out = run1(h, {a.name: a_np})
    np.testing.assert_allclose(out, a_np @ b_np, rtol=1e-4, atol=1e-5)


def test_matmul_trans(rng):
    h = GraphHandler()
    a_np = rng.standard_normal((5, 4), dtype=np.float32)
    b_np = rng.standard_normal((6, 5), dtype=np.float32)
    a = h.input((5, 4))
    b = h.weight(b_np)
    h.matmul(a, b, trans_a=True, trans_b=True)
    out = run1(h, {a.name: a_np})
    np.testing.assert_allclose(out, a_np.T @ b_np.T, rtol=1e-4, atol=1e-5)


def test_conv_vs_torch(rng):
    torch = pytest.importorskip("torch")
    x_np = rng.standard_normal((2, 3, 16, 16), dtype=np.float32)
    w_np = rng.standard_normal((8, 3, 3, 3), dtype=np.float32)
    h = GraphHandler()
    x = h.input(x_np.shape)
    w = h.weight(w_np)
    h.conv(x, w, pads=(1, 1), strides=(2, 2))
    out = run1(h, {x.name: x_np})
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x_np), torch.from_numpy(w_np), padding=1, stride=2
    ).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_grouped_conv_vs_torch(rng):
    torch = pytest.importorskip("torch")
    x_np = rng.standard_normal((1, 8, 10, 10), dtype=np.float32)
    w_np = rng.standard_normal((8, 1, 3, 3), dtype=np.float32)
    h = GraphHandler()
    x = h.input(x_np.shape)
    w = h.weight(w_np)
    h.conv(x, w, pads=(1, 1), group=8)
    out = run1(h, {x.name: x_np})
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x_np), torch.from_numpy(w_np), padding=1, groups=8
    ).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_conv_transpose_vs_torch(rng):
    torch = pytest.importorskip("torch")
    x_np = rng.standard_normal((1, 4, 7, 7), dtype=np.float32)
    w_np = rng.standard_normal((4, 6, 3, 3), dtype=np.float32)
    h = GraphHandler()
    x = h.input(x_np.shape)
    w = h.weight(w_np)
    h.conv_transpose(x, w, strides=(2, 2), pads=(1, 1), output_padding=(1, 1))
    out = run1(h, {x.name: x_np})
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x_np), torch.from_numpy(w_np), stride=2, padding=1,
        output_padding=1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_pools_vs_torch(rng):
    torch = pytest.importorskip("torch")
    x_np = rng.standard_normal((2, 4, 9, 9), dtype=np.float32)
    h = GraphHandler()
    x = h.input(x_np.shape)
    h.max_pool(x, kernel=(3, 3), strides=(2, 2), pads=(1, 1))
    out = run1(h, {x.name: x_np})
    ref = torch.nn.functional.max_pool2d(
        torch.from_numpy(x_np), 3, stride=2, padding=1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    h2 = GraphHandler()
    x2 = h2.input(x_np.shape)
    h2.avg_pool(x2, kernel=(3, 3), strides=(2, 2), pads=(1, 1))
    out2 = run1(h2, {x2.name: x_np})
    ref2 = torch.nn.functional.avg_pool2d(
        torch.from_numpy(x_np), 3, stride=2, padding=1,
        count_include_pad=False).numpy()
    np.testing.assert_allclose(out2, ref2, rtol=1e-4, atol=1e-5)


def test_batchnorm_layernorm_vs_torch(rng):
    torch = pytest.importorskip("torch")
    x_np = rng.standard_normal((2, 4, 5, 5), dtype=np.float32)
    scale = rng.standard_normal(4, dtype=np.float32)
    bias = rng.standard_normal(4, dtype=np.float32)
    mean = rng.standard_normal(4, dtype=np.float32)
    var = np.abs(rng.standard_normal(4, dtype=np.float32)) + 0.5
    h = GraphHandler()
    x = h.input(x_np.shape)
    h.batch_normalization(x, h.weight(scale), h.weight(bias), h.weight(mean),
                          h.weight(var))
    out = run1(h, {x.name: x_np})
    ref = torch.nn.functional.batch_norm(
        torch.from_numpy(x_np), torch.from_numpy(mean), torch.from_numpy(var),
        torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)

    h2 = GraphHandler()
    d = 16
    x2_np = rng.standard_normal((3, 7, d), dtype=np.float32)
    x2 = h2.input(x2_np.shape)
    s2 = rng.standard_normal(d, dtype=np.float32)
    b2 = rng.standard_normal(d, dtype=np.float32)
    h2.layer_normalization(x2, h2.weight(s2), h2.weight(b2), axis=-1)
    out2 = run1(h2, {x2.name: x2_np})
    ref2 = torch.nn.functional.layer_norm(
        torch.from_numpy(x2_np), (d,), torch.from_numpy(s2),
        torch.from_numpy(b2)).numpy()
    np.testing.assert_allclose(out2, ref2, rtol=1e-3, atol=1e-4)


def test_rmsnorm(rng):
    x_np = rng.standard_normal((2, 5, 8), dtype=np.float32)
    w_np = rng.standard_normal(8, dtype=np.float32)
    h = GraphHandler()
    x = h.input(x_np.shape)
    h.rms_norm(x, h.weight(w_np))
    out = run1(h, {x.name: x_np})
    ms = np.mean(x_np ** 2, axis=-1, keepdims=True)
    ref = x_np / np.sqrt(ms + 1e-6) * w_np
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_softmax_gelu_silu_vs_torch(rng):
    torch = pytest.importorskip("torch")
    x_np = rng.standard_normal((4, 10), dtype=np.float32)
    xt = torch.from_numpy(x_np)
    for build, ref in [
        (lambda h, x: h.softmax(x, axis=1),
         torch.nn.functional.softmax(xt, dim=1).numpy()),
        (lambda h, x: h.gelu(x), torch.nn.functional.gelu(xt).numpy()),
        (lambda h, x: h.silu(x), torch.nn.functional.silu(xt).numpy()),
        (lambda h, x: h.hard_swish(x),
         torch.nn.functional.hardswish(xt).numpy()),
    ]:
        h = GraphHandler()
        x = h.input(x_np.shape)
        build(h, x)
        out = run1(h, {x.name: x_np})
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_shape_ops(rng):
    h = GraphHandler()
    x_np = rng.standard_normal((2, 3, 4), dtype=np.float32)
    x = h.input(x_np.shape)
    y = h.transpose(x, perm=[2, 0, 1])
    z = h.reshape(y, (4, 6))
    h.slice(z, starts=[1], ends=[4], axes=[0])
    out = run1(h, {x.name: x_np})
    ref = np.transpose(x_np, (2, 0, 1)).reshape(4, 6)[1:4]
    np.testing.assert_allclose(out, ref)


def test_gather_reduce(rng):
    h = GraphHandler()
    data_np = rng.standard_normal((5, 7), dtype=np.float32)
    idx_np = np.array([[0, 2], [4, 1]], np.int64)
    data = h.input(data_np.shape)
    idx = h.weight(idx_np)
    g = h.gather(data, idx, axis=0)
    h.reduce_sum(g, axes=[2], keepdims=0)
    out = run1(h, {data.name: data_np})
    ref = data_np[idx_np].sum(-1)
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_attention_kvcache_matches_naive(rng):
    B, H, S, D = 2, 4, 32, 16
    h = GraphHandler()
    kc_np = rng.standard_normal((B, H, S, D), dtype=np.float32)
    vc_np = rng.standard_normal((B, H, S, D), dtype=np.float32)
    q_np = rng.standard_normal((B, H, 1, D), dtype=np.float32)
    k_np = rng.standard_normal((B, H, 1, D), dtype=np.float32)
    v_np = rng.standard_normal((B, H, 1, D), dtype=np.float32)
    pos_val = 7
    kc = h.input((B, H, S, D))
    vc = h.input((B, H, S, D))
    q = h.input((B, H, 1, D))
    k = h.input((B, H, 1, D))
    v = h.input((B, H, 1, D))
    pos = h.weight(np.array([pos_val], np.int32))
    h.attention_kvcache(kc, vc, q, k, v, pos)
    outs = h.run({kc.name: kc_np, vc.name: vc_np, q.name: q_np,
                  k.name: k_np, v.name: v_np}, return_numpy=True)
    # naive oracle
    kc2 = kc_np.copy()
    vc2 = vc_np.copy()
    kc2[:, :, pos_val] = k_np[:, :, 0]
    vc2[:, :, pos_val] = v_np[:, :, 0]
    scores = np.einsum("bhqd,bhsd->bhqs", q_np, kc2) / np.sqrt(D)
    scores[:, :, :, pos_val + 1:] = -np.inf
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqs,bhsd->bhqd", p, vc2)
    by_name = {k_: v_ for k_, v_ in outs.items()}
    attn = [v_ for k_, v_ in by_name.items() if v_.shape == (B, H, 1, D)]
    np.testing.assert_allclose(attn[0], ref, rtol=1e-4, atol=1e-5)
    caches = [v_ for k_, v_ in by_name.items() if v_.shape == (B, H, S, D)]
    assert len(caches) == 2


def test_quant_dequant_roundtrip(rng):
    h = GraphHandler()
    x_np = rng.standard_normal((4, 8), dtype=np.float32)
    x = h.input(x_np.shape)
    scale = h.weight(np.array(0.05, np.float32))
    zp = h.weight(np.array(0, np.int8))
    q = h.quantize_linear(x, scale, zp)
    h.dequantize_linear(q, scale, zp)
    h.graph.infer_output_roles()
    outs = h.run({x.name: x_np}, return_numpy=True)
    dq = [v for v in outs.values() if v.dtype == np.float32][0]
    assert np.abs(dq - np.clip(x_np, -128 * .05, 127 * .05)).max() <= 0.026


def test_small_cnn_end_to_end(rng):
    torch = pytest.importorskip("torch")
    x_np = rng.standard_normal((1, 3, 8, 8), dtype=np.float32)
    w1 = rng.standard_normal((4, 3, 3, 3), dtype=np.float32)
    b1 = rng.standard_normal(4, dtype=np.float32)
    wfc = rng.standard_normal((4 * 16, 10), dtype=np.float32)
    h = GraphHandler()
    x = h.input(x_np.shape)
    c = h.conv(x, h.weight(w1), bias=h.weight(b1), pads=(1, 1), strides=(2, 2))
    r = h.relu(c)
    f = h.flatten(r, axis=1)
    h.matmul(f, h.weight(wfc))
    out = run1(h, {x.name: x_np})
    ct = torch.nn.functional.conv2d(torch.from_numpy(x_np),
                                    torch.from_numpy(w1),
                                    torch.from_numpy(b1), padding=1, stride=2)
    ref = torch.relu(ct).flatten(1).numpy() @ wfc
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_executable_cache_reuse(rng):
    h = GraphHandler()
    x = h.input((2, 4))
    h.relu(x)
    ex = h.executor()
    a = rng.standard_normal((2, 4), dtype=np.float32)
    ex.run({x.name: a})
    assert len(ex._cache) == 1
    ex.run({x.name: a + 1})
    assert len(ex._cache) == 1  # same signature -> same executable


def test_executable_cache_lru_eviction(rng):
    """Bounded LRU executable cache (reference CUDA-Graph capture cache
    semantics, include/cuda/cuda_runtime.h:66-128: LRU, capacity 16)."""
    h = GraphHandler()
    x = h.input((2, 4))
    h.relu(x)
    ex = h.executor()
    ex.cache_capacity = 3
    sigs = []
    for i in range(5):
        feed = {x.name: np.zeros((2, 4 + i), np.float32)}
        ex._compiled(feed)
        sigs.append(ex._signature(feed))
    assert len(ex._cache) == 3
    assert sigs[0] not in ex._cache and sigs[1] not in ex._cache
    assert list(ex._cache) == sigs[2:]
    # a cache hit refreshes recency: sigs[2] survives the next insert
    ex._compiled({x.name: np.zeros((2, 6), np.float32)})    # hit sigs[2]
    ex._compiled({x.name: np.zeros((2, 99), np.float32)})   # new -> evict
    assert sigs[2] in ex._cache and sigs[3] not in ex._cache


def test_time_ms_host_fetch(rng):
    h = GraphHandler()
    x = h.input((16, 16))
    h.relu(x)
    ms = h.executor().time_ms(iters=3)
    assert ms >= 0.0


def test_profile_and_perf_engine(rng):
    from infinitensor_tpu.runtime.perf import PerfEngine
    h = GraphHandler()
    x = h.input((32, 32))
    w = h.weight(rng.standard_normal((32, 32), dtype=np.float32))
    y = h.matmul(x, w)
    h.relu(y)
    pe = PerfEngine()
    rows = h.executor().profile(perf_engine=pe)
    assert len(rows) == 2
    assert len(pe) == 2
    assert pe.graph_time_ms(h.graph) > 0
