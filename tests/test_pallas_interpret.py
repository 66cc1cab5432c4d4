"""Every Pallas kernel body runs on CPU via the Pallas interpreter and is
checked against its jnp oracle — so a kernel regression fails CI without a
chip. Mirrors the reference's kernel-vs-oracle tests
(/root/reference/test/kernels/cuda/test_cuda_matmul.cc) which run the CUDA
kernel against the native-CPU kernel; here interpret=True is the 'device'.

Fallback-proofing: where a kernel can silently fall back to its *_ref twin
(shape gates), the twin is monkeypatched to raise so a fallback fails loudly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from infinitensor_tpu.kernels import attention as att
from infinitensor_tpu.kernels import flash_attention as fa
from infinitensor_tpu.kernels import norms
from infinitensor_tpu.kernels import paged_attention as pa
from infinitensor_tpu.kernels import quant_matmul as qm
from infinitensor_tpu.quant.weight_only import quantize_weight


def _boom(*a, **k):
    raise AssertionError("kernel fell back to the jnp reference")


def test_flash_attention_interpret(rng):
    B, H, S, D = 1, 2, 512, 64
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    for causal in (True, False):
        want = fa.mha_ref(q, k, v, causal)
        got = fa.flash_attention(q, k, v, causal=causal, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)


def test_flash_decode_interpret(rng):
    B, H, Hkv, S, D = 2, 4, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    pos = jnp.asarray([100, S - 1], jnp.int32)
    got = att.flash_decode(q, kc, vc, pos, seq_block=128, interpret=True)
    # oracle: masked GQA over the dense cache
    rep = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, Hkv, rep, D)
    s = jnp.einsum("bgrd,bgsd->bgrs", qf, kc) / np.sqrt(D)
    mask = jnp.arange(S)[None, None, None, :] <= pos[:, None, None, None]
    p = jax.nn.softmax(jnp.where(mask, s, -jnp.inf), axis=-1)
    want = jnp.einsum("bgrs,bgsd->bgrd", p, vc).reshape(B, H, 1, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_decode_q8_interpret(rng):
    B, H, Hkv, S, D = 2, 4, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    kc = jnp.asarray(rng.integers(-127, 128, (B, Hkv, S, D)), jnp.int8)
    vc = jnp.asarray(rng.integers(-127, 128, (B, Hkv, S, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (B, Hkv, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (B, Hkv, S)), jnp.float32)
    pos = jnp.asarray([31, S - 1], jnp.int32)
    got = att.flash_decode_q8(q, kc, vc, ks, vs, pos, seq_block=128,
                              interpret=True)
    # the fn's own jnp fallback is the oracle (reached when off-TPU and
    # not interpreting)
    want = att.flash_decode_q8(q, kc, vc, ks, vs, pos, seq_block=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("bits", [8, 4])
def test_quant_matmul_interpret(rng, bits, monkeypatch):
    din, dout = 512, 256
    w = rng.standard_normal((din, dout)).astype(np.float32)
    q = quantize_weight(jnp.asarray(w), bits=bits, group_size=128)
    x = jnp.asarray(rng.standard_normal((3, din)), jnp.float32)
    want = qm.quant_matmul_ref(x, q)
    monkeypatch.setattr(qm, "quant_matmul_ref", _boom)
    got = qm.quant_matmul(x, q, interpret=True)
    # kernel dequantizes to bf16 in-registers (MXU input dtype); the fp32
    # oracle doesn't — tolerance is bf16 mantissa on |acc| ~ sqrt(din)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.3, rtol=0.05)


def test_rmsnorm_interpret(rng, monkeypatch):
    rows, d = 64, 256
    x = jnp.asarray(rng.standard_normal((rows, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d,)), jnp.float32)
    want = norms.rmsnorm_ref(x, w)
    monkeypatch.setattr(norms, "rmsnorm_ref", _boom)
    got = norms.rmsnorm(x, w, block_rows=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def _paged_setup(rng, q8=False):
    B, H, Hkv, D = 2, 4, 2, 64
    P, N, MP = 64, 8, 3
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    if q8:
        kp = jnp.asarray(rng.integers(-127, 128, (N, Hkv, P, D)), jnp.int8)
        vp = jnp.asarray(rng.integers(-127, 128, (N, Hkv, P, D)), jnp.int8)
        ksp = jnp.asarray(rng.uniform(0.005, 0.02, (N, Hkv, P)), jnp.float32)
        vsp = jnp.asarray(rng.uniform(0.005, 0.02, (N, Hkv, P)), jnp.float32)
    else:
        kp = jnp.asarray(rng.standard_normal((N, Hkv, P, D)), jnp.float32)
        vp = jnp.asarray(rng.standard_normal((N, Hkv, P, D)), jnp.float32)
        ksp = vsp = None
    table = jnp.asarray([[0, 3, 5], [7, 2, 1]], jnp.int32)
    pos = jnp.asarray([70, P * MP - 1], jnp.int32)
    return q, kp, vp, ksp, vsp, table, pos


def test_paged_decode_interpret(rng):
    q, kp, vp, _, _, table, pos = _paged_setup(rng)
    want = pa.paged_decode_ref(q, kp, vp, table, pos)
    got = pa.paged_flash_decode(q, kp, vp, table, pos, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_paged_decode_q8_interpret(rng):
    q, kp, vp, ksp, vsp, table, pos = _paged_setup(rng, q8=True)
    want = pa.paged_decode_q8_ref(q, kp, vp, ksp, vsp, table, pos)
    got = pa.paged_flash_decode_q8(q, kp, vp, ksp, vsp, table, pos,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_env_toggle_routes_dispatchers(rng, monkeypatch):
    """INFINITPU_PALLAS_INTERPRET=1 routes the high-level dispatchers
    (decode_attention_gqa et al.) through the kernel bodies on CPU."""
    monkeypatch.setenv("INFINITPU_PALLAS_INTERPRET", "1")
    B, H, Hkv, S, D = 1, 4, 2, 192, 64   # unique shapes: avoid jit cache
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.float32)
    pos = jnp.asarray([S // 2], jnp.int32)
    out, kc2, vc2 = att.decode_attention_gqa(kc, vc, q, k, v, pos)
    monkeypatch.delenv("INFINITPU_PALLAS_INTERPRET")
    # oracle via the pure-jnp path
    rep = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, Hkv, rep, D)
    s = jnp.einsum("bgrd,bgsd->bgrs", qf, kc2.astype(jnp.float32)) \
        / np.sqrt(D)
    mask = jnp.arange(S)[None, None, None, :] <= pos[:, None, None, None]
    p = jax.nn.softmax(jnp.where(mask, s, -jnp.inf), axis=-1)
    want = jnp.einsum("bgrs,bgsd->bgrd", p, vc2.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want.reshape(B, H, 1, D)),
        atol=2e-5, rtol=2e-5)


def test_quantized_decode_block_fused_norm_interpret(rng):
    """Full quantized decode step with the fused-norm matmul kernel
    (quant_matmul_norm) active via pallas_interpret, vs the pure-jnp
    path: token-level numerics must agree."""
    import jax
    import jax.numpy as jnp
    from infinitensor_tpu.models.llama import (
        LlamaConfig, init_kv_cache, init_llama_params, llama_decode_step,
        quantize_llama_params)
    from infinitensor_tpu.utils.config import config

    # bf16 activations: the only dtype the fused kernel accepts (wider
    # dtypes fall back so fused/unfused numerics can't silently diverge)
    cfg = LlamaConfig(vocab_size=256, dim=512, n_layers=2, n_heads=4,
                      n_kv_heads=4, intermediate=1024, max_seq=32,
                      dtype=jnp.bfloat16)
    params = quantize_llama_params(
        init_llama_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16),
        bits=8, group_size=128)
    tok = jnp.array([3], jnp.int32)
    pos = jnp.array([0], jnp.int32)

    want, _ = llama_decode_step(params, cfg, tok, pos,
                                init_kv_cache(cfg, 1, dtype=jnp.bfloat16))
    with config.override(pallas_interpret=True):
        got, _ = llama_decode_step(
            params, cfg, tok, pos, init_kv_cache(cfg, 1,
                                                 dtype=jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2)

    # fp32 input: quant_matmul_norm must take the exact fallback path,
    # so fused-config and plain-config numerics are bit-identical
    from infinitensor_tpu.kernels.quant_matmul import (
        quant_matmul, quant_matmul_norm)
    from infinitensor_tpu.quant.weight_only import quantize_weight
    x32 = jnp.asarray(np.random.default_rng(5).standard_normal((1, 512)),
                      jnp.float32)
    nw = jnp.ones((512,), jnp.float32)
    q = quantize_weight(
        jnp.asarray(np.random.default_rng(6).standard_normal((512, 256)),
                    jnp.float32), bits=8, group_size=128)
    eps = 1e-5
    ms = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    xn = (x32 * jax.lax.rsqrt(ms + eps)) * nw
    with config.override(pallas_interpret=True):
        fused = quant_matmul_norm(x32, nw, q, eps=eps)
        unfused = quant_matmul(xn, q)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(unfused))


def test_band_kernels_interpret(rng):
    """G2BMM/GBMM windowed band kernels vs the jnp gather oracle, through
    the graph lowering under pallas_interpret (reference
    gbmm_g2bmm.cu semantics)."""
    import jax.numpy as jnp
    from infinitensor_tpu.core.handler import GraphHandler
    from infinitensor_tpu.runtime.executor import GraphExecutor
    from infinitensor_tpu.utils.config import config

    w, m, k = 6, 64, 128
    a = rng.standard_normal((2, m, k)).astype(np.float32)
    b = rng.standard_normal((2, m, k)).astype(np.float32)

    h = GraphHandler()
    ta = h.input((2, m, k), name="a")
    tb = h.input((2, m, k), name="b")
    band = h.g2bmm(ta, tb, width=w)
    h.gbmm(band, tb)
    h.graph.infer_output_roles()

    want = GraphExecutor(h.graph).run({"a": a, "b": b}, return_numpy=True)
    with config.override(pallas_interpret=True):
        got = GraphExecutor(h.graph).run({"a": a, "b": b},
                                         return_numpy=True)
    for key in want:
        np.testing.assert_allclose(got[key], want[key], rtol=1e-4,
                                   atol=1e-4)


@pytest.mark.parametrize("bits", [8, 4])
def test_quant_matmul_w4a8_interpret(rng, bits):
    """W4A8 kernel (int8 activations, int8 MXU dots, scales on i32
    partials) vs its jnp oracle (tight: only f32 reduction-order
    differs) and vs the float matmul (loose: activation-quant error)."""
    import jax.numpy as jnp
    din, dout = 512, 256
    w = rng.standard_normal((din, dout)).astype(np.float32)
    q = quantize_weight(jnp.asarray(w), bits=bits, group_size=128)
    x = jnp.asarray(rng.standard_normal((3, din)), jnp.bfloat16)
    want = qm.quant_matmul_w4a8_ref(x, q)
    got = qm.quant_matmul(x, q, interpret=True, variant="w4a8")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.25, rtol=0.03)
    # the ADDED error of activation quantization (vs the weight-only
    # bf16 kernel on the same quantized weights) stays small
    wo = np.asarray(qm.quant_matmul_ref(x, q), np.float32)
    rel = np.max(np.abs(np.asarray(got, np.float32) - wo)) \
        / (np.max(np.abs(wo)) + 1e-9)
    assert rel < 0.08, rel


def test_quant_matmul_norm_w4a8_interpret(rng, monkeypatch):
    """Fused-norm W4A8 kernel vs norm-then-w4a8-kernel composition."""
    import jax
    import jax.numpy as jnp
    din, dout, eps = 512, 256, 1e-5
    w = rng.standard_normal((din, dout)).astype(np.float32)
    q = quantize_weight(jnp.asarray(w), bits=4, group_size=128)
    x = jnp.asarray(rng.standard_normal((2, din)), jnp.bfloat16)
    nw = jnp.asarray(rng.uniform(0.5, 1.5, (din,)), jnp.bfloat16)
    monkeypatch.setenv("INFINITPU_QMM_VARIANT", "w4a8")
    fused = qm.quant_matmul_norm(x, nw, q, eps=eps, interpret=True)
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    xn = ((x32 * jax.lax.rsqrt(ms + eps)).astype(jnp.bfloat16)
          * nw).astype(jnp.bfloat16)
    unfused = qm.quant_matmul(xn, q, interpret=True, variant="w4a8")
    # fused-vs-unfused can differ by single int8 rounding flips when a
    # 1-ulp bf16 difference in the normalized input crosses a round()
    # boundary — bound the difference relative to the output scale
    f, u = np.asarray(fused, np.float32), np.asarray(unfused, np.float32)
    assert np.max(np.abs(f - u)) / (np.max(np.abs(u)) + 1e-9) < 0.03


def test_quant_matmul_slab_paired_interpret(rng):
    """Paired-group int4 (quantize_weight paired=True) + slab kernel
    (one 2g-deep dot per packed group) vs the dequant oracle; norm-fused
    twin vs composition. Tolerances are scale-relative (bf16 dots)."""
    import jax
    import jax.numpy as jnp
    from infinitensor_tpu.quant.weight_only import dequantize_weight
    din, dout = 512, 256
    w = jnp.asarray(rng.standard_normal((din, dout)), jnp.float32)
    qp = quantize_weight(w, bits=4, group_size=128, paired=True)
    assert qp.paired and qp.scales.shape[0] == din // 256
    # paired round-trip error stays close to the normal-group error
    qn = quantize_weight(w, bits=4, group_size=128)
    ep = float(jnp.sqrt(jnp.mean(jnp.square(
        dequantize_weight(qp, jnp.float32) - w))))
    en = float(jnp.sqrt(jnp.mean(jnp.square(
        dequantize_weight(qn, jnp.float32) - w))))
    assert ep < 1.25 * en, (ep, en)

    x = jnp.asarray(rng.standard_normal((3, din)), jnp.bfloat16)
    got = np.asarray(qm.quant_matmul(x, qp, interpret=True), np.float32)
    want = np.asarray(qm.quant_matmul_ref(x, qp), np.float32)
    scale = np.max(np.abs(want)) + 1e-9
    assert np.max(np.abs(got - want)) / scale < 0.02

    nw = jnp.asarray(rng.uniform(0.5, 1.5, (din,)), jnp.bfloat16)
    fused = np.asarray(qm.quant_matmul_norm(x, nw, qp, interpret=True),
                       np.float32)
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    xn = ((x32 * jax.lax.rsqrt(ms + 1e-5)).astype(jnp.bfloat16)
          * nw).astype(jnp.bfloat16)
    unfused = np.asarray(qm.quant_matmul(xn, qp, interpret=True),
                         np.float32)
    assert np.max(np.abs(fused - unfused)) / (np.max(np.abs(unfused))
                                              + 1e-9) < 0.02


def test_quant_matmul_ln_interpret(rng):
    """Fused LayerNorm + int8 matmul + bias (GPT-2 decode pattern) vs
    the exact composition."""
    import jax
    import jax.numpy as jnp
    din, dout, eps = 512, 256, 1e-5
    w = rng.standard_normal((din, dout)).astype(np.float32)
    q = quantize_weight(jnp.asarray(w), bits=8, group_size=128)
    x = jnp.asarray(rng.standard_normal((5, din)), jnp.bfloat16)
    g = jnp.asarray(rng.uniform(0.5, 1.5, (din,)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((din,)) * 0.1, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((dout,)) * 0.1, jnp.bfloat16)
    got = qm.quant_matmul_ln(x, g, b, q, bias=bias, eps=eps,
                             interpret=True)
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
    xn = ((x32 - mu) * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32)
          + b.astype(jnp.float32)).astype(jnp.bfloat16)
    want = qm.quant_matmul(xn, q, interpret=True) + bias
    f, u = np.asarray(got, np.float32), np.asarray(want, np.float32)
    assert np.max(np.abs(f - u)) / (np.max(np.abs(u)) + 1e-9) < 0.02
