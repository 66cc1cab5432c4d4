"""TPU smoke test: drives the graph/ONNX path (not just the native models)
on the real chip, exercising the Pallas lowerings behind the executor.

Run: python tools/tpu_smoke.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import functools
print = functools.partial(print, flush=True)


def main():
    import jax
    from infinitensor_tpu.core.handler import GraphHandler
    from infinitensor_tpu.core import dtype as dt
    from infinitensor_tpu.utils.platform import is_tpu

    print("backend:", jax.default_backend(), "is_tpu:", is_tpu(),
          "device:", jax.devices()[0])
    rng = np.random.default_rng(0)

    # 1. LLM op graph: RMSNorm -> RoPE -> AttentionKVCache
    B, H, S, D = 2, 8, 256, 128
    h = GraphHandler()
    kc = h.input((B, H, S, D), name="kc")
    vc = h.input((B, H, S, D), name="vc")
    x = h.input((B, 1, H * D), name="x")
    nrm = h.rms_norm(x, h.weight(np.ones(H * D, np.float32)))
    posv = h.weight(np.array([17], np.int32), name="pos")
    roped = h.rope(posv, nrm, dim_head=D)
    q = h.reshape(roped, (B, 1, H, D))
    qT = h.transpose(q, perm=[0, 2, 1, 3])
    outs = h.attention_kvcache(kc, vc, qT, qT, qT, posv)
    h.graph.infer_output_roles()
    feeds = {
        "kc": rng.standard_normal((B, H, S, D), dtype=np.float32),
        "vc": rng.standard_normal((B, H, S, D), dtype=np.float32),
        "x": rng.standard_normal((B, 1, H * D), dtype=np.float32),
    }
    t0 = time.perf_counter()
    res = h.run(feeds, return_numpy=True)
    print(f"1. llm-op graph OK ({time.perf_counter()-t0:.1f}s, "
          f"{len(res)} outputs, finite={all(np.isfinite(v).all() for v in res.values())})")

    # 2. ResNet block through ONNX round-trip on TPU
    from infinitensor_tpu.models.vision import (
        init_resnet18_params, build_resnet18)
    from infinitensor_tpu.onnx.exporter import export_onnx
    from infinitensor_tpu.onnx.importer import OnnxStub
    p = init_resnet18_params(rng, num_classes=16)
    hg = build_resnet18(p, batch=1, image=64, num_classes=16)
    stub = OnnxStub(export_onnx(hg.graph).serialize())
    xin = rng.standard_normal((1, 3, 64, 64), dtype=np.float32)
    a = hg.run({"input": xin}, return_numpy=True)
    b = stub.run({"input": xin}, return_numpy=True)
    d = max(np.abs(a[k] - b[k]).max() for k in a)
    print(f"2. resnet ONNX round-trip OK (max diff {d:.2e})")

    # 3. quantized matmul kernel vs oracle on-chip
    import jax.numpy as jnp
    from infinitensor_tpu.quant.weight_only import quantize_weight, wo_matmul
    from infinitensor_tpu.kernels.quant_matmul import quant_matmul_ref
    w = quantize_weight(jax.random.normal(jax.random.PRNGKey(0), (1024, 1024),
                                          jnp.float32), bits=8, group_size=128)
    xq = jax.random.normal(jax.random.PRNGKey(1), (4, 1024), jnp.bfloat16)
    got = np.asarray(wo_matmul(xq, w), np.float32)
    ref = np.asarray(quant_matmul_ref(xq, w), np.float32)
    print(f"3. quant matmul kernel OK (max diff {np.abs(got-ref).max():.3f} "
          f"rel {np.abs(got-ref).max()/np.abs(ref).max():.4f})")

    # 4. int4 path
    w4 = quantize_weight(jax.random.normal(jax.random.PRNGKey(2), (1024, 512),
                                           jnp.float32), bits=4,
                         group_size=128)
    got4 = np.asarray(wo_matmul(xq, w4), np.float32)
    ref4 = np.asarray(quant_matmul_ref(xq, w4), np.float32)
    print(f"4. int4 matmul kernel OK (rel "
          f"{np.abs(got4-ref4).max()/max(np.abs(ref4).max(),1e-6):.4f})")

    # 5. flash attention prefill kernel vs oracle
    from infinitensor_tpu.kernels.flash_attention import (
        flash_attention, mha_ref)
    qf = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 512, 128),
                           jnp.bfloat16)
    fa = np.asarray(flash_attention(qf, qf, qf, causal=True), np.float32)
    fr = np.asarray(mha_ref(qf, qf, qf, causal=True), np.float32)
    print(f"5. flash attention OK (max diff {np.abs(fa-fr).max():.4f})")

    # 6. INT8-KV flash-decode kernel vs jnp dequant oracle
    from infinitensor_tpu.kernels.attention import (
        flash_decode_q8, quantize_kv_row)
    rng = np.random.default_rng(9)
    B, H, Hkv, S, D = 2, 8, 4, 1024, 128
    q6 = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.bfloat16)
    kq, ksc = quantize_kv_row(
        jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32))
    vq, vsc = quantize_kv_row(
        jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.float32))
    pos6 = jnp.asarray([251, 1023], jnp.int32)
    o6 = np.asarray(flash_decode_q8(q6, kq, vq, ksc, vsc, pos6), np.float32)
    kd = np.asarray(kq, np.float32) * np.asarray(ksc)[..., None]
    vd = np.asarray(vq, np.float32) * np.asarray(vsc)[..., None]
    qf6 = np.asarray(q6, np.float32).reshape(B, Hkv, H // Hkv, D)
    s6 = np.einsum("bgrd,bgsd->bgrs", qf6, kd) / np.sqrt(D)
    m6 = (np.arange(S)[None, None, None, :]
          <= np.asarray(pos6)[:, None, None, None])
    s6 = np.where(m6, s6, -np.inf)
    p6 = np.exp(s6 - s6.max(-1, keepdims=True))
    p6 = p6 / p6.sum(-1, keepdims=True)
    e6 = np.einsum("bgrs,bgsd->bgrd", p6, vd).reshape(B, H, 1, D)
    print(f"6. int8-kv flash decode OK (max diff {np.abs(o6-e6).max():.4f})")

    print("TPU smoke: ALL OK")


if __name__ == "__main__":
    main()
