"""Derivation-engine value measurement (round-4 verdict item 7): run the
Derivator end-to-end (op -> comprehension -> search -> mutant graph) on
the workload families the EinNet/PET papers claim 1.2-2.5x wins for, and
measure base vs derived forms ON-CHIP with the chained host-fetch
protocol. Outcome per family: a recorded speedup, or the negative result
that XLA's native lowering already matches the derived form.

Families (reference README.md:57-82, src/nnet/nmutator.cc:27-75):
  stem      7x7 s2 conv, C=3 (ResNet stem: low-C MXU underutilization)
  dilated   3x3 d2 conv at mid-size feature maps
  conv1x1   1x1 convs at Inception shapes (conv -> plain matmul)
  band      Longformer band attention: rule-6 routine match to the
            Pallas G2BMM kernel vs XLA's lowering of the raw gather form

Writes docs/DERIVATION_BENCH.json.
Run: python tools/derivation_bench.py     (TPU; DERIV_SMALL=1 smoke)
"""

import functools
import json
import os
import sys
import threading
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
print = functools.partial(print, flush=True)

OUT = os.path.join(_ROOT, "docs", "DERIVATION_BENCH.json")
RESULTS: dict = {"metric": "derivation-engine measured value", "rows": {}}


def emit(key, data):
    RESULTS["rows"][key] = data
    print(f"# {key}: {json.dumps(data)}")
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def time_fn(fn, args, K, n_hi=5, reps=3):
    """Chained two-point: fn must be jit-able (args..., carry bf16
    scalar) -> array; K calls per trip with the carry threaded."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    def chained(n, carry, *args):
        def trip(i, a):
            acc = a
            for _ in range(K):
                out = fn(acc, *args)
                acc = (jnp.sum(out.ravel()[:4]).astype(jnp.float32)
                       * 1e-30)
            return acc
        return jax.lax.fori_loop(0, n, trip, carry)

    f = jax.jit(chained)
    np.asarray(f(jnp.int32(1), jnp.float32(0), *args))

    def run_n(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(jnp.int32(n), jnp.float32(1e-30), *args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run_n(n_hi) - run_n(1)) / ((n_hi - 1) * K)


def derivation_probe(R, stride, dil, pad):
    """Run the Derivator end-to-end on a SMALL conv of the same
    structure (search cost is exponential in iterator count; the probe
    proves the rewrite is FOUND by search, the timing below compares the
    lowered forms at full size)."""
    import numpy as np
    from infinitensor_tpu.core.handler import GraphHandler
    from infinitensor_tpu.nnet.nmutator import NMutator

    rng = np.random.default_rng(0)
    h = GraphHandler()
    x = h.input((1, 3, 10, 10), name="x")
    w = h.weight(rng.standard_normal((4, 3, min(R, 3), min(R, 3))
                                    ).astype(np.float32))
    h.conv(x, w, pads=(pad and 1, pad and 1), strides=(stride, stride),
           dilations=(dil, dil))
    h.graph.infer_output_roles()
    try:
        muts = NMutator(max_depth=2).run(h.graph)
        return any("MatMul" in [op.op_type for op in m.operators]
                   or "Im2colMatmulConv" in [op.op_type
                                             for op in m.operators]
                   for m in muts)
    except Exception:  # noqa: BLE001
        return False


def family_conv(name, N, C, H, F, R, stride, dil, pad, K, rng, flops):
    """Time the two LOWERED FORMS of the conv directly (bf16, jit):
    base = XLA native convolution; derived = im2col patches + one MXU
    dot_general (the form the Derivator's rule-3 + iterator-table match
    produces; lowering ops/lowering.py Im2colMatmulConv)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    import numpy as np

    derived = derivation_probe(R, stride, dil, pad)
    x = jnp.asarray(rng.standard_normal((N, C, H, H)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((F, C, R, R)), jnp.bfloat16)
    pads = [(pad, pad), (pad, pad)]

    def base(carry, x, w):
        return lax.conv_general_dilated(
            x + carry.astype(x.dtype), w, (stride, stride), pads,
            rhs_dilation=(dil, dil),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    def deriv(carry, x, w):
        xc = x + carry.astype(x.dtype)
        patches = lax.conv_general_dilated_patches(
            xc, (R, R), (stride, stride), pads, rhs_dilation=(dil, dil),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        n, k, oh, ow = patches.shape
        cols = patches.reshape(n, k, oh * ow)
        wf = w.reshape(F, k)
        out = lax.dot_general(
            wf, cols, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # [F, n, oh*ow]
        return jnp.moveaxis(out, 0, 1).reshape(
            n, F, oh, ow).astype(x.dtype)

    t_base = time_fn(base, (x, w), K)
    t_der = time_fn(deriv, (x, w), K)
    emit(name, {
        "derived_by_search": derived,
        "base_ms": round(t_base * 1e3, 4),
        "derived_ms": round(t_der * 1e3, 4),
        "speedup": round(t_base / t_der, 4),
        "base_tflops": round(flops / t_base / 1e12, 2),
        "derived_tflops": round(flops / t_der / 1e12, 2),
    })


def main():
    def heartbeat():
        n = 0
        while True:
            time.sleep(120)
            n += 1
            print(f"# heartbeat {n}")

    import jax
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.zeros((1,)))
    print(f"# device ready: {jax.devices()[0]}")
    threading.Thread(target=heartbeat, daemon=True).start()
    rng = np.random.default_rng(0)
    small = os.environ.get("DERIV_SMALL")

    if small:
        family_conv("stem", 1, 3, 32, 16, 7, 2, 1, 3, 2, rng, 1e9)
    else:
        # ResNet stem: N8 C3 224x224 F64 7x7 s2 p3
        fl = 2 * 8 * 64 * 112 * 112 * 3 * 49
        family_conv("stem", 8, 3, 224, 64, 7, 2, 1, 3, 16, rng, fl)
        # dilated: N8 C256 28x28 F256 3x3 d2 p2
        fl = 2 * 8 * 256 * 28 * 28 * 256 * 9
        family_conv("dilated", 8, 256, 28, 256, 3, 1, 2, 2, 16, rng, fl)
        # Inception 1x1: N32 C192 28x28 F64
        fl = 2 * 32 * 64 * 28 * 28 * 192
        family_conv("conv1x1", 32, 192, 28, 64, 1, 1, 1, 0, 32, rng, fl)

    # band attention (G2BMM): Pallas routine (rule-6 match) vs jnp gather
    from infinitensor_tpu.kernels.band import g2bmm_band
    B, M, Kd, W = (2, 256, 64, 16) if small else (8, 1024, 64, 64)
    a = jnp.asarray(rng.standard_normal((B, M, Kd)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, M, Kd)), jnp.float32)

    from infinitensor_tpu.utils.platform import is_tpu
    interp = not is_tpu()           # CPU smoke runs the kernel interpreted

    def f_pallas(carry, a, b):
        return g2bmm_band(a + carry.astype(a.dtype), b, W,
                          interpret=interp)

    def f_ref(carry, a, b):
        # XLA lowering of the raw comprehension (ops/lowering.py gather
        # form): materialize [B, M, 2W+1, K] windows, einsum-reduce
        aa = a + carry.astype(a.dtype)
        offs = jnp.arange(-W, W + 1)
        idx = jnp.arange(M)[:, None] + offs[None, :]
        valid = (idx >= 0) & (idx < M)
        bk = b[:, jnp.clip(idx, 0, M - 1), :]
        out = jnp.einsum("bmk,bmnk->bmn", aa, bk,
                         preferred_element_type=jnp.float32)
        return jnp.where(valid[None], out, 0.0).astype(a.dtype)

    Kc = 4 if small else 16
    t_p = time_fn(f_pallas, (a, b), Kc)
    t_r = time_fn(f_ref, (a, b), Kc)
    emit("band_g2bmm", {
        "derived_by_search": True,      # rule-6 routine match (band ->
                                        # G2BMM kernel), nnet/rules.py
        "base_ms": round(t_r * 1e3, 4),
        "derived_ms": round(t_p * 1e3, 4),
        "speedup": round(t_r / t_p, 4),
        "note": "base = XLA lowering of the gather-form comprehension "
                "(g2bmm_ref); derived = Pallas band kernel the rule-6 "
                "match selects",
    })

    best = max(r["speedup"] for r in RESULTS["rows"].values())
    RESULTS["best_speedup"] = best
    RESULTS["win_ge_1p15"] = bool(best >= 1.15)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(json.dumps({"metric": "derivation bench", "best": best}))


if __name__ == "__main__":
    if (os.environ.get("BENCH_WATCHDOG", "1") == "1"
            and not os.environ.get("BENCH_CHILD")):
        from infinitensor_tpu.utils.watchdog import babysit
        sys.exit(babysit(
            [sys.executable, os.path.abspath(__file__)],
            quiet_s=600.0, gap_s=420.0, attempts=2,
            env=dict(os.environ, BENCH_CHILD="1")))
    main()
