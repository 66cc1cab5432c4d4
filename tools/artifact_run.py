"""One-session on-chip artifact collection.

The tunnel allows one TPU process at a time and wedges between processes
(CLAUDE.md), so every BASELINE artifact the round needs is collected
sequentially in ONE device claim:

  1. vision_parity device pass   (BASELINE config 1; needs the CPU ref
     pass to have been run first: JAX_PLATFORMS=cpu tools/vision_parity.py)
  2. bert_parity                 (BASELINE config 2)
  3. rewrite_speedup qkv         (driver metric #3)
  4. rewrite_speedup inception   (merge win on an imported real model)
  5. graph-IR llama decode       (framework-loop LLM artifact, on chip)
  6. train_gate_lm               (trained-instrument accuracy gates)

Each stage is independent: a failure is recorded and the session moves
on. Writes docs/ARTIFACTS_R3.json with per-stage status.
"""

import functools
import json
import os
import sys
import threading
import time
import traceback

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tools"))
print = functools.partial(print, flush=True)

OUT = os.path.join(_ROOT, "docs", "ARTIFACTS_R3.json")
STATUS: dict = {}


def stage(name):
    def deco(fn):
        def run():
            print(f"# ==== stage {name} ====")
            t0 = time.time()
            try:
                fn()
                STATUS[name] = {"ok": True,
                                "s": round(time.time() - t0, 1)}
            except Exception as e:  # noqa: BLE001
                STATUS[name] = {"ok": False, "error": repr(e)[:300],
                                "s": round(time.time() - t0, 1)}
                traceback.print_exc()
            with open(OUT, "w") as f:
                json.dump(STATUS, f, indent=1)
        run.__name__ = name
        return run
    return deco


@stage("vision_parity")
def s_vision():
    ref = os.environ.get("VISION_REF", "/tmp/vision_ref.npz")
    assert os.path.exists(ref), f"CPU reference pass missing: {ref}"
    import vision_parity
    vision_parity.main()


@stage("bert_parity")
def s_bert():
    import bert_parity
    bert_parity.main()


@stage("rewrite_speedup_qkv")
def s_rw_qkv():
    import rewrite_speedup
    os.environ.pop("RS_MODEL", None)
    rewrite_speedup.main()


@stage("rewrite_speedup_inception")
def s_rw_inc():
    import rewrite_speedup
    os.environ["RS_MODEL"] = "inception"
    os.environ.setdefault("RS_ITERS", "8")
    rewrite_speedup.main()
    os.environ.pop("RS_MODEL", None)


@stage("graph_llama_onchip")
def s_graph_llama():
    """The framework-loop LLM on the chip: graph-IR decode (donated KV
    state through GraphExecutor.stepper) vs the native model, token
    parity + per-step latency. Small MHA geometry (the graph op is MHA,
    like the reference's)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from infinitensor_tpu.models.llama import (
        LlamaConfig, init_kv_cache, init_llama_params, llama_decode_step)
    from infinitensor_tpu.models.graph_llama import (
        build_llama_decoder, graph_greedy_decode)

    cfg = LlamaConfig(vocab_size=2048, dim=512, n_layers=4, n_heads=8,
                      n_kv_heads=8, intermediate=1376, max_seq=256,
                      dtype=jnp.float32)
    params = init_llama_params(cfg, jax.random.PRNGKey(7),
                               dtype=jnp.float32)
    cache = init_kv_cache(cfg, 1, dtype=jnp.float32)
    tok = jnp.full((1,), 5, jnp.int32)
    step = jax.jit(llama_decode_step, static_argnums=1, donate_argnums=4)
    native = []
    for j in range(16):
        lg, cache = step(params, cfg, tok,
                         jnp.full((1,), j, jnp.int32), cache)
        tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        native.append(int(np.asarray(tok)[0]))

    dec = build_llama_decoder(params, cfg, batch=1)
    t0 = time.time()
    got = graph_greedy_decode(dec, first_token=5, n_steps=16, start_pos=0)
    wall = time.time() - t0
    agree = [int(a) for a in got[0]] == native
    art = {
        "metric": "graph-IR llama decode on chip (ONNX-op graph via "
                  "GraphExecutor.stepper, donated KV)",
        "tokens_graph": [int(a) for a in got[0]],
        "tokens_native": native,
        "token_parity": bool(agree),
        "steps": 16,
        "wall_s_graph_incl_compile": round(wall, 2),
        "device": str(jax.devices()[0]),
    }
    with open(os.path.join(_ROOT, "docs", "GRAPH_LLM_ONCHIP.json"),
              "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art))
    assert agree, "graph decode tokens diverged from native on chip"


@stage("train_gate_lm")
def s_gate():
    import train_gate_lm
    train_gate_lm.main()


def main():
    def heartbeat():
        n = 0
        while True:
            time.sleep(120)
            n += 1
            print(f"# heartbeat {n}")

    import jax
    import numpy as np
    np.asarray(jax.numpy.zeros((1,)))
    print(f"# device ready: {jax.devices()[0]}")
    # heartbeats AFTER the claim: during the claim, silence is the
    # watchdog's only wedge signal
    threading.Thread(target=heartbeat, daemon=True).start()
    only = os.environ.get("ARTIFACT_ONLY")
    stages = [s_vision, s_bert, s_rw_qkv, s_rw_inc, s_graph_llama, s_gate]
    for s in stages:
        if only and not any(tok and tok in s.__name__
                            for tok in only.split(",")):
            continue
        s()
    print(json.dumps({"metric": "artifact session", "status": STATUS}))


if __name__ == "__main__":
    if (os.environ.get("BENCH_WATCHDOG", "1") == "1"
            and not os.environ.get("BENCH_CHILD")):
        from infinitensor_tpu.utils.watchdog import babysit
        sys.exit(babysit(
            [sys.executable, os.path.abspath(__file__)],
            quiet_s=600.0, gap_s=420.0, attempts=2,
            env=dict(os.environ, BENCH_CHILD="1")))
    main()
