"""Round-4 TPU session 5: hardened accuracy gate (train on-chip),
derivation-engine measurement, and DECODE_BUDGET regeneration under the
fuse4 kernels."""

import functools
import gc
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

STATUS: dict = {}


def stage(name, fn):
    print(f"# ==== stage {name} ====")
    t0 = time.time()
    try:
        fn()
        STATUS[name] = {"ok": True, "s": round(time.time() - t0, 1)}
    except Exception as e:  # noqa: BLE001
        STATUS[name] = {"ok": False, "error": repr(e)[:300]}
        traceback.print_exc()
    gc.collect()


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
    threading.Thread(target=heartbeat, daemon=True).start()

    only = os.environ.get("SESSION_ONLY", "")

    def want(n):
        return not only or n in only

    if want("gate"):
        import train_gate_lm2
        stage("ppl_gate_v2", train_gate_lm2.main)
    if want("budget"):
        import decode_profile
        stage("decode_budget_regen", decode_profile.main)
    # derivation LAST: a mutant-graph OOM in session 5 left the process
    # unable to allocate for every later stage
    if want("deriv"):
        import derivation_bench
        stage("derivation_bench", derivation_bench.main)
    print(json.dumps({"metric": "r4 session5", "status": STATUS}))


if __name__ == "__main__":
    if (os.environ.get("BENCH_WATCHDOG", "1") == "1"
            and not os.environ.get("BENCH_CHILD")):
        from infinitensor_tpu.utils.watchdog import babysit
        sys.exit(babysit(
            [sys.executable, os.path.abspath(__file__)],
            quiet_s=600.0, gap_s=420.0, attempts=2,
            env=dict(os.environ, BENCH_CHILD="1")))
    main()
