"""Round-4 TPU session 3: nib8 shift-free unpack sweep + serving
variable isolation ((kv dtype) x (cache size) — session 2 changed both
at once and went backwards)."""

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

    import importlib
    import qmm_explore
    import serving_bench
    only = os.environ.get("SESSION_ONLY", "")

    def want(n):
        return not only or n in only

    if want("explore"):
        os.environ["QMM_VARIANTS"] = "group,nib8"
        stage("qmm_explore_nib8", qmm_explore.main)

    if want("serving"):
        # A/B the two variables separately, fewer reps to bound time
        os.environ["SERVE_REPS"] = "1"

        def run_cfg(tag, kv, maxseq):
            os.environ["SERVE_KV"] = kv
            os.environ["SERVE_MAXSEQ"] = str(maxseq)
            importlib.reload(serving_bench)
            stage(f"serving_{tag}", serving_bench.main)

        run_cfg("bf16_384", "none", 384)
        run_cfg("int8_1024", "int8", 1024)
    print(json.dumps({"metric": "r4 session3", "status": STATUS}))


if __name__ == "__main__":
    if (os.environ.get("BENCH_WATCHDOG", "1") == "1"
            and not os.environ.get("BENCH_CHILD")):
        from infinitensor_tpu.utils.watchdog import babysit
        sys.exit(babysit(
            [sys.executable, os.path.abspath(__file__)],
            quiet_s=600.0, gap_s=420.0, attempts=2,
            env=dict(os.environ, BENCH_CHILD="1")))
    main()
