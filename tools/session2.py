"""Round-4 TPU session 2: qmm Mosaic op diagnostics + serving re-bench
with INT8 KV / right-sized cache + paged serving with pipelining.
One device claim, artifact_r4-style stages."""

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

    import qmm_diag
    import serving_bench
    import paged_serving_bench
    only = os.environ.get("SESSION_ONLY", "")

    def want(n):
        return not only or n in only
    if want("diag"):
        stage("qmm_diag", qmm_diag.main)
    if want("serving"):
        stage("serving_bench_kv8", serving_bench.main)
    if want("paged"):
        os.environ.setdefault("PAGED_KV", "int8")
        os.environ.setdefault("PAGED_PIPELINE", "4")
        stage("paged_serving", paged_serving_bench.main)
    print(json.dumps({"metric": "r4 session2", "status": STATUS}))


if __name__ == "__main__":
    if (os.environ.get("BENCH_WATCHDOG", "1") == "1"
            and not os.environ.get("BENCH_CHILD")):
        from infinitensor_tpu.utils.watchdog import babysit
        sys.exit(babysit(
            [sys.executable, os.path.abspath(__file__)],
            quiet_s=600.0, gap_s=420.0, attempts=2,
            env=dict(os.environ, BENCH_CHILD="1")))
    main()
