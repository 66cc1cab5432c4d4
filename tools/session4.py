"""Round-4 TPU session 4: re-tune the dequant-matmul tile table under the
fuse4 decode (sweep + 49-pass refine), then run the full flagship bench
(serving + decode + dual roofline) with the new table."""

import functools
import gc
import importlib
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

    import qmm_tune
    only = os.environ.get("SESSION_ONLY", "")

    def want(n):
        return not only or n in only

    if want("tune"):
        stage("qmm_tune_sweep", qmm_tune.main)
        os.environ["QMM_REFINE"] = os.path.join(_ROOT, "docs",
                                                "QMM_TUNE_REPORT.json")
        importlib.reload(qmm_tune)
        stage("qmm_tune_refine", qmm_tune.main)
        os.environ.pop("QMM_REFINE", None)

    if want("bench"):
        import bench
        from infinitensor_tpu.kernels import quant_matmul as qm
        qm._load_tune.cache_clear()
        stage("bench_full", bench.main)
    print(json.dumps({"metric": "r4 session4", "status": STATUS}))


if __name__ == "__main__":
    if (os.environ.get("BENCH_WATCHDOG", "1") == "1"
            and not os.environ.get("BENCH_CHILD")):
        from infinitensor_tpu.utils.watchdog import babysit
        sys.exit(babysit(
            [sys.executable, os.path.abspath(__file__)],
            quiet_s=600.0, gap_s=420.0, attempts=2,
            env=dict(os.environ, BENCH_CHILD="1")))
    main()
