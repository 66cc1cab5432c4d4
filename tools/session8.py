"""Round-4 TPU session 8: serving micro-sweep under the final config —
chunk-64 x pipeline, flash seq_block 128 (frontier elision at B=16),
paged chunk 64 — plus a serving-budget regeneration at the new defaults.
jit caches are NOT shared across env changes (fresh engines per stage)."""

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

    import serving_bench
    import paged_serving_bench
    import serving_budget
    os.environ["SERVE_REPS"] = "1"

    def run_serving(tag, **env):
        def go():
            saved = {}
            for k, v in env.items():
                saved[k] = os.environ.get(k)
                os.environ[k] = str(v)
            try:
                importlib.reload(serving_bench)
                serving_bench.main()
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
        stage(f"serving_{tag}", go)

    run_serving("chunk64_p2", SERVE_CHUNK=64, SERVE_PIPELINE=2)
    run_serving("seqblk128", INFINITPU_FLASH_SEQBLK=128)
    run_serving("chunk64_p2_seqblk128", SERVE_CHUNK=64, SERVE_PIPELINE=2,
                INFINITPU_FLASH_SEQBLK=128)

    def paged64():
        os.environ["PAGED_CHUNK"] = "64"
        os.environ["PAGED_KV"] = "int8"
        os.environ["PAGED_PIPELINE"] = "2"
        importlib.reload(paged_serving_bench)
        paged_serving_bench.main()
    stage("paged_chunk64", paged64)

    def budget():
        importlib.reload(serving_budget)
        serving_budget.main()
    stage("serving_budget_final", budget)
    print(json.dumps({"metric": "r4 session8", "status": STATUS}))


if __name__ == "__main__":
    if (os.environ.get("BENCH_WATCHDOG", "1") == "1"
            and not os.environ.get("BENCH_CHILD")):
        from infinitensor_tpu.utils.watchdog import babysit
        sys.exit(babysit(
            [sys.executable, os.path.abspath(__file__)],
            quiet_s=600.0, gap_s=420.0, attempts=2,
            env=dict(os.environ, BENCH_CHILD="1")))
    main()
