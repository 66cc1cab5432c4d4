"""Round-5 TPU session driver D: paged-Llama slot sweep (+ GPT-2 80-slot
refine), one device claim.

The GPT-2 slot sweep (session 12 follow-up) showed per-op decode latency
amortizes across rows until KV reads dominate: 16/24/32/48/64/96 slots =
1834/1940/1920/2100/2130/2008 tok/s. Paged Llama still runs the historical
8-slot config (1297.5 tok/s) — this session applies the same lever.

Stages (each a fresh engine; workload = 3*slots requests, 16-250-token
prompts, 64 new tokens each — the 8-slot control keeps the historical
24-request workload for a direct repro check):

  paged8    control repro of the 1297.5 row
  paged16 / paged24 / paged32   the sweep
  gpt2_80   GPT-2 dense serving at 80 slots (refine the 64-peak:
            48/64/96 = 2100/2130/2008 brackets a flat top)

Run: python tools/session13.py      Env: S13_STAGES=... subset
"""

import functools
import gc
import json
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tools"))
print = functools.partial(print, flush=True)

STATUS: dict = {}


def run_stage(name, fn, **env):
    t0 = time.time()
    print(f"#### stage {name} start")
    old = {k: os.environ.get(k) for k in env}
    os.environ.update({k: str(v) for k, v in env.items()})
    try:
        fn()
        STATUS[name] = "ok"
        print(f"#### stage {name} OK ({time.time()-t0:.0f}s)")
    except Exception:
        STATUS[name] = "failed"
        print(f"#### stage {name} FAILED ({time.time()-t0:.0f}s)")
        traceback.print_exc()
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        gc.collect()


def paged(name, slots, **env):
    import paged_serving_bench
    run_stage(name, paged_serving_bench.main,
              PAGED_SLOTS=slots, **env)


def main():
    import threading

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

    stages = os.environ.get(
        "S13_STAGES", "paged8,paged16,paged24,paged32,gpt2_80").split(",")
    if "paged8" in stages:
        paged("paged8", 8, PAGED_NREQ="24")
    if "paged16" in stages:
        paged("paged16", 16)
    if "paged24" in stages:
        paged("paged24", 24)
    if "paged32" in stages:
        paged("paged32", 32)
    # session13b: the 8-32 sweep was still rising at 32 (2306.2)
    if "paged48" in stages:
        paged("paged48", 48)
    if "paged64" in stages:
        paged("paged64", 64)
    if "gpt2_80" in stages:
        import serving_bench
        run_stage("gpt2_80", serving_bench.main, SERVE_SLOTS="80")
    print(json.dumps({"metric": "session13", "status": STATUS}))


if __name__ == "__main__":
    if (os.environ.get("BENCH_WATCHDOG", "1") == "1"
            and not os.environ.get("BENCH_CHILD")):
        from infinitensor_tpu.utils.watchdog import babysit
        sys.exit(babysit(
            [sys.executable, os.path.abspath(__file__)],
            quiet_s=float(os.environ.get("S13_QUIET_S", "900")),
            gap_s=float(os.environ.get("S13_GAP_S", "420")),
            attempts=int(os.environ.get("S13_ATTEMPTS", "2")),
            env=dict(os.environ, BENCH_CHILD="1")))
    main()
