"""Round-5 TPU session driver C: serving config matrix + longformer
retry, one device claim. Stages:

  1. serve_look      serving_bench, lookahead ON (tail-of-wave fix in)
  2. serve_base      serving_bench, lookahead OFF, no gpt2 tune table,
                     bf16 lm_head (the round-4 configuration, as the
                     control row)
  3. serve_notable   lookahead ON, NO gpt2 tuned table, int8 lm_head
                     (isolates the tuned-table effect)
  4. serve_nolmq     lookahead ON, tuned table, bf16 lm_head
                     (isolates the int8-lm_head effect)
  5. longformer      imported-model band rewrite (bf16-class parity
                     tolerance fix in)

The engine keeps whichever GPT-2 serving config wins; the matrix is
recorded in docs/SERVING_AB.json.
"""

import functools
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
AB: dict = {"metric": "gpt2 serving config matrix (round 5)"}
EMPTY_TABLE = os.path.join("/tmp", "qmm_tune_empty.json")


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


def serve(name, **env):
    import serving_bench
    from infinitensor_tpu.kernels import quant_matmul as qm

    def go():
        qm._load_tune.cache_clear()
        serving_bench.main()
    run_stage(name, go, **env)
    # scrape the last serving metric line from our own artifact channel:
    # serving_bench prints one JSON line; simplest is to re-read stdout
    # via the log, so instead serving_bench's samples land in AB via env
    # marker files — keep it simple: the session log carries the lines.


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

    with open(EMPTY_TABLE, "w") as f:
        json.dump({}, f)

    stages = os.environ.get(
        "S12_STAGES",
        "serve_look,serve_base,serve_notable,serve_nolmq,longformer"
    ).split(",")
    if "serve_look" in stages:
        serve("serve_look", SERVE_LOOKAHEAD="1", GPT2_QLMHEAD="1")
    if "serve_base" in stages:
        serve("serve_base", SERVE_LOOKAHEAD="0", GPT2_QLMHEAD="0",
              INFINITPU_QMM_TUNE=EMPTY_TABLE)
    if "serve_notable" in stages:
        serve("serve_notable", SERVE_LOOKAHEAD="1", GPT2_QLMHEAD="1",
              INFINITPU_QMM_TUNE=EMPTY_TABLE)
    if "serve_nolmq" in stages:
        serve("serve_nolmq", SERVE_LOOKAHEAD="1", GPT2_QLMHEAD="0")
    if "longformer" in stages:
        import rewrite_speedup
        run_stage("longformer", rewrite_speedup.main,
                  RS_MODEL="longformer")
    print(json.dumps({"metric": "session12", "status": STATUS}))


if __name__ == "__main__":
    if (os.environ.get("BENCH_WATCHDOG", "1") == "1"
            and not os.environ.get("BENCH_CHILD")):
        from infinitensor_tpu.utils.watchdog import babysit
        sys.exit(babysit(
            [sys.executable, os.path.abspath(__file__)],
            quiet_s=900.0, gap_s=420.0, attempts=2,
            env=dict(os.environ, BENCH_CHILD="1")))
    main()
