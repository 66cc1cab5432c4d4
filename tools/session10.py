"""Round-5 TPU session driver A: accuracy gate v3 + speculative decoding
evidence + long-context artifact, all under ONE device claim (starting a
fresh TPU process right after another exits wedges the tunnel —
CLAUDE.md). Stage order = OOM risk ascending: gate (small trained LMs),
spec bench (7B built then freed), long context LAST (7B + 16k caches).

Each stage is fault-isolated; a failure records the error and moves on
(but an OOM would poison later stages — hence the ordering).

Run: python tools/session10.py
Env: S10_STAGES=gate,spec,longctx (subset selection)
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


def run_stage(name, fn):
    t0 = time.time()
    print(f"#### stage {name} start")
    try:
        fn()
        print(f"#### stage {name} OK ({time.time()-t0:.0f}s)")
        return True
    except Exception:
        print(f"#### stage {name} FAILED ({time.time()-t0:.0f}s)")
        traceback.print_exc()
        return False


def main():
    stages = os.environ.get("S10_STAGES", "gate,spec,longctx").split(",")
    results = {}
    if "gate" in stages:
        import train_gate_lm2
        results["gate"] = run_stage("gate_v3", train_gate_lm2.main)
    if "spec" in stages:
        import spec_bench
        results["spec"] = run_stage("spec_bench", spec_bench.main)
    if "longctx" in stages:
        import long_context
        results["longctx"] = run_stage("long_context", long_context.main)
    print(json.dumps({"metric": "session10", **results}))


if __name__ == "__main__":
    if (os.environ.get("BENCH_WATCHDOG", "1") == "1"
            and not os.environ.get("BENCH_CHILD")):
        from infinitensor_tpu.utils.watchdog import babysit
        sys.exit(babysit(
            [sys.executable, os.path.abspath(__file__)],
            quiet_s=900.0, gap_s=420.0, attempts=2,
            env=dict(os.environ, BENCH_CHILD="1")))
    main()
