"""Generic ONNX inference CLI (reference examples/python/onnx_inference.py):
load any .onnx file, import it, run with random (or provided .npz) inputs,
print outputs and per-run latency, optionally re-export.

Usage:
    python examples/onnx_inference.py model.onnx [--inputs data.npz]
        [--runs 5] [--tune] [--optimize] [--export out.onnx]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("--inputs", help=".npz with one array per graph input")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--tune", action="store_true",
                    help="profile per-op times into the PerfEngine cache")
    ap.add_argument("--optimize", action="store_true",
                    help="run graph rewrites before execution")
    ap.add_argument("--export", help="re-export the imported graph to .onnx")
    args = ap.parse_args()

    from infinitensor_tpu.onnx.importer import OnnxStub

    t0 = time.perf_counter()
    stub = OnnxStub(args.model)
    print(f"imported in {time.perf_counter() - t0:.2f}s; "
          f"{len(stub.handler.graph.operators)} ops")

    if args.optimize:
        stub.optimize()
        print(f"optimized: {len(stub.handler.graph.operators)} ops")

    rng = np.random.default_rng(0)
    feeds = {}
    provided = dict(np.load(args.inputs)) if args.inputs else {}
    for name, t in stub.inputs.items():
        if name in provided:
            feeds[name] = provided[name]
        elif np.issubdtype(t.dtype.np(), np.integer):
            feeds[name] = rng.integers(0, 2, size=t.shape,
                                       dtype=t.dtype.np())
        else:
            feeds[name] = rng.standard_normal(t.shape).astype(t.dtype.np())
        print(f"input {name}: {t.shape} {t.dtype.name}"
              f"{' (from file)' if name in provided else ' (random)'}")

    t0 = time.perf_counter()
    out = stub.run(feeds, return_numpy=True)
    print(f"first run (incl. compile): "
          f"{1e3 * (time.perf_counter() - t0):.1f} ms")
    t0 = time.perf_counter()
    for _ in range(args.runs):
        out = stub.run(feeds, return_numpy=True)
    print(f"avg latency: {1e3 * (time.perf_counter() - t0) / args.runs:.2f} "
          f"ms over {args.runs} runs")

    for name, arr in out.items():
        flat = np.asarray(arr).reshape(-1)
        print(f"output {name}: {arr.shape} {arr.dtype} "
              f"mean={flat.mean():.4f} first={flat[:4]}")

    if args.tune:
        stub.tune()
        print("per-op profile cached (PerfEngine)")

    if args.export:
        from infinitensor_tpu.onnx.proto import save_model
        save_model(stub.to_onnx("reexport"), args.export)
        print(f"re-exported to {args.export}")


if __name__ == "__main__":
    main()
