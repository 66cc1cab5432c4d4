"""ResNet-18-v2 ONNX FP32 parity on the real chip (BASELINE config 1).

The reference CI downloads ResNet18-v2/DenseNet/Inception ONNX models and
compares against onnxruntime (reference .github/workflows/build.yml:77-88);
zero egress here, so the model is built in-tree (models/vision.py, itself
CI-gated against a hand-built torch oracle), exported to ONNX, re-imported,
executed on the DEVICE via the graph executor, and compared against the
torch CPU oracle at the reference harness's tolerance (rtol=atol=1e-3,
llama_kvcache_inference.py:102-144 uses the same).

Run: python tools/resnet_parity.py     (one TPU process at a time)
"""

import functools
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))
print = functools.partial(print, flush=True)


def main():
    import time

    import jax
    import numpy as np

    from infinitensor_tpu.models import vision as V
    from infinitensor_tpu.onnx.exporter import export_onnx
    from infinitensor_tpu.onnx.importer import OnnxStub
    from test_vision_models import torch_resnet18   # torch CPU oracle

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    image = int(os.environ.get("RESNET_IMAGE", "224"))
    classes = int(os.environ.get("RESNET_CLASSES", "1000"))

    p = V.init_resnet18_params(rng, num_classes=classes)
    h = V.build_resnet18(p, batch=1, image=image, num_classes=classes)
    x = rng.standard_normal((1, 3, image, image), dtype=np.float32)

    wire = export_onnx(h.graph, "resnet18v2").serialize()
    print(f"# onnx round-trip: {len(wire)} bytes", file=sys.stderr)
    stub = OnnxStub(wire)

    t0 = time.time()
    out = stub.run({"input": x}, return_numpy=True)
    compile_s = time.time() - t0
    got = next(iter(out.values()))
    t0 = time.time()
    got = next(iter(stub.run({"input": x}, return_numpy=True).values()))
    run_s = time.time() - t0

    ref = np.asarray(torch_resnet18(p, x))
    diff = np.abs(got - ref)
    denom = np.abs(ref) + 1e-3
    rel = float((diff / denom).max())
    ok = bool(np.allclose(got, ref, rtol=1e-3, atol=1e-3))
    print(json.dumps({
        "metric": "resnet18-v2 onnx fp32 parity (device vs torch cpu)",
        "value": round(float(diff.max()), 6),
        "unit": "max_abs_diff",
        "max_rel_diff": round(rel, 6),
        "pass_rtol_atol_1e-3": ok,
        "image": image, "classes": classes,
        "compile_s": round(compile_s, 1), "run_s": round(run_s, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    from infinitensor_tpu.utils.watchdog import self_babysit
    self_babysit("RESNET_CHILD")  # tunnel-wedge babysitter; WATCHDOG=0 opts out
    main()
