"""Vision model-set ONNX FP32 parity on the device (BASELINE config 1).

Mirrors the reference CI, which imports ResNet18-v2 / DenseNet-121 /
Inception-v2 / EfficientNet-Lite4 ONNX models and compares against
onnxruntime (reference .github/workflows/build.yml:77-88). Zero egress:
models are built in-tree (models/vision.py; blocks CI-gated vs torch
oracles), exported/reimported through the ONNX codec, executed, and
compared across BACKENDS via a reference file:

  pass 1 (CPU):    env -u PYTHONPATH -u PALLAS_AXON_POOL_IPS \
                   JAX_PLATFORMS=cpu python tools/vision_parity.py
                   -> writes VISION_REF (default /tmp/vision_ref.npz)
  pass 2 (device): python tools/vision_parity.py
                   -> compares device outputs vs the CPU reference at the
                      reference harness tolerance (rtol=atol=1e-3)

Params and inputs regenerate from a fixed seed, so the two passes see
bit-identical weights. ResNet additionally checks the torch CPU oracle
in-process. Prints one JSON line.
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

REF_PATH = os.environ.get("VISION_REF", "/tmp/vision_ref.npz")
IMAGE = int(os.environ.get("VISION_IMAGE", "224"))
CLASSES = int(os.environ.get("VISION_CLASSES", "1000"))


def outputs():
    import numpy as np

    from infinitensor_tpu.models import vision as V
    from infinitensor_tpu.onnx.exporter import export_onnx
    from infinitensor_tpu.onnx.importer import OnnxStub

    models = {
        "resnet18v2": (V.init_resnet18_params, V.build_resnet18),
        "densenet121": (
            lambda rng, num_classes: V.init_densenet_params(
                rng, num_classes=num_classes),
            lambda p, **kw: V.build_densenet(p, **kw)),
        "inception_v2": (V.init_inception_v2_params, V.build_inception_v2),
        "efficientnet_lite4": (V.init_efficientnet_lite4_params,
                               V.build_efficientnet_lite4),
    }
    out = {}
    torch_ref = None
    for name, (init, build) in models.items():
        rng = np.random.default_rng(7)      # same weights on both passes
        p = init(rng, num_classes=CLASSES)
        h = build(p, batch=1, image=IMAGE, num_classes=CLASSES)
        x = rng.standard_normal((1, 3, IMAGE, IMAGE), dtype=np.float32)
        stub = OnnxStub(export_onnx(h.graph, name).serialize())
        got = next(iter(stub.run({"input": x}, return_numpy=True).values()))
        out[name] = np.asarray(got)
        print(f"# {name}: {len(h.graph.operators)} ops -> {got.shape}",
              file=sys.stderr)
        if name == "resnet18v2":
            from test_vision_models import torch_resnet18
            torch_ref = np.asarray(torch_resnet18(p, x))
    return out, torch_ref


def main():
    import numpy as np

    import jax

    # Parity runs at HIGHEST matmul/conv precision: TPU's default f32
    # path uses bf16 MXU passes, which drifts ~1e-2 from the CPU
    # reference — a precision mode, not an engine bug. The reference
    # harness compares fp32-vs-fp32 the same way (cuda_launch.py:70-76);
    # perf benches keep the default precision.
    jax.config.update("jax_default_matmul_precision", "highest")
    dev = str(jax.devices()[0])
    print(f"# device: {dev}", file=sys.stderr)
    out, torch_ref = outputs()

    resnet_vs_torch = float(np.abs(out["resnet18v2"] - torch_ref).max())
    if not os.path.exists(REF_PATH):
        np.savez(REF_PATH, **out)
        print(json.dumps({
            "metric": "vision parity reference written",
            "path": REF_PATH, "models": sorted(out),
            "resnet_vs_torch_max_abs_diff": round(resnet_vs_torch, 6),
            "device": dev}))
        return

    ref = np.load(REF_PATH)
    report, ok_all = {}, True
    for name, got in out.items():
        r = ref[name]
        scale = float(np.abs(r).max()) or 1.0
        rel = float(np.abs(got - r).max()) / scale
        ok = bool(np.allclose(got, r, rtol=1e-3, atol=1e-3 * scale))
        ok_all &= ok
        report[name] = {"max_abs_diff": round(float(np.abs(got - r).max()),
                                              6),
                        "max_rel_diff": round(rel, 8), "pass": ok}
    print(json.dumps({
        "metric": "vision model set onnx fp32 parity (device vs cpu ref, "
                  "rtol=atol=1e-3)",
        "value": sum(v["pass"] for v in report.values()),
        "unit": f"models passing of {len(report)}",
        "pass_all": ok_all,
        "per_model": report,
        "resnet_vs_torch_max_abs_diff": round(resnet_vs_torch, 6),
        "image": IMAGE, "classes": CLASSES, "device": dev}))


if __name__ == "__main__":
    from infinitensor_tpu.utils.watchdog import self_babysit
    self_babysit("VISION_CHILD")  # tunnel-wedge babysitter; WATCHDOG=0 opts out
    main()
