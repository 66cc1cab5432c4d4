"""Vision inference through the ONNX path (reference examples/python
resnet18 inference + CI e2e analog): build ResNet-18v2, export to ONNX bytes
with the built-in codec, re-import, run, and verify parity."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from infinitensor_tpu.models.vision import (
        init_resnet18_params, build_resnet18)
    from infinitensor_tpu.onnx.exporter import export_onnx
    from infinitensor_tpu.onnx.importer import OnnxStub
    from infinitensor_tpu.runtime.profiling import memory_report

    rng = np.random.default_rng(0)
    params = init_resnet18_params(rng)
    h = build_resnet18(params, batch=1, image=224)
    print("graph:", h.graph.stats()["ops"], "ops;",
          {k: v for k, v in sorted(h.graph.stats()["op_types"].items())})
    print("memory plan:", memory_report(h.graph))

    model = export_onnx(h.graph, "resnet18v2")
    data = model.serialize()
    print(f"exported ONNX: {len(data) / 1e6:.1f} MB")

    stub = OnnxStub(data)
    x = rng.standard_normal((1, 3, 224, 224), dtype=np.float32)
    ref = h.run({"input": x}, return_numpy=True)
    t0 = time.perf_counter()
    out = stub.run({"input": x}, return_numpy=True)
    print(f"inference {1e3 * (time.perf_counter() - t0):.1f} ms (first run "
          f"incl. compile)")
    key = list(ref)[0]
    print("max abs diff vs direct graph:", np.abs(out[key] - ref[key]).max())
    print("top-5 classes:", np.argsort(out[key][0])[-5:][::-1])


if __name__ == "__main__":
    main()
