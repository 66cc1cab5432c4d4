"""BERT-base INT8 dynamic-quant ONNX parity on the device (BASELINE
config 2: "BERT-base ONNX INT8 dynamic-quantized (single chip) — parity
within quantization tolerance").

Protocol (zero egress, mirrors tools/vision_parity.py):
  * build the FULL BERT-base graph twice — FP32 and ORT-style dynamic
    INT8 (DynamicQuantizeLinear -> MatMulInteger -> rescale), from one
    fixed seed;
  * round-trip the INT8 graph through the ONNX codec (serialize ->
    OnnxStub), run BOTH on the device;
  * parity gates: INT8 vs FP32 within quantization tolerance
    (mean |dh| / rms(h) < 5%; the reference harness compares quantized
    runs the same relative way, cuda_launch.py:70-76), and the ONNX
    round-trip bit-exact vs the in-memory INT8 graph.

Writes docs/BERT_PARITY.json and prints one JSON line.
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
print = functools.partial(print, flush=True)

OUT = os.path.join(_ROOT, "docs", "BERT_PARITY.json")


def main():
    import jax
    import numpy as np
    from infinitensor_tpu.models.bert import (
        BertConfig, build_bert_graph, init_bert_params)
    from infinitensor_tpu.onnx.exporter import export_onnx
    from infinitensor_tpu.onnx.importer import OnnxStub
    from infinitensor_tpu.runtime.executor import GraphExecutor

    dev = jax.devices()[0]
    np.asarray(jax.numpy.zeros((1,)))
    print(f"# device ready: {dev}")

    B, S = int(os.environ.get("BERT_B", "2")), int(
        os.environ.get("BERT_S", "128"))
    cfg = BertConfig()                       # BERT-base geometry
    if os.environ.get("BERT_SMALL"):
        cfg = BertConfig.tiny()
        S = min(S, cfg.max_seq)
    t0 = time.time()
    params = init_bert_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    toks = rng.integers(0, cfg.vocab_size, (B, S)).astype(np.int32)

    h_f = build_bert_graph(cfg, params, B, S, dynamic_quant=False)
    h_q = build_bert_graph(cfg, params, B, S, dynamic_quant=True)
    build_s = time.time() - t0
    print(f"# graphs built in {build_s:.1f}s "
          f"({len(h_q.graph.operators)} ops int8)")

    out_f = GraphExecutor(h_f.graph).run({"tokens": toks},
                                         return_numpy=True)
    print("# fp32 graph ran")
    out_q = GraphExecutor(h_q.graph).run({"tokens": toks},
                                         return_numpy=True)
    print("# int8 graph ran")
    (hf,) = out_f.values()
    (hq,) = out_q.values()
    rms = float(np.sqrt(np.mean(hf.astype(np.float64) ** 2)))
    rel = float(np.mean(np.abs(hq.astype(np.float64)
                               - hf.astype(np.float64)))) / (rms + 1e-12)

    # ONNX round-trip of the dynamic-INT8 graph, re-executed
    stub = OnnxStub(export_onnx(h_q.graph, "bert_int8").serialize())
    out_rt = GraphExecutor(stub.handler.graph).run({"tokens": toks},
                                                   return_numpy=True)
    (hrt,) = out_rt.values()
    rt_exact = bool(np.array_equal(hrt, hq))
    print("# onnx round-trip ran")

    result = {
        "metric": "bert-base int8 dynamic-quant parity",
        "value": round(rel, 6),
        "unit": "mean|dh|/rms(h)",
        "pass_rel_lt_5pct": bool(rel < 0.05),
        "onnx_roundtrip_bit_exact": rt_exact,
        "config": {"dim": cfg.dim, "layers": cfg.n_layers, "batch": B,
                   "seq": S, "ops_int8_graph": len(h_q.graph.operators)},
        "device": str(dev),
        "build_s": round(build_s, 1),
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    from infinitensor_tpu.utils.watchdog import self_babysit
    self_babysit("BERT_CHILD")
    main()
