"""Tensor-parallel inference launch + parity report.

The analog of the reference's distributed launchers (reference
examples/distributed/cuda/cuda_launch.py): plan TP over a model graph, run it
sharded, and report avg latency + max-abs-diff vs the single-device run.
Where the reference spawns one process per GPU with NCCL rendezvous, here a
single SPMD program runs over the mesh (real TPU slice, or virtual CPU
devices for a dry run: run with
  env -u PYTHONPATH -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/distributed_tp_launch.py --tp 4).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=4)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--seq", type=int, default=32)
    ap.add_argument("--layers", type=int, default=4)
    args = ap.parse_args()

    import jax
    from infinitensor_tpu.core.handler import GraphHandler
    from infinitensor_tpu.models.bert import BertConfig, init_bert_params, \
        build_bert_layer_graph
    from infinitensor_tpu.parallel.mesh import make_mesh
    from infinitensor_tpu.parallel.planner import plan_tensor_parallel
    from infinitensor_tpu.parallel.executor import TPExecutor

    cfg = BertConfig(dim=args.dim, n_heads=8, intermediate=4 * args.dim,
                     n_layers=args.layers, vocab_size=512,
                     max_seq=args.seq)
    params = init_bert_params(cfg, jax.random.PRNGKey(0))
    h = build_bert_layer_graph(cfg, params["layers"][0], batch=1,
                               seq=args.seq)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, args.seq, args.dim), dtype=np.float32)

    t0 = time.perf_counter()
    ref = h.run({"x": x}, return_numpy=True)
    single_ms = (time.perf_counter() - t0) * 1e3

    plan = plan_tensor_parallel(h.graph, tp=args.tp)
    mesh = make_mesh({"tp": args.tp}, jax.devices()[:args.tp])
    ex = TPExecutor(plan, mesh)
    got = ex.run({"x": x}, return_numpy=True)   # compile
    t0 = time.perf_counter()
    for _ in range(10):
        got = ex.run({"x": x}, return_numpy=True)
    tp_ms = (time.perf_counter() - t0) / 10 * 1e3

    diffs = [np.abs(got[k] - ref[k]).max() for k in ref]
    n_comm = sum(1 for op in plan.graph.operators
                 if op.op_type.startswith(("AllReduce", "AllGather")))
    print(f"tp={args.tp} sharded_weights={len(plan.sharded_weights)} "
          f"comm_ops={n_comm}")
    print(f"single-device first-run {single_ms:.1f} ms; "
          f"tp avg latency {tp_ms:.2f} ms")
    print(f"max abs diff vs single device: {max(diffs):.3e}")
    assert max(diffs) < 1e-3


if __name__ == "__main__":
    main()
