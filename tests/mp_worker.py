"""Worker for the two-process distributed bootstrap test
(tests/test_multiprocess.py). Each process: Runtime.init_comm (the
reference's NCCL id-file rendezvous analog, nccl_communicator.h:27-51)
-> dp-sharded decode step over a 2-process CPU mesh -> compare the local
logits shard against a locally computed unsharded reference.

Usage: python tests/mp_worker.py <rank> <port>
"""

import os
import sys

rank = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    import jax._src.xla_bridge as _xb
    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from infinitensor_tpu.runtime.runtime import cpu_runtime  # noqa: E402
from infinitensor_tpu.models.llama import (  # noqa: E402
    LlamaConfig, init_kv_cache, init_llama_params, llama_decode_step)


def phase3():
    """70B-LAYER-GEOMETRY tp=8 x dp=2 sharded PAGED-cache continuous
    batching across two processes (round-4 verdict item 5 / BASELINE
    config 5): dim 8192, 64 heads, 8 KV heads, intermediate 28672 — the
    real Llama-2-70B per-layer shapes — served from a page pool on a
    16-device mesh whose dp axis crosses the process (DCN-analog)
    boundary. Tokens must match a mesh-free local paged engine exactly."""
    from jax.sharding import PartitionSpec as P3
    from infinitensor_tpu.serving.paged_engine import PagedServingEngine

    devs = jax.devices()
    assert len(devs) == 16, f"need 16 devices (8/process), got {len(devs)}"
    mesh = Mesh(np.asarray(devs).reshape(2, 8), ("dp", "tp"))

    cfg = LlamaConfig(vocab_size=512, dim=8192, n_layers=1, n_heads=64,
                      n_kv_heads=8, intermediate=28672, max_seq=64,
                      dtype=jnp.float32)
    params = init_llama_params(cfg, jax.random.PRNGKey(2),
                               dtype=jnp.float32)
    L = cfg.n_layers
    cache_specs = {
        "k_pages": [P3(None, "tp", None, None)] * L,
        "v_pages": [P3(None, "tp", None, None)] * L,
        "block_table": P3(),
    }
    kw = dict(max_slots=2, n_pages=9, page_size=16, prefill_buckets=(16,),
              decode_chunk=2)
    prompts = [[3, 5, 7], [11, 13, 2, 4]]

    ref = PagedServingEngine(params, cfg, **kw)
    want = [ref.submit(list(p), max_new_tokens=4, uid=70 + i)
            for i, p in enumerate(prompts)]
    ref.run_to_completion()
    want = [list(r.generated) for r in want]
    print(f"MP70B_REF rank={rank} tokens={want}", flush=True)

    eng = PagedServingEngine(params, cfg, mesh=mesh,
                             cache_specs=cache_specs, **kw)
    assert eng._multihost, "16-device 2-process mesh must be multihost"
    got = [eng.submit(list(p), max_new_tokens=4, uid=70 + i)
           for i, p in enumerate(prompts)]
    eng.run_to_completion()
    got = [list(r.generated) for r in got]
    assert got == want, (got, want)
    print(f"MP70B_OK rank={rank} tokens={got}", flush=True)


def main():
    rt = cpu_runtime()
    rt.init_comm("mp-test", world_size=2, rank=rank,
                 coordinator=f"localhost:{port}")
    assert jax.process_count() == 2, jax.process_count()
    assert rt.world_size == 2 and rt.rank == rank

    if os.environ.get("MP_PHASE3"):
        phase3()
        return

    cfg = LlamaConfig(vocab_size=64, dim=32, n_layers=2, n_heads=4,
                      n_kv_heads=2, intermediate=64, max_seq=16)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))

    devs = jax.devices()[:2]
    mesh = Mesh(np.asarray(devs), ("dp",))
    repl = NamedSharding(mesh, P())

    # replicate params; shard batch over dp (each process owns 1 row)
    params = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        params)
    token_all = np.asarray([5, 7], np.int32)
    pos_all = np.asarray([0, 0], np.int32)

    def dp_global(local, spec, global_shape):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), local, global_shape)

    cache_local = init_kv_cache(cfg, 1)
    cache = jax.tree_util.tree_map(
        lambda x: dp_global(np.asarray(x), P("dp", *([None] * (x.ndim - 1))),
                            (2,) + tuple(x.shape[1:])), cache_local)
    token = dp_global(token_all[rank:rank + 1], P("dp"), (2,))
    pos = dp_global(pos_all[rank:rank + 1], P("dp"), (2,))

    step = jax.jit(lambda p, t, ps, c: llama_decode_step(p, cfg, t, ps, c))
    logits, _ = step(params, token, pos, cache)

    mine = np.asarray(logits.addressable_shards[0].data)  # [1, vocab]

    # unsharded local reference over the full batch
    ref_params = init_llama_params(cfg, jax.random.PRNGKey(0))
    ref_logits, _ = jax.jit(
        lambda p, t, ps, c: llama_decode_step(p, cfg, t, ps, c))(
        ref_params, jnp.asarray(token_all), jnp.asarray(pos_all),
        init_kv_cache(cfg, 2))
    want = np.asarray(ref_logits)[rank:rank + 1]
    np.testing.assert_allclose(mine, want, rtol=1e-4, atol=1e-4)
    print(f"MP_OK rank={rank}", flush=True)

    # ---- phase 2: CROSS-PROCESS CONTINUOUS BATCHING (BASELINE config 5:
    # cross-host continuous batching; dp = the cross-host axis). Every
    # process runs the identical engine loop; token outputs compile to
    # replicated layout so each host fetches them locally. Tokens must
    # match a mesh-free local engine exactly.
    from infinitensor_tpu.serving.engine import ServingEngine

    prompts = [[3, 5, 7], [11, 13]]
    local_params = init_llama_params(cfg, jax.random.PRNGKey(0))
    ref_eng = ServingEngine(local_params, cfg, max_slots=2,
                            prefill_buckets=(8,))
    want_toks = []
    for i, p in enumerate(prompts):
        want_toks.append(ref_eng.submit(p, max_new_tokens=4, uid=50 + i))
    ref_eng.run_to_completion()
    want_toks = [list(r.generated) for r in want_toks]

    eng = ServingEngine(local_params, cfg, max_slots=2,
                        prefill_buckets=(8,), mesh=mesh)
    assert eng._multihost, "mesh spans 2 processes; engine must detect it"
    got = []
    for i, p in enumerate(prompts):
        got.append(eng.submit(p, max_new_tokens=4, uid=50 + i))
    eng.run_to_completion()
    got = [list(r.generated) for r in got]
    assert got == want_toks, (got, want_toks)
    print(f"MP_SERVE_OK rank={rank} tokens={got}", flush=True)


if __name__ == "__main__":
    main()
