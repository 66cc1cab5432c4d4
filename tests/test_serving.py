"""Serving engine tests: continuous batching correctness vs straight-line
generation, slot lifecycle, KV slot ops (reference cloneKV/free_heap
analogs)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from infinitensor_tpu.models.llama import (
    LlamaConfig, init_llama_params, init_kv_cache, greedy_generate,
)
from infinitensor_tpu.serving.engine import ServingEngine
from infinitensor_tpu.serving.kvcache import clone_kv_slot, clear_kv_slot


@pytest.fixture(scope="module")
def cfg():
    return LlamaConfig.tiny(dtype=jnp.float32)


@pytest.fixture(scope="module")
def params(cfg):
    return init_llama_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)


def test_engine_matches_straightline(cfg, params):
    """Tokens produced under continuous batching must equal single-request
    greedy generation."""
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, 100, n)) for n in (4, 7, 3)]
    n_new = 6

    expected = []
    for p in prompts:
        out, _ = greedy_generate(params, cfg,
                                 jnp.asarray([p], jnp.int32), n_steps=n_new)
        expected.append(list(np.asarray(out[0])))

    eng = ServingEngine(params, cfg, max_slots=2, prefill_buckets=(8,))
    reqs = [eng.submit(p, max_new_tokens=n_new) for p in prompts]
    eng.run_to_completion()
    for req, exp in zip(reqs, expected):
        assert req.done
        assert req.generated == exp, (req.generated, exp)


def test_engine_slot_reuse(cfg, params):
    eng = ServingEngine(params, cfg, max_slots=1, prefill_buckets=(8,))
    r1 = eng.submit([1, 2, 3], max_new_tokens=3)
    r2 = eng.submit([4, 5], max_new_tokens=3)
    eng.run_to_completion()
    assert r1.done and r2.done
    assert len(r1.generated) == 3 and len(r2.generated) == 3
    # with 1 slot, decode batch stayed 1; total steps bounded
    assert eng.steps <= 6


def test_eos_stops_early(cfg, params):
    eng = ServingEngine(params, cfg, max_slots=1, prefill_buckets=(8,))
    # discover the greedy continuation, then use its 2nd token as "eos"
    probe = eng.submit([9, 8, 7], max_new_tokens=5)
    eng.run_to_completion()
    eos = probe.generated[1]
    eng2 = ServingEngine(params, cfg, max_slots=1, prefill_buckets=(8,))
    r = eng2.submit([9, 8, 7], max_new_tokens=5, eos_id=eos)
    eng2.run_to_completion()
    assert r.generated[:2] == probe.generated[:2]
    assert len(r.generated) == 2  # stopped at eos


def test_clone_and_clear_slot(cfg, params):
    cache = init_kv_cache(cfg, 4, dtype=jnp.float32)
    cache = {"k": [b.at[1].set(1.5) for b in cache["k"]],
             "v": cache["v"]}
    cache = clone_kv_slot(cache, 1, 3)
    assert float(cache["k"][0][3].min()) == 1.5
    assert float(cache["k"][0][0].max()) == 0.0
    cache = clear_kv_slot(cache, 1)
    assert float(cache["k"][0][1].max()) == 0.0
    assert float(cache["k"][1][3].min()) == 1.5


def test_engine_with_gpt2(cfg, params):
    """Continuous batching over the GPT-2 family (model-agnostic engine)."""
    from infinitensor_tpu.models.gpt2 import (
        GPT2Config, init_gpt2_params, gpt2_prefill, gpt2_decode_step,
        init_gpt2_cache)
    gcfg = GPT2Config.tiny(dtype=jnp.float32)
    gparams = init_gpt2_params(gcfg, jax.random.PRNGKey(5),
                               dtype=jnp.float32)
    eng = ServingEngine(gparams, gcfg, max_slots=2, prefill_buckets=(8,),
                        prefill_fn=gpt2_prefill, decode_fn=gpt2_decode_step,
                        init_cache_fn=init_gpt2_cache)
    reqs = [eng.submit([3, 1, 4], max_new_tokens=4),
            eng.submit([1, 5], max_new_tokens=4)]
    eng.run_to_completion()
    assert all(r.done and len(r.generated) == 4 for r in reqs)


def test_chunked_decode_same_tokens():
    """decode_chunk=4 engine yields identical per-request generations as
    single-step decode (greedy; each slot's stream is history-determined)."""
    import jax
    import jax.numpy as jnp
    from infinitensor_tpu.models.llama import LlamaConfig, init_llama_params
    from infinitensor_tpu.serving.engine import ServingEngine
    cfg = LlamaConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                      n_kv_heads=2, intermediate=128, max_seq=64)
    params = init_llama_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)

    def run(chunk):
        eng = ServingEngine(params, cfg, max_slots=2, prefill_buckets=(8,),
                            decode_chunk=chunk)
        reqs = [eng.submit([1, 2, 3], max_new_tokens=9),
                eng.submit([4, 5], max_new_tokens=7),
                eng.submit([9, 8, 7, 6], max_new_tokens=5)]
        eng.run_to_completion()
        return [r.generated for r in reqs]

    single = run(1)
    chunked = run(4)
    for s, c in zip(single, chunked):
        assert s == c[:len(s)] and len(c) >= len(s) - 3  # truncation-equal
        assert s == c  # greedy streams must match exactly


def test_engine_int8_kv(cfg, params):
    """Continuous batching over the INT8 KV cache (BASELINE serving
    config): cache planes are int8 + scales, and generated tokens track
    the float-cache engine closely on a tiny model."""
    rng = np.random.default_rng(5)
    prompts = [list(rng.integers(1, 100, n)) for n in (4, 6)]
    n_new = 5

    ref_eng = ServingEngine(params, cfg, max_slots=2, prefill_buckets=(8,))
    refs = [ref_eng.submit(p, max_new_tokens=n_new) for p in prompts]
    ref_eng.run_to_completion()

    eng = ServingEngine(params, cfg, max_slots=2, prefill_buckets=(8,),
                        kv_quant=True)
    assert eng.cache["k"][0].dtype == jnp.int8
    assert "k_scale" in eng.cache
    reqs = [eng.submit(p, max_new_tokens=n_new) for p in prompts]
    eng.run_to_completion()
    agree = [
        np.mean([a == b for a, b in zip(r.generated, f.generated)])
        for r, f in zip(reqs, refs)]
    assert all(r.done for r in reqs)
    assert min(agree) >= 0.6, (agree,
                               [r.generated for r in reqs],
                               [f.generated for f in refs])


def test_engine_sharded_mesh(cfg, params):
    """SPMD continuous batching: engine with params/KV committed to a
    (dp x tp) mesh produces the same tokens as the unsharded engine —
    the multi-host serving path (dp = cross-host axis)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from infinitensor_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"dp": 2, "tp": 2}, jax.devices()[:4])
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(1, cfg.vocab_size, size=n))
               for n in (5, 9, 3, 7)]

    ref = ServingEngine(params, cfg, max_slots=4, prefill_buckets=(16,))
    reqs = [ref.submit(p, max_new_tokens=8) for p in prompts]
    ref.run_to_completion()
    ref_gen = [r.generated for r in reqs]

    sh = ServingEngine(params, cfg, max_slots=4, prefill_buckets=(16,),
                       mesh=mesh)
    sreqs = [sh.submit(p, max_new_tokens=8) for p in prompts]
    sh.run_to_completion()
    for a, b in zip(ref_gen, [r.generated for r in sreqs]):
        assert a == b


def test_engine_sharded_int8_kv(cfg, params):
    """INT8-KV slots (k/v + scale planes) shard with the rank-generic
    default cache specs and still match the unsharded INT8-KV engine."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from infinitensor_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"dp": 2, "tp": 2}, jax.devices()[:4])
    rng = np.random.default_rng(4)
    prompts = [list(rng.integers(1, cfg.vocab_size, size=n))
               for n in (6, 4)]
    ref = ServingEngine(params, cfg, max_slots=2, prefill_buckets=(16,),
                        kv_quant=True)
    rref = [ref.submit(p, max_new_tokens=6) for p in prompts]
    ref.run_to_completion()
    sh = ServingEngine(params, cfg, max_slots=2, prefill_buckets=(16,),
                       kv_quant=True, mesh=mesh)
    rsh = [sh.submit(p, max_new_tokens=6) for p in prompts]
    sh.run_to_completion()
    for a, b in zip(rref, rsh):
        assert a.generated == b.generated


def test_engine_sharded_snapshot_resume(cfg, params):
    """Checkpoint/resume composes with mesh placement: a snapshot taken
    from a mesh-committed engine (sharded KV fetched to host) restores
    onto a FRESH mesh-committed engine and completes identically to the
    unsharded engine — the multi-host preemption/restart path."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from infinitensor_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"dp": 2, "tp": 2}, jax.devices()[:4])
    rng = np.random.default_rng(5)
    prompts = [list(rng.integers(1, cfg.vocab_size, size=n))
               for n in (5, 9, 3, 7)]

    ref = ServingEngine(params, cfg, max_slots=4, prefill_buckets=(16,))
    reqs = [ref.submit(p, max_new_tokens=8, uid=50 + i)
            for i, p in enumerate(prompts)]
    ref.run_to_completion()
    want = [r.generated for r in reqs]

    a = ServingEngine(params, cfg, max_slots=4, prefill_buckets=(16,),
                      mesh=mesh)
    for i, p in enumerate(prompts):
        a.submit(p, max_new_tokens=8, uid=50 + i)
    for _ in range(3):
        a.step()
    snap = a.snapshot()

    b = ServingEngine(params, cfg, max_slots=4, prefill_buckets=(16,),
                      mesh=mesh)
    b.restore(snap)
    handles = {r.uid: r for r in list(b.pending)
               + [r for r in b.slots if r is not None]}
    b.run_to_completion()
    got = [handles[50 + i].generated for i in range(len(prompts))]
    assert got == want


def test_pipelined_chunk_decode_same_tokens(cfg, params):
    """pipeline_depth > 1 (multiple fused chunks dispatched before the
    host looks at tokens) emits exactly the tokens of the unpipelined
    engine, including eos early-stop truncation."""
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(1, 100, n)) for n in (4, 6, 3, 5)]

    def run(depth):
        eng = ServingEngine(params, cfg, max_slots=2, prefill_buckets=(8,),
                            decode_chunk=2, pipeline_depth=depth)
        reqs = [eng.submit(list(p), max_new_tokens=9, eos_id=17)
                for p in prompts]
        eng.run_to_completion()
        return [list(r.generated) for r in reqs], eng

    want, _ = run(1)
    got, eng = run(4)
    assert got == want
    assert eng.stats["decode_launches"] > 0


def test_batched_admission_single_launch_per_wave(cfg, params):
    """An admission wave of n requests in the same bucket costs ONE
    prefill launch (the per-request launch round-trip was the serving
    engine's biggest overhead slice)."""
    rng = np.random.default_rng(4)
    prompts = [list(rng.integers(1, 100, 5)) for _ in range(4)]
    eng = ServingEngine(params, cfg, max_slots=4, prefill_buckets=(8,))
    reqs = [eng.submit(list(p), max_new_tokens=4) for p in prompts]
    eng.step()
    assert eng.stats["prefill_launches"] == 1       # one wave, 4 requests
    eng.run_to_completion()
    assert all(r.done for r in reqs)

    # parity vs straight-line
    for p, r in zip(prompts, reqs):
        out, _ = greedy_generate(params, cfg,
                                 jnp.asarray([p], jnp.int32), n_steps=4)
        assert list(r.generated) == list(np.asarray(out[0]))


def test_serving_stats_budget_slices(cfg, params):
    """The utilization-budget counters cover the step loop: prefill,
    decode dispatch/fetch, host bookkeeping, token counts."""
    eng = ServingEngine(params, cfg, max_slots=2, prefill_buckets=(8,),
                        decode_chunk=2)
    eng.submit([1, 2, 3], max_new_tokens=4)
    eng.run_to_completion()
    s = eng.stats
    assert s["prefill_launches"] >= 1
    assert s["prefill_tokens"] == 3
    assert s["decode_launches"] >= 1
    for k in ("prefill_s", "decode_dispatch_s", "decode_fetch_s",
              "decode_host_s"):
        assert s[k] >= 0.0


def test_lookahead_parity_and_progress():
    """lookahead=True (dispatch group k+1 before fetching group k) must
    emit exactly the same tokens per request as the plain engine, across
    admission waves, eos, and max_seq-bounded requests."""
    import numpy as np
    import jax.numpy as jnp
    from infinitensor_tpu.models.llama import LlamaConfig
    from infinitensor_tpu.serving import ServingEngine

    cfg = LlamaConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                      n_kv_heads=4, intermediate=128, max_seq=96,
                      dtype=jnp.float32)
    from infinitensor_tpu.models.llama import init_llama_params
    import jax
    params = init_llama_params(cfg, jax.random.PRNGKey(0),
                               dtype=jnp.float32)
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(1, 128, int(n)))
               for n in rng.integers(4, 20, 9)]

    def run(lookahead):
        eng = ServingEngine(params, cfg, max_slots=4,
                            prefill_buckets=(32,), decode_chunk=8,
                            pipeline_depth=2, lookahead=lookahead)
        reqs = [eng.submit(list(p), max_new_tokens=int(12 + i % 9),
                           eos_id=None)
                for i, p in enumerate(prompts)]
        eng.run_to_completion()
        assert all(r.done for r in reqs)
        return [list(r.generated) for r in reqs]

    base = run(False)
    look = run(True)
    assert base == look
