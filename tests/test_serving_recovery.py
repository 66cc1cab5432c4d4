"""Serving-engine checkpoint/resume + fault recovery.

Mirrors the reference's failure-recovery surface: the CUDA-Graph test
registers a deliberately capture-breaking kernel to exercise recovery
(reference test/cuda/test_cudagraph.cc:18-27) and the runtime rebuilds the
stream and rebinds library handles (reference src/cuda/cuda_runtime.cc:
226-281), with allocation rollback on exception (graph.cc:322-339). Here
all serving state is data, so the TPU-native recovery is: periodic host
snapshot -> on a failed launch restore + retrace + retry. The injected
fault raises from the decode executable, including after the KV cache
buffer was donated (the case only a host copy can repair).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinitensor_tpu.models.llama import LlamaConfig, init_llama_params
from infinitensor_tpu.serving.engine import ServingEngine
from infinitensor_tpu.serving.paged_engine import PagedServingEngine

CFG = LlamaConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                  n_kv_heads=2, intermediate=128, max_seq=64)
PROMPTS = [[3, 5, 7], [11, 13], [17, 19, 23, 29]]


@pytest.fixture(scope="module")
def params():
    return init_llama_params(CFG, jax.random.PRNGKey(0))


def _drain(engine, prompts=PROMPTS, max_new=6):
    reqs = [engine.submit(p, max_new_tokens=max_new, uid=100 + i)
            for i, p in enumerate(prompts)]
    engine.run_to_completion()
    return [list(r.generated) for r in reqs]


class FlakyDecode:
    """Raises on the n-th call, then delegates — the capture-breaking
    kernel analog."""

    def __init__(self, inner, fail_on):
        self.inner, self.calls, self.fail_on = inner, 0, fail_on
        self.faults = 0

    def __call__(self, *args):
        self.calls += 1
        if self.calls == self.fail_on:
            self.faults += 1
            raise RuntimeError("injected device fault")
        return self.inner(*args)

    def clear_cache(self):
        pass


def test_fault_recovery_matches_fault_free(params):
    want = _drain(ServingEngine(params, CFG, max_slots=2))
    eng = ServingEngine(params, CFG, max_slots=2, checkpoint_interval=1)
    eng._decode = flaky = FlakyDecode(eng._decode, fail_on=3)
    got = _drain(eng)
    assert flaky.faults == 1          # the fault actually fired
    assert got == want                # recovery replayed exactly


def test_fault_recovery_coarse_checkpoint(params):
    """interval > 1: recovery rolls back several steps and regenerates
    the same tokens (greedy decode is deterministic)."""
    want = _drain(ServingEngine(params, CFG, max_slots=2))
    eng = ServingEngine(params, CFG, max_slots=2, checkpoint_interval=4)
    eng._decode = FlakyDecode(eng._decode, fail_on=6)
    assert _drain(eng) == want


def test_checkpoint_resume_fresh_engine(params):
    """snapshot() mid-flight restores onto a freshly built engine (the
    cross-process resume path) and completes identically."""
    want = _drain(ServingEngine(params, CFG, max_slots=2))

    a = ServingEngine(params, CFG, max_slots=2)
    for i, p in enumerate(PROMPTS):
        a.submit(p, max_new_tokens=6, uid=100 + i)
    for _ in range(4):
        a.step()
    snap = a.snapshot()

    b = ServingEngine(params, CFG, max_slots=2)
    b.restore(snap)
    handles = {r.uid: r for r in list(b.pending)
               + [r for r in b.slots if r is not None]}
    b.run_to_completion()
    got = [list(handles[100 + i].generated) for i in range(len(PROMPTS))]
    assert got == want
    assert b.steps >= snap["steps"]


def test_paged_engine_fault_recovery(params):
    kw = dict(max_slots=2, n_pages=16, page_size=8,
              prefill_buckets=(8, 16))
    want = _drain(PagedServingEngine(params, CFG, **kw))
    eng = PagedServingEngine(params, CFG, checkpoint_interval=1, **kw)
    free_at_start = eng.free_pages
    eng._decode = flaky = FlakyDecode(eng._decode, fail_on=2)
    got = _drain(eng)
    assert flaky.faults == 1
    assert got == want
    # page reclaim survived the restore: pool fully free after drain
    assert eng.free_pages == free_at_start


def test_checkpoint_resume_int8_kv(params):
    """INT8-KV snapshot round-trips through host numpy (int8 rows + f32
    scale planes + bf16-free path) without dtype or value drift."""
    want = _drain(ServingEngine(params, CFG, max_slots=2, kv_quant=True))

    a = ServingEngine(params, CFG, max_slots=2, kv_quant=True)
    for i, p in enumerate(PROMPTS):
        a.submit(p, max_new_tokens=6, uid=100 + i)
    for _ in range(3):
        a.step()
    snap = a.snapshot()
    assert snap["cache"]["k"][0].dtype == np.int8
    b = ServingEngine(params, CFG, max_slots=2, kv_quant=True)
    b.restore(snap)
    assert b.cache["k"][0].dtype == jnp.int8
    assert b.cache["k_scale"][0].dtype == jnp.float32
    handles = {r.uid: r for r in list(b.pending)
               + [r for r in b.slots if r is not None]}
    b.run_to_completion()
    got = [list(handles[100 + i].generated) for i in range(len(PROMPTS))]
    assert got == want


def test_submit_rejects_oversized_prompt(params):
    eng = ServingEngine(params, CFG, max_slots=2)
    with pytest.raises(ValueError, match="max_seq"):
        eng.submit(list(range(CFG.max_seq)))

def test_post_checkpoint_submit_survives_recovery(params):
    """A request submitted AFTER the last checkpoint must not vanish when
    a fault rolls the engine back (advisor round-2 high finding): it is
    re-queued from prefill and completes with the fault-free tokens."""
    ref = ServingEngine(params, CFG, max_slots=2)
    r_ref = ref.submit([41, 43, 47], max_new_tokens=6, uid=500)
    ref.run_to_completion()
    want = list(r_ref.generated)

    eng = ServingEngine(params, CFG, max_slots=2, checkpoint_interval=100)
    eng.submit([3, 5, 7], max_new_tokens=4, uid=100)
    eng.step()                       # takes the one-and-only checkpoint
    late = eng.submit([41, 43, 47], max_new_tokens=6, uid=500)
    eng._decode = flaky = FlakyDecode(eng._decode, fail_on=2)
    eng.run_to_completion()
    assert flaky.faults == 1
    assert late.done and list(late.generated) == want


def test_restore_advances_next_uid(params):
    """restore() must advance _next_uid past every restored uid so a
    fresh engine's default-uid submit cannot collide with a live restored
    request (advisor round-2 medium finding)."""
    a = ServingEngine(params, CFG, max_slots=2)
    a.submit([3, 5, 7], max_new_tokens=6)           # default uid 0
    a.submit([11, 13], max_new_tokens=6)            # default uid 1
    a.step()
    snap = a.snapshot()

    b = ServingEngine(params, CFG, max_slots=2)
    b.restore(snap)
    fresh = b.submit([17, 19], max_new_tokens=4)    # default uid must be >= 2
    live_uids = [r.uid for r in list(b.pending)
                 + [r for r in b.slots if r is not None]]
    assert len(live_uids) == len(set(live_uids))
    assert fresh.uid >= 2
    b.run_to_completion()
    assert fresh.done and len(fresh.generated) > 0
