"""ServingEngine driving the paged KV pool (VERDICT item: the paged
machinery must be driven by the continuous batcher). Reference analog:
heap-region KV lifecycle, /root/reference/src/core/graph.cc:578-633
(cloneKV/free_heap) — here pages allocate on admission and reclaim on
retirement, and heterogeneous sequence lengths share one pool."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinitensor_tpu.models.llama import LlamaConfig, init_llama_params
from infinitensor_tpu.serving import ServingEngine
from infinitensor_tpu.serving.paged_engine import PagedServingEngine


CFG = LlamaConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                  n_kv_heads=2, intermediate=128, max_seq=128)
PAGE = 8


@pytest.fixture(scope="module")
def params():
    return init_llama_params(CFG, jax.random.PRNGKey(0))


def _requests(rng, n=10):
    return [(list(rng.integers(1, CFG.vocab_size, int(p))), int(m))
            for p, m in zip(rng.integers(4, 24, n), rng.integers(6, 16, n))]


def test_paged_matches_dense_engine(params, rng):
    reqs = _requests(rng)
    dense = ServingEngine(params, CFG, max_slots=4, prefill_buckets=(24,))
    paged = PagedServingEngine(params, CFG, max_slots=4, n_pages=33,
                               page_size=PAGE, prefill_buckets=(24,))
    outs = {}
    for name, eng in (("dense", dense), ("paged", paged)):
        rs = [eng.submit(p, max_new_tokens=m) for p, m in reqs]
        eng.run_to_completion()
        outs[name] = [r.generated for r in rs]
        assert all(r.done for r in rs)
    assert outs["paged"] == outs["dense"]


def test_pool_smaller_than_slot_contiguous(params, rng):
    """Total generated traffic exceeds the pool's one-time capacity (and
    the pool is far smaller than max_slots*max_seq slot-contiguous
    reservation) — completion proves admission control + reclaim work."""
    n_pages, slots = 17, 4                      # pool = 16*8 = 128 tokens
    eng = PagedServingEngine(params, CFG, max_slots=slots, n_pages=n_pages,
                             page_size=PAGE, prefill_buckets=(16,))
    slot_contiguous_tokens = slots * CFG.max_seq            # 512
    pool_tokens = (n_pages - 1) * PAGE                      # 128
    assert pool_tokens < slot_contiguous_tokens
    reqs = [eng.submit(list(rng.integers(1, 128, 12)), max_new_tokens=10)
            for _ in range(12)]
    total_tokens = sum(12 + 10 for _ in reqs)               # 264 > 128
    assert total_tokens > pool_tokens
    eng.run_to_completion()
    assert all(r.done for r in reqs)
    assert all(len(r.generated) == 10 for r in reqs)
    # full reclaim: every page back on the free list (page 0 = trash)
    assert eng.free_pages == n_pages - 1
    assert all(not owned for owned in eng.allocator.owned)


def test_admission_blocks_until_reclaim(params, rng):
    """FIFO admission control: with the pool nearly full, a new request
    waits in pending instead of corrupting live pages."""
    eng = PagedServingEngine(params, CFG, max_slots=4, n_pages=9,
                             page_size=PAGE, prefill_buckets=(16,))
    # each request needs ceil((16+20+1+1)/8)=5 pages; pool has 8 usable
    a = eng.submit(list(rng.integers(1, 128, 14)), max_new_tokens=20)
    b = eng.submit(list(rng.integers(1, 128, 14)), max_new_tokens=20)
    eng.step()
    assert not a.done and len(eng.pending) == 1   # b blocked, a admitted
    eng.run_to_completion()
    assert a.done and b.done
    assert eng.free_pages == 8


def test_paged_q8_matches_dense_q8(params, rng):
    reqs = _requests(rng, n=6)
    dense = ServingEngine(params, CFG, max_slots=3, prefill_buckets=(24,),
                          kv_quant=True)
    paged = PagedServingEngine(params, CFG, max_slots=3, n_pages=33,
                               page_size=PAGE, prefill_buckets=(24,),
                               kv_quant=True)
    outs = {}
    for name, eng in (("dense", dense), ("paged", paged)):
        rs = [eng.submit(p, max_new_tokens=m) for p, m in reqs]
        eng.run_to_completion()
        outs[name] = [r.generated for r in rs]
    assert outs["paged"] == outs["dense"]


def test_paged_chunked_decode(params, rng):
    """Fused multi-step decode over the page pool (reservation slack covers
    chunk overrun via the trash page)."""
    eng = PagedServingEngine(params, CFG, max_slots=2, n_pages=25,
                             page_size=PAGE, prefill_buckets=(16,),
                             decode_chunk=4)
    single = PagedServingEngine(params, CFG, max_slots=2, n_pages=25,
                                page_size=PAGE, prefill_buckets=(16,))
    reqs = _requests(rng, n=4)
    outs = {}
    for name, e in (("chunk", eng), ("one", single)):
        rs = [e.submit(p, max_new_tokens=m) for p, m in reqs]
        e.run_to_completion()
        outs[name] = [r.generated[:m] for r, (_, m) in zip(rs, reqs)]
    assert outs["chunk"] == outs["one"]


def test_paged_lookahead_parity(params, rng):
    """Paged engine with decode lookahead matches the plain paged engine
    token-for-token (page alloc/free interleaves with in-flight groups)."""
    reqs = _requests(rng, n=8)

    def run(lookahead):
        eng = PagedServingEngine(params, CFG, max_slots=4, n_pages=33,
                                 page_size=PAGE, prefill_buckets=(24,),
                                 decode_chunk=4, pipeline_depth=2,
                                 lookahead=lookahead)
        rs = [eng.submit(list(p), max_new_tokens=m) for p, m in reqs]
        eng.run_to_completion()
        assert all(r.done for r in rs)
        return [list(r.generated) for r in rs]

    assert run(False) == run(True)
