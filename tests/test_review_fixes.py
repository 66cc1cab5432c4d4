"""Regression tests for the round-2 code-review findings: paged-bucket
page alignment, uid-collision-safe recovery, warmup with a max_seq bucket,
spec-decode boundary behavior, draft validation, search fallback winner,
and trace-cache invalidation on config toggles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinitensor_tpu.models.llama import LlamaConfig, init_llama_params
from infinitensor_tpu.serving.engine import ServingEngine
from infinitensor_tpu.serving.paged_engine import PagedServingEngine


@pytest.fixture(scope="module")
def small():
    cfg = LlamaConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                      n_kv_heads=2, intermediate=128, max_seq=96)
    return cfg, init_llama_params(cfg, jax.random.PRNGKey(0))


def test_paged_fallback_bucket_page_aligned(small):
    """A prompt above the largest configured bucket hits the cfg.max_seq
    fallback (96, NOT a page-64 multiple); the paged scatter must not
    floor-divide away the prompt's tail KV rows."""
    cfg, params = small
    prompt = list(np.arange(80) % 100 + 1)    # 80 > largest bucket 64

    dense = ServingEngine(params, cfg, max_slots=2, prefill_buckets=(64,))
    want = dense.submit(prompt, max_new_tokens=8)
    dense.run_to_completion()

    paged = PagedServingEngine(params, cfg, max_slots=2, n_pages=8,
                               page_size=64, prefill_buckets=(64,))
    assert paged._bucket(len(prompt)) % 64 == 0
    got = paged.submit(prompt, max_new_tokens=8)
    paged.run_to_completion()
    assert got.generated == want.generated


def test_default_uids_unique_across_admissions(small):
    """Default uids come from a monotonic counter, not len(pending) —
    collisions would cross-wire requests on the recovery path."""
    cfg, params = small
    eng = ServingEngine(params, cfg, max_slots=2, checkpoint_interval=1)
    r1 = eng.submit([3, 5, 7], max_new_tokens=4)
    eng.step()                     # admits r1; pending drains
    r2 = eng.submit([11, 13], max_new_tokens=4)
    assert r1.uid != r2.uid

    # fault-recover with both live: outputs must stay per-request
    ref = ServingEngine(params, cfg, max_slots=2)
    w1 = ref.submit([3, 5, 7], max_new_tokens=4)
    ref.step()
    w2 = ref.submit([11, 13], max_new_tokens=4)
    ref.run_to_completion()

    real = eng._decode
    state = {"n": 0}

    def flaky(*args):
        state["n"] += 1
        if state["n"] == 2:
            raise RuntimeError("injected")
        return real(*args)

    flaky.clear_cache = lambda: None
    eng._decode = flaky
    eng.run_to_completion()
    assert r1.generated == w1.generated
    assert r2.generated == w2.generated


def test_warmup_with_max_seq_bucket(small):
    """prefill_buckets containing cfg.max_seq (the fallback case) must not
    make warmup() trip the oversized-prompt guard."""
    cfg, params = small
    eng = ServingEngine(params, cfg, max_slots=2,
                        prefill_buckets=(32, cfg.max_seq))
    eng.warmup()                   # raised ValueError before the fix
    assert eng.tokens_out == 0     # counters reset


def test_spec_engine_boundary_matches_dense(small):
    """Near the cache boundary the spec engine must fall back to dense
    decode (not force-retire): emitted tokens are identical for any K."""
    cfg, params = small
    prompt = list(np.arange(60) % 100 + 1)    # 60 + 32 new > max_seq 96

    dense = ServingEngine(params, cfg, max_slots=1, prefill_buckets=(64,))
    want = dense.submit(prompt, max_new_tokens=32)
    dense.run_to_completion()

    spec = ServingEngine(params, cfg, max_slots=1, prefill_buckets=(64,),
                         spec_decode=4)
    got = spec.submit(prompt, max_new_tokens=32)
    spec.run_to_completion()
    assert got.generated == want.generated


def test_spec_engine_rejects_draft_without_propose(small):
    cfg, params = small
    with pytest.raises(ValueError, match="propose"):
        ServingEngine(params, cfg, max_slots=1, spec_decode=2,
                      draft=object())


def test_paged_submit_rejects_pool_overflow(small):
    cfg, params = small
    eng = PagedServingEngine(params, cfg, max_slots=2, n_pages=3,
                             page_size=8, prefill_buckets=(8,))
    with pytest.raises(ValueError, match="pages"):
        eng.submit(list(range(1, 40)), max_new_tokens=32)  # needs > 2 pages


def test_search_returns_input_graph_when_all_scores_inf(monkeypatch):
    from infinitensor_tpu.core.handler import GraphHandler
    from infinitensor_tpu.optimizer.search import SearchEngine

    h = GraphHandler()
    x = h.input((4, 8), name="x")
    w = h.weight(np.ones((8, 8), np.float32))
    h.relu(h.matmul(x, w))
    monkeypatch.setattr(SearchEngine, "_score",
                        lambda self, g: float("inf"))
    out = SearchEngine().run(h.graph)
    assert out is h.graph          # fallback winner, no AttributeError


def test_config_toggle_invalidates_traces():
    """pallas_interpret is read at trace time; set/override must clear the
    jit caches so already-compiled callers re-trace under the new value."""
    from infinitensor_tpu.utils.config import config

    @jax.jit
    def f(x):
        return x + (1.0 if config.pallas_interpret else 2.0)

    x = jnp.zeros((3,))
    assert float(f(x)[0]) == 2.0
    with config.override(pallas_interpret=True):
        assert float(f(x)[0]) == 1.0    # stale cache returned 2.0 pre-fix
    assert float(f(x)[0]) == 2.0
