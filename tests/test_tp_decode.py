"""Explicit shard_map TP decode (parallel/tp_decode.py): the Megatron
column/row placement with explicit psum/all_gather must be numerically
identical to the single-device quantized model — the quantization groups
run along the contraction dim, so shard-then-quantize == quantize-then-
shard when group_size divides the shard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinitensor_tpu.models.llama import (
    LlamaConfig, init_kv_cache, init_llama_params, llama_decode_step,
    quantize_llama_params)
from infinitensor_tpu.parallel.mesh import make_mesh
from infinitensor_tpu.parallel.tp_decode import (
    init_tp_kv_cache, make_tp_decode_step, make_tp_quant_params)

CFG = LlamaConfig(vocab_size=256, dim=256, n_layers=2, n_heads=8,
                  n_kv_heads=4, intermediate=512, max_seq=32,
                  dtype=jnp.float32)


@pytest.fixture(scope="module")
def fparams():
    return init_llama_params(CFG, jax.random.PRNGKey(5),
                             dtype=jnp.float32)


@pytest.mark.parametrize("tp,dp", [(4, 1), (4, 2)])
def test_tp_decode_matches_single_device(fparams, tp, dp):
    devs = jax.devices()
    if len(devs) < tp * dp:
        pytest.skip("needs virtual mesh")
    mesh = make_mesh({"dp": dp, "tp": tp}, devs[:tp * dp])

    # single-device reference: quantize the FULL weights (groups along
    # contraction dim == per-shard groups)
    qparams = quantize_llama_params(fparams, bits=8, group_size=64,
                                    fuse=False)
    B = 2 * dp
    cache = init_kv_cache(CFG, B, kv_quant=True)
    tok = jnp.arange(B, dtype=jnp.int32) + 3
    pos = jnp.zeros((B,), jnp.int32)
    want_logits, want_cache = llama_decode_step(qparams, CFG, tok, pos,
                                                cache)

    tparams = make_tp_quant_params(fparams, CFG, tp, bits=8,
                                   group_size=64)
    step = make_tp_decode_step(CFG, mesh, kv_quant=True)
    tcache = init_tp_kv_cache(CFG, B, tp, kv_quant=True)
    got_logits, got_cache = step(tparams, tok, pos, tcache)

    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits),
                               rtol=2e-4, atol=2e-4)

    # autoregressive: two more steps, threading the cache
    for j in range(1, 3):
        tok_w = jnp.argmax(want_logits, axis=-1).astype(jnp.int32)
        tok_g = jnp.argmax(got_logits, axis=-1).astype(jnp.int32)
        assert list(np.asarray(tok_g)) == list(np.asarray(tok_w))
        posj = jnp.full((B,), j, jnp.int32)
        want_logits, want_cache = llama_decode_step(
            qparams, CFG, tok_w, posj, want_cache)
        got_logits, got_cache = step(tparams, tok_g, posj, got_cache)


def test_tp_collectives_are_exactly_megatron(fparams):
    """Audit the compiled HLO of the shard_map step: per layer exactly
    two tp all-reduces (wo + w_down partials) and one lm_head
    all-gather; ZERO collectives on the dp axis (the DCN axis in the
    70B deployment model) — the coherence property SCALING_70B.json v2
    rests on."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs virtual mesh")
    mesh = make_mesh({"dp": 2, "tp": 4}, devs[:8])
    tparams = make_tp_quant_params(fparams, CFG, 4, bits=8, group_size=64)
    step = make_tp_decode_step(CFG, mesh, kv_quant=True)
    B = 4
    tcache = init_tp_kv_cache(CFG, B, 4, kv_quant=True)
    tok = jnp.zeros((B,), jnp.int32)
    pos = jnp.zeros((B,), jnp.int32)
    hlo = jax.jit(step).lower(tparams, tok, pos, tcache).compile().as_text()

    import re
    ars = re.findall(r"all-reduce[^\n]*replica_groups=(\S+)", hlo)
    ags = re.findall(r"all-gather[^\n]*replica_groups=(\S+)", hlo)
    # tp groups over a ({dp:2, tp:4}) mesh are stride-1 runs of 4
    n_tp_ar = sum("{0,1,2,3}" in g or "[2,4]<=[8]" in g for g in ars)
    assert n_tp_ar >= 2 * CFG.n_layers, (n_tp_ar, ars[:4])
    # nothing crosses dp: no group pairs devices from different dp rows
    for g in ars + ags:
        assert "T(" not in g, f"strided (dp-crossing) group: {g}"


def test_tp_prefill_matches_single_device(fparams):
    """Explicit shard_map TP prefill (admission path): last-token logits
    and the written KV shards must match the single-device prefill; the
    TP decode step must continue seamlessly from the TP-prefilled cache."""
    from infinitensor_tpu.models.llama import llama_prefill
    from infinitensor_tpu.parallel.tp_decode import (
        make_tp_float_params, make_tp_prefill_step)

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs virtual mesh")
    tp, dp = 4, 2
    mesh = make_mesh({"dp": dp, "tp": tp}, devs[:8])
    B, S = 2 * dp, 8
    tokens = (jnp.arange(B * S, dtype=jnp.int32).reshape(B, S) % 200) + 3

    cache = init_kv_cache(CFG, B, kv_quant=True, max_seq=CFG.max_seq)
    want_logits, want_cache = llama_prefill(fparams, CFG, tokens, cache)
    want_last = want_logits[:, -1]

    pparams = make_tp_float_params(fparams, CFG, tp)
    pstep = make_tp_prefill_step(CFG, mesh, kv_quant=True)
    tcache = init_tp_kv_cache(CFG, B, tp, kv_quant=True)
    got_last, got_cache = pstep(pparams, tokens, tcache)

    np.testing.assert_allclose(np.asarray(got_last),
                               np.asarray(want_last), rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(got_cache["k"][0]),
                                  np.asarray(want_cache["k"][0]))

    # TP decode continues from the TP-prefilled cache
    qparams = quantize_llama_params(fparams, bits=8, group_size=64,
                                    fuse=False)
    tok = jnp.argmax(want_last, axis=-1).astype(jnp.int32)
    posS = jnp.full((B,), S, jnp.int32)
    want2, _ = llama_decode_step(qparams, CFG, tok, posS, want_cache)
    tparams = make_tp_quant_params(fparams, CFG, tp, bits=8, group_size=64)
    dstep = make_tp_decode_step(CFG, mesh, kv_quant=True)
    got2, _ = dstep(tparams, tok, posS, got_cache)
    assert list(np.asarray(jnp.argmax(got2, -1))) == \
        list(np.asarray(jnp.argmax(want2, -1)))
