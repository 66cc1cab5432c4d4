"""Paged KV cache: allocator invariants, append parity vs the dense path,
paged attention vs the dense oracle (reference analog: heap KV mgmt
graph.cc:578-633; here vLLM-style pages per BASELINE)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinitensor_tpu.kernels.attention import (
    decode_attention_ref, _append_kv)
from infinitensor_tpu.kernels.paged_attention import (
    gather_pages, paged_append, paged_decode_ref, paged_flash_decode)
from infinitensor_tpu.serving.paged_cache import (
    PageAllocator, init_paged_cache)


B, HKV, H, D, P, MP = 2, 2, 4, 16, 8, 4  # 2 slots, 4 pages of 8 tokens


def scatter_dense_into_pages(dense, table, P):
    """dense [B, Hkv, S, D] -> pages [N, Hkv, P, D] per table [B, MP]."""
    N = int(table.max()) + 1
    pages = np.zeros((N, dense.shape[1], P, dense.shape[3]), dense.dtype)
    for b in range(dense.shape[0]):
        for j, pid in enumerate(np.asarray(table[b])):
            chunk = dense[b, :, j * P:(j + 1) * P, :]
            if chunk.shape[1]:
                pages[pid, :, :chunk.shape[1]] = np.asarray(chunk)
    return jnp.asarray(pages)


def test_paged_ref_matches_dense(rng):
    S = MP * P
    kd = rng.standard_normal((B, HKV, S, D)).astype(np.float32)
    vd = rng.standard_normal((B, HKV, S, D)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((B, H, 1, D)).astype(np.float32))
    # non-trivial page assignment: slot 0 gets pages [3,1,6,0], slot 1 [5,2,7,4]
    table = jnp.asarray([[3, 1, 6, 0], [5, 2, 7, 4]], jnp.int32)
    pos = jnp.asarray([13, 27], jnp.int32)

    kp = scatter_dense_into_pages(kd, table, P)
    vp = scatter_dense_into_pages(vd, table, P)
    got = paged_decode_ref(q, kp, vp, table, pos)

    # dense oracle with same mask semantics (attend to [0, pos])
    Hrep = H // HKV
    qf = np.asarray(q, np.float32).reshape(B, HKV, Hrep, D)
    s = np.einsum("bgrd,bgsd->bgrs", qf, kd) / np.sqrt(D)
    mask = np.arange(S)[None, None, None, :] <= np.asarray(pos)[:, None, None, None]
    s = np.where(mask, s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    exp = np.einsum("bgrs,bgsd->bgrd", p, vd).reshape(B, H, 1, D)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-4, atol=1e-5)

    # pallas entry falls through to ref on CPU: same numbers
    got2 = paged_flash_decode(q, kp, vp, table, pos)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got), rtol=1e-6)


def test_paged_append_matches_dense(rng):
    table = jnp.asarray([[2, 0, 3, 1], [5, 4, 7, 6]], jnp.int32)
    pos = jnp.asarray([7, 12], jnp.int32)   # slot0 fills page boundary
    S = MP * P
    kd = jnp.asarray(rng.standard_normal((B, HKV, S, D)).astype(np.float32))
    vd = jnp.asarray(rng.standard_normal((B, HKV, S, D)).astype(np.float32))
    kp = scatter_dense_into_pages(kd, table, P)
    vp = scatter_dense_into_pages(vd, table, P)

    knew = jnp.asarray(rng.standard_normal((B, HKV, 1, D)).astype(np.float32))
    vnew = jnp.asarray(rng.standard_normal((B, HKV, 1, D)).astype(np.float32))

    kp2, vp2 = paged_append(kp, vp, knew, vnew, table, pos)
    kd2, vd2 = _append_kv(kd, vd, knew, vnew, pos)

    kg = gather_pages(kp2, table)
    vg = gather_pages(vp2, table)
    # compare only rows < each slot's new length (pages hold stale data past it)
    for b in range(B):
        n = int(pos[b]) + 1
        np.testing.assert_allclose(np.asarray(kg[b, :, :n]),
                                   np.asarray(kd2[b, :, :n]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(vg[b, :, :n]),
                                   np.asarray(vd2[b, :, :n]), rtol=1e-6)


def test_paged_decode_step_parity(rng):
    """Full step: append + attend, paged vs dense decode_attention_ref."""
    table = jnp.asarray([[1, 3, 0, 2], [4, 6, 5, 7]], jnp.int32)
    pos = jnp.asarray([9, 23], jnp.int32)
    S = MP * P
    kd = jnp.asarray(rng.standard_normal((B, HKV, S, D)).astype(np.float32))
    vd = jnp.asarray(rng.standard_normal((B, HKV, S, D)).astype(np.float32))
    kp = scatter_dense_into_pages(kd, table, P)
    vp = scatter_dense_into_pages(vd, table, P)

    q = jnp.asarray(rng.standard_normal((B, HKV, 1, D)).astype(np.float32))
    knew = jnp.asarray(rng.standard_normal((B, HKV, 1, D)).astype(np.float32))
    vnew = jnp.asarray(rng.standard_normal((B, HKV, 1, D)).astype(np.float32))

    out_d, kd2, vd2 = decode_attention_ref(kd, vd, q, knew, vnew, pos)
    kp2, vp2 = paged_append(kp, vp, knew, vnew, table, pos)
    out_p = paged_decode_ref(q, kp2, vp2, table, pos)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d),
                               rtol=1e-4, atol=1e-5)


def test_page_allocator():
    al = PageAllocator(n_pages=6, max_slots=3, max_pages=4)
    a = al.alloc(0, 2)
    b = al.alloc(1, 3)
    assert len(set(a) | set(b)) == 5 and not (set(a) & set(b))
    assert al.can_alloc(1) and not al.can_alloc(2)
    with pytest.raises(MemoryError):
        al.alloc(2, 2)
    al.release(0)
    assert al.can_alloc(3)
    c = al.alloc(2, 3)
    assert not (set(c) & set(b))
    row = al.table_row(1)
    assert len(row) == 4 and row[:3] == b
    with pytest.raises(MemoryError):
        al.alloc(1, 2)  # exceeds max_pages (3 + 2 > 4)


def test_init_paged_cache_shapes():
    c = init_paged_cache(n_layers=2, n_pages=10, n_kv_heads=HKV,
                         page_size=P, head_dim=D, max_slots=3, max_seq=30)
    assert len(c.k_pages) == 2
    assert c.k_pages[0].shape == (10, HKV, P, D)
    assert c.block_table.shape == (3, 4)  # ceil(30/8)
    assert c.max_pages_per_seq == 4


def test_llama_paged_decode_parity():
    """End-to-end: greedy decode with a paged cache (scrambled page
    assignment) == dense-cache decode, token for token."""
    from infinitensor_tpu.models.llama import (
        LlamaConfig, init_llama_params, init_kv_cache, init_paged_kv_cache,
        llama_decode_step)
    cfg = LlamaConfig(vocab_size=96, dim=32, n_layers=2, n_heads=4,
                      n_kv_heads=2, intermediate=64, max_seq=32)
    params = init_llama_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)

    dense = init_kv_cache(cfg, 2, dtype=jnp.float32)
    paged = init_paged_kv_cache(cfg, n_pages=10, page_size=8, max_slots=2,
                                dtype=jnp.float32)
    # scrambled, disjoint page ownership per slot
    paged["block_table"] = jnp.asarray([[7, 2, 5, 0], [3, 8, 1, 6]],
                                       jnp.int32)

    tok_d = tok_p = jnp.asarray([11, 42], jnp.int32)
    pos = jnp.zeros((2,), jnp.int32)
    for step in range(12):  # crosses a page boundary at step 8
        lg_d, dense = llama_decode_step(params, cfg, tok_d, pos, dense)
        lg_p, paged = llama_decode_step(params, cfg, tok_p, pos, paged)
        np.testing.assert_allclose(np.asarray(lg_p), np.asarray(lg_d),
                                   rtol=2e-4, atol=2e-5)
        tok_d = jnp.argmax(lg_d, -1).astype(jnp.int32)
        tok_p = jnp.argmax(lg_p, -1).astype(jnp.int32)
        assert (tok_d == tok_p).all()
        pos = pos + 1
