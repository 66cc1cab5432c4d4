"""Pipeline parallelism (GPipe-style) over a mesh axis.

New capability (the reference has TP only). Stages hold contiguous layer
groups; microbatches stream through the ring with lax.ppermute inside
shard_map. Step t runs microbatch (t - stage) on each stage — the classic
1F schedule with (n_stages - 1) bubble steps. Layer params are stacked
[n_stages, layers_per_stage, ...] and sharded on the "pp" axis, so each
device holds only its stage's weights.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stage_params(layer_params: list, n_stages: int):
    """[L layer pytrees] -> pytree stacked [n_stages, L/n_stages, ...]."""
    L = len(layer_params)
    assert L % n_stages == 0, (L, n_stages)
    per = L // n_stages
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs).reshape((n_stages, per) + xs[0].shape),
        *layer_params)


def _pipeline_local(stage_params, xs, *, stage_fn, n_micro, axis_name,
                    n_stages):
    """shard_map body. stage_params: this stage's [per_stage, ...] pytree;
    xs: [n_micro, ...] microbatched input (replicated). Returns [n_micro, ...]
    outputs (valid on every device after the final gather)."""
    stage = lax.axis_index(axis_name)
    steps = n_micro + n_stages - 1
    x_shape = xs.shape[1:]
    carry = jnp.zeros(x_shape, xs.dtype)
    outs = jnp.zeros((n_micro,) + x_shape, xs.dtype)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    for t in range(steps):
        mb = t - stage                       # microbatch this stage handles
        inject_idx = jnp.clip(t, 0, n_micro - 1)
        injected = lax.dynamic_index_in_dim(xs, inject_idx, keepdims=False)
        inp = jnp.where(stage == 0, injected, carry)
        valid = (mb >= 0) & (mb < n_micro)
        out = stage_fn(stage_params, inp)
        out = jnp.where(valid, out, carry)
        # last stage banks its finished microbatch
        bank_idx = jnp.clip(mb, 0, n_micro - 1)
        do_bank = valid & (stage == n_stages - 1)
        banked = lax.dynamic_update_index_in_dim(
            outs, out, bank_idx, axis=0)
        outs = jnp.where(do_bank, banked, outs)
        carry = lax.ppermute(out, axis_name, perm)

    # broadcast results from the last stage to everyone
    outs = lax.psum(jnp.where(stage == n_stages - 1, outs,
                              jnp.zeros_like(outs)), axis_name)
    return outs


def pipeline_apply(stage_fn, stacked_params, x, n_micro: int, mesh: Mesh,
                   axis_name: str = "pp"):
    """Run x (leading dim divisible by n_micro) through the pipeline.

    stage_fn(stage_layer_params, x_mb) applies one stage's layer group.
    """
    n_stages = mesh.shape[axis_name]
    B = x.shape[0]
    assert B % n_micro == 0
    xs = x.reshape((n_micro, B // n_micro) + x.shape[1:])

    pspec = jax.tree_util.tree_map(lambda _: P(axis_name), stacked_params)
    stacked_params = jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        stacked_params, pspec)

    def body(params_stage, xs_local):
        # params arrive as [1, per_stage, ...]; drop the stage dim
        params_stage = jax.tree_util.tree_map(lambda a: a[0], params_stage)
        return _pipeline_local(params_stage, xs_local, stage_fn=stage_fn,
                               n_micro=n_micro, axis_name=axis_name,
                               n_stages=n_stages)

    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(jax.tree_util.tree_map(
                           lambda _: P(axis_name), stacked_params), P()),
                       out_specs=P(), check_vma=False)
    outs = jax.jit(fn)(stacked_params, xs)
    return outs.reshape((B,) + outs.shape[2:])


def llama_pipeline_prefill(params, cfg, tokens, mesh: Mesh, n_micro: int = 4,
                           axis_name: str = "pp"):
    """Llama prefill with layers pipeline-partitioned across mesh[axis_name].
    Embedding + final norm/head run replicated (cheap); block layers stream
    through the pipeline. Returns logits [B, S, vocab]."""
    from infinitensor_tpu.models.llama import (
        rmsnorm, rope, _attention, _linear, _qkv, _mlp)

    n_stages = mesh.shape[axis_name]
    B, S = tokens.shape
    x = jnp.take(params["embed"], tokens, axis=0)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))

    def one_layer(layer, h):
        hh = rmsnorm(h, layer["attn_norm"], cfg.norm_eps)
        q, k, v = _qkv(cfg, layer, hh)
        q = rope(q, pos[:h.shape[0]], cfg.rope_theta)
        k = rope(k, pos[:h.shape[0]], cfg.rope_theta)
        causal = jnp.tril(jnp.ones((S, S), bool))[None]
        attn = _attention(q, k, v, causal)
        h = h + _linear(attn.reshape(h.shape[0], S, cfg.dim), layer["wo"])
        h2 = rmsnorm(h, layer["mlp_norm"], cfg.norm_eps)
        return h + _mlp(cfg, layer, h2)

    def stage_fn(stage_layers, h):
        per = jax.tree_util.tree_leaves(stage_layers)[0].shape[0]
        for i in range(per):
            layer = jax.tree_util.tree_map(lambda a: a[i], stage_layers)
            h = one_layer(layer, h)
        return h

    stacked = stack_stage_params(params["layers"], n_stages)
    hidden = pipeline_apply(stage_fn, stacked, x, n_micro, mesh, axis_name)
    hidden = rmsnorm(hidden, params["final_norm"], cfg.norm_eps)
    return _linear(hidden, params["lm_head"])
