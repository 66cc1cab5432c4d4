"""Mixture-of-Experts FFN with expert parallelism.

New capability (no MoE in the reference). Top-k routing with a dense
(capacity-free) combine; under expert parallelism the expert weights are
sharded over the "ep" mesh axis inside shard_map — each device computes only
its local experts and the weighted combine is a psum over the axis. Exact
(no token dropping), which makes it the right correctness baseline for later
capacity/all_to_all variants.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_moe_params(key, dim: int, hidden: int, n_experts: int,
                    dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    scale = 1.0 / jnp.sqrt(dim)
    return {
        "router": (jax.random.normal(k1, (dim, n_experts), jnp.float32)
                   * scale).astype(dtype),
        "w_in": (jax.random.normal(k2, (n_experts, dim, hidden), jnp.float32)
                 * scale).astype(dtype),
        "w_out": (jax.random.normal(k3, (n_experts, hidden, dim), jnp.float32)
                  * (1.0 / jnp.sqrt(hidden))).astype(dtype),
    }


def _routing_weights(params, x, top_k: int):
    """x [T, d] -> combine weights [T, E] (zero outside top-k, renormed)."""
    logits = x.astype(jnp.float32) @ params["router"].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    if top_k >= probs.shape[-1]:
        return probs
    vals, _ = lax.top_k(probs, top_k)
    thresh = vals[:, -1:]
    kept = jnp.where(probs >= thresh, probs, 0.0)
    return kept / jnp.maximum(kept.sum(-1, keepdims=True), 1e-9)


def moe_ffn_ref(params, x, top_k: int = 2):
    """Single-device oracle. x [T, d] -> [T, d]."""
    weights = _routing_weights(params, x, top_k)           # [T, E]
    h = jnp.einsum("td,edh->eth", x.astype(jnp.float32),
                   params["w_in"].astype(jnp.float32))
    h = jax.nn.gelu(h, approximate=True)
    out = jnp.einsum("eth,ehd->etd", h,
                     params["w_out"].astype(jnp.float32))
    return jnp.einsum("etd,te->td", out, weights).astype(x.dtype)


def moe_ffn_ep(params, x, mesh: Mesh, axis_name: str = "ep",
               top_k: int = 2):
    """Expert-parallel MoE: experts sharded over mesh[axis_name]."""
    E = params["w_in"].shape[0]
    world = mesh.shape[axis_name]
    assert E % world == 0

    espec = {"router": P(), "w_in": P(axis_name), "w_out": P(axis_name)}
    placed = {k: jax.device_put(v, NamedSharding(mesh, espec[k]))
              for k, v in params.items()}

    def local(p, xl):
        weights = _routing_weights({"router": p["router"]}, xl, top_k)
        my = lax.axis_index(axis_name)
        e0 = my * (E // world)
        # local experts compute their share; combine via psum
        h = jnp.einsum("td,edh->eth", xl.astype(jnp.float32),
                       p["w_in"].astype(jnp.float32))
        h = jax.nn.gelu(h, approximate=True)
        out = jnp.einsum("eth,ehd->etd", h,
                         p["w_out"].astype(jnp.float32))
        w_slice = lax.dynamic_slice(weights, (0, e0),
                                    (weights.shape[0], E // world))
        partial_out = jnp.einsum("etd,te->td", out, w_slice)
        return lax.psum(partial_out, axis_name).astype(xl.dtype)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=({"router": P(), "w_in": P(axis_name),
                   "w_out": P(axis_name)}, P()),
        out_specs=P(), check_vma=False)
    return jax.jit(fn)(placed, x)
