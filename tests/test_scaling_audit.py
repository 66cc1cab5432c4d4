"""Compile-level collective audit of the sharded decode step.

Asserts the core property behind the multi-host scaling claim (BASELINE
config 5): with dp as the cross-host (DCN) mesh axis and tp inside the host
(ICI), the Llama decode step's compiled HLO contains NO collective that
crosses the dp axis — decode scales embarrassingly across hosts.
tools/scaling_report.py runs the same audit at 70B geometry.
"""

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from infinitensor_tpu.models.llama import (
    LlamaConfig, init_kv_cache, llama_decode_step)
from infinitensor_tpu.parallel.mesh import make_mesh
from infinitensor_tpu.parallel.llama_sharding import (
    llama_param_specs, llama_cache_specs, tree_specs)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_decode_has_no_dcn_collectives():
    from tools.scaling_report import parse_collectives

    mesh = make_mesh({"dp": 2, "tp": 4}, jax.devices()[:8])
    cfg = LlamaConfig(vocab_size=256, dim=64, n_layers=2, n_heads=4,
                      n_kv_heads=4, intermediate=128, max_seq=32,
                      dtype=jnp.float32)
    from infinitensor_tpu.models.llama import init_llama_params
    params = init_llama_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    cache = init_kv_cache(cfg, 4, dtype=jnp.float32)

    pspecs = tree_specs(params, llama_param_specs(cfg, params))
    cspecs = llama_cache_specs(cfg)
    sh = lambda s: NamedSharding(mesh, s)
    pshard = jax.tree_util.tree_map(sh, pspecs,
                                    is_leaf=lambda x: isinstance(x, P))
    cshard = jax.tree_util.tree_map(sh, cspecs,
                                    is_leaf=lambda x: isinstance(x, P))

    with mesh:
        step = jax.jit(
            lambda p, t, ps, c: llama_decode_step(p, cfg, t, ps, c),
            in_shardings=(pshard, sh(P("dp")), sh(P("dp")), cshard))
        hlo = step.lower(params,
                         jax.ShapeDtypeStruct((4,), jnp.int32),
                         jax.ShapeDtypeStruct((4,), jnp.int32),
                         cache).compile().as_text()

    colls = parse_collectives(hlo, {"dp": 2, "tp": 4}, last_dim=4)
    dcn = [c for c in colls if c["axis"] == "dp/DCN"]
    unknown = [c for c in colls if c["axis"] == "unknown"]
    assert not dcn, f"decode crosses the DCN axis: {dcn[:4]}"
    assert not unknown, f"unclassified collectives: {unknown[:4]}"
    # and TP must actually communicate (row-parallel psum exists)
    assert any(c["axis"] == "tp/ICI" for c in colls)
