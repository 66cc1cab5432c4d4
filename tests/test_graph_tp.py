"""TP through the graph IR (parallel/graph_tp.py): the Megatron transform
applied to the USER'S graph (reference parallel_opt.py semantics) must be
numerically identical to the single-device graph decode, and its compiled
HLO must carry exactly the Megatron collective set (2 psum/layer + lm_head
all-gather)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinitensor_tpu.models.llama import (
    LlamaConfig, init_llama_params, quantize_llama_params)
from infinitensor_tpu.models.graph_llama import (
    build_llama_decoder, graph_greedy_decode)
from infinitensor_tpu.parallel.graph_tp import (
    TPGraphExecutor, tp_shard_graph)
from infinitensor_tpu.parallel.mesh import make_mesh

CFG = LlamaConfig(vocab_size=256, dim=128, n_layers=2, n_heads=8,
                  n_kv_heads=4, intermediate=256, max_seq=32,
                  dtype=jnp.float32)


def _quant_params(bits):
    fp = init_llama_params(CFG, jax.random.PRNGKey(7), dtype=jnp.float32)
    return quantize_llama_params(fp, bits=bits, group_size=16)


def test_repack_int4_rows_exact():
    from infinitensor_tpu.quant.weight_only import (
        _unpack_int4, repack_int4_rows)
    rng = np.random.default_rng(0)
    packed = rng.integers(-128, 128, size=(32, 24), dtype=np.int64
                          ).astype(np.int8)
    vals = np.asarray(_unpack_int4(jnp.asarray(packed)))     # [64, 24]
    for tp in (2, 4):
        n = 64 // tp
        for r in range(tp):
            shard = repack_int4_rows(packed, r * n, n)
            got = np.asarray(_unpack_int4(jnp.asarray(shard)))
            np.testing.assert_array_equal(got, vals[r * n:(r + 1) * n])


@pytest.mark.parametrize("bits,kv_quant", [(4, True), (8, False)])
def test_graph_tp_parity(bits, kv_quant):
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs virtual mesh")
    tp = 4
    mesh = make_mesh({"tp": tp}, devs[:tp])
    params = _quant_params(bits)
    B = 2

    dec = build_llama_decoder(params, CFG, batch=B, kv_quant=kv_quant)
    want = graph_greedy_decode(dec, first_token=5, n_steps=6, start_pos=0)

    dec2 = build_llama_decoder(params, CFG, batch=B, kv_quant=kv_quant,
                               name="tp_src")
    sg = tp_shard_graph(dec2.graph, tp)
    # the transform actually sharded the big weights
    assert sg.plans["l0.wqkv.qweight"][0] == "col"
    assert sg.plans["l0.wo.qweight"][0] in ("row", "row_q4")
    tex = TPGraphExecutor(sg, mesh)
    step = tex.stepper(dec2.state_map())
    tok = np.full((B,), 5, np.int32)
    got = []
    for j in range(6):
        out = step({dec2.token_name: tok,
                    dec2.pos_name: np.full((B,), j, np.int32)})
        tok = np.asarray(jnp.argmax(out[sg.name_map[dec2.logits_name]],
                                    axis=-1), np.int32)
        got.append(tok)
    got = np.stack(got, axis=1)
    np.testing.assert_array_equal(got, want)


def test_graph_tp_hlo_is_megatron():
    """Compiled-HLO audit: 2 tp all-reduces per layer (row-parallel wo +
    w_down) and at least one all-gather (lm_head vocab shards)."""
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs virtual mesh")
    tp = 4
    mesh = make_mesh({"tp": tp}, devs[:tp])
    params = _quant_params(4)
    dec = build_llama_decoder(params, CFG, batch=2, kv_quant=True,
                              name="hlo_src")
    sg = tp_shard_graph(dec.graph, tp)
    tex = TPGraphExecutor(sg, mesh)

    g = sg.graph
    input_names = [t.name for t in g.inputs()]
    fn = jax.jit(tex.shard_mapped(input_names))
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    inputs = {}
    for t in g.inputs():
        p = sg.input_place.get(t.name)
        shape = list(t.shape)
        if p is not None and p.is_shard():
            shape[p.dim % len(shape)] *= tp
        if t.dtype.is_float:
            inputs[t.name] = jnp.zeros(shape, t.dtype.jnp())
        else:
            inputs[t.name] = jnp.zeros(shape, t.dtype.jnp())
    hlo = fn.lower(inputs, tex._weights).compile().as_text()

    import re
    ars = re.findall(r"all-reduce[^\n]*replica_groups=(\S+)", hlo)
    ags = re.findall(r"all-gather[^\n]*replica_groups=(\S+)", hlo)
    n_tp_ar = sum("{0,1,2,3}" in a for a in ars)
    assert n_tp_ar == 2 * CFG.n_layers, (n_tp_ar, ars)
    assert len(ags) >= 1


def test_graph_tp_graph_op_counts():
    """IR-level structure: the transform inserts exactly 2 AllReduceSum per
    layer and one AllGather, and the sharded weight shapes are local."""
    params = _quant_params(8)
    dec = build_llama_decoder(params, CFG, batch=1, kv_quant=False,
                              name="ir_src")
    sg = tp_shard_graph(dec.graph, 2)
    kinds = {}
    for op in sg.graph.operators:
        kinds[op.op_type] = kinds.get(op.op_type, 0) + 1
    assert kinds.get("AllReduceSum", 0) == 2 * CFG.n_layers
    assert kinds.get("AllGather", 0) == 1
    qw = sg.graph.tensor_by_name("l0.wqkv.qweight")
    kvd = CFG.n_kv_heads * CFG.head_dim
    assert qw.shape[-1] == (CFG.dim + 2 * kvd) // 2
    # row-parallel w_down shards the contraction dim
    wd = sg.graph.tensor_by_name("l0.w_down.qweight")
    assert wd.shape[0] == CFG.intermediate // 2
