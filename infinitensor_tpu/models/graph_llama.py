"""Llama-family decoder built ON THE GRAPH IR (GraphHandler ops).

This is the framework's own end-to-end LLM story — the analog of the
reference's flagship example, which decodes Llama through its graph engine
with the fused AttentionKVCache op (reference
examples/python/llama_kvcache_inference.py:102-144, AttentionKVCache import
in pyinfinitensor/src/pyinfinitensor/onnx.py). The hand-written JAX model
(models/llama.py) is the serving fast path; THIS module proves the same
model runs through GraphHandler -> Graph IR -> ONNX round-trip ->
GraphExecutor with a donated KV cache, token-for-token identical.

Build: one decode-step graph (token [B], pos [B], per-layer KV caches in,
logits + updated caches out) using MatMul / RMSNorm / RoPE /
AttentionKVCache / Sigmoid / Mul / Add / Gather / Reshape / Transpose.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np

from infinitensor_tpu.core import dtype as dt
from infinitensor_tpu.core.handler import GraphHandler
from infinitensor_tpu.models.llama import LlamaConfig


@dataclasses.dataclass
class GraphLlamaDecoder:
    """Decode-step graph + the tensor-name map needed to drive it."""

    handler: GraphHandler
    cfg: LlamaConfig
    batch: int
    max_seq: int
    token_name: str
    pos_name: str
    logits_name: str
    k_in: list            # per-layer cache input tensor names
    v_in: list
    k_out: list           # per-layer cache output tensor names
    v_out: list
    ks_in: list = dataclasses.field(default_factory=list)   # int8-KV scales
    vs_in: list = dataclasses.field(default_factory=list)
    ks_out: list = dataclasses.field(default_factory=list)
    vs_out: list = dataclasses.field(default_factory=list)

    @property
    def graph(self):
        return self.handler.graph

    def state_map(self) -> dict:
        m = {}
        for i in range(self.cfg.n_layers):
            m[self.k_in[i]] = self.k_out[i]
            m[self.v_in[i]] = self.v_out[i]
        for i in range(len(self.ks_in)):
            m[self.ks_in[i]] = self.ks_out[i]
            m[self.vs_in[i]] = self.vs_out[i]
        return m


def build_llama_decoder(params: dict, cfg: LlamaConfig, batch: int = 1,
                        max_seq: Optional[int] = None,
                        name: str = "llama_decoder",
                        kv_quant: bool = False,
                        external_weights: bool = False
                        ) -> GraphLlamaDecoder:
    """Build the one-token decode graph from a models/llama.py param
    pytree. Accepts BOTH layouts:

    - float (wq/wk/wv/wo/w_gate/w_up/w_down arrays, fp32 or bf16) —
      plain MatMul ops;
    - weight-only quantized (quantize_llama_params output: fused "wqkv" /
      "w_gateup" QuantizedLinear + "wo"/"w_down"/lm_head) — MatMulWOQ ops
      with the pre-attention/pre-MLP RMSNorms FUSED into the matmul
      kernel, exactly like the hand-written fast path (_linear_norm).

    GQA (n_kv_heads < n_heads) is supported in both: caches are
    [B, Hkv, S, D] and the AttentionKVCache ops broadcast query groups.
    kv_quant=True stores the cache INT8 with per-(b, h, s) scales
    (AttentionKVCacheQ8), the BASELINE config-4 layout.

    Reference analog: examples/python/llama_kvcache_inference.py:102-144
    builds its flagship decode graph through the engine's GraphHandler the
    same way.
    """
    from infinitensor_tpu.quant.weight_only import QuantizedLinear

    S = max_seq or cfg.max_seq
    B, H, Hkv, D, dim = (batch, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim,
                         cfg.dim)
    kvd = Hkv * D
    h = GraphHandler(name=name)
    np_act = np.dtype(cfg.dtype) if cfg.dtype is not None else np.float32
    act_dt = dt.DataType.from_numpy(np_act)

    def w(arr, wname):
        if external_weights:
            # shape/dtype only — the value is bound on-device later via
            # GraphExecutor.set_weight (no host round trip for big params)
            return h.weight_placeholder(np.shape(arr), act_dt, name=wname)
        return h.weight(np.asarray(arr, np_act), name=wname)

    def wq_tensors(q: QuantizedLinear, prefix):
        if external_weights:
            qw = h.weight_placeholder(q.qweight.shape, dt.INT8,
                                      name=f"{prefix}.qweight")
            sc = h.weight_placeholder(
                q.scales.shape, dt.DataType.from_numpy(
                    np.dtype(q.scales.dtype)), name=f"{prefix}.scales")
            return qw, sc
        qw = h.weight(np.asarray(q.qweight), name=f"{prefix}.qweight")
        sc = h.weight(np.asarray(q.scales), name=f"{prefix}.scales")
        return qw, sc

    def woq(x, q: QuantizedLinear, prefix, norm_w=None):
        qw, sc = wq_tensors(q, prefix)
        return h.matmul_woq(x, qw, sc, bits=q.bits,
                            group_size=q.group_size, norm_weight=norm_w,
                            eps=cfg.norm_eps, out_logical=q.out_logical)

    embed = w(params["embed"], "embed")
    token = h.input((B,), dtype=dt.INT32, name="token")
    pos = h.input((B,), dtype=dt.INT32, name="pos")
    pos2 = h.reshape(pos, (B, 1))

    k_in, v_in, k_out, v_out = [], [], [], []
    ks_in, vs_in, ks_out, vs_out = [], [], [], []
    x = h.reshape(h.gather(embed, token, axis=0), (B, 1, dim))
    for i, layer in enumerate(params["layers"]):
        cache_dt = dt.INT8 if kv_quant else act_dt
        kc = h.input((B, Hkv, S, D), dtype=cache_dt, name=f"k_cache_{i}")
        vc = h.input((B, Hkv, S, D), dtype=cache_dt, name=f"v_cache_{i}")
        k_in.append(kc.name)
        v_in.append(vc.name)
        if kv_quant:
            ksc = h.input((B, Hkv, S), dtype=dt.FLOAT32,
                          name=f"k_scale_{i}")
            vsc = h.input((B, Hkv, S), dtype=dt.FLOAT32,
                          name=f"v_scale_{i}")
            ks_in.append(ksc.name)
            vs_in.append(vsc.name)

        attn_norm = w(layer["attn_norm"], f"l{i}.attn_norm")
        if "wqkv" in layer:                   # quantized fused layout
            qkv = woq(x, layer["wqkv"], f"l{i}.wqkv", norm_w=attn_norm)
            q, k, v = h.split(qkv, -1, [dim, kvd, kvd])
        elif isinstance(layer.get("wq"), QuantizedLinear):
            q = woq(x, layer["wq"], f"l{i}.wq", norm_w=attn_norm)
            k = woq(x, layer["wk"], f"l{i}.wk", norm_w=attn_norm)
            v = woq(x, layer["wv"], f"l{i}.wv", norm_w=attn_norm)
        else:
            hn = h.rms_norm(x, attn_norm, epsilon=cfg.norm_eps)
            q = h.matmul(hn, w(layer["wq"], f"l{i}.wq"))
            k = h.matmul(hn, w(layer["wk"], f"l{i}.wk"))
            v = h.matmul(hn, w(layer["wv"], f"l{i}.wv"))
        q = h.rope(pos2, q, dim_head=D, theta=cfg.rope_theta)
        k = h.rope(pos2, k, dim_head=D, theta=cfg.rope_theta)

        def heads(t, nh):
            return h.transpose(h.reshape(t, (B, 1, nh, D)), (0, 2, 1, 3))

        if kv_quant:
            att, kc2, vc2, ks2, vs2 = h.attention_kvcache_q8(
                kc, vc, ksc, vsc, heads(q, H), heads(k, Hkv),
                heads(v, Hkv), pos)
            ks_out.append(ks2.name)
            vs_out.append(vs2.name)
        else:
            att, kc2, vc2 = h.attention_kvcache(
                kc, vc, heads(q, H), heads(k, Hkv), heads(v, Hkv), pos)
        k_out.append(kc2.name)
        v_out.append(vc2.name)
        att = h.reshape(h.transpose(att, (0, 2, 1, 3)), (B, 1, dim))
        if isinstance(layer.get("wo"), QuantizedLinear):
            x = h.add(x, woq(att, layer["wo"], f"l{i}.wo"))
        else:
            x = h.add(x, h.matmul(att, w(layer["wo"], f"l{i}.wo")))

        mlp_norm = w(layer["mlp_norm"], f"l{i}.mlp_norm")
        inter = cfg.intermediate
        if "w_gateup" in layer:               # quantized fused layout
            gu = woq(x, layer["w_gateup"], f"l{i}.w_gateup",
                     norm_w=mlp_norm)
            gate, up = h.split(gu, -1, [inter, inter])
        elif isinstance(layer.get("w_gate"), QuantizedLinear):
            gate = woq(x, layer["w_gate"], f"l{i}.w_gate", norm_w=mlp_norm)
            up = woq(x, layer["w_up"], f"l{i}.w_up", norm_w=mlp_norm)
        else:
            h2 = h.rms_norm(x, mlp_norm, epsilon=cfg.norm_eps)
            gate = h.matmul(h2, w(layer["w_gate"], f"l{i}.w_gate"))
            up = h.matmul(h2, w(layer["w_up"], f"l{i}.w_up"))
        act = h.mul(h.mul(gate, h.sigmoid(gate)), up)      # SiLU(gate)*up
        if isinstance(layer.get("w_down"), QuantizedLinear):
            x = h.add(x, woq(act, layer["w_down"], f"l{i}.w_down"))
        else:
            x = h.add(x, h.matmul(act, w(layer["w_down"], f"l{i}.w_down")))

    xf = h.rms_norm(x, w(params["final_norm"], "final_norm"),
                    epsilon=cfg.norm_eps)
    xf2 = h.reshape(xf, (B, dim))
    if isinstance(params["lm_head"], QuantizedLinear):
        logits = woq(xf2, params["lm_head"], "lm_head")
    else:
        logits = h.matmul(xf2, w(params["lm_head"], "lm_head"))
    h.graph.infer_output_roles()
    return GraphLlamaDecoder(h, cfg, B, S, token.name, pos.name,
                             logits.name, k_in, v_in, k_out, v_out,
                             ks_in, vs_in, ks_out, vs_out)


def graph_greedy_decode(dec: GraphLlamaDecoder, first_token, n_steps: int,
                        start_pos: int, executor=None):
    """Autoregressive greedy decode through GraphExecutor with DONATED
    cache state. Returns np.int32 [B, n_steps] (first entry = first_token's
    successor ... mirrors models/llama.greedy_generate's decode phase)."""
    import jax.numpy as jnp
    from infinitensor_tpu.runtime.executor import GraphExecutor

    ex = executor or GraphExecutor(dec.graph)
    step = ex.stepper(dec.state_map())
    B = dec.batch
    tok = np.full((B,), first_token, np.int32) if np.isscalar(first_token) \
        else np.asarray(first_token, np.int32)
    out_toks = []
    for j in range(n_steps):
        outs = step({dec.token_name: tok,
                     dec.pos_name: np.full((B,), start_pos + j, np.int32)})
        tok = np.asarray(jnp.argmax(outs[dec.logits_name], axis=-1),
                         np.int32)
        out_toks.append(tok)
    return np.stack(out_toks, axis=1)


# ---------------------------------------------------------------------------
# ServingEngine adapter: a graph-IR model as the engine's model family
# ---------------------------------------------------------------------------

class GraphLlamaServingAdapter:
    """Adapts a graph-IR Llama decoder to ServingEngine's model-family
    interface (prefill_fn / decode_fn / init_cache_fn).

    The engine traces these under jit with the cache donated, so the
    adapter resolves a decode graph per (batch, max_seq) geometry at trace
    time (the executable-per-geometry discipline the reference implements
    as its CUDA-Graph capture cache) and prefill is a per-position scan of
    the same decode step — the reference's llama example feeds the prompt
    through the decode graph one position at a time the same way
    (llama_kvcache_inference.py:102-144)."""

    def __init__(self, params: dict, cfg: LlamaConfig,
                 kv_quant: bool = False):
        self.params = params
        self.cfg = cfg
        self.kv_quant = bool(kv_quant)
        self._built: dict = {}

    def _decoder(self, batch: int, max_seq: int) -> GraphLlamaDecoder:
        key = (batch, max_seq)
        if key not in self._built:
            dec = build_llama_decoder(self.params, self.cfg, batch,
                                      max_seq, kv_quant=self.kv_quant,
                                      external_weights=True)
            from infinitensor_tpu.runtime.executor import GraphExecutor
            self._built[key] = (dec, GraphExecutor(dec.graph))
        return self._built[key]

    def _weights_from_params(self, params):
        """Graph weight-name dict from the llama param pytree (float OR
        weight-only-quantized), built at TRACE time from the traced
        `params` argument — weights must flow through jit arguments, not
        closures (a closure-captured weight set becomes per-executable
        HLO constants; see the repo's jit-closure-constants note)."""
        import jax.numpy as jnp
        from infinitensor_tpu.quant.weight_only import QuantizedLinear

        w = {}

        def put(name, v):
            if isinstance(v, QuantizedLinear):
                w[f"{name}.qweight"] = v.qweight
                w[f"{name}.scales"] = v.scales
            else:
                w[name] = jnp.asarray(v)
        put("embed", params["embed"])
        put("final_norm", params["final_norm"])
        put("lm_head", params["lm_head"])
        for i, layer in enumerate(params["layers"]):
            for k, v in layer.items():
                put(f"l{i}.{k}", v)
        return w

    def _forward(self, params, token, pos, cache):
        """One traced decode step: (logits [B, vocab], cache')."""
        import jax.numpy as jnp

        B = token.shape[0]
        S = cache["k"][0].shape[2]
        dec, ex = self._decoder(B, S)
        vals = {dec.token_name: token.astype(jnp.int32),
                dec.pos_name: pos.astype(jnp.int32)}
        for i in range(self.cfg.n_layers):
            vals[dec.k_in[i]] = cache["k"][i]
            vals[dec.v_in[i]] = cache["v"][i]
        if self.kv_quant:
            for i in range(self.cfg.n_layers):
                vals[dec.ks_in[i]] = cache["k_scale"][i]
                vals[dec.vs_in[i]] = cache["v_scale"][i]
        out = ex._forward(vals, self._weights_from_params(params))
        new_cache = {"k": [out[n] for n in dec.k_out],
                     "v": [out[n] for n in dec.v_out]}
        if self.kv_quant:
            new_cache["k_scale"] = [out[n] for n in dec.ks_out]
            new_cache["v_scale"] = [out[n] for n in dec.vs_out]
        return out[dec.logits_name], new_cache

    # engine-facing fns (same signatures as models/llama.py) -------------
    def decode_fn(self, params, cfg, token, pos, cache):
        return self._forward(params, token, pos, cache)

    def prefill_fn(self, params, cfg, tokens, cache):
        """tokens [B, S] -> (logits [B, S, vocab], cache'): scan the decode
        graph over positions."""
        import jax
        import jax.numpy as jnp

        B, S = tokens.shape

        def body(c, inp):
            tok, p = inp
            logits, c = self._forward(params, tok, p, c)
            return c, logits

        toks_t = jnp.moveaxis(tokens, 0, 1)               # [S, B]
        ps = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[:, None],
                              (S, B))
        cache, logits = jax.lax.scan(body, cache, (toks_t, ps))
        return jnp.moveaxis(logits, 0, 1), cache

    def init_cache_fn(self, cfg, batch, max_seq=None, dtype=None):
        from infinitensor_tpu.models.llama import init_kv_cache
        import jax.numpy as jnp
        return init_kv_cache(cfg, batch, max_seq=max_seq,
                             dtype=dtype or cfg.dtype,
                             kv_quant=self.kv_quant)


def bind_llama_weights(dec: GraphLlamaDecoder, executor, params: dict
                       ) -> None:
    """Bind a models/llama.py param pytree (float or quantized) onto a
    decoder built with external_weights=True. Values may be on-device jax
    arrays — set_weight adopts them without a host round trip."""
    from infinitensor_tpu.quant.weight_only import QuantizedLinear

    def put_lin(prefix, v):
        if isinstance(v, QuantizedLinear):
            executor.set_weight(f"{prefix}.qweight", v.qweight)
            executor.set_weight(f"{prefix}.scales", v.scales)
        else:
            executor.set_weight(prefix, v)

    executor.set_weight("embed", params["embed"])
    executor.set_weight("final_norm", params["final_norm"])
    put_lin("lm_head", params["lm_head"])
    for i, layer in enumerate(params["layers"]):
        for k, v in layer.items():
            if k in ("attn_norm", "mlp_norm"):
                executor.set_weight(f"l{i}.{k}", v)
            else:
                put_lin(f"l{i}.{k}", v)


# ---------------------------------------------------------------------------
# Fused multi-step decode: lax.scan over the graph step
# ---------------------------------------------------------------------------

def make_fused_greedy_decode(dec: GraphLlamaDecoder, executor=None,
                             multi: int = 128, donate: bool = True):
    """Compile `multi` greedy decode steps of the GRAPH-IR model into ONE
    executable: lax.scan over GraphExecutor._forward with argmax token
    feedback and the KV state threaded (donated) through the scan.

    This is the launch-amortization that makes the graph path match the
    hand-written fast path on-chip: the ~25-30 ms per-launch tunnel
    round-trip is paid once per `multi` tokens (bench.py multi=128
    protocol). The reference amortizes its per-op dispatch the same way
    with CUDA-Graph capture/replay (src/cuda/cuda_runtime.cc:351-426).

    Returns (step_fn, weights, init_state) where
    ``step_fn(weights, tok, pos0, state) -> (tokens [B, multi], state)``
    is jitted with state donated — reuse the RETURNED state each call.
    """
    import jax
    import jax.numpy as jnp
    from infinitensor_tpu.runtime.executor import GraphExecutor

    ex = executor or GraphExecutor(dec.graph)
    state_map = dec.state_map()
    in_by_name = {t.name: t for t in ex._inputs}
    init_state = {n: jnp.zeros(in_by_name[n].shape,
                               in_by_name[n].dtype.jnp())
                  for n in state_map}

    def step_fn(weights, tok, pos0, state):
        def body(carry, _):
            tok, pos, state = carry
            vals = {dec.token_name: tok, dec.pos_name: pos}
            vals.update(state)
            out = ex._forward(vals, weights)
            nstate = {k: out[v] for k, v in state_map.items()}
            ntok = jnp.argmax(out[dec.logits_name], axis=-1
                              ).astype(jnp.int32)
            return (ntok, pos + 1, nstate), ntok

        (tok, pos, state), toks = jax.lax.scan(
            body, (tok, pos0, state), None, length=multi)
        return jnp.moveaxis(toks, 0, 1), state

    fn = jax.jit(step_fn, donate_argnums=(3,) if donate else ())
    return fn, ex._weight_arrays(), init_state
