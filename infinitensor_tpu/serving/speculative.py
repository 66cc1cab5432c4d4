"""Speculative decoding: draft K tokens cheaply, verify them in ONE fused
target-model forward (models/llama.py llama_verify_step), accept the
longest greedy-matching prefix. Lossless: emitted tokens are exactly the
target model's greedy decode. The reference has no speculative path; its
closest machinery is the fused decode kernel (attention_kvcache.cu), which
verify generalizes to K>1 — and the per-position causal masks mean
rejection needs NO cache rollback (not advancing ``pos`` is the rollback).

Draft strategies (both zero-egress friendly):
* ModelDraft    — a smaller/quantized model (e.g. INT4 draft verifying
                  under the bf16 target: weights already in memory);
* PromptLookupDraft — n-gram continuation lookup over the slot's own
                  history (host-side, no second model).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from infinitensor_tpu.models.llama import (
    init_kv_cache, llama_decode_step, llama_prefill, llama_verify_step,
)


class PromptLookupDraft:
    """Propose continuations by matching the trailing n-gram against the
    slot's own (prompt + generated) history."""

    def __init__(self, ngram: int = 2):
        self.ngram = max(1, int(ngram))

    def propose(self, history: Sequence[int], k: int) -> list:
        hist = list(history)
        for n in range(min(self.ngram, len(hist) - 1), 0, -1):
            tail = hist[-n:]
            # most recent earlier occurrence of the tail
            for start in range(len(hist) - n - 1, -1, -1):
                if hist[start:start + n] == tail:
                    cont = hist[start + n:start + n + k]
                    if cont:
                        return (cont + [hist[-1]] * k)[:k]
        return [hist[-1]] * k   # degenerate fallback: repeat


class ModelDraft:
    """Greedy draft from a (smaller / lower-precision) model sharing the
    target's tokenizer. Maintains its own KV cache; mispredictions need no
    rollback (pos gating)."""

    def __init__(self, params, cfg, batch: int,
                 max_seq: Optional[int] = None):
        self.params, self.cfg = params, cfg
        self.cache = init_kv_cache(cfg, batch, max_seq=max_seq)
        self._prefill = jax.jit(llama_prefill, static_argnums=1,
                                donate_argnums=3)
        # all k draft steps fused into ONE launch (llama_decode_multi):
        # a per-step launch loop costs (k-1) tunnel round-trips per
        # verify — on a ~25 ms/launch tunnel that alone sinks
        # speculation (docs/SPEC_DECODE.json mechanism section)
        from infinitensor_tpu.models.llama import llama_decode_multi
        self._multi = jax.jit(llama_decode_multi,
                              static_argnums=(1, 5), donate_argnums=4)

    def start(self, prompt_tokens) -> None:
        _, self.cache = self._prefill(self.params, self.cfg,
                                      jnp.asarray(prompt_tokens), self.cache)

    def propose_batch(self, token, pos, k: int) -> np.ndarray:
        """token/pos [B] -> proposals [B, k] (greedy, one fused launch)."""
        tok = jnp.asarray(token, jnp.int32)
        p = jnp.asarray(pos, jnp.int32)
        toks, _, _, self.cache = self._multi(self.params, self.cfg, tok,
                                             p, self.cache, k)
        return np.asarray(toks, np.int32)


def speculative_generate(params, cfg, prompt_tokens, n_steps: int,
                         K: int = 4, draft=None,
                         cache=None) -> tuple:
    """Greedy speculative decode. prompt_tokens [B, S]; returns
    (tokens [B, n_steps], stats dict). Output tokens are bitwise identical
    to greedy_generate's (lossless acceptance).

    draft: ModelDraft | PromptLookupDraft | None (defaults to
    prompt-lookup). K counts the verify width: 1 committed token + K-1
    draft proposals per fused verify launch."""
    prompt_tokens = jnp.asarray(prompt_tokens, jnp.int32)
    B, S = prompt_tokens.shape
    K = max(2, int(K))
    if draft is None:
        draft = PromptLookupDraft()
    if cache is None:
        # verify writes up to K rows past the last committed position
        cache = init_kv_cache(cfg, B, max_seq=max(cfg.max_seq,
                                                  S + n_steps + 2 * K))

    logits, cache = jax.jit(llama_prefill, static_argnums=1,
                            donate_argnums=3)(
        params, cfg, prompt_tokens, cache)
    cur = np.array(jnp.argmax(logits[:, -1], axis=-1), np.int32)  # [B]
    pos = np.full((B,), S, np.int32)

    vstep = jax.jit(llama_verify_step, static_argnums=1, donate_argnums=4)

    history = [list(np.asarray(prompt_tokens[b])) + [int(cur[b])]
               for b in range(B)]
    out: list = [[int(cur[b])] for b in range(B)]
    if isinstance(draft, ModelDraft):
        draft.start(prompt_tokens)

    launches = accepted_total = proposed_total = 0
    while any(len(o) < n_steps for o in out):
        if isinstance(draft, ModelDraft):
            props = draft.propose_batch(cur, pos, K - 1)       # [B, K-1]
        else:
            props = np.stack([
                np.asarray(draft.propose(history[b], K - 1), np.int32)
                for b in range(B)])
        inputs = np.concatenate([cur[:, None], props[:, :K - 1]], axis=1)
        logits, cache = vstep(params, cfg, jnp.asarray(inputs),
                              jnp.asarray(pos), cache)
        greedy = np.asarray(jnp.argmax(logits, axis=-1), np.int32)  # [B, K]
        launches += 1
        for b in range(B):
            if len(out[b]) >= n_steps:
                pos[b] += 1     # keep feeding; emitted tokens are final
                cur[b] = greedy[b, 0]
                continue
            n_acc = 0
            while n_acc < K - 1 and props[b, n_acc] == greedy[b, n_acc]:
                n_acc += 1
            emit = list(greedy[b, :n_acc + 1])
            accepted_total += n_acc
            proposed_total += K - 1
            out[b].extend(int(t) for t in emit)
            history[b].extend(int(t) for t in emit)
            pos[b] += n_acc + 1
            cur[b] = greedy[b, n_acc]
    tokens = np.asarray([o[:n_steps] for o in out], np.int32)
    stats = {
        "verify_launches": launches,
        "accept_rate": (accepted_total / proposed_total
                        if proposed_total else 0.0),
        "tokens_per_launch": tokens.size / max(launches, 1),
    }
    return tokens, stats
