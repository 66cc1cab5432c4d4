"""Continuous-batching serving engine (greedy decode, single program).

Replaces the reference's static-graph runner + KV heap with a slot-based
continuous batcher: a fixed decode batch of B slots compiles exactly two XLA
programs (prefill bs=1, decode bs=B); requests stream through slots with no
recompiles — the executable-cache discipline the reference builds CUDA-Graph
machinery for (cuda_runtime.cc:351-426) falls out of static shapes.

Flow per step():
  1. admit: pending request + free slot -> jit'ed bs=1 prefill -> write the
     prefill KV into the slot (donated buffers, in-place in HBM)
  2. decode: one fused step over all B slots (inactive slots compute on
     garbage and are masked out on the host)
  3. retire: sequences hitting eos/max_tokens free their slot
"""

from __future__ import annotations

import dataclasses
import functools
import time
from collections import defaultdict, deque
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from infinitensor_tpu.models.llama import (
    init_kv_cache, llama_decode_step, llama_prefill,
)
from infinitensor_tpu.serving.kvcache import merge_prefill_into_slot
from infinitensor_tpu.utils.logging import get_logger

_log = get_logger("serving")


def _cache_shardings(cache, mesh, cache_specs=None):
    """NamedSharding tree for KV slots on `mesh`: any [B, H, S, ...] leaf
    shards batch->dp and heads->tp, with axes the dim can't split over
    dropped (e.g. GQA caches with fewer KV heads than TP ranks stay
    replicated across tp)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = set(mesh.axis_names)
    dp = "dp" if "dp" in axes else None
    tp = "tp" if "tp" in axes else None

    def fits(axis, size):
        return axis if axis and size % mesh.shape[axis] == 0 else None

    def default_cache_spec(leaf):
        r = getattr(leaf, "ndim", 0)
        if r >= 3:
            return P(fits(dp, leaf.shape[0]), fits(tp, leaf.shape[1]),
                     *([None] * (r - 2)))
        return P(*([fits(dp, leaf.shape[0])] + [None] * (r - 1))) \
            if r else P()

    if cache_specs is None:
        cache_specs = jax.tree_util.tree_map(default_cache_spec, cache)
    return jax.tree_util.tree_map(
        lambda x, s: NamedSharding(mesh, s), cache, cache_specs,
        is_leaf=lambda x: isinstance(x, P) or not
        isinstance(x, (dict, list, tuple)))


def _place_cache_on_mesh(cache, mesh, cache_specs=None):
    """Commit KV slots to `mesh` (see _cache_shardings)."""
    return jax.tree_util.tree_map(jax.device_put, cache,
                                  _cache_shardings(cache, mesh,
                                                   cache_specs))


def _prune_spec(spec, mesh):
    """Drop axis names the mesh doesn't have (e.g. Megatron 'tp' specs on
    a dp-only cross-host mesh -> replicated on that dim)."""
    from jax.sharding import PartitionSpec as P

    def keep(a):
        if a is None:
            return None
        if isinstance(a, (tuple, list)):
            kept = tuple(x for x in a if x in mesh.axis_names)
            return kept or None
        return a if a in mesh.axis_names else None

    return P(*[keep(a) for a in spec])


def _place_on_mesh(params, cache, cfg, mesh, param_specs=None,
                   cache_specs=None):
    """Commit params and KV slots to `mesh`. Defaults: Llama-family
    Megatron TP specs for params (parallel/llama_sharding.py), with axes
    the mesh lacks pruned to replicated; cache placement per
    _place_cache_on_mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if param_specs is None:
        from infinitensor_tpu.parallel.llama_sharding import (
            llama_param_specs, tree_specs)
        param_specs = tree_specs(params, llama_param_specs(cfg, params))
    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_s, _ = jax.tree_util.tree_flatten(
        param_specs, is_leaf=lambda x: isinstance(x, P))
    params = jax.tree_util.tree_unflatten(
        treedef, [jax.device_put(x, NamedSharding(
            mesh, _prune_spec(s, mesh)))
            for x, s in zip(flat_p, flat_s)])
    cache = _place_cache_on_mesh(cache, mesh, cache_specs)
    return params, cache


@dataclasses.dataclass
class Request:
    uid: int
    prompt: list[int]
    max_new_tokens: int = 32
    eos_id: Optional[int] = None
    # filled by the engine:
    generated: list = dataclasses.field(default_factory=list)
    done: bool = False


class ServingEngine:
    """Model-agnostic continuous batcher. Defaults to the Llama family;
    pass prefill_fn/decode_fn/init_cache_fn for other model families
    (gpt2: gpt2_prefill/gpt2_decode_step/init_gpt2_cache)."""

    def __init__(self, params, cfg, max_slots: int = 8,
                 prefill_buckets: tuple = (32, 128, 512),
                 prefill_fn=None, decode_fn=None, init_cache_fn=None,
                 decode_chunk: int = 1, kv_quant: bool = False,
                 mesh=None, param_specs=None, cache_specs=None,
                 spec_decode: int = 0, verify_fn=None, draft=None,
                 checkpoint_interval: int = 0, pipeline_depth: int = 1,
                 lookahead: bool = False):
        self.params = params
        self.cfg = cfg
        self.B = max_slots
        if init_cache_fn is None and kv_quant:
            # INT8 KV slots (+ per-row scale planes); the slot-management
            # ops are ndim-generic so scales ride along (kvcache.py)
            init_cache_fn = functools.partial(init_kv_cache, kv_quant=True)
        self._init_cache = init_cache_fn or init_kv_cache
        prefill_fn = prefill_fn or llama_prefill
        decode_fn = decode_fn or llama_decode_step
        self.cache = self._init_cache(cfg, max_slots)
        self.mesh = mesh
        self._cache_specs = cache_specs
        if mesh is not None:
            # SPMD serving: commit params + KV slots to the mesh (TP over
            # heads/hidden, DP over slots); every jitted program below then
            # runs sharded with GSPMD-inserted collectives. This is the
            # multi-host continuous-batching path: dp = the cross-host axis,
            # admission/retirement stay host-side and identical on each host.
            self.params, self.cache = _place_on_mesh(
                self.params, self.cache, cfg, mesh, param_specs, cache_specs)
        self.prefill_buckets = tuple(
            b for b in prefill_buckets if b <= cfg.max_seq) or (cfg.max_seq,)
        # multi-host SPMD serving: when the mesh spans >1 process, every
        # host runs this same engine loop on identical host state; device
        # outputs the host logic reads (tokens) are compiled to REPLICATED
        # layout so each process can fetch them locally, and host inputs
        # are device_put replicated. This is BASELINE config 5's
        # cross-host continuous batching (dp = the cross-host axis).
        self._multihost = mesh is not None and len(
            {d.process_index for d in mesh.devices.flat}) > 1
        self._rep = None
        self._kv_sh = None
        if self._multihost:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._rep = NamedSharding(mesh, P())
            self._kv_sh = _cache_shardings(self.cache, mesh, cache_specs)
            if spec_decode:
                raise ValueError(
                    "spec_decode is not supported on a multi-process mesh")

        self.pending: deque[Request] = deque()
        self.slots: list[Optional[Request]] = [None] * max_slots
        self.pos = np.zeros(max_slots, np.int32)        # next write position
        self.last_token = np.zeros(max_slots, np.int32)

        self._prefill_fn = prefill_fn
        # batched admission: one fused multi-request prefill per
        # (bucket, lane-count) — a whole admission wave lands in ONE
        # launch instead of one per request. (The earlier per-request
        # _prefill_slot path was removed once batched _admit replaced
        # every call site — advisor round-4.)
        self._prefill_batch: dict[tuple, Callable] = {}
        # decode: greedy argmax inside the launch (one round-trip per step)
        self._decode = jax.jit(
            lambda p, t, ps, c: (lambda lg, cc: (
                jnp.argmax(lg, axis=-1).astype(jnp.int32), cc))(
                    *decode_fn(p, cfg, t, ps, c)),
            donate_argnums=3,
            out_shardings=(self._rep, self._kv_sh)
            if self._multihost else None)
        # fused N-step greedy decode: one executable launch per chunk
        # amortizes dispatch latency (see models/llama.py
        # llama_decode_multi); sequences finishing mid-chunk are truncated
        # on the host, trading a few wasted slot-steps for launch overhead.
        self.decode_chunk = max(1, int(decode_chunk))

        def _multi(p, t, ps, c):
            def body(carry, _):
                tok, pp, cc = carry
                logits, cc = decode_fn(p, cfg, tok, pp, cc)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (nxt, pp + 1, cc), nxt
            (tok, pp, cc), toks = jax.lax.scan(
                body, (t, ps, c), length=self.decode_chunk)
            return jnp.moveaxis(toks, 0, 1), tok, pp, cc

        self._decode_multi = jax.jit(
            _multi, donate_argnums=3,
            out_shardings=(self._rep, self._rep, self._rep, self._kv_sh)
            if self._multihost else None)

        # speculative continuous batching: one fused K-token verify per
        # engine step (serving/speculative.py semantics, per slot); emitted
        # tokens are defined by the verify logits, accepted prefix lengths
        # vary per slot and per-slot `pos` absorbs the raggedness.
        self.spec_decode = int(spec_decode)
        if self.spec_decode >= 2:
            if verify_fn is None and decode_fn is not llama_decode_step:
                raise ValueError(
                    "spec_decode needs a verify_fn for non-Llama model "
                    "families (the default verify is llama_verify_step)")
            from infinitensor_tpu.models.llama import llama_verify_step
            from infinitensor_tpu.serving.speculative import (
                PromptLookupDraft)
            vf = verify_fn or llama_verify_step
            self._draft = draft or PromptLookupDraft()
            if not hasattr(self._draft, "propose"):
                raise ValueError(
                    "engine spec_decode needs a per-slot draft with "
                    ".propose(history, k) (e.g. PromptLookupDraft); "
                    "ModelDraft's batch cache cannot follow slot churn — "
                    "use speculative_generate for model drafts")
            self._verify = jax.jit(
                lambda p, toks, ps, c: (lambda lg, cc: (
                    jnp.argmax(lg, axis=-1).astype(jnp.int32), cc))(
                        *vf(p, cfg, toks, ps, c)),
                donate_argnums=3)
        self.steps = 0
        self.tokens_out = 0
        # launch-pipelining: dispatch up to `pipeline_depth` fused decode
        # chunks back-to-back and fetch their tokens ONCE at the end of
        # the group — JAX async dispatch overlaps the per-launch tunnel
        # round-trip with on-device compute of the previous chunk. The
        # group never outruns the shortest request's remaining budget, so
        # the only waste is the existing within-chunk eos truncation.
        self.pipeline_depth = max(1, int(pipeline_depth))
        # one-group decode lookahead: dispatch group k+1 (token/pos
        # chained DEVICE-side from group k's outputs) BEFORE fetching
        # group k's tokens, so the fetch round-trip and host bookkeeping
        # overlap the next group's device compute. Retirement/admission
        # decisions lag one group (wasted slot-steps bounded by one
        # group; admission flushes first). Round-5 drain finding: a
        # decode launch cost ~RT more than its device time
        # (docs/SERVING_BUDGET.json drain_decomposition).
        self.lookahead = bool(lookahead)
        self._inflight: Optional[tuple] = None   # (groups, span, active)
        self._dev_state: Optional[tuple] = None  # (token, pos) on device
        # utilization budget (docs/SERVING_BUDGET.json): wall-time slices
        # of the serving loop — prefill (launch+fetch), decode dispatch,
        # decode fetch (device compute drains here), host bookkeeping.
        self.stats: dict = defaultdict(float)

        # fault tolerance: when checkpoint_interval > 0, step() snapshots
        # the full serving state to HOST memory every N steps and any
        # failed step restores + retries once (see snapshot/restore).
        self.checkpoint_interval = int(checkpoint_interval)
        self._snap: Optional[dict] = None
        self._last_ckpt_steps = -1
        self._next_uid = 0

    # ------------------------------------------------------------------
    def submit(self, prompt: list[int], max_new_tokens: int = 32,
               eos_id: Optional[int] = None, uid: Optional[int] = None
               ) -> Request:
        if len(prompt) >= self.cfg.max_seq:
            # reject up front instead of corrupting a slot mid-flight —
            # the analog of the reference's fixed-pool layout-change
            # rejection (reference src/core/graph.cc:554-559)
            raise ValueError(
                f"prompt length {len(prompt)} >= max_seq "
                f"{self.cfg.max_seq}; it can never be admitted")
        if uid is None:
            uid = self._next_uid
        # uids must be unique among live requests: snapshot/restore match
        # by uid, so a collision would cross-wire two requests' outputs
        # on the recovery path
        self._next_uid = max(self._next_uid, int(uid) + 1)
        req = Request(uid, list(prompt), max_new_tokens, eos_id)
        self.pending.append(req)
        return req

    def _dev(self, x):
        """Host value -> device array; replicated on a multi-process mesh
        (every host feeds the identical value, so the global array is
        consistent by construction)."""
        x = jnp.asarray(x)
        if self._multihost:
            return jax.device_put(x, self._rep)
        return x

    def _bucket(self, n: int) -> int:
        for b in self.prefill_buckets:
            if n <= b:
                return b
        return self.cfg.max_seq

    def _prefill_batch_fn(self, bucket: int, n: int) -> Callable:
        """One fused (n-request prefill -> n slot writes -> n first
        tokens) program per (bucket, lane count): an admission WAVE costs
        one launch + one fetch, not one per request. Lane counts are
        rounded up to powers of two (pad lanes duplicate lane 0 — an
        idempotent rewrite of the same slot) so at most log2(B)+1
        programs compile per bucket. The per-request launch round-trip
        was the serving engine's largest overhead slice
        (docs/SERVING_BUDGET.json)."""
        key = (bucket, n)
        fn = self._prefill_batch.get(key)
        if fn is not None:
            return fn
        cfg, prefill_fn, init_cache = self.cfg, self._prefill_fn, \
            self._init_cache

        @functools.partial(
            jax.jit, donate_argnums=2,
            out_shardings=(self._rep, self._kv_sh)
            if self._multihost else None)
        def f(params, toks, cache, slots, plens):
            pcache = init_cache(cfg, n, max_seq=bucket,
                                dtype=cache["k"][0].dtype)
            logits, pcache = prefill_fn(params, cfg, toks, pcache)
            for i in range(n):
                seg = {key2: [buf[i:i + 1] for buf in pcache[key2]]
                       for key2 in pcache}
                cache = merge_prefill_into_slot(cache, seg, slots[i])
            first = jnp.argmax(logits[jnp.arange(n), plens - 1], axis=-1
                               ).astype(jnp.int32)
            return first, cache

        self._prefill_batch[key] = f
        return f

    def _admit(self) -> None:
        while self.pending:
            free = [s for s in range(self.B) if self.slots[s] is None]
            if not free:
                return
            take = []
            while self.pending and len(take) < len(free):
                take.append(self.pending.popleft())
            by_bucket: dict[int, list] = {}
            for req in take:
                by_bucket.setdefault(
                    self._bucket(len(req.prompt)), []).append(req)
            for bucket, reqs in by_bucket.items():
                n = len(reqs)
                # lane counts come from {1, 4, B}: three programs per
                # bucket bound compile count; pad lanes waste <=
                # (npad/n)x prefill compute, still far cheaper than
                # per-request launches
                for npad in (1, min(4, self.B), self.B):
                    if npad >= n:
                        break
                wave_slots = [free.pop(0) for _ in range(n)]
                toks = np.zeros((npad, bucket), np.int32)
                slots_arr = np.zeros((npad,), np.int32)
                plens = np.ones((npad,), np.int32)
                for i, req in enumerate(reqs):
                    S = len(req.prompt)
                    toks[i, :S] = req.prompt
                    slots_arr[i] = wave_slots[i]
                    plens[i] = S
                for i in range(n, npad):    # duplicate lane 0 (idempotent)
                    toks[i] = toks[0]
                    slots_arr[i] = slots_arr[0]
                    plens[i] = plens[0]
                t0 = time.perf_counter()
                first, self.cache = self._prefill_batch_fn(bucket, npad)(
                    self.params, self._dev(toks), self.cache,
                    self._dev(slots_arr), self._dev(plens))
                first = np.asarray(first, np.int32)
                self.stats["prefill_s"] += time.perf_counter() - t0
                self.stats["prefill_launches"] += 1
                self.stats["prefill_tokens"] += float(
                    sum(len(r.prompt) for r in reqs))
                self.stats["prefill_lane_tokens"] += float(npad * bucket)
                for i, req in enumerate(reqs):
                    slot = wave_slots[i]
                    tok = int(first[i])
                    req.generated.append(tok)
                    self.slots[slot] = req
                    self.pos[slot] = len(req.prompt)
                    self.last_token[slot] = tok
                    self.tokens_out += 1
                    _log.info("admit", uid=req.uid, slot=slot,
                              prompt_len=len(req.prompt), bucket=bucket,
                              wave=n)

    def _retire(self, slot: int) -> None:
        req = self.slots[slot]
        req.done = True
        self.slots[slot] = None
        _log.info("retire", uid=req.uid, slot=slot,
                  generated=len(req.generated), pos=int(self.pos[slot]))
        self.pos[slot] = 0

    # ------------------------------------------------------------------
    def _spec_step(self, active) -> int:
        """One fused K-token speculative verify over all live slots."""
        K = self.spec_decode
        inputs = np.zeros((self.B, K), np.int32)
        for slot in active:
            req = self.slots[slot]
            hist = list(req.prompt) + list(req.generated)
            inputs[slot, 0] = self.last_token[slot]
            inputs[slot, 1:] = self._draft.propose(hist, K - 1)
        greedy, self.cache = self._verify(
            self.params, jnp.asarray(inputs), jnp.asarray(self.pos),
            self.cache)
        greedy = np.asarray(greedy, np.int32)
        self.steps += 1
        for slot in active:
            req = self.slots[slot]
            n_acc = 0
            while n_acc < K - 1 and \
                    inputs[slot, n_acc + 1] == greedy[slot, n_acc]:
                n_acc += 1
            for tok in greedy[slot, :n_acc + 1]:
                req.generated.append(int(tok))
                self.tokens_out += 1
                if (req.eos_id is not None and int(tok) == req.eos_id) or \
                        len(req.generated) >= req.max_new_tokens:
                    break
            self.pos[slot] += n_acc + 1
            self.last_token[slot] = int(greedy[slot, n_acc])
            # no force-retire near the cache boundary: step()'s gate
            # routes the next step to dense decode instead, so emitted
            # tokens are identical for any K
            done = (len(req.generated) >= req.max_new_tokens or
                    (req.eos_id is not None
                     and req.eos_id in req.generated)
                    or self.pos[slot] + 1 >= self.cfg.max_seq)
            if done:
                self._retire(slot)
        return len([r for r in self.slots if r is not None])

    # -- checkpoint / restore / fault recovery -------------------------
    # The reference recovers from CUDA stream-capture failures by
    # rebuilding the stream and rebinding library handles
    # (reference src/cuda/cuda_runtime.cc:226-281) and rolls allocations
    # back on exception (graph.cc:322-339). Here ALL serving state is
    # data — host request tables + one KV pytree — so recovery is:
    # snapshot to host, and on a failed launch restore + retrace + retry.
    # This also covers the donation hazard: a step that dies after its
    # donated cache buffer was consumed leaves the device cache invalid,
    # which only a host-side copy can repair.

    @staticmethod
    def _pack_req(req: Request) -> dict:
        return {"uid": req.uid, "prompt": list(req.prompt),
                "max_new_tokens": req.max_new_tokens, "eos_id": req.eos_id,
                "generated": list(req.generated), "done": req.done}

    def _extra_snapshot(self) -> dict:
        return {}

    def _extra_restore(self, snap: dict) -> None:
        pass

    def snapshot(self) -> dict:
        """Host-side checkpoint of the complete serving state: request
        tables, slot positions, and the KV cache fetched to host numpy.
        The result is process-independent — `restore` on a freshly built
        engine (same config) resumes mid-stream generation exactly."""
        self._flush_inflight()     # host state must be current
        return {
            "pending": [self._pack_req(r) for r in self.pending],
            "slots": [None if r is None else self._pack_req(r)
                      for r in self.slots],
            "pos": self.pos.copy(),
            "last_token": self.last_token.copy(),
            "steps": self.steps,
            "tokens_out": self.tokens_out,
            "cache": jax.tree_util.tree_map(np.asarray, self.cache),
            "next_uid": self._next_uid,
            **self._extra_snapshot(),
        }

    def restore(self, snap: dict) -> None:
        self._inflight = None      # in-flight groups predate the snap
        self._dev_state = None
        """Restore a `snapshot()`. Live Request objects are matched by uid
        and updated in place (caller-held handles stay valid across an
        in-process recovery); unmatched entries get fresh objects (the
        cross-process resume path). Live requests submitted AFTER the
        snapshot was taken (uid absent from it) are NOT dropped: they are
        re-queued into pending in submit order — any slot state they had
        is gone with the restored cache, so they restart from prefill."""
        live_order = list(self.pending) + \
            [r for r in self.slots if r is not None]
        live = {r.uid: r for r in live_order}

        def unpack(d):
            req = live.get(d["uid"]) or Request(
                d["uid"], list(d["prompt"]), d["max_new_tokens"],
                d["eos_id"])
            req.prompt = list(d["prompt"])
            req.max_new_tokens = d["max_new_tokens"]
            req.eos_id = d["eos_id"]
            req.generated = list(d["generated"])
            req.done = d["done"]
            return req

        self.pending = deque(unpack(d) for d in snap["pending"])
        self.slots = [None if d is None else unpack(d)
                      for d in snap["slots"]]
        snap_uids = {d["uid"] for d in snap["pending"]} | \
            {d["uid"] for d in snap["slots"] if d is not None}
        for req in live_order:
            if req.uid not in snap_uids and not req.done:
                req.generated = []
                self.pending.append(req)
        restored_uids = snap_uids | {r.uid for r in live_order}
        self._next_uid = max(
            [self._next_uid, int(snap.get("next_uid", 0))] +
            [int(u) + 1 for u in restored_uids])
        self.pos = snap["pos"].copy()
        self.last_token = snap["last_token"].copy()
        self.steps = snap["steps"]
        self.tokens_out = snap["tokens_out"]
        cache = jax.tree_util.tree_map(jnp.asarray, snap["cache"])
        if self.mesh is not None:
            cache = _place_cache_on_mesh(cache, self.mesh,
                                         self._cache_specs)
        self.cache = cache
        self._extra_restore(snap)

    def checkpoint(self) -> None:
        self._snap = self.snapshot()
        self._last_ckpt_steps = self.steps

    def _clear_executables(self) -> None:
        """Drop every compiled program so the retry re-traces — the analog
        of the reference's stream rebuild + handle rebind."""
        self._prefill_batch.clear()
        for fn in (self._decode, self._decode_multi,
                   getattr(self, "_verify", None)):
            clear = getattr(fn, "clear_cache", None)
            if clear is not None:
                clear()

    def step(self) -> int:
        """Admit + one decode step (or one fused chunk of decode_chunk
        steps, or one speculative verify). Returns number of live
        sequences. With checkpoint_interval > 0 a failed step restores
        the last checkpoint, re-traces, and retries once."""
        if self.checkpoint_interval > 0 and (
                self._snap is None or
                self.steps - self._last_ckpt_steps
                >= self.checkpoint_interval):
            self.checkpoint()
        try:
            return self._step_inner()
        except Exception as e:               # noqa: BLE001 — device faults
            if self._snap is None:
                raise
            _log.warning("step_failed_recovering", error=repr(e)[:200],
                         restored_step=self._snap["steps"])
            self._clear_executables()
            self.restore(self._snap)
            return self._step_inner()

    def _flush_inflight(self) -> None:
        """Process any dispatched-but-unfetched lookahead group so host
        state (pos/last_token/slots) is current. Must run before
        admission, snapshot, or any host decision that reads slot
        state."""
        if self._inflight is not None:
            groups, span, active = self._inflight
            self._inflight = None
            self._process_groups(groups, span, active)
            self._dev_state = None

    def _dispatch_chunks(self, token, pos, depth: int):
        t0 = time.perf_counter()
        groups = []
        for _ in range(depth):
            toks, token, pos, self.cache = self._decode_multi(
                self.params, token, pos, self.cache)
            groups.append(toks)
        self.stats["decode_dispatch_s"] += time.perf_counter() - t0
        self.stats["decode_launches"] += depth
        return groups, token, pos

    def _process_groups(self, groups, span: int, active) -> int:
        """Fetch a dispatched group's tokens and run the host
        bookkeeping (emission, eos/max_new retirement). Returns the
        number of retirements."""
        t0 = time.perf_counter()
        toks = np.concatenate(
            [np.asarray(t, np.int32) for t in groups], axis=1)
        self.stats["decode_fetch_s"] += time.perf_counter() - t0
        self.steps += span
        self.stats["slot_steps_active"] += span * len(active)
        self.stats["slot_steps_total"] += span * self.B
        retired = 0
        t0 = time.perf_counter()
        for slot in active:
            req = self.slots[slot]
            if req is None:     # retired while this group was in flight
                continue
            for j in range(span):
                tok = int(toks[slot, j])
                req.generated.append(tok)
                self.tokens_out += 1
                self.stats["decode_tokens"] += 1
                if (req.eos_id is not None and tok == req.eos_id) or \
                        len(req.generated) >= req.max_new_tokens:
                    break
            self.pos[slot] += span
            self.last_token[slot] = int(toks[slot, span - 1])
            req_done = (len(req.generated) >= req.max_new_tokens or
                        (req.eos_id is not None and
                         req.eos_id in req.generated) or
                        self.pos[slot] + 1 >= self.cfg.max_seq)
            if req_done:
                self._retire(slot)
                retired += 1
        self.stats["decode_host_s"] += time.perf_counter() - t0
        return retired

    def _lookahead_step(self, active, chunk: int, depth: int) -> int:
        """Dispatch the next decode group BEFORE fetching the previous
        one: the fetch round-trip + host loop overlap the new group's
        device compute. token/pos chain device-side between groups."""
        span_new = depth * chunk
        lag = self._inflight[1] if self._inflight is not None else 0
        can_dispatch = int(self.pos[active].max()) + lag + span_new + 1 \
            < self.cfg.max_seq
        if can_dispatch and self._inflight is not None:
            # don't dispatch a group nobody can use: if the in-flight
            # group already covers every active request's remaining
            # budget, the optimistic group would be pure waste (one
            # whole garbage launch at the tail of every wave)
            remaining = max(self.slots[s].max_new_tokens -
                            len(self.slots[s].generated)
                            for s in active)
            if remaining <= lag:
                can_dispatch = False
        new_inflight = None
        if can_dispatch:
            if self._dev_state is not None:
                token, pos = self._dev_state
            else:
                token = self._dev(self.last_token)
                pos = self._dev(self.pos)
            groups, token, pos = self._dispatch_chunks(token, pos, depth)
            self._dev_state = (token, pos)
            new_inflight = (groups, span_new, list(active))
        if self._inflight is not None:
            groups, span, g_active = self._inflight
            self._inflight = None
            retired = self._process_groups(groups, span, g_active)
            if retired or self.pending:
                # host slot state diverged from the device chain: the
                # just-dispatched group must be drained too (its
                # successor would otherwise be re-derived from host
                # state that lags it — a double decode)
                self._inflight = new_inflight
                self._flush_inflight()
                return len([r for r in self.slots if r is not None])
        self._inflight = new_inflight
        return len([r for r in self.slots if r is not None])

    def _step_inner(self) -> int:
        if self.pending:
            # admission writes prefill state the device chain can't see;
            # catch host state up first
            self._flush_inflight()
        self._admit()
        active = [i for i, r in enumerate(self.slots) if r is not None]
        if not active:
            self._flush_inflight()
            return len([r for r in self.slots if r is not None])
        if self.spec_decode >= 2 and \
                int(self.pos[active].max()) + 2 * self.spec_decode < \
                self.cfg.max_seq:
            self._flush_inflight()
            return self._spec_step(active)
        chunk = self.decode_chunk
        lag = self._inflight[1] if self._inflight is not None else 0
        if chunk > 1 and int(self.pos[active].max()) + lag + chunk + 1 < \
                self.cfg.max_seq:
            # pipeline depth: how many chunks can run before the host
            # MUST look at the tokens (shortest remaining budget /
            # max_seq guard); capped at 2 while requests wait so
            # admission isn't starved
            depth = self.pipeline_depth
            if depth > 1:
                horizon = min(self.slots[s].max_new_tokens -
                              len(self.slots[s].generated)
                              for s in active)
                depth = max(1, min(depth, horizon // chunk))
                if self.pending:
                    depth = min(depth, 2)
                while depth > 1 and int(self.pos[active].max()) + \
                        depth * chunk + 1 >= self.cfg.max_seq:
                    depth -= 1
            if self.lookahead:
                return self._lookahead_step(active, chunk, depth)
            groups, _, _ = self._dispatch_chunks(
                self._dev(self.last_token), self._dev(self.pos), depth)
            self._process_groups(groups, chunk * depth, active)
            return len([r for r in self.slots if r is not None])
        # single-step (or near-max_seq) path reads host state directly
        self._flush_inflight()
        active = [i for i, r in enumerate(self.slots) if r is not None]
        if not active:
            return 0
        token = self._dev(self.last_token)
        pos = self._dev(self.pos)
        t0 = time.perf_counter()
        nxt, self.cache = self._decode(self.params, token, pos, self.cache)
        self.stats["decode_dispatch_s"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        nxt = np.asarray(nxt, np.int32)
        self.stats["decode_fetch_s"] += time.perf_counter() - t0
        self.stats["decode_launches"] += 1
        self.steps += 1
        self.stats["slot_steps_active"] += len(active)
        self.stats["slot_steps_total"] += self.B
        for slot in active:
            req = self.slots[slot]
            tok = int(nxt[slot])
            req.generated.append(tok)
            self.tokens_out += 1
            self.stats["decode_tokens"] += 1
            self.pos[slot] += 1
            self.last_token[slot] = tok
            hit_eos = req.eos_id is not None and tok == req.eos_id
            full = self.pos[slot] + 1 >= self.cfg.max_seq
            if hit_eos or full or len(req.generated) >= req.max_new_tokens:
                self._retire(slot)
        return len([r for r in self.slots if r is not None])

    def warmup(self) -> None:
        """Compile every program the engine will launch (per-bucket prefill,
        decode, fused-chunk decode) by running two dummy requests per bucket
        end-to-end, then reset counters. Serving deployments warm up before
        taking traffic; calling this keeps compile time out of throughput
        measurements."""
        for bucket in self.prefill_buckets:
            # a bucket can equal max_seq (the fallback bucket); the
            # longest admissible prompt still selects that bucket
            plen = min(bucket, self.cfg.max_seq - 1)
            # prime every batched-admission lane count ({1, 4, B} per
            # bucket) so no prefill program compiles mid-measurement
            for wave in sorted({1, min(4, self.B), self.B}):
                for _ in range(wave):
                    self.submit([1] * plen,
                                max_new_tokens=max(2, self.decode_chunk))
                self.run_to_completion()
        self.steps = 0
        self.tokens_out = 0
        self.pos[:] = 0
        self.last_token[:] = 0
        self.stats.clear()

    def run_to_completion(self, max_steps: int = 10_000) -> None:
        for _ in range(max_steps):
            if not self.pending and all(r is None for r in self.slots):
                return
            self.step()
        raise RuntimeError("serving engine did not drain")
