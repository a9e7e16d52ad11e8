"""Continuous-batching generation engine (the vLLM-replacement serving path).

The reference leans on vLLM for high-throughput generation
(``models/generators/vllm.py``: paged attention + continuous batching +
NCCL TP).  This engine provides the TPU equivalent over the JAX llama model:

* a fixed pool of **slots**, each owning a region of a preallocated KV cache
  ``[layers, slots, max_len, kv_heads, head_dim]`` in HBM — the TPU analogue of
  paged KV blocks (static shapes; no allocator needed because slot regions are
  uniform);
* **continuous batching**: one jitted decode step advances every active slot
  per iteration with per-slot cursors and key-validity masks; finished slots
  free immediately and new requests prefill into them without draining the
  batch;
* **prefill-on-join**: an incoming prompt runs one jitted prefill (flash
  kernel on TPU) whose K/V land directly in the slot's cache region.

Requests of wildly different lengths therefore never block each other — the
decode batch stays full, which is exactly the continuous-batching win.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from bergen_tpu.models import llama


@dataclasses.dataclass
class _Request:
    rid: int
    prompt_ids: np.ndarray
    max_new_tokens: int
    out_tokens: list = dataclasses.field(default_factory=list)
    slot: int = -1
    done: bool = False


class GenerationServer:
    def __init__(
        self,
        params,
        cfg: llama.LlamaConfig,
        eos_token_id: int,
        pad_token_id: int,
        max_slots: int = 8,
        max_len: int = 512,
        prompt_buckets: tuple = (32, 64, 128, 256),
        dtype=None,  # None = bf16 KV cache on TPU, f32 elsewhere
        mesh=None,   # TP: shard the slot KV cache over the mesh 'model' axis
    ):
        if dtype is None:
            dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                     else jnp.float32)
        if (cfg.post_norms or cfg.attn_logit_softcap or cfg.num_experts
                or cfg.parallel_block):
            # the slot-pool decode step below hand-rolls the llama block; it
            # does not implement gemma-2 sandwich norms/softcapping or MoE —
            # fail loudly rather than generate silently-wrong tokens
            raise NotImplementedError(
                "GenerationServer supports llama/mistral/qwen2-layout models; "
                "use jax_llm.LLM for gemma-2 and mixtral"
            )
        self.params = params
        self.cfg = cfg
        self.eos = eos_token_id
        self.pad = pad_token_id
        self.S = max_slots
        self.L = max_len
        self.dtype = dtype
        self.prompt_buckets = tuple(b for b in prompt_buckets if b <= max_len)
        if not self.prompt_buckets:
            self.prompt_buckets = (max_len,)

        shape = (cfg.num_layers, max_slots, max_len, cfg.num_kv_heads, cfg.head_dim)
        self.k_cache = jnp.zeros(shape, dtype)
        self.v_cache = jnp.zeros(shape, dtype)
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            # KV heads ride the TP axis with the attention heads (params are
            # already sharded by the caller); jit keeps the donated caches
            # sharded across steps
            from jax.sharding import NamedSharding, PartitionSpec as P

            if cfg.num_kv_heads % mesh.shape["model"] == 0:
                spec = NamedSharding(mesh, P(None, None, None, "model", None))
                self.k_cache = jax.device_put(self.k_cache, spec)
                self.v_cache = jax.device_put(self.v_cache, spec)
        self.cursors = np.zeros(max_slots, np.int32)    # tokens in cache per slot
        self.cur_tok = np.full(max_slots, pad_token_id, np.int32)
        self.free_slots = list(range(max_slots))
        self.active: Dict[int, _Request] = {}
        self._next_rid = 0
        self._queue: List[_Request] = []

        cfg_ = cfg

        @functools.partial(jax.jit, static_argnames=("P",),
                           donate_argnums=(1, 2))
        def prefill(params, k_cache, v_cache, slot, ids, valid_len, P):
            """Run the prompt [1, P] and write its K/V into slot's region.
            Returns (k_cache, v_cache, next_token)."""
            cache = llama.init_cache(cfg_, 1, P, dtype=self.dtype)
            am = (jnp.arange(P)[None, :] < valid_len).astype(jnp.int32)
            positions = jnp.maximum(jnp.cumsum(am, axis=1) - 1, 0)
            causal = jnp.tril(jnp.ones((P, P), bool))
            mask = causal[None] & am[:, None, :].astype(bool)
            logits, tmp_cache = llama.forward(
                params, cfg_, ids, positions, cache, mask
            )
            # right-aligned valid region: ids are RIGHT-padded here, so the
            # prompt K/V occupy [0, valid_len) of the temp cache
            k_cache = jax.lax.dynamic_update_slice(
                k_cache,
                tmp_cache["k"][:, :, :P][:, 0][:, None],
                (0, slot, 0, 0, 0),
            )
            v_cache = jax.lax.dynamic_update_slice(
                v_cache,
                tmp_cache["v"][:, :, :P][:, 0][:, None],
                (0, slot, 0, 0, 0),
            )
            nxt = jnp.argmax(logits[0, valid_len - 1], axis=-1).astype(jnp.int32)
            return k_cache, v_cache, nxt

        @partial(jax.jit, donate_argnums=(1, 2))
        def step(params, k_cache, v_cache, tokens, cursors, active_mask):
            """One decode step for every slot: tokens [S], cursors [S].
            Returns (k_cache, v_cache, next_tokens [S])."""
            S, L = tokens.shape[0], k_cache.shape[2]
            x = tokens[:, None]  # [S, 1]
            positions = cursors[:, None]  # next position == cursor
            inv_freq = llama.rope_frequencies(cfg_)
            h = jnp.take(params["embed"], x, axis=0)
            H, KH, Dh = cfg_.num_heads, cfg_.num_kv_heads, cfg_.head_dim
            group = H // KH
            row = jnp.arange(S)
            for li, layer in enumerate(params["layers"]):
                hn = llama.rmsnorm(layer["attn_norm"], h, cfg_.rms_norm_eps)
                q = llama._proj(layer["attn"]["q"], hn).reshape(S, 1, H, Dh)
                k = llama._proj(layer["attn"]["k"], hn).reshape(S, 1, KH, Dh)
                v = llama._proj(layer["attn"]["v"], hn).reshape(S, 1, KH, Dh)
                q = llama.apply_rope(q, positions, inv_freq)
                k = llama.apply_rope(k, positions, inv_freq)
                # per-slot scatter write at each slot's own cursor
                k_cache = k_cache.at[li, row, cursors].set(k[:, 0])
                v_cache = v_cache.at[li, row, cursors].set(v[:, 0])
                kc = k_cache[li]  # [S, L, KH, Dh]
                vc = v_cache[li]
                qg = q.reshape(S, 1, KH, group, Dh)
                scores = jnp.einsum(
                    "bskgd,blkd->bkgsl", qg, kc,
                    preferred_element_type=jnp.float32,
                ) / np.sqrt(Dh)
                valid = (jnp.arange(L)[None, :] <= cursors[:, None])
                bias = jnp.where(valid[:, None, None, None, :], 0.0, -1e30)
                probs = jax.nn.softmax(scores + bias, axis=-1).astype(h.dtype)
                ctx = jnp.einsum(
                    "bkgsl,blkd->bskgd", probs, vc,
                    preferred_element_type=jnp.float32,
                ).astype(h.dtype).reshape(S, 1, H * Dh)
                h = h + llama._proj(layer["attn"]["o"], ctx)
                hn = llama.rmsnorm(layer["mlp_norm"], h, cfg_.rms_norm_eps)
                h = h + llama._mlp(layer, hn)
            h = llama.rmsnorm(params["final_norm"], h, cfg_.rms_norm_eps)
            head = params.get("lm_head")
            if head is None:
                logits = jnp.dot(h[:, 0], params["embed"].T.astype(h.dtype),
                                 preferred_element_type=jnp.float32)
            else:
                # through _proj so quantized trees (int8/int4/w8a8) work
                logits = llama._proj(head, h[:, 0]).astype(jnp.float32)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(active_mask, nxt, tokens)
            return k_cache, v_cache, nxt

        self._prefill = prefill
        self._step = step

    # ------------------------------------------------------------------ #

    def submit(self, prompt_ids: List[int], max_new_tokens: int = 64) -> int:
        rid = self._next_rid
        self._next_rid += 1
        req = _Request(rid, np.asarray(prompt_ids, np.int32), max_new_tokens)
        self._queue.append(req)
        return rid

    def _bucket(self, n: int) -> int:
        for b in self.prompt_buckets:
            if n <= b:
                return b
        return self.prompt_buckets[-1]

    def _admit(self) -> None:
        while self._queue and self.free_slots:
            req = self._queue.pop(0)
            slot = self.free_slots.pop(0)
            P = self._bucket(len(req.prompt_ids))
            ids = req.prompt_ids[-P:]  # keep the prompt tail, like left-trunc
            padded = np.full((1, P), self.pad, np.int32)
            padded[0, : len(ids)] = ids  # right padding; valid region [0, n)
            self.k_cache, self.v_cache, nxt = self._prefill(
                self.params, self.k_cache, self.v_cache, slot,
                jnp.asarray(padded), len(ids), P,
            )
            req.slot = slot
            req.out_tokens.append(int(nxt))
            self.cursors[slot] = len(ids)
            self.cur_tok[slot] = int(nxt)
            self.active[slot] = req
            if int(nxt) == self.eos or len(req.out_tokens) >= req.max_new_tokens:
                self._finish(slot)

    def _finish(self, slot: int) -> None:
        req = self.active.pop(slot)
        req.done = True
        self.free_slots.append(slot)
        self._finished.append(req)

    def run(self) -> Dict[int, List[int]]:
        """Drive until queue + slots drain; returns {rid: generated tokens}."""
        self._finished: List[_Request] = getattr(self, "_finished", [])
        self._admit()
        while self.active:
            active_mask = np.zeros(self.S, bool)
            for slot in self.active:
                active_mask[slot] = True
            self.k_cache, self.v_cache, nxt = self._step(
                self.params, self.k_cache, self.v_cache,
                jnp.asarray(self.cur_tok), jnp.asarray(self.cursors),
                jnp.asarray(active_mask),
            )
            nxt = np.asarray(nxt)
            for slot in list(self.active):
                req = self.active[slot]
                tok = int(nxt[slot])
                req.out_tokens.append(tok)
                self.cursors[slot] += 1
                self.cur_tok[slot] = tok
                if (
                    tok == self.eos
                    or len(req.out_tokens) >= req.max_new_tokens
                    or self.cursors[slot] >= self.L - 1
                ):
                    self._finish(slot)
            self._admit()  # refill freed slots immediately (continuous)
        out = {r.rid: r.out_tokens for r in self._finished}
        self._finished = []
        return out
