"""Paged-KV serving: slots hold pages proportional to their ACTUAL length.

``GenerationServer`` reserves ``max_len`` cache positions per slot, so a
32-token request holds the same HBM as a 2048-token one and the slot count
(= decode batch) is fixed by the worst case.  This server implements vLLM's
core idea (reference ``models/generators/vllm.py:48-59``) the TPU way:

* a shared pool of 128-token pages (``ops/paged_attention.py``) with a
  host-side free-list allocator — admission takes ceil(P/128) pages, decode
  grows a slot by one page every 128 tokens, finish returns them;
* prompts prefill LEFT-padded to a page-aligned bucket, so placement is a
  static per-bucket scatter of whole pages (zero dynamic shapes) and the
  pad is masked by a per-slot ``start`` offset inside the attention kernel;
* the decode step is ``llama.forward`` over the paged cache — the same
  single source of transformer math as everything else.

With the same HBM the pool admits ~``max_len / mean_len`` times more slots,
and decode throughput scales with the slot count until the chip is
bandwidth-bound.  Oversubscription is safe-by-construction: admission
blocks when the pool is dry (vLLM preempts instead — a swap-to-host policy
can layer on later).
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from bergen_tpu.models import llama
from bergen_tpu.ops.paged_attention import PAGE
from bergen_tpu.serve.engine import GenerationServer, _Request


class PagedGenerationServer(GenerationServer):
    def __init__(self, params, cfg: llama.LlamaConfig, eos_token_id: int,
                 pad_token_id: int, max_slots: int = 32, max_len: int = 2048,
                 n_pages: int | None = None, dtype=None, mesh=None,
                 temperature: float = 0.0, top_p: float = 1.0, seed: int = 0):
        if cfg.attn_logit_softcap or (cfg.post_norms and cfg.sliding_window):
            raise NotImplementedError(
                "paged attention does not yet cover gemma-2 softcap/sliding "
                "layers — use GenerationServer"
            )
        if dtype is None:
            dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                     else jnp.float32)
        self.params = params
        self.cfg = cfg
        self.eos = eos_token_id
        self.pad = pad_token_id
        self.S = max_slots
        self.L = max_len
        self.dtype = dtype
        self.temperature = temperature
        self.top_p = top_p
        self.seed = seed
        self._step_count = 0
        # page-aligned prompt buckets: placement is whole pages per bucket
        self.prompt_buckets = tuple(
            p * PAGE for p in (1, 2, 4, 8, 16) if p * PAGE <= max_len
        ) or (PAGE,)
        # +1 page of headroom for bucket pad inflation: prompts store
        # LEFT-padded to a whole-page bucket, so a slot's storage can exceed
        # max_len by up to PAGE-1 pad positions (masked via `starts`).
        # Without the headroom, max_len < PAGE made every request terminate
        # after its first decode token (storage hit max_pages * PAGE).
        self.max_pages = -(-max_len // PAGE) + 1
        # pool default = half the uniform-slot reservation: the paged win is
        # exactly that mean_len << max_len, so half is still conservative
        if n_pages is None:
            n_pages = max(self.S * self.max_pages // 2, self.max_pages + 1)
        self.n_pages = n_pages

        cache = llama.init_paged_cache(cfg, n_pages, max_slots,
                                       self.max_pages, dtype=dtype)
        self.k_pool, self.v_pool = cache["k_pool"], cache["v_pool"]
        self.k_tail, self.v_tail = cache["k_tail"], cache["v_tail"]
        # tensor parallelism: page pools and tails shard over the mesh
        # 'model' axis on the kv-head dim, exactly like the uniform engine's
        # slot cache (params are sharded by the caller).  The Pallas
        # block-table kernel is a single-device program GSPMD cannot
        # partition, so TP decode forces the XLA paged composition — its
        # gathers/einsums partition cleanly over kv heads.
        self._paged_use_pallas: bool | None = None
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            if cfg.num_kv_heads % mesh.shape["model"] == 0:
                from jax.sharding import NamedSharding, PartitionSpec as P

                spec = NamedSharding(
                    mesh, P(None, None, "model", None, None))
                self.k_pool = jax.device_put(self.k_pool, spec)
                self.v_pool = jax.device_put(self.v_pool, spec)
                self.k_tail = jax.device_put(self.k_tail, spec)
                self.v_tail = jax.device_put(self.v_tail, spec)
                self._paged_use_pallas = False
        self.tables = np.zeros((max_slots, self.max_pages), np.int32)
        self.lengths = np.zeros(max_slots, np.int32)   # storage positions
        self.starts = np.zeros(max_slots, np.int32)
        self.tok_pos = np.zeros(max_slots, np.int32)   # logical (RoPE) pos
        self.cur_tok = np.full(max_slots, pad_token_id, np.int32)
        self.free_pages: List[int] = list(range(n_pages))
        self.slot_pages: List[List[int]] = [[] for _ in range(max_slots)]
        self.free_slots = list(range(max_slots))
        self.active: Dict[int, _Request] = {}
        self._next_rid = 0
        self._queue: List[_Request] = []

        cfg_, temp_, top_p_ = cfg, temperature, top_p

        @functools.partial(jax.jit, static_argnames=("P", "B"),
                           donate_argnums=(1, 2))
        def prefill(params, k_pool, v_pool, page_dst, ids, valid_len, rng,
                    P, B):
            """LEFT-padded same-bucket batch [B, P] (P a PAGE multiple):
            prompt K/V fill ``P // PAGE`` whole pages per row, scattered to
            ``page_dst [B, P//PAGE]`` pool pages.  Returns (pools, next)."""
            cache = llama.init_cache(cfg_, B, P, dtype=dtype, flat=False)
            am = (jnp.arange(P)[None, :] >= P - valid_len[:, None]).astype(
                jnp.int32)
            positions = jnp.maximum(jnp.cumsum(am, axis=1) - 1, 0)
            causal = jnp.tril(jnp.ones((P, P), bool))
            mask = causal[None] & am[:, None, :].astype(bool)
            logits, tmp = llama.forward(
                params, cfg_, ids, positions, cache, mask
            )
            # tmp k/v: [L, B, P, KH, Dh] -> [L, B*P//PAGE, KH, PAGE, Dh]
            L, _, _, KH, Dh = tmp["k"].shape
            npg = P // PAGE

            def pages(t):
                t = t.reshape(L, B * npg, PAGE, KH, Dh)
                return jnp.swapaxes(t, 2, 3).astype(dtype)

            rows = jnp.arange(L)[:, None]
            dst = jnp.broadcast_to(page_dst.reshape(-1)[None], (L, B * npg))
            k_pool = k_pool.at[rows, dst].set(pages(tmp["k"]), mode="drop")
            v_pool = v_pool.at[rows, dst].set(pages(tmp["v"]), mode="drop")
            last = logits[:, -1]  # left-padded: last row is the last token
            if temp_ > 0:
                nxt = llama.sample_token(last, rng, temp_, top_p_)
            else:
                nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
            return k_pool, v_pool, nxt

        @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4))
        def step(params, k_pool, v_pool, k_tail, v_tail, tables, lengths,
                 starts, tok_pos, tokens, active_mask, rng):
            cache = {
                "k_pool": k_pool, "v_pool": v_pool,
                "k_tail": k_tail, "v_tail": v_tail,
                "tables": tables, "lengths": lengths, "starts": starts,
                "active": active_mask,
            }
            logits, cache = llama.forward(
                params, cfg_, tokens[:, None], tok_pos[:, None], cache, None,
                paged_use_pallas=self._paged_use_pallas,
            )
            last = logits[:, 0]
            if temp_ > 0:
                nxt = llama.sample_token(last, rng, temp_, top_p_)
            else:
                nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
            nxt = jnp.where(active_mask, nxt, tokens)
            return (cache["k_pool"], cache["v_pool"], cache["k_tail"],
                    cache["v_tail"], nxt)

        self._prefill = prefill
        self._step = step

    # ------------------------------------------------------------------ #

    def _pages_needed(self, prompt_len: int) -> int:
        return self._bucket(min(prompt_len, self.L)) // PAGE

    def _admit(self) -> None:
        while self._queue and self.free_slots:
            P = self._bucket(len(self._queue[0].prompt_ids))
            if P // PAGE > len(self.free_pages):
                return  # pool dry: wait for a slot to finish
            batch: List[_Request] = []
            pages_left = len(self.free_pages)
            while (self._queue and len(batch) < len(self.free_slots)
                   and len(batch) < 8
                   and self._bucket(len(self._queue[0].prompt_ids)) == P
                   and pages_left >= P // PAGE):
                batch.append(self._queue.pop(0))
                pages_left -= P // PAGE
            B = 1 << (len(batch) - 1).bit_length()
            npg = P // PAGE
            slots = [self.free_slots.pop(0) for _ in batch]
            # per-row page allocation; pad rows scatter out of bounds (drop)
            page_dst = np.full((B, npg), 1 << 30, np.int32)
            padded = np.full((B, P), self.pad, np.int32)
            vls = np.ones(B, np.int32)
            for r, req in enumerate(batch):
                got = [self.free_pages.pop(0) for _ in range(npg)]
                self.slot_pages[slots[r]] = got
                page_dst[r] = got
                ids = req.prompt_ids[-P:]
                padded[r, P - len(ids):] = ids  # LEFT padding
                vls[r] = len(ids)
            self.k_pool, self.v_pool, nxt = self._prefill(
                self.params, self.k_pool, self.v_pool,
                jnp.asarray(page_dst), jnp.asarray(padded), jnp.asarray(vls),
                self._next_key(), P, B,
            )
            nxt = np.asarray(nxt)
            for r, req in enumerate(batch):
                slot = slots[r]
                req.slot = slot
                req.out_tokens.append(int(nxt[r]))
                self.tables[slot, :npg] = page_dst[r]
                self.lengths[slot] = P          # storage incl. left pad
                self.starts[slot] = P - vls[r]
                self.tok_pos[slot] = vls[r]     # logical position of nxt
                self.cur_tok[slot] = int(nxt[r])
                self.active[slot] = req
                if (int(nxt[r]) == self.eos
                        or len(req.out_tokens) >= req.max_new_tokens):
                    self._finish(slot)

    def _finish(self, slot: int) -> None:
        self.free_pages.extend(self.slot_pages[slot])
        self.slot_pages[slot] = []
        super()._finish(slot)

    def _grow_tables(self) -> None:
        """Allocate the next page for slots one token away from filling
        their tail (the flush needs the destination in the table)."""
        for slot in self.active:
            ln = int(self.lengths[slot])
            if (ln + 1) % PAGE == 0:
                pg = (ln + 1) // PAGE - 1
                if pg < self.max_pages and pg >= len(self.slot_pages[slot]):
                    if not self.free_pages:
                        raise RuntimeError(
                            "page pool exhausted mid-decode: raise n_pages "
                            "or lower max_slots (no preemption implemented)"
                        )
                    new = self.free_pages.pop(0)
                    self.slot_pages[slot].append(new)
                    self.tables[slot, pg] = new

    def run_workload(self, prompt_ids_list, max_new_tokens=64):
        """Offline batch through the PAGED engine (the base class drains
        through its uniform slot-pool cache, which would bypass the page
        pool this server exists for).  Host-driven decode loop."""
        if isinstance(max_new_tokens, int):
            max_new_tokens = [max_new_tokens] * len(prompt_ids_list)
        rids = [self.submit(list(map(int, p)), int(m))
                for p, m in zip(prompt_ids_list, max_new_tokens)]
        out = self.run()
        return [out[rid] for rid in rids]

    def run(self) -> Dict[int, List[int]]:
        self._finished: List[_Request] = getattr(self, "_finished", [])
        self._admit()
        while self.active:
            self._grow_tables()
            active_mask = np.zeros(self.S, bool)
            for slot in self.active:
                active_mask[slot] = True
            (self.k_pool, self.v_pool, self.k_tail, self.v_tail,
             nxt) = self._step(
                self.params, self.k_pool, self.v_pool, self.k_tail,
                self.v_tail, jnp.asarray(self.tables),
                jnp.asarray(self.lengths), jnp.asarray(self.starts),
                jnp.asarray(self.tok_pos), jnp.asarray(self.cur_tok),
                jnp.asarray(active_mask), self._next_key(),
            )
            nxt = np.asarray(nxt)
            self.lengths[active_mask] += 1
            self.tok_pos[active_mask] += 1
            for slot in list(self.active):
                req = self.active[slot]
                tok = int(nxt[slot])
                req.out_tokens.append(tok)
                self.cur_tok[slot] = tok
                if (tok == self.eos
                        or len(req.out_tokens) >= req.max_new_tokens
                        or int(self.lengths[slot]) >= self.max_pages * PAGE):
                    self._finish(slot)
            self._admit()
        out = {r.rid: r.out_tokens for r in self._finished}
        self._finished = []
        return out
