"""Batched GQA decode attention over slot-pool KV caches (Pallas, TPU).

The decode einsum composition (scores einsum -> masked softmax -> context
einsum over the KV cache) lowers to a batch LOOP of tiny
``[group, Dh] x [Dh, L]`` matmuls on TPU: measured on chip it costs ~3.3 us
per (row, layer) REGARDLESS of L (2.40 ms/step at pool=33/L=832 across 22
TinyLlama layers; halving L to 416 only reached 2.02 ms, while halving the
layer count halved the time exactly).  At ~31% of HBM roofline that one op
was 58% of the whole serving decode step.

This kernel gets back within 1.3x of the pure-DMA floor (measured 1.26 ms
to stream the same 619 MB of KV through VMEM) via three on-chip-ablated
choices:

* **flat cache layout** ``[B, L, KH*Dh]``: XLA lays the 4-D
  ``[B, L, KH, Dh]`` cache out L-minor (``{2,4,3,1,0:T(8,128)}``), so a
  4D->3D reshape at the call site is a physical TRANSPOSE of the whole
  cache — it alone cost 1.9 ms/step.  Callers keep the cache flat (see
  ``models/llama.py``) and the kernel blocks it natively.
* **block-diagonal q**: all KV heads' scores come from ONE
  ``[H, KH*Dh] x [KH*Dh, L]`` MXU dot per row (q head h is nonzero only in
  its own head's Dh lanes, so cross-head lanes contribute zero); the
  context dot is the mirror image, with the per-head 64-lane blocks summed
  back out by static lane slices.  Per-(row, khead) dots measured 2.40
  ms/step; this form + batched softmax measured 1.66-1.78.
* **one softmax per row** over the ``[H, L]`` score block (softmax split
  per KV head cost +0.64 ms/step).

Grid iterates pool rows (``rows_per_block`` at a time, double-buffered);
the f32 score matrix never touches HBM.  Per-row key-validity masks (the
serving drains' ring-cache masks) ride along as an ``[B, L]`` int8 operand.

Replaces the hot path of the reference's vLLM/flash-attn decode step
(``models/generators/vllm.py:48-59``, ``models/generators/llm.py:51-52``)
with a TPU-native design; used by every S==1 decode in ``models/llama.py``
(uniform generate, epoch drain, chunked drain decode rows).

TP note: under a model-parallel mesh the cache's KH*Dh axis is sharded;
the kernel is only engaged on single-chip decode paths (the multichip
contract runs the einsum fallback), pending a shard_map wrapping.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(q_ref, kv_ref, vv_ref, valid_ref, o_ref, *,
                   rows: int, kv_heads: int, group: int, head_dim: int,
                   sm_scale: float):
    """``rows`` pool rows per program; see module docstring for the
    block-diagonal construction."""
    H = kv_heads * group
    KHD = kv_heads * head_dim
    for r in range(rows):
        # keep rank >= 2 (Mosaic rejects 1-D intermediates) and compare in
        # i32 (the target has no i8 vector compare)
        ok = valid_ref[r, :, :].astype(jnp.int32) > 0        # [1, L]
        qfull = q_ref[r, :, :]                               # [H, Dh]
        if kv_heads > 1:
            ii = jax.lax.broadcasted_iota(jnp.int32, (H, KHD), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (H, KHD), 1)
            own = (jj // head_dim) == (ii // group)
            qblk = jnp.where(own, jnp.tile(qfull, (1, kv_heads)),
                             jnp.zeros((), qfull.dtype))     # [H, KHD]
        else:
            qblk = qfull
        s = jax.lax.dot_general(
            qblk, kv_ref[r, :, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                          # [H, L]
        s = jnp.where(ok, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        p = (p / jnp.maximum(l, 1e-30)).astype(vv_ref.dtype)
        ctx_full = jax.lax.dot_general(
            p, vv_ref[r, :, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # [H, KHD]
        if kv_heads > 1:
            ctx_full = jnp.where(own, ctx_full, 0.0)
            acc = ctx_full[:, 0:head_dim]
            for h in range(1, kv_heads):
                acc = acc + ctx_full[:, h * head_dim:(h + 1) * head_dim]
        else:
            acc = ctx_full
        o_ref[r, :, :] = acc.astype(o_ref.dtype)


def _rows_per_block(B: int, L: int, KHD: int) -> int:
    """Largest row block whose double-buffered K+V fits comfortably in
    VMEM (~16 MB/core), preferring exact divisors of B (no padded rows)."""
    env = os.environ.get("BERGEN_TPU_DECODE_ROWS")
    if env:
        return max(1, int(env))
    per_row = L * KHD * 2 * 2 * 2  # K+V, bf16, double-buffered
    fit = [r for r in range(1, 9) if r * per_row <= 10 * 2 ** 20]
    if not fit:
        return 1
    divisors = [r for r in fit if B % r == 0]
    return max(divisors) if divisors else max(fit)


@functools.partial(jax.jit,
                   static_argnames=("kv_heads", "sm_scale", "interpret"))
def decode_attention(
    q: jnp.ndarray,        # [B, H, Dh]
    k_cache: jnp.ndarray,  # [B, L, KH*Dh] flat (or [B, L, KH, Dh])
    v_cache: jnp.ndarray,  # same layout as k_cache
    k_valid: jnp.ndarray,  # [B, L] bool/int — 1 = attendable
    *,
    kv_heads: int | None = None,
    sm_scale: float,
    interpret: bool = False,
) -> jnp.ndarray:          # [B, H, Dh] in q.dtype
    B, H, Dh = q.shape
    if k_cache.ndim == 4:
        # 4-D callers (tests / ad-hoc): on TPU this reshape is a physical
        # transpose — production paths keep the cache flat
        KH = k_cache.shape[2]
        k_cache = k_cache.reshape(B, k_cache.shape[1], KH * Dh)
        v_cache = v_cache.reshape(B, v_cache.shape[1], KH * Dh)
    else:
        KH = kv_heads if kv_heads is not None else k_cache.shape[2] // Dh
    L = k_cache.shape[1]
    group = H // KH
    # [B, 1, L]: a (1, 1, L) block satisfies the TPU block-shape rule (the
    # last two dims equal the array's own)
    valid = k_valid.astype(jnp.int8).reshape(B, 1, L)
    KHD = KH * Dh
    Rb = _rows_per_block(B, L, KHD)
    Bp = -(-B // Rb) * Rb
    kf, vf = k_cache, v_cache
    if Bp != B:
        pad = [(0, Bp - B)] + [(0, 0)] * 2
        q, kf, vf = (jnp.pad(a, pad) for a in (q, kf, vf))
        valid = jnp.pad(valid, pad)
    kernel = functools.partial(
        _decode_kernel, rows=Rb, kv_heads=KH, group=group, head_dim=Dh,
        sm_scale=sm_scale,
    )
    out = pl.pallas_call(
        kernel,
        grid=(Bp // Rb,),
        in_specs=[
            pl.BlockSpec((Rb, H, Dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((Rb, L, KHD), lambda i: (i, 0, 0)),
            pl.BlockSpec((Rb, L, KHD), lambda i: (i, 0, 0)),
            pl.BlockSpec((Rb, 1, L), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Rb, H, Dh), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, H, Dh), q.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(q, kf, vf, valid)
    return out[:B]


def flat_cache_ok(cfg_like, L: int | None = None) -> bool:
    """Should a decode cache be allocated in the flat [B, L, KH*Dh] layout
    (kernel-native)?  Mirrors the runtime gate in models/llama.py: plain
    scaled-dot GQA only, and a kernel-capable backend."""
    fd = os.environ.get("BERGEN_TPU_FLASH_DECODE", "1")
    if fd == "0":
        return False
    if not (jax.default_backend() == "tpu" or fd == "interpret"):
        return False
    return (
        not getattr(cfg_like, "attn_logit_softcap", None)
        and getattr(cfg_like, "query_pre_attn_scalar", None) is None
        and not (getattr(cfg_like, "post_norms", False)
                 and getattr(cfg_like, "sliding_window", None))
        and getattr(cfg_like, "head_dim", 64) % 64 == 0
        and (L is None or L % 16 == 0)
    )
