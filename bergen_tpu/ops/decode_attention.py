"""Batched GQA decode attention over slot-pool KV caches (Pallas, TPU).

The decode einsum composition (scores einsum -> masked softmax -> context
einsum over a ``[B, L, KH, Dh]`` cache) lowers to a batch LOOP of tiny
``[group, Dh] x [Dh, L]`` matmuls on TPU: measured on chip it costs ~3.3 us
per (row, layer) REGARDLESS of L (2.40 ms/step at pool=33/L=832 across 22
TinyLlama layers; halving L to 416 only reached 2.02 ms, while halving the
layer count halved the time exactly) — per-row dispatch latency, not
bandwidth, binds it.  At ~31% of HBM roofline that one op was 58% of the
whole serving decode step.

This kernel restores the bandwidth bound: grid over pool rows, each program
DMAs its row's full keys+values (``[L, KH*Dh]`` — e.g. 426 KB at L=832) into
VMEM double-buffered across grid steps, computes all KV-heads' scores with
proper MXU dots, and keeps the f32 score matrix entirely in VMEM.  Per-row
key-validity masks (the serving drains' ring-cache masks) ride along as an
``[B, L]`` int8 operand.

Replaces the hot path of the reference's vLLM/flash-attn decode step
(``models/generators/vllm.py:48-59``, ``models/generators/llm.py:51-52``)
with a TPU-native design; used by every S==1 decode in ``models/llama.py``
(uniform generate, epoch drain, chunked drain decode rows).
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
    """One program = ``rows`` pool rows: scores/softmax/context for all
    heads of each row.

    Shapes in VMEM: q [rows, H, Dh], k/v [rows, L, KH*Dh], valid
    [rows, 1, L], out [rows, H, Dh].  The python loops over rows and KV
    heads are static (rows x KH dots of [group, Dh] x [Dh, L] — real MXU
    work, no data-dependent batch loop); multiple rows per program
    amortize the fixed grid-step cost (measured ~6 us/program at rows=1).
    """
    for r in range(rows):
        # keep rank >= 2 (Mosaic rejects 1-D intermediates) and compare in
        # i32 (the target has no i8 vector compare)
        ok = valid_ref[r, :, :].astype(jnp.int32) > 0  # [1, L]
        for h in range(kv_heads):
            qh = q_ref[r, h * group:(h + 1) * group, :]          # [g, Dh]
            kh = kv_ref[r, :, h * head_dim:(h + 1) * head_dim]   # [L, Dh]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale                                          # [g, L]
            s = jnp.where(ok, s, NEG_INF)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            p = (p / jnp.maximum(l, 1e-30)).astype(vv_ref.dtype)
            vh = vv_ref[r, :, h * head_dim:(h + 1) * head_dim]   # [L, Dh]
            ctx = jax.lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                     # [g, Dh]
            o_ref[r, h * group:(h + 1) * group, :] = ctx.astype(o_ref.dtype)


def _rows_per_block(B: int, L: int, KHD: int) -> int:
    """Largest row block whose double-buffered K+V fits comfortably in
    VMEM (~16 MB/core), bounded by the padding waste on the last block."""
    env = os.environ.get("BERGEN_TPU_DECODE_ROWS")
    if env:
        return max(1, int(env))
    per_row = L * KHD * 2 * 2 * 2  # K+V, bf16, double-buffered
    best = 1
    for r in (8, 6, 4, 3, 2):
        if r * per_row <= 10 * 2 ** 20 and (-B % r) <= r:
            best = r
            break
    return best


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def decode_attention(
    q: jnp.ndarray,        # [B, H, Dh]
    k_cache: jnp.ndarray,  # [B, L, KH, Dh]
    v_cache: jnp.ndarray,  # [B, L, KH, Dh]
    k_valid: jnp.ndarray,  # [B, L] bool/int — 1 = attendable
    *,
    sm_scale: float,
    interpret: bool = False,
) -> jnp.ndarray:          # [B, H, Dh] in q.dtype
    B, H, Dh = q.shape
    _, L, KH, _ = k_cache.shape
    group = H // KH
    # free reshape: [L, KH, Dh] rows are contiguous, so [L, KH*Dh] keeps the
    # (sublane=L, lane=KH*Dh) layout MXU-friendly without a copy
    kf = k_cache.reshape(B, L, KH * Dh)
    vf = v_cache.reshape(B, L, KH * Dh)
    # [B, 1, L]: a (1, 1, L) block satisfies the TPU block-shape rule (the
    # last two dims equal the array's own)
    valid = k_valid.astype(jnp.int8).reshape(B, 1, L)
    Rb = _rows_per_block(B, L, KH * Dh)
    Bp = -(-B // Rb) * Rb
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
            pl.BlockSpec((Rb, L, KH * Dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((Rb, L, KH * Dh), lambda i: (i, 0, 0)),
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


def supports(cfg_like, S: int, L: int) -> bool:
    """Static gate mirrored by the einsum fallback in models/llama.py:
    plain scaled-dot GQA decode only (no softcap / query-scale / sliding),
    cache length aligned to the bf16 sublane tile."""
    return (
        S == 1
        and L % 16 == 0
        and not getattr(cfg_like, "attn_logit_softcap", None)
        and getattr(cfg_like, "query_pre_attn_scalar", None) is None
    )
