"""Fused causal attention (flash-attention) Pallas kernel for TPU.

Replaces the reference's flash-attn-2 CUDA dependency
(``models/generators/llm.py:51-52``) for llama prefill: online-softmax over key
blocks so the [S, S] score matrix never materialises in HBM — scores live in
VMEM one (block_q × block_k) tile at a time, with running row-max/row-sum
rescaling.  Handles GQA by folding the query-group axis into the block rows.

On CPU (tests) the kernel runs in interpreter mode; ``attention`` falls back to
the einsum path when Pallas is unsuitable (tiny shapes).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, kvalid_ref, o_ref, m_scratch,
                  l_scratch, acc_scratch, *, block_q: int, block_k: int,
                  sm_scale: float, causal: bool, q_offset_blocks: int):
    """Grid: (num_q_blocks, num_k_blocks); K is the minor (fastest) axis so the
    VMEM accumulator carries across k steps for one q block."""
    qi = pl.program_id(0)
    ki = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[:]  # [block_q, d]
    k = k_ref[:]  # [block_k, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale  # [block_q, block_k]

    if causal:
        q_pos = (q_offset_blocks + qi) * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        k_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
    # key-validity mask (left-padded prompts / cache tail): [block_k, 1]
    s = jnp.where(kvalid_ref[:].T > 0, s, NEG_INF)

    m_prev = m_scratch[:]          # [block_q, 1]
    l_prev = l_scratch[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                       # [block_q, block_k]
    alpha = jnp.exp(m_prev - m_new)              # rescale factor
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scratch[:] = m_new
    l_scratch[:] = l_new

    @pl.when(ki == nk - 1)
    def _finalize():
        o_ref[:] = (acc_scratch[:] / jnp.maximum(l_scratch[:], 1e-30)).astype(
            o_ref.dtype
        )


def flash_attention_single_head(
    q: jnp.ndarray,  # [Sq, d]
    k: jnp.ndarray,  # [Sk, d]
    v: jnp.ndarray,  # [Sk, d]
    k_valid: jnp.ndarray | None = None,  # [Sk] 1=attendable
    *,
    causal: bool = True,
    sm_scale: float | None = None,
    block_q: int = 128,
    block_k: int = 128,
    q_offset: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention for one (batch, head); vmap over batch/head outside.
    q_offset shifts query positions (queries correspond to absolute positions
    q_offset..q_offset+Sq-1 against keys 0..Sk-1)."""
    Sq, d = q.shape
    Sk = k.shape[0]
    sm_scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(d)
    block_q = min(block_q, Sq)
    block_k = min(block_k, Sk)
    assert Sq % block_q == 0 and Sk % block_k == 0, "pad seqs to block multiples"
    assert q_offset % block_q == 0, "q_offset must align to block_q"

    if k_valid is None:
        k_valid = jnp.ones((Sk,), jnp.float32)
    kv2d = k_valid.astype(jnp.float32).reshape(Sk, 1)

    grid = (Sq // block_q, Sk // block_k)
    kernel = functools.partial(
        _flash_kernel, block_q=block_q, block_k=block_k, sm_scale=sm_scale,
        causal=causal, q_offset_blocks=q_offset // block_q,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Sq, d), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_q, d), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_k, d), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_k, d), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_k, 1), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_q, d), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * Sq * Sk * d,
            bytes_accessed=(Sq * d + 2 * Sk * d + Sq * d) * 2,
            transcendentals=Sq * Sk,
        ),
        interpret=interpret,
    )(q, k, v, kv2d)


def flash_attention(
    q: jnp.ndarray,  # [B, Sq, H, d]
    k: jnp.ndarray,  # [B, Sk, KH, d]
    v: jnp.ndarray,  # [B, Sk, KH, d]
    k_valid: jnp.ndarray | None = None,  # [B, Sk] 1=attendable
    *,
    causal: bool = True,
    q_offset: int = 0,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched GQA flash attention → [B, Sq, H, d].  Pads seq dims to block
    multiples internally (padded keys are masked by the causal bound; padded
    queries are dropped)."""
    B, Sq, H, d = q.shape
    Sk, KH = k.shape[1], k.shape[2]
    group = H // KH

    def pad_to(x, axis, m):
        r = (-x.shape[axis]) % m
        if r == 0:
            return x
        pads = [(0, 0)] * x.ndim
        pads[axis] = (0, r)
        return jnp.pad(x, pads)

    qp = pad_to(q, 1, block_q)
    kp = pad_to(k, 1, block_k)
    vp = pad_to(v, 1, block_k)
    if k_valid is None:
        k_valid = jnp.ones((B, Sk), jnp.float32)
    kvp = pad_to(k_valid.astype(jnp.float32), 1, block_k)  # pads invalid(0)

    # fold: [B, H, Sq, d] with kv head broadcast
    q_bh = jnp.moveaxis(qp, 2, 1).reshape(B * H, qp.shape[1], d)
    k_rep = jnp.repeat(jnp.moveaxis(kp, 2, 1), group, axis=1).reshape(
        B * H, kp.shape[1], d
    )
    v_rep = jnp.repeat(jnp.moveaxis(vp, 2, 1), group, axis=1).reshape(
        B * H, vp.shape[1], d
    )
    kv_rep = jnp.repeat(kvp[:, None], H, axis=1).reshape(B * H, kvp.shape[1])

    fn = functools.partial(
        flash_attention_single_head, causal=causal,
        sm_scale=1.0 / math.sqrt(d), block_q=block_q, block_k=block_k,
        q_offset=q_offset, interpret=interpret,
    )
    out = jax.vmap(fn)(q_bh, k_rep, v_rep, kv_rep)  # [B*H, Sq_p, d]
    out = out.reshape(B, H, qp.shape[1], d)[:, :, :Sq]
    return jnp.moveaxis(out, 1, 2)


def _flash_kernel_band(q_ref, k_ref, v_ref, band_ref, o_ref, m_scratch,
                       l_scratch, acc_scratch, *, block_q: int, block_k: int,
                       sm_scale: float):
    """Banded variant: per-QUERY-row dynamic key bounds — row i attends to
    keys [band[i, 0], band[i, 1]).  The serving drain's chunked prefill
    needs this (its causal bound `prefix_len + i + 1` is a traced value, so
    the static `q_offset_blocks` of ``_flash_kernel`` cannot express it).
    Rows with an empty band produce zeros (l == 0 guard in finalize)."""
    ki = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[:]
    k = k_ref[:]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale
    k_pos = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    lo = band_ref[:, 0:1]
    hi = band_ref[:, 1:2]
    inband = (k_pos >= lo) & (k_pos < hi)
    s = jnp.where(inband, s, NEG_INF)

    m_prev = m_scratch[:]
    l_prev = l_scratch[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    # out-of-band entries are hard-zeroed (not just exp-underflowed): a row
    # whose band is EMPTY keeps l == 0 and finalizes to exact zeros instead
    # of a uniform average (the drain's inactive chunk rows hit this)
    p = jnp.where(inband, jnp.exp(s - m_new), 0.0)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scratch[:] = m_new
    l_scratch[:] = l_new

    @pl.when(ki == nk - 1)
    def _finalize():
        o_ref[:] = (acc_scratch[:] / jnp.maximum(l_scratch[:], 1e-30)).astype(
            o_ref.dtype
        )


def flash_attention_band(
    q: jnp.ndarray,     # [Sq, H, d]
    k: jnp.ndarray,     # [Sk, KH, d]
    v: jnp.ndarray,     # [Sk, KH, d]
    band: jnp.ndarray,  # [Sq, 2] i32 — row i attends keys [lo_i, hi_i)
    *,
    sm_scale: float | None = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """GQA flash attention with per-query dynamic key bands → [Sq, H, d].
    Pads seq dims to block multiples (padded keys fall outside every band;
    padded query rows are dropped).  Online softmax keeps the [Sq, Sk]
    scores in VMEM one tile at a time — the HBM score/probs traffic of the
    einsum composition was measured at ~8.5 us per chunk token in the
    serving drain (1.09 ms of a 5.92 ms step at CHUNK=128)."""
    Sq, H, d = q.shape
    Sk, KH = k.shape[0], k.shape[1]
    group = H // KH
    sm_scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(d)
    bq = min(block_q, max(8, Sq))
    bk = min(block_k, Sk)

    def pad_to(x, axis, m):
        r = (-x.shape[axis]) % m
        if r == 0:
            return x
        pads = [(0, 0)] * x.ndim
        pads[axis] = (0, r)
        return jnp.pad(x, pads)

    qp = pad_to(q, 0, bq)
    kp = pad_to(k, 0, bk)
    vp = pad_to(v, 0, bk)
    bp = pad_to(band, 0, bq)  # pad rows: band [0, 0) -> zero output
    Sqp, Skp = qp.shape[0], kp.shape[0]

    q_h = jnp.moveaxis(qp, 1, 0)                      # [H, Sqp, d]
    k_h = jnp.repeat(jnp.moveaxis(kp, 1, 0), group, axis=0)
    v_h = jnp.repeat(jnp.moveaxis(vp, 1, 0), group, axis=0)

    grid = (Sqp // bq, Skp // bk)
    kernel = functools.partial(
        _flash_kernel_band, block_q=bq, block_k=bk, sm_scale=sm_scale)

    def one_head(qh, kh, vh):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Sqp, d), q.dtype),
            grid_spec=pl.GridSpec(
                grid=grid,
                in_specs=[
                    pl.BlockSpec((bq, d), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bk, d), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bk, d), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bq, 2), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((bq, d), lambda i, j: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((bq, 1), jnp.float32),
                    pltpu.VMEM((bq, 1), jnp.float32),
                    pltpu.VMEM((bq, d), jnp.float32),
                ],
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * Sqp * Skp * d,
                bytes_accessed=(2 * Sqp * d + 2 * Skp * d) * 2,
                transcendentals=Sqp * Skp,
            ),
            interpret=interpret,
        )(qh, kh, vh, bp)

    out = jax.vmap(one_head)(q_h, k_h, v_h)          # [H, Sqp, d]
    return jnp.moveaxis(out, 0, 1)[:Sq]
