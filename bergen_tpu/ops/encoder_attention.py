"""Fused short-sequence encoder attention Pallas kernel for TPU.

The encode hot loop (reference ``modules/retrieve.py:111-144``) runs
BERT-shaped encoders at short sequence lengths (~128-256 tokens).  There,
XLA's attention is *memory-bound on the [B, H, S, S] fp32 score tensor*:
at B=256/S=192/H=12 the scores are ~452 MB per layer and cost ~4.5 ms of
the ~9 ms layer, with <0.3 ms of FLOPs.  Streaming flash kernels (online
softmax over key blocks) measured *slower* than XLA here — at short S the
grid bookkeeping dominates because one whole [S, S] score tile already
fits in VMEM.

So this kernel does the simple thing flash attention exists to avoid at
long S: it keeps the entire [S, S] score tile in VMEM, runs a plain
single-pass softmax, and writes only the context back to HBM.  Scores
never touch HBM.

Two layout lessons are baked in (both measured on v5e, B=256/S=192/H=12):

1. Mosaic supports squeezing only leading block axes, so heads cannot be
   indexed out of the middle of a [B, S, H, Dh] block.
2. A head-folded [B*H, S, Dh] layout (transpose outside the kernel) makes
   the kernel fast but *poisons the layout* of the surrounding projection
   matmuls: XLA assigns the custom call's operands/results a transposed
   layout ({2,0,1}) and then picks a degenerate batch-in-sublanes emitter
   for the following o-projection (~6 ms/layer) — the kernel win vanishes
   end-to-end (107 ms vs 104 ms full-encoder step).

Hence v3: q/k/v/o stay in natural row-major [B, S, D] exactly as the
projection matmuls produce them.  Heads are processed in 128-lane groups
(g = 128 // Dh heads at a time): load a lane-aligned [S, 128] slice,
split per-head values in registers, concatenate the per-head contexts and
store one aligned [S, 128] group.  No transposes anywhere, no layout
pressure on XLA.

Measured in-context (qkvo projections + attention, per layer):
  fused v3       2.11 ms
  XLA attention  4.31 ms    (attention alone: ~0.5 ms vs ~2.7 ms)
Whole-encoder effect: 104 -> ~78 ms/step on the bench encode workload.

Multi-chip: a bare ``pallas_call`` has no SPMD partitioning rule, so under
a >1-device mesh the call is wrapped in ``shard_map`` over the batch axis
(the grid is embarrassingly parallel over B) — same pattern as
``ops/scoring.sharded_topk``.  Callers fall back to the XLA path when the
batch doesn't divide the mesh (``supported``).

Numerics: scores accumulate in fp32 on the MXU, softmax in fp32, context
matmul accumulates fp32 — identical to the XLA path; measured max-abs
divergence 2e-3 in bf16 (bf16 rounding noise).  Fully-masked rows get
uniform probabilities, matching ``jax.nn.softmax`` over a constant row.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

NEG_INF = -1e30

# Whole-sequence-in-VMEM needs ~4 [S, D] blocks plus one [S, S] fp32 score
# tile resident at once; cap S so VMEM stays comfortable.
MAX_FUSED_SEQ = 1024
MIN_FUSED_SEQ = 128  # below this XLA's fusion is already fine


def _lane_group(head_dim: int) -> int:
    """Heads per 128-lane group (1 when a head spans >= one lane tile)."""
    return max(128 // head_dim, 1)


def supported(B: int, S: int, num_heads: int, head_dim: int,
              mask_ndim: int, on_tpu: bool,
              has_bias: bool = False) -> bool:
    """Shapes/platforms this kernel handles (self-attention, [B, S] mask).

    Head groups must tile the 128-lane dimension exactly, and under a
    multi-device mesh the batch must divide it (shard_map wrap).  An
    additive [H, S, S] bias (ALiBi / T5 relative positions) rides VMEM as
    a constant block, so it must fit comfortably.
    """
    if not (on_tpu and mask_ndim == 2
            and MIN_FUSED_SEQ <= S <= MAX_FUSED_SEQ):
        return False
    if has_bias and num_heads * S * S * 4 > 32 * 1024 * 1024:
        return False
    g = _lane_group(head_dim)
    if g * head_dim != 128 and head_dim % 128 != 0:
        return False
    if num_heads % g != 0:
        return False
    n_dev = len(jax.devices())
    return n_dev == 1 or B % n_dev == 0


# Batch elements per grid invocation.  Measured on v5e (B256/S192 encode
# step): block_b=1 -> 81.2 ms, block_b=8 -> 83.7 ms — the single-element
# grid pipelines DMA best, so the default stays 1; the knob remains for
# other shapes.  Auto: largest power of two <= BLOCK_B_MAX dividing the
# local batch, subject to VMEM (~4 * block_b * S * D * 2 bytes of blocks).
BLOCK_B_MAX = 1


def _pick_block_b(B: int, S: int, D: int) -> int:
    bb = 1
    while (bb * 2 <= BLOCK_B_MAX and B % (bb * 2) == 0
           and 4 * (bb * 2) * S * D * 2 <= 8 * 1024 * 1024):
        bb *= 2
    return bb


def _kernel(q_ref, k_ref, v_ref, m_ref, *rest,
            block_b: int, heads: int, head_dim: int, scale: float,
            has_bias: bool):
    """q/k/v/o refs are [block_b, S, D]; m_ref is [block_b, 1, S]; with
    has_bias an extra [H, S, S] additive-bias ref precedes the output."""
    if has_bias:
        bias_ref, o_ref = rest
    else:
        (o_ref,) = rest
        bias_ref = None
    g = _lane_group(head_dim)
    gw = g * head_dim  # lane-aligned group width
    for b in range(block_b):
        mbias = jnp.where(m_ref[b][0, :][None, :] > 0, 0.0,
                          jnp.float32(NEG_INF))
        for grp in range(heads // g):
            c0 = grp * gw
            q2 = q_ref[b][:, c0:c0 + gw]  # [S, gw] lane-aligned value slice
            k2 = k_ref[b][:, c0:c0 + gw]
            v2 = v_ref[b][:, c0:c0 + gw]
            outs = []
            for j in range(g):
                qh = q2[:, j * head_dim:(j + 1) * head_dim]
                kh = k2[:, j * head_dim:(j + 1) * head_dim]
                vh = v2[:, j * head_dim:(j + 1) * head_dim]
                s = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale + mbias                     # [S, S] f32, VMEM-only
                if bias_ref is not None:
                    s = s + bias_ref[grp * g + j].astype(jnp.float32)
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                p = (p / l).astype(vh.dtype)
                outs.append(
                    jnp.dot(p, vh, preferred_element_type=jnp.float32))
            o_ref[b, :, c0:c0 + gw] = jnp.concatenate(
                outs, axis=1).astype(o_ref.dtype)


def _attn_local(q, k, v, mask, *rest, num_heads: int,
                scale: float | None = None):
    """Pallas attention on local (per-shard) arrays. q/k/v: [B, S, D];
    optional trailing arg: additive [H, S, S] bias (batch-invariant —
    ALiBi slopes, T5 relative-position buckets).  scale defaults to
    1/sqrt(head_dim); T5 passes 1.0 (its scores are unscaled)."""
    attn_bias = rest[0] if rest else None
    B, S, D = q.shape
    head_dim = D // num_heads
    bb = _pick_block_b(B, S, D)
    spec = pl.BlockSpec((bb, S, D), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [spec, spec, spec,
                pl.BlockSpec((bb, 1, S), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)]
    operands = [q, k, v, mask.astype(jnp.int32)[:, None, :]]
    if attn_bias is not None:
        in_specs.append(pl.BlockSpec((num_heads, S, S), lambda b: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(attn_bias)
    return pl.pallas_call(
        functools.partial(_kernel, block_b=bb, heads=num_heads,
                          head_dim=head_dim,
                          scale=(1.0 / math.sqrt(head_dim)
                                 if scale is None else scale),
                          has_bias=attn_bias is not None),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid_spec=pl.GridSpec(
            grid=(B // bb,),
            in_specs=in_specs,
            out_specs=spec,
        ),
        compiler_params=pltpu.CompilerParams(**_VMEM_PARAMS),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * S * S * head_dim,
            transcendentals=B * num_heads * S * S,
            bytes_accessed=4 * B * S * D * 2,
        ),
        # CPU (tests): run the kernel in the Pallas interpreter so the fused
        # path is coverable without Mosaic
        interpret=jax.default_backend() != "tpu",
    )(*operands)


# --------------------------------------------------------------------------- #
# whole LAYER fusion (qkv proj + attention + o proj + residual + LN + FFN
# + residual + LN)
# --------------------------------------------------------------------------- #
#
# Even with the fused attention above, ~1.7 ms/layer of boundary ops remain
# around the custom call (qkv bias adds, the o-projection scheduled alone,
# the residual+LayerNorm convert/reduce) that XLA can no longer fuse across
# the kernel.  Fusing the whole transformer layer into one pallas_call
# removes every boundary: all weights ride VMEM as constant blocks across
# the batch grid (fetched once, ~14 MB at D=768/I=3072 — needs the scoped
# VMEM limit raised above the 16 MB default), and activations round-trip
# HBM exactly once per layer.
# Measured iso (B=256/S=192/H=12, v5e): 4.48 ms vs 9.15 ms XLA per layer;
# attention-block-only fusion measured 2.00 vs 5.05 ms for its sub-block.

# VMEM budget for the whole-layer kernel: resident weights PLUS the
# S-dependent activation scratch (see layer_weights_fit) must stay under
# this, leaving headroom below the 64 MB scoped limit requested below
# (bert-large at D=1024/I=4096 is ~25 MB of weights).
MAX_LAYER_VMEM_BUDGET_BYTES = 48 * 1024 * 1024


def _erf(x):
    """Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7, below bf16 noise) —
    Mosaic has no erf primitive."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t \
        * jnp.exp(-ax * ax)
    return s * y


_KERNEL_ACTS = {
    # HF BERT default "gelu" is erf-based
    "gelu": lambda x: x * 0.5 * (1.0 + _erf(x * 0.7071067811865476)),
    "gelu_new": lambda x: x * 0.5 * (1.0 + jnp.tanh(
        0.7978845608028654 * (x + 0.044715 * x * x * x))),
    "relu": lambda x: jnp.maximum(x, 0.0),
    "silu": lambda x: x * (1.0 / (1.0 + jnp.exp(-x))),
}


def _attn_sub(x, qkv, m_row, *, heads, head_dim, scale, score_bias=None):
    """Shared attention math on one sequence: qkv [S, 3D] bf16 -> ctx [S, D].
    ``score_bias``: optional per-head additive [H, S, S] pre-softmax scores
    (DeBERTa's disentangled c2p/p2c terms — per-sequence, streamed as a
    kernel operand, unlike the batch-invariant VMEM-const ALiBi/T5 bias)."""
    Dm = heads * head_dim
    g = _lane_group(head_dim)
    gw = g * head_dim
    bias = jnp.where(m_row[None, :] > 0, 0.0, jnp.float32(NEG_INF))
    groups = []
    for grp in range(heads // g):
        c0 = grp * gw
        q2 = qkv[:, c0:c0 + gw]
        k2 = qkv[:, Dm + c0:Dm + c0 + gw]
        v2 = qkv[:, 2 * Dm + c0:2 * Dm + c0 + gw]
        outs = []
        for j in range(g):
            qh = q2[:, j * head_dim:(j + 1) * head_dim]
            kh = k2[:, j * head_dim:(j + 1) * head_dim]
            vh = v2[:, j * head_dim:(j + 1) * head_dim]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + bias
            if score_bias is not None:
                s = s + score_bias[grp * g + j].astype(jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p = (p / l).astype(vh.dtype)
            outs.append(jnp.dot(p, vh, preferred_element_type=jnp.float32))
        groups.append(jnp.concatenate(outs, axis=1).astype(x.dtype))
    return jnp.concatenate(groups, axis=1)  # [S, D]


def _ln(o, scale_row, bias_row, eps):
    mu = jnp.mean(o, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(o - mu), axis=1, keepdims=True)
    return ((o - mu) * jax.lax.rsqrt(var + eps)
            * scale_row[None, :].astype(jnp.float32)
            + bias_row[None, :].astype(jnp.float32))


def _layer_tail(x, ctx, wo_ref, bo_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, ln2s_ref, ln2b_ref, eps: float, act: str):
    """o proj + residual + LN + FFN + residual + LN on [M, D] rows (shared
    by the standard and prebias whole-layer kernels)."""
    o = jax.lax.dot_general(
        ctx, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[0][None, :].astype(jnp.float32) + x.astype(jnp.float32)
    y = _ln(o, lns_ref[0], lnb_ref[0], eps)             # [M, D] f32
    yb = y.astype(x.dtype)
    h = jax.lax.dot_general(
        yb, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0][None, :].astype(jnp.float32)
    h = _KERNEL_ACTS[act](h).astype(x.dtype)
    f = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0][None, :].astype(jnp.float32) + y
    return _ln(f, ln2s_ref[0], ln2b_ref[0], eps)


def _layer_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, lns_ref,
                  lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, ln2s_ref,
                  ln2b_ref, m_ref, o_ref, *, heads: int, head_dim: int,
                  scale: float, eps: float, act: str, n_seqs: int = 1):
    # n_seqs sequences flattened into ONE [n*S, D] row block: every matmul
    # in the layer gets an M dimension of n*S instead of S, filling the MXU
    # better at short S (the round-2 "remaining headroom"); only the
    # attention sub-block splits back per sequence
    S = x_ref.shape[1]
    x = x_ref[...].reshape(n_seqs * S, x_ref.shape[2])  # [n*S, D]
    qkv = jax.lax.dot_general(
        x, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[0][None, :].astype(jnp.float32)        # [n*S, 3D] f32
    qkv_b = qkv.astype(x.dtype)
    ctxs = []
    for i in range(n_seqs):
        ctxs.append(_attn_sub(
            x[i * S:(i + 1) * S], qkv_b[i * S:(i + 1) * S], m_ref[i][0, :],
            heads=heads, head_dim=head_dim, scale=scale,
        ))
    ctx = ctxs[0] if n_seqs == 1 else jnp.concatenate(ctxs, axis=0)
    z = _layer_tail(x, ctx, wo_ref, bo_ref, lns_ref, lnb_ref, w1_ref,
                    b1_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref, eps, act)
    o_ref[...] = z.reshape(x_ref.shape).astype(o_ref.dtype)


def _layer_kernel_prebias(x_ref, qkv_ref, bias_ref, wo_ref, bo_ref, lns_ref,
                          lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, ln2s_ref,
                          ln2b_ref, m_ref, o_ref, *, heads: int,
                          head_dim: int, scale: float, eps: float, act: str,
                          n_seqs: int = 1):
    """Whole-layer fusion for encoders whose attention needs a PER-SEQUENCE
    score bias (DeBERTa's disentangled c2p/p2c terms depend on the content
    projections, so unlike ALiBi/T5 the bias cannot ride VMEM as a constant).
    The qkv projection and the [H, S, S] bias arrive as streamed operands —
    XLA computes them in one fused region per layer (including the one-hot
    relative-position regathers, models/deberta.py) — and everything from
    the scores onward (softmax, context, o proj, residuals, LNs, FFN) stays
    in VMEM."""
    S = x_ref.shape[1]
    x = x_ref[...].reshape(n_seqs * S, x_ref.shape[2])      # [n*S, D]
    qkv_b = qkv_ref[...].reshape(n_seqs * S, qkv_ref.shape[2])
    ctxs = []
    for i in range(n_seqs):
        ctxs.append(_attn_sub(
            x[i * S:(i + 1) * S], qkv_b[i * S:(i + 1) * S], m_ref[i][0, :],
            heads=heads, head_dim=head_dim, scale=scale,
            score_bias=bias_ref[i],
        ))
    ctx = ctxs[0] if n_seqs == 1 else jnp.concatenate(ctxs, axis=0)
    z = _layer_tail(x, ctx, wo_ref, bo_ref, lns_ref, lnb_ref, w1_ref,
                    b1_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref, eps, act)
    o_ref[...] = z.reshape(x_ref.shape).astype(o_ref.dtype)


# --------------------------------------------------------------------------- #
# W8A8 whole-layer kernel: int8 weights resident in VMEM (half the bf16
# footprint), activations per-ROW (per-token) absmax-quantized in-kernel,
# and the three large matmuls (qkv proj, FFN in, FFN out) plus the o proj
# run as native int8xint8 MXU dots (2x the bf16 MXU peak).  Attention math
# (scores, softmax, context) and the LayerNorms stay bf16/f32 — they are
# <5% of the layer FLOPs and carry the numerics risk.  Same quantization
# convention as the generator's W8A8 path (llama._proj /
# convert.quantize_tree_int8(mxu=True)): per-output-channel weight scales,
# dynamic per-row activation scales.
# --------------------------------------------------------------------------- #


def _qdot(x, wq_ref, sw_ref):
    """Per-row-quantized int8 MXU dot: x [M, K] f32, wq [K, N] int8,
    sw [1, N] f32 per-column scales -> [M, N] f32."""
    sx = jnp.maximum(
        jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-8) / 127.0
    xq = jnp.round(x / sx).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * sx * sw_ref[0][None, :]


def _layer_kernel_q(x_ref, wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref,
                    bo_ref, lns_ref, lnb_ref, w1_ref, s1_ref, b1_ref,
                    w2_ref, s2_ref, b2_ref, ln2s_ref, ln2b_ref, m_ref,
                    o_ref, *, heads: int, head_dim: int, scale: float,
                    eps: float, act: str, n_seqs: int = 1):
    S = x_ref.shape[1]
    x = x_ref[...].reshape(n_seqs * S, x_ref.shape[2]).astype(jnp.float32)
    qkv = _qdot(x, wqkv_ref, sqkv_ref) + bqkv_ref[0][None, :]
    qkv_b = qkv.astype(x_ref.dtype)
    xb = x.astype(x_ref.dtype)
    ctxs = []
    for i in range(n_seqs):
        ctxs.append(_attn_sub(
            xb[i * S:(i + 1) * S], qkv_b[i * S:(i + 1) * S], m_ref[i][0, :],
            heads=heads, head_dim=head_dim, scale=scale,
        ))
    ctx = ctxs[0] if n_seqs == 1 else jnp.concatenate(ctxs, axis=0)
    o = (_qdot(ctx.astype(jnp.float32), wo_ref, so_ref)
         + bo_ref[0][None, :] + x)
    y = _ln(o, lns_ref[0], lnb_ref[0], eps)             # [M, D] f32
    h = _qdot(y, w1_ref, s1_ref) + b1_ref[0][None, :]
    h = _KERNEL_ACTS[act](h)
    f = _qdot(h, w2_ref, s2_ref) + b2_ref[0][None, :] + y
    z = _ln(f, ln2s_ref[0], ln2b_ref[0], eps)
    o_ref[...] = z.reshape(x_ref.shape).astype(o_ref.dtype)


def _layer_local_q(x, wqkv, sqkv, bqkv, wo, so, bo, lns, lnb, w1, s1, b1,
                   w2, s2, b2, ln2s, ln2b, mask, num_heads: int, eps: float,
                   act: str):
    B, S, D = x.shape
    I = w1.shape[1]
    head_dim = D // num_heads
    n = LAYER_SEQS_PER_TILE
    # activation scratch grows with n (f32 qkv + FFN hidden intermediates)
    while n > 1 and (B % n != 0
                     or n * S * (3 * D + I) * 4 > 12 * 1024 * 1024):
        n -= 1
    xspec = pl.BlockSpec((n, S, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(shape, lambda b: (0, 0),
                                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_layer_kernel_q, heads=num_heads,
                          head_dim=head_dim,
                          scale=1.0 / math.sqrt(head_dim), eps=eps, act=act,
                          n_seqs=n),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid_spec=pl.GridSpec(
            grid=(B // n,),
            in_specs=[xspec,
                      const2((D, 3 * D)), const2((1, 3 * D)),
                      const2((1, 3 * D)),
                      const2((D, D)), const2((1, D)), const2((1, D)),
                      const2((1, D)), const2((1, D)),
                      const2((D, I)), const2((1, I)), const2((1, I)),
                      const2((I, D)), const2((1, D)), const2((1, D)),
                      const2((1, D)), const2((1, D)),
                      pl.BlockSpec((n, 1, S), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=xspec,
        ),
        compiler_params=pltpu.CompilerParams(**_VMEM_PARAMS),
        cost_estimate=pl.CostEstimate(
            flops=(2 * B * S * D * (4 * D + 2 * I)
                   + 4 * B * num_heads * S * S * head_dim),
            transcendentals=B * num_heads * S * S + B * S * I,
            bytes_accessed=2 * B * S * D * 2,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, wqkv, sqkv[None, :], bqkv[None, :], wo, so[None, :], bo[None, :],
      lns[None, :], lnb[None, :], w1, s1[None, :], b1[None, :],
      w2, s2[None, :], b2[None, :], ln2s[None, :], ln2b[None, :],
      mask.astype(jnp.int32)[:, None, :])


def _q_parts(p):
    """(int8 kernel, f32 per-col scale, f32 bias) of a quantized linear."""
    return p["kernel_q"], p["kernel_scale_a8"], p["bias"].astype(jnp.float32)


def encoder_layer_q(
    x: jnp.ndarray,
    attn_params,
    ln_params,
    mlp_in,
    mlp_out,
    ln2_params,
    mask: jnp.ndarray,
    num_heads: int,
    eps: float,
    act: str,
) -> jnp.ndarray:
    """W8A8 fully-fused post-LN transformer encoder layer.

    Same contract as ``encoder_layer`` but every linear carries
    ``kernel_q`` (int8) + ``kernel_scale_a8`` (f32 per-output-channel)
    instead of ``kernel`` — the ``convert.quantize_encoder_layers_w8a8``
    layout.  Intended for corpus encoding where the bf16 path is
    MXU-bound; callers MUST gate on a measured quality check (see
    ``retrievers/dense.py``'s dual-encode guard)."""
    wq, sq, bq = _q_parts(attn_params["q"])
    wk, sk, bk = _q_parts(attn_params["k"])
    wv, sv, bv = _q_parts(attn_params["v"])
    wqkv = jnp.concatenate([wq, wk, wv], axis=1)
    sqkv = jnp.concatenate([sq, sk, sv])
    bqkv = jnp.concatenate([bq, bk, bv])
    wo, so, bo = _q_parts(attn_params["o"])
    w1, s1, b1 = _q_parts(mlp_in)
    w2, s2, b2 = _q_parts(mlp_out)
    args = (wqkv, sqkv, bqkv, wo, so, bo,
            ln_params["scale"], ln_params["bias"],
            w1, s1, b1, w2, s2, b2,
            ln2_params["scale"], ln2_params["bias"])
    local = functools.partial(_layer_local_q, num_heads=num_heads, eps=eps,
                              act=act)
    return _shard_wrap(local, x, args, mask)


def _block_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, lns_ref,
                  lnb_ref, m_ref, o_ref, *, heads: int, head_dim: int,
                  scale: float, eps: float):
    """Attention block only (no FFN) — for acts/MLPs the layer kernel
    doesn't cover (gated MLPs, exotic activations)."""
    x = x_ref[0]
    qkv = jax.lax.dot_general(
        x, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[0][None, :].astype(jnp.float32)
    ctx = _attn_sub(x, qkv.astype(x.dtype), m_ref[0][0, :],
                    heads=heads, head_dim=head_dim, scale=scale)
    o = jax.lax.dot_general(
        ctx, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[0][None, :].astype(jnp.float32) + x.astype(jnp.float32)
    y = _ln(o, lns_ref[0], lnb_ref[0], eps)
    o_ref[0] = y.astype(o_ref.dtype)


_VMEM_PARAMS = dict(vmem_limit_bytes=64 * 1024 * 1024)


# Sequences flattened per grid step in the whole-layer kernel: [n*S, D]
# matmul tiles fill the MXU better than [S, D] at encode shapes (measured
# on v5e, see documentation/performance.md).  Falls back to 1 when the
# local batch doesn't divide.
LAYER_SEQS_PER_TILE = 2


def _layer_local(x, wqkv, bqkv, wo, bo, lns, lnb, w1, b1, w2, b2, ln2s,
                 ln2b, mask, num_heads: int, eps: float, act: str):
    B, S, D = x.shape
    I = w1.shape[1]
    head_dim = D // num_heads
    n = LAYER_SEQS_PER_TILE
    # activation scratch grows with n; keep qkv+h f32 tiles under ~12 MB
    while n > 1 and (B % n != 0
                     or n * S * (3 * D + I) * 4 > 12 * 1024 * 1024):
        n -= 1
    xspec = pl.BlockSpec((n, S, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(shape, lambda b: (0, 0),
                                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_layer_kernel, heads=num_heads, head_dim=head_dim,
                          scale=1.0 / math.sqrt(head_dim), eps=eps, act=act,
                          n_seqs=n),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid_spec=pl.GridSpec(
            grid=(B // n,),
            in_specs=[xspec,
                      const2((D, 3 * D)), const2((1, 3 * D)),
                      const2((D, D)), const2((1, D)),
                      const2((1, D)), const2((1, D)),
                      const2((D, I)), const2((1, I)),
                      const2((I, D)), const2((1, D)),
                      const2((1, D)), const2((1, D)),
                      pl.BlockSpec((n, 1, S), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=xspec,
        ),
        compiler_params=pltpu.CompilerParams(**_VMEM_PARAMS),
        cost_estimate=pl.CostEstimate(
            flops=(2 * B * S * D * (4 * D + 2 * I)
                   + 4 * B * num_heads * S * S * head_dim),
            transcendentals=B * num_heads * S * S + B * S * I,
            bytes_accessed=2 * B * S * D * 2,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, wqkv, bqkv[None, :], wo, bo[None, :], lns[None, :], lnb[None, :],
      w1, b1[None, :], w2, b2[None, :], ln2s[None, :], ln2b[None, :],
      mask.astype(jnp.int32)[:, None, :])


def _layer_prebias_local(x, qkv, bias, wo, bo, lns, lnb, w1, b1, w2, b2,
                         ln2s, ln2b, mask, num_heads: int, eps: float,
                         act: str, scale: float):
    B, S, D = x.shape
    H = num_heads
    I = w1.shape[1]
    head_dim = D // num_heads
    n = LAYER_SEQS_PER_TILE
    # per-tile streamed operands: x + qkv + bias blocks plus the f32
    # activation scratch — bias [H, S, S] dominates at long S
    while n > 1 and (B % n != 0
                     or n * (S * (3 * D + I) * 4 + H * S * S * 2)
                     > 12 * 1024 * 1024):
        n -= 1
    xspec = pl.BlockSpec((n, S, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(shape, lambda b: (0, 0),
                                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_layer_kernel_prebias, heads=num_heads,
                          head_dim=head_dim, scale=scale, eps=eps, act=act,
                          n_seqs=n),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid_spec=pl.GridSpec(
            grid=(B // n,),
            in_specs=[xspec,
                      pl.BlockSpec((n, S, 3 * D), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((n, H, S, S), lambda b: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      const2((D, D)), const2((1, D)),
                      const2((1, D)), const2((1, D)),
                      const2((D, I)), const2((1, I)),
                      const2((I, D)), const2((1, D)),
                      const2((1, D)), const2((1, D)),
                      pl.BlockSpec((n, 1, S), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=xspec,
        ),
        compiler_params=pltpu.CompilerParams(**_VMEM_PARAMS),
        cost_estimate=pl.CostEstimate(
            flops=(2 * B * S * D * (D + 2 * I)
                   + 4 * B * num_heads * S * S * head_dim),
            transcendentals=B * num_heads * S * S + B * S * I,
            bytes_accessed=B * S * (2 * D + 3 * D) * 2 + B * H * S * S * 2,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, qkv, bias, wo, bo[None, :], lns[None, :], lnb[None, :],
      w1, b1[None, :], w2, b2[None, :], ln2s[None, :], ln2b[None, :],
      mask.astype(jnp.int32)[:, None, :])


def _block_local(x, wqkv, bqkv, wo, bo, lns, lnb, mask,
                 num_heads: int, eps: float):
    B, S, D = x.shape
    head_dim = D // num_heads
    xspec = pl.BlockSpec((1, S, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(shape, lambda b: (0, 0),
                                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_block_kernel, heads=num_heads, head_dim=head_dim,
                          scale=1.0 / math.sqrt(head_dim), eps=eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=[xspec,
                      const2((D, 3 * D)), const2((1, 3 * D)),
                      const2((D, D)), const2((1, D)),
                      const2((1, D)), const2((1, D)),
                      pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=xspec,
        ),
        compiler_params=pltpu.CompilerParams(**_VMEM_PARAMS),
        cost_estimate=pl.CostEstimate(
            flops=(2 * B * S * D * 4 * D
                   + 4 * B * num_heads * S * S * head_dim),
            transcendentals=B * num_heads * S * S,
            bytes_accessed=2 * B * S * D * 2,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, wqkv, bqkv[None, :], wo, bo[None, :], lns[None, :], lnb[None, :],
      mask.astype(jnp.int32)[:, None, :])


def _shard_wrap(local, x, args, mask):
    """Run `local` under shard_map over the batch axis when a multi-device
    mesh is present and divides the batch; unwrapped otherwise."""
    n_dev = len(jax.devices())
    if n_dev > 1 and x.shape[0] % n_dev == 0:
        from bergen_tpu.parallel import get_mesh

        mesh = get_mesh()
        axes = tuple(mesh.axis_names)
        bspec = P(axes, None, None)
        wspecs = tuple(P(*([None] * a.ndim)) for a in args)
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(bspec, *wspecs, P(axes, None)),
            out_specs=bspec, check_vma=False,
        )
        return fn(x, *args, mask)
    return local(x, *args, mask)


def layer_act_supported(act: str, mlp_gated: bool) -> bool:
    return not mlp_gated and act in _KERNEL_ACTS


def layer_weights_fit(D: int, I: int, S: int = 0, itemsize: int = 2) -> bool:
    """Whole-layer kernel VMEM budget: resident weights plus the
    S-dependent fp32 activation scratch ([S, 3D] qkv, [S, I] FFN hidden,
    [S, S] score tile, [S, D] residual/LN intermediates and the bf16
    copies) must stay under the raised 64 MB scoped limit with headroom."""
    weights = (3 * D * D + D * D + 2 * D * I) * itemsize
    scratch = S * (3 * D + I + S + 4 * D) * 4 + S * (3 * D + I) * itemsize
    return weights + scratch <= MAX_LAYER_VMEM_BUDGET_BYTES


def encoder_layer(
    x: jnp.ndarray,
    attn_params,
    ln_params,
    mlp_in,
    mlp_out,
    ln2_params,
    mask: jnp.ndarray,
    num_heads: int,
    eps: float,
    act: str,
) -> jnp.ndarray:
    """One fully-fused post-LN transformer encoder layer.

    LN2(y + W2 act(W1 y));  y = LN(x + o_proj(attention(qkv_proj(x)))).
    x: [B, S, D]; attn_params: {"q"|"k"|"v"|"o": {"kernel", "bias"}};
    mlp_in/mlp_out: {"kernel", "bias"}; ln/ln2: {"scale", "bias"}.
    """
    wqkv = jnp.concatenate(
        [attn_params[n]["kernel"] for n in ("q", "k", "v")], axis=1)
    bqkv = jnp.concatenate(
        [attn_params[n]["bias"] for n in ("q", "k", "v")])
    args = (wqkv, bqkv, attn_params["o"]["kernel"], attn_params["o"]["bias"],
            ln_params["scale"], ln_params["bias"],
            mlp_in["kernel"], mlp_in["bias"],
            mlp_out["kernel"], mlp_out["bias"],
            ln2_params["scale"], ln2_params["bias"])
    local = functools.partial(_layer_local, num_heads=num_heads, eps=eps,
                              act=act)
    return _shard_wrap(local, x, args, mask)


def encoder_layer_prebias(
    x: jnp.ndarray,
    qkv: jnp.ndarray,
    attn_bias: jnp.ndarray,
    attn_o,
    ln_params,
    mlp_in,
    mlp_out,
    ln2_params,
    mask: jnp.ndarray,
    num_heads: int,
    eps: float,
    act: str,
    scale: float,
) -> jnp.ndarray:
    """Whole-layer fusion taking precomputed qkv + per-sequence score bias.

    x: [B, S, D]; qkv: [B, S, 3D] (projection outputs, bias already added);
    attn_bias: [B, H, S, S] additive pre-softmax scores (bf16 halves the
    per-tile DMA); attn_o/mlp_in/mlp_out: {"kernel", "bias"}.  Built for
    DeBERTa's disentangled attention (models/deberta.py), whose c2p/p2c
    terms depend on q/k content and so cannot be a VMEM-constant bias."""
    weights = (attn_o["kernel"], attn_o["bias"],
               ln_params["scale"], ln_params["bias"],
               mlp_in["kernel"], mlp_in["bias"],
               mlp_out["kernel"], mlp_out["bias"],
               ln2_params["scale"], ln2_params["bias"])
    local = functools.partial(_layer_prebias_local, num_heads=num_heads,
                              eps=eps, act=act, scale=scale)
    n_dev = len(jax.devices())
    if n_dev > 1 and x.shape[0] % n_dev == 0:
        from bergen_tpu.parallel import get_mesh

        mesh = get_mesh()
        axes = tuple(mesh.axis_names)
        bspec = P(axes, None, None)
        wspecs = tuple(P(*([None] * a.ndim)) for a in weights)
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(bspec, P(axes, None, None), P(axes, None, None, None),
                      *wspecs, P(axes, None)),
            out_specs=bspec, check_vma=False,
        )
        return fn(x, qkv, attn_bias, *weights, mask)
    return local(x, qkv, attn_bias, *weights, mask)


def layer_prebias_fit(D: int, I: int, H: int, S: int,
                      itemsize: int = 2) -> bool:
    """VMEM budget for the prebias whole-layer kernel: resident weights are
    smaller than the standard layer's (no qkv matrices) but the per-tile
    streamed operands add [S, 3D] qkv and the [H, S, S] bias block."""
    weights = (D * D + 2 * D * I) * itemsize
    scratch = (S * (3 * D + I + S + 4 * D) * 4          # f32 intermediates
               + S * (3 * D + I) * itemsize             # bf16 copies
               + H * S * S * itemsize                   # bias block
               + S * 3 * D * itemsize)                  # qkv operand block
    return weights + scratch <= MAX_LAYER_VMEM_BUDGET_BYTES


def attention_block(
    x: jnp.ndarray,
    attn_params,
    ln_params,
    mask: jnp.ndarray,
    num_heads: int,
    eps: float,
) -> jnp.ndarray:
    """Fused LayerNorm(x + o_proj(attention(qkv_proj(x)))) for one layer.

    x: [B, S, D]; attn_params: {"q"|"k"|"v"|"o": {"kernel", "bias"}} (the
    ``core.mha_init`` layout); ln_params: {"scale", "bias"}; mask: [B, S].
    """
    wqkv = jnp.concatenate(
        [attn_params[n]["kernel"] for n in ("q", "k", "v")], axis=1)
    bqkv = jnp.concatenate(
        [attn_params[n]["bias"] for n in ("q", "k", "v")])
    args = (wqkv, bqkv, attn_params["o"]["kernel"], attn_params["o"]["bias"],
            ln_params["scale"], ln_params["bias"])
    local = functools.partial(_block_local, num_heads=num_heads, eps=eps)
    return _shard_wrap(local, x, args, mask)


def encoder_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,
    num_heads: int,
    attn_bias: jnp.ndarray | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """Bidirectional (encoder) attention, whole sequence per VMEM tile.

    q, k, v: [B, S, D] in natural (projection-output) layout; mask: [B, S]
    (1 = attend, shared across heads); attn_bias: optional batch-invariant
    additive [H, S, S] scores bias (ALiBi slopes / T5 relative positions),
    replicated across the mesh; scale: score scale, default
    1/sqrt(head_dim) (T5 passes 1.0).  Returns [B, S, D] context in
    q.dtype.
    """
    n_dev = len(jax.devices())
    local = functools.partial(_attn_local, num_heads=num_heads, scale=scale)
    extra = () if attn_bias is None else (attn_bias,)
    if n_dev > 1 and q.shape[0] % n_dev == 0:
        # partition the embarrassingly-parallel batch grid over the mesh;
        # matches the batch sharding convention of dense.py / crossencoder.py
        # (P(("data", "model"), ...)); replicated inputs are sliced by XLA
        from bergen_tpu.parallel import get_mesh

        mesh = get_mesh()
        axes = tuple(mesh.axis_names)
        bspec = P(axes, None, None)
        bias_specs = () if attn_bias is None else (P(None, None, None),)
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(bspec, bspec, bspec, P(axes, None), *bias_specs),
            out_specs=bspec, check_vma=False,
        )
        return fn(q, k, v, mask, *extra)
    return local(q, k, v, mask, *extra)
