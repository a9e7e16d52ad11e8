"""Shared transformer building blocks — pure-JAX, functional, jittable.

Design stance (TPU-first, SURVEY.md §7): models are *data* (parameter pytrees of
``jnp`` arrays) plus *pure functions* (``apply``-style forwards). No module
classes, no tracing magic — every forward is an ordinary JAX function that can
be ``jit``-ed, ``pjit``-sharded over a mesh, differentiated, or wrapped in
``shard_map``. All matmuls route through the MXU via einsum/dot_general in
bfloat16 with fp32 accumulation (``preferred_element_type``).

These blocks replace the reference's HF torch module forwards (e.g.
``models/retrievers/dense.py:37-47``) — behaviourally equivalent, structurally
re-designed.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# --------------------------------------------------------------------------- #
# initializers (used for tests / training-from-scratch; production weights
# come from checkpoint conversion in models/convert.py)
# --------------------------------------------------------------------------- #


def dense_init(key, d_in: int, d_out: int, scale: float | None = None) -> Params:
    scale = scale if scale is not None else 1.0 / math.sqrt(d_in)
    return {
        "kernel": jax.random.normal(key, (d_in, d_out), jnp.float32) * scale,
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def layernorm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


# --------------------------------------------------------------------------- #
# primitive layers
# --------------------------------------------------------------------------- #


def dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ W + b with fp32 MXU accumulation."""
    y = jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(x.dtype)


def layernorm(p: Params, x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """LayerNorm in fp32 regardless of activation dtype (bf16-safe)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def rmsnorm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return (y * p["scale"]).astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    # exact (erf) gelu — matches HF BERT's default "gelu"
    return jax.nn.gelu(x, approximate=False)


ACT_FNS = {
    "gelu": gelu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}


# --------------------------------------------------------------------------- #
# attention
# --------------------------------------------------------------------------- #


# Encoder fused-attention switch: None = auto (whole-sequence-in-VMEM Pallas
# kernel on TPU for 128 <= S <= 1024 with a plain [B, S] mask), True/False
# force.  The streaming flash kernel (ops/flash_attention.py) measured ~2x
# SLOWER than XLA at encoder sizes (1213 vs 2343 docs/s on v5e B256/S192);
# the short-seq kernel (ops/encoder_attention.py) keeps the [S, S] scores
# VMEM-resident in natural [B, S, D] layout and measures 2.11 vs 4.31 ms
# per (projections + attention) layer vs XLA (see its module docstring).
USE_FLASH_ENCODER: bool | None = None


def _encoder_fused(B: int, S: int, num_heads: int, head_dim: int,
                   mask_ndim: int, has_bias: bool = False) -> bool:
    from bergen_tpu.ops import encoder_attention as ea

    on_tpu = jax.default_backend() == "tpu"
    if USE_FLASH_ENCODER is not None:
        return USE_FLASH_ENCODER and ea.supported(
            B, S, num_heads, head_dim, mask_ndim, True, has_bias)
    return ea.supported(B, S, num_heads, head_dim, mask_ndim, on_tpu,
                        has_bias)


def rope_rotate(x: jnp.ndarray, inv_freq: jnp.ndarray) -> jnp.ndarray:
    """Split-half (GPT-NeoX / llama style) rotary embedding over absolute
    positions 0..S-1.  x: [B, S, H, Dh]."""
    S = x.shape[1]
    angles = jnp.arange(S, dtype=jnp.float32)[:, None] * inv_freq  # [S, Dh/2]
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = jnp.split(xf, 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def mha(
    p: Params,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    num_heads: int,
    *,
    kv: jnp.ndarray | None = None,
    rope_inv_freq: jnp.ndarray | None = None,  # rope-BERT (GTE/nomic)
    attn_bias: jnp.ndarray | None = None,      # additive [H, Sq, Sk] (ALiBi)
) -> jnp.ndarray:
    """Bidirectional multi-head attention (encoder style).

    x: [B, S, D]; mask: [B, S] (1 = attend) or [B, 1, Sq, Sk] additive-ready
    bool.  Scores accumulate in fp32; softmax in fp32.  On TPU the fused
    flash kernel avoids materialising the [B, H, S, S] score tensor in HBM."""
    B, S, D = x.shape
    kv = x if kv is None else kv
    head_dim = D // num_heads

    q = dense(p["q"], x).reshape(B, S, num_heads, head_dim)
    k = dense(p["k"], kv).reshape(B, kv.shape[1], num_heads, head_dim)
    v = dense(p["v"], kv).reshape(B, kv.shape[1], num_heads, head_dim)
    if rope_inv_freq is not None:
        q = rope_rotate(q, rope_inv_freq)
        k = rope_rotate(k, rope_inv_freq)

    if (_encoder_fused(B, S, num_heads, head_dim, mask.ndim,
                       has_bias=attn_bias is not None)
            and kv.shape[1] == S):
        from bergen_tpu.ops.encoder_attention import encoder_attention

        # the kernel wants natural [B, S, D] layout (head reshape is a free
        # contiguous collapse; see the kernel docstring for why layout
        # matters here); batch-invariant [H, S, S] biases (ALiBi) ride VMEM
        ctx = encoder_attention(
            q.reshape(B, S, D), k.reshape(B, S, D), v.reshape(B, S, D),
            mask, num_heads, attn_bias=attn_bias,
        )
        return dense(p["o"], ctx)

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(head_dim)
    if attn_bias is not None:
        scores = scores + attn_bias[None]
    if mask.ndim == 2:
        bias = jnp.where(mask[:, None, None, :], 0.0, -1e30).astype(jnp.float32)
    else:
        bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
    probs = jax.nn.softmax(scores + bias, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
    ctx = ctx.astype(x.dtype).reshape(B, S, D)
    return dense(p["o"], ctx)


def mha_init(key, d_model: int) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "q": dense_init(ks[0], d_model, d_model),
        "k": dense_init(ks[1], d_model, d_model),
        "v": dense_init(ks[2], d_model, d_model),
        "o": dense_init(ks[3], d_model, d_model),
    }


# --------------------------------------------------------------------------- #
# batching helpers (static shapes under XLA)
# --------------------------------------------------------------------------- #


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def length_bucket(length: int, buckets: tuple[int, ...]) -> int:
    """Smallest bucket >= length (last bucket if none fits). Bucketing keeps the
    number of distinct jit shapes small where torch pads 'longest' dynamically
    (reference dense.py:57)."""
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


def make_buckets(max_len: int, min_len: int = 32) -> tuple[int, ...]:
    out = []
    b = min_len
    while b < max_len:
        out.append(b)
        b *= 2
    out.append(max_len)
    return tuple(out)
