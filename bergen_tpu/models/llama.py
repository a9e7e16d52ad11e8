"""Llama-family decoder (pure JAX) — the generator engine.

Covers TinyLlama / Llama-2 / Mistral / SOLAR (all HF ``LlamaForCausalLM``-layout
models the reference drives through torch+flash-attn or vLLM —
``models/generators/llm.py``, ``vllm.py``).  TPU-first design:

* functional forward over a params pytree; bf16 weights/activations, fp32
  logits/softmax;
* RoPE, GQA (num_kv_heads < num_heads), RMSNorm, SwiGLU;
* a **static-shape KV cache** pytree `[B, max_len, kv_heads, head_dim]` with an
  explicit write cursor, so prefill and the per-token decode step are each a
  single jitted XLA program (no dynamic shapes, no Python in the loop —
  `lax.scan`/`while_loop` drive decoding);
* tensor-parallel PartitionSpecs over the mesh ``model`` axis (heads for
  attention, ffn dim for the MLP), replacing vLLM's NCCL TP
  (reference vllm.py:48-59).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from bergen_tpu.models.core import rmsnorm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    intermediate_size: int
    max_position_embeddings: int = 4096
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = False
    # gemma-family deltas (silu/False/0.0/None reproduce llama exactly)
    hidden_act: str = "silu"
    embed_scale: bool = False            # x *= sqrt(hidden) after embedding
    norm_offset: float = 0.0             # rmsnorm uses (weight + offset)
    head_dim_override: int | None = None
    # gemma-2 deltas (0/None disable — reference drives gemma-2-9b-it through
    # config/generator/gemma-2-9b-it.yaml)
    attn_logit_softcap: float = 0.0      # cap*tanh(s/cap) on attention scores
    final_logit_softcap: float = 0.0     # cap*tanh(l/cap) on lm logits
    query_pre_attn_scalar: float | None = None  # replaces 1/sqrt(head_dim)
    sliding_window: int = 0              # even layers attend locally if > 0
    post_norms: bool = False             # sandwich norms around attn/mlp
    # cohere/command-r deltas (reference config/generator/command-r-35b.yaml)
    parallel_block: bool = False         # x + attn(ln(x)) + mlp(ln(x))
    use_layernorm: bool = False          # mean-centered LN (no bias) not RMS
    logit_scale: float = 0.0             # multiply lm logits (0 = off)
    rope_interleaved: bool = False       # cohere pairs (even, odd) dims
    # mixtral-family MoE (0 experts = dense llama MLP)
    num_experts: int = 0
    num_experts_per_tok: int = 2
    # rope scaling (llama-3.x band interpolation / linear position scaling;
    # reference routes rope-scaled checkpoints like Llama-3.2-3B-Instruct
    # through HF which applies hf_cfg.rope_scaling automatically)
    rope_scaling_type: str | None = None  # None | "llama3" | "linear"
    rope_scaling_factor: float = 1.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_pos: int = 8192

    @property
    def head_dim(self) -> int:
        if self.head_dim_override is not None:
            return self.head_dim_override
        return self.hidden_size // self.num_heads

    @classmethod
    def from_hf(cls, hf_cfg) -> "LlamaConfig":
        is_gemma = getattr(hf_cfg, "model_type", "") in ("gemma", "gemma2")
        act = getattr(hf_cfg, "hidden_act", None) or getattr(
            hf_cfg, "hidden_activation", None
        ) or "silu"
        rs = getattr(hf_cfg, "rope_scaling", None) or {}
        rs_type = rs.get("rope_type", rs.get("type", None))
        if rs_type in (None, "default"):
            rs_type = None
        elif rs_type not in ("llama3", "linear"):
            raise NotImplementedError(
                f"rope_scaling type {rs_type!r} is not implemented; supported: "
                "llama3 (band interpolation), linear"
            )
        return cls(
            vocab_size=hf_cfg.vocab_size,
            hidden_size=hf_cfg.hidden_size,
            num_layers=hf_cfg.num_hidden_layers,
            num_heads=hf_cfg.num_attention_heads,
            num_kv_heads=getattr(hf_cfg, "num_key_value_heads", None)
            or hf_cfg.num_attention_heads,
            intermediate_size=hf_cfg.intermediate_size,
            max_position_embeddings=hf_cfg.max_position_embeddings,
            rope_theta=getattr(hf_cfg, "rope_theta", 10000.0),
            rms_norm_eps=getattr(hf_cfg, "rms_norm_eps", None)
            or getattr(hf_cfg, "layer_norm_eps", 1e-5),
            tie_word_embeddings=getattr(hf_cfg, "tie_word_embeddings", False),
            hidden_act=act,
            embed_scale=is_gemma,
            norm_offset=1.0 if is_gemma else 0.0,
            head_dim_override=getattr(hf_cfg, "head_dim", None)
            if is_gemma
            else None,
            attn_logit_softcap=getattr(hf_cfg, "attn_logit_softcapping", None) or 0.0,
            final_logit_softcap=getattr(hf_cfg, "final_logit_softcapping", None) or 0.0,
            query_pre_attn_scalar=getattr(hf_cfg, "query_pre_attn_scalar", None)
            if getattr(hf_cfg, "model_type", "") == "gemma2" else None,
            sliding_window=(getattr(hf_cfg, "sliding_window", None) or 0)
            if getattr(hf_cfg, "model_type", "") == "gemma2" else 0,
            post_norms=getattr(hf_cfg, "model_type", "") == "gemma2",
            parallel_block=getattr(hf_cfg, "model_type", "") == "cohere",
            use_layernorm=getattr(hf_cfg, "model_type", "") == "cohere",
            logit_scale=getattr(hf_cfg, "logit_scale", None) or 0.0,
            rope_interleaved=getattr(hf_cfg, "model_type", "") == "cohere",
            num_experts=getattr(hf_cfg, "num_local_experts", 0) or 0,
            num_experts_per_tok=getattr(hf_cfg, "num_experts_per_tok", 2),
            rope_scaling_type=rs_type,
            rope_scaling_factor=float(rs.get("factor", 1.0)),
            rope_low_freq_factor=float(rs.get("low_freq_factor", 1.0)),
            rope_high_freq_factor=float(rs.get("high_freq_factor", 4.0)),
            rope_original_max_pos=int(
                rs.get("original_max_position_embeddings", 8192)
            ),
        )


# --------------------------------------------------------------------------- #
# init (tests / dry-runs; production weights come from convert.llama_from_hf)
# --------------------------------------------------------------------------- #


def init(key, cfg: LlamaConfig) -> Params:
    def dense_w(k, d_in, d_out):
        return {"kernel": jax.random.normal(k, (d_in, d_out), jnp.float32)
                / math.sqrt(d_in)}

    D, KV = cfg.hidden_size, cfg.num_kv_heads * cfg.head_dim
    keys = jax.random.split(key, cfg.num_layers + 3)
    p: Params = {
        "embed": jax.random.normal(keys[0], (cfg.vocab_size, D), jnp.float32) * 0.02,
        "final_norm": {"scale": jnp.ones((D,), jnp.float32)},
        "layers": [],
    }
    QD = cfg.num_heads * cfg.head_dim
    for i in range(cfg.num_layers):
        ks = jax.random.split(keys[i + 1], 7)
        entry = {
            "attn": {
                "q": dense_w(ks[0], D, QD),
                "k": dense_w(ks[1], D, KV),
                "v": dense_w(ks[2], D, KV),
                "o": dense_w(ks[3], QD, D),
            },
            "attn_norm": {"scale": jnp.ones((D,), jnp.float32)},
            "mlp": {
                "gate": dense_w(ks[4], D, cfg.intermediate_size),
                "up": dense_w(ks[5], D, cfg.intermediate_size),
                "down": dense_w(ks[6], cfg.intermediate_size, D),
            },
            "mlp_norm": {"scale": jnp.ones((D,), jnp.float32)},
        }
        if cfg.post_norms:
            entry["post_attn_norm"] = {"scale": jnp.ones((D,), jnp.float32)}
            entry["post_mlp_norm"] = {"scale": jnp.ones((D,), jnp.float32)}
        p["layers"].append(entry)
    if not cfg.tie_word_embeddings:
        p["lm_head"] = dense_w(keys[-1], D, cfg.vocab_size)
    return p


# --------------------------------------------------------------------------- #
# RoPE
# --------------------------------------------------------------------------- #


def rope_frequencies(cfg: LlamaConfig) -> jnp.ndarray:
    dim = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    if cfg.rope_scaling_type == "linear":
        inv = inv / cfg.rope_scaling_factor
    elif cfg.rope_scaling_type == "llama3":
        # llama-3.1/3.2 band interpolation: long wavelengths (low freqs) are
        # scaled down by `factor`, short ones kept, and the band between
        # high/low_freq_factor is smoothly interpolated
        low_wl = cfg.rope_original_max_pos / cfg.rope_low_freq_factor
        high_wl = cfg.rope_original_max_pos / cfg.rope_high_freq_factor
        wavelen = 2.0 * math.pi / inv
        scaled = inv / cfg.rope_scaling_factor
        smooth = (cfg.rope_original_max_pos / wavelen - cfg.rope_low_freq_factor) / (
            cfg.rope_high_freq_factor - cfg.rope_low_freq_factor
        )
        mid = (1.0 - smooth) * scaled + smooth * inv
        inv = jnp.where(
            wavelen < high_wl, inv, jnp.where(wavelen > low_wl, scaled, mid)
        )
    return inv  # [dim/2]


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, inv_freq: jnp.ndarray,
               interleaved: bool = False):
    """x: [B, S, H, Dh]; positions: [B, S]. Default is HF llama's split-half
    convention (rotate_half over two contiguous halves); ``interleaved=True``
    is cohere's pairing of (even, odd) dims."""
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [B, S, Dh/2]
    cos = jnp.cos(angles)[:, :, None, :]  # [B, S, 1, Dh/2]
    sin = jnp.sin(angles)[:, :, None, :]
    xf = x.astype(jnp.float32)
    if interleaved:
        x1, x2 = xf[..., ::2], xf[..., 1::2]
        out = jnp.stack(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        ).reshape(x.shape)
    else:
        x1, x2 = jnp.split(xf, 2, axis=-1)
        out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


# --------------------------------------------------------------------------- #
# KV cache
# --------------------------------------------------------------------------- #


def init_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
               flat: bool | None = None):
    """``flat=None`` auto-picks the layout: the kernel-native FLAT
    ``[.., L, KH*Dh]`` when the decode-attention kernel will serve this
    config's decode steps (ops.decode_attention.flat_cache_ok), else the
    4-D layout (whose XLA HBM arrangement is L-minor — right for the
    einsum paths, a transpose away from the kernel's)."""
    if flat is None:
        from bergen_tpu.ops.decode_attention import flat_cache_ok

        flat = flat_cache_ok(cfg, max_len)
    kv_shape = (
        (cfg.num_layers, batch, max_len, cfg.num_kv_heads * cfg.head_dim)
        if flat else
        (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim))
    return {
        "k": jnp.zeros(kv_shape, dtype),
        "v": jnp.zeros(kv_shape, dtype),
        "cursor": jnp.zeros((), jnp.int32),
    }


def cache_shardings(model_axis: str = "model"):
    """KV heads shard over the TP axis alongside the attention heads."""
    return {
        "k": P(None, None, None, model_axis, None),
        "v": P(None, None, None, model_axis, None),
        "cursor": P(),
    }


def init_paged_cache(cfg: LlamaConfig, n_pages: int, slots: int,
                     max_pages: int, dtype=jnp.bfloat16):
    """Paged decode cache (serve/engine paged mode): a shared pool of
    128-token pages plus a per-slot partial-page tail — HBM held is
    proportional to ACTUAL sequence lengths, not ``slots x max_len``
    (vLLM's paged KV idea, ops/paged_attention.py)."""
    from bergen_tpu.ops.paged_attention import PAGE

    kh, dh, L = cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
    return {
        "k_pool": jnp.zeros((L, n_pages, kh, PAGE, dh), dtype),
        "v_pool": jnp.zeros((L, n_pages, kh, PAGE, dh), dtype),
        "k_tail": jnp.zeros((L, slots, kh, PAGE, dh), dtype),
        "v_tail": jnp.zeros((L, slots, kh, PAGE, dh), dtype),
        "tables": jnp.zeros((slots, max_pages), jnp.int32),
        "lengths": jnp.zeros((slots,), jnp.int32),
        "starts": jnp.zeros((slots,), jnp.int32),
    }


# --------------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------------- #


# Packed-int4 weight-streaming kernel switch: None = auto (Pallas kernel on
# TPU, XLA dequant elsewhere); True/False force.  INT4_KERNEL_INTERPRET runs
# the kernel in Pallas interpret mode (CPU tests).
USE_INT4_KERNEL: bool | None = None
INT4_KERNEL_INTERPRET: bool = False


def _int4_kernel_enabled() -> bool:
    if USE_INT4_KERNEL is not None:
        return USE_INT4_KERNEL
    return jax.default_backend() == "tpu"


def _proj(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "kernel_scale_a8" in p:
        # W8A8 (convert.quantize_tree_int8(mxu=True)): per-row int8
        # activations x per-column int8 weights as a native MXU int8 dot.
        # Weights stay int8 in HBM — the weight-only path below dequantizes
        # at trace time and XLA hoists the bf16 weights out of the decode
        # scan, so only this path halves decode's weight-read bytes.
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
        xq = jnp.round(xf / sx).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, p["kernel_q"], (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * sx * p["kernel_scale_a8"]
        if "bias" in p:
            y = y + p["bias"]
        return y.astype(x.dtype)
    if "kernel_q" in p:  # int8 weight-only path (convert.quantize_tree_int8)
        w = p["kernel_q"].astype(x.dtype) * p["kernel_scale"].astype(x.dtype)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return y.astype(x.dtype)
    if "kernel_q4" in p or "kernel_q4p" in p:
        # int4 weight-only (convert.quantize_tree_int4; _q4p = hand-packed
        # nibbles for platforms whose jit can't take S4 args)
        if "kernel_q4p" in p and _int4_kernel_enabled():
            # weight-streaming Pallas matmul: nibbles unpack in VMEM, so
            # decode reads the PACKED bytes from HBM (the XLA path below
            # materializes the dequantized bf16 matrix in HBM every step —
            # measured 1,476 vs 8,383 tok/s at TinyLlama dims)
            from bergen_tpu.ops import int4_matmul

            wp, sc = p["kernel_q4p"], p["kernel_scale4"]
            K, N = wp.shape[0] * 2, wp.shape[1]
            if int4_matmul.supports(K, N, sc.shape[0]):
                x2 = x.reshape(-1, K)
                y = int4_matmul.matmul_int4_packed(
                    x2, wp, sc, interpret=INT4_KERNEL_INTERPRET
                ).reshape(*x.shape[:-1], N)
                return y.astype(x.dtype)
        from bergen_tpu.models import convert as _cv

        q4 = (p["kernel_q4"] if "kernel_q4" in p
              else _cv.unpack_int4(p["kernel_q4p"]))
        w = _cv.dequantize_int4(q4, p["kernel_scale4"], x.dtype)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return y.astype(x.dtype)
    y = jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32)
    if "lora_a" in p:  # LoRA adapter path (train/lora.py): y += x@A@B * scale
        y = y + jnp.dot(
            jnp.dot(x, p["lora_a"].astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype),
            p["lora_b"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        ) * p["lora_scale"]
    if "bias" in p:  # qwen2-style qkv biases
        y = y + p["bias"]
    return y.astype(x.dtype)


def _qkv(layer: Params, cfg: LlamaConfig, x: jnp.ndarray,
         positions: jnp.ndarray, inv_freq: jnp.ndarray):
    """Shared q/k/v projection + RoPE (standard and paged attention)."""
    B, S, _ = x.shape
    H, KH, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = _proj(layer["attn"]["q"], x).reshape(B, S, H, Dh)
    k = _proj(layer["attn"]["k"], x).reshape(B, S, KH, Dh)
    v = _proj(layer["attn"]["v"], x).reshape(B, S, KH, Dh)
    q = apply_rope(q, positions, inv_freq, cfg.rope_interleaved)
    k = apply_rope(k, positions, inv_freq, cfg.rope_interleaved)
    return q, k, v


def _attention_paged(
    layer: Params,
    cfg: LlamaConfig,
    x: jnp.ndarray,          # [S_slots, 1, D] — one decode token per slot
    positions: jnp.ndarray,  # [S_slots, 1]
    inv_freq: jnp.ndarray,
    k_pools: jnp.ndarray,    # [L, NP, KH, PAGE, Dh] stacked page pools
    v_pools: jnp.ndarray,
    k_tails: jnp.ndarray,    # [L, S_slots, KH, PAGE, Dh] stacked tails
    v_tails: jnp.ndarray,
    li: int,
    tables: jnp.ndarray,     # [S_slots, maxP]
    lengths: jnp.ndarray,    # [S_slots] storage positions before this step
    starts: jnp.ndarray | None = None,  # [S_slots] leading bucket padding
    use_pallas: bool | None = None,  # None = auto; False forces the XLA
    # composition (required under tensor parallelism: GSPMD partitions the
    # XLA ops over the kv-head axis, but cannot partition a pallas_call)
):
    """Paged decode attention (ops/paged_attention.py): writes this token's
    K/V into the slot tail and attends over (full pages ∪ tail) in place.
    Page flush + lengths increment happen once per step in ``forward``."""
    from bergen_tpu.ops import paged_attention as _pa

    B = x.shape[0]
    H, Dh = cfg.num_heads, cfg.head_dim
    q, k, v = _qkv(layer, cfg, x, positions, inv_freq)
    scale = (
        cfg.query_pre_attn_scalar ** -0.5
        if cfg.query_pre_attn_scalar is not None
        else 1.0 / math.sqrt(Dh)
    )
    ctx, kt, vt = _pa.paged_decode_attention(
        q[:, 0], k[:, 0], v[:, 0], k_pools[li], v_pools[li],
        k_tails[li], v_tails[li], tables, lengths, scale, starts=starts,
        use_pallas=use_pallas,
    )
    k_tails = jax.lax.dynamic_update_slice(
        k_tails, kt[None].astype(k_tails.dtype), (li, 0, 0, 0, 0)
    )
    v_tails = jax.lax.dynamic_update_slice(
        v_tails, vt[None].astype(v_tails.dtype), (li, 0, 0, 0, 0)
    )
    out = _proj(layer["attn"]["o"], ctx.reshape(B, 1, H * Dh))
    return out, k_tails, v_tails


# Flash-attention prefill switch: None = auto (Pallas kernel on TPU, einsum
# elsewhere); True/False force. Decode steps (S=1) always use the einsum path.
USE_FLASH_PREFILL: bool | None = None


def _flash_enabled(S: int) -> bool:
    if S <= 1:
        return False
    if USE_FLASH_PREFILL is not None:
        return USE_FLASH_PREFILL
    # measured on v5e (TinyLlama dims, B32/S256): XLA's fused attention beats
    # the hand kernel (5680 vs 4795 tok/s) — keep the kernel opt-in; it
    # matters when the [S, S] score buffer itself becomes a memory problem
    return False


def _attention(
    layer: Params,
    cfg: LlamaConfig,
    x: jnp.ndarray,          # [B, S, D]
    positions: jnp.ndarray,  # [B, S]
    inv_freq: jnp.ndarray,
    k_all: jnp.ndarray,      # [n_layers, B, L, KH, Dh] stacked cache, or
    #                          FLAT [n_layers, B, L, KH*Dh] — the layout the
    #                          decode kernel consumes natively (XLA stores
    #                          the 4-D form L-minor, so reshaping at the
    #                          call site would physically transpose the
    #                          whole cache every step: measured 1.9 ms).
    #                          Flat is chosen by cache CREATORS via
    #                          ops.decode_attention.flat_cache_ok.
    v_all: jnp.ndarray,
    li: int,                 # this layer's cache row
    cursor: jnp.ndarray,     # scalar: write offset in cache
    attn_mask: jnp.ndarray,  # [B, S, L] boolean — may attend
    sliding: bool = False,   # gemma-2: this layer attends locally
    chunk: dict | None = None,  # fused chunked prefill: see `forward`
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    B, S, D = x.shape
    H, KH, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    flat = k_all.ndim == 4

    def _kv_write(buf, vals, b0, pos):
        """Write [Bw, Sw, KH, Dh] K/V rows at (li, b0, pos) in either
        cache layout (tiny reshape; never touches the big buffer)."""
        Bw, Sw = vals.shape[:2]
        if flat:
            return jax.lax.dynamic_update_slice(
                buf, vals.reshape(1, Bw, Sw, KH * Dh).astype(buf.dtype),
                (li, b0, pos, 0))
        return jax.lax.dynamic_update_slice(
            buf, vals[None].astype(buf.dtype), (li, b0, pos, 0, 0))

    q, k, v = _qkv(layer, cfg, x, positions, inv_freq)

    if chunk is not None:
        # Fused decode + chunked prefill (the serving drain's piggyback
        # step): the LAST chunk["n"] batch rows are prompt-chunk tokens of
        # up to P joining slots (P "staging pipes", chunk["per"] rows each —
        # one pipe at ~0.38 req/step could not refill 32 slots that drain
        # at ~0.47 req/step, so occupancy collapsed).  Chunk rows shared
        # every projection with the decode rows above (one weight read per
        # layer; decode is weight-HBM-bound, so the extra MXU rows are
        # nearly free), and split off here only for the cache write +
        # attention core.  Decode rows behave exactly as the plain path;
        # pipe p's rows write their K/V CONTIGUOUSLY into cache row
        # chunk["row"][p] at [chunk["pos"][p], +per) (one
        # dynamic_update_slice — all behind the drain's ring cursor, where
        # decode never writes again) and attend to that row under the
        # grown-window masks (staged prefix + intra-chunk causal).
        # Replaces the epoch drain's batched-prefill branches, whose
        # [A, Pb] forwards stalled every active slot's decode (reference
        # capability: vLLM models/generators/vllm.py:48-78).
        if S != 1 or cursor.ndim != 0:
            raise NotImplementedError(
                "chunked prefill fuses into S==1 scalar-cursor decode steps")
        if sliding and cfg.sliding_window:
            raise NotImplementedError(
                "chunked prefill not supported on sliding-window layers")
        Cn = chunk["n"]
        Cp = int(chunk.get("per", Cn))            # rows per staging pipe
        nP = Cn // Cp
        rows_p = jnp.atleast_1d(chunk["row"])     # [P] cache row per pipe
        pos_p = jnp.atleast_1d(chunk["pos"])      # [P] write base per pipe
        Bc = B - Cn                               # pool rows in the cache
        L = k_all.shape[2]
        # decode rows: aligned write at the shared ring cursor
        k_all = _kv_write(k_all, k[:Bc], 0, cursor)
        v_all = _kv_write(v_all, v[:Bc], 0, cursor)
        # chunk rows: contiguous region of each joining slot's row
        for p_i in range(nP):
            kc = k[Bc + p_i * Cp:Bc + (p_i + 1) * Cp, 0][None]
            vc = v[Bc + p_i * Cp:Bc + (p_i + 1) * Cp, 0][None]
            k_all = _kv_write(k_all, kc, rows_p[p_i], pos_p[p_i])
            v_all = _kv_write(v_all, vc, rows_p[p_i], pos_p[p_i])
        k_cache, v_cache = k_all[li], v_all[li]
        group = H // KH
        scale = (
            cfg.query_pre_attn_scalar ** -0.5
            if cfg.query_pre_attn_scalar is not None
            else 1.0 / math.sqrt(Dh)
        )

        def _soft(scores, mask):
            if cfg.attn_logit_softcap:
                cap = cfg.attn_logit_softcap
                scores = cap * jnp.tanh(scores / cap)
            bias = jnp.where(mask[:, None, None, :, :], 0.0, -1e30)
            return jax.nn.softmax(scores + bias, axis=-1).astype(x.dtype)

        # decode rows: each row vs its own cache row (as the plain path).
        # Same kernel/gate as the plain S==1 decode below: the einsum
        # composition batch-loops per row on TPU (see decode_attention).
        _fd = os.environ.get("BERGEN_TPU_FLASH_DECODE", "1")
        use_flash_dec = (
            flat
            and not cfg.attn_logit_softcap
            and cfg.query_pre_attn_scalar is None
            and _fd != "0"
            and (jax.default_backend() == "tpu" or _fd == "interpret")
        )
        if use_flash_dec:
            from bergen_tpu.ops.decode_attention import decode_attention

            ctx_d = decode_attention(
                q[:Bc, 0].reshape(Bc, H, Dh), k_cache, v_cache,
                attn_mask[:Bc, -1], kv_heads=KH, sm_scale=scale,
                interpret=_fd == "interpret",
            ).reshape(Bc, 1, KH, group, Dh)
        else:
            k4 = k_cache if not flat else k_cache.reshape(Bc, L, KH, Dh)
            v4 = v_cache if not flat else v_cache.reshape(Bc, L, KH, Dh)
            qd = q[:Bc].reshape(Bc, 1, KH, group, Dh)
            sd = jnp.einsum("bskgd,blkd->bkgsl", qd, k4,
                            preferred_element_type=jnp.float32) * scale
            pd = _soft(sd, attn_mask[:Bc])
            ctx_d = jnp.einsum("bkgsl,blkd->bskgd", pd, v4,
                               preferred_element_type=jnp.float32)
        # chunk rows: ALL vs the joining slot's cache row.  Three engines:
        #
        # * GROWN-WINDOW einsum (default when the caller supplies the
        #   staging offset "off"): a lax.switch over ceil((off+Cn)/128)
        #   picks the smallest 128-multiple key window covering the staged
        #   prefix + this chunk, sliced at the staging base.  The chunk's
        #   f32 score/prob HBM traffic scales with the ACTUAL prefix length
        #   instead of the static Pmax+Cn window (first chunk: 128 keys,
        #   not 640) — on-chip the static-window einsum's traffic measured
        #   1.9 ms of chunk-step cost at Cn=128, and the banded flash
        #   kernel built to replace it measured 1.9 ms SLOWER still
        #   (per-dispatch overhead x 22 layers: 7.93 vs 6.06 vs 4.14 ms
        #   plain-decode baseline).  All branch outputs are [Cn, H*Dh], so
        #   the switch never touches the cache carry (no copy hazard).
        # * banded flash kernel (opt-in via BERGEN_TPU_CHUNK_BAND=1): kept
        #   for A/B only — measured a net loss, see above.
        # * einsum fallback (CPU / softcap configs): queries ride the
        #   einsum's S axis under the caller's per-row attn_mask rows.
        import os as _os

        def _row_slice(cache, row_i, start, w):
            """[1, w, KH, Dh] window of one cache row in either layout
            (flat: small reshape of the w-window, not the cache)."""
            if flat:
                sl = jax.lax.dynamic_slice(
                    cache, (row_i, start, 0), (1, w, KH * Dh))
                return sl.reshape(1, w, KH, Dh)
            return jax.lax.dynamic_slice(
                cache, (row_i, start, 0, 0), (1, w, KH, Dh))

        use_band = (
            chunk.get("band") is not None
            and not cfg.attn_logit_softcap
            and cfg.query_pre_attn_scalar is None
            and jax.default_backend() == "tpu"
            and _os.environ.get("BERGEN_TPU_CHUNK_BAND") == "1"
        )
        use_grown = (
            not use_band
            and chunk.get("off") is not None
            and not cfg.attn_logit_softcap
            and cfg.query_pre_attn_scalar is None
        )
        if use_band:
            from bergen_tpu.ops.flash_attention import flash_attention_band

            if nP != 1:
                raise NotImplementedError(
                    "the banded-kernel A/B path supports one staging pipe")
            Wn = chunk["win"]
            k_win = _row_slice(k_cache, rows_p[0], chunk["win_start"],
                               Wn)[0]
            v_win = _row_slice(v_cache, rows_p[0], chunk["win_start"],
                               Wn)[0]
            ctx_c = [flash_attention_band(
                q[Bc:, 0], k_win, v_win, chunk["band"], sm_scale=scale
            ).astype(x.dtype).reshape(Cn, 1, H * Dh)]
        elif use_grown:
            WBLK = 128
            Wn = chunk["win"]               # static max window (128-mult)
            nb = max(1, Wn // WBLK)
            off_p = jnp.atleast_1d(chunk["off"])
            nv_p = jnp.atleast_1d(chunk["nv"])
            base_p = jnp.atleast_1d(chunk["win_start"])
            ci = jnp.arange(Cp)
            # ALL pipes ride ONE switch and ONE batched einsum pair
            # (round-5 on-chip diag: per-pipe switches made the second pipe
            # cost ~4.7 ms/step — 9.41 ms at P=2 vs 4.75 at P=1 — where the
            # attention math itself is ~0.7 ms; P separate switch/einsum
            # regions defeated XLA's scheduling).  The branch index is the
            # MAX over pipes' needs: a pipe with a smaller staged prefix
            # reads a larger window than it needs, masked off per row.
            # per-row visible-key counts relative to each staging base;
            # rows past nv clamp to the last valid row's bound (garbage
            # rows — outputs unused, but hi >= 1 keeps softmax finite)
            hi_rel = (off_p[:, None]
                      + jnp.minimum(ci[None, :],
                                    jnp.maximum(nv_p - 1, 0)[:, None])
                      + 1)                                   # [P, Cp]
            qcs = q[Bc:, 0].reshape(nP, Cp, KH, group, Dh)
            # window start aligns DOWN to the 128-block holding the
            # staging base, so the in-window offset d0 < WBLK is known
            # when picking the branch.  If a branch must clamp
            # (s0a > L - w), the extra shift still fits because
            # pf + off + Cp <= L - 1 implies d + off + Cp <= w - 1 at
            # s0 = L - w; a larger-than-needed w only shrinks/keeps d.
            d0_p = base_p % WBLK
            s0a_p = base_p - d0_p
            idx = jnp.clip(jnp.max(
                (d0_p + off_p + Cp + WBLK - 1) // WBLK - 1), 0, nb - 1)

            def _mk(j):
                w = (j + 1) * WBLK

                def br(_):
                    kws, vws, ms = [], [], []
                    for p_i in range(nP):
                        s0 = jnp.clip(
                            jnp.minimum(s0a_p[p_i], L - w), 0, None)
                        d = base_p[p_i] - s0
                        kws.append(_row_slice(k_cache, rows_p[p_i], s0, w))
                        vws.append(_row_slice(v_cache, rows_p[p_i], s0, w))
                        jj = jnp.arange(w)
                        ms.append((jj[None, :] >= d)
                                  & (jj[None, :] < d + hi_rel[p_i][:, None]))
                    kw = jnp.concatenate(kws, axis=0)        # [P, w, KH, Dh]
                    vw = jnp.concatenate(vws, axis=0)
                    m = jnp.stack(ms, axis=0)                # [P, Cp, w]
                    sc = jnp.einsum(
                        "pskgd,plkd->pkgsl", qcs, kw,
                        preferred_element_type=jnp.float32) * scale
                    pr = _soft(sc, m)
                    return jnp.einsum(
                        "pkgsl,plkd->pskgd", pr, vw,
                        preferred_element_type=jnp.float32,
                    ).astype(x.dtype).reshape(Cn, 1, H * Dh)

                return br

            ctx_c = [jax.lax.switch(idx, [_mk(j) for j in range(nb)], None)]
        else:
            ctx_c = []
            for p_i in range(nP):
                k_row = _row_slice(k_cache, rows_p[p_i], 0, L)
                v_row = _row_slice(v_cache, rows_p[p_i], 0, L)
                qc = q[Bc + p_i * Cp:Bc + (p_i + 1) * Cp, 0].reshape(
                    1, Cp, KH, group, Dh)
                sc_ = jnp.einsum("bskgd,blkd->bkgsl", qc, k_row,
                                 preferred_element_type=jnp.float32) * scale
                pc = _soft(
                    sc_,
                    attn_mask[Bc + p_i * Cp:Bc + (p_i + 1) * Cp, 0][None])
                ctx_c.append(jnp.einsum(
                    "bkgsl,blkd->bskgd", pc, v_row,
                    preferred_element_type=jnp.float32
                ).astype(x.dtype).reshape(Cp, 1, H * Dh))
        ctx = jnp.concatenate(
            [ctx_d.astype(x.dtype).reshape(Bc, 1, H * Dh)] + ctx_c, axis=0
        )
        return _proj(layer["attn"]["o"], ctx), k_all, v_all

    if cursor.ndim == 1:
        # per-row cursors (serving slot-pool decode: each slot is at its own
        # depth).  Only S==1 decode steps carry vector cursors.  Expressed
        # as a one-hot select + static-index slice write rather than a
        # scatter: XLA's TPU scatter runs ~90M updates/s, which cost ~2 ms
        # per decode step across the layers; the select fuses into one
        # sequential pass over the layer's cache slab.
        L = k_all.shape[2]
        if flat:
            sel = (jnp.arange(L)[None, :] == cursor[:, None])[:, :, None]
            kw = k[:, 0].reshape(B, 1, KH * Dh).astype(k_all.dtype)
            vw = v[:, 0].reshape(B, 1, KH * Dh).astype(v_all.dtype)
        else:
            sel = (jnp.arange(L)[None, :]
                   == cursor[:, None])[:, :, None, None]
            kw = k[:, 0][:, None].astype(k_all.dtype)
            vw = v[:, 0][:, None].astype(v_all.dtype)
        k_all = k_all.at[li].set(jnp.where(sel, kw, k_all[li]))
        v_all = v_all.at[li].set(
            jnp.where(sel, vw, v_all[li])
        )
    else:
        # write IN PLACE into the stacked cache (XLA aliases the donated
        # carry; per-layer slice+restack forced a full cache copy every
        # decode step)
        k_all = _kv_write(k_all, k, 0, cursor)
        v_all = _kv_write(v_all, v, 0, cursor)
    k_cache = k_all[li]
    v_cache = v_all[li]

    if sliding and cfg.sliding_window:
        # gemma-2 local attention: with left padding, slot distance equals
        # token distance for real-token pairs (pads are masked separately),
        # so the window constraint is slot-based: key slot j is visible to
        # query slot (cursor + s) iff (cursor + s) - j < window
        L = k_cache.shape[1]
        if cursor.ndim == 1:
            dist = cursor[:, None, None] - jnp.arange(L)[None, None, :]
            attn_mask = attn_mask & (dist < cfg.sliding_window)
        else:
            q_slots = cursor + jnp.arange(S)
            dist = q_slots[:, None] - jnp.arange(L)[None, :]  # [S, L]
            attn_mask = attn_mask & (dist < cfg.sliding_window)[None]

    # the flash kernel implements plain 1/sqrt(Dh)-scaled softmax attention:
    # skip it for sliding-window layers AND whenever softcapping or a custom
    # query scale is configured (gemma-2 global layers), matching serve/engine
    flash_compatible = (
        not (sliding and cfg.sliding_window)
        and not cfg.attn_logit_softcap
        and cfg.query_pre_attn_scalar is None
    )
    # S==1 decode: the einsum composition lowers to a batch loop of tiny
    # per-row matvecs on TPU (~3.3 us x rows x layers regardless of L —
    # measured 2.4 ms of a 4.14 ms serving decode step at pool=33/L=832);
    # the Pallas kernel streams each row's KV through VMEM, one scores dot
    # per row via block-diagonal q, one softmax per row (1.66-1.78 ms
    # measured, vs a 1.26 ms pure-DMA floor).  Engaged whenever the cache
    # creator chose the kernel-native FLAT layout (flat_cache_ok).
    # BERGEN_TPU_FLASH_DECODE: unset/"1" = on, "0" = off, "interpret" =
    # forced interpreter (CPU parity tests).
    _fd = os.environ.get("BERGEN_TPU_FLASH_DECODE", "1")
    if (
        S == 1
        and flat
        and flash_compatible
        and _fd != "0"
        and (jax.default_backend() == "tpu" or _fd == "interpret")
    ):
        from bergen_tpu.ops.decode_attention import decode_attention

        scale_d = 1.0 / math.sqrt(Dh)
        ctx = decode_attention(
            q[:, 0].reshape(B, H, Dh), k_cache, v_cache, attn_mask[:, -1],
            kv_heads=KH, sm_scale=scale_d, interpret=_fd == "interpret",
        )
        return (_proj(layer["attn"]["o"], ctx.reshape(B, 1, H * Dh)),
                k_all, v_all)

    if flat:
        # fallback consumers want the 4-D view (prefill flash / einsum);
        # on TPU this is a relayout copy — paid once per PREFILL call (the
        # kernel handles every decode step), amortized over the generation
        Lf = k_cache.shape[1]
        k_cache = k_cache.reshape(B, Lf, KH, Dh)
        v_cache = v_cache.reshape(B, Lf, KH, Dh)

    if _flash_enabled(S) and flash_compatible:
        # prefill (cursor==0): slot-causal + key-validity; the last query row
        # of attn_mask is exactly the key-validity vector
        from bergen_tpu.ops.flash_attention import flash_attention

        k_valid = attn_mask[:, -1, :].astype(jnp.float32)  # [B, L]
        ctx = flash_attention(
            q, k_cache, v_cache, k_valid, causal=True,
            interpret=jax.default_backend() != "tpu",
        )
        return _proj(layer["attn"]["o"], ctx.reshape(B, S, H * Dh)), k_all, v_all

    group = H // KH
    qg = q.reshape(B, S, KH, group, Dh)
    scale = (
        cfg.query_pre_attn_scalar ** -0.5
        if cfg.query_pre_attn_scalar is not None
        else 1.0 / math.sqrt(Dh)
    )
    scores = jnp.einsum(
        "bskgd,blkd->bkgsl", qg, k_cache, preferred_element_type=jnp.float32
    ) * scale
    if cfg.attn_logit_softcap:
        cap = cfg.attn_logit_softcap
        scores = cap * jnp.tanh(scores / cap)
    bias = jnp.where(attn_mask[:, None, None, :, :], 0.0, -1e30)
    probs = jax.nn.softmax(scores + bias, axis=-1).astype(x.dtype)
    ctx = jnp.einsum(
        "bkgsl,blkd->bskgd", probs, v_cache, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    ctx = ctx.reshape(B, S, H * Dh)
    return _proj(layer["attn"]["o"], ctx), k_all, v_all


_ACTS = {
    "silu": jax.nn.silu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
}


def _norm(p: Params, x: jnp.ndarray, cfg: LlamaConfig) -> jnp.ndarray:
    if cfg.use_layernorm:
        # cohere: mean-centered, bias-free LayerNorm computed in fp32
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + cfg.rms_norm_eps)
        return (y * p["scale"]).astype(x.dtype)
    if cfg.norm_offset:
        p = {"scale": p["scale"] + cfg.norm_offset}
    return rmsnorm(p, x, cfg.rms_norm_eps)


def _mlp(layer: Params, x: jnp.ndarray, act: str = "silu") -> jnp.ndarray:
    g = _ACTS[act](_proj(layer["mlp"]["gate"], x))
    u = _proj(layer["mlp"]["up"], x)
    return _proj(layer["mlp"]["down"], g * u)


def _moe(layer: Params, cfg: LlamaConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Mixtral sparse-MoE block, computed DENSE over stacked expert tensors
    [E, d_in, d_out] (every expert runs on every token, outputs weighted by the
    top-k-normalised router probs).  Exact w.r.t. the sparse formulation; at
    the supported scales the 4x FLOP overhead trades for a gather/scatter-free
    MXU-only schedule, and the stacked expert axis shards directly over the
    mesh ``model`` axis (expert parallelism) — token-dispatch kernels are a
    later optimisation."""
    B, S, D = x.shape
    moe = layer["moe"]
    logits = jnp.dot(x, moe["router"]["kernel"],
                     preferred_element_type=jnp.float32)  # [B, S, E]
    probs = jax.nn.softmax(logits, axis=-1)
    top_p, top_i = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    top_p = top_p / jnp.sum(top_p, axis=-1, keepdims=True)
    # dense per-token expert weights [B, S, E]: scatter normalised top-k probs
    weights = jnp.zeros_like(probs).at[
        jnp.arange(B)[:, None, None],
        jnp.arange(S)[None, :, None],
        top_i,
    ].set(top_p)
    g = _ACTS[cfg.hidden_act](
        jnp.einsum("bsd,edf->ebsf", x, moe["gate"]["kernel"],
                   preferred_element_type=jnp.float32).astype(x.dtype)
    )
    u = jnp.einsum("bsd,edf->ebsf", x, moe["up"]["kernel"],
                   preferred_element_type=jnp.float32).astype(x.dtype)
    h = jnp.einsum("ebsf,efd->ebsd", g * u, moe["down"]["kernel"],
                   preferred_element_type=jnp.float32).astype(x.dtype)
    out = jnp.einsum("ebsd,bse->bsd", h,
                     weights.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def _decoder_layer(layer: Params, x, k_all, v_all, positions, inv_freq,
                   cursor, attn_mask, *, cfg: LlamaConfig, li: int,
                   chunk: dict | None = None):
    """One decoder layer (slot-pool cache path) — extracted so training can
    wrap it in ``jax.checkpoint``: the backward pass then recomputes the
    layer's activations instead of keeping attention probs + FFN hiddens
    for every layer resident (the classic remat FLOPs-for-HBM trade; at
    TinyLlama dims it cuts training activation memory ~6x for ~30% extra
    forward FLOPs)."""
    h = _norm(layer["attn_norm"], x, cfg)
    a, k_all, v_all = _attention(
        layer, cfg, h, positions, inv_freq, k_all, v_all, li, cursor,
        attn_mask, sliding=cfg.post_norms and li % 2 == 0, chunk=chunk,
    )
    if cfg.parallel_block:
        return x + a + _mlp(layer, h, cfg.hidden_act), k_all, v_all
    if cfg.post_norms:
        a = _norm(layer["post_attn_norm"], a, cfg)
    x = x + a
    h = _norm(layer["mlp_norm"], x, cfg)
    m = _moe(layer, cfg, h) if "moe" in layer else _mlp(layer, h, cfg.hidden_act)
    if cfg.post_norms:
        m = _norm(layer["post_mlp_norm"], m, cfg)
    return x + m, k_all, v_all


def forward(
    params: Params,
    cfg: LlamaConfig,
    input_ids: jnp.ndarray,   # [B, S]
    positions: jnp.ndarray,   # [B, S]
    cache: Dict[str, jnp.ndarray],
    attn_mask: jnp.ndarray,   # [B, S, L] bool over cache slots
    input_embeds: jnp.ndarray | None = None,  # [B, S, D] overrides embedding
    collect_stats: bool = False,  # also return per-layer activation-outlier
    # ratios (absmax/rms per token, maxed) — the w8a8 calibration signal
    remat: bool = False,  # checkpoint each layer (training memory saver)
    paged_use_pallas: bool | None = None,  # paged cache only: None auto,
    # False = XLA composition (tensor-parallel serving)
    chunk: dict | None = None,  # fused chunked prefill (serving drain):
    # {"row": scalar cache row, "pos": scalar cache offset, "n": static int}
    # — the last n batch rows are prompt-chunk tokens of one joining slot;
    # they share every projection/MLP with the decode rows and split off
    # only inside _attention (cache write + attention core)
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One forward step (prefill: S=prompt_len; decode: S=1) writing K/V at
    cache cursor. Returns (logits [B, S, V] f32, updated cache) — plus a
    [2*n_layers] outlier-ratio vector when ``collect_stats``.
    ``input_embeds`` lets compression generators (COCOM memory tokens, xRAG
    embedding injection) feed soft prompts instead of token ids."""
    inv_freq = rope_frequencies(cfg)
    x = (
        input_embeds
        if input_embeds is not None
        else jnp.take(params["embed"], input_ids, axis=0)
    )
    if cfg.embed_scale:
        x = x * jnp.asarray(math.sqrt(cfg.hidden_size), x.dtype)
    paged = "k_pool" in cache
    if chunk is not None and paged:
        raise NotImplementedError("chunked prefill needs the slot-pool cache")
    if paged:
        # paged decode (init_paged_cache): one token per slot, attn_mask is
        # ignored — masking derives from per-slot lengths.  Families whose
        # attention is not plain scaled softmax need kernel support first.
        if x.shape[1] != 1:
            raise NotImplementedError("paged cache is decode-only (S == 1); "
                                      "prefill writes pages directly")
        if cfg.attn_logit_softcap or (cfg.post_norms and cfg.sliding_window):
            raise NotImplementedError(
                "paged attention does not yet support gemma-2 logit softcap "
                "/ sliding-window layers — use the slot-pool cache"
            )
        cursor = None
    else:
        cursor = cache["cursor"]

    def _outlier_ratio(h):
        # per-token absmax/rms, maxed over the batch: the signal-to-rounding
        # ratio of per-row int8 activation quantization.  Gaussian
        # activations sit near sqrt(2 ln D) (~4); LLM.int8-style emergent
        # outlier channels push it to 20-100.
        f = h.reshape(-1, h.shape[-1]).astype(jnp.float32)
        absmax = jnp.max(jnp.abs(f), axis=-1)
        rms = jnp.sqrt(jnp.mean(f * f, axis=-1) + 1e-12)
        return jnp.max(absmax / rms)

    stats = []
    if paged:
        k_all, v_all = cache["k_tail"], cache["v_tail"]  # mutated per layer
    else:
        k_all, v_all = cache["k"], cache["v"]
    if remat and not (paged or collect_stats):
        for li, layer in enumerate(params["layers"]):
            step = jax.checkpoint(
                functools.partial(_decoder_layer, cfg=cfg, li=li,
                                  chunk=chunk))
            x, k_all, v_all = step(layer, x, k_all, v_all, positions,
                                   inv_freq, cursor, attn_mask)
    else:
        for li, layer in enumerate(params["layers"]):
            h = _norm(layer["attn_norm"], x, cfg)
            if collect_stats:
                stats.append(_outlier_ratio(h))
            if paged:
                a, k_all, v_all = _attention_paged(
                    layer, cfg, h, positions, inv_freq, cache["k_pool"],
                    cache["v_pool"], k_all, v_all, li, cache["tables"],
                    cache["lengths"], starts=cache.get("starts"),
                    use_pallas=paged_use_pallas,
                )
            else:
                a, k_all, v_all = _attention(
                    layer, cfg, h, positions, inv_freq, k_all, v_all, li,
                    cursor, attn_mask,
                    # gemma-2 interleaves local/global attention: even layers
                    # sliding
                    sliding=cfg.post_norms and li % 2 == 0, chunk=chunk,
                )
            if cfg.parallel_block:
                # cohere: attention and MLP both read the same normed input,
                # both outputs join the residual (single norm per layer)
                x = x + a + _mlp(layer, h, cfg.hidden_act)
                continue
            if cfg.post_norms:  # gemma-2 sandwich: norm the sublayer OUTPUT
                a = _norm(layer["post_attn_norm"], a, cfg)
            x = x + a
            h = _norm(layer["mlp_norm"], x, cfg)
            if collect_stats:
                stats.append(_outlier_ratio(h))
            if "moe" in layer:
                m = _moe(layer, cfg, h)
            else:
                m = _mlp(layer, h, cfg.hidden_act)
            if cfg.post_norms:
                m = _norm(layer["post_mlp_norm"], m, cfg)
            x = x + m

    x = _norm(params["final_norm"], x, cfg)
    if chunk is not None and "last" in chunk:
        # fused chunked prefill: only the decode rows and each pipe's LAST
        # valid chunk token need logits (the other chunk rows exist to
        # stage K/V) — slice before the LM head so its matmul and the
        # [*, V] f32 logits buffer don't pay for chunk["n"] rows every
        # step.  Returns [Bc + P, S, V]: callers read pipe p's staged
        # first token at row Bc + p.
        Cn_ = chunk["n"]
        Cp_ = int(chunk.get("per", Cn_))
        Bc = x.shape[0] - Cn_
        last_p = jnp.atleast_1d(chunk["last"])
        parts = [x[:Bc]]
        for p_i in range(Cn_ // Cp_):
            parts.append(jax.lax.dynamic_slice(
                x, (Bc + p_i * Cp_ + last_p[p_i], 0, 0),
                (1, x.shape[1], x.shape[2])))
        x = jnp.concatenate(parts, axis=0)
    head = params.get("lm_head")
    if head is None:  # tied embeddings
        logits = jnp.dot(
            x, params["embed"].T.astype(x.dtype), preferred_element_type=jnp.float32
        )
    else:
        logits = _proj(head, x).astype(jnp.float32)
    if cfg.logit_scale:
        logits = logits * cfg.logit_scale
    if cfg.final_logit_softcap:
        cap = cfg.final_logit_softcap
        logits = cap * jnp.tanh(logits / cap)
    if paged:
        from bergen_tpu.ops.paged_attention import flush_full_pages

        # inactive slots do not advance (their tail write lands on the next
        # unused position and is overwritten on slot reuse — harmless)
        active = cache.get("active")
        step = 1 if active is None else active.astype(jnp.int32)
        lengths_after = cache["lengths"] + step
        k_pool, v_pool = flush_full_pages(
            cache["k_pool"], cache["v_pool"], k_all, v_all,
            cache["tables"], lengths_after, active=active,
        )
        new_cache = {
            "k_pool": k_pool, "v_pool": v_pool,
            "k_tail": k_all, "v_tail": v_all,
            "tables": cache["tables"], "lengths": lengths_after,
        }
        if "starts" in cache:
            new_cache["starts"] = cache["starts"]
        if active is not None:
            new_cache["active"] = active
    else:
        new_cache = {
            "k": k_all,
            "v": v_all,
            "cursor": cursor + (
                input_ids.shape[1] if input_embeds is None
                else input_embeds.shape[1]
            ),
        }
    if collect_stats:
        return logits, new_cache, jnp.stack(stats)
    return logits, new_cache


# --------------------------------------------------------------------------- #
# greedy generation (static shapes; scan-driven decode)
# --------------------------------------------------------------------------- #


def greedy_generate(
    params: Params,
    cfg: LlamaConfig,
    input_ids: jnp.ndarray,       # [B, S] LEFT-padded prompts
    attention_mask: jnp.ndarray,  # [B, S] 1=real token
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int,
    cache_dtype=jnp.bfloat16,
    input_embeds: jnp.ndarray | None = None,  # soft-prompt override [B, S, D]
) -> jnp.ndarray:
    """Batched greedy decoding (matches reference llm.py:134-148 semantics:
    do_sample=False, stop per-sample on EOS, left padding).  Prefill is one
    jitted call; decoding is a lax.scan of single-token steps over a
    preallocated cache — the whole generate is two XLA programs."""
    B, S = input_ids.shape
    L = S + max_new_tokens
    cache = init_cache(cfg, B, L, dtype=cache_dtype)

    # positions: left-padded → position = cumsum(mask) - 1 (pads get 0)
    positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)

    # prefill mask: causal over the prompt, excluding pads
    causal = jnp.tril(jnp.ones((S, S), bool))
    prefill_mask = jnp.zeros((B, S, L), bool)
    prefill_mask = prefill_mask.at[:, :, :S].set(
        causal[None] & attention_mask[:, None, :].astype(bool)
    )
    logits, cache = forward(params, cfg, input_ids, positions, cache,
                            prefill_mask, input_embeds=input_embeds)
    next_tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

    key_valid = jnp.concatenate(
        [attention_mask.astype(bool), jnp.zeros((B, max_new_tokens), bool)], axis=1
    )

    def step(carry, t):
        cache, tok, done, key_valid, pos = carry
        tok_in = jnp.where(done, pad_token_id, tok)
        key_valid = key_valid.at[:, S + t].set(True)
        mask = key_valid[:, None, :]  # [B, 1, L]
        logits, cache = forward(
            params, cfg, tok_in[:, None], pos[:, None], cache, mask
        )
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        out_tok = jnp.where(done, pad_token_id, tok)
        done = done | (tok == eos_token_id)
        return (cache, nxt, done, key_valid, pos + 1), out_tok

    done0 = jnp.zeros((B,), bool)
    pos0 = positions[:, -1] + 1
    (_, last_tok, done, _, _), toks = jax.lax.scan(
        step,
        (cache, next_tok, done0, key_valid, pos0),
        jnp.arange(max_new_tokens),
    )
    return jnp.swapaxes(toks, 0, 1)  # [B, max_new_tokens]


def sample_token(logits: jnp.ndarray, key: jnp.ndarray,
                 temperature: float, top_p: float = 1.0) -> jnp.ndarray:
    """[B, V] logits → [B] sampled token ids: temperature + nucleus (top-p)
    sampling, the reference's vLLM SamplingParams semantics
    (``models/generators/vllm.py:61-78``).  Shared by the static sampling
    decode and the serving engine's in-step sampler."""
    lg = logits.astype(jnp.float32) / max(temperature, 1e-6)
    if top_p < 1.0:
        # nucleus: mask tokens outside the smallest set with cum prob >= p
        sorted_lg = jnp.sort(lg, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_lg, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens whose logit >= cutoff of the nucleus boundary
        keep_n = jnp.sum(cum < top_p, axis=-1) + 1  # [B]
        cutoff = jnp.take_along_axis(
            sorted_lg, (keep_n - 1)[:, None], axis=-1
        )
        lg = jnp.where(lg >= cutoff, lg, -jnp.inf)
    return jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)


def sample_generate(
    params: Params,
    cfg: LlamaConfig,
    input_ids: jnp.ndarray,       # [B, S] LEFT-padded prompts
    attention_mask: jnp.ndarray,
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int,
    temperature: float = 1.0,
    top_p: float = 1.0,
    rng_key: jnp.ndarray | None = None,
    cache_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Temperature / nucleus sampling (reference vllm.py:61-78 SamplingParams
    temperature/top_p; temperature→0 degenerates to greedy_generate)."""
    B, S = input_ids.shape
    L = S + max_new_tokens
    cache = init_cache(cfg, B, L, dtype=cache_dtype)
    key = rng_key if rng_key is not None else jax.random.PRNGKey(0)

    positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
    causal = jnp.tril(jnp.ones((S, S), bool))
    prefill_mask = jnp.zeros((B, S, L), bool)
    prefill_mask = prefill_mask.at[:, :, :S].set(
        causal[None] & attention_mask[:, None, :].astype(bool)
    )
    logits, cache = forward(params, cfg, input_ids, positions, cache,
                            prefill_mask)

    def pick(key, logits):
        return sample_token(logits, key, temperature, top_p)

    key, k0 = jax.random.split(key)
    next_tok = pick(k0, logits[:, -1])
    key_valid = jnp.concatenate(
        [attention_mask.astype(bool), jnp.zeros((B, max_new_tokens), bool)],
        axis=1,
    )

    def step(carry, t):
        cache, tok, done, key_valid, pos, key = carry
        tok_in = jnp.where(done, pad_token_id, tok)
        key_valid = key_valid.at[:, S + t].set(True)
        mask = key_valid[:, None, :]
        logits, cache = forward(
            params, cfg, tok_in[:, None], pos[:, None], cache, mask
        )
        key, kt = jax.random.split(key)
        nxt = pick(kt, logits[:, -1])
        out_tok = jnp.where(done, pad_token_id, tok)
        done = done | (tok == eos_token_id)
        return (cache, nxt, done, key_valid, pos + 1, key), out_tok

    (_, _, _, _, _, _), toks = jax.lax.scan(
        step,
        (cache, next_tok, jnp.zeros((B,), bool), key_valid,
         positions[:, -1] + 1, key),
        jnp.arange(max_new_tokens),
    )
    return jnp.swapaxes(toks, 0, 1)


def beam_generate(
    params: Params,
    cfg: LlamaConfig,
    input_ids: jnp.ndarray,       # [B, S] LEFT-padded prompts
    attention_mask: jnp.ndarray,
    max_new_tokens: int,
    num_beams: int,
    eos_token_id: int,
    pad_token_id: int,
    length_penalty: float = 1.0,
    cache_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Batched beam search (reference vllm.py:61-78: use_beam_search=True,
    best_of=num_beams, temperature=0).  Static shapes throughout: prefill once
    at [B, S], tile the KV cache to B*W beams, then scan single-token steps —
    each step scores W*V continuations per batch, keeps the top W, and
    reorders the cache by the surviving beams' parent indices.  Finished
    beams are frozen (pad-continuation at unchanged score).  Returns the
    [B, max_new_tokens] tokens of the best beam by score / len**length_penalty."""
    B, S = input_ids.shape
    W = num_beams
    V = cfg.vocab_size
    L = S + max_new_tokens
    cache = init_cache(cfg, B, L, dtype=cache_dtype)

    positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
    causal = jnp.tril(jnp.ones((S, S), bool))
    prefill_mask = jnp.zeros((B, S, L), bool)
    prefill_mask = prefill_mask.at[:, :, :S].set(
        causal[None] & attention_mask[:, None, :].astype(bool)
    )
    logits, cache = forward(params, cfg, input_ids, positions, cache,
                            prefill_mask)

    # tile cache/masks to B*W (beams of one batch are contiguous)
    def tile(x):
        return jnp.repeat(x, W, axis=0)

    cache = {
        "k": jnp.repeat(cache["k"], W, axis=1),
        "v": jnp.repeat(cache["v"], W, axis=1),
        "cursor": cache["cursor"],
    }
    key_valid = tile(jnp.concatenate(
        [attention_mask.astype(bool), jnp.zeros((B, max_new_tokens), bool)],
        axis=1,
    ))  # [B*W, L]
    pos = tile(positions[:, -1:] + 1)[:, 0]  # [B*W]

    # first expansion: top-W tokens straight from the prefill distribution
    logp0 = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
    cum, tok = jax.lax.top_k(logp0, W)           # [B, W] scores / tokens
    seqs = jnp.full((B, W, max_new_tokens), pad_token_id, jnp.int32)
    seqs = seqs.at[:, :, 0].set(tok)
    finished = tok == eos_token_id               # [B, W]
    gen_len = jnp.ones((B, W), jnp.int32)

    batch_base = (jnp.arange(B) * W)[:, None]    # [B, 1]

    def step(carry, t):
        cache, seqs, cum, tok, finished, gen_len, key_valid, pos = carry
        tok_in = jnp.where(finished, pad_token_id, tok).reshape(B * W)
        key_valid = key_valid.at[:, S + t].set(True)
        logits, cache = forward(
            params, cfg, tok_in[:, None], pos[:, None], cache,
            key_valid[:, None, :],
        )
        logp = jax.nn.log_softmax(
            logits[:, -1].astype(jnp.float32), axis=-1
        ).reshape(B, W, V)
        # frozen beams may only continue with pad at unchanged score
        pad_only = jnp.full((V,), -jnp.inf).at[pad_token_id].set(0.0)
        logp = jnp.where(finished[:, :, None], pad_only[None, None, :], logp)
        cand = (cum[:, :, None] + logp).reshape(B, W * V)
        new_cum, flat = jax.lax.top_k(cand, W)   # [B, W]
        parent = flat // V                       # [B, W] surviving beam idx
        new_tok = (flat % V).astype(jnp.int32)

        # reorder per-beam state by parent
        gidx = (batch_base + parent).reshape(-1)  # [B*W] global beam rows
        cache = {
            "k": cache["k"][:, gidx],
            "v": cache["v"][:, gidx],
            "cursor": cache["cursor"],
        }
        key_valid = key_valid[gidx]
        seqs = jnp.take_along_axis(seqs, parent[:, :, None], axis=1)
        finished = jnp.take_along_axis(finished, parent, axis=1)
        gen_len = jnp.take_along_axis(gen_len, parent, axis=1)

        write_tok = jnp.where(finished, pad_token_id, new_tok)
        seqs = jax.lax.dynamic_update_slice_in_dim(
            seqs, write_tok[:, :, None], t + 1, axis=2
        )
        gen_len = gen_len + (~finished).astype(jnp.int32)
        finished = finished | (new_tok == eos_token_id)
        return (cache, seqs, new_cum, new_tok, finished, gen_len,
                key_valid, pos + 1), None

    carry = (cache, seqs, cum, tok, finished, gen_len, key_valid, pos)
    if max_new_tokens > 1:
        carry, _ = jax.lax.scan(step, carry, jnp.arange(max_new_tokens - 1))
    _, seqs, cum, _, finished, gen_len, _, _ = carry

    norm = cum / (gen_len.astype(jnp.float32) ** length_penalty)
    best = jnp.argmax(norm, axis=1)  # [B]
    return jnp.take_along_axis(seqs, best[:, None, None], axis=1)[:, 0]


# --------------------------------------------------------------------------- #
# tensor-parallel shardings
# --------------------------------------------------------------------------- #


def _linear_specs(node: Params, spec2d: P) -> Params:
    """Specs for one linear node MIRRORING its actual keys — plain
    ('kernel'), int8/w8a8 ('kernel_q' + scales), packed int4
    ('kernel_q4p'/'kernel_q4' + group scales), LoRA adapters, biases —
    so TP placement works on quantized trees too (int4+TP used to crash
    at placement with a tree-structure mismatch)."""
    row_axis, col_axis = spec2d  # (d_in sharding, d_out sharding)
    out: Params = {}
    for key in node:
        if key in ("kernel", "kernel_q", "kernel_q4", "kernel_q4p"):
            # kernel_q4p halves d_in (two nibbles/byte) — same axes apply
            out[key] = spec2d
        elif key in ("kernel_scale", "kernel_scale_a8"):
            out[key] = P(col_axis)  # per-output-column scales [d_out]
        elif key == "kernel_scale4":
            out[key] = P(row_axis, col_axis)  # [n_groups, d_out]
        elif key == "bias":
            out[key] = P(col_axis)
        elif key == "lora_a":
            out[key] = P(row_axis, None)  # [d_in, r]
        elif key == "lora_b":
            out[key] = P(None, col_axis)  # [r, d_out]
        else:  # lora_scale and friends: replicate
            out[key] = P()
    return out


def param_shardings(params: Params, model_axis: str = "model") -> Params:
    """PartitionSpec tree for TP over `model_axis`: attention heads and FFN
    width sharded; per-token collectives inserted by XLA at o_proj/down_proj.
    Mirrors the params tree exactly (including quantized / LoRA leaves)."""
    out: Params = {
        "embed": P(),
        "final_norm": {"scale": P()},
        "layers": [],
    }
    for layer in params["layers"]:
        entry = {
            "attn": {
                n: _linear_specs(
                    layer["attn"][n],
                    P(None, model_axis) if n != "o" else P(model_axis, None),
                )
                for n in ("q", "k", "v", "o")
            },
            "attn_norm": {"scale": P()},
        }
        # gemma-2 sandwich norms; cohere parallel block has no mlp_norm
        for extra in ("mlp_norm", "post_attn_norm", "post_mlp_norm"):
            if extra in layer:
                entry[extra] = {"scale": P()}
        if "moe" in layer:
            # expert parallelism: the stacked expert axis shards over the
            # mesh model axis; router replicated.  MoE kernels are 3D
            # [E, d_in, d_out] and are not quantized by the tree passes.
            entry["moe"] = {
                "router": {"kernel": P()},
                "gate": {"kernel": P(model_axis, None, None)},
                "up": {"kernel": P(model_axis, None, None)},
                "down": {"kernel": P(model_axis, None, None)},
            }
        else:
            entry["mlp"] = {
                "gate": _linear_specs(layer["mlp"]["gate"], P(None, model_axis)),
                "up": _linear_specs(layer["mlp"]["up"], P(None, model_axis)),
                "down": _linear_specs(layer["mlp"]["down"], P(model_axis, None)),
            }
        out["layers"].append(entry)
    if "lm_head" in params:
        out["lm_head"] = _linear_specs(params["lm_head"], P(None, model_axis))
    return out
