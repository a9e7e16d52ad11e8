"""T5 encoder-decoder (pure JAX) — summarisation / seq2seq engine.

Covers the reference's T5-based components (RECOMP abstractive compressor,
``models/context_processors/recomp.py:108-130``).  Faithful to the HF
``T5ForConditionalGeneration`` numerics: T5LayerNorm (RMS, no mean/bias),
relative-position-bucket attention bias held by the first layer of each stack
and shared downwards, unscaled attention scores, gated or plain FFN acts, and
the ``d_model**-0.5`` output scaling for tied embeddings.  Greedy decoding uses
the same static-shape KV-cache pattern as models/llama.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bergen_tpu.models.core import ACT_FNS, rmsnorm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int
    d_model: int
    d_kv: int
    d_ff: int
    num_layers: int
    num_decoder_layers: int
    num_heads: int
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "relu"  # or "gated-gelu"
    tie_word_embeddings: bool = True
    decoder_start_token_id: int = 0
    eos_token_id: int = 1
    pad_token_id: int = 0

    @property
    def is_gated(self) -> bool:
        return self.feed_forward_proj.startswith("gated")

    @property
    def act_name(self) -> str:
        act = self.feed_forward_proj.split("-")[-1]
        return {"gelu": "gelu_new"}.get(act, act)

    @classmethod
    def from_hf(cls, hf):
        return cls(
            vocab_size=hf.vocab_size, d_model=hf.d_model, d_kv=hf.d_kv,
            d_ff=hf.d_ff, num_layers=hf.num_layers,
            num_decoder_layers=hf.num_decoder_layers, num_heads=hf.num_heads,
            relative_attention_num_buckets=hf.relative_attention_num_buckets,
            relative_attention_max_distance=getattr(
                hf, "relative_attention_max_distance", 128
            ),
            layer_norm_epsilon=hf.layer_norm_epsilon,
            feed_forward_proj=hf.feed_forward_proj.replace("gated-gelu_new", "gated-gelu"),
            tie_word_embeddings=hf.tie_word_embeddings,
            decoder_start_token_id=hf.decoder_start_token_id,
            eos_token_id=hf.eos_token_id,
            pad_token_id=hf.pad_token_id,
        )


# --------------------------------------------------------------------------- #
# relative position bias
# --------------------------------------------------------------------------- #


def _relative_bucket(rel: jnp.ndarray, bidirectional: bool, num_buckets: int,
                     max_distance: int) -> jnp.ndarray:
    ret = jnp.zeros_like(rel)
    if bidirectional:
        num_buckets //= 2
        ret = ret + (rel > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(rel)
    else:
        n = jnp.maximum(-rel, 0)
    max_exact = num_buckets // 2
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(n < max_exact, n, val_large)


def position_bias(rel_emb: jnp.ndarray, q_pos: jnp.ndarray, k_pos: jnp.ndarray,
                  bidirectional: bool, cfg: T5Config) -> jnp.ndarray:
    """rel_emb [num_buckets, H]; returns [1, H, Q, K]."""
    rel = k_pos[None, :] - q_pos[:, None]  # [Q, K]
    buckets = _relative_bucket(
        rel, bidirectional, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )
    bias = jnp.take(rel_emb, buckets, axis=0)  # [Q, K, H]
    return jnp.transpose(bias, (2, 0, 1))[None]


# --------------------------------------------------------------------------- #
# blocks
# --------------------------------------------------------------------------- #


def _lin(p, x):
    return jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32).astype(x.dtype)


def _attention(p: Params, cfg: T5Config, x, kv, bias, out_heads=None):
    """T5 attention: unscaled scores + additive bias [1|B, H, Q, K]."""
    B, Q, _ = x.shape
    K = kv.shape[1]
    H, Dk = cfg.num_heads, cfg.d_kv
    q = _lin(p["q"], x).reshape(B, Q, H, Dk)
    k = _lin(p["k"], kv).reshape(B, K, H, Dk)
    v = _lin(p["v"], kv).reshape(B, K, H, Dk)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return _lin(p["o"], ctx.reshape(B, Q, H * Dk))


def _attention_cached(p, cfg, x, k_cache, v_cache, cursor, bias):
    """Decode-step self attention writing k/v at cursor."""
    B, S, _ = x.shape
    H, Dk = cfg.num_heads, cfg.d_kv
    q = _lin(p["q"], x).reshape(B, S, H, Dk)
    k = _lin(p["k"], x).reshape(B, S, H, Dk)
    v = _lin(p["v"], x).reshape(B, S, H, Dk)
    k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, cursor, 0, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, cursor, 0, 0))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k_cache,
                        preferred_element_type=jnp.float32) + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v_cache,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return _lin(p["o"], ctx.reshape(B, S, H * Dk)), k_cache, v_cache


def _ffn(p: Params, cfg: T5Config, x):
    act = ACT_FNS[cfg.act_name]
    if cfg.is_gated:
        h = act(_lin(p["wi_0"], x)) * _lin(p["wi_1"], x)
    else:
        h = act(_lin(p["wi"], x))
    return _lin(p["wo"], h)


# --------------------------------------------------------------------------- #
# encoder / decoder
# --------------------------------------------------------------------------- #


def encode(params: Params, cfg: T5Config, input_ids, attention_mask):
    from bergen_tpu.models import core

    x = jnp.take(params["shared"], input_ids, axis=0)
    B, S = input_ids.shape
    pos = jnp.arange(S)
    bias = position_bias(
        params["encoder"]["rel_emb"], pos, pos, True, cfg
    )  # [1, H, S, S]
    # fused whole-seq attention kernel (scores stay in VMEM) for TPU: the
    # relative-position bias is batch-invariant, so it rides as a VMEM
    # constant and the [B, S] mask goes in separately; T5 scores are
    # UNSCALED (scale=1.0).  See ops/encoder_attention.py.
    fused = (
        cfg.d_model == cfg.num_heads * cfg.d_kv
        and core._encoder_fused(B, S, cfg.num_heads, cfg.d_kv,
                                attention_mask.ndim, has_bias=True)
    )
    if fused:
        from bergen_tpu.ops.encoder_attention import encoder_attention

        pos_b = bias[0]  # [H, S, S]
    else:
        mask_bias = jnp.where(
            attention_mask[:, None, None, :].astype(bool), 0.0, -1e30)
        bias = bias + mask_bias
    for layer in params["encoder"]["layers"]:
        h = rmsnorm(layer["ln0"], x, cfg.layer_norm_epsilon)
        if fused:
            p = layer["attn"]
            ctx = encoder_attention(
                _lin(p["q"], h), _lin(p["k"], h), _lin(p["v"], h),
                attention_mask, cfg.num_heads, attn_bias=pos_b, scale=1.0,
            )
            x = x + _lin(p["o"], ctx)
        else:
            x = x + _attention(layer["attn"], cfg, h, h, bias)
        h = rmsnorm(layer["ln1"], x, cfg.layer_norm_epsilon)
        x = x + _ffn(layer["ffn"], cfg, h)
    return rmsnorm(params["encoder"]["final_ln"], x, cfg.layer_norm_epsilon)


def init_decoder_cache(cfg: T5Config, batch: int, max_len: int, dtype=jnp.float32):
    shape = (cfg.num_decoder_layers, batch, max_len, cfg.num_heads, cfg.d_kv)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "cursor": jnp.zeros((), jnp.int32),
    }


def decode_step(params: Params, cfg: T5Config, decoder_ids, enc_out, enc_mask,
                cache, self_mask):
    """decoder_ids [B, S] (prefix chunk or single step); returns logits + cache."""
    B, S = decoder_ids.shape
    L = cache["k"].shape[2]
    x = jnp.take(params["shared"], decoder_ids, axis=0)
    cursor = cache["cursor"]

    q_pos = cursor + jnp.arange(S)
    k_pos = jnp.arange(L)
    bias = position_bias(params["decoder"]["rel_emb"], q_pos, k_pos, False, cfg)
    bias = bias + jnp.where(self_mask[:, None, :, :], 0.0, -1e30)
    cross_bias = jnp.where(enc_mask[:, None, None, :].astype(bool), 0.0, -1e30)

    new_k, new_v = [], []
    for li, layer in enumerate(params["decoder"]["layers"]):
        h = rmsnorm(layer["ln0"], x, cfg.layer_norm_epsilon)
        a, k_c, v_c = _attention_cached(
            layer["self_attn"], cfg, h, cache["k"][li], cache["v"][li], cursor,
            bias,
        )
        new_k.append(k_c)
        new_v.append(v_c)
        x = x + a
        h = rmsnorm(layer["ln1"], x, cfg.layer_norm_epsilon)
        x = x + _attention(layer["cross_attn"], cfg, h, enc_out, cross_bias)
        h = rmsnorm(layer["ln2"], x, cfg.layer_norm_epsilon)
        x = x + _ffn(layer["ffn"], cfg, h)
    x = rmsnorm(params["decoder"]["final_ln"], x, cfg.layer_norm_epsilon)
    if cfg.tie_word_embeddings:
        x = x * (cfg.d_model ** -0.5)
        logits = jnp.dot(x, params["shared"].T.astype(x.dtype),
                         preferred_element_type=jnp.float32)
    else:
        logits = jnp.dot(x, params["lm_head"]["kernel"],
                         preferred_element_type=jnp.float32)
    cache = {"k": jnp.stack(new_k), "v": jnp.stack(new_v),
             "cursor": cursor + S}
    return logits, cache


def greedy_generate(params, cfg: T5Config, input_ids, attention_mask,
                    max_new_tokens: int, dtype=jnp.float32):
    """Encoder once + scan of single-token decode steps; stops per-sample on
    EOS (matches HF greedy generate semantics)."""
    B = input_ids.shape[0]
    enc_out = encode(params, cfg, input_ids, attention_mask)
    L = max_new_tokens
    cache = init_decoder_cache(cfg, B, L, dtype)

    start = jnp.full((B, 1), cfg.decoder_start_token_id, jnp.int32)

    def step(carry, t):
        cache, tok, done = carry
        # self-attn may see cache slots [0..t]
        valid = (jnp.arange(L)[None, None, :] <= t)
        valid = jnp.broadcast_to(valid, (B, 1, L))
        logits, cache = decode_step(
            params, cfg, tok, enc_out, attention_mask, cache, valid
        )
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        done = done | (nxt == cfg.eos_token_id)
        return (cache, nxt[:, None], done), nxt

    (_, _, _), toks = jax.lax.scan(
        step, (cache, start, jnp.zeros((B,), bool)), jnp.arange(L)
    )
    return jnp.swapaxes(toks, 0, 1)  # [B, max_new_tokens]


# --------------------------------------------------------------------------- #
# HF conversion
# --------------------------------------------------------------------------- #


def t5_from_hf(state_dict, cfg: T5Config) -> Params:
    def t(x):
        return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)

    def lin(prefix):
        return {"kernel": t(state_dict[prefix + ".weight"]).T}

    def stack(side: str, n: int, decoder: bool):
        layers = []
        for i in range(n):
            pre = f"{side}.block.{i}.layer"
            self_attn = {
                "q": lin(f"{pre}.0.SelfAttention.q"),
                "k": lin(f"{pre}.0.SelfAttention.k"),
                "v": lin(f"{pre}.0.SelfAttention.v"),
                "o": lin(f"{pre}.0.SelfAttention.o"),
            }
            entry: Params = {"ln0": {"scale": t(state_dict[f"{pre}.0.layer_norm.weight"])}}
            if decoder:
                entry["self_attn"] = self_attn
                entry["cross_attn"] = {
                    "q": lin(f"{pre}.1.EncDecAttention.q"),
                    "k": lin(f"{pre}.1.EncDecAttention.k"),
                    "v": lin(f"{pre}.1.EncDecAttention.v"),
                    "o": lin(f"{pre}.1.EncDecAttention.o"),
                }
                entry["ln1"] = {"scale": t(state_dict[f"{pre}.1.layer_norm.weight"])}
                ffn_idx = 2
            else:
                entry["attn"] = self_attn
                ffn_idx = 1
            ffn_pre = f"{pre}.{ffn_idx}.DenseReluDense"
            if f"{ffn_pre}.wi.weight" in state_dict:
                ffn = {"wi": lin(f"{ffn_pre}.wi"), "wo": lin(f"{ffn_pre}.wo")}
            else:
                ffn = {
                    "wi_0": lin(f"{ffn_pre}.wi_0"),
                    "wi_1": lin(f"{ffn_pre}.wi_1"),
                    "wo": lin(f"{ffn_pre}.wo"),
                }
            entry["ffn"] = ffn
            entry[f"ln{ffn_idx}" if decoder else "ln1"] = {
                "scale": t(state_dict[f"{pre}.{ffn_idx}.layer_norm.weight"])
            }
            layers.append(entry)
        return {
            "layers": layers,
            "rel_emb": t(
                state_dict[
                    f"{side}.block.0.layer.0.SelfAttention"
                    ".relative_attention_bias.weight"
                ]
            ),
            "final_ln": {"scale": t(state_dict[f"{side}.final_layer_norm.weight"])},
        }

    params: Params = {
        "shared": t(state_dict["shared.weight"]),
        "encoder": stack("encoder", cfg.num_layers, False),
        "decoder": stack("decoder", cfg.num_decoder_layers, True),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in state_dict:
        params["lm_head"] = {"kernel": t(state_dict["lm_head.weight"]).T}
    return params


# --------------------------------------------------------------------------- #
# generator wrapper
# --------------------------------------------------------------------------- #


class T5Generator:
    """Batched greedy T5 generation (tokenize → jitted encode+scan → decode)."""

    def __init__(self, model_name: str, batch_size: int = 16,
                 max_length: int = 512, max_new_tokens: int = 128):
        from transformers import AutoConfig, AutoTokenizer, T5ForConditionalGeneration

        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        hf_cfg = AutoConfig.from_pretrained(model_name)
        self.cfg = T5Config.from_hf(hf_cfg)
        hf = T5ForConditionalGeneration.from_pretrained(model_name)
        self.params = t5_from_hf(hf.state_dict(), self.cfg)
        self.params = jax.tree.map(jnp.asarray, self.params)
        del hf
        self.batch_size = batch_size
        self.max_length = max_length
        self.max_new_tokens = max_new_tokens
        cfg = self.cfg

        import functools

        self._gen = jax.jit(
            functools.partial(greedy_generate, cfg=cfg),
            static_argnames=("max_new_tokens",),
        )

    def generate(self, texts: list[str]) -> list[str]:
        out = []
        for s in range(0, len(texts), self.batch_size):
            batch = texts[s : s + self.batch_size]
            enc = self.tokenizer(
                batch, padding="longest", truncation=True,
                max_length=self.max_length, return_tensors="np",
            )
            toks = self._gen(
                self.params,
                input_ids=jnp.asarray(enc["input_ids"], jnp.int32),
                attention_mask=jnp.asarray(enc["attention_mask"], jnp.int32),
                max_new_tokens=self.max_new_tokens,
            )
            out.extend(
                self.tokenizer.batch_decode(np.asarray(toks),
                                            skip_special_tokens=True)
            )
        return out
