"""M2M-100 / NLLB-200 translation model (pure JAX).

Backs the reference's ``TranslateQuery`` query generator
(``models/query_generators/translate_query.py``: NLLB-200-3.3B via the HF
translation pipeline).  Faithful to HF ``M2M100ForConditionalGeneration``:
scaled word embeddings (sqrt(d)), tensor2tensor sinusoidal positions with
offset 2 and pad-aware position ids, pre-LN transformer blocks, tied lm_head.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from bergen_tpu.models.core import dense, layernorm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class M2M100Config:
    vocab_size: int
    d_model: int
    encoder_layers: int
    decoder_layers: int
    encoder_attention_heads: int
    decoder_attention_heads: int
    encoder_ffn_dim: int
    decoder_ffn_dim: int
    max_position_embeddings: int = 1024
    pad_token_id: int = 1
    eos_token_id: int = 2
    decoder_start_token_id: int = 2
    activation: str = "relu"
    scale_embedding: bool = True

    @classmethod
    def from_hf(cls, hf):
        return cls(
            vocab_size=hf.vocab_size, d_model=hf.d_model,
            encoder_layers=hf.encoder_layers, decoder_layers=hf.decoder_layers,
            encoder_attention_heads=hf.encoder_attention_heads,
            decoder_attention_heads=hf.decoder_attention_heads,
            encoder_ffn_dim=hf.encoder_ffn_dim,
            decoder_ffn_dim=hf.decoder_ffn_dim,
            max_position_embeddings=hf.max_position_embeddings,
            pad_token_id=hf.pad_token_id, eos_token_id=hf.eos_token_id,
            decoder_start_token_id=hf.decoder_start_token_id,
            activation=hf.activation_function,
            scale_embedding=getattr(hf, "scale_embedding", True),
        )


def sinusoidal_table(num_positions: int, dim: int, padding_idx: int) -> np.ndarray:
    """tensor2tensor layout: [sin | cos] halves (HF M2M100 get_embedding)."""
    n = num_positions + 2  # offset
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float64) * -(math.log(10000) / (half - 1)))
    ang = np.arange(n, dtype=np.float64)[:, None] * freq[None, :]
    emb = np.concatenate([np.sin(ang), np.cos(ang)], axis=1).astype(np.float32)
    if dim % 2 == 1:
        emb = np.concatenate([emb, np.zeros((n, 1), np.float32)], axis=1)
    emb[padding_idx] = 0
    return emb


def position_ids(input_ids: jnp.ndarray, pad_id: int, past: int = 0) -> jnp.ndarray:
    mask = (input_ids != pad_id).astype(jnp.int32)
    return (jnp.cumsum(mask, axis=1) + past) * mask + pad_id


def _mha(p, x, kv, mask_bias, n_heads):
    B, Q, D = x.shape
    K = kv.shape[1]
    Dh = D // n_heads
    q = dense(p["q"], x).reshape(B, Q, n_heads, Dh) / math.sqrt(Dh)
    k = dense(p["k"], kv).reshape(B, K, n_heads, Dh)
    v = dense(p["v"], kv).reshape(B, K, n_heads, Dh)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) + mask_bias
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return dense(p["o"], ctx.reshape(B, Q, D))


def _act(name):
    return {"relu": jax.nn.relu, "gelu": lambda x: jax.nn.gelu(x, approximate=False),
            "silu": jax.nn.silu}[name]


def encode(params: Params, cfg: M2M100Config, input_ids, attention_mask):
    scale = math.sqrt(cfg.d_model) if cfg.scale_embedding else 1.0
    x = jnp.take(params["shared"], input_ids, axis=0) * scale
    pos = position_ids(input_ids, cfg.pad_token_id)
    x = x + jnp.take(params["pos_table"], pos, axis=0).astype(x.dtype)
    bias = jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, -1e30)
    act = _act(cfg.activation)
    for layer in params["encoder"]["layers"]:
        h = layernorm(layer["ln0"], x, 1e-5)
        x = x + _mha(layer["attn"], h, h, bias, cfg.encoder_attention_heads)
        h = layernorm(layer["ln1"], x, 1e-5)
        h = dense(layer["fc2"], act(dense(layer["fc1"], h)))
        x = x + h
    return layernorm(params["encoder"]["final_ln"], x, 1e-5)


def decode(params: Params, cfg: M2M100Config, decoder_ids, enc_out, enc_mask):
    """Full-prefix decoder forward (no cache — translation queries are short)."""
    B, S = decoder_ids.shape
    scale = math.sqrt(cfg.d_model) if cfg.scale_embedding else 1.0
    x = jnp.take(params["shared"], decoder_ids, axis=0) * scale
    pos = position_ids(decoder_ids, cfg.pad_token_id)
    x = x + jnp.take(params["pos_table"], pos, axis=0).astype(x.dtype)
    causal = jnp.tril(jnp.ones((S, S), bool))
    self_bias = jnp.where(causal[None, None], 0.0, -1e30)
    cross_bias = jnp.where(enc_mask[:, None, None, :].astype(bool), 0.0, -1e30)
    act = _act(cfg.activation)
    for layer in params["decoder"]["layers"]:
        h = layernorm(layer["ln0"], x, 1e-5)
        x = x + _mha(layer["self_attn"], h, h, self_bias,
                     cfg.decoder_attention_heads)
        h = layernorm(layer["ln1"], x, 1e-5)
        x = x + _mha(layer["cross_attn"], h, enc_out, cross_bias,
                     cfg.decoder_attention_heads)
        h = layernorm(layer["ln2"], x, 1e-5)
        h = dense(layer["fc2"], act(dense(layer["fc1"], h)))
        x = x + h
    x = layernorm(params["decoder"]["final_ln"], x, 1e-5)
    return jnp.dot(x, params["shared"].T.astype(x.dtype),
                   preferred_element_type=jnp.float32)


def greedy_generate(params, cfg: M2M100Config, input_ids, attention_mask,
                    max_new_tokens: int, forced_bos_token_id: int | None = None):
    """Greedy translation: decoder re-runs the growing prefix each step (fine
    for short query translations; cached decode mirrors t5.py if needed)."""
    B = input_ids.shape[0]
    enc_out = encode(params, cfg, input_ids, attention_mask)
    L = max_new_tokens + 2
    dec = jnp.full((B, L), cfg.pad_token_id, jnp.int32)
    dec = dec.at[:, 0].set(cfg.decoder_start_token_id)
    start = 1
    if forced_bos_token_id is not None:
        dec = dec.at[:, 1].set(forced_bos_token_id)
        start = 2
    done = jnp.zeros((B,), bool)
    for t in range(start, L):
        logits = decode(params, cfg, dec[:, :t], enc_out, attention_mask)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        dec = dec.at[:, t].set(nxt)
        done = done | (nxt == cfg.eos_token_id)
    return dec[:, 1:]


# --------------------------------------------------------------------------- #
# conversion
# --------------------------------------------------------------------------- #


def m2m100_from_hf(state_dict, cfg: M2M100Config) -> Params:
    def t(x):
        return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)

    sd = {}
    for k, v in state_dict.items():
        sd[k[len("model."):] if k.startswith("model.") else k] = v

    def lin(prefix):
        p = {"kernel": t(sd[prefix + ".weight"]).T}
        if prefix + ".bias" in sd:
            p["bias"] = t(sd[prefix + ".bias"])
        return p

    def ln(prefix):
        return {"scale": t(sd[prefix + ".weight"]), "bias": t(sd[prefix + ".bias"])}

    def attn(prefix):
        return {
            "q": lin(f"{prefix}.q_proj"), "k": lin(f"{prefix}.k_proj"),
            "v": lin(f"{prefix}.v_proj"), "o": lin(f"{prefix}.out_proj"),
        }

    def stack(side, n, decoder):
        layers = []
        for i in range(n):
            pre = f"{side}.layers.{i}"
            entry = {
                "ln0": ln(f"{pre}.self_attn_layer_norm"),
                "fc1": lin(f"{pre}.fc1"),
                "fc2": lin(f"{pre}.fc2"),
            }
            if decoder:
                entry["self_attn"] = attn(f"{pre}.self_attn")
                entry["cross_attn"] = attn(f"{pre}.encoder_attn")
                entry["ln1"] = ln(f"{pre}.encoder_attn_layer_norm")
                entry["ln2"] = ln(f"{pre}.final_layer_norm")
            else:
                entry["attn"] = attn(f"{pre}.self_attn")
                entry["ln1"] = ln(f"{pre}.final_layer_norm")
            layers.append(entry)
        return {"layers": layers, "final_ln": ln(f"{side}.layer_norm")}

    return {
        "shared": t(sd["shared.weight"]),
        "pos_table": sinusoidal_table(
            cfg.max_position_embeddings, cfg.d_model, cfg.pad_token_id
        ),
        "encoder": stack("encoder", cfg.encoder_layers, False),
        "decoder": stack("decoder", cfg.decoder_layers, True),
    }
