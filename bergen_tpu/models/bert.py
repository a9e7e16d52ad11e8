"""BERT-family encoder (pure JAX).

One implementation covers the reference's dense bi-encoders (contriever,
RetroMAE, BGE, e5 — reference ``models/retrievers/dense.py``), the SPLADE
backbone+MLM head (``models/retrievers/splade.py``), and MiniLM-style
cross-encoders (``models/rerankers/crossencoder.py``): they are all
``BertModel`` variants in HF.  Post-layernorm architecture, learned absolute
positions, token-type embeddings.

Forwards are pure functions over a params pytree; ``param_shardings`` gives the
PartitionSpec tree for pjit data/tensor parallel placement over a mesh.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from bergen_tpu.models import core
from bergen_tpu.models.core import ACT_FNS, dense, layernorm, mha


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"
    pad_token_id: int = 0
    # RoBERTa/XLM-R (bge-m3, bge-reranker-v2-m3): positions are
    # pad-aware cumulative ids offset by padding_idx, not absolute indices
    roberta_positions: bool = False
    # remote-code architecture deltas (GTE-v1.5 / nomic-embed / jina-v2 —
    # the reference loads these via trust_remote_code,
    # config/retriever/gte-base-en-v1.5.yaml etc.):
    position_embedding_type: str = "absolute"  # absolute | rope | alibi
    rope_theta: float = 10000.0
    # gated MLP (GLU): out = down(up * act(gate)); covers GTE gelu-GLU,
    # nomic swiglu, jina geglu
    mlp_gated: bool = False
    mlp_bias: bool = True

    @classmethod
    def from_hf(cls, hf_cfg) -> "BertConfig":
        model_type = getattr(hf_cfg, "model_type", "")
        is_roberta = model_type in ("roberta", "xlm-roberta", "camembert")
        if model_type == "new":
            # GTE v1.5 (Alibaba-NLP NewModel): rope-BERT with fused qkv and a
            # gated gelu MLP (reference runs it via trust_remote_code)
            return cls(
                vocab_size=hf_cfg.vocab_size,
                hidden_size=hf_cfg.hidden_size,
                num_layers=hf_cfg.num_hidden_layers,
                num_heads=hf_cfg.num_attention_heads,
                intermediate_size=hf_cfg.intermediate_size,
                max_position_embeddings=hf_cfg.max_position_embeddings,
                type_vocab_size=getattr(hf_cfg, "type_vocab_size", 0) or 0,
                layer_norm_eps=getattr(hf_cfg, "layer_norm_eps", 1e-12),
                hidden_act=getattr(hf_cfg, "hidden_act", "gelu"),
                pad_token_id=getattr(hf_cfg, "pad_token_id", 0) or 0,
                position_embedding_type="rope",
                rope_theta=getattr(hf_cfg, "rope_theta", 10000.0),
                mlp_gated=True,
            )
        if model_type == "nomic_bert":
            # nomic-embed (NomicBertModel): GPT-style config names, rope,
            # swiglu MLP without biases
            return cls(
                vocab_size=hf_cfg.vocab_size,
                hidden_size=getattr(hf_cfg, "n_embd", None)
                or hf_cfg.hidden_size,
                num_layers=getattr(hf_cfg, "n_layer", None)
                or hf_cfg.num_hidden_layers,
                num_heads=getattr(hf_cfg, "n_head", None)
                or hf_cfg.num_attention_heads,
                intermediate_size=getattr(hf_cfg, "n_inner", None)
                or hf_cfg.intermediate_size,
                max_position_embeddings=getattr(hf_cfg, "n_positions", None)
                or hf_cfg.max_position_embeddings,
                type_vocab_size=getattr(hf_cfg, "type_vocab_size", 0) or 0,
                layer_norm_eps=getattr(hf_cfg, "layer_norm_epsilon", 1e-12),
                hidden_act="silu",  # "swiglu" activation_function
                pad_token_id=getattr(hf_cfg, "pad_token_id", 0) or 0,
                position_embedding_type="rope",
                rope_theta=getattr(hf_cfg, "rotary_emb_base", 10000.0),
                mlp_gated=True,
                mlp_bias=bool(getattr(hf_cfg, "mlp_fc1_bias", False)),
            )
        if getattr(hf_cfg, "position_embedding_type", "absolute") == "alibi":
            # jina-v2 (JinaBertModel, model_type "bert" + alibi + geglu)
            return cls(
                vocab_size=hf_cfg.vocab_size,
                hidden_size=hf_cfg.hidden_size,
                num_layers=hf_cfg.num_hidden_layers,
                num_heads=hf_cfg.num_attention_heads,
                intermediate_size=hf_cfg.intermediate_size,
                max_position_embeddings=hf_cfg.max_position_embeddings,
                type_vocab_size=hf_cfg.type_vocab_size,
                layer_norm_eps=hf_cfg.layer_norm_eps,
                hidden_act="gelu",  # geglu feed_forward_type
                pad_token_id=hf_cfg.pad_token_id or 0,
                position_embedding_type="alibi",
                mlp_gated="glu" in getattr(hf_cfg, "feed_forward_type", ""),
            )
        if model_type == "distilbert":
            # DistilBERT (tasb — reference config/retriever/tasb.yaml): same
            # post-LN block as BERT, but no token-type embeddings and renamed
            # config fields; HF modeling hardcodes LayerNorm eps=1e-12.
            return cls(
                vocab_size=hf_cfg.vocab_size,
                hidden_size=hf_cfg.dim,
                num_layers=hf_cfg.n_layers,
                num_heads=hf_cfg.n_heads,
                intermediate_size=hf_cfg.hidden_dim,
                max_position_embeddings=hf_cfg.max_position_embeddings,
                type_vocab_size=0,
                layer_norm_eps=1e-12,
                hidden_act=hf_cfg.activation,
                pad_token_id=getattr(hf_cfg, "pad_token_id", 0) or 0,
            )
        return cls(
            vocab_size=hf_cfg.vocab_size,
            hidden_size=hf_cfg.hidden_size,
            num_layers=hf_cfg.num_hidden_layers,
            num_heads=hf_cfg.num_attention_heads,
            intermediate_size=hf_cfg.intermediate_size,
            max_position_embeddings=hf_cfg.max_position_embeddings,
            type_vocab_size=hf_cfg.type_vocab_size,
            layer_norm_eps=hf_cfg.layer_norm_eps,
            hidden_act=hf_cfg.hidden_act,
            pad_token_id=hf_cfg.pad_token_id or 0,
            roberta_positions=is_roberta,
        )


def init(key, cfg: BertConfig, with_mlm_head: bool = False) -> Dict[str, Any]:
    """Random init (tests / scratch training). Checkpoints come via convert.py."""
    k_emb, k_layers, k_pool, k_mlm = jax.random.split(key, 4)
    p: Dict[str, Any] = {
        "embeddings": {
            "word": jax.random.normal(k_emb, (cfg.vocab_size, cfg.hidden_size)) * 0.02,
            "ln": core.layernorm_init(cfg.hidden_size),
        },
        "layers": [],
        "pooler": core.dense_init(k_pool, cfg.hidden_size, cfg.hidden_size),
    }
    if cfg.position_embedding_type == "absolute":
        p["embeddings"]["position"] = (
            jax.random.normal(
                jax.random.fold_in(k_emb, 1),
                (cfg.max_position_embeddings, cfg.hidden_size),
            )
            * 0.02
        )
    if cfg.type_vocab_size > 0:
        p["embeddings"]["token_type"] = (
            jax.random.normal(
                jax.random.fold_in(k_emb, 2), (cfg.type_vocab_size, cfg.hidden_size)
            )
            * 0.02
        )
    for i in range(cfg.num_layers):
        k = jax.random.fold_in(k_layers, i)
        ks = jax.random.split(k, 4)
        entry = {
            "attn": core.mha_init(ks[0], cfg.hidden_size),
            "attn_ln": core.layernorm_init(cfg.hidden_size),
            "mlp_out": core.dense_init(ks[2], cfg.intermediate_size, cfg.hidden_size),
            "mlp_ln": core.layernorm_init(cfg.hidden_size),
        }
        if cfg.mlp_gated:
            entry["mlp_up"] = core.dense_init(
                ks[1], cfg.hidden_size, cfg.intermediate_size
            )
            entry["mlp_gate"] = core.dense_init(
                ks[3], cfg.hidden_size, cfg.intermediate_size
            )
            if not cfg.mlp_bias:
                for n in ("mlp_up", "mlp_gate", "mlp_out"):
                    entry[n].pop("bias", None)
        else:
            entry["mlp_in"] = core.dense_init(
                ks[1], cfg.hidden_size, cfg.intermediate_size
            )
        p["layers"].append(entry)
    if with_mlm_head:
        p["mlm"] = {
            "transform": core.dense_init(k_mlm, cfg.hidden_size, cfg.hidden_size),
            "ln": core.layernorm_init(cfg.hidden_size),
            # decoder weight is tied to word embeddings; only a bias is stored
            "bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
        }
    return p


def alibi_slopes(num_heads: int) -> jnp.ndarray:
    """Standard ALiBi head slopes (geometric sequence from 2^(-8/H))."""
    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(num_heads).is_integer():
        s = pow2_slopes(num_heads)
    else:
        base = 2 ** math.floor(math.log2(num_heads))
        s = pow2_slopes(base)
        s += pow2_slopes(2 * base)[0::2][: num_heads - base]
    return jnp.asarray(s, jnp.float32)


def encode(
    params: Dict[str, Any],
    cfg: BertConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    token_type_ids: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Token-level hidden states [B, S, D]."""
    B, S = input_ids.shape
    emb = params["embeddings"]
    x = jnp.take(emb["word"], input_ids, axis=0)
    if cfg.position_embedding_type == "absolute":
        if cfg.roberta_positions:
            # create_position_ids_from_input_ids: pads stay at padding_idx,
            # real tokens count from padding_idx + 1
            mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
            positions = jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id
        else:
            positions = jnp.arange(S)[None, :]
        x = x + jnp.take(emb["position"], positions, axis=0)
    if "token_type" in emb:  # absent for DistilBERT (type_vocab_size == 0)
        tt = token_type_ids if token_type_ids is not None else jnp.zeros_like(input_ids)
        x = x + jnp.take(emb["token_type"], tt, axis=0)
    x = layernorm(emb["ln"], x, cfg.layer_norm_eps)

    rope_inv_freq = None
    alibi = None
    if cfg.position_embedding_type == "rope":
        head_dim = cfg.hidden_size // cfg.num_heads
        rope_inv_freq = 1.0 / (
            cfg.rope_theta
            ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
        )
    elif cfg.position_embedding_type == "alibi":
        # symmetric encoder ALiBi: score bias -slope_h * |i - j|
        dist = jnp.abs(
            jnp.arange(S)[:, None] - jnp.arange(S)[None, :]
        ).astype(jnp.float32)
        alibi = -alibi_slopes(cfg.num_heads)[:, None, None] * dist  # [H,S,S]

    act = ACT_FNS[cfg.hidden_act]
    # Fused whole-layer kernel (qkv proj + attention + o proj + residual +
    # LN + FFN + residual + LN in one pallas_call) for plain
    # absolute-position post-LN encoders on TPU; gated-MLP/exotic-act
    # variants fall back to the attention-block kernel + XLA FFN, and
    # rope/ALiBi variants route through core.mha (which still fuses the
    # attention itself).  See ops/encoder_attention.py.
    use_block = (
        core._encoder_fused(B, S, cfg.num_heads,
                            cfg.hidden_size // cfg.num_heads,
                            attention_mask.ndim)
        and rope_inv_freq is None and alibi is None
    )
    quantized = bool(params["layers"]) and (
        "kernel_q" in params["layers"][0]["attn"]["q"])
    use_layer = False
    if use_block:
        from bergen_tpu.ops import encoder_attention as ea

        use_layer = (
            ea.layer_act_supported(cfg.hidden_act, cfg.mlp_gated)
            and ea.layer_weights_fit(
                cfg.hidden_size, cfg.intermediate_size, S,
                itemsize=1 if quantized else 2)
        )
    for layer in params["layers"]:
        if use_layer and quantized:
            # W8A8 int8-MXU layer kernel (convert.quantize_encoder_layers_
            # w8a8 trees); callers gate this on a measured dual-encode
            # quality check (retrievers/dense.py)
            x = ea.encoder_layer_q(
                x, layer["attn"], layer["attn_ln"], layer["mlp_in"],
                layer["mlp_out"], layer["mlp_ln"], attention_mask,
                cfg.num_heads, cfg.layer_norm_eps, cfg.hidden_act)
            continue
        if quantized:
            # shapes outside the fused kernel's envelope: dequantize to the
            # plain XLA path (weight-only semantics; per-call elementwise
            # dequant is noise next to the layer matmuls)
            from bergen_tpu.models import convert as _cv

            layer = dict(
                layer,
                attn={n: _cv.dequantize_linear_w8a8(layer["attn"][n])
                      for n in ("q", "k", "v", "o")},
                mlp_in=_cv.dequantize_linear_w8a8(layer["mlp_in"]),
                mlp_out=_cv.dequantize_linear_w8a8(layer["mlp_out"]),
            )
        if use_layer:
            x = ea.encoder_layer(
                x, layer["attn"], layer["attn_ln"], layer["mlp_in"],
                layer["mlp_out"], layer["mlp_ln"], attention_mask,
                cfg.num_heads, cfg.layer_norm_eps, cfg.hidden_act)
            continue
        if use_block:
            x = ea.attention_block(x, layer["attn"], layer["attn_ln"],
                                   attention_mask, cfg.num_heads,
                                   cfg.layer_norm_eps)
        else:
            a = mha(layer["attn"], x, attention_mask, cfg.num_heads,
                    rope_inv_freq=rope_inv_freq, attn_bias=alibi)
            x = layernorm(layer["attn_ln"], x + a, cfg.layer_norm_eps)
        if cfg.mlp_gated:
            h = dense(layer["mlp_up"], x) * act(dense(layer["mlp_gate"], x))
        else:
            h = act(dense(layer["mlp_in"], x))
        h = dense(layer["mlp_out"], h)
        x = layernorm(layer["mlp_ln"], x + h, cfg.layer_norm_eps)
    return x


def mlm_logits(params, cfg: BertConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    """MLM head over tied word embeddings (SPLADE backbone —
    reference splade.py:42)."""
    h = dense(params["mlm"]["transform"], hidden)
    h = ACT_FNS[cfg.hidden_act](h)
    h = layernorm(params["mlm"]["ln"], h, cfg.layer_norm_eps)
    logits = jnp.dot(
        h, params["embeddings"]["word"].T.astype(h.dtype),
        preferred_element_type=jnp.float32,
    )
    return logits + params["mlm"]["bias"]


# --------------------------------------------------------------------------- #
# poolers (reference models/retrievers/dense.py:64-75)
# --------------------------------------------------------------------------- #


def mean_pool(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    m = attention_mask[..., None].astype(hidden.dtype)
    s = jnp.sum(hidden * m, axis=1)
    return s / jnp.clip(jnp.sum(m, axis=1), 1e-9, None)


def cls_pool(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    return hidden[:, 0]


def splade_pool(logits: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """max over sequence of log(1 + relu(logit)) * mask → [B, vocab]
    (reference splade.py:42-43)."""
    sat = jnp.log1p(jax.nn.relu(logits)) * attention_mask[..., None].astype(logits.dtype)
    return jnp.max(sat, axis=1)


POOLERS = {"mean": mean_pool, "cls": cls_pool}


# --------------------------------------------------------------------------- #
# sequence classification head (cross-encoder reranker)
# --------------------------------------------------------------------------- #


def classify(params, cfg: BertConfig, input_ids, attention_mask, token_type_ids=None):
    """BERT pooler (tanh over CLS) + classifier head → logits [B, num_labels]."""
    hidden = encode(params, cfg, input_ids, attention_mask, token_type_ids)
    pooled = jnp.tanh(dense(params["pooler"], hidden[:, 0]))
    return dense(params["classifier"], pooled)


# --------------------------------------------------------------------------- #
# sharding: encoders are data-parallel (batch axis over the mesh 'data' axis);
# parameters replicated. TP for encoders is unnecessary at these sizes.
# --------------------------------------------------------------------------- #


def param_shardings(params) -> Any:
    return jax.tree.map(lambda _: P(), params)


def batch_shardings(data_axis: str = "data") -> tuple[P, P]:
    return P(data_axis, None), P(data_axis, None)
