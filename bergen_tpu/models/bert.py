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

    @classmethod
    def from_hf(cls, hf_cfg) -> "BertConfig":
        model_type = getattr(hf_cfg, "model_type", "")
        is_roberta = model_type in ("roberta", "xlm-roberta", "camembert")
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
            "position": jax.random.normal(
                jax.random.fold_in(k_emb, 1), (cfg.max_position_embeddings, cfg.hidden_size)
            )
            * 0.02,
            "ln": core.layernorm_init(cfg.hidden_size),
        },
        "layers": [],
        "pooler": core.dense_init(k_pool, cfg.hidden_size, cfg.hidden_size),
    }
    if cfg.type_vocab_size > 0:
        p["embeddings"]["token_type"] = (
            jax.random.normal(
                jax.random.fold_in(k_emb, 2), (cfg.type_vocab_size, cfg.hidden_size)
            )
            * 0.02
        )
    for i in range(cfg.num_layers):
        k = jax.random.fold_in(k_layers, i)
        ks = jax.random.split(k, 3)
        p["layers"].append(
            {
                "attn": core.mha_init(ks[0], cfg.hidden_size),
                "attn_ln": core.layernorm_init(cfg.hidden_size),
                "mlp_in": core.dense_init(ks[1], cfg.hidden_size, cfg.intermediate_size),
                "mlp_out": core.dense_init(ks[2], cfg.intermediate_size, cfg.hidden_size),
                "mlp_ln": core.layernorm_init(cfg.hidden_size),
            }
        )
    if with_mlm_head:
        p["mlm"] = {
            "transform": core.dense_init(k_mlm, cfg.hidden_size, cfg.hidden_size),
            "ln": core.layernorm_init(cfg.hidden_size),
            # decoder weight is tied to word embeddings; only a bias is stored
            "bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
        }
    return p


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
    if cfg.roberta_positions:
        # create_position_ids_from_input_ids: pads stay at padding_idx,
        # real tokens count from padding_idx + 1
        mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
        positions = jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id
    else:
        positions = jnp.arange(S)[None, :]
    x = (
        jnp.take(emb["word"], input_ids, axis=0)
        + jnp.take(emb["position"], positions, axis=0)
    )
    if "token_type" in emb:  # absent for DistilBERT (type_vocab_size == 0)
        tt = token_type_ids if token_type_ids is not None else jnp.zeros_like(input_ids)
        x = x + jnp.take(emb["token_type"], tt, axis=0)
    x = layernorm(emb["ln"], x, cfg.layer_norm_eps)

    act = ACT_FNS[cfg.hidden_act]
    for layer in params["layers"]:
        a = mha(layer["attn"], x, attention_mask, cfg.num_heads)
        x = layernorm(layer["attn_ln"], x + a, cfg.layer_norm_eps)
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
