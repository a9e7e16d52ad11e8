"""HF torch checkpoint → bergen_tpu parameter pytree conversion.

The reference loads every model with ``AutoModel*`` from HF hub; on TPU we load
the same checkpoints but convert the torch state dict into our functional param
trees once, host-side, then ship to device as bf16 (weights) with fp32 norms.
Covers the BERT family (dense retrievers / SPLADE / cross-encoders) and the
Llama family (generators) — the two architectures carrying all hot-path FLOPs
in SURVEY.md §2.2.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp


def _t(x) -> np.ndarray:  # torch tensor -> numpy (no torch import needed here)
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def _lin(sd: Mapping, prefix: str) -> Dict[str, Any]:
    """torch nn.Linear stores weight [out, in]; our kernels are [in, out]."""
    p = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["bias"] = _t(sd[f"{prefix}.bias"])
    return p


def _ln(sd: Mapping, prefix: str) -> Dict[str, Any]:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _strip_prefix(sd: Mapping, candidates=("bert.", "model.", "roberta.", "deberta.", "distilbert.")) -> Dict:
    """Normalize away the HF wrapper prefix (BertForMaskedLM stores weights
    under 'bert.', bare BertModel has none)."""
    out = dict(sd)
    for cand in candidates:
        if any(k.startswith(cand + "embeddings") or k.startswith(cand + "encoder")
               or k.startswith(cand + "embed_tokens") or k.startswith(cand + "layers")
               for k in sd):
            out = {}
            for k, v in sd.items():
                out[k[len(cand):] if k.startswith(cand) else k] = v
            break
    return out


def load_hf_encoder(model_name: str):
    """(hf_cfg, state_dict) for an encoder checkpoint.

    Architectures transformers knows load via AutoModel; trust_remote_code
    architectures (GTE-v1.5 `new`, `nomic_bert`, jina's alibi-BERT — reference
    config/retriever/gte-base-en-v1.5.yaml etc.) are loaded by reading
    config.json + weights DIRECTLY, never executing the checkpoint's remote
    modeling code — the JAX forward in models/bert.py implements those
    architectures natively."""
    import json
    import os
    from types import SimpleNamespace

    from transformers import AutoConfig, AutoModel

    try:
        hf_cfg = AutoConfig.from_pretrained(model_name)
        model = AutoModel.from_pretrained(model_name)
        sd = model.state_dict()
        del model
        return hf_cfg, sd
    except (ValueError, KeyError):
        pass  # unknown model_type → raw read below

    def _file(name):
        if os.path.isdir(model_name):
            path = os.path.join(model_name, name)
            return path if os.path.exists(path) else None
        try:
            from transformers.utils import cached_file

            return cached_file(
                model_name, name, _raise_exceptions_for_missing_entries=False
            )
        except Exception:
            return None

    cfg_path = _file("config.json")
    if cfg_path is None:
        raise OSError(f"cannot load config.json for {model_name}")
    with open(cfg_path) as f:
        hf_cfg = SimpleNamespace(**json.load(f))

    st_path = _file("model.safetensors")
    if st_path is not None:
        from safetensors.torch import load_file

        return hf_cfg, load_file(st_path)
    bin_path = _file("pytorch_model.bin")
    if bin_path is None:
        raise OSError(f"no model.safetensors / pytorch_model.bin for {model_name}")
    import torch

    return hf_cfg, torch.load(bin_path, map_location="cpu", weights_only=True)


# --------------------------------------------------------------------------- #
# BERT family
# --------------------------------------------------------------------------- #


def bert_from_hf(state_dict: Mapping, num_layers: int) -> Dict[str, Any]:
    """Map an HF BertModel/BertForMaskedLM/BertForSequenceClassification state
    dict onto the bergen_tpu.models.bert tree."""
    sd = _strip_prefix(state_dict)
    p: Dict[str, Any] = {
        "embeddings": {
            "word": _t(sd["embeddings.word_embeddings.weight"]),
        },
        "layers": [],
    }
    # rope/alibi variants (GTE/nomic/jina) have no position table; nomic
    # names its embedding LayerNorm 'emb_ln' (fixed up in its branch below)
    if "embeddings.position_embeddings.weight" in sd:
        p["embeddings"]["position"] = _t(sd["embeddings.position_embeddings.weight"])
    if "embeddings.LayerNorm.weight" in sd:
        p["embeddings"]["ln"] = _ln(sd, "embeddings.LayerNorm")
    if "embeddings.token_type_embeddings.weight" in sd:
        p["embeddings"]["token_type"] = _t(sd["embeddings.token_type_embeddings.weight"])
    # GTE v1.5 layout (Alibaba-NLP NewModel via trust_remote_code in the
    # reference): fused qkv_proj, o_proj, gated up_gate_proj MLP
    # (down(up * act(gate)), fused weight ordered [up; gate]), attn_ln/mlp_ln
    if "encoder.layer.0.attention.qkv_proj.weight" in sd:
        for i in range(num_layers):
            pre = f"encoder.layer.{i}"
            qkv_w = _t(sd[f"{pre}.attention.qkv_proj.weight"]).T  # [D, 3D]
            D = qkv_w.shape[0]
            attn = {
                "q": {"kernel": qkv_w[:, :D]},
                "k": {"kernel": qkv_w[:, D : 2 * D]},
                "v": {"kernel": qkv_w[:, 2 * D :]},
                "o": _lin(sd, f"{pre}.attention.o_proj"),
            }
            if f"{pre}.attention.qkv_proj.bias" in sd:
                qkv_b = _t(sd[f"{pre}.attention.qkv_proj.bias"])
                attn["q"]["bias"] = qkv_b[:D]
                attn["k"]["bias"] = qkv_b[D : 2 * D]
                attn["v"]["bias"] = qkv_b[2 * D :]
            ug = _t(sd[f"{pre}.mlp.up_gate_proj.weight"]).T  # [D, 2I]
            I = ug.shape[1] // 2
            p["layers"].append(
                {
                    "attn": attn,
                    "attn_ln": _ln(sd, f"{pre}.attn_ln"),
                    "mlp_up": {"kernel": ug[:, :I]},
                    "mlp_gate": {"kernel": ug[:, I:]},
                    "mlp_out": _lin(sd, f"{pre}.mlp.down_proj"),
                    "mlp_ln": _ln(sd, f"{pre}.mlp_ln"),
                }
            )
        return p
    # nomic-embed layout (NomicBertModel via trust_remote_code): emb_ln,
    # encoder.layers.N.{attn.Wqkv/out_proj, norm1, norm2, mlp.fc11/fc12/fc2};
    # gated MLP = fc2(fc11(x)... up) * act(fc12 gate)
    if "encoder.layers.0.attn.Wqkv.weight" in sd:
        p["embeddings"]["ln"] = _ln(sd, "emb_ln")
        for i in range(num_layers):
            pre = f"encoder.layers.{i}"
            qkv_w = _t(sd[f"{pre}.attn.Wqkv.weight"]).T  # [D, 3D]
            D = qkv_w.shape[0]
            attn = {
                "q": {"kernel": qkv_w[:, :D]},
                "k": {"kernel": qkv_w[:, D : 2 * D]},
                "v": {"kernel": qkv_w[:, 2 * D :]},
                "o": _lin(sd, f"{pre}.attn.out_proj"),
            }
            if f"{pre}.attn.Wqkv.bias" in sd:
                qkv_b = _t(sd[f"{pre}.attn.Wqkv.bias"])
                attn["q"]["bias"] = qkv_b[:D]
                attn["k"]["bias"] = qkv_b[D : 2 * D]
                attn["v"]["bias"] = qkv_b[2 * D :]
            p["layers"].append(
                {
                    "attn": attn,
                    "attn_ln": _ln(sd, f"{pre}.norm1"),
                    "mlp_up": _lin(sd, f"{pre}.mlp.fc11"),
                    "mlp_gate": _lin(sd, f"{pre}.mlp.fc12"),
                    "mlp_out": _lin(sd, f"{pre}.mlp.fc2"),
                    "mlp_ln": _ln(sd, f"{pre}.norm2"),
                }
            )
        return p
    # jina-v2 layout (JinaBertModel via trust_remote_code): standard q/k/v +
    # geglu MLP {gated_layers [gate; up], wo, layernorm}; ALiBi has no weights
    if "encoder.layer.0.mlp.gated_layers.weight" in sd:
        for i in range(num_layers):
            pre = f"encoder.layer.{i}"
            gu = _t(sd[f"{pre}.mlp.gated_layers.weight"]).T  # [D, 2I]
            I = gu.shape[1] // 2
            p["layers"].append(
                {
                    "attn": {
                        "q": _lin(sd, f"{pre}.attention.self.query"),
                        "k": _lin(sd, f"{pre}.attention.self.key"),
                        "v": _lin(sd, f"{pre}.attention.self.value"),
                        "o": _lin(sd, f"{pre}.attention.output.dense"),
                    },
                    "attn_ln": _ln(sd, f"{pre}.attention.output.LayerNorm"),
                    # jina activates the FIRST half of gated_layers
                    "mlp_gate": {"kernel": gu[:, :I]},
                    "mlp_up": {"kernel": gu[:, I:]},
                    "mlp_out": _lin(sd, f"{pre}.mlp.wo"),
                    "mlp_ln": _ln(sd, f"{pre}.mlp.layernorm"),
                }
            )
        return p
    # DistilBERT layout (tasb): transformer.layer.N.{attention.{q,k,v,out}_lin,
    # sa_layer_norm, ffn.{lin1,lin2}, output_layer_norm} — same post-LN block
    if "transformer.layer.0.attention.q_lin.weight" in sd:
        for i in range(num_layers):
            pre = f"transformer.layer.{i}"
            p["layers"].append(
                {
                    "attn": {
                        "q": _lin(sd, f"{pre}.attention.q_lin"),
                        "k": _lin(sd, f"{pre}.attention.k_lin"),
                        "v": _lin(sd, f"{pre}.attention.v_lin"),
                        "o": _lin(sd, f"{pre}.attention.out_lin"),
                    },
                    "attn_ln": _ln(sd, f"{pre}.sa_layer_norm"),
                    "mlp_in": _lin(sd, f"{pre}.ffn.lin1"),
                    "mlp_out": _lin(sd, f"{pre}.ffn.lin2"),
                    "mlp_ln": _ln(sd, f"{pre}.output_layer_norm"),
                }
            )
        return p
    for i in range(num_layers):
        pre = f"encoder.layer.{i}"
        p["layers"].append(
            {
                "attn": {
                    "q": _lin(sd, f"{pre}.attention.self.query"),
                    "k": _lin(sd, f"{pre}.attention.self.key"),
                    "v": _lin(sd, f"{pre}.attention.self.value"),
                    "o": _lin(sd, f"{pre}.attention.output.dense"),
                },
                "attn_ln": _ln(sd, f"{pre}.attention.output.LayerNorm"),
                "mlp_in": _lin(sd, f"{pre}.intermediate.dense"),
                "mlp_out": _lin(sd, f"{pre}.output.dense"),
                "mlp_ln": _ln(sd, f"{pre}.output.LayerNorm"),
            }
        )
    if "pooler.dense.weight" in sd:
        p["pooler"] = _lin(sd, "pooler.dense")
    # MLM head (BertForMaskedLM layout)
    if "cls.predictions.transform.dense.weight" in sd:
        p["mlm"] = {
            "transform": _lin(sd, "cls.predictions.transform.dense"),
            "ln": _ln(sd, "cls.predictions.transform.LayerNorm"),
            "bias": _t(sd["cls.predictions.bias"]),
        }
    # sequence-classification head (BertForSequenceClassification layout)
    if "classifier.weight" in sd:
        p["classifier"] = _lin(sd, "classifier")
    # roberta classification head: classifier.dense (tanh) + classifier.out_proj
    # maps onto the pooler+classifier structure
    if "classifier.dense.weight" in sd:
        p["pooler"] = _lin(sd, "classifier.dense")
        p["classifier"] = _lin(sd, "classifier.out_proj")
    return p


# --------------------------------------------------------------------------- #
# Llama family
# --------------------------------------------------------------------------- #


def llama_from_hf(state_dict: Mapping, num_layers: int) -> Dict[str, Any]:
    """Map an HF LlamaForCausalLM (or MistralForCausalLM — identical layout)
    state dict onto the bergen_tpu.models.llama tree."""
    sd = _strip_prefix(state_dict, candidates=("model.",))
    p: Dict[str, Any] = {
        "embed": _t(sd["embed_tokens.weight"]),
        "layers": [],
        "final_norm": {"scale": _t(sd["norm.weight"])},
    }
    def _attn_lin(pre: str, name: str):
        entry = {"kernel": _t(sd[f"{pre}.self_attn.{name}.weight"]).T}
        if f"{pre}.self_attn.{name}.bias" in sd:  # qwen2-family qkv biases
            entry["bias"] = _t(sd[f"{pre}.self_attn.{name}.bias"])
        return entry

    def _attn_block(pre: str) -> Dict[str, Any]:
        if f"{pre}.self_attn.qkv_proj.weight" in sd:
            # phi-3 fuses q/k/v rows [q; k; v]; q's width equals o_proj's
            # in-features (H*Dh), k and v split the rest evenly
            qkv = _t(sd[f"{pre}.self_attn.qkv_proj.weight"]).T  # [D, q+k+v]
            o = _t(sd[f"{pre}.self_attn.o_proj.weight"]).T      # [H*Dh, D]
            q_w = o.shape[0]
            kv_w = (qkv.shape[1] - q_w) // 2
            return {
                "q": {"kernel": qkv[:, :q_w]},
                "k": {"kernel": qkv[:, q_w : q_w + kv_w]},
                "v": {"kernel": qkv[:, q_w + kv_w :]},
                "o": {"kernel": o},
            }
        return {
            "q": _attn_lin(pre, "q_proj"),
            "k": _attn_lin(pre, "k_proj"),
            "v": _attn_lin(pre, "v_proj"),
            "o": _attn_lin(pre, "o_proj"),
        }

    for i in range(num_layers):
        pre = f"layers.{i}"
        entry: Dict[str, Any] = {
            "attn": _attn_block(pre),
            "attn_norm": {"scale": _t(sd[f"{pre}.input_layernorm.weight"])},
        }
        if f"{pre}.pre_feedforward_layernorm.weight" in sd:
            # gemma-2 sandwich norms: post_attention norms the attn OUTPUT,
            # pre/post_feedforward wrap the MLP
            entry["post_attn_norm"] = {
                "scale": _t(sd[f"{pre}.post_attention_layernorm.weight"])
            }
            entry["mlp_norm"] = {
                "scale": _t(sd[f"{pre}.pre_feedforward_layernorm.weight"])
            }
            entry["post_mlp_norm"] = {
                "scale": _t(sd[f"{pre}.post_feedforward_layernorm.weight"])
            }
        elif f"{pre}.post_attention_layernorm.weight" in sd:
            entry["mlp_norm"] = {
                "scale": _t(sd[f"{pre}.post_attention_layernorm.weight"])
            }
        # else: cohere parallel block — single input_layernorm per layer
        if f"{pre}.mlp.gate_up_proj.weight" in sd:
            # phi-3 fuses [gate; up]
            gu = _t(sd[f"{pre}.mlp.gate_up_proj.weight"]).T  # [D, 2I]
            half = gu.shape[1] // 2
            entry["mlp"] = {
                "gate": {"kernel": gu[:, :half]},
                "up": {"kernel": gu[:, half:]},
                "down": {"kernel": _t(sd[f"{pre}.mlp.down_proj.weight"]).T},
            }
        elif f"{pre}.mlp.gate_proj.weight" in sd:
            entry["mlp"] = {
                "gate": {"kernel": _t(sd[f"{pre}.mlp.gate_proj.weight"]).T},
                "up": {"kernel": _t(sd[f"{pre}.mlp.up_proj.weight"]).T},
                "down": {"kernel": _t(sd[f"{pre}.mlp.down_proj.weight"]).T},
            }
        else:
            # mixtral sparse MoE: stack experts into [E, d_in, d_out] tensors
            # (w1=gate, w3=up, w2=down); router = block_sparse_moe.gate
            moe_pre = f"{pre}.block_sparse_moe"
            n_exp = 0
            while f"{moe_pre}.experts.{n_exp}.w1.weight" in sd:
                n_exp += 1
            entry["moe"] = {
                "router": {"kernel": _t(sd[f"{moe_pre}.gate.weight"]).T},
                "gate": {"kernel": np.stack([
                    _t(sd[f"{moe_pre}.experts.{e}.w1.weight"]).T
                    for e in range(n_exp)
                ])},
                "up": {"kernel": np.stack([
                    _t(sd[f"{moe_pre}.experts.{e}.w3.weight"]).T
                    for e in range(n_exp)
                ])},
                "down": {"kernel": np.stack([
                    _t(sd[f"{moe_pre}.experts.{e}.w2.weight"]).T
                    for e in range(n_exp)
                ])},
            }
        p["layers"].append(entry)
    if "lm_head.weight" in state_dict:
        p["lm_head"] = {"kernel": _t(state_dict["lm_head.weight"]).T}
    # tied-embedding models (e.g. gemma/tinyllama variants) reuse embed
    return p


# --------------------------------------------------------------------------- #
# device placement
# --------------------------------------------------------------------------- #


def to_device_tree(params, dtype=jnp.bfloat16, norm_keys=("ln", "scale", "bias",
                                                          "attn_norm", "mlp_norm",
                                                          "final_norm")):
    """Cast weights to bf16 for the MXU; keep norm parameters fp32."""
    import jax

    def cast(path, leaf):
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.integer):
            return jnp.asarray(leaf)  # quantized int weights stay int
        names = {getattr(k, "key", getattr(k, "idx", None)) for k in path}
        keep_fp32 = names & set(norm_keys) | (
            {"kernel_scale", "kernel_scale_a8", "kernel_scale4"} & names)
        target = jnp.float32 if keep_fp32 else dtype
        return jnp.asarray(leaf, dtype=target)

    return jax.tree_util.tree_map_with_path(cast, params)


def quantize_tree_int8(params, min_size: int = 1 << 16, mxu: bool = False):
    """Weight-only int8 per-output-channel quantization of linear kernels
    (the TPU stand-in for bitsandbytes int8, reference llm.py:94-127): each
    large 'kernel' leaf becomes int8 values + f32 per-column scales, cutting
    weight HBM ~2x vs bf16; dequantization happens on the fly in the matmul
    (see llama._proj).

    mxu=True (W8A8): store the scale under 'kernel_scale_a8' instead, which
    makes llama._proj quantize activations per-row and run the matmul as a
    native int8xint8 MXU dot.  Weight-only int8 dequantizes to bf16 at
    trace time (XLA hoists the loop-invariant dequant out of the decode
    scan, so decode still READS bf16 weights); the W8A8 path keeps weights
    int8 in HBM — half the weight-read bytes of the memory-bound decode
    step — at the cost of per-row activation rounding."""
    import jax

    scale_key = "kernel_scale_a8" if mxu else "kernel_scale"

    def visit(node):
        if isinstance(node, dict):
            if "kernel" in node and not isinstance(node["kernel"], dict):
                k = node["kernel"]
                if k.ndim == 2 and k.size >= min_size:
                    kf = jnp.asarray(k, jnp.float32)
                    scale = jnp.max(jnp.abs(kf), axis=0) / 127.0
                    scale = jnp.maximum(scale, 1e-8)
                    node["kernel_q"] = jnp.round(kf / scale).astype(jnp.int8)
                    node[scale_key] = scale
                    del node["kernel"]
            for v in node.values():
                visit(v)
        elif isinstance(node, list):
            for v in node:
                visit(v)

    visit(params)
    return params


def quantize_encoder_layers_w8a8(params):
    """W8A8-quantize the ENCODER LAYER linears of a BERT-family tree
    (attn q/k/v/o + mlp_in/mlp_out) for the fused int8-MXU layer kernel
    (``ops/encoder_attention.encoder_layer_q``).

    Embeddings, pooler, and MLM head stay untouched: they either feed the
    layers (embedding LN keeps f32) or sit after them (pooling/MLM quality
    is dominated by the hidden states, and the MLM tied-embedding matmul
    has no per-column scale home).  Per-output-channel weight scales;
    activations are quantized per-row at run time inside the kernel.
    Returns a NEW layers list on the same tree (non-layer leaves shared)."""
    def quant_linear(p):
        kf = jnp.asarray(p["kernel"], jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(kf), axis=0) / 127.0, 1e-8)
        return {
            "kernel_q": jnp.round(kf / scale).astype(jnp.int8),
            "kernel_scale_a8": scale,
            "bias": jnp.asarray(p["bias"], jnp.float32),
        }

    out = dict(params)
    layers = []
    for layer in params["layers"]:
        if "mlp_in" not in layer:  # gated-MLP encoders (mlp_up/mlp_gate)
            raise ValueError(
                "w8a8 encoder quantization covers plain-MLP BERT layers "
                "only (the fused layer kernel's envelope)")
        ql = dict(layer)
        ql["attn"] = {n: quant_linear(layer["attn"][n])
                      for n in ("q", "k", "v", "o")}
        for n in ("mlp_in", "mlp_out"):
            ql[n] = quant_linear(layer[n])
        layers.append(ql)
    out["layers"] = layers
    return out


def dequantize_linear_w8a8(p):
    """bf16 view of a w8a8-quantized linear (XLA fallback paths where the
    fused kernel doesn't apply — shapes outside the VMEM budget, CPU)."""
    return {
        "kernel": (p["kernel_q"].astype(jnp.float32)
                   * p["kernel_scale_a8"]).astype(jnp.bfloat16),
        "bias": p["bias"],
    }


def quantize_tree_int4(params, min_size: int = 1 << 16, group: int = 128,
                       packed: bool = False):
    """Weight-only int4 GROUP-WISE quantization (the TPU stand-in for
    bitsandbytes 4-bit, reference llm.py:94-121): each large kernel leaf
    becomes jnp.int4 values (XLA packs two nibbles per byte in HBM on TPU)
    plus f32 scales per (group of `group` input rows, output column).
    Group-wise scaling keeps quality close to nf4 at equal memory.

    ``packed=True`` stores the same nibbles hand-packed two-per-int8-byte
    (``kernel_q4p``, shape [d_in//2, d_out]; even d_in rows in the low
    nibble, odd in the high) instead of relying on the platform's jnp.int4
    support — identical HBM bytes, and int8 jit arguments work everywhere
    (the tunneled axon plugin cannot take S4 arrays as jit args).

    **Dot-identity encoding** (packed mode): the stored high nibble is
    ``hi - m`` where ``m = (lo < 0)``.  This makes the packed byte directly
    usable as a matmul operand: with ``u = 16*(hi-m) + (lo mod 16)`` as a
    signed int8,

        dot(x, u)            == 16*dot(x, hi) + dot(x, lo)
        dot(x, u<<4 mod 256) == 16*dot(x, lo)

    so the weight-streaming kernel (``ops/int4_matmul.py``) recovers both
    nibble dots from two MXU matmuls on byte-valued operands — no per-weight
    unpack-and-scale in the VPU, which was 3.8x slower than the dots it fed
    (measured on-chip, round 4).  ``unpack_int4`` inverts the encoding
    exactly (``hi = (u >> 4) + ((u >> 3) & 1)``), so the XLA dequant path
    and quantization tests see the same [-7, 7] nibbles as unpacked mode.
    The nibble grid is [-7, 7] (absmax/7 scaling, as before), which keeps
    ``hi - m`` within int4 range."""
    def visit(node):
        if isinstance(node, dict):
            if "kernel" in node and not isinstance(node["kernel"], dict):
                k = node["kernel"]
                if k.ndim == 2 and k.size >= min_size and k.shape[0] % group == 0:
                    kf = jnp.asarray(k, jnp.float32)
                    d_in, d_out = kf.shape
                    g = kf.reshape(d_in // group, group, d_out)
                    scale = jnp.max(jnp.abs(g), axis=1) / 7.0  # [n_groups, d_out]
                    scale = jnp.maximum(scale, 1e-8)
                    q = jnp.clip(jnp.round(g / scale[:, None, :]), -7, 7)
                    q = q.reshape(d_in, d_out)
                    if packed:
                        if d_in % 2 != 0:
                            # never silently fall back to S4 storage — packed
                            # mode exists because some runtimes reject S4 jit
                            # args, and a silent fallback crashes far away
                            raise ValueError(
                                f"packed int4 needs an even d_in, got {d_in} "
                                f"(group={group}); pick an even group size"
                            )
                        q8 = q.astype(jnp.int8)
                        lo, hi = q8[0::2], q8[1::2]
                        # dot-identity encoding: hi' = hi - (lo < 0); with
                        # nibbles in [-7, 7], hi' stays in [-8, 7]
                        m = (lo < 0).astype(jnp.int8)
                        node["kernel_q4p"] = (
                            ((hi - m) << 4) | (lo & 0x0F)
                        ).astype(jnp.int8)
                    else:
                        node["kernel_q4"] = q.astype(jnp.int4)
                    node["kernel_scale4"] = scale
                    del node["kernel"]
            for v in node.values():
                visit(v)
        elif isinstance(node, list):
            for v in node:
                visit(v)

    visit(params)
    return params


def unpack_int4(kernel_q4p):
    """[d_in//2, d_out] packed nibbles → [d_in, d_out] int8 in [-7, 7].

    Inverts the dot-identity encoding (see ``quantize_tree_int4``):
    low = (b << 4) >> 4 (arithmetic shifts sign-extend), and the stored
    high nibble is ``hi - (lo < 0)``, so ``hi = (b >> 4) + ((b >> 3) & 1)``
    — bit 3 of the byte is the low nibble's sign bit."""
    lo = jnp.right_shift(jnp.left_shift(kernel_q4p, 4), 4)
    hi = jnp.right_shift(kernel_q4p, 4) + (
        jnp.right_shift(kernel_q4p, 3) & 1)
    d2, d_out = kernel_q4p.shape
    return jnp.stack([lo, hi], axis=1).reshape(d2 * 2, d_out)


def dequantize_int4(kernel_q4, kernel_scale4, dtype):
    """[d_in, d_out] int4 + [n_groups, d_out] scales → dense kernel."""
    d_in, d_out = kernel_q4.shape
    n_groups = kernel_scale4.shape[0]
    g = kernel_q4.astype(dtype).reshape(n_groups, d_in // n_groups, d_out)
    return (g * kernel_scale4[:, None, :].astype(dtype)).reshape(d_in, d_out)


def hf_model_to_tree(hf_model, family: str) -> Dict[str, Any]:
    """Convenience: convert a live HF torch model (family: 'bert' | 'llama')."""
    sd = hf_model.state_dict()
    cfg = hf_model.config
    if family == "bert":
        return bert_from_hf(sd, cfg.num_hidden_layers)
    if family == "llama":
        return llama_from_hf(sd, cfg.num_hidden_layers)
    raise ValueError(f"Unknown family '{family}'")
