"""COCOM context-compression generator (reference
``models/generators/llm_cocom.py`` + external ``cocom`` package).

Concept (arXiv 2407.09252): a compressor LM encodes each retrieved document
into ``mem_tokens`` memory embeddings; the decoder LM answers from the compact
memory instead of raw text, shrinking the prompt by ~(doc_len / mem_tokens)x.

JAX-native inference implementation: compressor = the same llama backbone run
over ``doc + [MEM]*mem_tokens``; the hidden states at the MEM positions become
the document's memory embeddings, which are spliced into the decoder prompt as
soft tokens (llama.forward input_embeds).  Checkpoints trained with the
reference's COCOM produce compatible weights after conversion (compressor and
decoder share the backbone unless ``compr_model_name`` differs)."""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from bergen_tpu.models import convert, llama
from bergen_tpu.models.generators.base import Generator


class COCOM(Generator):
    def __init__(
        self,
        model_name: str,
        batch_size: int = 8,
        max_new_tokens: int = 64,
        max_length: int | None = 1024,
        mem_tokens: int = 16,
        compr_model_name: str | None = None,
        prompt=None,
        max_doc_len: int = 10**10,
        **_ignored,
    ):
        super().__init__(
            model_name=model_name, batch_size=batch_size,
            max_new_tokens=max_new_tokens, max_doc_len=max_doc_len,
            max_length=max_length,
        )
        from transformers import AutoConfig, AutoModelForCausalLM, AutoTokenizer

        self.prompt = prompt
        self.mem_tokens = mem_tokens
        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.tokenizer.padding_side = "left"
        self.tokenizer.pad_token = (
            self.tokenizer.bos_token or self.tokenizer.pad_token
            or self.tokenizer.eos_token
        )
        hf_cfg = AutoConfig.from_pretrained(model_name)
        self.cfg = llama.LlamaConfig.from_hf(hf_cfg)
        on_tpu = jax.default_backend() == "tpu"
        self.dtype = jnp.bfloat16 if on_tpu else jnp.float32
        hf = AutoModelForCausalLM.from_pretrained(model_name)
        self.params = convert.to_device_tree(
            convert.llama_from_hf(hf.state_dict(), self.cfg.num_layers),
            dtype=self.dtype,
        )
        del hf
        if compr_model_name and compr_model_name != model_name:
            chf = AutoModelForCausalLM.from_pretrained(compr_model_name)
            self.compr_cfg = llama.LlamaConfig.from_hf(chf.config)
            self.compr_params = convert.to_device_tree(
                convert.llama_from_hf(chf.state_dict(), self.compr_cfg.num_layers),
                dtype=self.dtype,
            )
            del chf
        else:
            self.compr_cfg = self.cfg
            self.compr_params = self.params

        cfg = self.cfg

        def _compress(params, input_ids, attention_mask, n_mem):
            """Hidden states at the trailing n_mem positions → memory."""
            B, S = input_ids.shape
            cache = llama.init_cache(self.compr_cfg, B, S, dtype=self.dtype,
                                      flat=False)
            positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
            causal = jnp.tril(jnp.ones((S, S), bool))
            mask = causal[None] & attention_mask[:, None, :].astype(bool)
            # reuse forward but read pre-logits hidden: cheap trick — embed
            # memory from the final-norm hidden by re-running the trunk
            x = jnp.take(params["embed"], input_ids, axis=0)
            inv_freq = llama.rope_frequencies(self.compr_cfg)
            cursor = cache["cursor"]
            for li, layer in enumerate(params["layers"]):
                h = llama.rmsnorm(layer["attn_norm"], x, self.compr_cfg.rms_norm_eps)
                a, _, _ = llama._attention(
                    layer, self.compr_cfg, h, positions, inv_freq,
                    cache["k"], cache["v"], li, cursor, mask,
                )
                x = x + a
                h = llama.rmsnorm(layer["mlp_norm"], x, self.compr_cfg.rms_norm_eps)
                x = x + llama._mlp(layer, h)
            x = llama.rmsnorm(params["final_norm"], x, self.compr_cfg.rms_norm_eps)
            return x[:, -n_mem:]  # [B, n_mem, D]

        self._compress = jax.jit(_compress, static_argnames=("n_mem",))

        def _gen(params, input_embeds, input_ids, attention_mask,
                 max_new_tokens):
            return llama.greedy_generate(
                params, cfg, input_ids, attention_mask, max_new_tokens,
                eos_token_id=self.tokenizer.eos_token_id,
                pad_token_id=self.tokenizer.pad_token_id,
                cache_dtype=self.dtype, input_embeds=input_embeds,
            )

        self._gen = jax.jit(_gen, static_argnames=("max_new_tokens",))

    # ------------------------------------------------------------------ #

    def compress_docs(self, docs: List[str]) -> np.ndarray:
        """[n_docs, mem_tokens, D] memory embeddings."""
        mem_pad = self.tokenizer.pad_token * self.mem_tokens  # placeholder ids
        enc = self.tokenizer(
            [d + mem_pad for d in docs], truncation=True,
            max_length=(self.max_length or 1024), padding="longest",
            return_tensors="np",
        )
        out = self._compress(
            self.compr_params,
            jnp.asarray(enc["input_ids"], jnp.int32),
            jnp.asarray(enc["attention_mask"], jnp.int32),
            self.mem_tokens,
        )
        return np.asarray(out, np.float32)

    def format_instruction(self, sample: dict, eval: bool = True):
        question = sample["query"]
        n_docs = len(sample.get("doc") or [])
        placeholder = self.tokenizer.pad_token * (self.mem_tokens * n_docs)
        prompt = (
            f"Background:\n{placeholder}\n\nQuestion: {question}\nAnswer: "
        )
        return prompt, None

    def generate(self, prompts: List[str]) -> List[str]:
        # plain path (no docs compressed): delegate to token generation
        enc = self.tokenizer(prompts, truncation=True,
                             max_length=self.max_length, padding="longest",
                             return_tensors="np")
        toks = self._gen(
            self.params, None,
            jnp.asarray(enc["input_ids"], jnp.int32),
            jnp.asarray(enc["attention_mask"], jnp.int32),
            self.max_new_tokens,
        )
        return self.tokenizer.batch_decode(np.asarray(toks),
                                           skip_special_tokens=True)

    def eval(self, dataset):
        """Per-batch: compress docs → splice memory embeddings at the
        placeholder positions → greedy decode."""
        query_ids, queries, instructions, responses, labels, ranking_labels = (
            [], [], [], [], [], []
        )
        rows = list(dataset)
        for s in range(0, len(rows), self.batch_size):
            batch = rows[s : s + self.batch_size]
            prompts = [self.format_instruction(r)[0] for r in batch]
            enc = self.tokenizer(prompts, padding="longest", return_tensors="np")
            ii = enc["input_ids"].astype(np.int32)
            am = enc["attention_mask"].astype(np.int32)
            embeds = np.array(
                jnp.take(jnp.asarray(self.params["embed"]), jnp.asarray(ii),
                         axis=0),
                np.float32,
            )
            pad_id = self.tokenizer.pad_token_id
            for r, row in enumerate(batch):
                docs = row.get("doc") or []
                if not docs:
                    continue
                mem = self.compress_docs(list(docs))  # [n, mem, D]
                flat = mem.reshape(-1, mem.shape[-1])
                # placeholder = pad tokens inside the valid region; pad_token
                # aliases bos_token on llama-family tokenizers, so a leading
                # BOS also matches — keep only the LAST n_expected matches
                # (the placeholders are contiguous inside the prompt body)
                slots = np.where((ii[r] == pad_id) & (am[r] == 1))[0]
                n = min(len(flat), self.mem_tokens * len(docs), len(slots))
                slots = slots[-n:] if n else slots[:0]
                embeds[r, slots] = flat[:n]
            toks = self._gen(
                self.params, jnp.asarray(embeds, self.dtype),
                jnp.asarray(ii), jnp.asarray(am), self.max_new_tokens,
            )
            decoded = self.tokenizer.batch_decode(
                np.asarray(toks), skip_special_tokens=True
            )
            for row, prompt, resp in zip(batch, prompts, decoded):
                query_ids.append(row["q_id"])
                queries.append(row["query"])
                instructions.append(prompt)
                responses.append(resp)
                labels.append(row.get("label"))
                ranking_labels.append(row.get("ranking_labels"))
        return query_ids, queries, instructions, responses, labels, ranking_labels
