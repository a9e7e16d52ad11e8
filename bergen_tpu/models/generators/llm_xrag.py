"""xRAG generator (reference ``models/generators/xrag.py`` + ``llm_xrag.py``):
extreme context compression — each retrieved document is represented by ONE
retrieval embedding, projected by a small MLP and injected at the ``<xRAG>``
token position of the prompt (soft-prompt injection via llama.forward
input_embeds).  The projector weights come from an xRAG checkpoint
(``projector.*`` keys) when present; the retriever embedding comes from the
pipeline's dense retriever."""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from bergen_tpu.models import convert, llama
from bergen_tpu.models.generators.base import Generator

XRAG_TOKEN = "<xRAG>"


class XRAG(Generator):
    def __init__(
        self,
        model_name: str,
        retriever_name: str | None = None,
        batch_size: int = 4,
        max_new_tokens: int = 64,
        max_length: int | None = 1024,
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
        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.tokenizer.padding_side = "left"
        self.tokenizer.pad_token = (
            self.tokenizer.bos_token or self.tokenizer.pad_token
            or self.tokenizer.eos_token
        )
        if XRAG_TOKEN not in self.tokenizer.get_vocab():
            self.tokenizer.add_tokens([XRAG_TOKEN])
        self.xrag_id = self.tokenizer.convert_tokens_to_ids(XRAG_TOKEN)

        hf_cfg = AutoConfig.from_pretrained(model_name)
        self.cfg = llama.LlamaConfig.from_hf(hf_cfg)
        on_tpu = jax.default_backend() == "tpu"
        self.dtype = jnp.bfloat16 if on_tpu else jnp.float32
        hf = AutoModelForCausalLM.from_pretrained(model_name)
        sd = hf.state_dict()
        self.params = convert.to_device_tree(
            convert.llama_from_hf(sd, self.cfg.num_layers), dtype=self.dtype
        )
        # projector: xRAG checkpoints store projector.{0,2}.{weight,bias}
        proj_keys = [k for k in sd if k.startswith("projector.")]
        if proj_keys:
            self.projector = [
                {
                    "kernel": np.asarray(sd[f"projector.{i}.weight"].T),
                    "bias": np.asarray(sd[f"projector.{i}.bias"]),
                }
                for i in (0, 2)
            ]
        else:
            self.projector = None
        del hf

        # retrieval-side encoder producing the single doc embedding
        if retriever_name is not None:
            from bergen_tpu.models.retrievers.dense import DenseRetriever

            self.retriever = DenseRetriever(
                retriever_name, max_len=512, pooler="mean", similarity="dot",
            )
        else:
            self.retriever = None

        cfg = self.cfg

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

    def _project(self, doc_emb: np.ndarray) -> np.ndarray:
        """retrieval embedding [D_r] → decoder space [D] (identity-ish pad
        when no trained projector exists)."""
        if self.projector is not None:
            h = doc_emb @ self.projector[0]["kernel"] + self.projector[0]["bias"]
            h = np.where(h > 0, h, 0)  # relu between projector layers
            return h @ self.projector[1]["kernel"] + self.projector[1]["bias"]
        D = self.cfg.hidden_size
        out = np.zeros((D,), np.float32)
        n = min(D, doc_emb.shape[-1])
        out[:n] = doc_emb[:n]
        return out

    def format_instruction(self, sample: dict, eval: bool = True):
        question = sample["query"]
        n_docs = len(sample.get("doc") or [])
        docs_part = "".join(f"{XRAG_TOKEN}\n" for _ in range(n_docs))
        prompt = f"Background:\n{docs_part}\nQuestion: {question}\nAnswer: "
        return prompt, None

    def generate(self, prompts: List[str]) -> List[str]:
        enc = self.tokenizer(prompts, truncation=True,
                             max_length=self.max_length, padding="longest",
                             return_tensors="np")
        toks = self._gen(
            self.params, None,
            jnp.asarray(enc["input_ids"].astype(np.int32)),
            jnp.asarray(enc["attention_mask"].astype(np.int32)),
            self.max_new_tokens,
        )
        return self.tokenizer.batch_decode(np.asarray(toks),
                                           skip_special_tokens=True)

    def eval(self, dataset):
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
                jnp.take(jnp.asarray(self.params["embed"]),
                         jnp.asarray(jnp.clip(ii, 0, self.cfg.vocab_size - 1)),
                         axis=0),
                np.float32,
            )
            for r, row in enumerate(batch):
                docs = list(row.get("doc") or [])
                if not docs:
                    continue
                if self.retriever is None:
                    raise RuntimeError(
                        "XRAG received documents but no retriever_name was "
                        "configured — the <xRAG> placeholders would carry no "
                        "document information"
                    )
                doc_embs = self.retriever.encode(docs, "doc")
                slots = np.where(ii[r] == self.xrag_id)[0]
                for slot, emb in zip(slots, doc_embs):
                    embeds[r, slot] = self._project(emb)
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
