"""Query translation before retrieval (reference
``models/query_generators/translate_query.py``: NLLB-200-3.3B via the HF
pipeline).  Runs the JAX M2M100/NLLB model with the language-forced BOS token."""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from bergen_tpu.models import m2m100
from bergen_tpu.models.query_generators.base import QueryGenerator


class TranslateQuery(QueryGenerator):
    def __init__(self, model_name: str = "facebook/nllb-200-3.3B",
                 src_lang: str = "deu_Latn", tgt_lang: str = "eng_Latn",
                 batch_size: int = 16, max_new_tokens: int = 64,
                 max_length: int = 256):
        from transformers import AutoConfig, AutoModelForSeq2SeqLM, AutoTokenizer

        self.name = f"translate_{src_lang}_{tgt_lang}"
        self.tokenizer = AutoTokenizer.from_pretrained(model_name, src_lang=src_lang)
        hf_cfg = AutoConfig.from_pretrained(model_name)
        self.cfg = m2m100.M2M100Config.from_hf(hf_cfg)
        hf = AutoModelForSeq2SeqLM.from_pretrained(model_name)
        self.params = jax.tree.map(jnp.asarray,
                                   m2m100.m2m100_from_hf(hf.state_dict(), self.cfg))
        del hf
        self.tgt_id = self.tokenizer.convert_tokens_to_ids(tgt_lang)
        self.batch_size = batch_size
        self.max_new_tokens = max_new_tokens
        self.max_length = max_length

    def generate(self, user_questions: List[str]) -> List[str]:
        out = []
        for s in range(0, len(user_questions), self.batch_size):
            batch = user_questions[s : s + self.batch_size]
            enc = self.tokenizer(batch, padding="longest", truncation=True,
                                 max_length=self.max_length, return_tensors="np")
            toks = m2m100.greedy_generate(
                self.params, self.cfg,
                jnp.asarray(enc["input_ids"].astype(np.int32)),
                jnp.asarray(enc["attention_mask"].astype(np.int32)),
                self.max_new_tokens, forced_bos_token_id=self.tgt_id,
            )
            out.extend(self.tokenizer.batch_decode(np.asarray(toks),
                                                   skip_special_tokens=True))
        return out
