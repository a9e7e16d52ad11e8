"""Provence joint rerank+prune context processor (arXiv 2501.16214; reference
``models/context_processors/provence.py`` loads the custom HF model with
trust_remote_code).

Native implementation: a DeBERTa backbone with two heads over the (query, doc)
pair — a ranking score (ContextPooler) and a per-token binary keep-probability
(token classification).  Sentences whose mean token keep-probability clears the
threshold survive; optional reranking-by-score reorders and truncates to top_k.
Provence checkpoints convert via ``deberta_from_hf`` (the token head maps from
``token_classifier.*``/``classifier.*`` keys when present)."""

from __future__ import annotations

from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from bergen_tpu.models.context_processors.base import ContextProcessor, get_compression
from bergen_tpu.models.context_processors.recomp import _sent_tokenize


class ProvenceCompressor(ContextProcessor):
    def __init__(
        self,
        model_name,
        name: str = "provence",
        threshold: float = 0.1,
        batch_size: int = 32,
        always_select_title: bool = True,
        enable_warnings: bool = True,
        reorder: bool = False,
        top_k: int = 5,
        max_len: int = 512,
    ):
        super().__init__()
        from transformers import AutoConfig, AutoModel, AutoTokenizer

        from bergen_tpu.models import deberta

        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        hf_cfg = AutoConfig.from_pretrained(model_name)
        self.cfg = deberta.DebertaConfig.from_hf(hf_cfg)
        hf = AutoModel.from_pretrained(model_name)
        sd = hf.state_dict()
        self.params = deberta.deberta_from_hf(sd, self.cfg.num_layers)
        # token-level keep head (provence checkpoints) — fall back to a
        # passthrough that keeps everything if absent
        for prefix in ("token_classifier", "token_head", "qa_outputs"):
            if f"{prefix}.weight" in sd:
                self.params["token_head"] = {
                    "kernel": np.asarray(sd[f"{prefix}.weight"].T.numpy()),
                    "bias": np.asarray(sd[f"{prefix}.bias"].numpy()),
                }
                break
        del hf
        self.threshold = threshold
        self.batch_size = batch_size
        self.always_select_title = always_select_title
        self.reorder = reorder
        self.top_k = top_k
        self.max_len = max_len
        self.name = f"{name}_t{threshold}_title{always_select_title}_r{reorder}"
        cfg = self.cfg
        from bergen_tpu.models.deberta import encode as deberta_encode
        from bergen_tpu.models.core import dense

        @jax.jit
        def forward(params, input_ids, attention_mask):
            hidden = deberta_encode(params, cfg, input_ids, attention_mask)
            rank = None
            if "pooler" in params and "classifier" in params:
                from bergen_tpu.models.core import ACT_FNS

                pooled = ACT_FNS[cfg.pooler_hidden_act](
                    dense(params["pooler"], hidden[:, 0])
                )
                rank = dense(params["classifier"], pooled)[:, 0]
            if "token_head" in params:
                keep = jax.nn.sigmoid(dense(params["token_head"], hidden)[..., 0])
            else:
                keep = jnp.ones(hidden.shape[:2], jnp.float32)
            if rank is None:
                rank = keep.mean(axis=1)
            return rank.astype(jnp.float32), keep.astype(jnp.float32)

        self._forward = forward

    def _score_doc(self, query: str, sentences: List[str]):
        """Per-sentence mean keep probability + doc rank score."""
        text = " ".join(sentences)
        enc = self.tokenizer(
            query, text, truncation="only_second", max_length=self.max_len,
            return_offsets_mapping=True, return_tensors="np",
        )
        ii = enc["input_ids"].astype(np.int32)
        am = enc["attention_mask"].astype(np.int32)
        rank, keep = self._forward(self.params, jnp.asarray(ii), jnp.asarray(am))
        keep = np.asarray(keep)[0]
        offsets = enc["offset_mapping"][0]
        # char spans of each sentence within the joined doc text
        spans, pos = [], 0
        for s in sentences:
            start = text.find(s, pos)
            spans.append((start, start + len(s)))
            pos = start + len(s)
        # the doc is the SECOND segment: locate its token range as the tokens
        # whose offsets restart after the query segment
        seq_ids = enc.get("token_type_ids")
        sent_probs = []
        for (cs, ce) in spans:
            probs = []
            seen_query_end = False
            qlen = len(self.tokenizer(query, add_special_tokens=False)["input_ids"])
            for t, (a, b) in enumerate(offsets):
                if a == b:
                    continue
                if t <= qlen:
                    continue
                if a >= cs and b <= ce:
                    probs.append(keep[t])
            sent_probs.append(float(np.mean(probs)) if probs else 0.0)
        return float(np.asarray(rank)[0]), sent_probs

    def _process(self, contexts: List[List[str]], queries: List[str]):
        pruned, rank_scores = [], []
        for q, docs in zip(queries, contexts):
            row, row_scores = [], []
            for doc in docs:
                sents = _sent_tokenize(doc)
                if not sents:
                    row.append("")
                    row_scores.append(0.0)
                    continue
                title, body = sents[0], sents[1:]
                if body:
                    rank, probs = self._score_doc(q, body)
                else:
                    rank, probs = 0.0, []
                keep = [s for s, p in zip(body, probs) if p > self.threshold]
                pieces = ([title] if self.always_select_title else []) + keep
                row.append(" ".join(pieces))
                row_scores.append(rank)
            pruned.append(row)
            rank_scores.append(row_scores)

        comps = [get_compression(o, p) for o, p in zip(contexts, pruned)]
        if self.reorder:
            out = []
            for row, scores in zip(pruned, rank_scores):
                idx = np.argsort(scores)[::-1][: self.top_k]
                out.append([row[i] for i in idx])
            pruned = out
        return pruned, {"context_compression": float(np.mean(comps))}
