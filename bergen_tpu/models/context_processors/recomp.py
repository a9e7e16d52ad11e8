"""RECOMP context compression (arXiv 2310.04408; reference
``models/context_processors/recomp.py``).

Extractive: a sentence bi-encoder scores title-prefixed sentences against the
query; per doc keep the top-k (or above-threshold) sentences.  The encoder is
the JAX BERT with mean pooling — the sentence scoring is one batched jitted
encode + a host dot product (tiny).

Abstractive: T5 summarizer; implemented against the JAX T5 when available and
otherwise explicitly unsupported (T5 port is a later milestone)."""

from __future__ import annotations

from typing import List

import numpy as np

from bergen_tpu.models.context_processors.base import ContextProcessor


def _sent_tokenize(text: str) -> List[str]:
    try:
        import nltk

        return nltk.sent_tokenize(text)
    except LookupError:  # punkt unavailable offline — regex fallback
        import re

        parts = re.split(r"(?<=[.!?])\s+", text.strip())
        return [p for p in parts if p]


class RecompExtractiveCompressor(ContextProcessor):
    def __init__(self, model_name="fangyuan/nq_extractive_compressor",
                 batch_size=32, max_len=512, top_k=3, threshold=None,
                 alway_select_title=True):
        super().__init__()
        from bergen_tpu.models.retrievers.dense import DenseRetriever

        self.encoder = DenseRetriever(
            model_name, max_len=max_len, pooler="mean", similarity="dot",
            batch_size=batch_size,
        )
        self.model_name = model_name
        self.top_k = top_k
        self.threshold = threshold
        self.alway_select_title = alway_select_title
        self.name = (
            f"recomp_Ext_top{top_k}" if threshold is None
            else f"recomp_Ext_t{threshold}"
        )
        self.predefined_context_processing_metrics = ["context_compression"]

    def _process(self, contexts: List[List[str]], queries: List[str]):
        sent_texts, keys = [], []  # flattened (query_i, doc_j, sent_k)
        sents: dict = {}
        titles: dict = {}
        for i, docs in enumerate(contexts):
            for j, doc in enumerate(docs):
                pieces = _sent_tokenize(doc)
                if not pieces:
                    titles[(i, j)] = ""
                    sents[(i, j)] = []
                    continue
                titles[(i, j)] = pieces[0]
                sents[(i, j)] = pieces[1:]
                for k, s in enumerate(pieces[1:]):
                    sent_texts.append(pieces[0] + " " + s)
                    keys.append((i, j, k))

        q_embs = self.encoder.encode(list(queries), "query")
        s_embs = (
            self.encoder.encode(sent_texts, "doc") if sent_texts else
            np.zeros((0, q_embs.shape[1]), np.float32)
        )
        scores: dict = {}
        for (i, j, k), emb in zip(keys, s_embs):
            scores.setdefault((i, j), {})[k] = float(q_embs[i] @ emb)

        out = []
        for i, docs in enumerate(contexts):
            row = []
            for j in range(len(docs)):
                s = scores.get((i, j), {})
                if self.threshold is None:
                    keep = np.argsort([s[k] for k in range(len(s))])[-self.top_k:] \
                        if s else []
                else:
                    keep = [k for k in range(len(s)) if s[k] > self.threshold]
                pieces = ([titles[(i, j)]] if self.alway_select_title else []) + [
                    sents[(i, j)][k] for k in keep
                ]
                row.append(" ".join(pieces))
            out.append(row)
        return out, {}


class RecompAbstractiveCompressor(ContextProcessor):
    """T5 summarization of the concatenated docs (reference :108-130)."""

    def __init__(self, model_name="fangyuan/nq_abstractive_compressor",
                 batch_size=32, max_len=512, max_new_tokens=512):
        super().__init__()
        from bergen_tpu.models.t5 import T5Generator  # deferred heavy import

        self.model = T5Generator(
            model_name, batch_size=batch_size, max_length=max_len,
            max_new_tokens=max_new_tokens,
        )
        self.model_name = model_name
        self.name = "recomp_abs"
        self.predefined_context_processing_metrics = ["context_compression"]

    def _process(self, contexts: List[List[str]], queries: List[str]):
        inputs = [
            "Question: {}\n Document: {}\n Summary: ".format(q, " ".join(docs))
            for q, docs in zip(queries, contexts)
        ]
        summaries = self.model.generate(inputs)
        return [[s] for s in summaries], {}
