"""SPLADE sparse retriever — MLM-head expansion, TPU-native scoring.

Replaces reference ``models/retrievers/splade.py``: the BERT MLM backbone runs
as a jitted JAX forward with the ``max(log1p(relu(logits))) * mask`` pooling
(reference :42-43); document vectors are reduced to a fixed-width top-``nnz``
sparse format for device-resident storage (ops/sparse.py) while queries stay
dense [V] for the MXU GEMM scoring path."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from bergen_tpu.models import bert, convert
from bergen_tpu.models.core import make_buckets, length_bucket
from bergen_tpu.models.retrievers.base import Retriever
from bergen_tpu.ops import sparse as sparse_ops
from bergen_tpu.parallel import get_mesh
from bergen_tpu.parallel.mesh import pad_batch_to_devices


class SpladeRetriever(Retriever):
    is_sparse = True
    similarity = "dot"

    def __init__(
        self,
        model_name: str,
        max_len: int = 256,
        nnz: int = 256,
        batch_size: int = 128,
        query_encoder_name: str | None = None,
        quantization: str | None = None,  # 'w8a8' doc-encoder layers
        w8a8_guard: float = 0.995,  # min mean cos(bf16, w8a8) [V] vectors
    ):
        from transformers import AutoConfig, AutoModelForMaskedLM, AutoTokenizer

        self.model_name = model_name
        self.max_len = max_len
        self.nnz = nnz
        self.batch_size = batch_size
        if quantization not in (None, "w8a8"):
            raise ValueError(
                f"SpladeRetriever quantization={quantization!r}: only "
                "'w8a8' is supported")
        self.quantization = quantization
        self.w8a8_guard = w8a8_guard
        self.w8a8_fidelity: dict | None = None
        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        hf_cfg = AutoConfig.from_pretrained(model_name)
        self.cfg = bert.BertConfig.from_hf(hf_cfg)

        on_tpu = jax.default_backend() == "tpu"
        dtype = jnp.bfloat16 if on_tpu else jnp.float32
        hf_model = AutoModelForMaskedLM.from_pretrained(model_name)
        self.params = convert.to_device_tree(
            convert.bert_from_hf(hf_model.state_dict(), self.cfg.num_layers),
            dtype=dtype,
        )
        del hf_model
        # efficient-splade uses distinct doc/query encoders
        # (reference splade.py:13-29, config splade-efficient.yaml). NB the
        # reference's __call__ (:40) overwrites the query-encoder output with
        # the doc model's logits, so its asymmetric path never takes effect;
        # here queries genuinely use the query encoder.
        if query_encoder_name is not None:
            q_model = AutoModelForMaskedLM.from_pretrained(query_encoder_name)
            self.query_params = convert.to_device_tree(
                convert.bert_from_hf(q_model.state_dict(), self.cfg.num_layers),
                dtype=dtype,
            )
            del q_model
        else:
            self.query_params = self.params
        # W8A8 doc encoding: the 12 encoder layers (~78% of the SPLADE
        # forward FLOPs at bert-base dims) ride the int8-MXU layer kernel;
        # the MLM head (tied-embedding [D, V] matmul) and queries stay bf16.
        # Gated by a dual-encode guard on the first doc batch (encode()).
        self.doc_params = self.params
        if quantization == "w8a8":
            self.doc_params = convert.quantize_encoder_layers_w8a8(
                self.params)
        self._w8a8_guard_pending = quantization == "w8a8"
        self.mesh = get_mesh()
        self.buckets = make_buckets(max_len)
        cfg = self.cfg

        @jax.jit
        def encode(params, input_ids, attention_mask):
            hidden = bert.encode(params, cfg, input_ids, attention_mask)
            logits = bert.mlm_logits(params, cfg, hidden)
            return bert.splade_pool(logits, attention_mask).astype(jnp.float32)

        self._encode = encode

    @property
    def embedding_dim(self) -> int:
        return self.cfg.vocab_size

    def _run_batch(self, texts: list[str], params=None) -> np.ndarray:
        if params is None:
            params = self.params
        enc = self.tokenizer(
            texts, truncation=True, max_length=self.max_len, padding=False
        )
        lens = [len(x) for x in enc["input_ids"]]
        bucket = length_bucket(max(lens), self.buckets)
        pad_id = self.tokenizer.pad_token_id or 0
        B = len(texts)
        ii = np.full((B, bucket), pad_id, dtype=np.int32)
        am = np.zeros((B, bucket), dtype=np.int32)
        for r, ids in enumerate(enc["input_ids"]):
            ids = ids[:bucket]
            ii[r, : len(ids)] = ids
            am[r, : len(ids)] = 1
        n_dev = self.mesh.shape["data"] * self.mesh.shape["model"]
        sharding = NamedSharding(self.mesh, P(("data", "model"), None))
        ii, n = pad_batch_to_devices(ii, n_dev)
        am, _ = pad_batch_to_devices(am, n_dev)
        out = self._encode(
            params,
            jax.device_put(jnp.asarray(ii), sharding),
            jax.device_put(jnp.asarray(am), sharding),
        )
        return np.asarray(out)[:n]

    def encode(self, texts: list[str], query_or_doc: str) -> np.ndarray:
        """Dense [B, V] sparse-activation vectors (used for queries and as the
        source for fixed-width doc compression)."""
        params = (self.query_params if query_or_doc == "query"
                  else self.doc_params)
        order = np.argsort([len(t) for t in texts], kind="stable")
        out = np.zeros((len(texts), self.cfg.vocab_size), dtype=np.float32)
        for s in range(0, len(texts), self.batch_size):
            idx = order[s : s + self.batch_size]
            batch = [texts[i] for i in idx]
            if self._w8a8_guard_pending and query_or_doc == "doc":
                params = self._w8a8_check(batch) or params
            out[idx] = self._run_batch(batch, params)
        return out

    def _w8a8_check(self, texts: list[str]):
        """Dual-encode the first doc batch (bf16 vs w8a8 layers) and demand
        mean cosine agreement of the [V] activation vectors; below the
        guard, fall back to bf16 for the run (same contract as the dense
        retriever's guard — see retrievers/dense.py)."""
        import logging

        self._w8a8_guard_pending = False
        ref = self._run_batch(texts, self.params)
        q8 = self._run_batch(texts, self.doc_params)
        num = np.sum(ref * q8, axis=1)
        den = np.clip(
            np.linalg.norm(ref, axis=1) * np.linalg.norm(q8, axis=1),
            1e-9, None)
        cos = float(np.mean(num / den))
        ok = cos >= self.w8a8_guard
        self.w8a8_fidelity = {
            "kind": "splade_encoder_w8a8", "mean_cos_vs_bf16": round(cos, 6),
            "guard": self.w8a8_guard, "passed": ok, "n_docs": len(texts),
        }
        log = logging.getLogger("bergen_tpu.retrieve")
        if not ok:
            log.warning(
                "w8a8 SPLADE doc-encoder guard: mean cos %.4f < %.4f — "
                "falling back to bf16 encoding for this run",
                cos, self.w8a8_guard)
            self.doc_params = self.params
            return self.params
        log.info("w8a8 SPLADE doc-encoder guard: mean cos %.4f (>= %.4f), "
                 "int8-MXU encoding live", cos, self.w8a8_guard)
        return None

    def encode_sparse(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Fixed-width (vals, idx) for document storage."""
        dense = self.encode(texts, "doc")
        return sparse_ops.to_fixed_width(dense, self.nnz)
