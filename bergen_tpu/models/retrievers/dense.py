"""Dense bi-encoder retriever — jitted JAX forward, data-parallel over the mesh.

Replaces the reference's torch ``Dense`` retriever
(``models/retrievers/dense.py``: HF AutoModel + Mean/CLS pooling :64-75,
Dot/Cos similarity :77-89, e5-style query/doc prompts :30-31, DataParallel
:32-35).  Here the HF torch checkpoint is converted once to a JAX param tree
(bf16 on TPU), the forward is a single jitted function with the batch sharded
over the mesh ``data`` axis, and batches are length-bucketed so XLA compiles a
handful of static shapes instead of one per batch.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from bergen_tpu.models import bert, convert
from bergen_tpu.models.core import make_buckets, length_bucket
from bergen_tpu.models.retrievers.base import Retriever
from bergen_tpu.parallel import get_mesh
from bergen_tpu.parallel.mesh import pad_batch_to_devices


# Config-compat shims: the reference's YAML instantiates pooler/similarity
# objects (config/retriever/*.yaml `_target_: models.retrievers.dense.MeanPooler`)
class MeanPooler:
    name = "mean"


class ClsPooler:
    name = "cls"


class DotProduct:
    name = "dot"


class CosineSim:
    name = "cos"


def _as_name(obj, default):
    if obj is None:
        return default
    return obj if isinstance(obj, str) else getattr(obj, "name", default)


class DenseRetriever(Retriever):
    def __init__(
        self,
        model_name: str,
        max_len: int = 512,
        pooler=None,
        similarity=None,
        prompt_q: str | None = None,
        prompt_d: str | None = None,
        query_encoder_name: str | None = None,
        batch_size: int = 128,
        dtype: str | None = None,  # 'f32'/'bf16' force; None = bf16 on TPU.
        # f32-on-TPU exists for cross-backend parity checks.
        quantization: str | None = None,  # 'w8a8': int8-MXU DOC encoding
        w8a8_guard: float = 0.995,  # min mean cos(bf16, w8a8) doc embedding
    ):
        from transformers import AutoTokenizer

        self.model_name = model_name
        self.max_len = max_len
        self.pooler = _as_name(pooler, "mean")
        self.similarity = _as_name(similarity, "dot")
        self.prompt_q = prompt_q or ""
        self.prompt_d = prompt_d or ""
        self.batch_size = batch_size
        if quantization not in (None, "w8a8"):
            raise ValueError(
                f"DenseRetriever quantization={quantization!r}: only 'w8a8' "
                "(int8-MXU corpus encoding) is supported")
        self.quantization = quantization
        self.w8a8_guard = w8a8_guard
        self.w8a8_fidelity: dict | None = None

        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        # load_hf_encoder also covers the trust_remote_code architectures
        # (GTE-v1.5 / nomic / jina-v2) by reading weights directly — the
        # rope/alibi-BERT forwards are native in models/bert.py
        hf_cfg, state_dict = convert.load_hf_encoder(model_name)
        self.cfg = bert.BertConfig.from_hf(hf_cfg)
        self._dim = self.cfg.hidden_size

        on_tpu = jax.default_backend() == "tpu"
        if dtype is not None:
            dtype = {"f32": jnp.float32, "float32": jnp.float32,
                     "bf16": jnp.bfloat16}[dtype]
        else:
            dtype = jnp.bfloat16 if on_tpu else jnp.float32
        self.params = convert.to_device_tree(
            convert.bert_from_hf(state_dict, self.cfg.num_layers),
            dtype=dtype,
        )
        del state_dict
        # asymmetric query encoder (reference dense.py:17-20)
        if query_encoder_name is not None:
            _, q_sd = convert.load_hf_encoder(query_encoder_name)
            self.query_params = convert.to_device_tree(
                convert.bert_from_hf(q_sd, self.cfg.num_layers),
                dtype=dtype,
            )
            del q_sd
        else:
            self.query_params = self.params

        # W8A8 corpus encoding: int8 weights + int8-MXU matmuls inside the
        # fused layer kernel (ops/encoder_attention.encoder_layer_q) for DOC
        # encoding only — queries stay bf16 (they are a rounding-error's
        # worth of the encode cost and anchor the guard below).  Gated by a
        # measured dual-encode check on the first doc batch (see encode()).
        self.doc_params = self.params
        if quantization == "w8a8":
            self.doc_params = convert.quantize_encoder_layers_w8a8(
                self.params)
        self._w8a8_guard_pending = quantization == "w8a8"

        self.mesh = get_mesh()
        self.buckets = make_buckets(max_len)
        self._encode_jit = self._build_encode()

    @property
    def embedding_dim(self) -> int:
        return self._dim

    def _build_encode(self) -> Callable:
        cfg = self.cfg
        if self.pooler not in bert.POOLERS:
            raise ValueError(
                f"Unknown pooler {self.pooler!r}; expected one of "
                f"{sorted(bert.POOLERS)}"
            )
        pool = bert.POOLERS[self.pooler]
        normalize = self.similarity == "cos"
        mesh = self.mesh

        @functools.partial(
            jax.jit,
            static_argnames=(),
        )
        def encode(params, input_ids, attention_mask):
            hidden = bert.encode(params, cfg, input_ids, attention_mask)
            emb = pool(hidden, attention_mask)
            if normalize:
                emb = emb / jnp.clip(
                    jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-9, None
                )
            return emb.astype(jnp.float32)

        def run(params, input_ids, attention_mask):
            n_dev = mesh.shape["data"] * mesh.shape["model"]
            input_ids, n = pad_batch_to_devices(input_ids, n_dev)
            attention_mask, _ = pad_batch_to_devices(attention_mask, n_dev)
            sharding = NamedSharding(mesh, P(("data", "model"), None))
            ii = jax.device_put(jnp.asarray(input_ids), sharding)
            am = jax.device_put(jnp.asarray(attention_mask), sharding)
            out = encode(params, ii, am)
            return np.asarray(out)[:n]

        return run

    def _tokenize(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        enc = self.tokenizer(
            texts, truncation=True, max_length=self.max_len, padding=False,
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
        return ii, am

    def encode(self, texts: list[str], query_or_doc: str) -> np.ndarray:
        """Length-sorted, bucketed, batched encode → [len(texts), D] fp32."""
        prefix = self.prompt_q if query_or_doc == "query" else self.prompt_d
        params = (self.query_params if query_or_doc == "query"
                  else self.doc_params)
        texts = [prefix + t for t in texts]
        order = np.argsort([len(t) for t in texts], kind="stable")
        out = np.zeros((len(texts), self._dim), dtype=np.float32)
        for s in range(0, len(texts), self.batch_size):
            idx = order[s : s + self.batch_size]
            ii, am = self._tokenize([texts[i] for i in idx])
            if self._w8a8_guard_pending and query_or_doc == "doc":
                params = self._w8a8_check(ii, am) or params
            out[idx] = self._encode_jit(params, ii, am)
        return out

    def _w8a8_check(self, ii: np.ndarray, am: np.ndarray):
        """Dual-encode the first doc batch (bf16 vs w8a8) and measure the
        embedding agreement; below the guard, fall back to bf16 for the run.
        The downstream retrieval recall guard (pipeline/retrieve.py) cannot
        see encoder quantization error — both its endpoints score the SAME
        stored embeddings — so the check lives here, at the only place the
        error is observable.  Returns the fallback params or None."""
        import logging

        self._w8a8_guard_pending = False
        ref = self._encode_jit(self.params, ii, am)
        q8 = self._encode_jit(self.doc_params, ii, am)
        num = np.sum(ref * q8, axis=1)
        den = np.clip(
            np.linalg.norm(ref, axis=1) * np.linalg.norm(q8, axis=1),
            1e-9, None)
        cos = float(np.mean(num / den))
        ok = cos >= self.w8a8_guard
        self.w8a8_fidelity = {
            "kind": "encoder_w8a8", "mean_cos_vs_bf16": round(cos, 6),
            "guard": self.w8a8_guard, "passed": ok,
            "n_docs": int(ii.shape[0]),
        }
        log = logging.getLogger("bergen_tpu.retrieve")
        if not ok:
            log.warning(
                "w8a8 doc-encoder guard: mean cos %.4f < %.4f — falling "
                "back to bf16 encoding for this run", cos, self.w8a8_guard)
            self.doc_params = self.params
            return self.params
        log.info("w8a8 doc-encoder guard: mean cos %.4f (>= %.4f), "
                 "int8-MXU encoding live", cos, self.w8a8_guard)
        return None
