"""Cross-encoder reranker — batched JAX inference.

Replaces reference ``models/rerankers/crossencoder.py`` (HF
AutoModelForSequenceClassification, fp16, DataParallel): pair tokenization
``(query, doc)`` with truncate-second (reference :23-31), logits as score
(:33-37).  The BERT-family classification head runs as a jitted forward with
the batch sharded over the mesh ``data`` axis; batches are length-bucketed."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from bergen_tpu.models import bert, convert
from bergen_tpu.models.core import make_buckets, length_bucket
from bergen_tpu.parallel import get_mesh
from bergen_tpu.parallel.mesh import pad_batch_to_devices


class CrossEncoder:
    def __init__(self, model_name: str = None, max_len: int = 512,
                 dtype: str | None = None):
        from transformers import (
            AutoConfig, AutoModelForSequenceClassification, AutoTokenizer,
        )

        self.model_name = model_name
        self.max_len = max_len
        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        hf_cfg = AutoConfig.from_pretrained(model_name)

        on_tpu = jax.default_backend() == "tpu"
        if dtype is not None:
            # f32-on-TPU exists for cross-backend parity checks
            dtype = {"f32": jnp.float32, "float32": jnp.float32,
                     "bf16": jnp.bfloat16}[dtype]
        else:
            dtype = jnp.bfloat16 if on_tpu else jnp.float32
        hf_model = AutoModelForSequenceClassification.from_pretrained(model_name)

        # architecture dispatch: deberta-v2/v3 (the reference's default
        # reranker family) vs BERT-alikes
        if getattr(hf_cfg, "model_type", "") == "deberta-v2":
            from bergen_tpu.models import deberta

            self.cfg = deberta.DebertaConfig.from_hf(hf_cfg)
            params = deberta.deberta_from_hf(
                hf_model.state_dict(), self.cfg.num_layers
            )
            classify = deberta.classify
        else:
            self.cfg = bert.BertConfig.from_hf(hf_cfg)
            params = convert.bert_from_hf(hf_model.state_dict(),
                                          self.cfg.num_layers)
            classify = bert.classify
        self.params = convert.to_device_tree(params, dtype=dtype)
        del hf_model
        self.mesh = get_mesh()
        self.buckets = make_buckets(max_len)
        cfg = self.cfg

        @jax.jit
        def score(params, input_ids, attention_mask, token_type_ids):
            logits = classify(params, cfg, input_ids, attention_mask,
                              token_type_ids)
            return logits[:, 0].astype(jnp.float32)

        self._score = score

    def score_pairs(self, queries: list[str], docs: list[str]) -> np.ndarray:
        enc = self.tokenizer(
            queries, docs, truncation="only_second", max_length=self.max_len,
            padding=False,
        )
        lens = [len(x) for x in enc["input_ids"]]
        bucket = length_bucket(max(lens), self.buckets)
        pad_id = self.tokenizer.pad_token_id or 0
        B = len(queries)
        ii = np.full((B, bucket), pad_id, dtype=np.int32)
        am = np.zeros((B, bucket), dtype=np.int32)
        tt = np.zeros((B, bucket), dtype=np.int32)
        has_tt = "token_type_ids" in enc
        for r in range(B):
            ids = enc["input_ids"][r][:bucket]
            ii[r, : len(ids)] = ids
            am[r, : len(ids)] = 1
            if has_tt:
                t = enc["token_type_ids"][r][:bucket]
                tt[r, : len(t)] = t

        n_dev = self.mesh.shape["data"] * self.mesh.shape["model"]
        sharding = NamedSharding(self.mesh, P(("data", "model"), None))
        ii, n = pad_batch_to_devices(ii, n_dev)
        am, _ = pad_batch_to_devices(am, n_dev)
        tt, _ = pad_batch_to_devices(tt, n_dev)
        out = self._score(
            self.params,
            jax.device_put(jnp.asarray(ii), sharding),
            jax.device_put(jnp.asarray(am), sharding),
            jax.device_put(jnp.asarray(tt), sharding),
        )
        return np.asarray(out)[:n]

    def get_clean_model_name(self) -> str:
        return self.model_name.replace("/", "_")
