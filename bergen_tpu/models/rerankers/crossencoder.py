"""Cross-encoder reranker — batched JAX inference.

Replaces reference ``models/rerankers/crossencoder.py`` (HF
AutoModelForSequenceClassification, fp16, DataParallel): pair tokenization
``(query, doc)`` with truncate-second (reference :23-31), logits as score
(:33-37).  The BERT-family classification head runs as a jitted forward with
the batch sharded over the mesh ``data`` axis; batches are length-bucketed."""

from __future__ import annotations

import os

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
                 dtype: str | None = None,
                 quantization: str | None = None,  # 'w8a8' int8-MXU layers
                 w8a8_guard: float = 0.99):  # min Spearman vs bf16 scores
        from transformers import (
            AutoConfig, AutoModelForSequenceClassification, AutoTokenizer,
        )

        self.model_name = model_name
        self.max_len = max_len
        if quantization not in (None, "w8a8"):
            raise ValueError(
                f"CrossEncoder quantization={quantization!r}: only 'w8a8' "
                "is supported")
        self.quantization = quantization
        self.w8a8_guard = w8a8_guard
        self.w8a8_fidelity: dict | None = None
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
        self._deberta = getattr(hf_cfg, "model_type", "") == "deberta-v2"
        if self._deberta:
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
        # W8A8 rerank scoring (int8-MXU whole-layer kernel) — BERT-family
        # only; the DeBERTa prebias kernel streams XLA-computed qkv, so its
        # layer matmuls live outside the pallas_call and don't quantize here
        self.score_params = self.params
        if quantization == "w8a8":
            if classify is not bert.classify:
                raise ValueError(
                    "quantization=w8a8 covers BERT-family cross-encoders; "
                    "deberta-v2/v3 rides the prebias kernel unquantized")
            self.score_params = convert.quantize_encoder_layers_w8a8(
                self.params)
        self._w8a8_guard_pending = quantization == "w8a8"
        self.mesh = get_mesh()
        self.buckets = make_buckets(max_len)
        cfg = self.cfg
        # DeBERTa position tables (deberta.build_pos_tables): cached per
        # length bucket, replacing the per-batch one-hot regather with one
        # direct einsum per c2p/p2c term.  HBM cost is
        # 2 * layers * S^2 * D bf16 bytes per bucket, so building is gated
        # by a budget (default 2,600 MB total — covers debertav3-base
        # through S=256; larger buckets ride the regather path).
        self._pos_tables: dict[int, object] = {}
        self._table_budget = int(os.environ.get(
            "BERGEN_TPU_DEBERTA_TABLE_MB", "2600")) << 20
        self._table_spent = 0

        if self._deberta:
            @jax.jit
            def score(params, input_ids, attention_mask, token_type_ids,
                      pos_tables=None):
                logits = classify(params, cfg, input_ids, attention_mask,
                                  token_type_ids, pos_tables=pos_tables)
                return logits[:, 0].astype(jnp.float32)
        else:
            @jax.jit
            def score(params, input_ids, attention_mask, token_type_ids,
                      pos_tables=None):
                logits = classify(params, cfg, input_ids, attention_mask,
                                  token_type_ids)
                return logits[:, 0].astype(jnp.float32)

        self._score = score

    def _tables_for(self, bucket: int):
        """Per-bucket cached DeBERTa position tables, budget-gated."""
        if not self._deberta or not self.cfg.pos_att_type:
            return None
        if bucket in self._pos_tables:
            return self._pos_tables[bucket]
        from bergen_tpu.models import deberta

        n_terms = len(self.cfg.pos_att_type)
        itemsize = 2  # bf16/f16-class params; f32 doubles this, still ~right
        need = (n_terms * self.cfg.num_layers * bucket * bucket
                * self.cfg.hidden_size * itemsize)
        if self._table_spent + need > self._table_budget:
            self._pos_tables[bucket] = None
            return None
        tabs = deberta.build_pos_tables(self.params, self.cfg, bucket)
        self._pos_tables[bucket] = tabs
        self._table_spent += need
        return tabs

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
        ii = jax.device_put(jnp.asarray(ii), sharding)
        am = jax.device_put(jnp.asarray(am), sharding)
        tt = jax.device_put(jnp.asarray(tt), sharding)
        if self._w8a8_guard_pending:
            self._w8a8_check(ii, am, tt, n)
        out = self._score(self.score_params, ii, am, tt,
                          self._tables_for(bucket))
        return np.asarray(out)[:n]

    def _w8a8_check(self, ii, am, tt, n: int) -> None:
        """Dual-score the first pair batch (bf16 vs w8a8) and demand rank
        agreement (Spearman over the batch's scores) before the int8 path
        goes live; reranking consumes score ORDER, so order correlation is
        the right fidelity measure.  Falls back to bf16 below the guard."""
        import logging

        self._w8a8_guard_pending = False
        ref = np.asarray(self._score(self.params, ii, am, tt))[:n]
        q8 = np.asarray(self._score(self.score_params, ii, am, tt))[:n]
        r_ref = np.argsort(np.argsort(ref))
        r_q8 = np.argsort(np.argsort(q8))
        denom = np.std(r_ref) * np.std(r_q8)
        rho = float(np.mean((r_ref - r_ref.mean()) * (r_q8 - r_q8.mean()))
                    / denom) if denom > 0 else 1.0
        ok = rho >= self.w8a8_guard
        self.w8a8_fidelity = {
            "kind": "reranker_w8a8", "spearman_vs_bf16": round(rho, 6),
            "guard": self.w8a8_guard, "passed": ok, "n_pairs": int(n),
        }
        log = logging.getLogger("bergen_tpu.rerank")
        if not ok:
            log.warning(
                "w8a8 reranker guard: Spearman %.4f < %.4f — falling back "
                "to bf16 scoring for this run", rho, self.w8a8_guard)
            self.score_params = self.params
        else:
            log.info("w8a8 reranker guard: Spearman %.4f (>= %.4f), "
                     "int8-MXU scoring live", rho, self.w8a8_guard)

    def get_clean_model_name(self) -> str:
        return self.model_name.replace("/", "_")
