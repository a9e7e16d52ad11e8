"""Provence training — joint context-pruning + reranking heads on DeBERTa.

TPU-native rebuild of the reference's Provence training stack
(``scripts/provence/modeling_provence.py``: DebertaV2ForCompressionAndRanking
— a ranking head distilled from a cross-encoder teacher via pointwise MSE plus
a per-token 2-class compression head trained on silver sentence labels;
``train_provence.py``: joint loss = compression_CE + w * ranking_MSE, CE taken
over every position including padding, token labels laid out as
``[0]*(len(query)+2) + sentence_labels + [0]``).

Here the model is the functional JAX DeBERTa (``models/deberta.py``) with two
extra head param groups; the train step is one jitted value_and_grad over the
joint loss, batch data-parallel over the mesh.
"""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bergen_tpu.models import deberta
from bergen_tpu.models.core import ACT_FNS, dense


def init_heads(key, cfg, params):
    """Ensure ranking ('pooler'+'classifier') and compression
    ('token_classifier') heads exist. The ranking head is kept when
    initialising from a cross-encoder checkpoint (reference
    modeling_provence.py: layer must be named 'classifier')."""
    k1, k2, k3 = jax.random.split(key, 3)
    H = cfg.hidden_size

    def lin(k, d_in, d_out):
        return {
            "kernel": jax.random.normal(k, (d_in, d_out), jnp.float32) * 0.02,
            "bias": jnp.zeros((d_out,), jnp.float32),
        }

    params = dict(params)
    if "pooler" not in params:
        params["pooler"] = lin(k1, H, H)
    if "classifier" not in params:
        params["classifier"] = lin(k2, H, 2)
    if "token_classifier" not in params:
        params["token_classifier"] = lin(k3, H, 2)
    return params


def forward(params, cfg, input_ids, attention_mask):
    """→ (ranking_scores [B], token_logits [B, S, 2])."""
    # fused=False: this forward is differentiated (value_and_grad below) and
    # the fused whole-layer Pallas path defines no VJP
    hidden = deberta.encode(params, cfg, input_ids, attention_mask,
                            fused=False)
    pooled = ACT_FNS[cfg.pooler_hidden_act](dense(params["pooler"], hidden[:, 0]))
    ranking = dense(params["classifier"], pooled)[:, 0]
    token_logits = dense(params["token_classifier"], hidden).astype(jnp.float32)
    return ranking.astype(jnp.float32), token_logits


def joint_loss(params, cfg, batch, loss_weight: float = 1.0):
    """compression CE over ALL positions (pads carry label 0, matching the
    reference's ``labels.view(-1)``) + loss_weight * ranking MSE."""
    ranking, token_logits = forward(
        params, cfg, batch["input_ids"], batch["attention_mask"]
    )
    logp = jax.nn.log_softmax(token_logits, axis=-1)
    comp = -jnp.mean(
        jnp.take_along_axis(logp, batch["labels"][..., None], axis=-1)
    )
    rank = jnp.mean(jnp.square(ranking - batch["ranking_labels"]))
    return comp + loss_weight * rank, (comp, rank)


class ProvenceTrainer:
    """rows: {query: str, context: [sent, ...], selected_sents: [idx, ...],
    ranking_label: float} — the silver-labeling output format
    (reference gen_silver_labeling_provence.py:140-150)."""

    def __init__(
        self,
        model_name: str,
        train_rows: List[dict],
        eval_rows: List[dict],
        output_dir: str,
        max_len: int = 512,
        batch_size: int = 16,
        lr: float = 1e-5,
        epochs: int = 1,
        loss_weight: float = 1.0,
        seed: int = 0,
    ):
        from transformers import (
            AutoConfig, AutoModelForSequenceClassification, AutoTokenizer,
        )
        from bergen_tpu.models import convert

        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        hf_cfg = AutoConfig.from_pretrained(model_name)
        self.cfg = deberta.DebertaConfig.from_hf(hf_cfg)
        # load WITH the sequence-classification head: a cross-encoder teacher
        # checkpoint carries the trained pooler/classifier weights that seed
        # the ranking head (reference DebertaV2ForCompressionAndRanking
        # .from_pretrained keeps them; bare AutoModel would drop them and
        # init_heads would random-init the ranking head instead)
        hf_model = AutoModelForSequenceClassification.from_pretrained(model_name)
        params = deberta.deberta_from_hf(
            hf_model.state_dict(), self.cfg.num_layers
        )
        del hf_model
        self.params = init_heads(jax.random.PRNGKey(seed), self.cfg, params)
        self.params = convert.to_device_tree(params=self.params, dtype=jnp.float32)

        self.train_rows, self.eval_rows = train_rows, eval_rows
        self.max_len = max_len
        self.batch_size = batch_size
        self.epochs = epochs
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.rng = np.random.default_rng(seed)

        n_steps = max(1, len(train_rows) // batch_size * epochs)
        warmup = max(n_steps // 20, 1)
        sched = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup, max(n_steps, warmup + 1)
        )
        self.optimizer = optax.adamw(sched, weight_decay=0.01)
        self.opt_state = self.optimizer.init(self.params)

        cfg, optimizer, w = self.cfg, self.optimizer, loss_weight

        @jax.jit
        def train_step(params, opt_state, batch):
            (loss, (comp, rank)), grads = jax.value_and_grad(
                joint_loss, has_aux=True
            )(params, cfg, batch, w)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, comp, rank

        @jax.jit
        def eval_step(params, batch):
            _, token_logits = forward(
                params, cfg, batch["input_ids"], batch["attention_mask"]
            )
            loss, (comp, rank) = joint_loss(params, cfg, batch, w)
            return jnp.argmax(token_logits, -1), loss, comp, rank

        self._train_step = train_step
        self._eval_step = eval_step

    # ------------------------------------------------------------------ #

    def _collate(self, rows: List[dict]) -> Dict[str, jnp.ndarray]:
        """[CLS] query [SEP] sent0 sent1 ... [SEP]; token labels 1 on tokens
        of selected sentences, 0 elsewhere incl. specials/pads (reference
        train_provence.py:73-111)."""
        tok = self.tokenizer
        cls_id, sep_id = tok.cls_token_id, tok.sep_token_id
        pad_id = tok.pad_token_id or 0
        B = len(rows)
        ii = np.full((B, self.max_len), pad_id, np.int32)
        am = np.zeros((B, self.max_len), np.int32)
        lab = np.zeros((B, self.max_len), np.int32)
        ranks = np.zeros((B,), np.float32)
        for r, row in enumerate(rows):
            q_ids = tok(row["query"], add_special_tokens=False)["input_ids"]
            ids = [cls_id] + q_ids + [sep_id]
            labels = [0] * len(ids)
            selected = set(row["selected_sents"])
            for si, sent in enumerate(row["context"]):
                s_ids = tok(" " + sent if si else sent,
                            add_special_tokens=False)["input_ids"]
                ids += s_ids
                labels += [int(si in selected)] * len(s_ids)
            ids, labels = ids + [sep_id], labels + [0]
            ids, labels = ids[: self.max_len], labels[: self.max_len]
            ii[r, : len(ids)] = ids
            am[r, : len(ids)] = 1
            lab[r, : len(labels)] = labels
            ranks[r] = float(row.get("ranking_label", 0.0))
        return {
            "input_ids": jnp.asarray(ii), "attention_mask": jnp.asarray(am),
            "labels": jnp.asarray(lab), "ranking_labels": jnp.asarray(ranks),
        }

    def _batches(self, rows, shuffle):
        order = np.arange(len(rows))
        if shuffle:
            self.rng.shuffle(order)
        for s in range(0, len(order) - len(order) % self.batch_size or len(order),
                       self.batch_size):
            idx = order[s : s + self.batch_size]
            if len(idx):
                yield self._collate([rows[i] for i in idx])

    def evaluate(self) -> Dict[str, float]:
        preds, labels, losses = [], [], []
        for batch in self._batches(self.eval_rows, False):
            p, loss, comp, rank = self._eval_step(self.params, batch)
            preds.append(np.asarray(p).ravel())
            labels.append(np.asarray(batch["labels"]).ravel())
            losses.append(float(loss))
        if not preds:
            return {}
        p = np.concatenate(preds)
        l = np.concatenate(labels)
        tp = int(np.sum((p == 1) & (l == 1)))
        fp = int(np.sum((p == 1) & (l == 0)))
        fn = int(np.sum((p == 0) & (l == 1)))
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        return {
            "loss": float(np.mean(losses)),
            "acc": float(np.mean(p == l)),
            "precision": prec,
            "recall": rec,
            "f1": 2 * prec * rec / (prec + rec) if prec + rec else 0.0,
        }

    def train(self) -> Dict:
        log_path = os.path.join(self.output_dir, "train_log.csv")
        history, step = [], 0
        with open(log_path, "w") as log:
            log.write("step,loss,compression_loss,ranking_loss\n")
            for _ in range(self.epochs):
                for batch in self._batches(self.train_rows, True):
                    self.params, self.opt_state, loss, comp, rank = (
                        self._train_step(self.params, self.opt_state, batch)
                    )
                    step += 1
                    log.write(f"{step},{float(loss):.4f},{float(comp):.4f},"
                              f"{float(rank):.4f}\n")
                    history.append(float(loss))
        metrics = self.evaluate()
        flat = {}

        def _flatten(tree, pre=""):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    _flatten(v, f"{pre}{k}.")
            elif isinstance(tree, list):
                for i, v in enumerate(tree):
                    _flatten(v, f"{pre}{i}.")
            else:
                flat[pre[:-1]] = np.asarray(tree)

        _flatten(self.params)
        np.savez(os.path.join(self.output_dir, "provence_params.npz"), **flat)
        return {"steps": step, "train_loss": history, "eval": metrics}
