"""SFT trainer: the JAX equivalent of the reference's HF ``Trainer`` loop
(``modules/rag.py:615-646``): LoRA-masked AdamW with linear warmup, periodic
eval, best-checkpoint keeping, bf16 — one jitted train step over the mesh
(batch data-parallel, gradients psum'd by XLA)."""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bergen_tpu.models import llama
from bergen_tpu.train import lora as lora_lib
from bergen_tpu.train.step import causal_lm_loss


class SFTTrainer:
    def __init__(
        self,
        generator,                      # jax_llm.LLM
        train_rows: List[dict],         # rows with formatted_instruction + label_start_index
        eval_rows: List[dict],
        training_config,
        output_dir: str,
        seed: int = 42,
    ):
        self.gen = generator
        self.cfg = generator.cfg
        self.train_rows = train_rows
        self.eval_rows = eval_rows
        self.tc = training_config
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.rng = np.random.default_rng(seed)

        t = training_config.get("trainer", {})
        self.batch_size = int(t.get("per_device_train_batch_size", 8))
        self.eval_batch_size = int(t.get("per_device_eval_batch_size", 8))
        self.epochs = int(t.get("num_train_epochs", 1))
        self.lr = float(t.get("learning_rate", 1e-4))
        self.weight_decay = float(t.get("weight_decay", 0.1))
        self.warmup_ratio = float(t.get("warmup_ratio", 0.05))

        params = self.gen.params
        if "lora" in training_config:
            lc = training_config["lora"]
            params = lora_lib.init_lora(
                params, rank=int(lc.get("r", 32)),
                alpha=float(lc.get("lora_alpha", 64)),
                key=jax.random.PRNGKey(seed),
            )
            self.trainable_mask = lora_lib.lora_mask(params)
        else:
            self.trainable_mask = jax.tree.map(lambda _: True, params)
        self.params = params

        n_steps = max(
            1, (len(train_rows) // self.batch_size) * self.epochs
        )
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, self.lr, int(n_steps * self.warmup_ratio) + 1, n_steps
        )
        # NB: optax.masked passes raw gradients through on un-masked leaves —
        # multi_transform + set_to_zero is the correct freeze.
        labels = jax.tree.map(
            lambda m: "train" if m else "freeze", self.trainable_mask
        )
        self.optimizer = optax.multi_transform(
            {
                "train": optax.adamw(schedule, weight_decay=self.weight_decay),
                "freeze": optax.set_to_zero(),
            },
            labels,
        )
        self.opt_state = self.optimizer.init(self.params)
        self.n_steps = n_steps

        cfg = self.cfg
        optimizer = self.optimizer
        # per-layer jax.checkpoint in the loss (the reference Trainer's
        # gradient_checkpointing flag, config/train/lora.yaml) — backward
        # recomputes layer activations instead of holding them all in HBM
        remat = bool(training_config.get("gradient_checkpointing", True))

        @jax.jit
        def train_step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(causal_lm_loss)(
                params, cfg, batch["input_ids"], batch["attention_mask"],
                batch["loss_mask"], remat,
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        @jax.jit
        def eval_step(params, batch):
            # eval has no backward — remat would only add recompute
            return causal_lm_loss(
                params, cfg, batch["input_ids"], batch["attention_mask"],
                batch["loss_mask"], False,
            )

        self._train_step = train_step
        self._eval_step = eval_step

    # ------------------------------------------------------------------ #

    def _collate(self, rows: List[dict], pad_to: int) -> Dict[str, jnp.ndarray]:
        """Right-padded training batch with prompt tokens masked out of the
        loss (reference llm.py:204-264 collate + label masking)."""
        tok = self.gen.tokenizer
        B = len(rows)
        max_len = min(pad_to, self.gen.max_length or pad_to)
        ii = np.full((B, max_len), tok.pad_token_id, dtype=np.int32)
        am = np.zeros((B, max_len), dtype=np.int32)
        lm = np.zeros((B, max_len), dtype=np.int32)
        for r, row in enumerate(rows):
            ids = tok(row["formatted_instruction"], add_special_tokens=False,
                      truncation=True, max_length=max_len)["input_ids"]
            ii[r, : len(ids)] = ids
            am[r, : len(ids)] = 1
            start = min(row["label_start_index"], len(ids))
            lm[r, start : len(ids)] = 1
        return {
            "input_ids": jnp.asarray(ii),
            "attention_mask": jnp.asarray(am),
            "loss_mask": jnp.asarray(lm),
        }

    def _token_len(self, row) -> int:
        if "_token_len" not in row:
            row["_token_len"] = len(
                self.gen.tokenizer(row["formatted_instruction"],
                                   add_special_tokens=False)["input_ids"]
            )
        return row["_token_len"]

    def _batches(self, rows, batch_size, shuffle):
        from bergen_tpu.models.core import length_bucket

        order = np.arange(len(rows))
        if shuffle:
            self.rng.shuffle(order)
            # length-sort within shuffled windows: stochastic batch membership
            # with low padding waste inside each window
            window = batch_size * 8
            order = np.concatenate([
                sorted(order[s : s + window], key=lambda i: self._token_len(rows[i]))
                for s in range(0, len(order), window)
            ]).astype(np.int64) if len(order) else order
        for s in range(0, len(order), batch_size):
            idx = order[s : s + batch_size]
            batch = [rows[i] for i in idx]
            longest = max(self._token_len(r) for r in batch)
            yield self._collate(batch, length_bucket(longest, self.gen.buckets))

    def evaluate(self) -> float:
        losses = []
        for batch in self._batches(self.eval_rows, self.eval_batch_size, False):
            losses.append(float(self._eval_step(self.params, batch)))
        return float(np.mean(losses)) if losses else float("nan")

    def train(self) -> Dict[str, float]:
        num_saves = int(self.tc.get("num_saving_steps", 10))
        eval_every = max(self.n_steps // max(num_saves, 1), 1)
        best = {"loss": float("inf"), "adapters": None}
        history = []
        step = 0
        for _ in range(self.epochs):
            for batch in self._batches(self.train_rows, self.batch_size, True):
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state, batch
                )
                step += 1
                if step % eval_every == 0 or step == self.n_steps:
                    eval_loss = self.evaluate()
                    history.append(
                        {"step": step, "train_loss": float(loss),
                         "eval_loss": eval_loss}
                    )
                    if eval_loss < best["loss"]:
                        best["loss"] = eval_loss
                        best["adapters"] = lora_lib.extract_adapters(self.params)
                        np.savez(
                            os.path.join(self.output_dir, "adapters_best.npz"),
                            **best["adapters"],
                        )
        # load best (reference: load_best_model_at_end=True)
        if best["adapters"]:
            self.params = lora_lib.load_adapters(self.params, best["adapters"])
        # merge adapters into the generator for inference
        self.gen.params = lora_lib.merge(self.params)
        return {
            "steps": step,
            "best_eval_loss": best["loss"],
            "history": history,
        }
