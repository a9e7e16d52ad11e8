"""Training step for generator fine-tuning (reference ``RAG.train``,
``modules/rag.py:511-656``, drives HF Trainer+DDP; here the step is one jitted
function over the mesh: DP over ``data`` for the batch, TP over ``model`` for
the weights, XLA inserting the gradient psums).

Loss follows the reference's masked-LM SFT objective: next-token cross-entropy
with prompt tokens masked to ``-100``-equivalent (mask array) so only answer
tokens contribute (reference ``models/generators/llm.py:204-253``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from bergen_tpu.models import llama


def causal_lm_loss(
    params, cfg: llama.LlamaConfig, input_ids, attention_mask, loss_mask,
    remat: bool = True,
) -> jnp.ndarray:
    """Mean next-token CE over positions where loss_mask=1 (answer tokens).

    ``remat`` (default on) checkpoints each decoder layer so the backward
    pass recomputes activations instead of holding every layer's attention
    probs + FFN hiddens — the standard TPU HBM-for-FLOPs trade (the
    equivalent of HF's gradient_checkpointing=True in the reference's
    Trainer path)."""
    B, S = input_ids.shape
    cache = llama.init_cache(cfg, B, S, dtype=jnp.float32, flat=False)
    positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
    causal = jnp.tril(jnp.ones((S, S), bool))
    mask = causal[None] & attention_mask[:, None, :].astype(bool)
    logits, _ = llama.forward(params, cfg, input_ids, positions, cache, mask,
                              remat=remat)
    logits = logits[:, :-1].astype(jnp.float32)
    targets = input_ids[:, 1:]
    w = (loss_mask[:, 1:] * attention_mask[:, 1:]).astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    return jnp.sum(ce * w) / jnp.clip(jnp.sum(w), 1.0, None)


def make_train_step(cfg: llama.LlamaConfig, optimizer: optax.GradientTransformation):
    """Returns jittable (params, opt_state, batch) -> (params, opt_state, loss)."""

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(causal_lm_loss)(
            params, cfg, batch["input_ids"], batch["attention_mask"],
            batch["loss_mask"],
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
