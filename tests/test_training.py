"""LoRA + SFT training tests: adapter math, masked optimization actually
reduces loss, full train pipeline through RAG.train."""

import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bergen_tpu.models import llama
from bergen_tpu.train import lora as lora_lib
from bergen_tpu.train.step import causal_lm_loss

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_cfg_params():
    cfg = llama.LlamaConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, max_position_embeddings=128,
    )
    params = llama.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_lora_init_is_identity(tiny_cfg_params):
    cfg, params = tiny_cfg_params
    ids = jnp.asarray(np.arange(10)[None, :], jnp.int32)
    pos = jnp.asarray(np.arange(10)[None, :], jnp.int32)
    cache = llama.init_cache(cfg, 1, 10, jnp.float32)
    mask = jnp.tril(jnp.ones((10, 10), bool))[None]
    base_logits, _ = llama.forward(params, cfg, ids, pos, cache, mask)

    import copy

    lp = lora_lib.init_lora(copy.deepcopy(params), rank=4, alpha=8,
                            key=jax.random.PRNGKey(1))
    cache2 = llama.init_cache(cfg, 1, 10, jnp.float32)
    lora_logits, _ = llama.forward(lp, cfg, ids, pos, cache2, mask)
    np.testing.assert_allclose(
        np.asarray(base_logits), np.asarray(lora_logits), atol=1e-5
    )
    # lm_head excluded from adapters
    assert "lora_a" not in lp.get("lm_head", {})
    # merge of zero adapters is identity
    merged = lora_lib.merge(lp)
    np.testing.assert_allclose(
        np.asarray(merged["layers"][0]["attn"]["q"]["kernel"]),
        np.asarray(params["layers"][0]["attn"]["q"]["kernel"]),
        atol=1e-6,
    )


def test_lora_mask_and_roundtrip(tiny_cfg_params):
    cfg, params = tiny_cfg_params
    import copy

    lp = lora_lib.init_lora(copy.deepcopy(params), 4, 8, jax.random.PRNGKey(1))
    mask = lora_lib.lora_mask(lp)
    flat_mask = jax.tree.leaves(mask)
    assert any(flat_mask) and not all(flat_mask)
    # extract → perturb → load roundtrip
    flat = lora_lib.extract_adapters(lp)
    assert all(k.endswith(("lora_a", "lora_b")) for k in flat)
    for k in flat:
        flat[k] = flat[k] + 1.0
    lp = lora_lib.load_adapters(lp, flat)
    assert float(lp["layers"][0]["attn"]["q"]["lora_b"][0, 0]) == 1.0


def test_masked_training_reduces_loss(tiny_cfg_params):
    import copy

    import optax

    cfg, params = tiny_cfg_params
    lp = lora_lib.init_lora(copy.deepcopy(params), 8, 16, jax.random.PRNGKey(1))
    labels = jax.tree.map(lambda m: "train" if m else "freeze",
                          lora_lib.lora_mask(lp))
    opt = optax.multi_transform(
        {"train": optax.adamw(5e-2), "freeze": optax.set_to_zero()}, labels)
    state = opt.init(lp)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(4, 128, (4, 16)), jnp.int32),
        "attention_mask": jnp.ones((4, 16), jnp.int32),
        "loss_mask": jnp.ones((4, 16), jnp.int32),
    }

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(causal_lm_loss)(
            p, cfg, batch["input_ids"], batch["attention_mask"],
            batch["loss_mask"],
        )
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    losses = []
    for _ in range(20):
        lp, state, loss = step(lp, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.3, losses
    # base weights untouched
    np.testing.assert_allclose(
        np.asarray(lp["layers"][0]["attn"]["q"]["kernel"]),
        np.asarray(params["layers"][0]["attn"]["q"]["kernel"]),
        atol=1e-6,
    )


def test_rag_train_pipeline(tmp_path, repo_root):
    """RAG.train end-to-end with tiny models (mirrors reference
    test_train_lora, zeroshot_test.py:126)."""
    from test_pipeline_e2e import compose, run_main
    from tiny_models import build_tiny_bert, build_tiny_llama

    bert = build_tiny_bert(str(tmp_path / "bert"))
    llama_dir = build_tiny_llama(str(tmp_path / "llama"))
    # fixture has only a dev split; alias it as train for the test
    cfg = compose(
        tmp_path, repo_root,
        "retriever=contriever",
        f"retriever.init_args.model_name={bert}",
        "retriever.init_args.max_len=64",
        "generator=tinyllama-chat",
        f"generator.init_args.model_name={llama_dir}",
        "generator.init_args.max_new_tokens=4",
        "generator.init_args.max_length=96",
        "generator.init_args.batch_size=4",
        "train=lora",
        "train.test_size=8",
        "train.trainer.per_device_train_batch_size=4",
        "train.trainer.learning_rate=0.005",
        "retrieve_top_k=4", "rerank_top_k=4", "generation_top_k=1",
    )
    cfg["dataset"]["train"] = cfg["dataset"]["dev"]
    run_main(cfg)
    exps = [
        d for d in os.listdir(f"{tmp_path}/experiments") if not d.startswith("tmp_")
    ]
    assert len(exps) == 1
    exp = os.path.join(str(tmp_path), "experiments", exps[0])
    hist = json.load(open(os.path.join(exp, "train_history.json")))
    assert hist["steps"] >= 10
    assert os.path.exists(os.path.join(exp, "train", "adapters_best.npz"))
    # training on this tiny corpus must reduce eval loss
    assert hist["best_eval_loss"] < hist["pre_train_eval_loss"]
