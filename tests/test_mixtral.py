"""Mixtral MoE parity vs HF torch + expert-parallel sharding."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from bergen_tpu.models import convert, llama


@pytest.fixture(scope="module")
def tiny_mixtral():
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(0)
    hf_cfg = MixtralConfig(
        vocab_size=96, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    model = MixtralForCausalLM(hf_cfg).eval()
    cfg = llama.LlamaConfig.from_hf(hf_cfg)
    params = convert.llama_from_hf(model.state_dict(), cfg.num_layers)
    return model, cfg, params


def test_moe_conversion_shapes(tiny_mixtral):
    _, cfg, params = tiny_mixtral
    assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
    moe = params["layers"][0]["moe"]
    assert moe["gate"]["kernel"].shape == (4, 48, 64)
    assert moe["down"]["kernel"].shape == (4, 64, 48)
    assert moe["router"]["kernel"].shape == (48, 4)


def test_mixtral_logits_parity(tiny_mixtral):
    model, cfg, params = tiny_mixtral
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 96, (2, 8)).astype(np.int32)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.float().numpy()
    cache = llama.init_cache(cfg, 2, 8, jnp.float32)
    pos = np.broadcast_to(np.arange(8), (2, 8)).astype(np.int32)
    mask = np.broadcast_to(np.tril(np.ones((8, 8), bool)), (2, 8, 8))
    logits, _ = llama.forward(
        params, cfg, jnp.asarray(ids), jnp.asarray(pos), cache, jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=5e-4, rtol=1e-2)


def test_mixtral_greedy_matches_hf(tiny_mixtral):
    model, cfg, params = tiny_mixtral
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 96, (2, 6)).astype(np.int32)
    am = np.ones((2, 6), np.int32)
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am),
            do_sample=False, max_new_tokens=5, pad_token_id=0,
        ).numpy()[:, 6:]
    toks = np.asarray(llama.greedy_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(am), 5,
        eos_token_id=model.config.eos_token_id, pad_token_id=0,
        cache_dtype=jnp.float32,
    ))
    for b in range(2):
        stop = np.where(ref[b] == model.config.eos_token_id)[0]
        n = stop[0] + 1 if len(stop) else ref.shape[1]
        np.testing.assert_array_equal(toks[b][:n], ref[b][:n])


def test_expert_parallel_sharding(tiny_mixtral):
    """MoE expert axis shards over the mesh model axis; forward still exact."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    model, cfg, params = tiny_mixtral
    devices = np.array(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devices, axis_names=("data", "model"))
    specs = llama.param_shardings(params)
    placed = jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)),
    )
    assert "model" in str(placed["layers"][0]["moe"]["gate"]["kernel"].sharding.spec)

    ids = np.array([[3, 10, 11, 12]], np.int32)
    cache = llama.init_cache(cfg, 1, 4, jnp.float32)
    pos = np.arange(4)[None].astype(np.int32)
    mask = np.tril(np.ones((4, 4), bool))[None]
    ref, _ = llama.forward(params, cfg, jnp.asarray(ids), jnp.asarray(pos),
                           llama.init_cache(cfg, 1, 4, jnp.float32),
                           jnp.asarray(mask))
    out, _ = llama.forward(placed, cfg, jnp.asarray(ids), jnp.asarray(pos),
                           cache, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
