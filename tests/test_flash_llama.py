"""llama prefill through the flash kernel must match the einsum path (and HF)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bergen_tpu.models import llama


@pytest.fixture(scope="module")
def cfg_params():
    cfg = llama.LlamaConfig(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=96, max_position_embeddings=512,
    )
    return cfg, llama.init(jax.random.PRNGKey(0), cfg)


def _prefill(cfg, params, ids, am):
    B, S = ids.shape
    cache = llama.init_cache(cfg, B, S + 4, jnp.float32)
    positions = jnp.maximum(jnp.cumsum(jnp.asarray(am), axis=1) - 1, 0)
    causal = np.tril(np.ones((S, S), bool))
    mask = np.zeros((B, S, S + 4), bool)
    mask[:, :, :S] = causal[None] & am[:, None, :].astype(bool)
    logits, _ = llama.forward(
        params, cfg, jnp.asarray(ids), positions, cache, jnp.asarray(mask)
    )
    return np.asarray(logits)


def test_flash_prefill_matches_einsum(cfg_params):
    cfg, params = cfg_params
    rng = np.random.default_rng(0)
    B, S = 2, 24
    ids = rng.integers(3, 128, (B, S)).astype(np.int32)
    am = np.ones((B, S), np.int32)
    am[1, :5] = 0  # left padding
    ids = np.where(am, ids, 0)

    llama.USE_FLASH_PREFILL = False
    ref = _prefill(cfg, params, ids, am)
    llama.USE_FLASH_PREFILL = True
    try:
        out = _prefill(cfg, params, ids, am)
    finally:
        llama.USE_FLASH_PREFILL = None
    valid = am.astype(bool)
    np.testing.assert_allclose(out[valid], ref[valid], atol=2e-4, rtol=1e-3)


def test_flash_generate_same_tokens(cfg_params):
    cfg, params = cfg_params
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 128, (2, 12)).astype(np.int32)
    am = np.ones((2, 12), np.int32)

    llama.USE_FLASH_PREFILL = False
    ref = np.asarray(llama.greedy_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(am), 6, eos_token_id=2,
        pad_token_id=0, cache_dtype=jnp.float32,
    ))
    llama.USE_FLASH_PREFILL = True
    try:
        out = np.asarray(llama.greedy_generate(
            params, cfg, jnp.asarray(ids), jnp.asarray(am), 6, eos_token_id=2,
            pad_token_id=0, cache_dtype=jnp.float32,
        ))
    finally:
        llama.USE_FLASH_PREFILL = None
    np.testing.assert_array_equal(out, ref)
