"""Encoder flash path must match the einsum path (incl. padded batches)."""

import numpy as np
import pytest

import jax.numpy as jnp

from bergen_tpu.models import bert, core


def test_encoder_flash_matches_einsum():
    import jax

    cfg = bert.BertConfig(
        vocab_size=200, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position_embeddings=256,
    )
    params = bert.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 200, (3, 160)).astype(np.int32)
    am = np.ones((3, 160), np.int32)
    am[1, 100:] = 0
    am[2, 40:] = 0
    ids = np.where(am, ids, 0)

    try:
        core.USE_FLASH_ENCODER = False
        ref = np.asarray(
            bert.encode(params, cfg, jnp.asarray(ids), jnp.asarray(am)))
        core.USE_FLASH_ENCODER = True
        out = np.asarray(
            bert.encode(params, cfg, jnp.asarray(ids), jnp.asarray(am)))
    finally:
        core.USE_FLASH_ENCODER = None
    valid = am.astype(bool)
    np.testing.assert_allclose(out[valid], ref[valid], atol=2e-4, rtol=1e-3)
