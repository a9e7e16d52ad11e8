"""Fused encoder attention under a multi-device mesh (shard_map wrap).

Runs the Pallas kernel in interpreter mode across the 8-virtual-device CPU
mesh (conftest) to validate the batch-partitioned path a real multi-chip
TPU would take, plus the unwrapped odd-batch fallback.
"""

import math

import numpy as np

import jax
import jax.numpy as jnp


def _ref(q, k, v, mask, num_heads):
    B, S, D = q.shape
    Dh = D // num_heads
    qh = q.reshape(B, S, num_heads, Dh)
    kh = k.reshape(B, S, num_heads, Dh)
    vh = v.reshape(B, S, num_heads, Dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) / math.sqrt(Dh)
    bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e30)
    p = jax.nn.softmax(s + bias, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vh,
                      preferred_element_type=jnp.float32
                      ).astype(q.dtype).reshape(B, S, D)


def test_sharded_batch_matches_reference():
    from bergen_tpu.ops import encoder_attention as ea

    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    B, S, H, Dh = 16, 160, 4, 32  # B divides the 8-device mesh
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, H * Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H * Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H * Dh)), jnp.float32)
    mask = np.ones((B, S), np.int32)
    mask[::3, 90:] = 0
    mask = jnp.asarray(mask)

    out = np.asarray(
        jax.jit(ea.encoder_attention, static_argnums=4)(q, k, v, mask, H))
    ref = np.asarray(jax.jit(_ref, static_argnums=4)(q, k, v, mask, H))
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(out[valid], ref[valid], atol=1e-5, rtol=1e-5)


def test_unsharded_odd_batch_falls_back_unwrapped():
    from bergen_tpu.ops import encoder_attention as ea

    B, S, H, Dh = 3, 160, 2, 64  # B does not divide the mesh
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, S, H * Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H * Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H * Dh)), jnp.float32)
    mask = jnp.ones((B, S), jnp.int32)
    out = np.asarray(
        jax.jit(ea.encoder_attention, static_argnums=4)(q, k, v, mask, H))
    ref = np.asarray(jax.jit(_ref, static_argnums=4)(q, k, v, mask, H))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_supported_gates():
    from bergen_tpu.ops import encoder_attention as ea

    # head groups must tile 128 lanes exactly
    assert ea.supported(8, 192, 12, 64, 2, True)
    assert ea.supported(8, 192, 12, 32, 2, True)
    assert ea.supported(8, 192, 4, 128, 2, True)
    assert not ea.supported(8, 192, 8, 96, 2, True)   # 96 doesn't tile lanes
    assert not ea.supported(8, 64, 12, 64, 2, True)   # too short
    assert not ea.supported(8, 2048, 12, 64, 2, True)  # too long for VMEM
    assert not ea.supported(8, 192, 12, 64, 4, True)  # needs [B, S] mask
    assert not ea.supported(8, 192, 12, 64, 2, False)  # TPU only


def test_fused_attention_block_matches_einsum_encode():
    """bert.encode with the whole-block kernel (interpret) vs the XLA path."""
    from bergen_tpu.models import bert, core

    cfg = bert.BertConfig(
        vocab_size=300, hidden_size=128, num_layers=2, num_heads=4,
        intermediate_size=256, max_position_embeddings=256,
    )
    params = bert.init(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    B, S = 16, 160  # B divides the 8-device mesh; S >= MIN_FUSED_SEQ
    ids = rng.integers(3, 300, (B, S)).astype(np.int32)
    am = np.ones((B, S), np.int32)
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


def test_fused_attention_alibi_bias_matches_einsum():
    """jina-style ALiBi encoders: the [H, S, S] additive bias rides the
    fused kernel as a VMEM-constant block."""
    from bergen_tpu.models import bert, core

    cfg = bert.BertConfig(
        vocab_size=300, hidden_size=128, num_layers=2, num_heads=4,
        intermediate_size=256, max_position_embeddings=256,
        position_embedding_type="alibi",
    )
    params = bert.init(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    B, S = 16, 160
    ids = rng.integers(3, 300, (B, S)).astype(np.int32)
    am = np.ones((B, S), np.int32)
    am[0, 120:] = 0
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


def test_fused_t5_encoder_matches_einsum():
    """T5's unscaled scores + relative-position bias on the fused kernel."""
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    from bergen_tpu.models import core, t5

    torch.manual_seed(4)
    hf_cfg = HFT5Config(
        vocab_size=200, d_model=128, d_kv=32, d_ff=256, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=32, feed_forward_proj="relu",
        decoder_start_token_id=0,
    )
    model = T5ForConditionalGeneration(hf_cfg).eval()
    cfg = t5.T5Config.from_hf(hf_cfg)
    params = t5.t5_from_hf(model.state_dict(), cfg)
    rng = np.random.default_rng(4)
    B, S = 16, 160
    ids = rng.integers(3, 200, (B, S)).astype(np.int32)
    am = np.ones((B, S), np.int32)
    am[1, 80:] = 0
    ids = np.where(am, ids, 0)

    try:
        core.USE_FLASH_ENCODER = False
        ref = np.asarray(
            t5.encode(params, cfg, jnp.asarray(ids), jnp.asarray(am)))
        core.USE_FLASH_ENCODER = True
        out = np.asarray(
            t5.encode(params, cfg, jnp.asarray(ids), jnp.asarray(am)))
    finally:
        core.USE_FLASH_ENCODER = None
    valid = am.astype(bool)
    np.testing.assert_allclose(out[valid], ref[valid], atol=2e-4, rtol=1e-3)
