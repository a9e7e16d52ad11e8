"""Parity tests for the batched GQA decode-attention kernel
(`ops/decode_attention.py`) — the Pallas replacement for the S==1 decode
einsum that batch-loops per pool row on TPU.  Kernel runs in interpreter
mode on the CPU mesh; the einsum composition is the reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bergen_tpu.ops.decode_attention import decode_attention


def _einsum_ref(q, k, v, valid, scale):
    B, H, Dh = q.shape
    KH = k.shape[2]
    group = H // KH
    qg = q.reshape(B, KH, group, Dh)
    s = jnp.einsum("bkgd,blkd->bkgl", qg, k,
                   preferred_element_type=jnp.float32) * scale
    s = jnp.where(valid[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, -1)
    return jnp.einsum("bkgl,blkd->bkgd", p, v,
                      preferred_element_type=jnp.float32).reshape(B, H, Dh)


@pytest.mark.parametrize(
    "B,H,KH,Dh,L",
    [
        (5, 8, 2, 64, 64),     # small GQA
        (3, 32, 4, 64, 832),   # TinyLlama serving-pool dims
        (4, 8, 8, 128, 96),    # MHA, Dh=128 (llama-3 style heads)
        (2, 4, 1, 64, 48),     # MQA
    ],
)
def test_matches_einsum(B, H, KH, Dh, L):
    rng = np.random.default_rng(B * 1000 + L)
    q = jnp.asarray(rng.standard_normal((B, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, KH, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, KH, Dh)), jnp.float32)
    valid = jnp.asarray(rng.random((B, L)) < 0.7)
    scale = Dh ** -0.5
    got = decode_attention(q, k, v, valid, sm_scale=scale, interpret=True)
    ref = _einsum_ref(q, k, v, valid, scale)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-5, atol=2e-5)


def test_fully_masked_row_is_finite():
    # inactive serving slots have all-False masks: output must stay finite
    rng = np.random.default_rng(0)
    B, H, KH, Dh, L = 3, 8, 2, 64, 64
    q = jnp.asarray(rng.standard_normal((B, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, KH, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, KH, Dh)), jnp.float32)
    valid = jnp.asarray(rng.random((B, L)) < 0.5).at[1].set(False)
    got = decode_attention(q, k, v, valid, sm_scale=Dh ** -0.5,
                           interpret=True)
    assert bool(jnp.all(jnp.isfinite(got)))


def test_llama_decode_uses_kernel_and_matches(monkeypatch):
    """End-to-end: llama greedy decode with BERGEN_TPU_FLASH_DECODE=interpret
    (forces the kernel through the interpreter on CPU) must be token-exact
    vs the einsum path.  L=272 is a 16-multiple so the gate engages."""
    from bergen_tpu.models import llama

    cfg = llama.LlamaConfig(vocab_size=211, hidden_size=64, num_layers=2,
                            num_heads=4, num_kv_heads=2, intermediate_size=128,
                            max_position_embeddings=512)
    params = llama.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (2, 16)), jnp.int32)
    am = jnp.ones_like(ids)

    monkeypatch.setenv("BERGEN_TPU_FLASH_DECODE", "0")
    ref = np.asarray(llama.greedy_generate(
        params, cfg, ids, am, 16, eos_token_id=-1, pad_token_id=0))

    monkeypatch.setenv("BERGEN_TPU_FLASH_DECODE", "interpret")
    got = np.asarray(llama.greedy_generate(
        params, cfg, ids, am, 16, eos_token_id=-1, pad_token_id=0))
    np.testing.assert_array_equal(got, ref)
