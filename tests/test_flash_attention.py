"""Flash-attention Pallas kernel vs reference einsum attention (interpret mode
on CPU; compiled on TPU)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bergen_tpu.ops.flash_attention import flash_attention, flash_attention_single_head

INTERPRET = jax.default_backend() != "tpu"


def ref_attention(q, k, v, causal=True, q_offset=0):
    d = q.shape[-1]
    s = np.einsum("qd,kd->qk", q, k) / math.sqrt(d)
    if causal:
        Sq, Sk = s.shape
        q_pos = q_offset + np.arange(Sq)[:, None]
        k_pos = np.arange(Sk)[None, :]
        s = np.where(k_pos <= q_pos, s, -1e30)
    p = np.exp(s - s.max(axis=1, keepdims=True))
    p = p / p.sum(axis=1, keepdims=True)
    return p @ v


def test_single_head_causal():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(256, 64)).astype(np.float32)
    k = rng.normal(size=(256, 64)).astype(np.float32)
    v = rng.normal(size=(256, 64)).astype(np.float32)
    out = np.asarray(
        flash_attention_single_head(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True,
            block_q=128, block_k=128, interpret=INTERPRET,
        )
    )
    np.testing.assert_allclose(out, ref_attention(q, k, v), atol=2e-5, rtol=1e-4)


def test_single_head_non_causal_multi_block():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(128, 32)).astype(np.float32)
    k = rng.normal(size=(384, 32)).astype(np.float32)
    v = rng.normal(size=(384, 32)).astype(np.float32)
    out = np.asarray(
        flash_attention_single_head(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=False,
            block_q=64, block_k=128, interpret=INTERPRET,
        )
    )
    np.testing.assert_allclose(out, ref_attention(q, k, v, causal=False),
                               atol=2e-5, rtol=1e-4)


def test_q_offset_decode_window():
    """Queries at absolute positions [128..255] against 256 keys (the chunked
    prefill pattern)."""
    rng = np.random.default_rng(2)
    q = rng.normal(size=(128, 32)).astype(np.float32)
    k = rng.normal(size=(256, 32)).astype(np.float32)
    v = rng.normal(size=(256, 32)).astype(np.float32)
    out = np.asarray(
        flash_attention_single_head(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True,
            block_q=128, block_k=128, q_offset=128, interpret=INTERPRET,
        )
    )
    np.testing.assert_allclose(out, ref_attention(q, k, v, q_offset=128),
                               atol=2e-5, rtol=1e-4)


def test_batched_gqa_with_padding():
    rng = np.random.default_rng(3)
    B, Sq, H, KH, d = 2, 100, 4, 2, 32  # Sq not a block multiple → padding path
    q = rng.normal(size=(B, Sq, H, d)).astype(np.float32)
    k = rng.normal(size=(B, Sq, KH, d)).astype(np.float32)
    v = rng.normal(size=(B, Sq, KH, d)).astype(np.float32)
    out = np.asarray(
        flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        causal=True, block_q=64, block_k=64,
                        interpret=INTERPRET)
    )
    group = H // KH
    for b in range(B):
        for h in range(H):
            ref = ref_attention(q[b, :, h], k[b, :, h // group],
                                v[b, :, h // group])
            np.testing.assert_allclose(out[b, :, h], ref, atol=3e-5, rtol=1e-4,
                                       err_msg=f"b={b} h={h}")


def test_flash_attention_band_matches_masked_einsum():
    """The banded kernel (per-query dynamic key bounds — the serving
    drain's chunked prefill) must match a masked-softmax einsum, including
    GQA head grouping, ragged bands, and empty bands (zero rows)."""
    import numpy as np

    from bergen_tpu.ops.flash_attention import flash_attention_band

    rng = np.random.default_rng(3)
    Sq, Sk, H, KH, d = 24, 96, 8, 4, 16
    q = jnp.asarray(rng.normal(size=(Sq, H, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(Sk, KH, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(Sk, KH, d)).astype(np.float32))
    lo = rng.integers(0, 20, Sq)
    hi = lo + rng.integers(0, 60, Sq)  # some rows empty (hi == lo)
    hi[3] = lo[3]                       # force an empty band
    band = jnp.asarray(np.stack([lo, hi], 1).astype(np.int32))

    got = flash_attention_band(q, k, v, band, interpret=True)

    group = H // KH
    kr = jnp.repeat(k, group, axis=1)   # [Sk, H, d]
    vr = jnp.repeat(v, group, axis=1)
    s = jnp.einsum("qhd,khd->hqk", q, kr) / np.sqrt(d)
    pos = np.arange(Sk)
    m = (pos[None, :] >= lo[:, None]) & (pos[None, :] < hi[:, None])
    s = jnp.where(jnp.asarray(m)[None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("hqk,khd->qhd", p, vr)
    ref = jnp.where(jnp.asarray(hi > lo)[:, None, None], ref, 0.0)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)
