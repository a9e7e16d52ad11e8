"""Paged-cache decode through llama.forward must match the standard KV cache
token for token, including across the 128-token page boundary (flush)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bergen_tpu.models import convert, llama

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

STEPS = 140  # > PAGE: exercises tail wrap + page flush


@pytest.fixture(scope="module")
def tiny():
    from tiny_models import build_tiny_llama
    from transformers import AutoModelForCausalLM

    d = build_tiny_llama(os.path.join("/tmp", "paged_llama_m"))
    model = AutoModelForCausalLM.from_pretrained(d).eval()
    cfg = llama.LlamaConfig.from_hf(model.config)
    params = convert.llama_from_hf(model.state_dict(), cfg.num_layers)
    return cfg, params


def test_paged_decode_matches_standard_cache(tiny):
    cfg, params = tiny
    S = 2
    rng = np.random.default_rng(0)
    toks = rng.integers(2, 100, size=(STEPS, S)).astype(np.int32)

    L = STEPS + 8
    std = llama.init_cache(cfg, S, L, dtype=jnp.float32)
    maxP = -(-STEPS // 128)
    paged = llama.init_paged_cache(cfg, n_pages=S * maxP + 1, slots=S,
                                   max_pages=maxP, dtype=jnp.float32)
    paged["tables"] = jnp.asarray(
        1 + np.arange(S * maxP).reshape(S, maxP), jnp.int32
    )

    step_std = jax.jit(lambda p, ids, pos, c, m: llama.forward(
        p, cfg, ids, pos, c, m))
    step_paged = jax.jit(lambda p, ids, pos, c: llama.forward(
        p, cfg, ids, pos, c, None))

    for t in range(STEPS):
        ids = jnp.asarray(toks[t][:, None])
        pos = jnp.full((S, 1), t, jnp.int32)
        mask = (jnp.arange(L)[None, None, :] <= t)
        lo_s, std = step_std(params, ids, pos, std, mask)
        lo_p, paged = step_paged(params, ids, pos, paged)
        np.testing.assert_allclose(
            np.asarray(lo_s[:, 0]), np.asarray(lo_p[:, 0]),
            atol=2e-4, rtol=1e-3, err_msg=f"step {t}",
        )
    assert int(np.asarray(paged["lengths"])[0]) == STEPS
    # page 1 (slot 0's first page) must hold flushed K: nonzero content
    assert float(jnp.abs(paged["k_pool"][0, 1]).sum()) > 0


def test_paged_active_mask_freezes_slots(tiny):
    cfg, params = tiny
    S = 2
    paged = llama.init_paged_cache(cfg, n_pages=3, slots=S, max_pages=1,
                                   dtype=jnp.float32)
    paged["tables"] = jnp.asarray([[1], [2]], jnp.int32)
    paged["active"] = jnp.asarray([True, False])
    ids = jnp.asarray([[5], [7]], jnp.int32)
    pos = jnp.zeros((S, 1), jnp.int32)
    _, paged = llama.forward(params, cfg, ids, pos, paged, None)
    np.testing.assert_array_equal(np.asarray(paged["lengths"]), [1, 0])


def test_paged_guards(tiny):
    cfg, params = tiny
    paged = llama.init_paged_cache(cfg, n_pages=2, slots=1, max_pages=1,
                                   dtype=jnp.float32)
    with pytest.raises(NotImplementedError, match="decode-only"):
        llama.forward(params, cfg, jnp.zeros((1, 4), jnp.int32),
                      jnp.zeros((1, 4), jnp.int32), paged, None)
