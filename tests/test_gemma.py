"""Gemma-family parity vs HF torch (scaled embeddings, +1 RMSNorm, GeGLU,
explicit head_dim)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from bergen_tpu.models import convert, llama


@pytest.fixture(scope="module")
def tiny_gemma():
    from transformers import GemmaConfig, GemmaForCausalLM

    torch.manual_seed(0)
    hf_cfg = GemmaConfig(
        vocab_size=96, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=96, max_position_embeddings=128,
        hidden_act="gelu_pytorch_tanh", hidden_activation="gelu_pytorch_tanh",
    )
    model = GemmaForCausalLM(hf_cfg).eval()
    cfg = llama.LlamaConfig.from_hf(hf_cfg)
    params = convert.llama_from_hf(model.state_dict(), cfg.num_layers)
    return model, cfg, params


def test_config_mapping(tiny_gemma):
    _, cfg, _ = tiny_gemma
    assert cfg.embed_scale and cfg.norm_offset == 1.0
    assert cfg.head_dim == 16
    assert cfg.hidden_act == "gelu_pytorch_tanh"
    assert cfg.tie_word_embeddings  # gemma ties


def test_gemma_logits_parity(tiny_gemma):
    model, cfg, params = tiny_gemma
    ids = np.array([[2, 10, 11, 12, 13, 14]], np.int32)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.float().numpy()
    cache = llama.init_cache(cfg, 1, 6, jnp.float32)
    pos = np.arange(6)[None].astype(np.int32)
    mask = np.tril(np.ones((6, 6), bool))[None]
    logits, _ = llama.forward(
        params, cfg, jnp.asarray(ids), jnp.asarray(pos), cache, jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=5e-4, rtol=1e-2)


def test_gemma_greedy_matches_hf(tiny_gemma):
    model, cfg, params = tiny_gemma
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 96, (2, 6)).astype(np.int32)
    am = np.ones((2, 6), np.int32)
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am),
            do_sample=False, max_new_tokens=5, pad_token_id=0,
        ).numpy()[:, 6:]
    toks = np.asarray(llama.greedy_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(am), 5,
        eos_token_id=1, pad_token_id=0, cache_dtype=jnp.float32,
    ))
    for b in range(2):
        stop = np.where(ref[b] == 1)[0]
        n = stop[0] + 1 if len(stop) else ref.shape[1]
        np.testing.assert_array_equal(toks[b][:n], ref[b][:n])


# --------------------------------------------------------------------------- #
# gemma-2: attn/final logit softcapping, query_pre_attn_scalar, sandwich
# norms, alternating sliding-window layers
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def tiny_gemma2():
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(0)
    hf_cfg = Gemma2Config(
        vocab_size=96, hidden_size=48, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=96, max_position_embeddings=128,
        hidden_activation="gelu_pytorch_tanh",
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        query_pre_attn_scalar=24, sliding_window=4,
    )
    model = Gemma2ForCausalLM(hf_cfg).eval()
    cfg = llama.LlamaConfig.from_hf(hf_cfg)
    params = convert.llama_from_hf(model.state_dict(), cfg.num_layers)
    return model, cfg, params


def test_gemma2_config_mapping(tiny_gemma2):
    _, cfg, params = tiny_gemma2
    assert cfg.post_norms and cfg.sliding_window == 4
    assert cfg.attn_logit_softcap == 50.0 and cfg.final_logit_softcap == 30.0
    assert cfg.query_pre_attn_scalar == 24
    assert "post_attn_norm" in params["layers"][0]
    assert "post_mlp_norm" in params["layers"][0]


def test_gemma2_logits_parity(tiny_gemma2):
    """Sequence longer than the sliding window so local layers actually
    truncate context."""
    model, cfg, params = tiny_gemma2
    rng = np.random.default_rng(1)
    S = 10  # > sliding_window=4
    ids = rng.integers(3, 96, (2, S)).astype(np.int32)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.float().numpy()
    cache = llama.init_cache(cfg, 2, S, jnp.float32)
    pos = np.broadcast_to(np.arange(S), (2, S)).astype(np.int32)
    mask = np.broadcast_to(np.tril(np.ones((S, S), bool)), (2, S, S))
    logits, _ = llama.forward(
        params, cfg, jnp.asarray(ids), jnp.asarray(pos), cache, jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=1e-3, rtol=1e-2)


def test_gemma2_greedy_matches_hf(tiny_gemma2):
    model, cfg, params = tiny_gemma2
    rng = np.random.default_rng(2)
    ids = rng.integers(3, 96, (2, 8)).astype(np.int32)
    am = np.ones((2, 8), np.int32)
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am),
            do_sample=False, max_new_tokens=6, pad_token_id=0,
        ).numpy()[:, 8:]
    toks = np.asarray(llama.greedy_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(am), 6,
        eos_token_id=1, pad_token_id=0, cache_dtype=jnp.float32,
    ))
    for b in range(2):
        stop = np.where(ref[b] == 1)[0]
        n = stop[0] + 1 if len(stop) else ref.shape[1]
        np.testing.assert_array_equal(toks[b][:n], ref[b][:n])
