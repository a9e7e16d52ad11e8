"""Qwen2-family (llama layout + qkv biases) parity vs HF torch."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from bergen_tpu.models import convert, llama


def test_qwen2_logits_parity():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    hf_cfg = Qwen2Config(
        vocab_size=96, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=96,
        max_position_embeddings=128, tie_word_embeddings=False,
        rope_theta=10000.0,
    )
    model = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = llama.LlamaConfig.from_hf(hf_cfg)
    params = convert.llama_from_hf(model.state_dict(), cfg.num_layers)
    # qwen2 ships qkv biases — conversion must pick them up
    assert "bias" in params["layers"][0]["attn"]["q"]

    ids = np.array([[3, 10, 11, 12, 13]], np.int32)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.float().numpy()
    cache = llama.init_cache(cfg, 1, 5, jnp.float32)
    pos = np.arange(5)[None].astype(np.int32)
    mask = np.tril(np.ones((5, 5), bool))[None]
    logits, _ = llama.forward(
        params, cfg, jnp.asarray(ids), jnp.asarray(pos), cache, jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-4, rtol=1e-3)


def test_qwen2_greedy_matches_hf():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(1)
    hf_cfg = Qwen2Config(
        vocab_size=96, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=96,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    model = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = llama.LlamaConfig.from_hf(hf_cfg)
    params = convert.llama_from_hf(model.state_dict(), cfg.num_layers)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 96, (2, 7)).astype(np.int32)
    am = np.ones((2, 7), np.int32)
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am),
            do_sample=False, max_new_tokens=6, pad_token_id=0,
        ).numpy()[:, 7:]
    toks = np.asarray(llama.greedy_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(am), 6,
        eos_token_id=hf_cfg.eos_token_id, pad_token_id=0,
        cache_dtype=jnp.float32,
    ))
    for b in range(2):
        stop = np.where(ref[b] == hf_cfg.eos_token_id)[0]
        n = stop[0] + 1 if len(stop) else ref.shape[1]
        np.testing.assert_array_equal(toks[b][:n], ref[b][:n])
