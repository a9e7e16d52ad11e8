"""Llama decoder parity vs HF torch + greedy generation correctness."""

import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from bergen_tpu.models import convert, llama

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_llama(tmp_path_factory):
    from tiny_models import build_tiny_llama
    from transformers import AutoModelForCausalLM, AutoTokenizer

    d = build_tiny_llama(str(tmp_path_factory.mktemp("m") / "llama"))
    model = AutoModelForCausalLM.from_pretrained(d).eval()
    tok = AutoTokenizer.from_pretrained(d)
    return d, model, tok


def test_forward_logits_parity(tiny_llama):
    _, model, tok = tiny_llama
    cfg = llama.LlamaConfig.from_hf(model.config)
    params = convert.llama_from_hf(model.state_dict(), cfg.num_layers)

    ids = np.array([[2, 10, 11, 12, 13, 14]], dtype=np.int32)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.float().numpy()

    B, S = ids.shape
    cache = llama.init_cache(cfg, B, S, dtype=jnp.float32)
    positions = np.broadcast_to(np.arange(S), (B, S)).astype(np.int32)
    mask = np.tril(np.ones((S, S), bool))[None].repeat(B, 0)
    logits, new_cache = llama.forward(
        params, cfg, jnp.asarray(ids), jnp.asarray(positions), cache,
        jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=1e-3)
    assert int(new_cache["cursor"]) == S


def test_incremental_decode_matches_full_forward(tiny_llama):
    """Prefill + one-token steps through the KV cache must equal a single
    full-sequence forward (the correctness core of the decode loop)."""
    _, model, _ = tiny_llama
    cfg = llama.LlamaConfig.from_hf(model.config)
    params = convert.llama_from_hf(model.state_dict(), cfg.num_layers)

    ids = np.array([[2, 10, 11, 12, 13, 14, 15, 16]], dtype=np.int32)
    B, S = ids.shape
    # full forward
    cache = llama.init_cache(cfg, B, S, dtype=jnp.float32)
    positions = np.broadcast_to(np.arange(S), (B, S)).astype(np.int32)
    full_mask = np.tril(np.ones((S, S), bool))[None]
    full_logits, _ = llama.forward(
        params, cfg, jnp.asarray(ids), jnp.asarray(positions), cache,
        jnp.asarray(full_mask),
    )
    # prefill 4 then decode 4 one at a time
    cache = llama.init_cache(cfg, B, S, dtype=jnp.float32)
    pre = 4
    mask = np.zeros((B, pre, S), bool)
    mask[:, :, :pre] = np.tril(np.ones((pre, pre), bool))
    logits, cache = llama.forward(
        params, cfg, jnp.asarray(ids[:, :pre]),
        jnp.asarray(positions[:, :pre]), cache, jnp.asarray(mask),
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits[:, :pre]), atol=1e-4
    )
    for t in range(pre, S):
        mask = np.zeros((B, 1, S), bool)
        mask[:, :, : t + 1] = True
        logits, cache = llama.forward(
            params, cfg, jnp.asarray(ids[:, t : t + 1]),
            jnp.asarray(positions[:, t : t + 1]), cache, jnp.asarray(mask),
        )
        np.testing.assert_allclose(
            np.asarray(logits[:, 0]), np.asarray(full_logits[:, t]), atol=1e-4,
            err_msg=f"step {t}",
        )


def test_greedy_generate_matches_hf(tiny_llama):
    _, model, tok = tiny_llama
    cfg = llama.LlamaConfig.from_hf(model.config)
    params = convert.llama_from_hf(model.state_dict(), cfg.num_layers)

    prompts = ["what is the capital of avaria", "the capital of borundi is"]
    enc = tok(prompts, return_tensors="pt", padding=True, padding_side="left")
    with torch.no_grad():
        ref_out = model.generate(
            input_ids=enc["input_ids"], attention_mask=enc["attention_mask"],
            do_sample=False, max_new_tokens=8,
            pad_token_id=tok.pad_token_id,
        )
    ref_new = ref_out[:, enc["input_ids"].shape[1]:].numpy()

    toks = llama.greedy_generate(
        params, cfg,
        jnp.asarray(enc["input_ids"].numpy().astype(np.int32)),
        jnp.asarray(enc["attention_mask"].numpy().astype(np.int32)),
        max_new_tokens=8,
        eos_token_id=tok.eos_token_id,
        pad_token_id=tok.pad_token_id,
        cache_dtype=jnp.float32,
    )
    toks = np.asarray(toks)
    # HF pads after EOS with pad_token; compare up to and including first EOS
    for b in range(len(prompts)):
        ref_row = ref_new[b]
        got_row = toks[b]
        stop = np.where(ref_row == tok.eos_token_id)[0]
        n = (stop[0] + 1) if len(stop) else len(ref_row)
        np.testing.assert_array_equal(got_row[:n], ref_row[:n], err_msg=f"row {b}")


def test_generator_class_end_to_end(tiny_llama):
    from bergen_tpu import confy
    from bergen_tpu.models.generators.jax_llm import LLM

    model_dir, _, _ = tiny_llama
    prompt = confy.Config(
        {
            "system": "You are a helpful assistant.",
            "user": 'f"Background: {docs} Question: {question}"',
            "system_without_docs": "You are a helpful assistant.",
            "user_without_docs": 'f"Question: {question}"',
        }
    )
    gen = LLM(model_dir, batch_size=2, max_new_tokens=4, max_length=64,
              prompt=prompt)
    import datasets as hfds

    ds = hfds.Dataset.from_dict(
        {
            "q_id": ["q0", "q1", "q2"],
            "query": ["what is the capital of avaria", "capital of borundi",
                      "what is a lighthouse"],
            "doc": [["the capital of avaria is ashford"],
                    ["the capital of borundi is blackwell"], ["a tower with light"]],
            "label": [["Ashford"], ["Blackwell"], ["tower"]],
            "ranking_labels": [["x"], ["y"], ["z"]],
        }
    )
    q_ids, queries, instructions, responses, labels, ranking_labels = gen.eval(ds)
    assert sorted(q_ids) == ["q0", "q1", "q2"]
    assert len(responses) == 3 and all(isinstance(r, str) for r in responses)
    assert "Document 1:" in instructions[0]
    # prompt compiler uses the chat template
    assert "assistant :" in instructions[0]


# --------------------------------------------------------------------------- #
# phi-3: fused qkv_proj / gate_up_proj layout
# --------------------------------------------------------------------------- #


def test_phi3_logits_parity():
    from transformers import Phi3Config, Phi3ForCausalLM

    torch.manual_seed(0)
    hf_cfg = Phi3Config(
        vocab_size=96, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=96,
        max_position_embeddings=128, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    model = Phi3ForCausalLM(hf_cfg).eval()
    cfg = llama.LlamaConfig.from_hf(hf_cfg)
    params = convert.llama_from_hf(model.state_dict(), cfg.num_layers)

    rng = np.random.default_rng(3)
    ids = rng.integers(3, 96, (2, 7)).astype(np.int32)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.float().numpy()
    cache = llama.init_cache(cfg, 2, 7, jnp.float32)
    pos = np.broadcast_to(np.arange(7), (2, 7)).astype(np.int32)
    mask = np.broadcast_to(np.tril(np.ones((7, 7), bool)), (2, 7, 7))
    logits, _ = llama.forward(
        params, cfg, jnp.asarray(ids), jnp.asarray(pos), cache, jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=5e-4, rtol=1e-2)


# --------------------------------------------------------------------------- #
# cohere / command-r: parallel residual block, bias-free LayerNorm,
# interleaved rope, logit_scale, tied embeddings
# --------------------------------------------------------------------------- #


def test_cohere_logits_parity():
    from transformers import CohereConfig, CohereForCausalLM

    torch.manual_seed(0)
    hf_cfg = CohereConfig(
        vocab_size=96, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=96,
        max_position_embeddings=128, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, logit_scale=0.25,
    )
    model = CohereForCausalLM(hf_cfg).eval()
    cfg = llama.LlamaConfig.from_hf(hf_cfg)
    assert cfg.parallel_block and cfg.use_layernorm and cfg.rope_interleaved
    assert cfg.logit_scale == 0.25
    params = convert.llama_from_hf(model.state_dict(), cfg.num_layers)
    assert "mlp_norm" not in params["layers"][0]

    rng = np.random.default_rng(4)
    ids = rng.integers(3, 96, (2, 7)).astype(np.int32)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.float().numpy()
    cache = llama.init_cache(cfg, 2, 7, jnp.float32)
    pos = np.broadcast_to(np.arange(7), (2, 7)).astype(np.int32)
    mask = np.broadcast_to(np.tril(np.ones((7, 7), bool)), (2, 7, 7))
    logits, _ = llama.forward(
        params, cfg, jnp.asarray(ids), jnp.asarray(pos), cache, jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=5e-4, rtol=1e-2)


def test_cohere_greedy_matches_hf():
    from transformers import CohereConfig, CohereForCausalLM

    torch.manual_seed(1)
    hf_cfg = CohereConfig(
        vocab_size=96, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=96,
        max_position_embeddings=128, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, logit_scale=0.0625,
    )
    model = CohereForCausalLM(hf_cfg).eval()
    cfg = llama.LlamaConfig.from_hf(hf_cfg)
    params = convert.llama_from_hf(model.state_dict(), cfg.num_layers)
    rng = np.random.default_rng(5)
    ids = rng.integers(3, 96, (2, 6)).astype(np.int32)
    am = np.ones((2, 6), np.int32)
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am),
            do_sample=False, max_new_tokens=5, pad_token_id=0,
        ).numpy()[:, 6:]
    toks = np.asarray(llama.greedy_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(am), 5,
        eos_token_id=2, pad_token_id=0, cache_dtype=jnp.float32,
    ))
    for b in range(2):
        stop = np.where(ref[b] == 2)[0]
        n = stop[0] + 1 if len(stop) else ref.shape[1]
        np.testing.assert_array_equal(toks[b][:n], ref[b][:n])


# ---------------------------------------------------------------------------
# rope scaling (llama-3.1/3.2 band interpolation — reference runs e.g.
# meta-llama/Llama-3.2-3B-Instruct whose config carries rope_scaling llama3)
# ---------------------------------------------------------------------------


def test_llama3_rope_scaling_logits_parity(tmp_path):
    from tiny_models import build_tiny_llama
    from transformers import AutoModelForCausalLM

    d = build_tiny_llama(
        str(tmp_path / "llama_rs"), rope_scaling={
            "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0, "original_max_position_embeddings": 32,
        },
    )
    model = AutoModelForCausalLM.from_pretrained(d).eval()
    cfg = llama.LlamaConfig.from_hf(model.config)
    assert cfg.rope_scaling_type == "llama3"
    params = convert.llama_from_hf(model.state_dict(), cfg.num_layers)

    # long enough (> original_max/2) that scaled low-freq bands matter
    rng = np.random.default_rng(3)
    ids = rng.integers(4, 40, (1, 48)).astype(np.int32)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.float().numpy()
    B, S = ids.shape
    cache = llama.init_cache(cfg, B, S, dtype=jnp.float32)
    positions = np.broadcast_to(np.arange(S), (B, S)).astype(np.int32)
    mask = np.tril(np.ones((S, S), bool))[None].repeat(B, 0)
    logits, _ = llama.forward(
        params, cfg, jnp.asarray(ids), jnp.asarray(positions), cache,
        jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-4, rtol=1e-3)
    # an unscaled config on the same weights must DIFFER (guard against the
    # scaling silently not being applied)
    cfg_plain = dataclasses_replace_no_scaling(cfg)
    logits2, _ = llama.forward(
        params, cfg_plain, jnp.asarray(ids), jnp.asarray(positions),
        llama.init_cache(cfg_plain, B, S, dtype=jnp.float32), jnp.asarray(mask),
    )
    assert np.abs(np.asarray(logits2) - ref).max() > 1e-3


def dataclasses_replace_no_scaling(cfg):
    import dataclasses as _dc
    return _dc.replace(cfg, rope_scaling_type=None)


def test_unsupported_rope_scaling_fails_loudly():
    class FakeCfg:
        model_type = "llama"
        vocab_size = 32
        hidden_size = 16
        num_hidden_layers = 1
        num_attention_heads = 2
        intermediate_size = 32
        max_position_embeddings = 64
        rope_scaling = {"rope_type": "yarn", "factor": 4.0}

    with pytest.raises(NotImplementedError):
        llama.LlamaConfig.from_hf(FakeCfg())
