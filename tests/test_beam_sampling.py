"""Beam search + sampling decode paths (reference vllm.py:61-78)."""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from bergen_tpu.models import convert, llama

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    from tiny_models import build_tiny_llama
    from transformers import AutoModelForCausalLM, AutoTokenizer

    d = build_tiny_llama(str(tmp_path_factory.mktemp("m") / "llama"))
    model = AutoModelForCausalLM.from_pretrained(d).eval()
    tok = AutoTokenizer.from_pretrained(d)
    cfg = llama.LlamaConfig.from_hf(model.config)
    params = convert.llama_from_hf(model.state_dict(), cfg.num_layers)
    return d, model, tok, cfg, params


def _prompts():
    rng = np.random.default_rng(11)
    ids = rng.integers(4, 40, (3, 7)).astype(np.int32)
    am = np.ones((3, 7), np.int32)
    return ids, am


def test_beam_width_1_equals_greedy(tiny):
    _, _, _, cfg, params = tiny
    ids, am = _prompts()
    g = llama.greedy_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(am), 6,
        eos_token_id=3, pad_token_id=0, cache_dtype=jnp.float32,
    )
    b = llama.beam_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(am), 6, num_beams=1,
        eos_token_id=3, pad_token_id=0, cache_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(g), np.asarray(b))


def test_beam_matches_hf(tiny):
    _, model, _, cfg, params = tiny
    ids, am = _prompts()
    W, T = 3, 6
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am),
            do_sample=False, num_beams=W, max_new_tokens=T, min_new_tokens=T,
            early_stopping=False, length_penalty=1.0, pad_token_id=0,
            eos_token_id=999,  # unreachable: isolate pure beam dynamics
        ).numpy()[:, 7:]
    out = np.asarray(llama.beam_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(am), T, num_beams=W,
        eos_token_id=999, pad_token_id=0, cache_dtype=jnp.float32,
    ))
    np.testing.assert_array_equal(out, ref)


def test_beam_score_at_least_greedy(tiny):
    """The whole point of beam search: the chosen sequence's model logprob
    must be >= the greedy sequence's."""
    _, model, _, cfg, params = tiny
    ids, am = _prompts()
    T = 8

    def seq_logprob(gen):  # sum log p(token | prefix) under the HF model
        full = np.concatenate([ids, gen], axis=1)
        amf = np.concatenate([am, np.ones_like(gen)], axis=1)
        with torch.no_grad():
            lg = model(input_ids=torch.tensor(full),
                       attention_mask=torch.tensor(amf)).logits.float()
        lp = torch.log_softmax(lg, -1).numpy()
        tot = np.zeros(gen.shape[0])
        for b in range(gen.shape[0]):
            for t in range(gen.shape[1]):
                tot[b] += lp[b, ids.shape[1] - 1 + t, gen[b, t]]
        return tot

    g = np.asarray(llama.greedy_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(am), T,
        eos_token_id=999, pad_token_id=0, cache_dtype=jnp.float32,
    ))
    b = np.asarray(llama.beam_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(am), T, num_beams=4,
        eos_token_id=999, pad_token_id=0, cache_dtype=jnp.float32,
    ))
    assert np.all(seq_logprob(b) >= seq_logprob(g) - 1e-4)


def test_sample_deterministic_and_greedy_limit(tiny):
    _, _, _, cfg, params = tiny
    ids, am = _prompts()
    kw = dict(eos_token_id=3, pad_token_id=0, cache_dtype=jnp.float32)
    s1 = np.asarray(llama.sample_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(am), 5,
        temperature=0.8, rng_key=jax.random.PRNGKey(7), **kw))
    s2 = np.asarray(llama.sample_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(am), 5,
        temperature=0.8, rng_key=jax.random.PRNGKey(7), **kw))
    np.testing.assert_array_equal(s1, s2)
    # temperature -> 0 collapses to greedy
    cold = np.asarray(llama.sample_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(am), 5,
        temperature=1e-4, rng_key=jax.random.PRNGKey(7), **kw))
    g = np.asarray(llama.greedy_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(am), 5, **kw))
    np.testing.assert_array_equal(cold, g)


def test_llm_generator_beam_option(tiny, tmp_path):
    d, _, _, _, _ = tiny
    from bergen_tpu.models.generators.jax_llm import LLM

    gen = LLM(model_name=d, max_new_tokens=5, max_length=64, batch_size=4,
              num_beams=3)
    assert gen.use_beam_search and gen.best_of == 3
    out = gen.generate(["user : what is a river \n assistant : "])
    assert len(out) == 1 and isinstance(out[0], str)
    with pytest.raises(ValueError):
        LLM(model_name=d, max_new_tokens=5, max_length=64,
            use_beam_search=True, best_of=2, temperature=0.5)
