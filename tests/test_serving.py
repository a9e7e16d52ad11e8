"""Continuous-batching engine: outputs must match batch greedy_generate, slots
must be reused across a queue longer than the pool."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bergen_tpu.models import llama
from bergen_tpu.serve import GenerationServer

EOS, PAD = 2, 0


@pytest.fixture(scope="module")
def cfg_params():
    cfg = llama.LlamaConfig(
        vocab_size=96, hidden_size=48, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, max_position_embeddings=256,
    )
    return cfg, llama.init(jax.random.PRNGKey(0), cfg)


def batch_reference(cfg, params, prompts, max_new):
    out = []
    for p in prompts:
        ids = jnp.asarray(np.asarray(p, np.int32)[None])
        am = jnp.ones((1, len(p)), jnp.int32)
        toks = llama.greedy_generate(
            params, cfg, ids, am, max_new, eos_token_id=EOS, pad_token_id=PAD,
            cache_dtype=jnp.float32,
        )
        row = list(np.asarray(toks)[0])
        # cut at eos inclusive, drop pad continuation
        if EOS in row:
            row = row[: row.index(EOS) + 1]
        out.append([int(t) for t in row])
    return out


def server_tokens(tokens, max_new):
    # server emits exactly like reference: cut at eos inclusive / cap max_new
    if EOS in tokens:
        tokens = tokens[: tokens.index(EOS) + 1]
    return tokens[:max_new]


def test_continuous_batching_matches_batch_generate(cfg_params):
    cfg, params = cfg_params
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(3, 96, size=n)) for n in (5, 11, 23, 8, 17, 3)]
    max_new = 10

    server = GenerationServer(params, cfg, EOS, PAD, max_slots=2, max_len=64,
                              prompt_buckets=(8, 16, 32))
    rids = [server.submit(p, max_new) for p in prompts]
    results = server.run()
    ref = batch_reference(cfg, params, prompts, max_new)
    for rid, p, r in zip(rids, prompts, ref):
        got = server_tokens(results[rid], max_new)
        want = [int(t) for t in r][:max_new]
        assert got == want, f"prompt len {len(p)}: {got} != {want}"


def test_slot_reuse_and_capacity(cfg_params):
    cfg, params = cfg_params
    rng = np.random.default_rng(1)
    server = GenerationServer(params, cfg, EOS, PAD, max_slots=2, max_len=48,
                              prompt_buckets=(8, 16))
    # 5 requests through 2 slots
    rids = [server.submit(list(rng.integers(3, 96, size=6)), 4) for _ in range(5)]
    results = server.run()
    assert set(results) == set(rids)
    assert all(1 <= len(v) <= 4 for v in results.values())
    # pool drained back to free
    assert sorted(server.free_slots) == [0, 1]
    assert not server.active


# --------------------------------------------------------------------------- #
# pipeline integration: LLM(serve=True) routes through the server
# --------------------------------------------------------------------------- #


def test_llm_generator_serve_mode_matches_batched(tmp_path):
    import os, sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tiny_models import build_tiny_llama
    from bergen_tpu.models.generators.jax_llm import LLM

    d = build_tiny_llama(str(tmp_path / "llama"))
    kw = dict(model_name=d, max_new_tokens=6, max_length=64, batch_size=4)
    base = LLM(**kw)
    served = LLM(serve=True, max_slots=3, **kw)
    assert served.server is not None
    prompts = [
        "user : what is the capital \n assistant : ",
        "user : tell me about the river bank and the fish \n assistant : ",
        "user : hello \n assistant : ",
        "user : a much longer question about many words that goes on \n assistant : ",
        "user : why \n assistant : ",
    ]
    ref = base.generate(prompts)
    out = served.generate(prompts)
    # continuous batching is still greedy decoding: outputs must match
    assert out == ref


def test_llm_generator_serve_rejects_gemma2():
    """The server fails loudly on architectures its decode step can't run."""
    from bergen_tpu.serve.engine import GenerationServer

    cfg = llama.LlamaConfig(
        vocab_size=64, hidden_size=32, num_layers=1, num_heads=2,
        num_kv_heads=2, intermediate_size=64, post_norms=True,
    )
    params = llama.init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(NotImplementedError):
        GenerationServer(params, cfg, eos_token_id=2, pad_token_id=0)


def test_continuous_batching_w8a8(cfg_params):
    """The serve engine's prefill/decode route through llama._proj, so the
    w8a8 int8-MXU tree must work (and stay close to fp greedy output)."""
    import copy

    from bergen_tpu.models import convert

    cfg, params = cfg_params
    qparams = copy.deepcopy(params)
    convert.quantize_tree_int8(qparams, min_size=1, mxu=True)
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(3, 96, size=n)) for n in (5, 12, 9)]
    max_new = 8

    server = GenerationServer(qparams, cfg, EOS, PAD, max_slots=2, max_len=48,
                              prompt_buckets=(8, 16))
    rids = [server.submit(p, max_new) for p in prompts]
    results = server.run()
    ref = batch_reference(cfg, qparams, prompts, max_new)
    for rid, r in zip(rids, ref):
        got = server_tokens(results[rid], max_new)
        want = [int(t) for t in r][:max_new]
        assert got == want
