"""Paged-KV server (serve/paged.py): greedy outputs must match the batch
reference and the uniform-slot server; pages must be allocated on demand,
reused after finish, and admission must block on a dry pool."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bergen_tpu.models import llama
from bergen_tpu.ops.paged_attention import PAGE
from bergen_tpu.serve.paged import PagedGenerationServer

EOS, PAD = 2, 0


@pytest.fixture(scope="module")
def cfg_params():
    cfg = llama.LlamaConfig(
        vocab_size=96, hidden_size=48, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, max_position_embeddings=1024,
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
        if EOS in row:
            row = row[: row.index(EOS) + 1]
        out.append([int(t) for t in row])
    return out


def _cut(tokens, max_new):
    if EOS in tokens:
        tokens = tokens[: tokens.index(EOS) + 1]
    return tokens[:max_new]


def test_paged_matches_batch_reference(cfg_params):
    cfg, params = cfg_params
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(3, 96, size=n)) for n in (5, 11, 23, 8, 17, 3)]
    max_new = 10

    srv = PagedGenerationServer(params, cfg, EOS, PAD, max_slots=2,
                                max_len=4 * PAGE, n_pages=12)
    rids = [srv.submit(p, max_new) for p in prompts]
    results = srv.run()
    ref = batch_reference(cfg, params, prompts, max_new)
    for rid, p, r in zip(rids, prompts, ref):
        got = _cut(results[rid], max_new)
        want = [int(t) for t in r][:max_new]
        assert got == want, f"prompt len {len(p)}: {got} != {want}"
    # all pages returned to the pool after the drain
    assert len(srv.free_pages) == 12 and not srv.active


def test_paged_page_growth_across_boundary(cfg_params):
    """A generation long enough to cross the 128-token page boundary must
    allocate a second page mid-decode and still match the reference."""
    cfg, params = cfg_params
    rng = np.random.default_rng(1)
    prompt = list(rng.integers(3, 96, size=100))
    max_new = 40  # 100-token prompt (1 page) + 40 > 128: growth required

    srv = PagedGenerationServer(params, cfg, EOS, PAD, max_slots=1,
                                max_len=4 * PAGE, n_pages=6)
    rid = srv.submit(prompt, max_new)
    results = srv.run()
    ref = batch_reference(cfg, params, [prompt], max_new)[0]
    assert _cut(results[rid], max_new) == ref[:max_new]


def test_paged_pool_admission_blocks_until_free(cfg_params):
    """More requests than the pool can hold at once: admission must defer,
    then recycle freed pages — every request still completes correctly."""
    cfg, params = cfg_params
    rng = np.random.default_rng(2)
    prompts = [list(rng.integers(3, 96, size=n)) for n in (150, 140, 130, 20)]
    max_new = 6

    # 150-token prompts need 2 pages each; pool of 4 pages forces staging
    srv = PagedGenerationServer(params, cfg, EOS, PAD, max_slots=4,
                                max_len=4 * PAGE, n_pages=4)
    rids = [srv.submit(p, max_new) for p in prompts]
    results = srv.run()
    ref = batch_reference(cfg, params, prompts, max_new)
    for rid, r in zip(rids, ref):
        assert _cut(results[rid], max_new) == [int(t) for t in r][:max_new]


def test_llm_generator_paged_serve_matches_batched(tmp_path):
    """LLM(serve=True, kv_cache='paged') routes through the paged server
    and greedy outputs match the static batched path token-for-token."""
    import os, sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tiny_models import build_tiny_llama
    from bergen_tpu.models.generators.jax_llm import LLM
    from bergen_tpu.serve.paged import PagedGenerationServer

    d = build_tiny_llama(str(tmp_path / "llama"))
    kw = dict(model_name=d, max_new_tokens=6, max_length=64, batch_size=4)
    base = LLM(**kw)
    served = LLM(serve=True, kv_cache="paged", max_slots=3, **kw)
    assert isinstance(served.server, PagedGenerationServer)
    prompts = [
        "user : what is the capital \n assistant : ",
        "user : tell me about the river bank and the fish \n assistant : ",
        "user : hello \n assistant : ",
        "user : why \n assistant : ",
    ]
    assert served.generate(prompts) == base.generate(prompts)


def test_paged_memory_footprint_smaller():
    """The headline property: at equal HBM the paged pool admits more
    concurrent sequences than uniform slots (here: same bytes, 2x slots)."""
    cfg = llama.LlamaConfig(
        vocab_size=96, hidden_size=48, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, max_position_embeddings=1024,
    )
    uniform_positions = 8 * 2048          # 8 slots x max_len
    paged = PagedGenerationServer(
        llama.init(jax.random.PRNGKey(0), cfg), cfg, EOS, PAD,
        max_slots=16, max_len=2048,
        n_pages=uniform_positions // PAGE,  # same KV bytes as 8 uniform slots
    )
    assert paged.S == 16
    pool_positions = paged.n_pages * PAGE + paged.S * PAGE  # pool + tails
    assert pool_positions <= uniform_positions + 16 * PAGE
