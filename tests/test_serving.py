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


def test_server_supports_gemma2_layout():
    """Round 3: the server decode step routes through llama.forward, so
    gemma-2 sandwich norms / softcapping (previously rejected) must produce
    the same greedy tokens as the static path."""
    cfg = llama.LlamaConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
        num_kv_heads=2, intermediate_size=64, post_norms=True,
        attn_logit_softcap=50.0, final_logit_softcap=30.0,
        sliding_window=16,
    )
    params = llama.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    prompts = [list(rng.integers(3, 60, size=n)) for n in (5, 9)]
    max_new = 6

    server = GenerationServer(params, cfg, EOS, PAD, max_slots=2,
                              max_len=32, prompt_buckets=(16,))
    rids = [server.submit(p, max_new) for p in prompts]
    results = server.run()

    for p, rid in zip(prompts, rids):
        ii = np.full((1, 16), PAD, np.int32)
        ii[0, 16 - len(p):] = p  # left pad for the static path
        am = (ii != PAD).astype(np.int32)
        ref = llama.greedy_generate(
            params, cfg, jnp.asarray(ii), jnp.asarray(am), max_new,
            EOS, PAD, jnp.float32,
        )
        ref_toks = [t for t in np.asarray(ref)[0].tolist() if t != PAD]
        got = results[rid]
        got = got[: len(ref_toks)]
        assert got == ref_toks[: len(got)]


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


def test_run_workload_matches_host_driven(cfg_params):
    """The device-resident while_loop drain must produce exactly the host
    driven loop's greedy tokens (same engine semantics, zero host RTTs)."""
    cfg, params = cfg_params
    rng = np.random.default_rng(11)
    prompts = [list(rng.integers(3, 96, size=n))
               for n in (5, 13, 7, 21, 4, 9)]
    max_new = 8

    host = GenerationServer(params, cfg, EOS, PAD, max_slots=2, max_len=64,
                            prompt_buckets=(8, 16, 32))
    rids = [host.submit(p, max_new) for p in prompts]
    host_out = host.run()

    dev = GenerationServer(params, cfg, EOS, PAD, max_slots=2, max_len=64,
                           prompt_buckets=(8, 16, 32))
    dev_out = dev.run_workload(prompts, max_new)

    for i, rid in enumerate(rids):
        assert [int(t) for t in dev_out[i]] == host_out[rid], i


def test_server_sampling_in_decode_step(cfg_params):
    """temperature>0 runs INSIDE the engine (round 2 bypassed it): fixed
    seed is reproducible, different seeds diverge, tokens are valid ids."""
    cfg, params = cfg_params
    rng = np.random.default_rng(13)
    prompts = [list(rng.integers(3, 96, size=n)) for n in (6, 11, 17)]

    def sample_run(seed):
        srv = GenerationServer(params, cfg, EOS, PAD, max_slots=2,
                               max_len=64, prompt_buckets=(8, 16, 32),
                               temperature=0.9, top_p=0.9, seed=seed)
        return srv.run_workload(prompts, 8)

    a1, a2, b = sample_run(0), sample_run(0), sample_run(123)
    assert [list(map(int, r)) for r in a1] == [list(map(int, r)) for r in a2]
    assert any(list(map(int, x)) != list(map(int, y)) for x, y in zip(a1, b))
    for row in a1:
        assert all(0 <= int(t) < cfg.vocab_size for t in row)
        assert 1 <= len(row) <= 8


def test_generator_serve_sampling_no_bypass(tmp_path):
    """LLM(serve=True, temperature>0) must route through the server (the
    static sampler would require _tokenize_left_pad; we assert the server's
    workload runner is what produced the output)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tiny_models import build_tiny_llama

    from bergen_tpu.models.generators.jax_llm import LLM

    path = build_tiny_llama(str(tmp_path / "llama"))
    llm = LLM(path, batch_size=4, max_new_tokens=6, max_length=64,
              serve=True, max_slots=2, temperature=0.8, top_p=0.95, seed=7)
    assert llm.server is not None
    assert llm.server.temperature == 0.8
    calls = {}
    orig = llm.server.run_workload

    def spy(*a, **kw):
        calls["n"] = calls.get("n", 0) + 1
        return orig(*a, **kw)

    llm.server.run_workload = spy
    out = llm.generate(["what is the capital of avaria ?",
                        "tell me about trains"])
    assert calls["n"] == 1
    assert len(out) == 2


def test_chunked_drain_matches_epoch_and_reference(cfg_params):
    """The chunked-prefill drain (prompt chunks ride the decode forward as
    extra batch rows) must emit EXACTLY the epoch drain's greedy tokens and
    the static reference's — per-request budgets, prompts spanning multiple
    chunks, slot churn through a 2-slot pool."""
    cfg, params = cfg_params
    rng = np.random.default_rng(23)
    lens = (5, 13, 37, 21, 4, 29, 9, 18)
    prompts = [list(rng.integers(3, 96, size=n)) for n in lens]
    max_new = [6, 12, 3, 9, 15, 5, 8, 11]

    def run(mode, chunk):
        srv = GenerationServer(params, cfg, EOS, PAD, max_slots=2,
                               max_len=64, prompt_buckets=(8, 16, 32, 64))
        return srv.run_workload(prompts, max_new, mode=mode,
                                chunk_size=chunk)

    epoch = run("epoch", 16)
    for chunk in (16, 64):  # multi-chunk AND single-chunk staging
        got = run("chunked", chunk)
        for i in range(len(prompts)):
            assert [int(t) for t in got[i]] == [int(t) for t in epoch[i]], (
                f"chunk={chunk} req {i}")
    ref = batch_reference(cfg, params, prompts, max(max_new))
    for i, (r, m) in enumerate(zip(ref, max_new)):
        assert [int(t) for t in epoch[i]] == [int(t) for t in r][:m], i


def test_epoch_drain_flat_kernel_matches(monkeypatch):
    """The epoch drain with the FLAT cache + decode-attention kernel
    (BERGEN_TPU_FLASH_DECODE=interpret runs the Pallas kernel through the
    interpreter on CPU) must be token-exact vs the 4-D einsum drain —
    including prefill-branch writes into the flat cache and ring shifts.
    Needs a kernel-eligible geometry (head_dim % 64 == 0), so it builds its
    own config instead of the module fixture's Dh=12."""
    cfg = llama.LlamaConfig(
        vocab_size=96, hidden_size=128, num_heads=2, num_kv_heads=1,
        num_layers=2, intermediate_size=64, max_position_embeddings=256,
    )
    params = llama.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(31)
    lens = (5, 13, 37, 21, 4, 29)
    prompts = [list(rng.integers(3, 96, size=n)) for n in lens]
    max_new = [6, 12, 3, 9, 15, 5]

    def run():
        srv = GenerationServer(params, cfg, EOS, PAD, max_slots=2,
                               max_len=64, prompt_buckets=(8, 16, 32, 64))
        return srv.run_workload(prompts, max_new, mode="epoch")

    monkeypatch.setenv("BERGEN_TPU_FLASH_DECODE", "0")
    ref = run()
    monkeypatch.setenv("BERGEN_TPU_FLASH_DECODE", "interpret")
    got = run()
    from bergen_tpu.ops.decode_attention import flat_cache_ok

    assert flat_cache_ok(cfg, 128), "flat gate should accept this config"
    for i in range(len(prompts)):
        assert [int(t) for t in got[i]] == [int(t) for t in ref[i]], i
