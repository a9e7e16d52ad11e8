"""On-chip throughput measurements for the three hot paths: corpus encoding
(docs/sec), MIPS scoring (QPS), greedy generation (tokens/sec).

Honest timing through the tunneled device: every measurement chains n
iterations inside ONE jitted program (data-dependent fori_loop) and reads back
a single scalar, so per-dispatch RTT cancels via (t(n) - t(1)) / (n - 1).

    PYTHONPATH=.:/root/.axon_site python scripts/throughput.py
"""

import json
import time
from functools import partial

import numpy as np


def timed(fn, extra, n_iters):
    """fn(ctr, extra) -> f32 scalar; ctr genuinely varies per iteration so XLA
    cannot hoist the loop body (a `*0` pseudo-dependency gets constant-folded
    and the whole loop DCE'd — measured as infinite throughput)."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("n",))
    def chained(ex, n):
        def body(_, carry):
            acc, ctr = carry
            r = fn(ctr, ex)
            return acc + r, ctr + 1 + (r * 0).astype(jnp.int32)

        acc, _ = jax.lax.fori_loop(
            0, n, body, (jnp.float32(0.0), jnp.int32(0))
        )
        return acc

    float(chained(extra, 1))
    float(chained(extra, n_iters))
    t0 = time.perf_counter()
    float(chained(extra, 1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chained(extra, n_iters))
    tn = time.perf_counter() - t0
    return max((tn - t1) / (n_iters - 1), 1e-9)


def bench_encode():
    """bert-base-sized encoder, batch 256 x seq 192 -> docs/sec."""
    import jax
    import jax.numpy as jnp

    from bergen_tpu.models import bert

    cfg = bert.BertConfig()  # bert-base dims
    params = bert.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    B, S = 256, 192
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)
    am = jnp.ones((B, S), jnp.int32)

    def fn(ctr, params):
        ids2 = (ids + ctr) % cfg.vocab_size
        hidden = bert.encode(params, cfg, ids2, am)
        return jnp.sum(bert.mean_pool(hidden, am)[0, :4].astype(jnp.float32))

    dt = timed(fn, params, 9)
    return {"metric": "bert_base_encode_docs_per_sec_b256_s192",
            "value": round(B / dt, 1), "unit": "docs/sec/chip"}


def bench_generate():
    """llama-1B-ish decode: batch 32, prefill 256 + 64 new tokens -> tok/sec."""
    import jax
    import jax.numpy as jnp

    from bergen_tpu.models import llama

    cfg = llama.LlamaConfig(
        vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
        num_kv_heads=4, intermediate_size=5632, max_position_embeddings=2048,
    )  # TinyLlama-1.1B dims
    params = llama.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    B, S, NEW = 32, 256, 64
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 32000, (B, S)), jnp.int32)
    am = jnp.ones((B, S), jnp.int32)

    def fn(ctr, params):
        ids2 = (ids + ctr) % cfg.vocab_size
        toks = llama.greedy_generate(
            params, cfg, ids2, am, NEW,
            eos_token_id=-1, pad_token_id=0, cache_dtype=jnp.bfloat16,
        )
        return jnp.sum(toks[0, :4]).astype(jnp.float32)

    dt = timed(fn, params, 5)
    return {
        "metric": "tinyllama_generate_tokens_per_sec_b32_prefill256_new64",
        "value": round(B * NEW / dt, 1), "unit": "new tokens/sec/chip",
        "detail": f"{dt*1000:.1f} ms per batch step incl. prefill",
    }


def main():
    results = []
    for bench in (bench_encode, bench_generate):
        try:
            results.append(bench())
        except Exception as e:  # keep going; report what ran
            results.append({"metric": bench.__name__, "error": str(e)[:300]})
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
