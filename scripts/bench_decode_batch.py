"""Decode throughput vs batch size: how far weight-read amortization takes us.

Single-token decode is weight-read bound at small batch: every step reads the
full parameter tree from HBM no matter how many sequences ride it.  At
TinyLlama-1.1B/w8a8 that is ~1.1 GB/step — batch 32 pays 34 MB of weight
traffic *per generated token*, so the measured 8.4k tok/s (bench.py) is ~35%
of what the HBM alone allows.  Growing the decode batch amortizes the weight
read across more tokens until per-token KV-cache reads take over:

    t_step ≈ (W_bytes + B * KV_bytes_per_seq) / HBM_BW
    tok/s  = B / t_step

This script measures steady-state decode-only rate (prefill excluded — at
B=256 a 256-token prefill is ~1.4e14 FLOPs and would swamp the decode signal
bench.py's combined metric tolerates at B=32) across batch sizes, with the
roofline prediction printed next to each row.  The reference's serving story
(vLLM, /root/reference/models/generators/vllm.py) exists exactly to keep
decode batches this full; these numbers are the capacity the continuous
batching server (bergen_tpu/serve) is filling toward.

Usage: python scripts/bench_decode_batch.py [--batches 32,64,128,256]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CTX = 256          # tokens already in cache when decode starts
DECODE_STEPS = 64  # steps per timed chain unit

V5E_HBM_GBPS = 819.0


def _log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


T0 = time.time()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64,128,256")
    ap.add_argument("--quant", default="w8a8",
                    choices=("bf16", "int8", "w8a8", "int4"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    # the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it here so
    # CPU smoke runs don't try to initialise the tunnel
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from bench import _timed_chained
    from bergen_tpu.models import convert, llama

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = llama.LlamaConfig(
            vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
            num_kv_heads=4, intermediate_size=5632,
            max_position_embeddings=2048,
        )
    else:  # CPU smoke dims
        cfg = llama.LlamaConfig(
            vocab_size=1000, hidden_size=256, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=512,
            max_position_embeddings=512,
        )
    params = llama.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    w_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )
    if args.quant != "bf16" and on_tpu:
        if args.quant == "int4":
            params = convert.quantize_tree_int4(params, packed=True)
        else:
            params = convert.quantize_tree_int8(
                params, mxu=args.quant == "w8a8")
        w_bytes = sum(
            x.size * (0.5 if x.dtype == jnp.int4 else x.dtype.itemsize)
            for x in jax.tree.leaves(params)
        )  # XLA packs two int4 nibbles per HBM byte

    L = CTX + DECODE_STEPS + 1
    kv_per_seq = (cfg.num_layers * 2 * L * cfg.num_kv_heads * cfg.head_dim
                  * 2)  # bf16 cache

    results = {"quant": args.quant, "ctx": CTX, "rows": []}
    for B in [int(b) for b in args.batches.split(",")]:
        _log(f"batch {B}")
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, CTX)), jnp.int32)

        @functools.partial(jax.jit, static_argnames=("n",), donate_argnums=())
        def chained(p, ids, n, B=B):
            cache = llama.init_cache(cfg, B, L, dtype=jnp.bfloat16)
            positions = jnp.broadcast_to(jnp.arange(CTX), (B, CTX))
            causal = jnp.tril(jnp.ones((CTX, CTX), bool))
            pm = jnp.zeros((B, CTX, L), bool).at[:, :, :CTX].set(causal[None])
            logits, cache = llama.forward(p, cfg, ids, positions, cache, pm)
            tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            kv = jnp.zeros((B, L), bool).at[:, :CTX].set(True)

            # n chained decode windows of DECODE_STEPS each; the cache cursor
            # rewinds to CTX every window so length n changes WORK ONLY, not
            # memory — RTT cancels in bench._timed_chained's (t_n - t_1)
            def window(_, carry):
                acc, tok, cache = carry

                def step(c, t):
                    cache, tok, kv = c
                    kv = kv.at[:, CTX + t].set(True)
                    lg, cache = llama.forward(
                        p, cfg, tok[:, None],
                        jnp.full((B, 1), CTX + t, jnp.int32),
                        cache, kv[:, None, :],
                    )
                    nxt = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
                    return (cache, nxt, kv), nxt[0]

                (cache, tok, _), toks = jax.lax.scan(
                    step, (cache, tok, kv), jnp.arange(DECODE_STEPS)
                )
                return acc + toks.sum(), tok, cache

            acc, tok, _ = jax.lax.fori_loop(
                0, n, window, (jnp.int32(0), tok0, cache)
            )
            return acc + tok.sum()

        n_iters = 6 if on_tpu else 2
        dt = _timed_chained(
            lambda n: float(chained(params, ids, n)), n_iters
        )
        tok_s = B * DECODE_STEPS / dt
        # roofline: weights + live KV reads per step over HBM bandwidth
        kv_live = cfg.num_layers * 2 * (CTX + DECODE_STEPS // 2) \
            * cfg.num_kv_heads * cfg.head_dim * 2
        t_roof = (w_bytes + B * kv_live) / (V5E_HBM_GBPS * 1e9)
        row = {
            "batch": B,
            "decode_tok_s": round(tok_s, 1),
            "ms_per_step": round(1e3 * dt / DECODE_STEPS, 3),
            "roofline_tok_s": round(B / t_roof, 1) if on_tpu else None,
            "hbm_frac": round(tok_s * t_roof / B, 3) if on_tpu else None,
        }
        results["rows"].append(row)
        _log(json.dumps(row))

    results["weights_bytes"] = int(w_bytes)
    results["kv_bytes_per_seq"] = int(kv_per_seq)
    results["backend"] = jax.default_backend()
    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
