"""Chunked-drain step-cost vs occupancy diagnostics on the real chip.

The round-5 chunked drain measured 2,611 tok/s on the bench mix vs the
epoch drain's 4,830 — with dual staging pipes that should have removed the
round-5-interim staging starvation (0.38 req/step < 0.47 req/step drain
rate).  Each variant run reports BOTH tok/s and the while-loop iteration
count, separating the two failure modes:

* iters ~ (decode tokens / slots) + staging  -> occupancy is fine, the
  PER-STEP cost of carrying pipes * CHUNK chunk rows is the regression;
* iters >> that                              -> staging still starves slots.

Variants: epoch baseline, chunked at pipes x chunk combos, and a
no-staging probe (all prompts length 1) that isolates the chunk-row
carrying cost at full occupancy.

Usage: python scripts/diag_chunked.py [--variants epoch,c2x128,c1x128,nostage]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

T0 = time.time()


def _log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="epoch,c2x128,c1x128,nostage")
    ap.add_argument("--slots", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp  # noqa: F401

    from bergen_tpu.models import convert, llama
    from bergen_tpu.serve.engine import GenerationServer

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = llama.LlamaConfig(
            vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
            num_kv_heads=4, intermediate_size=5632,
            max_position_embeddings=2048,
        )
        R, SLOTS, PMAX = 64, args.slots, 512
        len_lo, len_hi, new_lo, new_hi = 32, 512, 8, 128
        buckets = (64, 128, 256, 384, 512)
    else:
        cfg = llama.LlamaConfig(
            vocab_size=1000, hidden_size=256, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=512,
            max_position_embeddings=512,
        )
        R, SLOTS, PMAX = 8, 4, 64
        len_lo, len_hi, new_lo, new_hi = 8, 64, 4, 8
        buckets = (16, 32, 64)

    params = llama.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    if on_tpu:
        params = convert.quantize_tree_int8(params, mxu=True)
    _log("params ready")

    rng = np.random.default_rng(0)
    plens = rng.integers(len_lo, len_hi + 1, R)
    max_news = rng.integers(new_lo, new_hi + 1, R)
    prompts = [list(rng.integers(3, cfg.vocab_size, n)) for n in plens]
    total_new = int(max_news.sum())

    def server():
        return GenerationServer(
            params, cfg, eos_token_id=-1, pad_token_id=0, max_slots=SLOTS,
            max_len=PMAX + int(max_news.max()) + 1, prompt_buckets=buckets,
        )

    results = {}
    for spec in args.variants.split(","):
        pr, mn = prompts, list(map(int, max_news))
        tn = total_new
        if spec == "epoch":
            runner, rargs = server().plan_workload(pr, mn)
        elif spec == "nostage":
            # length-1 prompts: staging finishes in one chunk per request,
            # so the run is ~pure decode with the chunk rows still carried
            pr = [[5] for _ in range(R)]
            runner, rargs = server().plan_workload_chunked(pr, mn)
        else:  # cPxC e.g. c2x128
            pipes, chunk = spec[1:].split("x")
            runner, rargs = server().plan_workload_chunked(
                pr, mn, chunk_size=int(chunk), pipes=int(pipes))
        _log(f"{spec}: compiling")
        out, n_out, iters = jax.block_until_ready(runner(*rargs))
        iters = int(iters)
        got = int(np.asarray(n_out).sum())
        assert got == tn, (spec, got, tn)
        reps = 3 if on_tpu else 2

        def t_once():
            t0 = time.perf_counter()
            jax.block_until_ready(runner(*rargs))
            return time.perf_counter() - t0

        t_once()
        dt = min(t_once() for _ in range(reps))
        results[spec] = {
            "tok_per_sec": round(tn / dt, 1), "iters": iters,
            "ms_per_step": round(dt * 1000 / max(iters, 1), 3),
            "drain_seconds": round(dt, 4),
        }
        _log(f"{spec}: {tn/dt:.0f} tok/s, {iters} iters, "
             f"{dt*1000/max(iters,1):.2f} ms/step")

    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
