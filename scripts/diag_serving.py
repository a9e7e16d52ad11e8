"""Serving-drain A/B diagnostics on the real chip.

The round-4 drain redesign (batched admission + ring compaction) measured
SLOWER than round 3's one-request-per-iteration drain (2,211 vs 4,184 tok/s
on the bench.py mixed workload).  This script isolates the change that costs:
for each (admit_width, ring) variant it reports tok/s AND the while-loop
iteration count (occupancy), on the exact bench_serving workload.

Usage: python scripts/diag_serving.py [--variants 8:on,8:off,1:off]
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
    ap.add_argument("--variants", default="8:on,8:off,1:off")
    ap.add_argument("--slots", type=int, default=32)
    ap.add_argument("--min-admit", type=int, default=4,
                    help="greedy partial-admission floor (1 = admit on any "
                         "free slot; admit_width = wait for a full group)")
    ap.add_argument("--fine-buckets", action="store_true",
                    help="use the 5-bucket prompt grid (64,128,256,384,512) "
                         "that cuts prefill padding FLOPs")
    ap.add_argument("--new-tokens", type=int, default=0,
                    help="override every request's generation budget (e.g. 1 "
                         "= prefill/admission-only probe that isolates the "
                         "prefill share of the drain; 0 = the bench mix)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    # persistent compile cache: each drain variant is a ~6 min compile
    # through the tunnel; re-runs must hit the cache
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp

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
        buckets = ((64, 128, 256, 384, 512) if args.fine_buckets
                   else (64, 128, 256, 512))
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
    if args.new_tokens:
        max_news = np.full(R, args.new_tokens, max_news.dtype)
    prompts = [list(rng.integers(3, cfg.vocab_size, n)) for n in plens]
    total_new = int(max_news.sum())

    results = {}
    for spec in args.variants.split(","):
        aw, ring_s = spec.split(":")
        aw, ring = int(aw), ring_s == "on"
        server = GenerationServer(
            params, cfg, eos_token_id=-1, pad_token_id=0, max_slots=SLOTS,
            max_len=PMAX + int(max_news.max()) + 1, prompt_buckets=buckets,
        )
        runner, rargs = server.plan_workload(
            prompts, list(map(int, max_news)), admit_width=aw, ring=ring,
            min_admit=args.min_admit)

        _log(f"variant A={aw} ring={ring}: compiling")
        # a drain is ~1 s of device time, so plain repeated dispatches are
        # accurate (no fori_loop chaining harness = two fewer ~6 min
        # tunnel compiles per variant)
        out, n_out, iters = jax.block_until_ready(runner(*rargs))
        iters = int(iters)
        assert int(np.asarray(n_out).sum()) == total_new, "token count!"
        _log(f"variant A={aw} ring={ring}: warm; timing")
        reps = 3 if on_tpu else 2

        def t_once():
            t0 = time.perf_counter()
            jax.block_until_ready(runner(*rargs))
            return time.perf_counter() - t0

        t_once()
        dt = min(t_once() for _ in range(reps))
        toks = total_new / dt if dt > 0 else float("nan")
        results[f"A{aw}_ring_{ring_s}"] = {
            "tok_per_sec": round(toks, 1), "iters": iters,
            "drain_seconds": round(dt, 4),
        }
        _log(f"variant A={aw} ring={ring}: {toks:.0f} tok/s, {iters} iters")

    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
