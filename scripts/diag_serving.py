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
import functools
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
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
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
        buckets = (64, 128, 256, 512)
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

    results = {}
    for spec in args.variants.split(","):
        aw, ring_s = spec.split(":")
        aw, ring = int(aw), ring_s == "on"
        server = GenerationServer(
            params, cfg, eos_token_id=-1, pad_token_id=0, max_slots=SLOTS,
            max_len=PMAX + int(max_news.max()) + 1, prompt_buckets=buckets,
        )
        runner, rargs = server.plan_workload(
            prompts, list(map(int, max_news)), admit_width=aw, ring=ring)
        (_, pr_d, pl_d, mn_d, gr_d, gc_d, gb_d, budget_d, key0) = rargs

        @functools.partial(jax.jit, static_argnames=("n",))
        def chained(p, key, n, _run=runner, _pr=pr_d):
            def body(_, carry):
                acc, cur_pr = carry
                out, n_out, it = _run(p, cur_pr, pl_d, mn_d, gr_d, gc_d,
                                      gb_d, budget_d, key)
                t = jnp.sum(out[0, :4]).astype(jnp.float32)
                return acc + t + it.astype(jnp.float32) * 1e-20, \
                    cur_pr + (t * 1e-30).astype(jnp.int32)
            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), _pr))
            return acc

        _log(f"variant A={aw} ring={ring}: compiling")
        # iteration count from one plain run
        out, n_out, iters = runner(*rargs)
        iters = int(iters)
        assert int(np.asarray(n_out).sum()) == total_new, "token count!"
        chained(params, jax.random.PRNGKey(0), 1)
        _log(f"variant A={aw} ring={ring}: warm; timing")
        NI = 5 if on_tpu else 2

        def t_of(n):
            t0 = time.perf_counter()
            float(chained(params, jax.random.PRNGKey(0), n))
            return time.perf_counter() - t0

        chained(params, jax.random.PRNGKey(0), NI)
        t1 = min(t_of(1) for _ in range(3))
        tn = min(t_of(NI) for _ in range(3))
        dt = (tn - t1) / (NI - 1)
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
