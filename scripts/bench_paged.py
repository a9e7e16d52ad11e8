"""Paged-KV decode benchmark: tok/s at EQUAL KV memory, paged vs uniform.

The paged pool's value proposition (vLLM's, reference
``models/generators/vllm.py:48-59``): with sequences much shorter than
``max_len``, pages hold ~actual tokens, so the same HBM admits more
concurrent slots and decode throughput rises until the chip is
bandwidth-bound.  This bench pins a KV budget, sizes

  * uniform slots:  S_u = budget / (max_len * kv_bytes_per_token)
  * paged slots:    S_p chosen so pool pages ~= budget at the workload's
                    ACTUAL lengths (uniform 256-768, mean 512)

and measures steady-state decode tok/s for both as ONE device program
(lax.fori_loop over jitted steps — per-step host dispatch through the axon
tunnel would measure the 120 ms RTT, not the chip).  Page growth inside the
loop uses pre-assigned table entries (the allocator is admission-time work;
steady-state decode only increments lengths), so the loop is host-free.

Also validates the Pallas paged kernel against the XLA paged partial
on-chip before timing (parity gate).

Usage: python scripts/bench_paged.py [--out out.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

_T0 = time.time()


def _log(msg):
    print(f"[{time.time()-_T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAX_LEN = 2048
LEN_LO, LEN_HI = 256, 768  # actual sequence lengths (mean 512)
STEPS = 64


def main():
    global MAX_LEN, LEN_LO, LEN_HI
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--budget-gb", type=float, default=1.5)
    ap.add_argument("--max-len", type=int, default=None,
                    help="per-slot reservation ceiling (uniform engine); "
                    "the paged win scales with max_len / mean_len")
    ap.add_argument("--len-lo", type=int, default=None)
    ap.add_argument("--len-hi", type=int, default=None)
    ap.add_argument("--dims", choices=("tiny", "3b"), default="tiny",
                    help="'3b' = Llama-3.2-3B-class dims (28 layers, 8 kv "
                    "heads, Dh=128) with int8 weights — the production "
                    "regime VERDICT r3 asked paging to be measured in")
    ap.add_argument("--quant", choices=("none", "int8"), default=None,
                    help="weight quantization (default: int8 for --dims 3b)")
    ap.add_argument("--page", type=int, default=None,
                    help="override page size (tokens) — the per-page DMA "
                    "latency vs slot-count trade; default 128")
    ap.add_argument("--skip-uniform", action="store_true",
                    help="measure the paged engine only (A/B reruns)")
    ap.add_argument("--engine", choices=("auto", "pallas", "xla"),
                    default="auto",
                    help="full-pages partial engine (A/B: the Pallas "
                    "streaming kernel vs the XLA gather path)")
    ap.add_argument("--skip-paged", action="store_true",
                    help="measure the uniform engine only (slot-count "
                    "scaling diagnostics via --budget-gb)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _timed_chained
    from bergen_tpu.models import llama
    from bergen_tpu.ops import paged_attention as pa

    pa.ENGINE = args.engine
    if args.page is not None:
        # the kernel and this bench read pa.PAGE at trace time; serve/paged
        # binds it at import and is not involved here
        pa.PAGE = args.page

    if args.max_len is not None:
        MAX_LEN = args.max_len
    if args.len_lo is not None:
        LEN_LO = args.len_lo
    if args.len_hi is not None:
        LEN_HI = args.len_hi

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and args.dims == "3b":
        cfg = llama.LlamaConfig(
            vocab_size=32000, hidden_size=3072, num_layers=28, num_heads=24,
            num_kv_heads=8, intermediate_size=8192,
            max_position_embeddings=max(4096, MAX_LEN),
            head_dim_override=128,
        )  # Llama-3.2-3B-class dims
    elif on_tpu:
        cfg = llama.LlamaConfig(
            vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
            num_kv_heads=4, intermediate_size=5632,
            max_position_embeddings=max(4096, MAX_LEN),
            head_dim_override=128,
        )  # TinyLlama dims with Dh=128 (the paged kernel's lane geometry)
    else:
        cfg = llama.LlamaConfig(
            vocab_size=1000, hidden_size=256, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=512,
            max_position_embeddings=4096,
        )
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    kv_per_tok = (cfg.num_layers * cfg.num_kv_heads * cfg.head_dim
                  * 2 * itemsize)
    budget = int(args.budget_gb * (1 << 30))
    S_u = max(1, budget // (MAX_LEN * kv_per_tok))
    mean_len = (LEN_LO + LEN_HI) // 2
    # paged: pool sized to the budget; slots sized so the workload's actual
    # lengths (+ decode growth margin) fill it
    n_pages = budget // (pa.PAGE * kv_per_tok)
    S_p = max(S_u, int(n_pages * pa.PAGE // (mean_len + STEPS + pa.PAGE)))
    if not on_tpu:
        S_u, S_p, n_pages = 2, 4, 40
    _log(f"kv/token={kv_per_tok}B budget={budget>>20}MiB "
         f"uniform S={S_u} paged S={S_p} pages={n_pages}")

    params = llama.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    quant = args.quant or ("int8" if args.dims == "3b" else "none")
    if quant == "int8" and on_tpu:
        from bergen_tpu.models import convert
        params = convert.quantize_tree_int8(params, mxu=True)
    results0 = {"dims": args.dims, "quant": quant,
                "max_len": int(MAX_LEN), "len_lo": int(LEN_LO),
                "len_hi": int(LEN_HI)}
    rng = np.random.default_rng(0)
    results = {"uniform_slots": int(S_u), "paged_slots": int(S_p),
               "n_pages": int(n_pages), "budget_gb": args.budget_gb,
               **results0}

    # ---- kernel parity gate (on-chip) -----------------------------------
    if on_tpu:
        _log("pallas paged kernel parity vs XLA partial")
        Sk, H, KH, Dh = 4, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        kp = jnp.asarray(rng.normal(size=(12, KH, pa.PAGE, Dh)), dtype)
        vp = jnp.asarray(rng.normal(size=(12, KH, pa.PAGE, Dh)), dtype)
        qk = jnp.asarray(rng.normal(size=(Sk, H, Dh)), dtype)
        tbl = jnp.asarray(rng.permutation(12)[:Sk * 2].reshape(Sk, 2), jnp.int32)
        npg = jnp.asarray([0, 1, 2, 2], jnp.int32)
        sts = jnp.asarray([0, 30, 130, 0], jnp.int32)
        a1, m1, l1 = pa.paged_partial_xla(qk, kp, vp, tbl, npg, 0.088, sts)
        a2, m2, l2 = pa.paged_partial_pallas(qk, kp, vp, tbl, npg, 0.088, sts)
        live = np.asarray(npg) > 0
        err = float(jnp.max(jnp.abs(
            (a1 / jnp.maximum(l1, 1e-30)[..., None])[live]
            - (a2 / jnp.maximum(l2, 1e-30)[..., None])[live])))
        results["pallas_vs_xla_max_err"] = err
        _log(f"kernel parity max err {err:.2e}")
        assert err < 2e-2, err

    # ---- shared steady-state harness ------------------------------------
    def time_loop(step_fn, state):
        @functools.partial(jax.jit, static_argnames=("n",))
        def chained(params, state, n):
            def body(_, carry):
                acc, st = carry
                st = step_fn(params, st)
                t = st["tok"][0].astype(jnp.float32)
                return acc + t, st
            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), state))
            return acc

        iters = 3 if on_tpu else 2
        return _timed_chained(
            lambda n: float(chained(params, state, n)), iters)

    # ---- uniform-slot decode --------------------------------------------
    if not args.skip_uniform:
        _log(f"uniform decode (S={S_u}, max_len={MAX_LEN})")
        lens_u = rng.integers(LEN_LO, LEN_HI + 1, S_u).astype(np.int32)
        ku = jnp.asarray(rng.normal(size=(
            cfg.num_layers, S_u, MAX_LEN, cfg.num_kv_heads,
            cfg.head_dim)) * 0.1, dtype)
        vu = jnp.asarray(rng.normal(size=ku.shape) * 0.1, dtype)

        def step_uniform(params, st):
            cache = {"k": st["k"], "v": st["v"], "cursor": st["cursor"]}
            mask = (jnp.arange(MAX_LEN)[None, None, :]
                    <= st["cursor"][:, None, None])
            logits, cache = llama.forward(
                params, cfg, st["tok"][:, None], st["cursor"][:, None], cache,
                mask)
            nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
            return {"k": cache["k"], "v": cache["v"],
                    "cursor": st["cursor"] + 1, "tok": nxt}

        state_u = {"k": ku, "v": vu, "cursor": jnp.asarray(lens_u),
                   "tok": jnp.full((S_u,), 7, jnp.int32)}
        dt_u = time_loop(step_uniform, state_u)
        results["uniform_tok_per_sec"] = S_u * 1.0 / dt_u
        _log(f"uniform: {results['uniform_tok_per_sec']:.0f} tok/s")
        del ku, vu, state_u

    # ---- paged decode ----------------------------------------------------
    if args.skip_paged:
        results["backend"] = jax.default_backend()
        print(json.dumps(results, indent=2))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
        return
    _log(f"paged decode (S={S_p}, pages={n_pages})")
    lens_p = rng.integers(LEN_LO, LEN_HI + 1, S_p).astype(np.int32)
    max_pages = (LEN_HI + STEPS) // pa.PAGE + 2
    cache = llama.init_paged_cache(cfg, int(n_pages), int(S_p), int(max_pages),
                                   dtype=dtype)
    # pre-assign pages for the whole run (admission-time work, not decode)
    tables = np.full((S_p, max_pages), 0, np.int32)
    nxt_page = 1
    for s in range(S_p):
        need = min(max_pages, (int(lens_p[s]) + STEPS) // pa.PAGE + 1)
        for p in range(need):
            tables[s, p] = nxt_page % n_pages
            nxt_page += 1
    cache["tables"] = jnp.asarray(tables)
    cache["lengths"] = jnp.asarray(lens_p)
    cache["k_pool"] = jnp.asarray(
        rng.normal(size=cache["k_pool"].shape) * 0.1, dtype)
    cache["v_pool"] = jnp.asarray(
        rng.normal(size=cache["v_pool"].shape) * 0.1, dtype)

    def step_paged(params, st):
        cache = {k: st[k] for k in ("k_pool", "v_pool", "k_tail", "v_tail",
                                    "tables", "lengths", "starts")}
        logits, cache = llama.forward(
            params, cfg, st["tok"][:, None], st["lengths"][:, None], cache,
            None)
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        cache["tok"] = nxt
        return cache

    state_p = dict(cache)
    state_p["tok"] = jnp.full((S_p,), 7, jnp.int32)
    dt_p = time_loop(step_paged, state_p)
    results["paged_tok_per_sec"] = S_p * 1.0 / dt_p
    results["page_size"] = int(pa.PAGE)
    results["engine"] = args.engine
    if "uniform_tok_per_sec" in results:
        results["paged_vs_uniform"] = (results["paged_tok_per_sec"]
                                       / results["uniform_tok_per_sec"])
        _log(f"paged: {results['paged_tok_per_sec']:.0f} tok/s "
             f"({results['paged_vs_uniform']:.2f}x uniform)")
    else:
        _log(f"paged: {results['paged_tok_per_sec']:.0f} tok/s")
    results["backend"] = jax.default_backend()
    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
