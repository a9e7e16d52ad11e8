"""DeBERTa-v3 reranker throughput on chip (VERDICT r2: the reference's
DEFAULT reranker was the one encoder with no measured row).

Benchmarks ``deberta.classify`` at deberta-v3-base dims (the
``config/reranker/debertav3.yaml`` model) on (query, doc) pair batches —
the rerank hot loop (reference ``models/rerankers/crossencoder.py:23-37``).
Random weights: throughput depends on shapes, not values.

Usage: python scripts/bench_deberta.py [--batch 64] [--seq 256]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--fused", choices=("auto", "on", "off"), default="auto",
                    help="whole-layer prebias kernel: auto = TPU default")
    ap.add_argument("--tables", choices=("on", "off"), default="on",
                    help="cached position tables (build_pos_tables): the "
                    "round-5 direct-einsum bias path vs the one-hot regather")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _timed_chained
    from bergen_tpu.models import deberta

    on_tpu = jax.default_backend() == "tpu"
    if args.fused != "auto":
        deberta.USE_FUSED_LAYERS = args.fused == "on"
    # deberta-v3-base (config/reranker/debertav3.yaml)
    cfg = deberta.DebertaConfig(
        vocab_size=128100, hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072, max_position_embeddings=512,
        position_buckets=256, max_relative_positions=-1,
        pos_att_type=("c2p", "p2c"), norm_rel_ebd="layer_norm",
        share_att_key=True,
    )
    B, S = args.batch, args.seq
    rng = np.random.default_rng(0)

    def rand_params():
        # build a minimal random tree matching deberta_from_hf's layout
        def lin(i, o):
            return {"kernel": jnp.asarray(rng.normal(0, 0.02, (i, o)), dt),
                    "bias": jnp.zeros((o,), dt)}

        def ln(d):
            return {"scale": jnp.ones((d,), dt), "bias": jnp.zeros((d,), dt)}

        dt = jnp.bfloat16 if on_tpu else jnp.float32
        D, I = cfg.hidden_size, cfg.intermediate_size
        layers = []
        for _ in range(cfg.num_layers):
            layers.append({
                "attn": {"q": lin(D, D), "k": lin(D, D), "v": lin(D, D),
                         "o": lin(D, D)},
                "attn_ln": ln(D), "mlp_in": lin(D, I), "mlp_out": lin(I, D),
                "mlp_ln": ln(D),
            })
        return {
            "embeddings": {
                "word": jnp.asarray(
                    rng.normal(0, 0.02, (cfg.vocab_size, D)), dt),
                "ln": ln(D),
            },
            "rel_embeddings": jnp.asarray(
                rng.normal(0, 0.02, (2 * cfg.att_span, D)), dt),
            "rel_ln": ln(D),
            "layers": layers,
            "pooler": lin(D, D),
            "classifier": lin(D, 1),
        }

    params = rand_params()
    ids = jnp.asarray(rng.integers(3, 1000, (B, S)), jnp.int32)
    am = jnp.ones((B, S), jnp.int32)
    tables = (deberta.build_pos_tables(params, cfg, S)
              if args.tables == "on" else None)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(p, tabs, ii, n):
        def body(_, carry):
            acc, cur = carry
            logits = deberta.classify(p, cfg, cur, am, pos_tables=tabs)
            t = logits[0, 0].astype(jnp.float32)
            return acc + t, (cur + (t * 1e30).astype(jnp.int32)) % 1000 + 3

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), ii))
        return acc

    n_iters = 9 if on_tpu else 2
    dt = _timed_chained(
        lambda n: float(chained(params, tables, ids, n)), n_iters)
    pairs_per_sec = B / dt
    # roofline context: ~2*P*tokens FLOPs, P ~= 86M encoder params + pos
    flops = 2 * 86e6 * B * S * 3  # fwd ~2PT, disentangled ~+? — report raw
    out = {
        "pairs_per_sec": round(pairs_per_sec, 1),
        "batch": B, "seq": S,
        "fused": deberta._use_fused_layers(cfg, B, S),
        "tables": args.tables == "on",
        "ms_per_batch": round(dt * 1000, 2),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
