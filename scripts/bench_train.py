"""LoRA SFT training throughput on chip (tokens/sec of the jitted step).

The reference trains through HF Trainer + DDP on GPUs
(``/root/reference/modules/rag.py:615-646``); here the whole step — masked
causal-LM loss, backward, LoRA-masked AdamW update — is ONE jitted program
(``train/step.py`` + ``train/lora.py``), so the measurement is the same
chained-iteration harness as the inference benches: n data-dependent steps
inside one program, (t(n)-t(1))/(n-1).

TinyLlama-1.1B dims, batch 8 x seq 512 (a RAG SFT shape: prompt with top-5
docs + answer), bf16 weights, LoRA r=16 on all linears.  Random weights:
throughput depends on shapes, not values.

Usage: python scripts/bench_train.py [--batch 8] [--seq 512] [--rank 16]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--full-ft", action="store_true",
                    help="full fine-tune (no LoRA mask) for comparison")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from bench import _timed_chained
    from bergen_tpu.models import llama
    from bergen_tpu.train import lora
    from bergen_tpu.train.step import make_train_step

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = llama.LlamaConfig(
            vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
            num_kv_heads=4, intermediate_size=5632,
            max_position_embeddings=4096,
        )  # TinyLlama-1.1B
    else:
        cfg = llama.LlamaConfig(
            vocab_size=1000, hidden_size=128, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=256,
            max_position_embeddings=1024,
        )
    B, S = (args.batch, args.seq) if on_tpu else (2, 64)

    params = llama.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.bfloat16 if on_tpu else jnp.float32),
        params)
    if args.full_ft:
        optimizer = optax.adamw(1e-4)
    else:
        params = lora.init_lora(params, args.rank, 2.0 * args.rank,
                                jax.random.PRNGKey(1))
        optimizer = optax.masked(optax.adamw(1e-4), lora.lora_mask(params))
    opt_state = optimizer.init(params)

    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(3, cfg.vocab_size, (B, S)), jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        # answer tokens = last quarter (the RAG SFT shape: long doc prompt,
        # short answer — reference llm.py:204-253 masks the prompt)
        "loss_mask": jnp.asarray(
            np.arange(S)[None, :] >= (3 * S) // 4, jnp.int32
        ) * jnp.ones((B, 1), jnp.int32),
    }
    step = make_train_step(cfg, optimizer)

    @functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(0, 1))
    def chained(params, opt_state, n):
        def body(_, carry):
            p, o, _ = carry
            return step(p, o, batch)

        p, o, loss = jax.lax.fori_loop(
            0, n, body, (params, opt_state, jnp.float32(0.0)))
        return loss

    n_iters = 6 if on_tpu else 2
    # donated args: re-init per timing call (cheap vs the step itself)
    def run(n):
        p = jax.tree.map(jnp.copy, params)
        o = optimizer.init(p)
        return float(chained(p, o, n))

    dt = _timed_chained(run, n_iters)
    tok_per_sec = B * S / dt
    # as-implemented reference: HF Trainer + PEFT LoRA on A100-80GB at ~25%
    # MFU ~= 11,800 tok/s (derivation: BASELINE.md "LoRA SFT training")
    LORA_A100_BASELINE = 11_800.0
    out = {
        "mode": "full_ft" if args.full_ft else f"lora_r{args.rank}",
        "batch": B, "seq": S,
        "ms_per_step": round(dt * 1000, 2),
        "train_tok_per_sec": round(tok_per_sec, 1),
        "backend": jax.default_backend(),
    }
    if not args.full_ft:
        out["vs_baseline"] = round(tok_per_sec / LORA_A100_BASELINE, 3)
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
