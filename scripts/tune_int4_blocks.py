"""Sweep int4 kernel (form, block_n, block_k) per decode projection shape.

Emits the fastest config per shape — the data behind int4_matmul's
``form="auto"`` table.  Methodology matches scripts/bench_int4_race.py
(jitted 257-deep dependency chain, so successive calls overlap weight DMA
with compute the way a real decode step's back-to-back projections do).

Usage: python scripts/tune_int4_blocks.py [shape,shape] [--out f.json]
"""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bergen_tpu.ops import int4_matmul  # noqa: E402

M = 32
GROUP = 128
T0 = time.time()


def _log(m):
    print(f"[{time.time()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)


# TinyLlama-1.1B decode projections (the shipped int4 model family)
SHAPES = {
    "gate_2048x5632": (2048, 5632),
    "down_5632x2048": (5632, 2048),
    "q_2048x2048": (2048, 2048),
    "kv_2048x256": (2048, 256),
    "head_2048x32000": (2048, 32000),
}

# candidate (block_n, block_k) per shape: the round-4 default (512, 512)
# plus large-block configs that keep mono's 3 unpacked bf16 temps
# (6*KBh*NB bytes) + double-buffered wp inside ~12 MB of VMEM
CANDS = {
    "gate_2048x5632": [(512, 512), (1408, 2048), (704, 2048)],
    "down_5632x2048": [(512, 512), (1024, 2816), (2048, 1408)],
    "q_2048x2048": [(512, 512), (1024, 2048), (2048, 2048)],
    "kv_2048x256": [(512, 512), (256, 2048)],
    "head_2048x32000": [(512, 512), (1280, 2048), (6400, 512)],
}

FORMS = ("duo", "mono")


def make(K, N, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.05, jnp.bfloat16)
    wp = jnp.asarray(rng.integers(-128, 128, (K // 2, N)), jnp.int8)
    sc = jnp.asarray(rng.random((K // GROUP, N)) * 0.01 + 0.001, jnp.float32)
    return x, wp, sc


def timed_chain(fn, x, n=257):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(x, n):
        def body(_, xc):
            y = fn(xc)
            return xc * (1.0 + 1e-30 * y[0, 0]).astype(xc.dtype)
        return jax.lax.fori_loop(0, n, body, x)

    chain(x, 1).block_until_ready()
    chain(x, n).block_until_ready()

    def t(k):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            chain(x, k).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(n) - t(1)) / (n - 1)


def main():
    out_path = None
    args = sys.argv[1:]
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    shapes = args[0].split(",") if args else list(SHAPES)
    results = {}
    for name in shapes:
        K, N = SHAPES[name]
        x, wp, sc = make(K, N)
        rows = {}
        for form in FORMS:
            for bn, bk in CANDS[name]:
                try:
                    fn = (lambda f, b_n, b_k: lambda xc:
                          int4_matmul.matmul_int4_packed(
                              xc, wp, sc, block_n=b_n, block_k=b_k,
                              form=f))(form, bn, bk)
                    ms = timed_chain(fn, x) * 1e3
                except Exception as e:  # noqa: BLE001 — record and move on
                    _log(f"{name} {form} {bn}x{bk}: FAIL {e}")
                    continue
                rows[f"{form}@{bn}x{bk}"] = round(ms, 4)
                _log(f"{name} {form} bn={bn} bk={bk}: {ms:.4f} ms")
        best = min(rows, key=rows.get)
        results[name] = {"best": best, "ms": rows[best], "all": rows}
        _log(f"{name}: BEST {best} = {rows[best]} ms")
    print(json.dumps(results, indent=1))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
