"""Per-decode-shape race of the production int4 kernel forms, on chip.

Times the real ``ops.int4_matmul.matmul_int4_packed`` (both ``stacked``
forms) against the w8a8 int8-MXU dot that `_proj` uses, at every decode
projection shape of TinyLlama dims (M=32 decode batch).

Timing method: chained dispatch — y feeds back into x via a scalar so XLA
cannot CSE the iterations; cost = (t(n) - t(1)) / (n - 1), min over 3 runs.
fori_loop overhead measured at 0.5 us/iter (negligible).

Usage: python scripts/bench_int4_race.py [shape,shape,...] [--out f.json]
"""
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from bergen_tpu.ops import int4_matmul

M = 32
GROUP = 128
T0 = time.time()


def _log(m):
    print(f"[{time.time()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)


SHAPES = {
    "gate_2048x5632": (2048, 5632),
    "down_5632x2048": (5632, 2048),
    "q_2048x2048": (2048, 2048),
    "kv_2048x256": (2048, 256),
    "head_2048x32000": (2048, 32000),
}


def make(K, N, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.05, jnp.bfloat16)
    wp = jnp.asarray(rng.integers(-128, 128, (K // 2, N)), jnp.int8)
    sc = jnp.asarray(rng.random((K // GROUP, N)) * 0.01 + 0.001, jnp.float32)
    w8 = jnp.asarray(rng.integers(-128, 128, (K, N)), jnp.int8)
    s8 = jnp.asarray(rng.random((N,)) * 0.01 + 0.001, jnp.float32)
    return x, wp, sc, w8, s8


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
    shapes = list(SHAPES)
    out_path = None
    args = sys.argv[1:]
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    if args:
        shapes = args[0].split(",")

    results = {}
    for name in shapes:
        K, N = SHAPES[name]
        x, wp, sc, w8, s8 = make(K, N)
        row = {}

        def w8a8(xc):
            xf = xc.astype(jnp.float32)
            sx = jnp.maximum(
                jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
            xq = jnp.round(xf / sx).astype(jnp.int8)
            y = jax.lax.dot_general(
                xq, w8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * sx * s8
            return y

        row["w8a8"] = timed_chain(w8a8, x) * 1e3

        forms = os.environ.get(
            "INT4_FORMS", "3dot,stacked,duo,mono").split(",")
        for label in forms:
            fn = (lambda f: lambda xc: int4_matmul.matmul_int4_packed(
                xc, wp, sc, form=f))(label)
            row[label] = timed_chain(fn, x) * 1e3

        results[name] = row
        _log(f"{name}: " + "  ".join(f"{k}={v:.4f}ms" for k, v in row.items()))

    print("\n=== ms per call (M=32) ===")
    for name, row in results.items():
        print(name, {k: round(v, 4) for k, v in row.items()})
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
