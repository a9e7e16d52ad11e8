"""Benchmark: dense-retrieval query scoring throughput on one TPU chip.

Measures the north-star workload from BASELINE.json — exact brute-force MIPS
(score + top-k) over a device-resident corpus — and prints ONE JSON line.

Workload: 1M docs x 768 dims bf16 corpus resident in HBM, query batches of
512, exact top-50.  This is the rebuilt hot loop of reference
``modules/retrieve.py:147-185``.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md), so
the GPU baseline is modeled from its implementation: each query batch re-uploads
every 150k-doc fp16 chunk over PCIe (``modules/retrieve.py:152-164``), so an
A100-class GPU is transfer-bound at ~25 GB/s effective PCIe gen4:
  t_chunk_upload = N * D * 2 B / 25 GB/s ;  QPS_gpu = batch_size_sim / t_total
For N=1e6, D=768, batch_size_sim=2048 (config/retriever/*.yaml defaults):
  t = 1.536 GB / 25 GB/s = 61.4 ms -> QPS_gpu ~= 33 300.
"""

import json
import time

import numpy as np

N_DOCS = 1_048_576
DIM = 768
Q_BATCH = 512
TOP_K = 50
GPU_BASELINE_QPS = 33_300.0


def main():
    import jax
    import jax.numpy as jnp

    from bergen_tpu.ops import scoring
    from bergen_tpu.parallel import get_mesh

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(N_DOCS, DIM)).astype(np.float32)
    queries = rng.normal(size=(Q_BATCH, DIM)).astype(np.float32)

    mesh = get_mesh()
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    corpus_dev, valid_n = scoring.shard_corpus(mesh, corpus, dtype=dtype)
    q = jnp.asarray(queries, dtype=dtype)

    # Through the tunneled device, every dispatch/readback pays ~120 ms of
    # RTT and block_until_ready does not reliably await completion.  Measure
    # pure device throughput with a SINGLE jitted program that runs n
    # dependent scoring iterations in an internal fori_loop (queries perturbed
    # by the previous result to force sequential execution) and returns one
    # scalar: t(n) and t(1) are each one dispatch+readback, so
    # (t(n) - t(1)) / (n - 1) cancels the RTT exactly.
    from functools import partial

    @partial(jax.jit, static_argnames=("n_iters",))
    def chained(qq, corpus, n_iters):
        # corpus must be an ARGUMENT: a closed-over device array would be
        # baked into the program as a giant constant.
        def body(_, carry):
            acc, cur = carry
            v, _ = scoring.sharded_topk(mesh, cur, corpus, TOP_K,
                                        valid_n=valid_n)
            top = v[0, 0]
            return acc + top, qq + (top * 0).astype(qq.dtype)

        acc, _ = jax.lax.fori_loop(0, n_iters, body, (jnp.float32(0.0), qq))
        return acc

    n_iters = 17 if on_tpu else 2
    float(chained(q, corpus_dev, 1))  # compile + warm both shapes
    float(chained(q, corpus_dev, n_iters))
    t0 = time.perf_counter()
    float(chained(q, corpus_dev, 1))
    t_rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chained(q, corpus_dev, n_iters))
    t_total = time.perf_counter() - t0
    dt = max((t_total - t_rtt) / (n_iters - 1), 1e-9)
    qps = Q_BATCH / dt

    print(
        json.dumps(
            {
                "metric": "dense_mips_scoring_qps_1M_docs_768d_top50",
                "value": round(qps, 1),
                "unit": "queries/sec/chip",
                "vs_baseline": round(qps / GPU_BASELINE_QPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
