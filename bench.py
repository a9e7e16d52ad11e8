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

N_DOCS = 1_000_000
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

    # Through the tunneled device, block_until_ready does not reliably await
    # completion and any readback pays ~150 ms of RTT. Measure honestly by
    # dispatching K jitted scoring calls asynchronously, then forcing
    # completion of ALL of them with one tiny dependent reduction + a single
    # scalar readback.  Per-batch time = (t(K) - t(1)) / (K - 1) cancels the
    # constant dispatch/readback RTT.
    rngs = np.random.default_rng(1)
    qs = [
        jnp.asarray(rngs.normal(size=(Q_BATCH, DIM)), dtype) for _ in range(4)
    ]

    def run(k):
        tops = []
        for i in range(k):
            v, _ = scoring.sharded_topk(
                mesh, qs[i % len(qs)], corpus_dev, TOP_K, valid_n=valid_n
            )
            tops.append(v[0, 0])
        return float(jnp.stack(tops).sum())  # depends on every batch

    n_iters = 33 if on_tpu else 2
    run(1)  # compile + warm
    run(n_iters)
    t0 = time.perf_counter()
    run(1)
    t_rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(n_iters)
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
