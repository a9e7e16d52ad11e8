"""SPLADE sparse-MIPS benchmark at the north-star scale (1M docs).

Round-2 measured the exact densify+GEMM path at ~590 QPS — the one workload
losing to the modeled GPU (~8k QPS cuSPARSE A100, BASELINE.md).  This bench
measures the round-3 engines on a realistic synthetic corpus (Zipfian term
distribution, gamma impact values — the shape that makes SPLADE pruning
hard):

  1. exact bf16 densify (round-2 path + unique-index scatter)
  2. exact int8 densify (int8 MXU GEMM, per-doc dequant)
  3. count-sketch + exact rescore (ops/sparse_sketch.py), with the measured
     top-50 overlap vs the exact ranking — the number the pipeline's recall
     guard enforces at run time.

Usage: python scripts/bench_splade.py [--docs 1048576] [--out out.json]
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

VOCAB = 30522
NNZ = 256
Q_BATCH = 512
Q_TERMS = 40
TOP_K = 50


def zipf_sparse(rng, n_rows, n_terms, alpha=1.1):
    """Rows of distinct-ish Zipf-distributed term ids + gamma impact values.
    Duplicate term draws keep their id but zero their value (the fixed-width
    convention: val-0 entries are no-ops)."""
    p = 1.0 / np.arange(1, VOCAB + 1) ** alpha
    cdf = np.cumsum(p / p.sum())
    idx = np.searchsorted(
        cdf, rng.random((n_rows, n_terms)), side="right"
    ).astype(np.int32)
    idx = np.sort(idx, axis=1)
    vals = rng.gamma(2.0, 0.6, (n_rows, n_terms)).astype(np.float32)
    dup = np.zeros_like(vals, dtype=bool)
    dup[:, 1:] = idx[:, 1:] == idx[:, :-1]
    vals[dup] = 0.0
    return vals, idx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1 << 20)
    ap.add_argument("--out", default=None)
    ap.add_argument("--sketch-d", type=int, default=1024)
    ap.add_argument("--candidates", type=int, default=512)
    ap.add_argument("--slab-d", type=int, default=None)
    ap.add_argument("--slab-head-frac", type=float, default=0.8)
    ap.add_argument(
        "--engine", choices=("all", "slab"), default="all",
        help="'slab' measures only the wide-slab engine plus the exact bf16 "
             "reference (the full matrix re-measures every engine)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _timed_chained
    from bergen_tpu.ops import sparse as sparse_ops
    from bergen_tpu.ops.sparse_sketch import SketchIndex, sketch_queries
    from bergen_tpu.parallel import get_mesh

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    N = args.docs
    _log(f"generating {N} Zipf docs")
    d_vals, d_idx = zipf_sparse(rng, N, NNZ)
    qv, qi = zipf_sparse(rng, Q_BATCH, Q_TERMS, alpha=1.05)
    q_dense = np.zeros((Q_BATCH, VOCAB), np.float32)
    np.put_along_axis(q_dense, qi, qv, axis=1)
    # plant realevant docs: each query shares half its terms with one doc
    for r in range(Q_BATCH):
        j = rng.integers(0, N)
        q_dense[r, d_idx[j, :Q_TERMS // 2]] += d_vals[j, :Q_TERMS // 2]

    mesh = get_mesh()
    d_vals16 = d_vals.astype(np.float16)
    results = {}

    def timed(fn_call, arrays, n_iters, q_host=None):
        # the corpus arrays MUST be jit arguments: closed-over device arrays
        # get baked into the program as giant constants (1.5 GB of HLO at
        # 1M docs — the compile never returns through the tunnel)
        @functools.partial(jax.jit, static_argnames=("n",))
        def chained(q, arrays, n):
            def body(_, carry):
                acc, cur = carry
                v, _ = fn_call(cur, *arrays)
                top = v[0, 0]
                return acc + top, cur + (top * 1e-36).astype(cur.dtype)

            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), q))
            return acc

        q = jnp.asarray(q_dense if q_host is None else q_host, jnp.float32)
        return _timed_chained(lambda n: float(chained(q, arrays, n)), n_iters)

    # ---- exact bf16 densify ------------------------------------------------
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    vals_dev, idx_dev, valid_n = sparse_ops.shard_sparse_corpus(
        mesh, d_vals16, d_idx, dtype=dtype
    )
    _log("exact bf16")
    if args.engine != "slab":  # slab mode: reference ranking only, no timing
        dt = timed(
            lambda cur, vd, ix: sparse_ops.sharded_sparse_topk(
                mesh, cur.astype(dtype), vd, ix, TOP_K, VOCAB, valid_n=valid_n,
            ),
            (vals_dev, idx_dev),
            4 if on_tpu else 2,
        )
        results["exact_bf16_qps"] = Q_BATCH / dt
    v_ref, i_ref = sparse_ops.sharded_sparse_topk(
        mesh, jnp.asarray(q_dense, dtype), vals_dev, idx_dev, TOP_K, VOCAB,
        valid_n=valid_n,
    )
    i_ref = np.asarray(i_ref)

    # ---- wide slab (frequency-partitioned int8, zero query-time scatter) ---
    if args.engine in ("all", "slab"):
        from bergen_tpu.ops import fused_topk
        from bergen_tpu.ops.sparse_slab import SlabIndex, queries_to_slab

        # release the exact-path corpus before the 10+ GB slab lands
        del vals_dev, idx_dev
        _log("slab build")
        t0 = time.time()
        slab = SlabIndex(
            mesh, d_vals, d_idx, VOCAB, d=args.slab_d,
            head_frac=args.slab_head_frac,
            cache_path=f"/tmp/splade_slab_{N}.npz",
        )
        results["slab_d"] = slab.d
        results["slab_build_s"] = time.time() - t0
        _log(f"slab search (d={slab.d})")
        q_slab = queries_to_slab(q_dense, slab.bucket, slab.sign, slab.d)
        dt_sl = timed(
            lambda cur, cd, sc: fused_topk.sharded_bin_topk(
                mesh, cur, cd, TOP_K, valid_n=slab.valid_n, doc_scales=sc,
                interpret=not on_tpu,
            ),
            (slab.codes_dev, slab.scales_dev),
            8 if on_tpu else 2,
            q_host=q_slab,
        )
        results["slab_qps"] = Q_BATCH / dt_sl
        # stage-2 exact rescore (host C++): timed separately — in the
        # pipeline it pipelines against the next batch's device GEMM, so
        # the conservative combined rate is Q / (t_gemm + t_rescore)
        from bergen_tpu.ops.sparse_slab import rescore_exact

        # rescore-depth ablation: end-to-end fidelity (post-rescore top-50
        # overlap vs the exact bf16 ranking = candidate recall@C, since the
        # rescore itself is exact) and the combined QPS at each depth
        depths = [4 * TOP_K, 1000, 2000, 4000]
        results["rescore_ablation"] = {}
        for C in depths:
            C = min(C, slab.valid_n)
            _, cand = fused_topk.sharded_bin_topk(
                mesh, jnp.asarray(q_slab), slab.codes_dev, C,
                valid_n=slab.valid_n, doc_scales=slab.scales_dev,
                interpret=not on_tpu,
            )
            cand = np.asarray(cand, np.int32)
            # device PADDING ids (>= valid_n) surface in deep candidate
            # tails on BIN-padded corpora — clamp for the gather and sink
            # them in the sort, exactly like SlabIndex.search.  (Skipping
            # this fed garbage rows to the C++ rescore and read as a fake
            # ~0.69 fidelity collapse.)
            ok = (cand >= 0) & (cand < slab.valid_n)
            cand_c = np.where(ok, cand, 0)
            rescore_exact(slab._vals32, slab._idx32, cand_c[:8], q_dense[:8])
            t0r = time.time()
            s_re = rescore_exact(slab._vals32, slab._idx32, cand_c, q_dense)
            dt_re = time.time() - t0r
            s_re = np.where(ok, s_re, -np.inf)
            ord_ = np.argsort(-s_re, axis=1, kind="stable")[:, :TOP_K]
            i_re = np.take_along_axis(cand, ord_, axis=1)
            overlap = float(np.mean([
                len(set(i_re[r]) & set(i_ref[r])) / TOP_K
                for r in range(Q_BATCH)
            ]))
            results["rescore_ablation"][C] = {
                "rescore_host_s_per_batch": round(dt_re, 4),
                "combined_qps": round(Q_BATCH / (dt_sl + dt_re), 1),
                "top50_overlap_vs_exact": round(overlap, 4),
            }
            _log(f"rescore C={C}: overlap={overlap:.4f} "
                 f"qps={Q_BATCH/(dt_sl+dt_re):.0f}")
        # headline row keeps the shipped default depth (4 * top_k)
        C = 4 * TOP_K
        head = results["rescore_ablation"][C]
        results["rescore_c"] = C
        results["rescore_host_s_per_batch"] = head["rescore_host_s_per_batch"]
        results["slab_rescore_qps_serial"] = head["combined_qps"]
        results["slab_rescore_vs_exact_overlap"] = (
            head["top50_overlap_vs_exact"])

        # ---- pipelined end-to-end (round 5): search() dispatches all chunk
        # GEMMs up front and rescores each chunk as its candidates arrive —
        # device GEMM of chunk j+1 overlaps host rescore of chunk j, so the
        # steady rate is ~max(GEMM, rescore) instead of their sum.  Measured
        # at the offline-eval shape (a whole 4096-query split at once,
        # 8 chunks), wall-clock including the host query-projection.
        from bergen_tpu.ops.sparse_slab import _load_rescore_lib
        QP = 4096
        qp_vals, qp_idx = zipf_sparse(rng, QP, Q_TERMS, alpha=1.05)
        qp_dense = np.zeros((QP, VOCAB), np.float32)
        np.put_along_axis(qp_dense, qp_idx, qp_vals, axis=1)
        slab.search(qp_dense[:512], TOP_K, fused=on_tpu, rescore=4)  # warm
        best = float("inf")
        for _ in range(3):
            t0p = time.perf_counter()
            jax.block_until_ready(slab.search(
                qp_dense, TOP_K, fused=on_tpu, rescore=4,
                pipeline_chunks=8)[0])
            best = min(best, time.perf_counter() - t0p)
        lib = _load_rescore_lib()
        isa = (int(lib.sparse_rescore_isa())
               if lib is not None and hasattr(lib, "sparse_rescore_isa")
               else -1)
        results["slab_rescore_qps"] = round(QP / best, 1)
        results["slab_rescore_pipeline"] = {
            "queries": QP, "chunks": 8, "wall_s": round(best, 4),
            "rescore_isa": {1: "avx512", 2: "avx2", 0: "scalar",
                            -1: "numpy"}[isa],
            "rescore_threads": int(os.environ.get(
                "BERGEN_TPU_RESCORE_THREADS", os.cpu_count() or 1)),
        }
        # pipelining must not change results: same kernel, same rescore
        v_a, i_a = slab.search(q_dense, TOP_K, fused=on_tpu, rescore=4,
                               pipeline_chunks=1)
        v_b, i_b = slab.search(q_dense, TOP_K, fused=on_tpu, rescore=4,
                               pipeline_chunks=4)
        assert np.array_equal(np.asarray(i_a), np.asarray(i_b)), \
            "pipelined slab search changed the ranking"
        del qp_dense, qp_vals, qp_idx
        _log(f"pipelined slab+rescore: {results['slab_rescore_qps']} QPS")
        if on_tpu:
            # query-amortized (Q=4096): the slab GEMM is FLOP-bound, so QPS
            # should hold roughly flat — measured to confirm
            qa_vals_s, qa_idx_s = zipf_sparse(rng, 4096, Q_TERMS, alpha=1.05)
            qa_dense_s = np.zeros((4096, VOCAB), np.float32)
            np.put_along_axis(qa_dense_s, qa_idx_s, qa_vals_s, axis=1)
            qa_slab = queries_to_slab(
                qa_dense_s, slab.bucket, slab.sign, slab.d
            )
            dt_sl4k = timed(
                lambda cur, cd, sc: fused_topk.sharded_bin_topk(
                    mesh, cur, cd, TOP_K, valid_n=slab.valid_n,
                    doc_scales=sc,
                ),
                (slab.codes_dev, slab.scales_dev),
                4,
                q_host=qa_slab,
            )
            results["slab_q4096_qps"] = 4096 / dt_sl4k
            del qa_slab
        _, i_sl = slab.search(q_dense, TOP_K, fused=on_tpu)
        results["slab_vs_exact_overlap"] = float(np.mean([
            len(set(np.asarray(i_sl)[r]) & set(i_ref[r])) / TOP_K
            for r in range(Q_BATCH)
        ]))
        del slab, q_slab
        if args.engine == "slab":
            results["n_docs"] = N
            results["backend"] = jax.default_backend()
            print(json.dumps(results, indent=2))
            if args.out:
                with open(args.out, "w") as f:
                    json.dump(results, f, indent=2)
            return
        vals_dev, idx_dev, valid_n = sparse_ops.shard_sparse_corpus(
            mesh, d_vals16, d_idx, dtype=dtype
        )

    # ---- exact int8 densify ------------------------------------------------
    codes_dev, idx_dev8, scales_dev, _ = sparse_ops.shard_sparse_corpus(
        mesh, d_vals16, d_idx, dtype=jnp.int8
    )
    _log("exact int8")
    dt8 = timed(
        lambda cur, cd, ix, sc: sparse_ops.sharded_sparse_topk(
            mesh, cur, cd, ix, TOP_K, VOCAB, valid_n=valid_n, doc_scales=sc,
        ),
        (codes_dev, idx_dev8, scales_dev),
        4 if on_tpu else 2,
    )
    results["exact_int8_qps"] = Q_BATCH / dt8

    # query-amortized exact scoring: the scatter-densify cost is per
    # CORPUS PASS, not per query — a 4096-query batch (batch_size_sim in
    # the pipeline) amortizes it 8x.  This is the realistic offline mode:
    # BERGEN scores a whole dev split at once.
    QA = 4096
    _log(f"exact int8 amortized Q={QA}")
    qa_vals, qa_idx = zipf_sparse(rng, QA, Q_TERMS, alpha=1.05)
    qa_dense = np.zeros((QA, VOCAB), np.float32)
    np.put_along_axis(qa_dense, qa_idx, qa_vals, axis=1)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained_amortized(q, cd, ix, sc, n):
        def body(_, carry):
            acc, cur = carry
            v, _ = sparse_ops.sharded_sparse_topk(
                mesh, cur, cd, ix, TOP_K, VOCAB, valid_n=valid_n,
                doc_scales=sc,
            )
            top = v[0, 0]
            return acc + top, cur + (top * 1e-36).astype(cur.dtype)

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), q))
        return acc

    qa_dev = jnp.asarray(qa_dense, jnp.float32)
    dt4k = _timed_chained(
        lambda n: float(chained_amortized(
            qa_dev, codes_dev, idx_dev8, scales_dev, n)),
        3 if on_tpu else 2,
    )
    results["exact_int8_q4096_qps"] = QA / dt4k
    _, i_8 = sparse_ops.sharded_sparse_topk(
        mesh, jnp.asarray(q_dense), codes_dev, idx_dev8, TOP_K, VOCAB,
        valid_n=valid_n, doc_scales=scales_dev,
    )
    results["int8_vs_exact_overlap"] = float(np.mean([
        len(set(np.asarray(i_8)[r]) & set(i_ref[r])) / TOP_K
        for r in range(Q_BATCH)
    ]))
    del codes_dev, idx_dev8, scales_dev

    # ---- sketch + exact rescore -------------------------------------------
    _log("sketch build")
    t0 = time.time()
    ski = SketchIndex(mesh, d_vals16, d_idx, VOCAB, d=args.sketch_d,
                      candidates=args.candidates,
                      cache_path=f"/tmp/splade_sketch_{N}_{args.sketch_d}.npy",
                      vals_dev=vals_dev, idx_dev=idx_dev)
    results["sketch_build_s"] = time.time() - t0

    # the search path quantizes + sketches queries host-side; for the
    # steady-state rate, time the device program with pre-sketched queries
    from bergen_tpu.ops.scoring import quantize_rows_int8
    from bergen_tpu.ops.sparse_sketch import _sharded_fn

    qs = sketch_queries(q_dense, ski.bucket, ski.sign, ski.d)
    q_i8, _ = quantize_rows_int8(jnp.asarray(qs, jnp.float32))
    q_i8 = jnp.asarray(np.asarray(q_i8))
    cand = max(TOP_K, min(ski.candidates,
                          ski.sk_dev.shape[0] // mesh.shape["data"]))
    fn = _sharded_fn(mesh, TOP_K, cand, 128, not on_tpu)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained_sketch(qi8, qd, sk_dev, sk_scales, vals_d, idx_d, n):
        def body(_, carry):
            acc, cur = carry
            v, _ = fn(cur, qd, sk_dev, sk_scales, vals_d, idx_d,
                      jnp.int32(ski.valid_n))
            top = v[0, 0]
            # loop-carried dependency the compiler cannot hoist: cur only
            # provably unchanged if top were +inf, which it cannot prove
            nxt = jnp.where(jnp.isinf(top), cur + jnp.int8(1), cur)
            return acc + top, nxt

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), qi8))
        return acc

    _log("sketch search")
    qd = jnp.asarray(q_dense, jnp.float32)
    n_iters = 33 if on_tpu else 2
    dt_sk = _timed_chained(
        lambda n: float(chained_sketch(q_i8, qd, ski.sk_dev, ski.sk_scales,
                                       ski.vals_dev, ski.idx_dev, n)),
        n_iters,
    )
    results["sketch_qps"] = Q_BATCH / dt_sk

    _, i_sk = ski.search(q_dense, TOP_K)
    results["sketch_vs_exact_overlap"] = float(np.mean([
        len(set(np.asarray(i_sk)[r]) & set(i_ref[r])) / TOP_K
        for r in range(Q_BATCH)
    ]))
    results["n_docs"] = N
    results["backend"] = jax.default_backend()
    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
