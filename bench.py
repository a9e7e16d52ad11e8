"""Benchmarks: the two north-star workloads on one TPU chip (BASELINE.json).

Prints one JSON line per metric; the FINAL line is the headline scoring
metric. Workloads:

1. Corpus encoding (docs-encoded/sec): BERT-base-shaped encoder, bf16,
   batch 256 x seq 192 — the rebuilt hot loop of reference
   ``modules/retrieve.py:111-144``.
2. Query scoring (QPS): brute-force MIPS (score + top-k) over a
   device-resident 1M x 768 corpus, query batches of 512, top-50 — the
   rebuilt hot loop of reference ``modules/retrieve.py:147-185``.  On TPU
   this runs the fused Pallas kernel (``ops/fused_topk.py``): int8 MXU GEMM
   with a per-128-doc bin-argmax epilogue in VMEM, per-bin dequant scales,
   so the [Q, N] score matrix never touches HBM.  Approximate top-k with
   bin-collision semantics identical to ``lax.approx_max_k`` — measured
   top-50 overlap vs the exact int8 ranking: 0.9969 on-chip; the retrieval
   pipeline dual-runs a recall guard on every real run.  Off-TPU the XLA
   int8/bf16 ``topk_blocked`` path is benchmarked instead.

GPU baselines (derivation + sensitivity in BASELINE.md "Throughput
baselines"): the reference publishes no throughput numbers, so the baseline
models its implementation on an A100-80GB:
  * scoring, as-implemented (streamed): each 2048-query batch re-uploads
    every 150k-doc fp16 chunk over PCIe gen4 (~25 GB/s effective)
    (``modules/retrieve.py:152-164``) -> 33,300 QPS.  This is the
    north-star denominator (it is what the reference DOES).
  * scoring, corpus-resident A100 (honest competitor, reported for
    context): fp16 GEMM at ~80% MXU eff + cuda topk -> ~150,000 QPS.
  * encoding: fp16 BERT-base forward at 40% MFU (HF inference, dynamic
    padding, per-batch H2D/D2H) -> ~3,540 docs/sec.
"""

import functools
import json
import time

import numpy as np

N_DOCS = 1_048_576
DIM = 768
Q_BATCH = 512
TOP_K = 50
ENC_BATCH = 256
ENC_SEQ = 192

GPU_BASELINE_QPS = 33_300.0       # reference streamed path (BASELINE.md)
GPU_RESIDENT_QPS = 150_000.0      # corpus-resident A100 (context only)
GPU_ENCODE_DOCS_PER_SEC = 3_540.0
GPU_GENERATE_TOK_PER_SEC = 2_500.0  # reference as-implemented: HF fp16
# model.generate on A100 (eager per-step python loop, kv-cache concat
# copies — llm.py:134-148); an efficient vLLM A100 stack would reach
# ~20k tok/s on this workload and beat any v5e absolute (A100 HBM is
# 2.4x v5e's) — both documented in BASELINE.md "Generation baseline".


def _emit(metric, value, unit, baseline):
    print(json.dumps({
        "metric": metric, "value": round(float(value), 1), "unit": unit,
        "vs_baseline": round(float(value) / baseline, 3),
    }), flush=True)


def _timed_chained(run, n_iters, repeats: int = 3):
    """Through the tunneled device every dispatch/readback pays an RTT
    (~120 ms nominal, with multi-second jitter under load) and
    block_until_ready is unreliable; run(n) executes n dependent iterations
    inside ONE jitted program returning one scalar, so
    (t(n) - t(1)) / (n - 1) cancels the RTT.  The RTT *jitter* does not
    cancel in a single pair, so take the MIN of several samples of each
    (min(t) -> true work + RTT floor) before subtracting; a non-positive
    difference means jitter still swamped the work — fail loudly rather
    than print a fantasy number."""
    run(1), run(n_iters)  # compile + warm both shapes
    t1 = min(_t(run, 1) for _ in range(repeats))
    tn = min(_t(run, n_iters) for _ in range(repeats))
    dt = (tn - t1) / (n_iters - 1)
    if dt <= 0:
        raise RuntimeError(
            f"chained timing underflow (t1={t1:.3f}s tn={tn:.3f}s, "
            f"n={n_iters}): tunnel RTT jitter exceeds the measured work — "
            "increase n_iters"
        )
    return dt


def _t(run, n):
    t0 = time.perf_counter()
    run(n)
    return time.perf_counter() - t0


def bench_encode(on_tpu, w8a8=False):
    import jax
    import jax.numpy as jnp

    from bergen_tpu.models import bert

    cfg = bert.BertConfig(
        vocab_size=30522, hidden_size=DIM, num_layers=12, num_heads=12,
        intermediate_size=4 * DIM, max_position_embeddings=512,
    )
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
        bert.init(jax.random.PRNGKey(0), cfg),
    )
    if w8a8:
        # int8-MXU whole-layer kernel (encoder_layer_q); production use is
        # gated by the dense retriever's dual-encode fidelity guard
        from bergen_tpu.models import convert

        params = convert.quantize_encoder_layers_w8a8(params)
    rng = np.random.default_rng(0)
    ii = jnp.asarray(rng.integers(1000, 20000, (ENC_BATCH, ENC_SEQ)), jnp.int32)
    am = jnp.ones((ENC_BATCH, ENC_SEQ), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(params, ii, am, n):
        def body(_, carry):
            acc, cur = carry
            hidden = bert.encode(params, cfg, cur, am)
            emb = bert.mean_pool(hidden, am)
            top = emb[0, 0].astype(jnp.float32)
            # data dependency on `top` that XLA cannot constant-fold away
            # (a `* 0` form gets folded and the loop body hoisted)
            return acc + top, ii + (top * 1e-30).astype(jnp.int32)

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), ii))
        return acc

    n_iters = 9 if on_tpu else 2
    dt = _timed_chained(lambda n: float(chained(params, ii, am, n)), n_iters)
    return ENC_BATCH / dt


def bench_scoring(on_tpu):
    import jax
    import jax.numpy as jnp

    from bergen_tpu.ops import scoring
    from bergen_tpu.parallel import get_mesh

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(N_DOCS, DIM)).astype(np.float32)
    queries = rng.normal(size=(Q_BATCH, DIM)).astype(np.float32)
    mesh = get_mesh()

    def run_variant(corpus_dev, dscales, valid_n, q):
        @functools.partial(jax.jit, static_argnames=("n",))
        def chained(qq, corpus_dev, dscales, n):
            # corpus must be an ARGUMENT: a closed-over device array would
            # be baked into the program as a giant constant
            def body(_, carry):
                acc, cur = carry
                v, _ = scoring.sharded_topk(
                    mesh, cur, corpus_dev, TOP_K, valid_n=valid_n,
                    doc_scales=dscales,
                )
                top = v[0, 0]
                # unfoldable dependency; numerically qq (see encode note)
                if qq.dtype == jnp.int8:
                    nxt = qq + (top * 1e-30).astype(jnp.int8)
                else:
                    nxt = qq + (top * 1e-36).astype(qq.dtype)
                return acc + top, nxt

            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), qq))
            return acc

        n_iters = 33 if on_tpu else 2
        return _timed_chained(
            lambda n: float(chained(q, corpus_dev, dscales, n)), n_iters
        )

    if on_tpu:
        # fused Pallas path: per-bin int8 corpus, i32 bin-argmax epilogue
        from bergen_tpu.ops import fused_topk

        codes, bscales = fused_topk.quantize_bins_int8(corpus)
        c_dev = jax.device_put(jnp.asarray(codes))
        bsc = jax.device_put(jnp.asarray(bscales))
        q_i8 = jnp.asarray(
            np.asarray(scoring.quantize_rows_int8(queries)[0])
        )

        @functools.partial(jax.jit, static_argnames=("n",))
        def chained(q, c, dsc, n):
            def body(_, carry):
                acc, cur = carry
                v, _ = fused_topk.bin_topk(
                    cur, c, TOP_K, valid_n=N_DOCS, doc_scales=dsc
                )
                top = v[0, 0]
                return acc + top, cur + (top * 1e-30).astype(cur.dtype)

            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), q))
            return acc

        dt = _timed_chained(lambda n: float(chained(q_i8, c_dev, bsc, n)), 33)
        return Q_BATCH / dt, "fused_int8"

    # off-TPU: XLA int8 topk_blocked path (fused kernel needs Mosaic)
    c_i8, dsc, valid_n = scoring.shard_corpus(mesh, corpus, dtype=jnp.int8)
    dt_i8 = run_variant(c_i8, dsc, valid_n, jnp.asarray(queries))
    return Q_BATCH / dt_i8, "int8_xla"


def bench_generate(on_tpu, quant="w8a8"):
    """TinyLlama-1.1B dims, batch 32, prefill 256 + 64 new tokens; W8A8
    int8-MXU weights (the reference quantizes small models to 4-bit via
    bitsandbytes — multidomain.md:27 — so quantized-vs-quantized is the
    like-for-like comparison).  ``quant="int4"`` runs the SAME end-to-end
    generate through the packed-int4 Pallas kernel (auto form/blocks) —
    the driver-recorded row for the reference's actual default small-model
    mode (reference models/generators/llm.py:94-121)."""
    import jax
    import jax.numpy as jnp

    from bergen_tpu.models import convert, llama

    if on_tpu:
        cfg = llama.LlamaConfig(
            vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
            num_kv_heads=4, intermediate_size=5632,
            max_position_embeddings=2048,
        )
        B, S, NEW = 32, 256, 64
    else:  # smoke-test dims only — the driver benches on TPU
        cfg = llama.LlamaConfig(
            vocab_size=1000, hidden_size=256, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=512,
            max_position_embeddings=512,
        )
        B, S, NEW = 4, 32, 4
    params = llama.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    if on_tpu:
        if quant == "int4":
            params = convert.quantize_tree_int4(params, packed=True)
        else:
            params = convert.quantize_tree_int8(params, mxu=True)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, S)), jnp.int32)
    am = jnp.ones((B, S), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(p, ctr, n):
        def body(_, carry):
            acc, c = carry
            ids2 = (ids + c) % cfg.vocab_size
            toks = llama.greedy_generate(
                p, cfg, ids2, am, NEW, eos_token_id=-1, pad_token_id=0,
                cache_dtype=jnp.bfloat16)
            t = jnp.sum(toks[0, :4]).astype(jnp.float32)
            return acc + t, c + (t * 1e-30).astype(jnp.int32)
        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), ctr))
        return acc

    n_iters = 5 if on_tpu else 2
    dt = _timed_chained(
        lambda n: float(chained(params, jnp.int32(0), n)), n_iters)
    return B * NEW / dt


def bench_serving(on_tpu):
    """Mixed-length workload through the continuous-batching engine vs the
    static bucketed path (the round-2 'keeps decode batches full' claim,
    now measured).  64 requests: prompt lengths uniform 32-512, per-request
    generation budgets uniform 8-128 (standing in for EOS-length variance —
    a static batch decodes to its LONGEST member's budget while the server
    frees each slot at its own).  Same w8a8 TinyLlama-dims model both paths;
    the server drain is ONE device program (serve/engine.run_workload), so
    the comparison is device-time vs device-time."""
    import jax
    import jax.numpy as jnp

    from bergen_tpu.models import convert, llama
    from bergen_tpu.serve.engine import GenerationServer

    if on_tpu:
        cfg = llama.LlamaConfig(
            vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
            num_kv_heads=4, intermediate_size=5632,
            max_position_embeddings=2048,
        )
        R, SLOTS, PMAX = 64, 32, 512
        len_lo, len_hi, new_lo, new_hi = 32, 512, 8, 128
    else:
        cfg = llama.LlamaConfig(
            vocab_size=1000, hidden_size=256, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=512,
            max_position_embeddings=512,
        )
        R, SLOTS, PMAX = 8, 4, 64
        len_lo, len_hi, new_lo, new_hi = 8, 64, 4, 8
    params = llama.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    if on_tpu:
        params = convert.quantize_tree_int8(params, mxu=True)
    rng = np.random.default_rng(0)
    plens = rng.integers(len_lo, len_hi + 1, R)
    max_news = rng.integers(new_lo, new_hi + 1, R)
    prompts = [list(rng.integers(3, cfg.vocab_size, n)) for n in plens]
    total_new = int(max_news.sum())  # budget == tokens generated (eos_id=-1
    # is unreachable for random weights over a real vocab; budgets stand in
    # for EOS variance)

    # finer prompt buckets cut prefill padding FLOPs (uniform 32-512 prompts
    # padded to pow2 buckets wasted ~33% of prefill compute; 5 buckets cut
    # that to ~15%) — both the static path and the server use them, so the
    # comparison stays tuned-vs-tuned
    buckets = (64, 128, 256, 384, 512) if on_tpu else (16, 32, 64)

    def bucket_of(n):
        for b in buckets:
            if n <= b:
                return b
        return buckets[-1]

    # ---- static path: sort by prompt length, batches of SLOTS, each batch
    # padded to its bucket and decoded to its own max budget (what
    # Generator.eval's length-sorted batching does) ----
    order = np.argsort(plens)
    static_dt = 0.0
    for s in range(0, R, SLOTS):
        rows = order[s : s + SLOTS]
        P = bucket_of(max(plens[r] for r in rows))
        NEW = int(max(max_news[r] for r in rows))
        B = len(rows)
        ii = np.zeros((B, P), np.int32)
        am = np.zeros((B, P), np.int32)
        for j, r in enumerate(rows):
            ids = prompts[r][-P:]
            ii[j, P - len(ids):] = ids
            am[j, P - len(ids):] = 1
        ii_d, am_d = jnp.asarray(ii), jnp.asarray(am)

        @functools.partial(jax.jit, static_argnames=("n", "new"))
        def chained(p, ctr, n, new):
            def body(_, carry):
                acc, c = carry
                ids2 = (ii_d + c) % cfg.vocab_size * am_d
                toks = llama.greedy_generate(
                    p, cfg, ids2, am_d, new, eos_token_id=-1, pad_token_id=0,
                    cache_dtype=jnp.bfloat16)
                t = jnp.sum(toks[0, :4]).astype(jnp.float32)
                return acc + t, c + (t * 1e-30).astype(jnp.int32)
            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), ctr))
            return acc

        n_iters = 3 if on_tpu else 2
        static_dt += _timed_chained(
            lambda n: float(chained(params, jnp.int32(0), n, NEW)), n_iters)

    # ---- serving path: the whole workload drains in one device program ----
    server = GenerationServer(
        params, cfg, eos_token_id=-1, pad_token_id=0, max_slots=SLOTS,
        max_len=PMAX + int(max_news.max()) + 1, prompt_buckets=buckets,
    )
    # round-5: the EPOCH drain (batched admission + ring KV + the flat-cache
    # decode-attention kernel) is the measured default — the chunked-prefill
    # drain was built and diagnosed (scripts/diag_chunked.py): occupancy
    # matched (184 vs 183 iters) but carrying the prompt-chunk rows on every
    # decode forward cost more per step than the epoch's batched prefill
    # stalls at these dims.  run_workload(mode="auto") dispatches here.
    runner, args = server.plan_workload(prompts, list(map(int, max_news)))
    (_, pr_d, pl_d, mn_d, grq_d, grc_d, grb_d, bud_d, key0) = args

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained_srv(p, key, n):
        def body(_, carry):
            # the dependency must flow through the PROMPTS: in greedy mode
            # the drain ignores its rng key, so an rng-only chain lets XLA
            # CSE all n drains into one
            acc, cur_pr = carry
            out, n_out, _ = runner(p, cur_pr, pl_d, mn_d, grq_d, grc_d,
                                   grb_d, bud_d, key)
            t = jnp.sum(out[0, :4]).astype(jnp.float32)
            return acc + t, cur_pr + (t * 1e-30).astype(jnp.int32)
        acc, _ = jax.lax.fori_loop(
            0, n, body, (jnp.float32(0.0), pr_d))
        return acc

    n_iters = 5 if on_tpu else 2
    srv_dt = _timed_chained(
        lambda n: float(chained_srv(params, jax.random.PRNGKey(0), n)),
        n_iters)
    return total_new / srv_dt, total_new / static_dt


def main():
    import jax

    # persistent compile cache: the serving drain alone is a multi-minute
    # tunnel compile; repeat bench runs on the same host should hit the cache
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    on_tpu = jax.default_backend() == "tpu"

    docs_per_sec = bench_encode(on_tpu)
    _emit("corpus_encode_docs_per_sec_bertbase_b256_s192", docs_per_sec,
          "docs/sec/chip", GPU_ENCODE_DOCS_PER_SEC)

    try:
        docs_w8a8 = bench_encode(on_tpu, w8a8=True)
        _emit("corpus_encode_docs_per_sec_bertbase_b256_s192_w8a8",
              docs_w8a8, "docs/sec/chip", GPU_ENCODE_DOCS_PER_SEC)
    except Exception as e:  # never block the headline rows
        import sys

        print(f"# bench_encode(w8a8) failed: {e!r}", file=sys.stderr,
              flush=True)

    tok_per_sec = bench_generate(on_tpu)
    _emit("tinyllama_generate_tok_per_sec_b32_prefill256_new64_w8a8",
          tok_per_sec, "new tokens/sec/chip", GPU_GENERATE_TOK_PER_SEC)

    try:
        tok_int4 = bench_generate(on_tpu, quant="int4")
        _emit("tinyllama_generate_tok_per_sec_b32_prefill256_new64_int4",
              tok_int4, "new tokens/sec/chip", GPU_GENERATE_TOK_PER_SEC)
    except Exception as e:  # never block the headline rows
        import sys

        print(f"# bench_generate(int4) failed: {e!r}", file=sys.stderr,
              flush=True)

    try:
        srv_tok, static_tok = bench_serving(on_tpu)
        _emit("tinyllama_serving_tok_per_sec_mixedlen_w8a8_static_batching",
              static_tok, "new tokens/sec/chip", GPU_GENERATE_TOK_PER_SEC)
        _emit("tinyllama_serving_tok_per_sec_mixedlen_w8a8_continuous_batching",
              srv_tok, "new tokens/sec/chip", GPU_GENERATE_TOK_PER_SEC)
    except Exception as e:  # never block the headline scoring row
        import sys

        print(f"# bench_serving failed: {e!r}", file=sys.stderr, flush=True)

    qps, which = bench_scoring(on_tpu)
    _emit(f"dense_mips_scoring_qps_1M_docs_768d_top50_{which}", qps,
          "queries/sec/chip", GPU_BASELINE_QPS)


if __name__ == "__main__":
    main()
