// Exact SPLADE candidate rescoring on the host.
//
// Stage 2 of the wide-slab sparse-MIPS engine (bergen_tpu/ops/sparse_slab.py):
// stage 1 (int8 slab GEMM on the TPU) nominates top-C candidate doc ids per
// query; this function recomputes their scores EXACTLY from the fixed-width
// sparse corpus, erasing both hash-collision and int8-quantization error
// from the final ranking.  Work is Q*C*nnz gather-FMAs with the query vector
// cache-resident (V floats ~ 122 KB at BERT vocab).
//
// Round-5 rework (the round-4 scalar loop ran ~136 M FMA/s and gated the
// whole slab path to 2.3k QPS end-to-end at 1M docs):
//   * SIMD gathers: AVX-512 (16-wide) / AVX2 (8-wide) vgatherdps + FMA with
//     two independent accumulator chains to hide gather latency; ISA picked
//     at runtime (__builtin_cpu_supports), baseline scalar kept for other
//     hosts — the .so stays generic-buildable (no -march=native needed).
//   * threads: sparse_rescore_f32_mt shards QUERIES round-robin across a
//     thread pool — the same read-only-index pattern as
//     native/bm25/bm25.cpp batch_search.
//
// Replaces the exactness role of reference models/retrievers/splade.py:55-56
// (torch.sparse.mm computes ALL scores exactly; here exactness is needed
// only for the k winners, so only candidates pay the sparse math).

#include <algorithm>
#include <cstdint>
#include <thread>
#include <vector>

#if defined(__x86_64__) || defined(_M_X64)
#include <immintrin.h>
#define RESCORE_X86 1
#endif

namespace {

// float-exactness note: all variants accumulate in f32 with tree-ish
// partial sums; the Python numpy fallback (einsum) differs only in f32
// summation order, which the tests bound at 1e-4 relative.

float dot_scalar(const float* dv, const int32_t* di, int32_t nnz,
                 const float* qv) {
  float s0 = 0.f, s1 = 0.f;
  int32_t j = 0;
  for (; j + 1 < nnz; j += 2) {
    s0 += dv[j] * qv[di[j]];
    s1 += dv[j + 1] * qv[di[j + 1]];
  }
  if (j < nnz) s0 += dv[j] * qv[di[j]];
  return s0 + s1;
}

#ifdef RESCORE_X86
__attribute__((target("avx2,fma"))) float dot_avx2(const float* dv,
                                                   const int32_t* di,
                                                   int32_t nnz,
                                                   const float* qv) {
  __m256 a0 = _mm256_setzero_ps(), a1 = _mm256_setzero_ps();
  int32_t j = 0;
  for (; j + 16 <= nnz; j += 16) {
    __m256i i0 = _mm256_loadu_si256((const __m256i*)(di + j));
    __m256i i1 = _mm256_loadu_si256((const __m256i*)(di + j + 8));
    __m256 g0 = _mm256_i32gather_ps(qv, i0, 4);
    __m256 g1 = _mm256_i32gather_ps(qv, i1, 4);
    a0 = _mm256_fmadd_ps(_mm256_loadu_ps(dv + j), g0, a0);
    a1 = _mm256_fmadd_ps(_mm256_loadu_ps(dv + j + 8), g1, a1);
  }
  for (; j + 8 <= nnz; j += 8) {
    __m256i i0 = _mm256_loadu_si256((const __m256i*)(di + j));
    __m256 g0 = _mm256_i32gather_ps(qv, i0, 4);
    a0 = _mm256_fmadd_ps(_mm256_loadu_ps(dv + j), g0, a0);
  }
  a0 = _mm256_add_ps(a0, a1);
  __m128 lo = _mm256_castps256_ps128(a0);
  __m128 hi = _mm256_extractf128_ps(a0, 1);
  lo = _mm_add_ps(lo, hi);
  lo = _mm_hadd_ps(lo, lo);
  lo = _mm_hadd_ps(lo, lo);
  float s = _mm_cvtss_f32(lo);
  for (; j < nnz; ++j) s += dv[j] * qv[di[j]];
  return s;
}

__attribute__((target("avx512f"))) float dot_avx512(const float* dv,
                                                    const int32_t* di,
                                                    int32_t nnz,
                                                    const float* qv) {
  // four independent gather->FMA chains: gathers are the long pole
  // (~25-50 cycle latency each) and the OoO window overlaps them only
  // across independent accumulators
  __m512 a0 = _mm512_setzero_ps(), a1 = _mm512_setzero_ps();
  __m512 a2 = _mm512_setzero_ps(), a3 = _mm512_setzero_ps();
  int32_t j = 0;
  for (; j + 64 <= nnz; j += 64) {
    __m512i i0 = _mm512_loadu_si512((const void*)(di + j));
    __m512i i1 = _mm512_loadu_si512((const void*)(di + j + 16));
    __m512i i2 = _mm512_loadu_si512((const void*)(di + j + 32));
    __m512i i3 = _mm512_loadu_si512((const void*)(di + j + 48));
    __m512 g0 = _mm512_i32gather_ps(i0, qv, 4);
    __m512 g1 = _mm512_i32gather_ps(i1, qv, 4);
    __m512 g2 = _mm512_i32gather_ps(i2, qv, 4);
    __m512 g3 = _mm512_i32gather_ps(i3, qv, 4);
    a0 = _mm512_fmadd_ps(_mm512_loadu_ps(dv + j), g0, a0);
    a1 = _mm512_fmadd_ps(_mm512_loadu_ps(dv + j + 16), g1, a1);
    a2 = _mm512_fmadd_ps(_mm512_loadu_ps(dv + j + 32), g2, a2);
    a3 = _mm512_fmadd_ps(_mm512_loadu_ps(dv + j + 48), g3, a3);
  }
  for (; j + 16 <= nnz; j += 16) {
    __m512i i0 = _mm512_loadu_si512((const void*)(di + j));
    __m512 g0 = _mm512_i32gather_ps(i0, qv, 4);
    a0 = _mm512_fmadd_ps(_mm512_loadu_ps(dv + j), g0, a0);
  }
  float s = _mm512_reduce_add_ps(
      _mm512_add_ps(_mm512_add_ps(a0, a1), _mm512_add_ps(a2, a3)));
  for (; j < nnz; ++j) s += dv[j] * qv[di[j]];
  return s;
}
#endif  // RESCORE_X86

using DotFn = float (*)(const float*, const int32_t*, int32_t, const float*);

DotFn pick_dot() {
#ifdef RESCORE_X86
  if (__builtin_cpu_supports("avx512f")) return dot_avx512;
  if (__builtin_cpu_supports("avx2") && __builtin_cpu_supports("fma"))
    return dot_avx2;
#endif
  return dot_scalar;
}

const DotFn kDot = pick_dot();

inline void prefetch_row(const float* dv, const int32_t* di, int32_t nnz) {
#ifdef RESCORE_X86
  // pull the next candidate's val+idx rows (2 KB at nnz=256) toward L2
  // while the current dot runs: candidate rows are random over the corpus,
  // so without this every dot starts with ~32 serialized DRAM misses
  for (int32_t b = 0; b < nnz; b += 16) {
    _mm_prefetch((const char*)(dv + b), _MM_HINT_T0);
    _mm_prefetch((const char*)(di + b), _MM_HINT_T0);
  }
#else
  (void)dv;
  (void)di;
  (void)nnz;
#endif
}

void rescore_rows(const float* vals, const int32_t* idx, int32_t nnz,
                  const int32_t* cand, int32_t Q, int32_t C,
                  const float* q_dense, int32_t V, float* out,
                  int32_t q_begin, int32_t q_step) {
  for (int64_t q = q_begin; q < Q; q += q_step) {
    const float* qv = q_dense + q * (int64_t)V;
    const int32_t* cr = cand + q * (int64_t)C;
    float* orow = out + q * (int64_t)C;
    if (C > 0) {
      const int64_t d0 = cr[0];
      prefetch_row(vals + d0 * (int64_t)nnz, idx + d0 * (int64_t)nnz, nnz);
    }
    for (int64_t c = 0; c < C; ++c) {
      if (c + 1 < C) {
        const int64_t dn = cr[c + 1];
        prefetch_row(vals + dn * (int64_t)nnz, idx + dn * (int64_t)nnz, nnz);
      }
      const int64_t d = cr[c];
      orow[c] = kDot(vals + d * (int64_t)nnz, idx + d * (int64_t)nnz, nnz, qv);
    }
  }
}

}  // namespace

extern "C" {

// vals [N, nnz] f32 (0 = padding), idx [N, nnz] int32 vocab ids,
// cand [Q, C] global doc ids, q_dense [Q, V] f32, out [Q, C] f32.
void sparse_rescore_f32(const float* vals, const int32_t* idx, int32_t nnz,
                        const int32_t* cand, int32_t Q, int32_t C,
                        const float* q_dense, int32_t V, float* out) {
  rescore_rows(vals, idx, nnz, cand, Q, C, q_dense, V, out, 0, 1);
}

// Threaded variant: queries shard round-robin; the corpus and candidate
// arrays are read-only and each thread writes disjoint output rows.
void sparse_rescore_f32_mt(const float* vals, const int32_t* idx, int32_t nnz,
                           const int32_t* cand, int32_t Q, int32_t C,
                           const float* q_dense, int32_t V, float* out,
                           int32_t threads) {
  if (threads < 1) threads = 1;
  threads = std::min<int32_t>(threads, Q > 0 ? Q : 1);
  if (threads == 1) {
    rescore_rows(vals, idx, nnz, cand, Q, C, q_dense, V, out, 0, 1);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int32_t t = 0; t < threads; ++t)
    pool.emplace_back(rescore_rows, vals, idx, nnz, cand, Q, C, q_dense, V,
                      out, t, threads);
  for (auto& th : pool) th.join();
}

// 1 = AVX-512, 2 = AVX2+FMA, 0 = scalar — lets callers/benchmarks record
// which ISA path actually ran on this host.
int32_t sparse_rescore_isa() {
#ifdef RESCORE_X86
  if (__builtin_cpu_supports("avx512f")) return 1;
  if (__builtin_cpu_supports("avx2") && __builtin_cpu_supports("fma")) return 2;
#endif
  return 0;
}

}  // extern "C"
