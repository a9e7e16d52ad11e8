// Exact SPLADE candidate rescoring on the host.
//
// Stage 2 of the wide-slab sparse-MIPS engine (bergen_tpu/ops/sparse_slab.py):
// stage 1 (int8 slab GEMM on the TPU) nominates top-C candidate doc ids per
// query; this function recomputes their scores EXACTLY from the fixed-width
// sparse corpus, erasing both hash-collision and int8-quantization error
// from the final ranking.  Work is Q*C*nnz fused multiply-adds with the
// query vector cache-resident (V floats ~ 122 KB at BERT vocab), so a
// 512-query x 256-candidate x 256-nnz batch is ~34M FMAs — well under the
// slab GEMM's device time even on one host core.
//
// Replaces the exactness role of reference models/retrievers/splade.py:55-56
// (torch.sparse.mm computes ALL scores exactly; here exactness is needed
// only for the k winners, so only candidates pay the sparse math).

#include <cstdint>

extern "C" {

// vals [N, nnz] f32 (0 = padding), idx [N, nnz] int32 vocab ids,
// cand [Q, C] global doc ids, q_dense [Q, V] f32, out [Q, C] f32.
void sparse_rescore_f32(const float* vals, const int32_t* idx, int32_t nnz,
                        const int32_t* cand, int32_t Q, int32_t C,
                        const float* q_dense, int32_t V, float* out) {
  for (int64_t q = 0; q < Q; ++q) {
    const float* qv = q_dense + q * (int64_t)V;
    for (int64_t c = 0; c < C; ++c) {
      const int64_t d = cand[q * C + c];
      const float* dv = vals + d * (int64_t)nnz;
      const int32_t* di = idx + d * (int64_t)nnz;
      float s0 = 0.f, s1 = 0.f;  // two accumulators hide gather latency
      int32_t j = 0;
      for (; j + 1 < nnz; j += 2) {
        s0 += dv[j] * qv[di[j]];
        s1 += dv[j + 1] * qv[di[j + 1]];
      }
      if (j < nnz) s0 += dv[j] * qv[di[j]];
      out[q * C + c] = s0 + s1;
    }
  }
}

}  // extern "C"
