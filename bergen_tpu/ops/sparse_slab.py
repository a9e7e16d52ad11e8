"""SPLADE sparse MIPS via a wide frequency-partitioned int8 slab.

The round-2 exact path (``ops/sparse.py``) scatter-densifies [block, 30522]
tiles at query time — 268M serialized scatter-adds per corpus pass at 1M docs,
~3 s of VPU time that dwarfs the 83 ms GEMM.  The count-sketch engine
(``ops/sparse_sketch.py``) killed the scatter but capped at ~650 QPS because
its exact-rescore stage gathers Q x C x nnz query values (67M scalar loads),
and its narrow d=1024 sketch needed that rescore to survive hash collisions.

This module takes the sketch idea to its TPU-native conclusion: make the
projection SO wide that stage 1 *is* the answer.

* **Slab**: each doc becomes a dense [d] int8 row, d ~ 10240.  The
  ``head_frac * d`` highest-impact-mass vocab terms each own a dedicated
  column (their contribution is exact — at d=10240/head_frac=0.8 that is
  8192 columns covering ~92% of Zipf-distributed posting mass); only the
  mass-poor tail is count-sketch-hashed (+/- signs, unbiased) into the
  remaining columns.  Shared (q, doc) terms always land in the same column
  with sign^2 = +1, so true match signal is never lost — collisions only add
  noise whose variance shrinks with the tail width.
* **Scoring = dense retrieval.**  The slab is a [N, d] int8 row-layout
  corpus, so queries ride the existing fused int8 GEMM + bin-argmax kernel
  (``ops/fused_topk.bin_topk``) or the exact-rows XLA path, sharded over the
  mesh 'data' axis with the standard ICI top-k merge.  Zero query-time
  scatter, zero gather: pure MXU.  At 1M docs / d=10240 / Q=4096 the GEMM is
  4.2e13 MACs — ~2 orders below the scatter path's wall clock.
* **Memory**: int8 slab = N x d bytes (10.7 GB at 1M docs, fits one v5e);
  the build is chunked on host (no [N, d] f32 intermediate) and disk-cached.

Accuracy is int8-floor-limited (~0.98 top-50 overlap vs exact bf16, the same
floor as the dense int8 path) plus a small hash-collision term; the
pipeline's recall guard (``pipeline/retrieve.py``) measures the true overlap
against a host fp32 reference on every run and falls back to the exact
scatter path below threshold.

Replaces the hot path of reference ``models/retrievers/splade.py:55-56`` +
``modules/retrieve.py:154`` (torch.sparse.mm over streamed GPU chunks).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bergen_tpu.ops import fused_topk
from bergen_tpu.ops.sparse_sketch import sketch_map, term_impact_mass

BIN = 128  # fused kernel bin granularity (fused_topk.BIN)


def default_width(n_docs: int, vocab: int, hbm_budget_bytes: int = 11 << 30,
                  target: int = 10240) -> int:
    """Largest slab width (multiple of 256) whose int8 bytes fit the budget,
    capped at ``target`` and at the dense vocab (past which head columns
    would go unused)."""
    by_mem = hbm_budget_bytes // max(1, n_docs)
    d = min(target, int(by_mem), vocab + 256)
    return max(256, (d // 256) * 256)


def column_whitening(vals: np.ndarray, idx: np.ndarray, bucket: np.ndarray,
                     d: int) -> np.ndarray:
    """Per-column equalization scales g [d]: doc columns multiply by g and
    query columns by 1/g, so every score is EXACTLY preserved while the
    int8 per-doc quantization step stops being dominated by the few hottest
    columns (head terms / crowded buckets).  g = 1/rms of the column's
    posting mass, clamped to +/-16x around its median."""
    m2 = np.bincount(
        bucket[idx.ravel().astype(np.int64)],
        weights=np.square(vals.astype(np.float64)).ravel(), minlength=d,
    )
    rms = np.sqrt(m2 / max(1, vals.shape[0]))
    med = np.median(rms[rms > 0]) if np.any(rms > 0) else 1.0
    rms = np.clip(rms, med / 16, med * 16)
    return (med / rms).astype(np.float32)


def build_slab_int8(
    vals: np.ndarray,            # [N, nnz] f16/f32 impacts (0 = pad)
    idx: np.ndarray,             # [N, nnz] int32 vocab ids
    bucket: np.ndarray,          # [V] int32 column map
    sign: np.ndarray,            # [V] f32 +/-1
    d: int,
    chunk: int = 1 << 16,
    col_scale: np.ndarray | None = None,  # [d] whitening (column_whitening)
) -> Tuple[np.ndarray, np.ndarray]:
    """Fixed-width sparse docs → ([N, d] int8 codes, [N] f32 per-doc scales).

    Chunked so the f32 dense intermediate never exceeds ``chunk x d``
    (a full [N, d] f32 slab would be 42 GB at 1M docs / d=10240)."""
    from scipy import sparse as sp

    N, nnz = vals.shape
    codes = np.empty((N, d), dtype=np.int8)
    scales = np.empty((N,), dtype=np.float32)
    for s in range(0, N, chunk):
        e = min(N, s + chunk)
        B = e - s
        rows = np.repeat(np.arange(B, dtype=np.int32), nnz)
        flat = idx[s:e].ravel()
        data = vals[s:e].astype(np.float32).ravel()
        data *= sign[flat]
        cols = bucket[flat]
        if col_scale is not None:
            data *= col_scale[cols]
        dense = np.asarray(
            sp.coo_matrix((data, (rows, cols)), shape=(B, d)).todense(),
            dtype=np.float32,
        )
        # single-temp quantization: naive np.abs().max() + clip(round(x/s))
        # allocates four [B, d] f32 temps (measured 107 s/chunk on this
        # 1-core host at 1M docs); the in-place form cut the full build from
        # ~39 min to ~4 min
        absmax = np.maximum(dense.max(axis=1), -dense.min(axis=1))
        sc = (absmax / 127.0).astype(np.float32)
        inv = np.where(sc > 0, 1.0 / np.where(sc > 0, sc, 1.0), 1.0)
        dense *= inv[:, None].astype(np.float32)
        np.rint(dense, out=dense)
        np.clip(dense, -127, 127, out=dense)
        codes[s:e] = dense.astype(np.int8)
        scales[s:e] = sc
    return codes, scales


_RESCORE_LIB: "object | None | bool" = False  # False = not yet probed


def _load_rescore_lib():
    """ctypes handle to native/rescore/librescore.so (auto-built via make),
    or None when the toolchain is unavailable (numpy fallback used)."""
    global _RESCORE_LIB
    if _RESCORE_LIB is not False:
        return _RESCORE_LIB
    import ctypes
    import subprocess

    nd = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", "..", "native", "rescore")
    so = os.path.abspath(os.path.join(nd, "librescore.so"))
    try:
        if not os.path.exists(so):
            subprocess.run(["make", "-C", os.path.abspath(nd)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(so)
        lib.sparse_rescore_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
        ]
        try:
            lib.sparse_rescore_f32_mt.argtypes = (
                lib.sparse_rescore_f32.argtypes + [ctypes.c_int32])
        except AttributeError:  # stale pre-round-5 .so on disk
            pass
        _RESCORE_LIB = lib
    except Exception:
        _RESCORE_LIB = None
    return _RESCORE_LIB


def rescore_exact(vals: np.ndarray, idx: np.ndarray, cand: np.ndarray,
                  q_dense: np.ndarray, threads: int | None = None
                  ) -> np.ndarray:
    """Exact sparse scores of candidate docs: [Q, C] f32.

    ``sum_j vals[cand, j] * q_dense[q, idx[cand, j]]`` — the same math the
    exact densify path computes for ALL docs, applied only to stage-1
    winners.  C++ (native/rescore: runtime-dispatched AVX-512/AVX2 gather
    FMAs, queries sharded over ``threads``) when buildable, vectorised
    numpy otherwise (identical results up to f32 summation order).
    ``threads`` defaults to ``BERGEN_TPU_RESCORE_THREADS`` or the host
    core count."""
    Q, C = cand.shape
    vals = np.ascontiguousarray(vals, np.float32)
    idx = np.ascontiguousarray(idx, np.int32)
    cand = np.ascontiguousarray(cand, np.int32)
    q_dense = np.ascontiguousarray(q_dense, np.float32)
    if cand.size and (cand.min() < 0 or cand.max() >= vals.shape[0]):
        raise ValueError(
            f"candidate ids outside [0, {vals.shape[0]}) — callers must "
            "clamp device padding ids before rescoring"
        )
    if idx.size and idx.max() >= q_dense.shape[1]:
        raise ValueError("sparse idx exceeds query vocab width")
    lib = _load_rescore_lib()
    if lib is not None:
        if threads is None:
            threads = int(os.environ.get(
                "BERGEN_TPU_RESCORE_THREADS", os.cpu_count() or 1))
        out = np.empty((Q, C), np.float32)
        if hasattr(lib, "sparse_rescore_f32_mt"):
            lib.sparse_rescore_f32_mt(
                vals.ctypes.data, idx.ctypes.data, np.int32(vals.shape[1]),
                cand.ctypes.data, np.int32(Q), np.int32(C),
                q_dense.ctypes.data, np.int32(q_dense.shape[1]),
                out.ctypes.data, np.int32(max(1, threads)),
            )
        else:
            lib.sparse_rescore_f32(
                vals.ctypes.data, idx.ctypes.data, np.int32(vals.shape[1]),
                cand.ctypes.data, np.int32(Q), np.int32(C),
                q_dense.ctypes.data, np.int32(q_dense.shape[1]),
                out.ctypes.data,
            )
        return out
    qg = q_dense[np.arange(Q)[:, None, None], idx[cand]]
    return np.einsum("qcj,qcj->qc", vals[cand].astype(np.float32), qg)


def queries_to_slab(q_dense: np.ndarray, bucket: np.ndarray,
                    sign: np.ndarray, d: int) -> np.ndarray:
    """Dense [Q, V] queries → [Q, d] f32 slab rows.  Queries are sparse in
    practice (~40 active terms), so this walks the nonzero COO directly —
    no [V, d] projection matrix."""
    q = np.asarray(q_dense, np.float32)
    rows, terms = np.nonzero(q)
    out = np.zeros((q.shape[0], d), np.float32)
    np.add.at(out, (rows, bucket[terms]), q[rows, terms] * sign[terms])
    return out


class SlabIndex:
    """Device-resident wide-slab SPLADE corpus, sharded over the mesh 'data'
    axis.  ``search`` dispatches to the fused bin-top-k kernel on TPU and to
    the exact-rows XLA path elsewhere (same codes, same scores)."""

    def __init__(self, mesh: Mesh, vals: np.ndarray, idx: np.ndarray,
                 vocab: int, d: int | None = None, head_frac: float = 0.8,
                 seed: int = 0, cache_path: str | None = None,
                 tail_assign: str = "balanced", whiten: bool = False):
        self.mesh = mesh
        self.vocab = vocab
        N, _ = vals.shape
        if d is None:
            d = default_width(N, vocab)
        self.d = d
        self.valid_n = N
        mass = term_impact_mass(vals, idx, vocab)
        self.bucket, self.sign = sketch_map(
            vocab, d, seed, term_mass=mass, head_frac=head_frac,
            tail_assign=tail_assign,
        )
        self.col_scale = (
            column_whitening(vals, idx, self.bucket, d) if whiten else None
        )
        # host copies for the exact stage-2 rescore (f32 once: converting
        # per-search would alloc the full corpus every call)
        self._vals32 = np.ascontiguousarray(vals, np.float32)
        self._idx32 = np.ascontiguousarray(idx, np.int32)
        import zlib
        tag_src = self.bucket.tobytes() + (self.sign < 0).tobytes()
        if self.col_scale is not None:
            tag_src += self.col_scale.tobytes()
        map_tag = zlib.crc32(tag_src) | (len(tag_src) << 32)

        codes = scales = None
        if cache_path is not None:
            cache_path = cache_path.replace(".npz", "") + f"_{map_tag:016x}.npz"
            if os.path.exists(cache_path):
                z = np.load(cache_path)
                if z["codes"].shape == (N, d):
                    codes, scales = z["codes"], z["scales"]
        if codes is None:
            codes, scales = build_slab_int8(
                vals, idx, self.bucket, self.sign, d,
                col_scale=self.col_scale,
            )
            if cache_path is not None:
                np.savez(cache_path, codes=codes, scales=scales)

        # row-layout device shards, padded to the fused kernel's bin
        # granularity across the data axis (same convention as
        # fused_topk.shard_corpus_rows, but the codes are already int8 —
        # re-quantizing through that helper would square the error)
        n_data = mesh.shape["data"]
        Np = -(-N // (n_data * BIN)) * n_data * BIN
        if Np != N:
            codes = np.concatenate(
                [codes, np.zeros((Np - N, d), np.int8)], axis=0
            )
            scales = np.concatenate(
                [scales, np.zeros((Np - N,), np.float32)]
            )
        self.codes_dev = jax.device_put(
            jnp.asarray(codes), NamedSharding(mesh, P("data", None))
        )
        self.scales_dev = jax.device_put(
            jnp.asarray(scales), NamedSharding(mesh, P("data"))
        )

    def search(self, q_dense: np.ndarray, k: int,
               fused: bool | None = None, rescore: int = 4,
               pipeline_chunks: int | None = None,
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[Q, V] dense queries → ([Q, k] scores f32, [Q, k] doc ids).

        ``rescore`` > 0 runs the exact stage 2: the slab GEMM nominates
        ``rescore * k`` candidates and their scores are recomputed exactly
        from the sparse corpus on the host (``rescore_exact``), erasing
        collision + int8 error from the returned top-k.  0 = slab-only.

        **Device/host pipelining**: with rescore active the query batch is
        split into ``pipeline_chunks`` equal sub-chunks whose stage-1 GEMMs
        are ALL dispatched up front (JAX dispatch is async; the device
        queue runs them back-to-back) and whose host rescores run as each
        chunk's candidates arrive — the device scores chunk j+1 while the
        host rescores chunk j, so end-to-end cost is ~max(GEMM, rescore)
        instead of their sum.  ``None`` = auto (4 when the batch divides
        evenly and is big enough to amortize the extra dispatches)."""
        if fused is None:
            fused = jax.default_backend() == "tpu"
        c = min(max(k, rescore * k), self.valid_n) if rescore else k
        qs = queries_to_slab(q_dense, self.bucket, self.sign, self.d)
        if self.col_scale is not None:
            # docs columns were scaled by g at build time; dividing query
            # columns by g makes every f32 score identical to unwhitened —
            # only the int8 rounding pattern changes
            qs /= self.col_scale
        Q = qs.shape[0]
        stage1 = (fused_topk.sharded_bin_topk if fused
                  else fused_topk.sharded_exact_topk_rows)
        do_rescore = rescore and c > k
        if pipeline_chunks is None:
            pipeline_chunks = 4 if (do_rescore and Q % 4 == 0
                                    and Q >= 512) else 1
        n_ch = max(1, pipeline_chunks) if do_rescore else 1
        if Q % n_ch:
            n_ch = 1
        step = Q // n_ch
        handles = [
            stage1(
                self.mesh, jnp.asarray(qs[s:s + step]), self.codes_dev, c,
                valid_n=self.valid_n, doc_scales=self.scales_dev,
            )
            for s in range(0, Q, step)
        ]
        if not do_rescore:
            v, i = handles[0]
            return v, i
        q32 = np.asarray(q_dense, np.float32)
        out_s = np.empty((Q, k), np.float32)
        out_i = np.empty((Q, k), np.int32)
        for j, (_, i) in enumerate(handles):
            s0 = j * step
            cand = np.asarray(i, np.int32)  # blocks on THIS chunk only
            # small/sharded corpora surface device PADDING ids (>= valid_n)
            # in the candidate tail — clamp for the gather, sink in the sort
            ok = (cand >= 0) & (cand < self.valid_n)
            s = rescore_exact(self._vals32, self._idx32,
                              np.where(ok, cand, 0), q32[s0:s0 + step])
            s = np.where(ok, s, -np.inf)
            order = np.argsort(-s, axis=1, kind="stable")[:, :k]
            out_s[s0:s0 + step] = np.take_along_axis(s, order, axis=1)
            out_i[s0:s0 + step] = np.take_along_axis(cand, order, axis=1)
        return jnp.asarray(out_s), jnp.asarray(out_i)
