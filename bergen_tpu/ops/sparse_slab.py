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


def build_slab_int8(
    vals: np.ndarray,            # [N, nnz] f16/f32 impacts (0 = pad)
    idx: np.ndarray,             # [N, nnz] int32 vocab ids
    bucket: np.ndarray,          # [V] int32 column map
    sign: np.ndarray,            # [V] f32 +/-1
    d: int,
    chunk: int = 1 << 16,
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
        rows = np.repeat(np.arange(B, dtype=np.int64), nnz)
        flat = idx[s:e].ravel()
        cols = bucket[flat].astype(np.int64)
        data = vals[s:e].astype(np.float32).ravel() * sign[flat]
        dense = np.asarray(
            sp.coo_matrix((data, (rows, cols)), shape=(B, d)).todense(),
            dtype=np.float32,
        )
        absmax = np.abs(dense).max(axis=1)
        sc = (absmax / 127.0).astype(np.float32)
        safe = np.where(sc > 0, sc, 1.0)
        codes[s:e] = np.clip(
            np.round(dense / safe[:, None]), -127, 127
        ).astype(np.int8)
        scales[s:e] = sc
    return codes, scales


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
                 seed: int = 0, cache_path: str | None = None):
        self.mesh = mesh
        self.vocab = vocab
        N, _ = vals.shape
        if d is None:
            d = default_width(N, vocab)
        self.d = d
        self.valid_n = N
        mass = term_impact_mass(vals, idx, vocab)
        self.bucket, self.sign = sketch_map(
            vocab, d, seed, term_mass=mass, head_frac=head_frac
        )
        map_tag = int(np.uint64(
            np.bitwise_xor.reduce(self.bucket.view(np.uint32).astype(np.uint64)
                                  * np.uint64(0x9E3779B97F4A7C15))
            ^ np.uint64((self.sign < 0).sum())
        ))

        codes = scales = None
        if cache_path is not None:
            cache_path = cache_path.replace(".npz", "") + f"_{map_tag:016x}.npz"
            if os.path.exists(cache_path):
                z = np.load(cache_path)
                if z["codes"].shape == (N, d):
                    codes, scales = z["codes"], z["scales"]
        if codes is None:
            codes, scales = build_slab_int8(
                vals, idx, self.bucket, self.sign, d
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
               fused: bool | None = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[Q, V] dense queries → ([Q, k] scores f32, [Q, k] doc ids)."""
        if fused is None:
            fused = jax.default_backend() == "tpu"
        qs = queries_to_slab(q_dense, self.bucket, self.sign, self.d)
        if fused:
            return fused_topk.sharded_bin_topk(
                self.mesh, jnp.asarray(qs), self.codes_dev, k,
                valid_n=self.valid_n, doc_scales=self.scales_dev,
            )
        return fused_topk.sharded_exact_topk_rows(
            self.mesh, jnp.asarray(qs), self.codes_dev, k,
            valid_n=self.valid_n, doc_scales=self.scales_dev,
        )
