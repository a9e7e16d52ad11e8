"""Sparse (SPLADE) MIPS scoring on TPU.

The reference stores SPLADE doc vectors as torch sparse tensors and scores with
``torch.sparse.mm`` on GPU (``models/retrievers/splade.py:55-56``,
``modules/retrieve.py:138-140``).  TPUs have no sparse GEMM unit, so the design
is different (SURVEY.md §7 'SPLADE on TPU'):

* corpus vectors are stored **fixed-width sparse**: per doc the top ``nnz``
  (value, vocab-index) pairs — bf16 values + int32 indices.  At nnz=256 this is
  ~1.5 KB/doc vs ~61 KB dense, so a 10M-doc corpus fits sharded HBM.
* scoring densifies one doc block at a time on device (scatter) and runs the
  block through the MXU as a dense GEMM ``q [Q,V] @ block^T [V,B]`` — turning
  irregular sparse compute into the systolic array's favourite shape — with a
  streaming top-k merge identical to the dense path.
* multi-chip: doc shards partitioned over the mesh ``data`` axis, per-device
  top-k, ICI all-gather merge (same pattern as ops/scoring.sharded_topk).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def to_fixed_width(dense: np.ndarray, nnz: int) -> Tuple[np.ndarray, np.ndarray]:
    """[B, V] dense sparse-activations → (values [B, nnz] f16, indices [B, nnz]
    int32), keeping each row's top-nnz entries (rows with fewer nonzeros pad
    with value 0 at index 0)."""
    B, V = dense.shape
    nnz = min(nnz, V)
    idx = np.argpartition(-dense, nnz - 1, axis=1)[:, :nnz]
    vals = np.take_along_axis(dense, idx, axis=1)
    mask = vals > 0
    vals = np.where(mask, vals, 0.0).astype(np.float16)
    idx = np.where(mask, idx, 0).astype(np.int32)
    return vals, idx


def _densify_block(vals: jnp.ndarray, idx: jnp.ndarray, vocab: int) -> jnp.ndarray:
    """(vals [B, nnz], idx [B, nnz]) → dense [B, V].

    ``unique_indices=True`` releases XLA from the serialize-duplicates
    guarantee (the scatter was the exact path's dominant cost).  Indices ARE
    unique per row by construction (``to_fixed_width`` keeps distinct top-nnz
    terms) except the (val 0, idx 0) padding entries — and an arbitrary
    resolution order among +0.0 additions still yields 0, so the relaxation
    is value-safe."""
    B, nnz = vals.shape
    out = jnp.zeros((B, vocab), vals.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, nnz), 0)
    return out.at[rows, idx].add(vals, unique_indices=True)


def quantize_sparse_int8(vals: np.ndarray):
    """Per-doc symmetric int8 quantization of fixed-width sparse values:
    vals[i] ~= codes[i] * scales[i].  Returns (codes [N, nnz] int8,
    scales [N] f32)."""
    v = np.asarray(vals, np.float32)
    absmax = np.abs(v).max(axis=1)
    scales = (absmax / 127.0).astype(np.float32)
    safe = np.where(scales > 0, scales, 1.0)
    codes = np.clip(np.round(v / safe[:, None]), -127, 127).astype(np.int8)
    return codes, scales


@functools.partial(
    jax.jit,
    static_argnames=("k", "block", "vocab", "vary_axis", "method",
                     "recall_target"),
)
def sparse_topk_blocked(
    q_dense: jnp.ndarray,   # [Q, V] — int8 codes when doc_vals is int8
    doc_vals: jnp.ndarray,  # [N, nnz] f16/bf16, or int8 codes
    doc_idx: jnp.ndarray,   # [N, nnz]
    k: int,
    vocab: int,
    block: int = 8192,
    vary_axis: str | None = None,
    method: str = "auto",
    recall_target: float = 0.99,
    doc_scales: jnp.ndarray | None = None,  # [N] f32 (int8 path)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k of q · doc over fixed-width sparse docs, streaming per
    block.  int8 doc codes densify to an int8 block and score on the int8
    MXU (2x the bf16 rate, half the densify traffic); the per-doc dequant
    multiply runs on the [Q, block] score tile."""
    Q, V = q_dense.shape
    N = doc_vals.shape[0]
    int8_path = doc_vals.dtype == jnp.int8
    if int8_path and doc_scales is None:
        raise ValueError("int8 doc_vals requires doc_scales")
    k_eff = min(k, N)
    block = max(min(block, N), k_eff)
    rem = (-N) % block
    if rem:
        doc_vals = jnp.pad(doc_vals, ((0, rem), (0, 0)))
        doc_idx = jnp.pad(doc_idx, ((0, rem), (0, 0)))
        if int8_path:
            doc_scales = jnp.pad(doc_scales.astype(jnp.float32), (0, rem))
    Np = doc_vals.shape[0]
    n_blocks = Np // block

    def body(carry, b):
        run_v, run_i = carry
        start = b * block
        vals = jax.lax.dynamic_slice(doc_vals, (start, 0), (block, doc_vals.shape[1]))
        idx = jax.lax.dynamic_slice(doc_idx, (start, 0), (block, doc_idx.shape[1]))
        if int8_path:
            dense_block = _densify_block(vals, idx, vocab)
            scores = jnp.dot(
                q_dense, dense_block.T, preferred_element_type=jnp.int32
            )
            dsc = jax.lax.dynamic_slice(doc_scales, (start,), (block,))
            scores = scores.astype(jnp.float32) * dsc[None, :]
        else:
            dense_block = _densify_block(vals.astype(q_dense.dtype), idx, vocab)
            scores = jnp.dot(
                q_dense, dense_block.T, preferred_element_type=jnp.float32
            )  # [Q, block] on the MXU
        col = start + jax.lax.broadcasted_iota(jnp.int32, (Q, block), 1)
        scores = jnp.where(col < N, scores, -jnp.inf)
        from bergen_tpu.ops.scoring import _block_topk

        v, i = _block_topk(scores, k_eff, method, recall_target)
        gidx = jnp.take_along_axis(col, i, axis=1)
        cat_v = jnp.concatenate([run_v, v], axis=1)
        cat_i = jnp.concatenate([run_i, gidx], axis=1)
        mv, mi = jax.lax.top_k(cat_v, k_eff)
        return (mv, jnp.take_along_axis(cat_i, mi, axis=1)), None

    init = (
        jnp.full((Q, k_eff), -jnp.inf, jnp.float32),
        jnp.zeros((Q, k_eff), jnp.int32),
    )
    if vary_axis is not None:
        init = jax.lax.pcast(init, (vary_axis,), to="varying")
    (vals, idxs), _ = jax.lax.scan(body, init, jnp.arange(n_blocks))
    if k_eff < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=-jnp.inf)
        idxs = jnp.pad(idxs, ((0, 0), (0, k - k_eff)))
    return vals, idxs


@functools.lru_cache(maxsize=None)
def _sharded_sparse_topk_fn(mesh: Mesh, k: int, vocab: int, block: int,
                            method: str, recall_target: float,
                            int8_path: bool = False):
    """jit once per (mesh, k, vocab, block) — see ops.scoring._sharded_topk_fn."""

    def local(q, vals, idx, valid_n, dsc=None):
        shard_n = vals.shape[0]
        di = jax.lax.axis_index("data")
        offset = di * shard_n
        v, i = sparse_topk_blocked(
            q, vals, idx, k, vocab, block=block, vary_axis="data",
            method=method, recall_target=recall_target, doc_scales=dsc,
        )
        gi = i + offset
        v = jnp.where(gi < valid_n, v, -jnp.inf)
        av = jax.lax.all_gather(v, "data", axis=0)
        ai = jax.lax.all_gather(gi, "data", axis=0)
        av = jnp.swapaxes(av, 0, 1).reshape(q.shape[0], -1)
        ai = jnp.swapaxes(ai, 0, 1).reshape(q.shape[0], -1)
        mv, mi = jax.lax.top_k(av, k)
        return mv, jnp.take_along_axis(ai, mi, axis=1)

    if int8_path:
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P(), P("data", None), P("data", None), P(), P("data")),
            out_specs=(P(), P()), check_vma=False,
        )
    else:
        fn = shard_map(
            lambda q, vals, idx, valid_n: local(q, vals, idx, valid_n),
            mesh=mesh,
            in_specs=(P(), P("data", None), P("data", None), P()),
            out_specs=(P(), P()), check_vma=False,
        )
    return jax.jit(fn)


def sharded_sparse_topk(
    mesh: Mesh,
    q_dense: jnp.ndarray,           # [Q, V] f32/bf16 (quantized here for int8)
    doc_vals_sharded: jnp.ndarray,  # [N, nnz] sharded over 'data' on dim 0
    doc_idx_sharded: jnp.ndarray,
    k: int,
    vocab: int,
    block: int = 8192,
    valid_n: int | None = None,
    method: str = "auto",
    recall_target: float = 0.99,
    doc_scales: jnp.ndarray | None = None,  # [N] sharded P('data'), int8 path
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    from bergen_tpu.ops.scoring import quantize_rows_int8

    N = doc_vals_sharded.shape[0]
    total_valid = N if valid_n is None else valid_n
    int8_path = doc_vals_sharded.dtype == jnp.int8
    fn = _sharded_sparse_topk_fn(
        mesh, k, vocab, min(block, N // mesh.shape["data"]),
        method, recall_target, int8_path,
    )
    if int8_path:
        q_i8, q_scale = quantize_rows_int8(jnp.asarray(q_dense, jnp.float32))
        vals, idxs = fn(q_i8, doc_vals_sharded, doc_idx_sharded,
                        jnp.int32(total_valid), doc_scales)
        return vals * q_scale[:, None], idxs
    return fn(q_dense, doc_vals_sharded, doc_idx_sharded,
              jnp.int32(total_valid))


def shard_sparse_corpus(
    mesh: Mesh, vals: np.ndarray, idx: np.ndarray, dtype=jnp.bfloat16
):
    """Host fixed-width corpus → device-resident, doc dim padded to the data
    axis and sharded over it.  dtype=bf16 → (vals_dev, idx_dev, valid_n);
    dtype=int8 → (codes_dev, idx_dev, scales_dev, valid_n) with per-doc
    symmetric quantization (``quantize_sparse_int8``)."""
    n_data = mesh.shape["data"]
    N = vals.shape[0]
    # pad to the fused kernel's bin granularity so these arrays line up
    # row-for-row with a SketchIndex built over the same corpus
    Np = -(-N // (n_data * 128)) * n_data * 128
    int8_path = dtype == jnp.int8
    if int8_path:
        codes, scales = quantize_sparse_int8(vals)
        vals = codes
    if Np != N:
        vals = np.pad(vals, ((0, Np - N), (0, 0)))
        idx = np.pad(idx, ((0, Np - N), (0, 0)))
        if int8_path:
            scales = np.pad(scales, (0, Np - N))
    sharding = NamedSharding(mesh, P("data", None))
    vals_dev = jax.device_put(
        jnp.asarray(vals, dtype=jnp.int8 if int8_path else dtype), sharding
    )
    idx_dev = jax.device_put(jnp.asarray(idx, dtype=jnp.int32), sharding)
    if int8_path:
        scales_dev = jax.device_put(
            jnp.asarray(scales, jnp.float32), NamedSharding(mesh, P("data"))
        )
        return vals_dev, idx_dev, scales_dev, N
    return vals_dev, idx_dev, N
