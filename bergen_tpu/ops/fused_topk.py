"""Fused MIPS scoring + top-k: the Pallas kernel that beats XLA.

The XLA scoring path (``ops.scoring``) must materialise the [Q, N] score
matrix in HBM between the GEMM and the top-k — for 512 queries over a 1M-doc
corpus that is ~2 GB written by the matmul and ~2 GB read back by
``approx_max_k``, and it dominates the scoring time (the GEMM itself is ~2 ms
of int8 MXU work).  XLA cannot fuse a reduction into a dot's epilogue; Pallas
can.  This kernel computes the corpus-block GEMM **transposed** ([docs,
queries] tiles), reduces every 128-doc sublane group to its (max, argmax) in
VMEM, and writes only the [N/128, Q] bin winners — HBM traffic drops to the
corpus read plus a ~16 MB bin array, turning the workload compute-bound.

Recall semantics match ``lax.approx_max_k`` (which performs the same
bin-argmax reduction in hardware): two true top-k docs landing in the same
128-doc bin lose one candidate.  For k=50 over 1M docs (8192 bins) the
expected top-50 overlap is ~0.997 (measured 0.9969 on-chip vs the exact int8
ranking); the pipeline's approx-recall guard (``pipeline/retrieve.py``)
dual-runs periodic query batches against a **host fp32 exact** reference on
every run — the original unquantized embeddings, so both the bin-argmax loss
and the int8/bin quantization error are measured on the live distribution,
never assumed, and a guard trip walks a fallback ladder (exact-over-codes,
then unquantized exact).

Replaces the hot loop of reference ``modules/retrieve.py:147-185``
(per-chunk ``torch.mm`` + ``torch.topk``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BIN = 128  # one lane-group of docs per bin candidate


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pick_block_docs(D: int, itemsize: int) -> int:
    """Corpus VMEM block rows: target ~2 MB per buffered block, floor 1024
    (the bin-group count per block must stay a multiple of 8 sublanes)."""
    rows = (2 << 20) // max(1, D * itemsize)
    rows = max(1024, min(4096, (rows // 1024) * 1024))
    return rows


def quantize_bins_int8(x: np.ndarray, bin_: int = BIN):
    """Symmetric int8 quantization with one shared scale per ``bin_``
    consecutive docs: x[i] ~= codes[i] * scales[i // bin_].

    Within a bin the raw i32 MXU scores are then rank-exact (shared positive
    factor), which lets the fused kernel's binning epilogue stay entirely in
    i32 — the dequant multiply touches only the bin winners.  The cost is
    quantization error for docs whose max|x| is far below the bin max;
    embedding rows have near-uniform norms (exactly uniform under cosine
    similarity) so the error is comparable to per-doc scaling, and the
    pipeline's recall guard verifies it on every run.

    Returns (codes [N, D] int8, scales [ceil(N/bin_)] f32)."""
    N, D = x.shape
    n_bins = _cdiv(N, bin_)
    pad = n_bins * bin_ - N
    xp = np.pad(x.astype(np.float32), ((0, pad), (0, 0)))
    absmax = np.abs(xp).reshape(n_bins, bin_ * D).max(axis=1)
    scales = (absmax / 127.0).astype(np.float32)
    safe = np.where(scales > 0, scales, 1.0)
    codes = np.clip(
        np.round(xp / np.repeat(safe, bin_)[:, None]), -127, 127
    ).astype(np.int8)
    return codes[:N], scales


def supports(D: int, dtype) -> bool:
    """Whether the fused kernel's VMEM budget accommodates this geometry.
    The pallas_call pins vmem_limit_bytes=64 MB; 40 MB of modelled buffer
    use leaves headroom for Mosaic's own temporaries (validated on-chip up
    to D=10240 int8 — the SPLADE slab geometry)."""
    itemsize = 1 if dtype == jnp.int8 else 2
    block = _pick_block_docs(D, itemsize)
    # corpus block (x2 double-buffer) + transposed score tile + query tile
    vmem = 2 * block * D * itemsize + block * 512 * 4 + D * 512 * itemsize
    return vmem < (40 << 20)


_I32_MIN = -(1 << 31) + 1


def _kernel(c_ref, qt_ref, s_ref, valid_ref, vals_ref, idx_ref, *, n_groups,
            block_docs, scale_mode):
    """One corpus block × one query tile.  scale_mode:
      'doc'  — int8 codes, per-DOC dequant: f32 convert+multiply on the full
               [block, TQ] score tile before binning.
      'bin'  — int8 codes, per-BIN (128-doc group) scales: the entire binning
               epilogue stays in i32 (codes within a bin share a scale, so raw
               i32 scores are rank-exact within the bin); the scale multiply
               touches only the [G, TQ] bin winners — ~128x less VPU work.
      'none' — bf16 corpus, f32 scores."""
    j = pl.program_id(0)
    int8_path = scale_mode in ("doc", "bin")
    acc = jnp.int32 if int8_path else jnp.float32
    st = jnp.dot(c_ref[:], qt_ref[:], preferred_element_type=acc)
    base = j * block_docs
    rows = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0) + base
    if scale_mode == "doc":
        st = st.astype(jnp.float32) * s_ref[:]
        st = jnp.where(rows < valid_ref[0, 0], st, -jnp.inf)
        masked_min = -jnp.inf
    elif scale_mode == "bin":
        st = jnp.where(rows < valid_ref[0, 0], st, jnp.int32(_I32_MIN))
        masked_min = jnp.float32(_I32_MIN)
    else:
        st = jnp.where(rows < valid_ref[0, 0], st, -jnp.inf)
        masked_min = -jnp.inf
    for g in range(n_groups):
        sg = st[g * BIN:(g + 1) * BIN, :]
        m = jnp.max(sg, axis=0, keepdims=True)  # [1, TQ]
        row = jax.lax.broadcasted_iota(jnp.int32, sg.shape, 0)
        am = jnp.min(
            jnp.where(sg == m, row, jnp.int32(1 << 30)), axis=0, keepdims=True
        )
        vals_ref[g:g + 1, :] = m.astype(jnp.float32)
        idx_ref[g:g + 1, :] = am + (base + g * BIN)
    if scale_mode == "bin":
        # one vectorised dequant over the [G, TQ] winners; fully-masked bins
        # (raw == I32_MIN) pin to -inf so a zero scale can't promote them
        raw = vals_ref[:]
        vals_ref[:] = jnp.where(
            raw == masked_min, -jnp.inf, raw * s_ref[:]
        )


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_docs", "tile_q", "method", "interpret"),
)
def bin_topk(
    queries: jnp.ndarray,     # [Q, D] — int8 codes when corpus is int8
    corpus: jnp.ndarray,      # [N, D] natural row layout, int8 or bf16
    k: int,
    valid_n: jnp.ndarray | int | None = None,
    doc_scales: jnp.ndarray | None = None,  # int8: [N] per-doc OR [N/128]
                                            # per-bin f32 dequant scales
    block_docs: int | None = None,
    tile_q: int | None = None,
    method: str = "approx",   # stage-2 over bins: 'approx' (TPU) | 'exact'
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused scoring+top-k on one device. Returns ([Q, k] values f32,
    [Q, k] global doc indices i32).  N and D are padded internally; ``valid_n``
    masks trailing pad docs inside the kernel (exact, no overfetch needed).

    int8 ``doc_scales`` granularity is inferred from its length: N entries →
    per-doc dequant (f32 epilogue), N/128 entries → per-bin dequant (i32
    epilogue, ~128x less VPU work — see ``quantize_bins_int8``)."""
    Q, D = queries.shape
    N = corpus.shape[0]
    int8_path = corpus.dtype == jnp.int8
    if int8_path and doc_scales is None:
        raise ValueError("int8 corpus requires doc_scales")
    itemsize = 1 if int8_path else 2
    if block_docs is None:
        block_docs = _pick_block_docs(D, itemsize)
    if tile_q is None:
        tile_q = min(512, _cdiv(Q, 128) * 128)

    valid = jnp.asarray(N if valid_n is None else valid_n, jnp.int32)

    # pad D to lanes, N to block, Q to tile
    Dp = _cdiv(D, 128) * 128
    Np = _cdiv(N, block_docs) * block_docs
    Qp = _cdiv(Q, tile_q) * tile_q
    cp = jnp.pad(corpus, ((0, Np - N), (0, Dp - D)))
    qt = jnp.pad(queries, ((0, Qp - Q), (0, Dp - D))).T  # [Dp, Qp]

    n_groups = block_docs // BIN
    n_bins = Np // BIN
    if not int8_path:
        scale_mode = "none"
        sc = jnp.zeros((n_bins, 1), jnp.float32)  # unused
        s_block = (n_groups, 1)
    elif doc_scales.shape[0] == N:
        scale_mode = "doc"
        sc = jnp.pad(doc_scales.astype(jnp.float32), (0, Np - N))[:, None]
        s_block = (block_docs, 1)
    elif doc_scales.shape[0] * BIN >= N:
        scale_mode = "bin"
        sc = jnp.pad(
            doc_scales.astype(jnp.float32),
            (0, n_bins - doc_scales.shape[0]),
        )[:, None]
        s_block = (n_groups, 1)
    else:
        raise ValueError(
            f"doc_scales length {doc_scales.shape[0]} matches neither per-doc"
            f" ({N}) nor per-bin ({_cdiv(N, BIN)}) granularity"
        )

    grid = (Np // block_docs, Qp // tile_q)  # query tiles innermost: the
    # corpus block (the big operand) is fetched once per j and stays in VMEM
    kern = functools.partial(
        _kernel, n_groups=n_groups, block_docs=block_docs,
        scale_mode=scale_mode,
    )
    bin_vals, bin_idx = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((n_bins, Qp), jnp.float32),
            jax.ShapeDtypeStruct((n_bins, Qp), jnp.int32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_docs, Dp), lambda j, i: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Dp, tile_q), lambda j, i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(s_block, lambda j, i: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                pl.BlockSpec((n_groups, tile_q), lambda j, i: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_groups, tile_q), lambda j, i: (j, i),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * Dp * Np, transcendentals=0,
            bytes_accessed=Np * Dp * itemsize + Dp * Qp * itemsize
            + n_bins * Qp * 8,
        ),
        # wide-D corpora (the SPLADE slab, D ~ 10k) need ~28 MB of VMEM for
        # the double-buffered corpus block — above Mosaic's default budget
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(cp, qt, sc, valid[None, None])

    bv = bin_vals.T[:Q]  # [Q, n_bins]
    bi = bin_idx.T[:Q]
    k_eff = min(k, n_bins)
    if method == "approx" and not interpret and n_bins > 4096:
        v, pos = jax.lax.approx_max_k(bv, k_eff, recall_target=0.99)
    else:
        v, pos = jax.lax.top_k(bv, k_eff)
    idx = jnp.take_along_axis(bi, pos, axis=1)
    if k_eff < k:
        v = jnp.pad(v, ((0, 0), (0, k - k_eff)), constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)))
    return v, idx


# --------------------------------------------------------------------------- #
# Exact top-k over the row layout (recall-guard reference path)
# --------------------------------------------------------------------------- #


@functools.partial(jax.jit, static_argnames=("k", "block"))
def exact_topk_rows(
    queries: jnp.ndarray,   # [Q, D] (int8 codes when corpus int8)
    corpus: jnp.ndarray,    # [N, D] row layout
    k: int,
    valid_n: jnp.ndarray | int | None = None,
    doc_scales: jnp.ndarray | None = None,
    block: int = 1 << 17,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bitwise-exact streaming top-k over row-layout corpus shards.  Used by
    the pipeline's approx-recall guard to verify the fused kernel on the live
    embedding distribution (same role as ``scoring.topk_blocked`` with
    method='exact', but sharing the fused path's [N, D] resident layout)."""
    Q, D = queries.shape
    N = corpus.shape[0]
    k_eff = min(k, N)
    block = max(min(block, N), k_eff)
    valid = jnp.asarray(N if valid_n is None else valid_n, jnp.int32)
    int8_path = corpus.dtype == jnp.int8

    nb = _cdiv(N, block)
    Np = nb * block
    cp = jnp.pad(corpus, ((0, Np - N), (0, 0)))
    sc = (jnp.pad(doc_scales.astype(jnp.float32), (0, Np - N))
          if int8_path else jnp.zeros((Np,), jnp.float32))

    def body(carry, b):
        start = b * block
        chunk = jax.lax.dynamic_slice(cp, (start, 0), (block, D))
        if int8_path:
            s = jnp.einsum("qd,nd->qn", queries, chunk,
                           preferred_element_type=jnp.int32)
            dsc = jax.lax.dynamic_slice(sc, (start,), (block,))
            s = s.astype(jnp.float32) * dsc[None, :]
        else:
            s = jnp.einsum("qd,nd->qn", queries, chunk,
                           preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + start
        s = jnp.where(col < valid, s, -jnp.inf)
        v, i = jax.lax.top_k(s, k_eff)
        run_v, run_i = carry
        cat_v = jnp.concatenate([run_v, v], axis=1)
        cat_i = jnp.concatenate([run_i, i + start], axis=1)
        mv, mi = jax.lax.top_k(cat_v, k_eff)
        return (mv, jnp.take_along_axis(cat_i, mi, axis=1)), None

    init = (
        jnp.full((Q, k_eff), -jnp.inf, jnp.float32),
        jnp.zeros((Q, k_eff), jnp.int32),
    )
    (vals, idxs), _ = jax.lax.scan(body, init, jnp.arange(nb))
    if k_eff < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)),
                       constant_values=-jnp.inf)
        idxs = jnp.pad(idxs, ((0, 0), (0, k - k_eff)))
    return vals, idxs


@functools.lru_cache(maxsize=None)
def _sharded_exact_fn(mesh: Mesh, k: int, int8_path: bool):
    def local(q, shard, valid_n, dsc):
        shard_n = shard.shape[0]
        di = jax.lax.axis_index("data")
        offset = di * shard_n
        local_valid = jnp.clip(valid_n - offset, 0, shard_n)
        v, i = exact_topk_rows(q, shard, k, valid_n=local_valid,
                               doc_scales=dsc)
        gi = i + offset
        av = jax.lax.all_gather(v, "data", axis=0)
        ai = jax.lax.all_gather(gi, "data", axis=0)
        av = jnp.swapaxes(av, 0, 1).reshape(q.shape[0], -1)
        ai = jnp.swapaxes(ai, 0, 1).reshape(q.shape[0], -1)
        mv, mi = jax.lax.top_k(av, k)
        return mv, jnp.take_along_axis(ai, mi, axis=1)

    if int8_path:
        fn = shard_map(local, mesh=mesh,
                       in_specs=(P(), P("data", None), P(), P("data")),
                       out_specs=(P(), P()), check_vma=False)
    else:
        fn = shard_map(lambda q, s, v: local(q, s, v, None), mesh=mesh,
                       in_specs=(P(), P("data", None), P()),
                       out_specs=(P(), P()), check_vma=False)
    return jax.jit(fn)


def sharded_exact_topk_rows(mesh, queries, corpus_rows, k, valid_n=None,
                            doc_scales=None):
    """Distributed exact top-k on the row layout (the guard's reference)."""
    from bergen_tpu.ops.scoring import quantize_rows_int8

    N = corpus_rows.shape[0]
    total_valid = N if valid_n is None else valid_n
    int8_path = corpus_rows.dtype == jnp.int8
    fn = _sharded_exact_fn(mesh, k, int8_path)
    if int8_path:
        q_i8, q_scale = quantize_rows_int8(jnp.asarray(queries, jnp.float32))
        vals, idxs = fn(q_i8, corpus_rows, jnp.int32(total_valid), doc_scales)
        return vals * q_scale[:, None], idxs
    q = jnp.asarray(queries, corpus_rows.dtype)
    return fn(q, corpus_rows, jnp.int32(total_valid))


# --------------------------------------------------------------------------- #
# Multi-chip: corpus rows sharded over the mesh 'data' axis, ICI merge
# --------------------------------------------------------------------------- #


@functools.lru_cache(maxsize=None)
def _sharded_fn(mesh: Mesh, k: int, method: str, int8_path: bool,
                interpret: bool):
    n_data = mesh.shape["data"]

    def local(q, shard, valid_n, dsc):
        shard_n = shard.shape[0]
        di = jax.lax.axis_index("data")
        offset = di * shard_n
        local_valid = jnp.clip(valid_n - offset, 0, shard_n)
        v, i = bin_topk(q, shard, k, valid_n=local_valid, doc_scales=dsc,
                        method=method, interpret=interpret)
        gi = i + offset
        av = jax.lax.all_gather(v, "data", axis=0)   # [n_data, Q, k]
        ai = jax.lax.all_gather(gi, "data", axis=0)
        av = jnp.swapaxes(av, 0, 1).reshape(q.shape[0], -1)
        ai = jnp.swapaxes(ai, 0, 1).reshape(q.shape[0], -1)
        mv, mi = jax.lax.top_k(av, k)
        return mv, jnp.take_along_axis(ai, mi, axis=1)

    if int8_path:
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P(), P("data", None), P(), P("data")),
            out_specs=(P(), P()), check_vma=False,
        )
    else:
        fn = shard_map(
            lambda q, shard, valid_n: local(q, shard, valid_n, None),
            mesh=mesh, in_specs=(P(), P("data", None), P()),
            out_specs=(P(), P()), check_vma=False,
        )
    return jax.jit(fn)


def sharded_bin_topk(
    mesh: Mesh,
    queries: jnp.ndarray,          # [Q, D] f32/bf16 (quantized here for int8)
    corpus_rows: jnp.ndarray,      # [N, D] sharded P('data', None)
    k: int,
    valid_n: int | None = None,
    doc_scales: jnp.ndarray | None = None,  # [N] sharded P('data')
    method: str = "approx",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed fused top-k: per-device fused kernel + one [Q, k]
    all-gather merge over ICI (same merge as ``scoring.sharded_topk``)."""
    from bergen_tpu.ops.scoring import quantize_rows_int8

    N = corpus_rows.shape[0]
    total_valid = N if valid_n is None else valid_n
    int8_path = corpus_rows.dtype == jnp.int8
    fn = _sharded_fn(mesh, k, method, int8_path, interpret)
    if int8_path:
        q_i8, q_scale = quantize_rows_int8(jnp.asarray(queries, jnp.float32))
        vals, idxs = fn(q_i8, corpus_rows, jnp.int32(total_valid), doc_scales)
        return vals * q_scale[:, None], idxs
    q = jnp.asarray(queries, corpus_rows.dtype)
    return fn(q, corpus_rows, jnp.int32(total_valid))


def shard_corpus_rows(mesh: Mesh, corpus: np.ndarray, dtype=jnp.int8,
                      granularity: str = "bin"):
    """Host [N, D] → device-resident row-layout shards over the mesh 'data'
    axis (the fused kernel's layout — contrast ``scoring.shard_corpus`` which
    stores transposed [D, N] for the XLA dot path).

    dtype=int8 → (codes [N', D], scales, per_doc_scales, valid_n) where
    ``scales`` is per-bin ([N'/128], granularity='bin', the fused kernel's
    fast path) or per-doc ([N']), and ``per_doc_scales`` is always the [N']
    expansion (what ``exact_topk_rows`` — the recall guard — consumes).
    dtype=bf16/f32 → (rows, valid_n).
    """
    from bergen_tpu.ops.scoring import quantize_rows_int8

    n_data = mesh.shape["data"]
    N, D = corpus.shape
    Np = _cdiv(N, n_data * BIN) * n_data * BIN
    if dtype == jnp.int8:
        rows = np.zeros((Np, D), dtype=np.int8)
        if granularity == "bin":
            codes, scales = quantize_bins_int8(corpus.astype(np.float32))
            sc = np.zeros((Np // BIN,), dtype=np.float32)
            sc[: scales.shape[0]] = scales
            per_doc = np.repeat(sc, BIN)
        else:
            codes, scales = quantize_rows_int8(corpus.astype(np.float32))
            sc = np.zeros((Np,), dtype=np.float32)
            sc[:N] = scales
            per_doc = sc
        rows[:N] = codes
        arr = jax.device_put(
            jnp.asarray(rows), NamedSharding(mesh, P("data", None))
        )
        sc_dev = jax.device_put(jnp.asarray(sc), NamedSharding(mesh, P("data")))
        pd_dev = jax.device_put(
            jnp.asarray(per_doc), NamedSharding(mesh, P("data"))
        )
        return arr, sc_dev, pd_dev, N
    rows = np.zeros((Np, D), dtype=np.float32)
    rows[:N] = corpus
    arr = jax.device_put(
        jnp.asarray(rows, dtype=dtype), NamedSharding(mesh, P("data", None))
    )
    return arr, N
