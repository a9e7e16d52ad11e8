"""Weight-streaming packed-int4 matmul (Pallas) — the kernel that makes
4-bit weights FAST instead of merely small.

Why: weight-only int4 through plain XLA dequantizes the whole bf16 weight
matrix into HBM every decode step (measured on-chip: 1,476 tok/s vs 8,383
for w8a8 at TinyLlama dims — documentation/performance.md "true int4"): the
dequant is a standalone fusion whose [K, N] bf16 output cannot fuse into the
MXU matmul, so each step reads 0.55 GB of nibbles but writes + re-reads
~4.4 GB of bf16.  This kernel unpacks nibbles **in VMEM**: HBM weight
traffic is the packed bytes only — HALF of w8a8's int8 reads — which is the
like-for-like stand-in for the reference's default 4-bit small-model mode
(reference ``models/generators/llm.py:94-121`` via bitsandbytes).

Layout contract (``convert.quantize_tree_int4(packed=True)``):
  ``wp[i, n]`` holds original row ``2i`` in the low nibble and ``2i+1`` in
  the high nibble; ``scales[g, n]`` covers original rows
  ``[g*group, (g+1)*group)``.

The kernel never interleaves rows back together.  With
``x_even = x[:, 0::2]`` and ``x_odd = x[:, 1::2]`` (strided slices built by
XLA outside the kernel),

    y = x_even @ unpack_lo(wp) + x_odd @ unpack_hi(wp)

so both unpacked tiles feed the MXU in packed-row order.  Nibble extraction
is two arithmetic int8 shifts (sign-extending); dequant multiplies the bf16
tile by its group's scale row — all VPU work on VMEM-resident tiles,
overlapped with the next tile's DMA by the Pallas pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _choose_block(total: int, unit: int, cap: int) -> int:
    """Largest multiple of `unit` that divides `total` and is <= cap."""
    best = 0
    b = unit
    while b <= min(total, cap):
        if total % b == 0:
            best = b
        b += unit
    return best


def _kernel(xe_ref, xo_ref, wp_ref, s_ref, out_ref, *, groups_per_blk,
            cdt=jnp.bfloat16):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Widen to i32 before the nibble shifts: Mosaic has no i8 vector
    # shift lowering (arith.shli on vector<i8> aborts), and the VPU
    # works in 32-bit lanes anyway — the widening is register-only.
    w = wp_ref[:].astype(jnp.int32)                # [KBh, NB] packed bytes
    # sign-extending nibble unpack: low = (b << 28) >> 28, high = b >> 4
    # (the byte arrived sign-extended, so bit 7 == the high nibble's sign)
    lo = jnp.right_shift(jnp.left_shift(w, 28), 28)
    hi = jnp.right_shift(w, 4)
    KBh, NB = w.shape
    rp = KBh // groups_per_blk                     # packed rows per group
    # s_ref holds ALL n_groups scale rows (a Mosaic block's sublane dim must
    # be 8-aligned or full — GB is often 4).  Select this k-block's GB rows
    # with a one-hot matmul: static shapes, no dynamic sublane slice.
    s_full = s_ref[:]                              # [n_groups, NB] f32
    n_groups = s_full.shape[0]
    GB = groups_per_blk
    rows = jax.lax.broadcasted_iota(jnp.int32, (GB, n_groups), 0) + k * GB
    cols = jax.lax.broadcasted_iota(jnp.int32, (GB, n_groups), 1)
    sel = (rows == cols).astype(jnp.float32)       # [GB, n_groups] one-hot
    sb = jnp.dot(sel, s_full,
                 preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    # packed row i belongs to group i // (group/2) for BOTH nibbles (the
    # group size is even, so rows 2i and 2i+1 share a group).  Dequant in
    # bf16 exactly like the XLA path (convert.dequantize_int4 with bf16
    # activations); `cdt` only lifts the DOT inputs to f32 in interpret
    # mode, where the CPU thunk can't do bf16 x bf16 = f32.
    wl = (lo.astype(jnp.bfloat16).reshape(groups_per_blk, rp, NB)
          * sb[:, None, :]).reshape(KBh, NB).astype(cdt)
    wh = (hi.astype(jnp.bfloat16).reshape(groups_per_blk, rp, NB)
          * sb[:, None, :]).reshape(KBh, NB).astype(cdt)
    acc = jnp.dot(xe_ref[:], wl, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(xo_ref[:], wh, preferred_element_type=jnp.float32)
    out_ref[:] += acc


def supports(K: int, N: int, n_groups: int, block_n: int = 512,
             block_k: int = 512) -> bool:
    """Static shape envelope of the kernel (callers fall back to the XLA
    dequant path outside it)."""
    if K % 2 or K % n_groups:
        return False
    group = K // n_groups
    if group % 2:
        return False
    kb = _choose_block(K, max(group, 2), block_k)
    nb = _choose_block(N, 128, block_n)
    # xe/xo blocks are [MB, kb/2]: the lane dim kb/2 must be 128-aligned
    # unless it spans the whole packed array (kb == K)
    return kb >= group and nb > 0 and (kb == K or (kb // 2) % 128 == 0)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "interpret"),
)
def matmul_int4_packed(
    x: jnp.ndarray,        # [M, K] bf16/f32 activations
    wp: jnp.ndarray,       # [K//2, N] int8 packed nibbles
    scales: jnp.ndarray,   # [K//group, N] f32 group scales
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = x @ dequant(wp, scales) with nibbles unpacked in VMEM.  Returns
    f32 [M, N].  Matches the XLA path's bf16 dequant numerics (bf16 tile *
    bf16 scale, f32 accumulation); the even/odd dot split only reorders the
    f32 accumulation."""
    M, K = x.shape
    K2, N = wp.shape
    n_groups = scales.shape[0]
    if K2 * 2 != K:
        raise ValueError(f"packed rows {K2} != K/2 (K={K})")
    group = K // n_groups
    KB = _choose_block(K, max(group, 2), block_k)
    NB = _choose_block(N, 128, block_n)
    if KB < group or NB == 0:
        raise ValueError(
            f"unsupported int4 kernel shapes K={K} N={N} group={group}; "
            "gate calls with int4_matmul.supports()"
        )
    GB = KB // group                # groups per k-block
    KBh = KB // 2                   # packed rows per k-block
    if KB != K and KBh % 128:
        raise ValueError(
            f"packed k-block {KBh} not lane-aligned (K={K} KB={KB}); "
            "gate calls with int4_matmul.supports()"
        )

    # interpret mode (CPU tests): the CPU dot thunk can't do bf16xbf16=f32
    cdt = jnp.float32 if interpret else jnp.bfloat16
    xb = x.astype(jnp.bfloat16).astype(cdt)  # bf16 rounding either way
    xe, xo = xb[:, 0::2], xb[:, 1::2]              # [M, K/2] each
    # pad the row dim to the block geometry (zeros contribute nothing)
    if M > block_m:
        MB = block_m
        Mp = pl.cdiv(M, MB) * MB
    else:
        MB = Mp = max(16, ((M + 15) // 16) * 16)
    if Mp != M:
        pad = ((0, Mp - M), (0, 0))
        xe = jnp.pad(xe, pad)
        xo = jnp.pad(xo, pad)

    grid = (Mp // MB, N // NB, K // KB)
    out = pl.pallas_call(
        functools.partial(_kernel, groups_per_blk=GB, cdt=cdt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((MB, KBh), lambda m, n, k: (m, k)),
            pl.BlockSpec((MB, KBh), lambda m, n, k: (m, k)),
            pl.BlockSpec((KBh, NB), lambda m, n, k: (k, n)),
            # full group axis every block: a (GB, NB) block would need GB
            # % 8 == 0 (Mosaic sublane rule) and GB is typically 4; scales
            # are tiny (n_groups <= K/2 rows) so reloading all rows per
            # (n, k) step costs ~nothing and the kernel one-hot-selects
            pl.BlockSpec((n_groups, NB), lambda m, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((MB, NB), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xe, xo, wp, scales)
    return out[:M]
