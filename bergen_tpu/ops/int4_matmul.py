"""Weight-streaming packed-int4 matmul (Pallas) — the kernel that makes
4-bit weights FAST instead of merely small.

Why: weight-only int4 through plain XLA dequantizes the whole bf16 weight
matrix into HBM every decode step (measured on-chip: 1,476 tok/s vs 8,383
for w8a8 at TinyLlama dims — documentation/performance.md "true int4"): the
dequant is a standalone fusion whose [K, N] bf16 output cannot fuse into the
MXU matmul, so each step reads 0.55 GB of nibbles but writes + re-reads
~4.4 GB of bf16.  This kernel keeps HBM weight traffic at the packed bytes
only — HALF of w8a8's int8 reads — which is the like-for-like stand-in for
the reference's default 4-bit small-model mode (reference
``models/generators/llm.py:94-121`` via bitsandbytes).

**Dot-identity form** (round 4): the round-3 kernel unpacked both nibbles
and applied group scales to the weight tiles in VMEM — ~8 VPU ops per byte,
which measured 3.8x slower than the dots it fed (24 us vs 6.3 us for the
[32, 2048] x [2048, 5632] decode projection, on chip).  The nibble dots are
instead recovered algebraically from TWO byte-valued MXU operands.  With the
pack encoding ``u = 16*(hi - m) + (lo mod 16)`` where ``m = (lo < 0)``
(``convert.quantize_tree_int4(packed=True)``):

    wsh := (u << 4) wrapped to int8  == 16 * lo          (exactly)
    dot(x, u)  == 16*dot(x, hi) + dot(x, lo)             (m cancels)

so with ``xe = x[:, 0::2]`` and ``xo = x[:, 1::2]`` (the low nibble holds
even original rows, the high odd rows), the per-group output is

    y_g = s_g * ( dot(xe, lo) + dot(xo, hi) )
        = (dot(xe, wsh) + dot(xo, u)) * s_g/16  -  dot(xo, wsh) * s_g/256

Per byte the VPU does one i32 widen, two shifts, and two bf16 casts — the
unpack-multiply work (sign-extend both nibbles, two scale multiplies) is
gone, replaced by three small per-group MXU dots and an O(M x N) epilogue.
Group scales apply to dot OUTPUTS, which is what makes the identity usable
with group-wise quantization.  The operands are exact small integers in
bf16 (|u| <= 127, |wsh| <= 112 — both within bf16's 8-bit mantissa), so
with integer activations and unit scales the kernel is bitwise exact
(tests/test_int4_matmul.py), and with real activations it is *more*
accurate than the XLA path (no bf16 rounding of dequantized weights).

Layout contract (``convert.quantize_tree_int4(packed=True)``):
  ``wp[i, n]`` holds original row ``2i`` in the low nibble and ``2i+1`` in
  the high nibble (dot-identity encoding); ``scales[g, n]`` covers original
  rows ``[g*group, (g+1)*group)``.
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

    # Widen to i32 before the nibble shift: Mosaic has no i8/i16 vector
    # shift lowering (arith.shli on narrow vectors aborts), and the VPU
    # works in 32-bit lanes anyway — the widening is register-only.
    w32 = wp_ref[:].astype(jnp.int32)              # [KBh, NB] packed bytes
    # wsh = (u << 4) wrapped to a signed byte == 16 * lo, exactly:
    # (w << 28) >> 24 keeps the low nibble, sign-extends it, scales by 16
    wsh = jnp.right_shift(jnp.left_shift(w32, 28), 24).astype(cdt)
    wb = w32.astype(cdt)                           # the byte value itself
    KBh, NB = wsh.shape
    GB = groups_per_blk
    rp = KBh // GB                                 # packed rows per group
    # s_ref is this k-block's scale block, padded to 8 sublanes by the host
    # (the round-3 kernel one-hot-MATMULED the rows out of the full scale
    # array instead — but Mosaic f32 matmuls round through bf16 passes,
    # which quietly cost the scales ~3 mantissa bits; measured 0.33 max
    # abs error vs the f32 reference at the gate shape, vs ~1e-3 now)
    sb = s_ref[:GB]                                # [GB, NB] f32, exact
    sb16 = sb * (1.0 / 16.0)
    sb256 = sb * (1.0 / 256.0)
    acc = jnp.zeros_like(out_ref)
    for g in range(GB):
        sl = slice(g * rp, (g + 1) * rp)
        dse = jnp.dot(xe_ref[:, sl], wsh[sl],
                      preferred_element_type=jnp.float32)  # 16*dot(xe, lo)
        dso = jnp.dot(xo_ref[:, sl], wsh[sl],
                      preferred_element_type=jnp.float32)  # 16*dot(xo, lo)
        d1 = jnp.dot(xo_ref[:, sl], wb[sl],
                     preferred_element_type=jnp.float32)
        acc = acc + ((dse + d1) * sb16[g][None, :] - dso * sb256[g][None, :])
    out_ref[:] += acc


def _kernel_stacked(xs_ref, xo_ref, wp_ref, s_ref, out_ref, *,
                    groups_per_blk, cdt=jnp.bfloat16):
    """Stacked-rows form of ``_kernel``: the caller stacks ``[xe; xo]`` on
    the row axis, so ``dot(xs, wsh)`` yields BOTH ``16*dot(xe, lo)`` and
    ``16*dot(xo, lo)`` in one MXU dispatch — 2 dots per group instead of 3,
    and each dot carries 2x the rows (M=32 decode fills 64 of the MXU's 128
    rows instead of 32).  Same algebra, same outputs."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w32 = wp_ref[:].astype(jnp.int32)
    wsh = jnp.right_shift(jnp.left_shift(w32, 28), 24).astype(cdt)
    wb = w32.astype(cdt)
    KBh, NB = wsh.shape
    GB = groups_per_blk
    rp = KBh // GB
    sb = s_ref[:GB]
    sb16 = sb * (1.0 / 16.0)
    sb256 = sb * (1.0 / 256.0)
    MB = xo_ref.shape[0]
    acc = jnp.zeros_like(out_ref)
    for g in range(GB):
        sl = slice(g * rp, (g + 1) * rp)
        dsh = jnp.dot(xs_ref[:, sl], wsh[sl],
                      preferred_element_type=jnp.float32)  # [2MB, NB]
        d1 = jnp.dot(xo_ref[:, sl], wb[sl],
                     preferred_element_type=jnp.float32)
        acc = acc + ((dsh[:MB] + d1) * sb16[g][None, :]
                     - dsh[MB:] * sb256[g][None, :])
    out_ref[:] += acc


def _kernel_duo(xe_ref, xo_ref, wp_ref, s_ref, out_ref, *, groups_per_blk,
                cdt=jnp.bfloat16):
    """Two dots per group via the rebalanced identity

        dot(xe, lo) + dot(xo, hi) = [dot(xe - xo/16, wsh) + dot(xo, u)] / 16

    (substitute wsh = 16*lo and u = 16*hi + lo: the dot(xo, lo) terms
    cancel).  Versus ``_kernel`` this removes the third dot outright —
    the disentangling moves into the activation operand (one fused VPU
    multiply-subtract over [MB, KBh]) instead of a third MXU dispatch.
    Exactness: xe - xo/16 is exactly representable in bf16 for the
    integer parity tests (|xe| <= 8 plus a 4-bit fraction fits bf16's
    8 mantissa bits), so the bitwise-exact test regime is preserved."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w32 = wp_ref[:].astype(jnp.int32)
    wsh = jnp.right_shift(jnp.left_shift(w32, 28), 24).astype(cdt)
    wb = w32.astype(cdt)
    KBh, NB = wsh.shape
    GB = groups_per_blk
    rp = KBh // GB
    sb = s_ref[:GB]
    sb16 = sb * (1.0 / 16.0)
    xo = xo_ref[:]
    xa = (xe_ref[:].astype(jnp.float32)
          - xo.astype(jnp.float32) * (1.0 / 16.0)).astype(cdt)
    acc = jnp.zeros_like(out_ref)
    for g in range(GB):
        sl = slice(g * rp, (g + 1) * rp)
        da = jnp.dot(xa[:, sl], wsh[sl],
                     preferred_element_type=jnp.float32)
        db = jnp.dot(xo[:, sl], wb[sl],
                     preferred_element_type=jnp.float32)
        acc = acc + (da + db) * sb16[g][None, :]
    out_ref[:] += acc


def _kernel_mono(x2_ref, wp_ref, s_ref, out_ref, *, groups_per_blk,
                 cdt=jnp.bfloat16):
    """ONE dot per group at full ``group`` depth: the same rebalanced
    identity as ``_kernel_duo``, with the two dots fused by concatenating
    operands along K — ``dot([xe - xo/16 ; xo], [wsh ; u])``.  The host
    pre-interleaves the activation side per group (O(M*K), trivial at
    decode M); the kernel concatenates the two byte forms per group
    ([wsh_g ; u_g], a sublane-blocked copy).  A k-block of 4 groups is 4
    MXU dots of [M, group] x [group, NB] instead of 12 of [M, group/2]."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w32 = wp_ref[:].astype(jnp.int32)
    wsh = jnp.right_shift(jnp.left_shift(w32, 28), 24).astype(cdt)
    wb = w32.astype(cdt)
    KBh, NB = wsh.shape
    GB = groups_per_blk
    rp = KBh // GB
    sb = s_ref[:GB]
    sb16 = sb * (1.0 / 16.0)
    # [GB, 2*rp, NB]: rows [wsh_g ; u_g] per group
    w2 = jnp.concatenate(
        [wsh.reshape(GB, rp, NB), wb.reshape(GB, rp, NB)], axis=1
    )
    g2 = 2 * rp
    acc = jnp.zeros_like(out_ref)
    for g in range(GB):
        d = jnp.dot(x2_ref[:, g * g2:(g + 1) * g2], w2[g],
                    preferred_element_type=jnp.float32)
        acc = acc + d * sb16[g][None, :]
    out_ref[:] += acc


def _valid_kb(K: int, group: int, cap: int) -> int:
    """Largest k-block <= cap dividing K that satisfies the kernel's lane
    rule (KB == K, or the packed half-block 128-aligned)."""
    best = 0
    unit = max(group, 2)
    b = unit
    while b <= min(K, cap):
        if K % b == 0 and (b == K or (b // 2) % 128 == 0):
            best = b
        b += unit
    return best


def _auto_nb(N: int, KBh: int, mb: int = 32, budget: int = 8 << 20,
             per: int = 5, total_cap: int = 13 << 20) -> int:
    """Largest n-block dividing N (multiple of 128) whose in-kernel VMEM
    footprint fits: the weight-side blocks (packed bytes + two unpacked
    bf16 planes, ~5 bytes per packed element) under ``budget`` — the knob
    the on-chip block tune calibrated — AND the whole block set (adding
    the f32 out block, its accumulator, and the two activation blocks, all
    of which scale with the m-block) under ``total_cap``.  The second cap
    only binds at prefill m-blocks: decode (MB=32) keeps the tuned
    geometries bit-identical, while MB=256 prefill calls get narrower
    n-blocks — the round-5 chip bundle OOMed the 16 MB scoped-vmem limit
    by 128 KB at M=8192, N=32000 because out/acc were unbudgeted."""
    best = 0
    x_bytes = 4 * mb * KBh  # xe + xo bf16 blocks
    b = 128
    while b <= N:
        if (N % b == 0 and per * KBh * b <= budget
                and (per * KBh + 8 * mb) * b + x_bytes <= total_cap):
            best = b
        b += 128
    return best


def _auto_config(K: int, N: int, group: int, mb: int = 32):
    """(form, block_n, block_k) per projection shape, encoding the on-chip
    block tune (documentation/evidence/int4_block_tune*.json, TPU v5e,
    decode M=32).  The round-4 default (3dot @ 512x512) paid ~3x its time
    in grid-step overhead on large-N shapes (the TinyLlama head ran 500
    grid steps at 18% of its HBM roofline); deep-K / wide-N blocks under
    an ~8 MB VMEM temp budget recover it:

    * tiny N (kv projections): the smallest geometry wins — ``mono``
      @ 512x512 (one full-depth dot per group, one grid step);
    * huge N (lm_head): wide-N narrow-K — ``duo`` @ e.g. 6400x512
      measured 0.0686 ms vs 0.2253 for the round-4 form (w8a8: 0.0884);
    * everything else: ``duo`` with the deepest aligned k-block <= 3072
      and the widest budget-fitting n-block (gate 0.0147 vs 0.0243,
      q 0.0071 vs 0.0132 — q now beats w8a8's 0.0090)."""
    if N <= 512:
        return "mono", 512, 512
    if N >= 16384:
        kb = _valid_kb(K, group, 512)
        if kb:
            nb = _auto_nb(N, kb // 2, mb)
            if nb >= 1024:
                return "duo", nb, kb
    kb = _valid_kb(K, group, 3072)
    nb = _auto_nb(N, kb // 2, mb) if kb else 0
    if kb == 0 or nb == 0:
        return "duo", 512, 512
    return "duo", nb, kb


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
    static_argnames=("block_m", "block_n", "block_k", "interpret", "stacked",
                     "form"),
)
def matmul_int4_packed(
    x: jnp.ndarray,        # [M, K] bf16/f32 activations
    wp: jnp.ndarray,       # [K//2, N] int8 packed nibbles
    scales: jnp.ndarray,   # [K//group, N] f32 group scales
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
    stacked: bool = False,
    form: str | None = None,  # "3dot" | "stacked" | "duo" | "mono"
) -> jnp.ndarray:
    """y = x @ dequant(wp, scales) via the dot-identity (see module doc).
    Returns f32 [M, N].  Activations are rounded to bf16 like the XLA bf16
    path; group scales apply to f32 dot outputs (slightly MORE accurate
    than the XLA path's bf16 weight rounding).

    ``form`` selects the kernel body (all four compute the same algebra;
    parity is tested for each):

    * ``"auto"`` (the default) — pick form AND block sizes per shape from
      the on-chip block tune (``_auto_config``); overrides block_n/block_k.
    * ``"3dot"``  — round-4 shipped form: 3 dots of [M, group/2] per group.
    * ``"stacked"`` — 2 dots per group, one carrying [2M] rows.
    * ``"duo"``   — 2 dots of [M, group/2] per group via the rebalanced
      identity (the disentangling rides the activation operand).
    * ``"mono"``  — 1 dot of [M, group] per group (operands concatenated
      along K): fewest MXU dispatches, at full ``group`` dot depth.

    ``stacked=True`` is the legacy spelling of ``form="stacked"``."""
    M, K = x.shape
    K2, N = wp.shape
    n_groups = scales.shape[0]
    if K2 * 2 != K:
        raise ValueError(f"packed rows {K2} != K/2 (K={K})")
    group = K // n_groups
    if form is None:
        form = "stacked" if stacked else "auto"
    if form == "auto":
        mb_eff = block_m if M > block_m else max(16, ((M + 15) // 16) * 16)
        form, block_n, block_k = _auto_config(K, N, group, mb_eff)
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

    # interpret mode (CPU tests): the CPU dot thunk can't do bf16xbf16=f32;
    # f32 operands keep the identity exact (small integers)
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

    # pad each k-block's GB scale rows to 8 (Mosaic sublane rule) so the
    # kernel reads its scale block DIRECTLY — [nkb * 8, N], exact f32
    nkb = K // KB
    GBp = ((GB + 7) // 8) * 8
    s3 = scales.reshape(nkb, GB, N)
    if GBp != GB:
        s3 = jnp.pad(s3, ((0, 0), (0, GBp - GB), (0, 0)))
    s_pad = s3.reshape(nkb * GBp, N)

    if form == "mono" and not (KB == K or KB % 128 == 0):
        form = "duo"  # mono's x2 lane dim is KB; fall back when unaligned

    grid = (Mp // MB, N // NB, K // KB)
    compiler_params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    if form == "mono":
        # host-side per-group interleave of the activation operand:
        # X2[:, g*group:(g+1)*group] = [xe_g - xo_g/16 ; xo_g]
        G = K // group
        rp = group // 2
        xa = (xe.astype(jnp.float32)
              - xo.astype(jnp.float32) * (1.0 / 16.0)).astype(cdt)
        x2 = jnp.stack(
            [xa.reshape(Mp, G, rp), xo.reshape(Mp, G, rp)], axis=2
        ).reshape(Mp, K)
        out = pl.pallas_call(
            functools.partial(_kernel_mono, groups_per_blk=GB, cdt=cdt),
            grid=grid,
            in_specs=[
                pl.BlockSpec((MB, KB), lambda m, n, k: (m, k)),
                pl.BlockSpec((KBh, NB), lambda m, n, k: (k, n)),
                pl.BlockSpec((GBp, NB), lambda m, n, k: (k, n)),
            ],
            out_specs=pl.BlockSpec((MB, NB), lambda m, n, k: (m, n)),
            out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
            compiler_params=compiler_params,
            interpret=interpret,
        )(x2, wp, s_pad)
        return out[:M]
    if form == "duo":
        out = pl.pallas_call(
            functools.partial(_kernel_duo, groups_per_blk=GB, cdt=cdt),
            grid=grid,
            in_specs=[
                pl.BlockSpec((MB, KBh), lambda m, n, k: (m, k)),
                pl.BlockSpec((MB, KBh), lambda m, n, k: (m, k)),
                pl.BlockSpec((KBh, NB), lambda m, n, k: (k, n)),
                pl.BlockSpec((GBp, NB), lambda m, n, k: (k, n)),
            ],
            out_specs=pl.BlockSpec((MB, NB), lambda m, n, k: (m, n)),
            out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
            compiler_params=compiler_params,
            interpret=interpret,
        )(xe, xo, wp, s_pad)
        return out[:M]
    if form == "stacked":
        # interleave per m-block so row-block m of xs is [xe_m; xo_m]:
        # one dot computes both lo-dots (see _kernel_stacked)
        nm = Mp // MB
        xs = jnp.concatenate(
            [xe.reshape(nm, MB, K2), xo.reshape(nm, MB, K2)], axis=1
        ).reshape(2 * Mp, K2)
        out = pl.pallas_call(
            functools.partial(_kernel_stacked, groups_per_blk=GB, cdt=cdt),
            grid=grid,
            in_specs=[
                pl.BlockSpec((2 * MB, KBh), lambda m, n, k: (m, k)),
                pl.BlockSpec((MB, KBh), lambda m, n, k: (m, k)),
                pl.BlockSpec((KBh, NB), lambda m, n, k: (k, n)),
                pl.BlockSpec((GBp, NB), lambda m, n, k: (k, n)),
            ],
            out_specs=pl.BlockSpec((MB, NB), lambda m, n, k: (m, n)),
            out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
            compiler_params=None if interpret else pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(xs, xo, wp, s_pad)
        return out[:M]
    out = pl.pallas_call(
        functools.partial(_kernel, groups_per_blk=GB, cdt=cdt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((MB, KBh), lambda m, n, k: (m, k)),
            pl.BlockSpec((MB, KBh), lambda m, n, k: (m, k)),
            pl.BlockSpec((KBh, NB), lambda m, n, k: (k, n)),
            pl.BlockSpec((GBp, NB), lambda m, n, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((MB, NB), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xe, xo, wp, s_pad)
    return out[:M]
