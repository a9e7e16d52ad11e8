"""Paged KV decode attention — the TPU-native core of vLLM-style serving.

The reference's serving engine is vLLM, whose central idea is paged KV
memory (``models/generators/vllm.py:48-59``): requests hold pages
proportional to their ACTUAL length, so short requests don't reserve
``max_len`` HBM and the decode batch can grow until memory — not slot
geometry — is the limit.  ``serve/engine.py``'s uniform slot regions cap the
decode batch well below what HBM allows; this module supplies the paged
alternative.

Design (all static shapes, jit-stable):

* **Page pool** ``[n_pages, KH, PAGE=128, Dh]`` per layer: full pages only.
  Block tables ``[S, max_pages]`` map each slot's logical page index to a
  pool page.  The pool is immutable during a decode step except page flush.
* **Per-slot tail** ``[S, KH, PAGE, Dh]``: the newest ``< PAGE`` tokens.
  The decode write lands here via a one-hot lane select (cheap: the tail is
  only 128 wide — the full-cache select this engine replaced scaled with
  ``max_len``), and a completed page is flushed to the pool as ONE contiguous
  row scatter every 128th token (amortised ~0).
* **Attention = two partials + flash merge**: a Pallas kernel streams the
  slot's full pages straight from HBM (block tables ride scalar prefetch,
  so the index map DMAs exactly the pages the slot owns) and returns
  unnormalised (acc, m, l); the tail partial is one dense masked [S, PAGE]
  attention in XLA; the standard online-softmax merge combines them.
  Nothing is ever gathered into a contiguous copy — reads are in place,
  which is the whole point of paging on a bandwidth-bound chip.

Off-TPU (and for head_dim not a lane multiple) an XLA reference path
computes the same partials from the same paged layout, so CPU-mesh tests
exercise the exact data structures the chip runs.

Reference behaviour being replaced: vLLM PagedAttention
(``/root/reference/models/generators/vllm.py:48-78``).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAGE = 128
_NEG = -1e30

# Full-pages partial engine: "auto" picks by geometry/backend, "pallas" /
# "xla" force one side (A/B benchmarking: scripts/bench_paged.py --engine).
ENGINE = os.environ.get("BERGEN_TPU_PAGED_ENGINE", "auto")


# --------------------------------------------------------------------------- #
# partial-attention contract: (acc [S,H,Dh] f32 unnormalised, m [S,H], l [S,H])
# --------------------------------------------------------------------------- #


def _merge_partials(parts) -> jnp.ndarray:
    """Flash-style combine of independent softmax partials."""
    m = functools.reduce(jnp.maximum, [p[1] for p in parts])
    acc = 0.0
    l = 0.0
    for a, mi, li in parts:
        w = jnp.exp(mi - m)
        acc = acc + a * w[..., None]
        l = l + li * w
    return acc / jnp.maximum(l, 1e-30)[..., None]


def _partial_from_scores(scores: jnp.ndarray, valid: jnp.ndarray):
    """scores [..., T], valid broadcastable bool → (probs, m, l); fully
    masked rows give l == 0 (the merge treats them as absent)."""
    scores = jnp.where(valid, scores, _NEG)
    m = jnp.max(scores, axis=-1)
    # fully-masked rows: pin m so exp() underflows to 0 instead of inf-inf
    p = jnp.exp(scores - m[..., None])
    p = jnp.where(valid, p, 0.0)
    l = jnp.sum(p, axis=-1)
    return p, m, l


def tail_partial(q: jnp.ndarray, k_tail: jnp.ndarray, v_tail: jnp.ndarray,
                 tail_len: jnp.ndarray, scale: float):
    """Dense partial over the [S, KH, PAGE, Dh] tail.  q [S, H, Dh]."""
    S, H, Dh = q.shape
    KH = k_tail.shape[1]
    G = H // KH
    qg = q.reshape(S, KH, G, Dh)
    sc = jnp.einsum("skgd,skpd->skgp", qg, k_tail.astype(q.dtype),
                    preferred_element_type=jnp.float32) * scale
    valid = (jnp.arange(PAGE)[None, None, None, :]
             < tail_len[:, None, None, None])
    p, m, l = _partial_from_scores(sc, valid)
    acc = jnp.einsum("skgp,skpd->skgd", p.astype(q.dtype),
                     v_tail.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    return (acc.reshape(S, H, Dh).astype(jnp.float32),
            m.reshape(S, H), l.reshape(S, H))


def paged_partial_xla(q: jnp.ndarray, k_pool: jnp.ndarray,
                      v_pool: jnp.ndarray, tables: jnp.ndarray,
                      n_pages: jnp.ndarray, scale: float,
                      starts: jnp.ndarray | None = None):
    """Reference paged partial: gathers each slot's pages then one masked
    attention.  Same layout + contract as the Pallas kernel (used off-TPU
    and as the parity oracle — materialising the gather is exactly what the
    kernel exists to avoid).  ``starts`` masks leading bucket-padding
    positions (< start) written by page-aligned prefill."""
    S, H, Dh = q.shape
    KH = k_pool.shape[1]
    G = H // KH
    maxP = tables.shape[1]
    kg = k_pool[tables]          # [S, maxP, KH, PAGE, Dh]
    vg = v_pool[tables]
    kg = jnp.moveaxis(kg, 2, 1).reshape(S, KH, maxP * PAGE, Dh)
    vg = jnp.moveaxis(vg, 2, 1).reshape(S, KH, maxP * PAGE, Dh)
    qg = q.reshape(S, KH, G, Dh)
    sc = jnp.einsum("skgd,sktd->skgt", qg, kg.astype(q.dtype),
                    preferred_element_type=jnp.float32) * scale
    pos = jnp.arange(maxP * PAGE)[None, None, None, :]
    valid = pos < (n_pages * PAGE)[:, None, None, None]
    if starts is not None:
        valid = valid & (pos >= starts[:, None, None, None])
    p, m, l = _partial_from_scores(sc, valid)
    acc = jnp.einsum("skgt,sktd->skgd", p.astype(q.dtype),
                     vg.astype(q.dtype), preferred_element_type=jnp.float32)
    return (acc.reshape(S, H, Dh).astype(jnp.float32),
            m.reshape(S, H), l.reshape(S, H))


# --------------------------------------------------------------------------- #
# Pallas kernel: stream pages via scalar-prefetched block tables
# --------------------------------------------------------------------------- #


# Slots per grid step.  One-slot-per-step (the first shipped cut) made the
# decode DMA-latency/fixed-cost bound: S slots x L layers of grid steps,
# each fetching tiny [1, H, Dh] blocks and paying the pipeline's semaphore
# round-trips — measured 31.5 ms/step at S=50 vs 10.4 ms for uniform slots
# (scripts/bench_paged.py), and doubling PAGE made it WORSE (compute waste
# grew, so the gap was fixed cost, not DMA size).  Batching NB slots per
# grid step amortises the fixed cost NB-fold; per-slot @pl.when guards keep
# the math identical for ragged page counts.
SLOTS_PER_STEP = 8


def _paged_kernel(tbl_ref, npg_ref, start_ref, q_ref, k_hbm, v_hbm,
                  acc_ref, m_ref, l_ref, kbuf, vbuf, accs, ms, ls, sem,
                  *, KH, G, scale, nb):
    """NB slots per grid step; each slot's live pages stream through two
    VMEM buffer sets with manually issued double-buffered DMAs (page j+2
    prefetches while page j computes), all NB slots' DMAs in flight
    together."""
    b = pl.program_id(0)
    H = G * KH
    npgs = [npg_ref[b * nb + s] for s in range(nb)]
    starts = [start_ref[b * nb + s] for s in range(nb)]
    p0s = [st // PAGE for st in starts]  # pages fully inside leading padding

    accs[:] = jnp.zeros_like(accs)
    ms[:] = jnp.full_like(ms, _NEG)
    ls[:] = jnp.zeros_like(ls)

    def issue(j, buf):
        for s in range(nb):
            @pl.when(p0s[s] + j < npgs[s])
            def _():
                page = tbl_ref[b * nb + s, p0s[s] + j]
                pltpu.make_async_copy(
                    k_hbm.at[page], kbuf.at[buf, s], sem.at[buf, s, 0]).start()
                pltpu.make_async_copy(
                    v_hbm.at[page], vbuf.at[buf, s], sem.at[buf, s, 1]).start()

    def wait(j, buf):
        for s in range(nb):
            @pl.when(p0s[s] + j < npgs[s])
            def _():
                pltpu.make_async_copy(
                    k_hbm.at[0], kbuf.at[buf, s], sem.at[buf, s, 0]).wait()
                pltpu.make_async_copy(
                    v_hbm.at[0], vbuf.at[buf, s], sem.at[buf, s, 1]).wait()

    def compute(j, buf):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, PAGE), 1)
        for s in range(nb):
            i = p0s[s] + j

            @pl.when(i < npgs[s])
            def _():
                q = q_ref[s]  # [H, Dh]
                # leading-pad mask: lane t real iff i*PAGE + t >= start
                pad_mask = (i * PAGE + lane) < starts[s]   # [1, PAGE]
                for h in range(KH):  # static unroll: KH is small (1-16)
                    k = kbuf[buf, s, h]  # [PAGE, Dh]
                    v = vbuf[buf, s, h]
                    qh = q[h * G:(h + 1) * G]  # [G, Dh]
                    sc = jax.lax.dot_general(
                        qh, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * scale                              # [G, PAGE]
                    sc = jnp.where(pad_mask, _NEG, sc)
                    rows = slice(h * G, (h + 1) * G)
                    m_old = ms[s, rows]            # [G, PAGE] lane-replicated
                    m_new = jnp.maximum(
                        m_old, jnp.max(sc, axis=-1, keepdims=True)
                    )
                    alpha = jnp.exp(m_old - m_new)
                    pexp = jnp.exp(sc - m_new)
                    ls[s, rows] = ls[s, rows] * alpha + jnp.sum(
                        pexp, axis=-1, keepdims=True
                    )
                    accs[s, rows] = (
                        accs[s, rows] * alpha[:, : accs.shape[2]]
                        + jnp.dot(pexp.astype(v.dtype), v,
                                  preferred_element_type=jnp.float32)
                    )
                    ms[s, rows] = m_new

    # prologue: fill both buffer sets (static buf ids keep the DMA targets
    # compile-time-known; the page loop consumes/re-issues in pairs)
    issue(0, 0)
    issue(1, 1)

    def pair_body(jj, _):
        j0 = 2 * jj
        wait(j0, 0)
        compute(j0, 0)
        issue(j0 + 2, 0)
        wait(j0 + 1, 1)
        compute(j0 + 1, 1)
        issue(j0 + 3, 1)
        return 0

    nsteps = npgs[0] - p0s[0]
    for s in range(1, nb):
        nsteps = jnp.maximum(nsteps, npgs[s] - p0s[s])
    n_pairs = jnp.maximum(nsteps + 1, 0) // 2
    jax.lax.fori_loop(0, n_pairs, pair_body, 0, unroll=False)

    acc_ref[...] = accs[:]
    m_ref[...] = ms[:]
    l_ref[...] = ls[:]


def paged_partial_pallas(q: jnp.ndarray, k_pool: jnp.ndarray,
                         v_pool: jnp.ndarray, tables: jnp.ndarray,
                         n_pages: jnp.ndarray, scale: float,
                         starts: jnp.ndarray | None = None,
                         interpret: bool = False):
    """Pallas paged partial.  q [S, H, Dh], pools [NP, KH, PAGE, Dh],
    tables [S, maxP] int32, n_pages [S] int32, starts [S] int32 (leading
    bucket-pad positions to mask).  Requires Dh == 128 (one lane group) —
    callers fall back to the XLA path otherwise."""
    S, H, Dh = q.shape
    KH = k_pool.shape[1]
    G = H // KH
    if starts is None:
        starts = jnp.zeros_like(n_pages)

    nb = min(SLOTS_PER_STEP, S)
    Sp = -(-S // nb) * nb
    if Sp != S:
        # pad to the slot-batch multiple; padded rows carry n_pages=0 so
        # every in-kernel guard is false for them (l stays 0 = absent)
        q = jnp.pad(q, ((0, Sp - S), (0, 0), (0, 0)))
        tables = jnp.pad(tables, ((0, Sp - S), (0, 0)))
        n_pages = jnp.pad(n_pages, (0, Sp - S))
        starts = jnp.pad(starts, (0, Sp - S))

    def q_map(b, tbl, npg, st):
        return (b, 0, 0)

    def out_map(b, tbl, npg, st):
        return (b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Sp // nb,),
        in_specs=[
            pl.BlockSpec((nb, H, Dh), q_map),
            pl.BlockSpec(memory_space=pl.ANY),  # page pools stay in HBM;
            pl.BlockSpec(memory_space=pl.ANY),  # the kernel DMAs pages
        ],
        out_specs=[
            pl.BlockSpec((nb, H, Dh), out_map),
            pl.BlockSpec((nb, H, PAGE), out_map),
            pl.BlockSpec((nb, H, PAGE), out_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, nb, KH, PAGE, Dh), k_pool.dtype),
            pltpu.VMEM((2, nb, KH, PAGE, Dh), v_pool.dtype),
            pltpu.VMEM((nb, H, Dh), jnp.float32),
            pltpu.VMEM((nb, H, PAGE), jnp.float32),
            pltpu.VMEM((nb, H, PAGE), jnp.float32),
            pltpu.SemaphoreType.DMA((2, nb, 2)),
        ],
    )
    kern = functools.partial(_paged_kernel, KH=KH, G=G, scale=scale, nb=nb)
    acc, m, l = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((Sp, H, Dh), jnp.float32),
            jax.ShapeDtypeStruct((Sp, H, PAGE), jnp.float32),
            jax.ShapeDtypeStruct((Sp, H, PAGE), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tables, n_pages, starts, q, k_pool, v_pool)
    return acc[:S], m[:S, :, 0], l[:S, :, 0]


# --------------------------------------------------------------------------- #
# cache ops
# --------------------------------------------------------------------------- #


def tail_write(k_tail: jnp.ndarray, v_tail: jnp.ndarray, k_new: jnp.ndarray,
               v_new: jnp.ndarray, lengths: jnp.ndarray):
    """Write one new token per slot at tail offset ``lengths % PAGE`` via a
    one-hot lane select.  k_new/v_new [S, KH, Dh]; lengths = token count
    BEFORE this write."""
    off = lengths % PAGE
    sel = (jnp.arange(PAGE)[None, None, :, None]
           == off[:, None, None, None])  # [S, 1, PAGE, 1]
    k_tail = jnp.where(sel, k_new[:, :, None, :].astype(k_tail.dtype), k_tail)
    v_tail = jnp.where(sel, v_new[:, :, None, :].astype(v_tail.dtype), v_tail)
    return k_tail, v_tail


def flush_full_pages(k_pool: jnp.ndarray, v_pool: jnp.ndarray,
                     k_tail: jnp.ndarray, v_tail: jnp.ndarray,
                     tables: jnp.ndarray, lengths_after: jnp.ndarray,
                     active: jnp.ndarray | None = None):
    """After a step that filled a slot's tail (``lengths_after % PAGE == 0``),
    scatter that tail row into the slot's newest pool page.  Inactive/partial
    slots scatter out of bounds and are dropped.  Pools may be stacked
    [..., NP, KH, PAGE, Dh] with leading layer dims on pool/tail alike."""
    full = (lengths_after > 0) & (lengths_after % PAGE == 0)
    if active is not None:
        full = full & active
    page_idx = jnp.maximum(lengths_after // PAGE - 1, 0)
    dst = jnp.where(full, jnp.take_along_axis(
        tables, page_idx[:, None], axis=1)[:, 0], jnp.int32(1 << 30))
    if k_pool.ndim == 4:  # per-layer [NP, KH, PAGE, Dh] / [S, KH, PAGE, Dh]
        k_pool = k_pool.at[dst].set(k_tail, mode="drop")
        v_pool = v_pool.at[dst].set(v_tail, mode="drop")
    else:  # stacked [L, NP, ...] pools with [L, S, ...] tails
        L = k_pool.shape[0]
        rows = jnp.arange(L)[:, None]
        dst2 = jnp.broadcast_to(dst[None, :], (L, dst.shape[0]))
        k_pool = k_pool.at[rows, dst2].set(k_tail, mode="drop")
        v_pool = v_pool.at[rows, dst2].set(v_tail, mode="drop")
    return k_pool, v_pool


def paged_decode_attention(
    q: jnp.ndarray,        # [S, H, Dh] one token per slot (RoPE applied)
    k_new: jnp.ndarray,    # [S, KH, Dh] this token's K (RoPE applied)
    v_new: jnp.ndarray,
    k_pool: jnp.ndarray,   # [NP, KH, PAGE, Dh]
    v_pool: jnp.ndarray,
    k_tail: jnp.ndarray,   # [S, KH, PAGE, Dh]
    v_tail: jnp.ndarray,
    tables: jnp.ndarray,   # [S, maxP]
    lengths: jnp.ndarray,  # [S] storage positions used BEFORE this step
    scale: float,
    starts: jnp.ndarray | None = None,  # [S] leading bucket-pad positions
    use_pallas: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One paged decode-attention step: tail-write the new token, attend over
    (full pages ∪ tail), return (ctx [S, H, Dh], k_tail, v_tail).  Page flush
    and the lengths increment are the caller's (they happen once per step,
    not per layer)."""
    S, H, Dh = q.shape
    if use_pallas is None:
        if ENGINE in ("pallas", "xla"):
            use_pallas = ENGINE == "pallas"
        else:
            # the kernel's lane-replicated softmax stats assume Dh == one
            # lane group; other head dims take the XLA paged path
            use_pallas = (jax.default_backend() == "tpu" and Dh == 128)
    k_tail, v_tail = tail_write(k_tail, v_tail, k_new, v_new, lengths)
    n_full = lengths // PAGE
    tail_len = lengths - n_full * PAGE + 1  # incl. the token just written
    partial_fn = paged_partial_pallas if use_pallas else paged_partial_xla
    pp = partial_fn(q, k_pool, v_pool, tables, n_full, scale, starts)
    tp = tail_partial(q, k_tail, v_tail, tail_len, scale)
    ctx = _merge_partials([pp, tp])
    return ctx.astype(q.dtype), k_tail, v_tail
