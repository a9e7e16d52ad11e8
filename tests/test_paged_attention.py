"""Paged KV decode attention (ops/paged_attention.py): partials vs a dense
oracle, the Pallas kernel in interpret mode, and the write/flush lifecycle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bergen_tpu.ops import paged_attention as pa


def _dense_oracle(q, k_hist, v_hist, lens, scale):
    """q [S,H,Dh] attends over each slot's first lens[s] history tokens
    (k_hist [S, T, KH, Dh])."""
    S, H, Dh = q.shape
    KH = k_hist.shape[2]
    G = H // KH
    T = k_hist.shape[1]
    qg = q.reshape(S, KH, G, Dh)
    sc = np.einsum("skgd,stkd->skgt", qg, k_hist) * scale
    sc = np.where(np.arange(T)[None, None, None, :] < lens[:, None, None, None],
                  sc, -1e30)
    p = np.exp(sc - sc.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ctx = np.einsum("skgt,stkd->skgd", p, v_hist)
    return ctx.reshape(S, H, Dh)


@pytest.fixture(scope="module")
def paged_setup():
    rng = np.random.default_rng(11)
    S, H, KH, Dh, maxP, NP = 4, 8, 2, 64, 3, 16
    lens = np.array([1, 127, 130, 300], np.int32)  # spans 0..2 full pages
    T = maxP * pa.PAGE
    k_hist = rng.normal(size=(S, T, KH, Dh)).astype(np.float32)
    v_hist = rng.normal(size=(S, T, KH, Dh)).astype(np.float32)
    q = rng.normal(size=(S, H, Dh)).astype(np.float32)

    # build the paged layout: full pages into the pool, remainder into tails
    k_pool = np.zeros((NP, KH, pa.PAGE, Dh), np.float32)
    v_pool = np.zeros((NP, KH, pa.PAGE, Dh), np.float32)
    k_tail = np.zeros((S, KH, pa.PAGE, Dh), np.float32)
    v_tail = np.zeros((S, KH, pa.PAGE, Dh), np.float32)
    tables = np.zeros((S, maxP), np.int32)
    free = list(range(1, NP))  # page 0 kept as the clamp target
    for s in range(S):
        nf = lens[s] // pa.PAGE
        for p in range(maxP):
            tables[s, p] = free.pop(0) if p < nf else 0
        for p in range(nf):
            pg = slice(p * pa.PAGE, (p + 1) * pa.PAGE)
            k_pool[tables[s, p]] = np.moveaxis(k_hist[s, pg], 1, 0)
            v_pool[tables[s, p]] = np.moveaxis(v_hist[s, pg], 1, 0)
        rem = lens[s] - nf * pa.PAGE
        k_tail[s, :, :rem] = np.moveaxis(k_hist[s, nf * pa.PAGE:lens[s]], 1, 0)
        v_tail[s, :, :rem] = np.moveaxis(v_hist[s, nf * pa.PAGE:lens[s]], 1, 0)
    return dict(q=q, k_hist=k_hist, v_hist=v_hist, lens=lens,
                k_pool=k_pool, v_pool=v_pool, k_tail=k_tail, v_tail=v_tail,
                tables=tables, S=S, H=H, KH=KH, Dh=Dh)


def test_paged_merge_matches_dense(paged_setup):
    d = paged_setup
    scale = 1.0 / np.sqrt(d["Dh"])
    n_full = d["lens"] // pa.PAGE
    tail_len = d["lens"] - n_full * pa.PAGE
    pp = pa.paged_partial_xla(
        jnp.asarray(d["q"]), jnp.asarray(d["k_pool"]), jnp.asarray(d["v_pool"]),
        jnp.asarray(d["tables"]), jnp.asarray(n_full), scale,
    )
    tp = pa.tail_partial(
        jnp.asarray(d["q"]), jnp.asarray(d["k_tail"]), jnp.asarray(d["v_tail"]),
        jnp.asarray(tail_len), scale,
    )
    ctx = pa._merge_partials([pp, tp])
    ref = _dense_oracle(d["q"], d["k_hist"], d["v_hist"], d["lens"], scale)
    np.testing.assert_allclose(np.asarray(ctx), ref, rtol=2e-4, atol=2e-4)


def test_pallas_kernel_matches_xla_partial(paged_setup):
    d = paged_setup
    scale = 1.0 / np.sqrt(d["Dh"])
    n_full = d["lens"] // pa.PAGE
    args = (jnp.asarray(d["q"]), jnp.asarray(d["k_pool"]),
            jnp.asarray(d["v_pool"]), jnp.asarray(d["tables"]),
            jnp.asarray(n_full), scale)
    a1, m1, l1 = pa.paged_partial_xla(*args)
    a2, m2, l2 = pa.paged_partial_pallas(*args, interpret=True)
    # slots with zero full pages: both must report l == 0 (absent partial)
    empty = n_full == 0
    np.testing.assert_allclose(np.asarray(l2)[empty], 0.0)
    live = ~empty
    np.testing.assert_allclose(np.asarray(m1)[live], np.asarray(m2)[live],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l1)[live], np.asarray(l2)[live],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a1)[live], np.asarray(a2)[live],
                               rtol=1e-4, atol=1e-4)


def test_pallas_kernel_ragged_slot_batch_and_starts():
    """S=10 forces the slot-batch padding path (nb=8 → padded to 16) and
    nonzero ``starts`` exercises the leading-pad masks in the batched
    kernel; padded rows must report l == 0 (absent partial)."""
    rng = np.random.default_rng(3)
    S, H, KH, Dh, maxP = 10, 8, 2, 64, 4
    NP = 1 + S * maxP
    n_full = rng.integers(0, maxP + 1, S).astype(np.int32)
    # starts within the first live page (page-aligned prefill leading pad)
    starts = np.where(n_full > 0,
                      rng.integers(0, pa.PAGE, S), 0).astype(np.int32)
    k_pool = rng.normal(size=(NP, KH, pa.PAGE, Dh)).astype(np.float32)
    v_pool = rng.normal(size=(NP, KH, pa.PAGE, Dh)).astype(np.float32)
    tables = np.zeros((S, maxP), np.int32)
    free = list(range(1, NP))
    for s in range(S):
        for p in range(int(n_full[s])):
            tables[s, p] = free.pop(0)
    q = rng.normal(size=(S, H, Dh)).astype(np.float32)
    scale = 1.0 / np.sqrt(Dh)
    args = (jnp.asarray(q), jnp.asarray(k_pool), jnp.asarray(v_pool),
            jnp.asarray(tables), jnp.asarray(n_full), scale)
    a1, m1, l1 = pa.paged_partial_xla(*args, starts=jnp.asarray(starts))
    a2, m2, l2 = pa.paged_partial_pallas(
        *args, starts=jnp.asarray(starts), interpret=True)
    assert a2.shape == (S, H, Dh)  # padding stripped
    empty = (n_full == 0) | (starts >= n_full * pa.PAGE)
    np.testing.assert_allclose(np.asarray(l2)[empty], 0.0)
    live = ~empty
    np.testing.assert_allclose(np.asarray(m1)[live], np.asarray(m2)[live],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l1)[live], np.asarray(l2)[live],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a1)[live], np.asarray(a2)[live],
                               rtol=1e-4, atol=1e-4)


def test_decode_step_and_flush_lifecycle(paged_setup):
    """Run paged_decode_attention for one step and check (a) ctx matches a
    dense oracle that includes the new token, (b) the tail write landed,
    (c) a slot crossing a page boundary flushes its tail into the pool."""
    d = paged_setup
    rng = np.random.default_rng(5)
    S, H, KH, Dh = d["S"], d["H"], d["KH"], d["Dh"]
    scale = 1.0 / np.sqrt(Dh)
    q = rng.normal(size=(S, H, Dh)).astype(np.float32)
    k_new = rng.normal(size=(S, KH, Dh)).astype(np.float32)
    v_new = rng.normal(size=(S, KH, Dh)).astype(np.float32)
    lens = d["lens"]
    ctx, k_tail, v_tail = pa.paged_decode_attention(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(d["k_pool"]), jnp.asarray(d["v_pool"]),
        jnp.asarray(d["k_tail"]), jnp.asarray(d["v_tail"]),
        jnp.asarray(d["tables"]), jnp.asarray(lens), scale,
        use_pallas=False,
    )
    # oracle over history + the new token appended at position lens[s]
    T = d["k_hist"].shape[1]
    kh = np.concatenate([d["k_hist"], np.zeros((S, 1, KH, Dh), np.float32)], 1)
    vh = np.concatenate([d["v_hist"], np.zeros((S, 1, KH, Dh), np.float32)], 1)
    for s in range(S):
        kh[s, lens[s]] = k_new[s]
        vh[s, lens[s]] = v_new[s]
    ref = _dense_oracle(q, kh, vh, lens + 1, scale)
    np.testing.assert_allclose(np.asarray(ctx), ref, rtol=2e-4, atol=2e-4)

    # slot 1 had len 127 -> new token fills the tail: flush moves it to the
    # pool page tables[1, 0]
    lens_after = lens + 1
    k_pool2, v_pool2 = pa.flush_full_pages(
        jnp.asarray(d["k_pool"]), jnp.asarray(d["v_pool"]),
        k_tail, v_tail, jnp.asarray(d["tables"]), jnp.asarray(lens_after),
    )
    s = 1
    assert lens_after[s] == 128
    dst = d["tables"][s, 0]
    np.testing.assert_allclose(
        np.asarray(k_pool2)[dst], np.asarray(k_tail)[s], atol=1e-6
    )
    # pages of other slots untouched
    other = d["tables"][3, 1]
    np.testing.assert_allclose(
        np.asarray(k_pool2)[other], d["k_pool"][other], atol=0
    )


def test_tail_write_offsets():
    S, KH, Dh = 3, 2, 8
    k_tail = jnp.zeros((S, KH, pa.PAGE, Dh))
    v_tail = jnp.zeros((S, KH, pa.PAGE, Dh))
    k_new = jnp.ones((S, KH, Dh)) * jnp.arange(1, S + 1)[:, None, None]
    lens = jnp.asarray([0, 130, 255])
    kt, _ = pa.tail_write(k_tail, v_tail, k_new, k_new, lens)
    kt = np.asarray(kt)
    assert kt[0, 0, 0, 0] == 1 and kt[1, 0, 2, 0] == 2 and kt[2, 0, 127, 0] == 3
    assert kt[0, 0, 1:].sum() == 0 and kt[1, 0, 3:].sum() == 0
