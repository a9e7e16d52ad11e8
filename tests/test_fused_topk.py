"""Fused Pallas scoring+top-k kernel (interpret mode on the CPU mesh).

The kernel's contract: bin-argmax semantics — per 128-doc bin, the winning
(doc, score) survives; the stage-2 top-k over bins then returns up to k
winners.  Tests verify that contract against a numpy model of the same
binning, plus validity masking, int8 dequant, and the sharded merge.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bergen_tpu.ops import fused_topk, scoring
from bergen_tpu.parallel import get_mesh


def numpy_bin_topk(queries, corpus, k, bin_=fused_topk.BIN):
    """Reference model: exact scores -> per-bin argmax -> top-k over bins."""
    scores = queries @ corpus.T  # [Q, N]
    N = corpus.shape[0]
    n_bins = -(-N // bin_)
    pad = n_bins * bin_ - N
    s = np.pad(scores, ((0, 0), (0, pad)), constant_values=-np.inf)
    s = s.reshape(scores.shape[0], n_bins, bin_)
    within = np.argmax(s, axis=2)                      # [Q, n_bins]
    bin_vals = np.take_along_axis(s, within[..., None], axis=2)[..., 0]
    bin_idx = within + np.arange(n_bins)[None, :] * bin_
    order = np.argsort(-bin_vals, axis=1, kind="stable")[:, :k]
    return (
        np.take_along_axis(bin_vals, order, axis=1),
        np.take_along_axis(bin_idx, order, axis=1),
    )


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    queries = rng.normal(size=(8, 48)).astype(np.float32)
    corpus = rng.normal(size=(5000, 48)).astype(np.float32)
    return queries, corpus


def test_bin_topk_matches_numpy_binning(data):
    queries, corpus = data
    k = 7
    v, i = fused_topk.bin_topk(
        jnp.asarray(queries, jnp.bfloat16), jnp.asarray(corpus, jnp.bfloat16),
        k, valid_n=corpus.shape[0], method="exact", interpret=True,
    )
    ev, ei = numpy_bin_topk(queries, corpus, k)
    # bf16 rounding can flip near-ties; require high but not bitwise agreement
    overlap = np.mean([
        len(set(np.asarray(i)[r]) & set(ei[r])) / k for r in range(len(ei))
    ])
    assert overlap >= 0.9
    np.testing.assert_allclose(
        np.asarray(v), ev, rtol=2e-2, atol=2e-2
    )


def test_bin_topk_validity_mask(data):
    """Pad docs (rows beyond valid_n) must never appear, even when every
    genuine score is negative (zero pad rows would otherwise win)."""
    queries, corpus = data
    neg_corpus = corpus - 100.0  # all dot products hugely negative? no —
    # make queries positive so scores with (corpus - 100) trend negative
    q = np.abs(queries)
    valid = 4321
    v, i = fused_topk.bin_topk(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(neg_corpus, jnp.bfloat16),
        5, valid_n=valid, method="exact", interpret=True,
    )
    assert np.asarray(i).max() < valid


def test_bin_topk_int8_dequant(data):
    queries, corpus = data
    k = 7
    codes, scales = scoring.quantize_rows_int8(corpus)
    q_i8, q_sc = scoring.quantize_rows_int8(queries)
    v, i = fused_topk.bin_topk(
        jnp.asarray(q_i8), jnp.asarray(codes), k,
        valid_n=corpus.shape[0], doc_scales=jnp.asarray(scales),
        method="exact", interpret=True,
    )
    deq = (np.asarray(codes, np.float32) * np.asarray(scales)[:, None])
    ev, ei = numpy_bin_topk(np.asarray(q_i8, np.float32), deq, k)
    overlap = np.mean([
        len(set(np.asarray(i)[r]) & set(ei[r])) / k for r in range(len(ei))
    ])
    assert overlap >= 0.95


def test_quantize_bins_int8_roundtrip(data):
    _, corpus = data
    codes, scales = fused_topk.quantize_bins_int8(corpus)
    assert codes.shape == corpus.shape
    assert scales.shape[0] == -(-corpus.shape[0] // fused_topk.BIN)
    deq = codes.astype(np.float32) * np.repeat(
        scales, fused_topk.BIN
    )[: corpus.shape[0], None]
    # bin-shared scales: error bounded by (bin max)/254 per element
    err = np.abs(deq - corpus)
    bound = np.repeat(scales, fused_topk.BIN)[: corpus.shape[0], None] * 0.5001
    assert np.all(err <= bound + 1e-6)


def test_bin_topk_per_bin_scales(data):
    """Per-bin scales (i32 epilogue) must rank like the per-doc exact model
    of the same quantization."""
    queries, corpus = data
    k = 7
    codes, bscales = fused_topk.quantize_bins_int8(corpus)
    q_i8, _ = scoring.quantize_rows_int8(queries)
    v, i = fused_topk.bin_topk(
        jnp.asarray(q_i8), jnp.asarray(codes), k,
        valid_n=corpus.shape[0], doc_scales=jnp.asarray(bscales),
        method="exact", interpret=True,
    )
    deq = codes.astype(np.float32) * np.repeat(
        bscales, fused_topk.BIN
    )[: corpus.shape[0], None]
    ev, ei = numpy_bin_topk(np.asarray(q_i8, np.float32), deq, k)
    overlap = np.mean([
        len(set(np.asarray(i)[r]) & set(ei[r])) / k for r in range(len(ei))
    ])
    assert overlap >= 0.95
    np.testing.assert_allclose(np.asarray(v), ev, rtol=1e-4, atol=1e-4)


def test_exact_topk_rows_is_exact(data):
    queries, corpus = data
    k = 11
    v, i = fused_topk.exact_topk_rows(
        jnp.asarray(queries), jnp.asarray(corpus), k,
        valid_n=corpus.shape[0], block=1024,
    )
    scores = queries @ corpus.T
    ti = np.argsort(-scores, axis=1)[:, :k]
    tv = np.take_along_axis(scores, ti, axis=1)
    np.testing.assert_allclose(np.asarray(v), tv, rtol=1e-5, atol=1e-5)
    assert np.mean(np.asarray(i) == ti) > 0.99  # ties may reorder


def test_sharded_bin_topk_matches_single_device(data):
    queries, corpus = data
    k = 9
    mesh = get_mesh()
    rows, dsc, pd_dsc, valid_n = fused_topk.shard_corpus_rows(
        mesh, corpus, dtype=jnp.int8, granularity="doc"
    )
    sv, si = fused_topk.sharded_bin_topk(
        mesh, jnp.asarray(queries), rows, k, valid_n=valid_n,
        doc_scales=dsc, method="exact", interpret=True,
    )
    # single-device equivalent on the same quantization
    codes, scales = scoring.quantize_rows_int8(corpus)
    q_i8, q_sc = scoring.quantize_rows_int8(queries)
    v, i = fused_topk.bin_topk(
        jnp.asarray(q_i8), jnp.asarray(codes), k, valid_n=corpus.shape[0],
        doc_scales=jnp.asarray(scales), method="exact", interpret=True,
    )
    overlap = np.mean([
        len(set(np.asarray(si)[r]) & set(np.asarray(i)[r])) / k
        for r in range(queries.shape[0])
    ])
    assert overlap >= 0.95
    assert np.asarray(si).max() < corpus.shape[0]


def test_sharded_exact_rows_guard_path(data):
    """The recall guard's sharded exact reference: per-bin quantized corpus
    with expanded per-doc scales must match a host exact ranking of the same
    dequantized corpus."""
    queries, corpus = data
    k = 9
    mesh = get_mesh()
    rows, dsc, pd_dsc, valid_n = fused_topk.shard_corpus_rows(
        mesh, corpus, dtype=jnp.int8, granularity="bin"
    )
    v, i = fused_topk.sharded_exact_topk_rows(
        mesh, jnp.asarray(queries), rows, k, valid_n=valid_n,
        doc_scales=pd_dsc,
    )
    codes, bscales = fused_topk.quantize_bins_int8(corpus)
    q_i8, q_sc = scoring.quantize_rows_int8(queries)
    deq = codes.astype(np.float32) * np.repeat(
        bscales, fused_topk.BIN
    )[: corpus.shape[0], None]
    scores = np.asarray(q_i8, np.float32) @ deq.T
    ti = np.argsort(-scores, axis=1)[:, :k]
    overlap = np.mean([
        len(set(np.asarray(i)[r]) & set(ti[r])) / k for r in range(len(ti))
    ])
    assert overlap >= 0.95
    assert np.asarray(i).max() < corpus.shape[0]


def test_bin_topk_recall_vs_exact(data):
    """End-to-end recall of the fused path vs exact brute force: with 5000
    docs (40 bins of 128) and k=7 collisions are likely, so only a loose
    bound holds — the pipeline guard measures the real thing per run."""
    queries, corpus = data
    k = 7
    v, i = fused_topk.bin_topk(
        jnp.asarray(queries, jnp.bfloat16), jnp.asarray(corpus, jnp.bfloat16),
        k, valid_n=corpus.shape[0], method="exact", interpret=True,
    )
    scores = queries @ corpus.T
    ti = np.argsort(-scores, axis=1)[:, :k]
    overlap = np.mean([
        len(set(np.asarray(i)[r]) & set(ti[r])) / k for r in range(len(ti))
    ])
    assert overlap >= 0.5  # bins are coarse at this tiny corpus size
