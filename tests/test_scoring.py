"""Tests for the dense MIPS scoring core: blocked top-k exactness and the
distributed (8-virtual-device) top-k merge."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bergen_tpu.ops import scoring
from bergen_tpu.parallel import get_mesh


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    queries = rng.normal(size=(16, 64)).astype(np.float32)
    corpus = rng.normal(size=(1000, 64)).astype(np.float32)
    return queries, corpus


def brute_topk(queries, corpus, k):
    scores = queries @ corpus.T
    idx = np.argsort(-scores, axis=1)[:, :k]
    vals = np.take_along_axis(scores, idx, axis=1)
    return vals, idx


def test_xla_score_matches_numpy(data):
    queries, corpus = data
    out = np.asarray(scoring.xla_score(jnp.asarray(queries), jnp.asarray(corpus.T)))
    np.testing.assert_allclose(out, queries @ corpus.T, atol=1e-4)


def test_topk_blocked_exact(data):
    queries, corpus = data
    k = 10
    vals, idxs = scoring.topk_blocked(
        jnp.asarray(queries), jnp.asarray(corpus.T), k, block=256
    )
    ref_vals, ref_idx = brute_topk(queries, corpus, k)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=1e-4)
    # indices may differ on exact ties; scores are the ground truth
    scores = queries @ corpus.T
    np.testing.assert_allclose(
        np.take_along_axis(scores, np.asarray(idxs), axis=1), ref_vals, atol=1e-4
    )


def test_topk_blocked_k_larger_than_n():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))  # N=5 docs
    vals, idxs = scoring.topk_blocked(q, c, k=10, block=4)
    assert vals.shape == (2, 10)
    assert np.all(np.isneginf(np.asarray(vals[:, 5:])))


def test_topk_blocked_block_not_dividing(data):
    queries, corpus = data
    vals, _ = scoring.topk_blocked(
        jnp.asarray(queries), jnp.asarray(corpus.T), 7, block=300
    )
    ref_vals, _ = brute_topk(queries, corpus, 7)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=1e-4)


def test_sharded_topk_matches_single_device(data):
    queries, corpus = data
    k = 25
    mesh = get_mesh()  # 8 virtual CPU devices
    assert mesh.shape["data"] == 8
    corpus_dev, valid_n = scoring.shard_corpus(mesh, corpus, dtype=jnp.float32)
    assert valid_n == 1000
    vals, idxs = scoring.sharded_topk(
        mesh, jnp.asarray(queries), corpus_dev, k, block=256, valid_n=valid_n
    )
    ref_vals, _ = brute_topk(queries, corpus, k)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=1e-4)
    scores = queries @ corpus.T
    np.testing.assert_allclose(
        np.take_along_axis(scores, np.asarray(idxs), axis=1), ref_vals, atol=1e-4
    )


def test_padding_cannot_displace_negative_scores():
    """All genuine scores negative + shard padding (zero vectors scoring 0):
    the padding must not displace genuine candidates from the top-k."""
    rng = np.random.default_rng(5)
    q = np.abs(rng.normal(size=(4, 16))).astype(np.float32)
    corpus = -np.abs(rng.normal(size=(100, 16))).astype(np.float32)  # all neg
    mesh = get_mesh()
    corpus_dev, valid_n = scoring.shard_corpus(mesh, corpus, dtype=jnp.float32)
    assert corpus_dev.shape[1] > 100  # padding exists
    vals, idxs = scoring.sharded_topk(
        mesh, jnp.asarray(q), corpus_dev, k=30, block=64, valid_n=valid_n
    )
    ref_vals, _ = brute_topk(q, corpus, 30)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=1e-4)
    assert np.asarray(idxs).max() < 100


def test_sharded_topk_never_returns_padding(data):
    queries, corpus = data
    mesh = get_mesh()
    # 1000 docs pad to 1024 over 8 devices; ask for enough k to tempt padding in
    corpus_dev, valid_n = scoring.shard_corpus(mesh, corpus, dtype=jnp.float32)
    vals, idxs = scoring.sharded_topk(
        mesh, jnp.asarray(queries), corpus_dev, 200, block=256, valid_n=valid_n
    )
    assert np.asarray(idxs).max() < 1000


# --------------------------------------------------------------------------- #
# int8 quantized scoring
# --------------------------------------------------------------------------- #


def test_quantize_rows_int8_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 96)).astype(np.float32)
    x[3] = 0.0  # zero row must not divide by zero
    q, s = scoring.quantize_rows_int8(x)
    assert q.dtype == np.int8 and s.shape == (64,)
    rec = q.astype(np.float32) * s[:, None]
    assert np.abs(rec - x).max() <= (np.abs(x).max(axis=1) / 127.0 + 1e-7).max()
    assert np.all(q[3] == 0) and s[3] == 0.0


def test_topk_blocked_int8_ranking_matches_f32(data):
    """On well-separated scores the int8 path must produce the same top-k
    ids and near-equal dequantized values."""
    queries, corpus = data
    c_i8, dsc = scoring.quantize_rows_int8(corpus)
    q_i8, qsc = scoring.quantize_rows_int8(queries)
    k = 10
    ref_v, ref_i = scoring.topk_blocked(
        jnp.asarray(queries), jnp.asarray(corpus.T), k, block=256,
        method="exact",
    )
    v, i = scoring.topk_blocked(
        jnp.asarray(q_i8), jnp.asarray(np.asarray(c_i8).T), k, block=256,
        method="exact", doc_scales=jnp.asarray(dsc),
    )
    v = np.asarray(v) * np.asarray(qsc)[:, None]
    # int8 rank flips only happen between near-tied docs; random gaussian
    # scores at N=1000 are well separated at k=10
    overlap = np.mean([
        len(set(np.asarray(ref_i)[r]) & set(np.asarray(i)[r])) / k
        for r in range(queries.shape[0])
    ])
    assert overlap >= 0.9
    np.testing.assert_allclose(v, np.asarray(ref_v), rtol=0.05, atol=0.5)


def test_sharded_topk_int8(data):
    queries, corpus = data
    mesh = get_mesh()
    out = scoring.shard_corpus(mesh, corpus, dtype=jnp.int8)
    c_dev, dsc_dev, valid_n = out
    assert c_dev.dtype == jnp.int8
    v, i = scoring.sharded_topk(
        mesh, jnp.asarray(queries), c_dev, 10, block=256, valid_n=valid_n,
        doc_scales=dsc_dev, method="exact",
    )
    ref_v, ref_i = scoring.topk_blocked(
        jnp.asarray(queries), jnp.asarray(corpus.T), 10, block=256,
        method="exact",
    )
    assert np.all(np.asarray(i) < valid_n)
    overlap = np.mean([
        len(set(np.asarray(ref_i)[r]) & set(np.asarray(i)[r])) / 10
        for r in range(queries.shape[0])
    ])
    assert overlap >= 0.9
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v),
                               rtol=0.05, atol=0.5)
