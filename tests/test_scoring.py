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
