"""Wide-slab SPLADE scoring (ops/sparse_slab.py): all-head exactness vs the
dense brute force, hashed-tail candidate quality, and the pipeline-level
dispatch + guard fallback."""

import numpy as np
import pytest

import jax.numpy as jnp

from bergen_tpu.ops import sparse as sparse_ops
from bergen_tpu.ops.sparse_slab import (
    SlabIndex, build_slab_int8, default_width, queries_to_slab,
    rescore_exact,
)
from bergen_tpu.ops.sparse_sketch import sketch_map, term_impact_mass
from bergen_tpu.parallel import get_mesh


@pytest.fixture(scope="module")
def slab_data():
    rng = np.random.default_rng(7)
    V, N, Q, NNZ = 640, 800, 16, 24
    docs = np.zeros((N, V), dtype=np.float32)
    for i in range(N):
        pos = rng.choice(V, NNZ - 4, replace=False)
        # Zipf-flavoured term ids so head/tail partitioning has structure
        pos = np.minimum(pos, rng.integers(1, V, size=pos.size)).astype(int)
        docs[i, pos] = rng.gamma(2.0, 0.6, size=pos.size)
    q = np.zeros((Q, V), dtype=np.float32)
    for i in range(Q):
        pos = rng.choice(V, 12, replace=False)
        q[i, pos] = rng.gamma(2.0, 0.6, size=12)
    # plant a strong match so recall has signal to find
    for i in range(Q):
        j = rng.integers(0, N)
        q[i] += docs[j]
    vals, idx = sparse_ops.to_fixed_width(docs, NNZ)
    return q, docs, vals, idx, V


def _exact_topk(q, docs, k):
    s = q @ docs.T
    idx = np.argsort(-s, axis=1)[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def test_all_head_slab_matches_exact(slab_data):
    """d >= vocab => every term owns a column: the slab IS the dense matrix
    (modulo int8), so top-k must match the int8 exact scatter path."""
    q, docs, vals, idx, V = slab_data
    mesh = get_mesh()
    slab = SlabIndex(mesh, vals, idx, V, d=V + 128, head_frac=1.0)
    assert np.all(slab.sign == 1.0)
    v_s, i_s = slab.search(q, 10, fused=False, rescore=0)
    _, i_ref = _exact_topk(q, docs, 10)
    overlap = np.mean([
        len(set(np.asarray(i_s)[r]) & set(i_ref[r])) / 10
        for r in range(q.shape[0])
    ])
    assert overlap >= 0.95, overlap  # int8 quantization is the only error


def test_hashed_tail_slab_overlap(slab_data):
    """Realistic geometry: head columns for the top-mass terms, signed-hash
    buckets for the tail.  Top-10 overlap must stay high and the planted
    match must surface at rank 1."""
    q, docs, vals, idx, V = slab_data
    mesh = get_mesh()
    slab = SlabIndex(mesh, vals, idx, V, d=512, head_frac=0.75)
    v_s, i_s = slab.search(q, 10, fused=False, rescore=0)
    _, i_ref = _exact_topk(q, docs, 10)
    overlap = np.mean([
        len(set(np.asarray(i_s)[r]) & set(i_ref[r])) / 10
        for r in range(q.shape[0])
    ])
    assert overlap >= 0.8, overlap
    # the planted doc dominates its query: rank-1 agreement with exact
    assert np.mean(np.asarray(i_s)[:, 0] == i_ref[:, 0]) >= 0.9


def test_rescore_exact_matches_dense(slab_data):
    """rescore_exact (C++ or numpy) == dense dot at the candidate rows."""
    q, docs, vals, idx, V = slab_data
    rng = np.random.default_rng(3)
    cand = rng.integers(0, docs.shape[0], (q.shape[0], 7)).astype(np.int32)
    s = rescore_exact(vals, idx, cand, q)
    ref = np.take_along_axis(q @ docs.T, cand, axis=1)
    # vals are f16 (the fixed-width store dtype): ~1e-3 relative floor
    np.testing.assert_allclose(s, ref, rtol=2e-3, atol=2e-3)


def test_rescore_numpy_fallback_matches_native(slab_data, monkeypatch):
    q, docs, vals, idx, V = slab_data
    rng = np.random.default_rng(4)
    cand = rng.integers(0, docs.shape[0], (q.shape[0], 5)).astype(np.int32)
    s_native = rescore_exact(vals, idx, cand, q)
    import bergen_tpu.ops.sparse_slab as slab_mod
    monkeypatch.setattr(slab_mod, "_load_rescore_lib", lambda: None)
    s_np = rescore_exact(vals, idx, cand, q)
    np.testing.assert_allclose(s_native, s_np, rtol=1e-5, atol=1e-5)


def test_search_rescore_recovers_exact_topk(slab_data):
    """A deliberately narrow slab (heavy collisions) + stage-2 rescore must
    return the exact ranking: collisions only cost candidate recall, and at
    rescore x4 the true winners are safely inside the candidate set."""
    q, docs, vals, idx, V = slab_data
    mesh = get_mesh()
    slab = SlabIndex(mesh, vals, idx, V, d=256, head_frac=0.5)
    v_s, i_s = slab.search(q, 10, fused=False, rescore=8)
    v_ref, i_ref = _exact_topk(q, docs, 10)
    overlap = np.mean([
        len(set(np.asarray(i_s)[r]) & set(i_ref[r])) / 10
        for r in range(q.shape[0])
    ])
    assert overlap >= 0.97, overlap
    # returned scores are the EXACT sparse dots, not slab estimates
    ref_at = np.take_along_axis(q @ docs.T, np.asarray(i_s), axis=1)
    np.testing.assert_allclose(np.asarray(v_s), ref_at, rtol=2e-3, atol=2e-3)


def test_rescore_rejects_out_of_range_candidates(slab_data):
    q, docs, vals, idx, V = slab_data
    cand = np.asarray([[0, docs.shape[0]]], np.int32)  # second id = padding
    with pytest.raises(ValueError):
        rescore_exact(vals, idx, cand, q[:1])


def test_search_rescore_handles_device_padding(slab_data):
    """Tiny corpus on the 8-device mesh: per-shard padding rows outnumber
    valid docs, so stage-1 candidates INCLUDE padding ids — search must
    clamp them (regression: the C++ rescorer segfaulted on a padded id's
    garbage idx row)."""
    q, docs, vals, idx, V = slab_data
    mesh = get_mesh()
    n_small = 72  # 9 valid docs per shard, 119 padding rows
    slab = SlabIndex(mesh, vals[:n_small], idx[:n_small], V, d=256,
                     head_frac=0.5)
    v_s, i_s = slab.search(q, 5, fused=False, rescore=8)
    assert np.all(np.asarray(i_s) >= 0) and np.all(np.asarray(i_s) < n_small)
    _, i_ref = _exact_topk(q, docs[:n_small], 5)
    overlap = np.mean([
        len(set(np.asarray(i_s)[r]) & set(i_ref[r])) / 5
        for r in range(q.shape[0])
    ])
    assert overlap >= 0.97, overlap


def test_queries_to_slab_matches_projection(slab_data):
    q, docs, vals, idx, V = slab_data
    d = 384
    mass = term_impact_mass(vals, idx, V)
    bucket, sign = sketch_map(V, d, 0, term_mass=mass, head_frac=0.5)
    qs = queries_to_slab(q, bucket, sign, d)
    # reference: dense projection through the [V, d] signed indicator
    M = np.zeros((V, d), np.float32)
    M[np.arange(V), bucket] = sign
    np.testing.assert_allclose(qs, q @ M, rtol=1e-5, atol=1e-5)


def test_build_slab_chunking_consistent(slab_data):
    """Chunked build == single-chunk build, bit-for-bit."""
    _, _, vals, idx, V = slab_data
    mass = term_impact_mass(vals, idx, V)
    bucket, sign = sketch_map(V, 256, 0, term_mass=mass, head_frac=0.5)
    c1, s1 = build_slab_int8(vals, idx, bucket, sign, 256, chunk=1 << 20)
    c2, s2 = build_slab_int8(vals, idx, bucket, sign, 256, chunk=96)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(s1, s2)


def test_default_width():
    assert default_width(1 << 20, 30522) == 10240
    assert default_width(1 << 20, 30522, hbm_budget_bytes=4 << 30) == 4096
    # tiny vocab: width is capped just past the vocab (all-head regime)
    assert default_width(1000, 640) == 768
    assert default_width(1 << 30, 30522) >= 256


def test_splade_slab_pipeline_with_guard(tmp_path):
    """Pipeline-level slab path: sparse_method='slab' dispatches to the
    SlabIndex, the guard measures fidelity vs the exact densify reference,
    and self-retrieval (query == doc row) ranks the doc first."""
    from bergen_tpu.pipeline.retrieve import Retrieve
    from datasets import Dataset

    V, N, Q = 512, 384, 8

    class FakeSparseModel:
        is_sparse = True

        def encode_sparse(self, texts):
            rows = [int(t.split()[-1]) for t in texts]
            dense = np.zeros((len(rows), 16), np.float32)
            idx = np.zeros((len(rows), 16), np.int32)
            for j, r in enumerate(rows):
                rr = np.random.default_rng(r)
                idx[j] = rr.choice(V, 16, replace=False)
                dense[j] = rr.uniform(0.1, 2.0, 16)
            return dense.astype(np.float16), idx

        def encode(self, texts, query_or_doc):
            rows = [int(t.split()[-1]) for t in texts]
            out = np.zeros((len(rows), V), np.float32)
            for j, r in enumerate(rows):
                rr = np.random.default_rng(r % N)
                ix = rr.choice(V, 16, replace=False)
                out[j, ix] = rr.uniform(0.1, 2.0, 16)
            return out

        def get_clean_model_name(self):
            return "fakesplade"

    docs = Dataset.from_dict({
        "id": [f"d{i}" for i in range(N)],
        "content": [f"doc {i}" for i in range(N)],
    })
    qs = Dataset.from_dict({
        "id": [f"q{i}" for i in range(Q)],
        "content": [f"query {i}" for i in range(Q)],
    })
    r = Retrieve(model=FakeSparseModel(), batch_size=64, batch_size_sim=8,
                 sparse_method="slab", slab_d=640, slab_head_frac=0.8)
    out = r.retrieve({"query": qs, "doc": docs}, str(tmp_path / "qi"),
                     str(tmp_path / "di"), top_k=5)
    assert len(out["q_id"]) == Q
    assert out["fidelity"][0]["method"] == "slab"
    for i_, row in enumerate(out["doc_id"]):
        assert row[0] == f"d{i_}"
    # the slab cache landed next to the index for reuse
    import glob
    assert glob.glob(str(tmp_path / "di" / "slab_*.npz"))


def test_sparse_guard_records_terminal_exact_rung(tmp_path):
    """When the sparse ladder falls back to exact, the fidelity artifact
    must record the TERMINAL rung ({method: exact, fallback_from: ...}) —
    otherwise the artifact reads as if the failing approximate rung was
    what shipped (round-4 run C showed only {slab, 0.62})."""
    from bergen_tpu.pipeline.retrieve import Retrieve
    from datasets import Dataset

    V, N, Q = 512, 384, 8

    class FakeSparseModel:
        is_sparse = True

        def encode_sparse(self, texts):
            rows = [int(t.split()[-1]) for t in texts]
            dense = np.zeros((len(rows), 16), np.float32)
            idx = np.zeros((len(rows), 16), np.int32)
            for j, r in enumerate(rows):
                rr = np.random.default_rng(r)
                idx[j] = rr.choice(V, 16, replace=False)
                dense[j] = rr.uniform(0.1, 2.0, 16)
            return dense.astype(np.float16), idx

        def encode(self, texts, query_or_doc):
            rows = [int(t.split()[-1]) for t in texts]
            out = np.zeros((len(rows), V), np.float32)
            for j, r in enumerate(rows):
                rr = np.random.default_rng(r % N)
                ix = rr.choice(V, 16, replace=False)
                out[j, ix] = rr.uniform(0.1, 2.0, 16)
            return out

        def get_clean_model_name(self):
            return "fakesplade"

    docs = Dataset.from_dict({
        "id": [f"d{i}" for i in range(N)],
        "content": [f"doc {i}" for i in range(N)],
    })
    qs = Dataset.from_dict({
        "id": [f"q{i}" for i in range(Q)],
        "content": [f"query {i}" for i in range(Q)],
    })
    # an unreachable guard forces the full fallback ladder on batch 0
    r = Retrieve(model=FakeSparseModel(), batch_size=64, batch_size_sim=8,
                 sparse_method="slab", slab_d=640, slab_head_frac=0.8,
                 approx_recall_guard=1.1)
    out = r.retrieve({"query": qs, "doc": docs}, str(tmp_path / "qi"),
                     str(tmp_path / "di"), top_k=5)
    fid = out["fidelity"]
    assert fid[0]["method"] == "slab"
    term = fid[-1]
    assert term["method"] == "exact"
    assert term["overlap"] == 1.0
    assert term["fallback_from"] in ("slab", "int8")
    # exact results are the reference: self-retrieval must hold
    for i_, row in enumerate(out["doc_id"]):
        assert row[0] == f"d{i_}"


def test_slab_cache_roundtrip(tmp_path, slab_data):
    q, docs, vals, idx, V = slab_data
    mesh = get_mesh()
    cache = str(tmp_path / "slab.npz")
    s1 = SlabIndex(mesh, vals, idx, V, d=512, head_frac=0.75,
                   cache_path=cache)
    s2 = SlabIndex(mesh, vals, idx, V, d=512, head_frac=0.75,
                   cache_path=cache)
    np.testing.assert_array_equal(
        np.asarray(s1.codes_dev), np.asarray(s2.codes_dev)
    )
    v1, i1 = s1.search(q, 5, fused=False)
    v2, i2 = s2.search(q, 5, fused=False)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
