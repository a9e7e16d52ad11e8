"""SPLADE fixed-width sparse scoring: exactness vs dense brute force, the
sharded merge, and the full splade retrieval pipeline on the fixture corpus."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from bergen_tpu.ops import sparse as sparse_ops
from bergen_tpu.parallel import get_mesh

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def sparse_data():
    rng = np.random.default_rng(3)
    V, N, Q, NNZ = 512, 400, 8, 16
    dense_docs = np.zeros((N, V), dtype=np.float32)
    for i in range(N):
        pos = rng.choice(V, NNZ - 4, replace=False)
        dense_docs[i, pos] = rng.uniform(0.1, 2.0, size=NNZ - 4)
    q = np.zeros((Q, V), dtype=np.float32)
    for i in range(Q):
        pos = rng.choice(V, 12, replace=False)
        q[i, pos] = rng.uniform(0.1, 2.0, size=12)
    return q, dense_docs, V


def test_to_fixed_width_roundtrip(sparse_data):
    _, docs, V = sparse_data
    vals, idx = sparse_ops.to_fixed_width(docs, 16)
    assert vals.shape == (400, 16) and idx.dtype == np.int32
    # densify back == original (nnz larger than true nonzeros per row)
    rebuilt = np.zeros_like(docs)
    rows = np.arange(400)[:, None]
    np.add.at(rebuilt, (np.broadcast_to(rows, idx.shape), idx), vals.astype(np.float32))
    np.testing.assert_allclose(rebuilt, docs, atol=1e-3)


def test_sparse_topk_blocked_exact(sparse_data):
    q, docs, V = sparse_data
    vals, idx = sparse_ops.to_fixed_width(docs, 16)
    ref = q @ docs.T
    ref_top = np.sort(ref, axis=1)[:, ::-1][:, :10]
    v, i = sparse_ops.sparse_topk_blocked(
        jnp.asarray(q), jnp.asarray(vals.astype(np.float32)), jnp.asarray(idx),
        k=10, vocab=V, block=128,
    )
    np.testing.assert_allclose(np.asarray(v), ref_top, atol=5e-3)  # fp16 storage
    got = np.take_along_axis(ref, np.asarray(i), axis=1)
    np.testing.assert_allclose(got, ref_top, atol=5e-3)


def test_sharded_sparse_topk(sparse_data):
    q, docs, V = sparse_data
    vals, idx = sparse_ops.to_fixed_width(docs, 16)
    mesh = get_mesh()
    vals_dev, idx_dev, valid_n = sparse_ops.shard_sparse_corpus(
        mesh, vals.astype(np.float32), idx, dtype=jnp.float32
    )
    assert valid_n == 400
    v, i = sparse_ops.sharded_sparse_topk(
        mesh, jnp.asarray(q), vals_dev, idx_dev, k=25, vocab=V, block=64,
        valid_n=valid_n,
    )
    ref = q @ docs.T
    ref_top = np.sort(ref, axis=1)[:, ::-1][:, :25]
    np.testing.assert_allclose(np.asarray(v), ref_top, atol=5e-3)  # fp16 storage
    assert np.asarray(i).max() < 400


def test_splade_retrieval_pipeline(tmp_path):
    from tiny_models import build_tiny_bert
    from bergen_tpu.data.processors.ut import UT1Docs, UT1Queries
    from bergen_tpu.models.retrievers.splade import SpladeRetriever
    from bergen_tpu.pipeline.retrieve import Retrieve

    model_dir = build_tiny_bert(str(tmp_path / "m"), with_mlm=True)
    kw = dict(split="dev", out_folder=str(tmp_path / "ds"), num_proc=1,
              overwrite=False, debug=False, oracle_provenance=False,
              shuffle_labels=False)
    ds = {"query": UT1Queries(**kw).get_dataset(), "doc": UT1Docs(**kw).get_dataset()}

    r = SpladeRetriever(model_dir, max_len=64, nnz=64, batch_size=64)
    ret = Retrieve(model=r, batch_size=64, batch_size_sim=32)
    out = ret.retrieve(ds, str(tmp_path / "qi"), str(tmp_path / "di"), top_k=10)
    assert len(out["q_id"]) == 50 and all(len(d) == 10 for d in out["doc_id"])
    assert os.path.exists(tmp_path / "di" / "sparse_chunk_0.npz")
    # query side stays dense
    assert os.path.exists(tmp_path / "qi" / "embedding_chunk_0.npy")

    # exactness vs host brute force over the *stored* fixed-width vectors
    # (the nnz truncation is the format contract; a random-weight MLM activates
    # half the vocab, so full-dense comparison is meaningless here)
    q_dense = r.encode(list(ds["query"]["content"]), "query")
    d_vals, d_idx = ret.load_sparse_index(str(tmp_path / "di"), 1000)
    rebuilt = np.zeros((1000, r.cfg.vocab_size), dtype=np.float32)
    rows = np.broadcast_to(np.arange(1000)[:, None], d_idx.shape)
    np.add.at(rebuilt, (rows, d_idx), d_vals.astype(np.float32))
    vals_ref = np.sort(q_dense @ rebuilt.T, axis=1)[:, ::-1][:, :10]
    np.testing.assert_allclose(
        np.asarray(out["score"]), vals_ref, rtol=0.02, atol=0.05
    )


def test_splade_asymmetric_query_encoder(tmp_path):
    """efficient-splade (config splade-efficient.yaml) encodes queries with a
    separate checkpoint; docs must use the doc encoder, queries the query one."""
    from tiny_models import build_tiny_bert
    from bergen_tpu.models.retrievers.splade import SpladeRetriever

    doc_dir = build_tiny_bert(str(tmp_path / "d"), with_mlm=True, seed=0)
    q_dir = build_tiny_bert(str(tmp_path / "q"), with_mlm=True, seed=7)
    sym = SpladeRetriever(doc_dir, max_len=32, nnz=16, batch_size=8)
    asym = SpladeRetriever(doc_dir, max_len=32, nnz=16, batch_size=8,
                           query_encoder_name=q_dir)
    texts = ["alpha beta", "gamma delta epsilon"]
    np.testing.assert_allclose(
        asym.encode(texts, "doc"), sym.encode(texts, "doc"), atol=1e-6
    )
    q_sym = sym.encode(texts, "query")
    q_asym = asym.encode(texts, "query")
    assert np.abs(q_sym - q_asym).max() > 1e-3  # different weights, different output


def test_sparse_int8_parity(sparse_data):
    """int8 densify + int8 MXU GEMM matches the bf16 exact ranking on
    SPLADE-like positive values (round-3: the fast exact path)."""
    q, docs, V = sparse_data
    vals, idx = sparse_ops.to_fixed_width(docs, 16)
    codes, scales = sparse_ops.quantize_sparse_int8(vals)
    from bergen_tpu.ops.scoring import quantize_rows_int8

    q_i8, q_scale = quantize_rows_int8(jnp.asarray(q))
    v8, i8 = sparse_ops.sparse_topk_blocked(
        q_i8, jnp.asarray(codes), jnp.asarray(idx), k=10, vocab=V,
        block=128, doc_scales=jnp.asarray(scales),
    )
    v8 = np.asarray(v8) * np.asarray(q_scale)[:, None]
    ref = q @ docs.T
    ref_top = np.sort(ref, axis=1)[:, ::-1][:, :10]
    # int8 codes: ~1% relative tolerance on scores, high rank overlap
    np.testing.assert_allclose(v8, ref_top, rtol=0.05, atol=0.05)
    exact_i = np.argsort(-ref, axis=1)[:, :10]
    ov = np.mean([
        len(set(np.asarray(i8)[r]) & set(exact_i[r])) / 10
        for r in range(q.shape[0])
    ])
    assert ov >= 0.9


def test_sharded_sparse_int8(sparse_data):
    q, docs, V = sparse_data
    vals, idx = sparse_ops.to_fixed_width(docs, 16)
    mesh = get_mesh()
    codes_dev, idx_dev, scales_dev, valid_n = sparse_ops.shard_sparse_corpus(
        mesh, vals, idx, dtype=jnp.int8
    )
    v, i = sparse_ops.sharded_sparse_topk(
        mesh, jnp.asarray(q), codes_dev, idx_dev, 10, V, valid_n=valid_n,
        doc_scales=scales_dev,
    )
    ref = q @ docs.T
    exact_i = np.argsort(-ref, axis=1)[:, :10]
    ov = np.mean([
        len(set(np.asarray(i)[r]) & set(exact_i[r])) / 10
        for r in range(q.shape[0])
    ])
    assert ov >= 0.9


def test_sketch_index_rescoring_exact(sparse_data):
    """SketchIndex stage-2 rescoring is exact sparse math: any candidate's
    returned score equals the host dot product (sketch only affects WHICH
    candidates surface, and the pipeline guard measures that)."""
    from bergen_tpu.ops.sparse_sketch import SketchIndex

    q, docs, V = sparse_data
    vals, idx = sparse_ops.to_fixed_width(docs, 16)
    mesh = get_mesh()
    ski = SketchIndex(mesh, vals, idx, V, d=256, candidates=64)
    v, i = ski.search(q, 10)
    v, i = np.asarray(v), np.asarray(i)
    ref = q @ docs.T
    for r in range(q.shape[0]):
        # at this tiny scale each 128-row shard yields ~1 bin candidate, so
        # fewer than k finite results can come back (-inf padded); the
        # pipeline guard handles that by falling back — here we check the
        # invariant that every finite score is the exact sparse dot product
        ok = np.isfinite(v[r])
        assert ok.any()
        np.testing.assert_allclose(
            v[r][ok], ref[r, i[r][ok]], rtol=0.02, atol=0.02
        )  # bf16 vals on device
        vi = i[r][ok]
        assert len(set(vi)) == len(vi)  # no duplicate docs


def test_splade_sketch_pipeline_with_guard(tmp_path, monkeypatch):
    """Pipeline-level sparse sketch path: guard compares vs the exact
    densify reference and records fidelity; a poor sketch falls back."""
    from bergen_tpu.pipeline.retrieve import Retrieve
    from datasets import Dataset

    rng = np.random.default_rng(5)
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
            # queries: dense [Q, V] sharing support with doc rows
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
                 sparse_method="sketch", sketch_d=256, sketch_candidates=64)
    out = r.retrieve({"query": qs, "doc": docs}, str(tmp_path / "qi"),
                     str(tmp_path / "di"), top_k=5)
    assert len(out["q_id"]) == Q
    assert out["fidelity"][0]["method"] == "sketch"
    # queries are doc rows -> their own doc must rank first whatever engine
    # the guard settled on (sketch stage 2 rescoring is exact)
    for i_, row in enumerate(out["doc_id"]):
        assert row[0] == f"d{i_}"


def test_splade_slab_pipeline_with_guard(tmp_path):
    """Pipeline-level wide-slab path (the shipped TPU default for sparse
    retrieval): SlabIndex build + search through Retrieve, guard fidelity
    recorded, stage-2 exact rescore making the returned ranking exact."""
    from datasets import Dataset

    from bergen_tpu.pipeline.retrieve import Retrieve

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
                 sparse_method="slab")
    out = r.retrieve({"query": qs, "doc": docs}, str(tmp_path / "qi"),
                     str(tmp_path / "di"), top_k=5)
    assert len(out["q_id"]) == Q
    assert out["fidelity"][0]["method"] == "slab"
    # guard measured against the host fp32 exact reference; the slab path's
    # exact stage-2 rescore should make fidelity ~1.0 here
    assert out["fidelity"][0]["overlap"] >= 0.99
    for i_, row in enumerate(out["doc_id"]):
        assert row[0] == f"d{i_}"  # each query IS doc i -> exact top-1
    # the slab cache must be keyed by its map (rebuild-safe): one file lands
    # next to the doc index
    import glob as _g
    assert _g.glob(str(tmp_path / "di" / "slab_*.npz"))


def test_partitioned_sketch_recall_and_cache_key(tmp_path):
    """Frequency-partitioned sketch map: (a) dedicated head buckets lift
    stage-1 candidate recall over the uniform count-sketch on Zipf-shaped
    term mass, (b) the doc-sketch cache is keyed by the map so a cache
    built under one head_frac is never reused with another's query map."""
    from bergen_tpu.ops.sparse_sketch import SketchIndex

    rng = np.random.default_rng(3)
    V, N, nnz, Q, k = 2048, 4096, 24, 32, 10
    pop = 1.0 / (np.arange(1, V + 1) ** 0.9)
    pop /= pop.sum()
    idx = rng.choice(V, size=(N, nnz), p=pop).astype(np.int32)
    vals = rng.gamma(2.0, 0.5, size=(N, nnz)).astype(np.float32)
    q_dense = np.zeros((Q, V), np.float32)
    for i in range(Q):
        qi = rng.choice(V, 16, p=pop)
        q_dense[i, qi] = rng.gamma(2.0, 0.5, 16)
    dd = np.zeros((N, V), np.float32)
    np.add.at(dd, (np.repeat(np.arange(N), nnz), idx.ravel()), vals.ravel())
    true_top = np.argsort(-(q_dense @ dd.T), axis=1)[:, :k]
    mesh = get_mesh()

    def recall(head_frac):
        si = SketchIndex(mesh, vals, idx, V, d=128, candidates=64,
                         head_frac=head_frac)
        _, i = si.search(q_dense, k)
        i = np.asarray(i)
        return np.mean([len(set(i[q]) & set(true_top[q])) / k
                        for q in range(Q)])

    r_uniform, r_part = recall(0.0), recall(0.5)
    assert r_part > r_uniform, (r_part, r_uniform)

    # cache keying: two different maps under the same cache_path must write
    # two distinct files (shape alone cannot distinguish them)
    base = str(tmp_path / "sk.npy")
    SketchIndex(mesh, vals, idx, V, d=128, head_frac=0.0, cache_path=base)
    SketchIndex(mesh, vals, idx, V, d=128, head_frac=0.5, cache_path=base)
    import glob
    assert len(glob.glob(str(tmp_path / "sk_*.npy"))) == 2
