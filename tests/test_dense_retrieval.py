"""End-to-end dense retrieval on the fixture corpus with a tiny local BERT:
encode → shard-resident corpus → distributed top-k → TREC artifacts."""

import os

import numpy as np
import pytest

from bergen_tpu import utils
from bergen_tpu.models.retrievers.dense import DenseRetriever
from bergen_tpu.pipeline.retrieve import Retrieve


@pytest.fixture(scope="module")
def tiny_bert_dir(tmp_path_factory):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tiny_models import build_tiny_bert

    return build_tiny_bert(str(tmp_path_factory.mktemp("m") / "bert"))


@pytest.fixture(scope="module")
def ut_datasets(tmp_path_factory):
    from bergen_tpu.data.processors.ut import UT1Docs, UT1Queries

    out = str(tmp_path_factory.mktemp("ds"))
    kw = dict(split="dev", out_folder=out, num_proc=1, overwrite=False,
              debug=False, oracle_provenance=False, shuffle_labels=False)
    return {"query": UT1Queries(**kw).get_dataset(), "doc": UT1Docs(**kw).get_dataset()}


def test_dense_encode_shapes_and_determinism(tiny_bert_dir):
    r = DenseRetriever(tiny_bert_dir, max_len=64, pooler="mean", similarity="cos",
                       batch_size=16)
    texts = ["What is the capital of Avaria?", "a short one"]
    e1 = r.encode(texts, "query")
    e2 = r.encode(texts, "query")
    assert e1.shape == (2, r.embedding_dim)
    np.testing.assert_allclose(e1, e2, atol=1e-6)
    # cosine similarity → unit norm
    np.testing.assert_allclose(np.linalg.norm(e1, axis=1), 1.0, atol=1e-5)


def test_batch_order_independence(tiny_bert_dir):
    """Length-sorted batching must not permute outputs."""
    r = DenseRetriever(tiny_bert_dir, max_len=64, batch_size=4)
    texts = [f"word " * (i % 7 + 1) + "tail" for i in range(13)]
    all_at_once = r.encode(texts, "doc")
    one_by_one = np.stack([r.encode([t], "doc")[0] for t in texts])
    np.testing.assert_allclose(all_at_once, one_by_one, atol=1e-4)


def test_index_and_retrieve_e2e(tiny_bert_dir, ut_datasets, tmp_path):
    r = DenseRetriever(tiny_bert_dir, max_len=64, pooler="mean", similarity="dot",
                       batch_size=64)
    ret = Retrieve(model=r, batch_size=64, batch_size_sim=32)
    qp = str(tmp_path / "qidx")
    dp = str(tmp_path / "didx")
    out = ret.retrieve(ut_datasets, qp, dp, top_k=20)
    assert len(out["q_id"]) == 50
    assert all(len(d) == 20 for d in out["doc_id"])
    # scores descending
    s = out["score"]
    assert np.all(np.diff(s, axis=1) <= 1e-6)
    # shards exist and reload completely
    assert os.path.exists(os.path.join(dp, "embedding_chunk_0.npy"))
    assert ret._index_complete(dp, 1000)
    assert not ret._index_complete(dp, 999)

    # second retrieve hits the index cache (delete model to prove no encoding)
    ret2 = Retrieve(model=r, batch_size=64, batch_size_sim=64)
    out2 = ret2.retrieve(ut_datasets, qp, dp, top_k=20)
    np.testing.assert_allclose(out2["score"], out["score"], atol=1e-5)

    # brute-force agreement
    q_emb = ret.load_index(qp, 50)
    d_emb = ret.load_index(dp, 1000)
    ref_scores = q_emb @ d_emb.T
    ref_top = np.sort(ref_scores, axis=1)[:, ::-1][:, :20]
    np.testing.assert_allclose(s, ref_top, atol=1e-3)

    # TREC round trip
    trec = str(tmp_path / "run.trec")
    utils.write_trec(trec, out["q_id"], out["doc_id"], out["score"].tolist())
    q_ids, d_ids, scores = utils.load_trec(trec)
    assert len(q_ids) == 50 and len(d_ids[0]) == 20
