"""C++ BM25 inverted index: analysis, scoring sanity, persistence, and the
full pipeline (README quickstart config shape: bm25 + generator)."""

import json
import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bergen_tpu.models.retrievers.bm25 import BM25


@pytest.fixture(scope="module")
def tiny_corpus():
    import datasets as hfds

    docs = hfds.Dataset.from_dict(
        {
            "id": ["d1", "d2", "d3", "d4"],
            "content": [
                "the capital of france is paris",
                "paris is a city in france with museums",
                "berlin is the capital of germany",
                "a completely unrelated document about rivers and mountains",
            ],
        }
    )
    queries = hfds.Dataset.from_dict(
        {"id": ["q1", "q2"], "content": ["capital of france", "rivers mountains"]}
    )
    return queries, docs


def test_build_search_rank(tmp_path, tiny_corpus):
    queries, docs = tiny_corpus
    bm = BM25()
    idx = str(tmp_path / "idx" / "bm25.idx")
    bm.build_index(list(docs["content"]), idx)
    bm.open_index(idx)
    out = bm.search(queries, docs, top_k=3)
    assert out["q_id"] == ["q1", "q2"]
    # q1 should rank d1 (capital+france) top; d4 shouldn't appear
    assert out["doc_id"][0][0] == "d1"
    assert "d4" not in out["doc_id"][0]
    # q2 → d4 top
    assert out["doc_id"][1][0] == "d4"
    # scores descending
    for s in out["score"]:
        assert all(a >= b for a, b in zip(s, s[1:]))


def test_persistence_roundtrip(tmp_path, tiny_corpus):
    queries, docs = tiny_corpus
    bm = BM25()
    idx = str(tmp_path / "i" / "bm25.idx")
    bm.build_index(list(docs["content"]), idx)
    bm.open_index(idx)
    out1 = bm.search(queries, docs, top_k=4)
    bm2 = BM25()
    bm2.open_index(idx)
    out2 = bm2.search(queries, docs, top_k=4)
    assert out1 == out2


def test_idf_term_saturation(tmp_path):
    """A term appearing in every doc contributes near-zero idf; rare terms
    dominate (Lucene BM25 formula check)."""
    import datasets as hfds

    docs = hfds.Dataset.from_dict(
        {
            "id": [f"d{i}" for i in range(10)],
            "content": ["common word here"] * 9 + ["common special here"],
        }
    )
    queries = hfds.Dataset.from_dict({"id": ["q"], "content": ["common special"]})
    bm = BM25()
    idx = str(tmp_path / "x" / "bm25.idx")
    bm.build_index(list(docs["content"]), idx)
    bm.open_index(idx)
    out = bm.search(queries, docs, top_k=10)
    assert out["doc_id"][0][0] == "d9"  # the only doc with 'special'
    top, second = out["score"][0][0], out["score"][0][1]
    assert top > 4 * second  # rare-term idf dwarfs the ubiquitous term


def test_stemming_and_stopwords(tmp_path):
    import datasets as hfds

    docs = hfds.Dataset.from_dict(
        {"id": ["d1", "d2"],
         "content": ["running runner runs", "swimming swimmers swim"]}
    )
    queries = hfds.Dataset.from_dict(
        {"id": ["q1"], "content": ["the run"]}  # 'the' is a stopword; run→run
    )
    bm = BM25()
    idx = str(tmp_path / "s" / "bm25.idx")
    bm.build_index(list(docs["content"]), idx)
    bm.open_index(idx)
    out = bm.search(queries, docs, top_k=2)
    assert out["doc_id"][0][0] == "d1"  # 'running'/'runs' stem to 'run'


def test_bm25_full_pipeline(tmp_path, repo_root):
    """README quickstart shape: dataset=ut1 retriever=bm25 generator=oracle."""
    from test_pipeline_e2e import compose, finished_exp, run_main

    cfg = compose(
        tmp_path, repo_root,
        "retriever=bm25",
        "generator=oracle_answer",
        "retrieve_top_k=10", "rerank_top_k=10", "generation_top_k=5",
    )
    run_main(cfg)
    exp = finished_exp(tmp_path)
    rmetrics = json.load(open(os.path.join(exp, "eval_dev_ranking_metrics.json")))
    # lexical retrieval on the synthetic corpus should be near-perfect:
    # gold doc contains the exact question words
    assert rmetrics["P_1"] > 0.9
    assert rmetrics["recall_5"] > 0.9


def test_batch_search_matches_single(tmp_path):
    """Threaded batch_search must return exactly the single-query results
    (per-thread Scratch/Analyzer; dense accumulator reset between queries)."""
    import ctypes

    import numpy as np

    rng = __import__("numpy").random.default_rng(0)
    vocab = [f"w{i}" for i in range(200)]
    docs = [" ".join(rng.choice(vocab, size=30)) for _ in range(300)]
    queries = [" ".join(rng.choice(vocab, size=5)) for _ in range(40)]
    # repeated-term query: the accumulator must add the term twice
    queries.append(vocab[0] + " " + vocab[0] + " " + vocab[1])

    bm = BM25()
    idx = str(tmp_path / "idx.bin")
    bm.build_index(docs, idx)
    bm.open_index(idx)

    k = 10
    bdocs, bscores = bm.batch_search(queries, k, threads=4)
    docs_buf = (ctypes.c_int32 * k)()
    scores_buf = (ctypes.c_float * k)()
    for r, q in enumerate(queries):
        bm.lib.bm25_search(bm._handle, q.encode(), k, docs_buf, scores_buf)
        assert list(bdocs[r]) == list(docs_buf), (r, q)
        np.testing.assert_array_equal(bscores[r], np.asarray(scores_buf))
