"""Regression tests for the code-review findings (serving bucket overflow,
COCOM BOS-slot alignment, resume chunk alignment, sparse return_embeddings,
XRAG loud failure)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def test_server_handles_prompt_longer_than_buckets():
    import jax
    import jax.numpy as jnp

    from bergen_tpu.models import llama
    from bergen_tpu.serve import GenerationServer

    cfg = llama.LlamaConfig(
        vocab_size=64, hidden_size=32, num_layers=1, num_heads=2,
        num_kv_heads=1, intermediate_size=48, max_position_embeddings=256,
    )
    params = llama.init(jax.random.PRNGKey(0), cfg)
    server = GenerationServer(params, cfg, eos_token_id=2, pad_token_id=0,
                              max_slots=1, max_len=64, prompt_buckets=(16, 32))
    rng = np.random.default_rng(0)
    # 50-token prompt > largest bucket (32) — must truncate to the tail, not crash
    rid = server.submit(list(rng.integers(3, 64, size=50)), 3)
    out = server.run()
    assert rid in out and 1 <= len(out[rid]) <= 3


def test_resume_chunk_alignment(tmp_path):
    """continue_batch resume must produce a complete, correct index even when
    the crash happened after a chunk flush."""
    from bergen_tpu.pipeline import retrieve as retrieve_mod
    from bergen_tpu.pipeline.retrieve import Retrieve

    class FakeModel:
        model_name = "fake"

        def encode(self, texts, query_or_doc):
            return np.asarray([[float(t)] * 4 for t in texts], np.float32)

        def get_clean_model_name(self):
            return "fake"

    import datasets as hfds

    docs = hfds.Dataset.from_dict(
        {"id": [str(i) for i in range(100)],
         "content": [str(i) for i in range(100)]}
    )
    old = retrieve_mod.CHUNK_DOCS
    retrieve_mod.CHUNK_DOCS = 30  # chunk_rows = 30//8*8 = 24 with batch 8
    try:
        # full index as ground truth
        full = Retrieve(model=FakeModel(), batch_size=8)
        full.index(docs, "doc", str(tmp_path / "full"))
        ref = full.load_index(str(tmp_path / "full"), 100)

        # simulate a crash: encode only the first 5 batches (40 rows: chunk 0
        # flushed at 24 rows, 16 rows buffered-but-lost)
        partial_dir = str(tmp_path / "partial")
        crash = Retrieve(model=FakeModel(), batch_size=8)
        texts = docs["content"]
        buf, buf_rows, chunk_id = [], 0, 0
        os.makedirs(partial_dir)
        for s in range(0, 40, 8):
            emb = crash.model.encode(texts[s : s + 8], "doc")
            buf.append(emb.astype(np.float16))
            buf_rows += 8
            if buf_rows >= 24:
                np.save(os.path.join(partial_dir, f"embedding_chunk_{chunk_id}.npy"),
                        np.concatenate(buf))
                buf, buf_rows, chunk_id = [], 0, chunk_id + 1

        resumed = Retrieve(model=FakeModel(), batch_size=8, continue_batch=5)
        resumed.index(docs, "doc", partial_dir)
        out = resumed.load_index(partial_dir, 100)
        np.testing.assert_allclose(out, ref, atol=1e-3)
    finally:
        retrieve_mod.CHUNK_DOCS = old


def test_cocom_slots_skip_bos(tmp_path):
    from tiny_models import build_tiny_llama
    from bergen_tpu.models.generators.llm_cocom import COCOM

    model_dir = build_tiny_llama(str(tmp_path / "llama"))
    gen = COCOM(model_dir, batch_size=1, max_new_tokens=2, max_length=64,
                mem_tokens=4)
    # the prompt's placeholder count must equal mem_tokens * n_docs even when
    # the tokenizer prepends BOS==pad
    prompt, _ = gen.format_instruction({"query": "q", "doc": ["d"]})
    enc = gen.tokenizer(prompt, return_tensors="np")
    ii = enc["input_ids"][0]
    matches = np.where(ii == gen.tokenizer.pad_token_id)[0]
    # last mem_tokens matches are the placeholders; they must be contiguous
    slots = matches[-4:]
    assert np.all(np.diff(slots) == 1)


def test_xrag_raises_without_retriever(tmp_path):
    import datasets as hfds

    from tiny_models import build_tiny_llama
    from bergen_tpu.models.generators.llm_xrag import XRAG

    model_dir = build_tiny_llama(str(tmp_path / "llama"))
    gen = XRAG(model_dir, retriever_name=None, batch_size=1, max_new_tokens=2,
               max_length=64)
    ds = hfds.Dataset.from_dict(
        {"q_id": ["q"], "query": ["x"], "doc": [["some doc"]],
         "label": [["y"]], "ranking_labels": [None]}
    )
    with pytest.raises(RuntimeError, match="retriever"):
        gen.eval(ds)
