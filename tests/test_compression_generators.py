"""COCOM / xRAG compression generators: soft-prompt injection mechanics with
tiny local models."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_llama_dir(tmp_path_factory):
    from tiny_models import build_tiny_llama

    return build_tiny_llama(str(tmp_path_factory.mktemp("m") / "llama"))


def _mini_dataset():
    import datasets as hfds

    return hfds.Dataset.from_dict(
        {
            "q_id": ["q0", "q1"],
            "query": ["what is the capital of avaria", "capital of borundi"],
            "doc": [["the capital of avaria is ashford"],
                    ["the capital of borundi is blackwell"]],
            "label": [["Ashford"], ["Blackwell"]],
            "ranking_labels": [None, None],
        }
    )


def test_cocom_eval_runs(tiny_llama_dir):
    from bergen_tpu.models.generators.llm_cocom import COCOM

    gen = COCOM(tiny_llama_dir, batch_size=2, max_new_tokens=3,
                max_length=64, mem_tokens=4)
    mem = gen.compress_docs(["the capital of avaria is ashford"])
    assert mem.shape == (1, 4, gen.cfg.hidden_size)
    q_ids, _, instructions, responses, _, _ = gen.eval(_mini_dataset())
    assert q_ids == ["q0", "q1"]
    assert all(isinstance(r, str) for r in responses)
    # memory placeholder made it into the prompt
    assert gen.tokenizer.pad_token in instructions[0]


def test_cocom_memory_changes_output(tiny_llama_dir):
    """Injected memory embeddings must actually influence generation."""
    from bergen_tpu.models.generators.llm_cocom import COCOM
    import datasets as hfds

    gen = COCOM(tiny_llama_dir, batch_size=1, max_new_tokens=8,
                max_length=64, mem_tokens=4)
    d1 = hfds.Dataset.from_dict(
        {"q_id": ["q"], "query": ["the capital"],
         "doc": [["ashford ashford ashford ashford ashford"]],
         "label": [["x"]], "ranking_labels": [None]}
    )
    d2 = hfds.Dataset.from_dict(
        {"q_id": ["q"], "query": ["the capital"],
         "doc": [["blackwell harbor museum river festival"]],
         "label": [["x"]], "ranking_labels": [None]}
    )
    _, _, _, r1, _, _ = gen.eval(d1)
    _, _, _, r2, _, _ = gen.eval(d2)
    # different doc memories → (almost surely) different continuations for a
    # random model; identical output would mean the injection is dead
    assert r1 != r2


def test_xrag_eval_runs(tiny_llama_dir, tmp_path):
    from tiny_models import build_tiny_bert
    from bergen_tpu.models.generators.llm_xrag import XRAG

    bert = build_tiny_bert(str(tmp_path / "bert"))
    gen = XRAG(tiny_llama_dir, retriever_name=bert, batch_size=2,
               max_new_tokens=3, max_length=64)
    q_ids, _, instructions, responses, _, _ = gen.eval(_mini_dataset())
    assert q_ids == ["q0", "q1"]
    assert "<xRAG>" in instructions[0]
    assert all(isinstance(r, str) for r in responses)
