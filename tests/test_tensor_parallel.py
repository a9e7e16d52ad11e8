"""Tensor-parallel generation on the virtual mesh: tp=2 must produce the same
tokens as tp=1 (validates param_shardings + TP collectives end to end)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def test_tp2_generation_matches_tp1(tmp_path):
    from tiny_models import build_tiny_llama
    from bergen_tpu import confy
    from bergen_tpu.models.generators.jax_llm import LLM

    model_dir = build_tiny_llama(str(tmp_path / "llama"))
    prompt = confy.Config(
        {
            "system": "sys", "user": 'f"Q: {question}"',
            "system_without_docs": "sys", "user_without_docs": 'f"Q: {question}"',
        }
    )
    prompts = ["what is the capital of avaria", "the harbor of borundi"]
    gen1 = LLM(model_dir, batch_size=2, max_new_tokens=6, max_length=64,
               prompt=prompt, tp=1)
    out1 = gen1.generate(prompts)
    gen2 = LLM(model_dir, batch_size=2, max_new_tokens=6, max_length=64,
               prompt=prompt, tp=2)
    # params actually sharded over the model axis
    import jax

    q_shard = gen2.params["layers"][0]["attn"]["q"]["kernel"].sharding
    assert "model" in str(q_shard.spec)
    out2 = gen2.generate(prompts)
    assert out1 == out2
