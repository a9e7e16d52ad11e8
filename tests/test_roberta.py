"""XLM-RoBERTa family parity (pad-aware positions) — backs bge-m3 and
bge-reranker-v2-m3."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from bergen_tpu.models import bert, convert


@pytest.fixture(scope="module")
def tiny_xlmr():
    from transformers import XLMRobertaConfig, XLMRobertaModel

    torch.manual_seed(0)
    hf_cfg = XLMRobertaConfig(
        vocab_size=128, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
    )
    model = XLMRobertaModel(hf_cfg).eval()
    cfg = bert.BertConfig.from_hf(hf_cfg)
    params = convert.bert_from_hf(model.state_dict(), cfg.num_layers)
    return model, cfg, params


def test_config_detects_roberta(tiny_xlmr):
    _, cfg, _ = tiny_xlmr
    assert cfg.roberta_positions and cfg.pad_token_id == 1


def test_hidden_states_parity_with_padding(tiny_xlmr):
    model, cfg, params = tiny_xlmr
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 128, (2, 14)).astype(np.int32)
    am = np.ones((2, 14), np.int32)
    am[1, 9:] = 0
    ids = np.where(am, ids, 1)  # pad id 1
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am)
        ).last_hidden_state.numpy()
    out = np.asarray(
        bert.encode(params, cfg, jnp.asarray(ids), jnp.asarray(am))
    )
    valid = am.astype(bool)
    np.testing.assert_allclose(out[valid], ref[valid], atol=3e-4, rtol=1e-3)


def test_classification_parity(tiny_xlmr):
    from transformers import XLMRobertaConfig, XLMRobertaForSequenceClassification

    torch.manual_seed(1)
    hf_cfg = XLMRobertaConfig(
        vocab_size=128, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
        num_labels=1,
    )
    model = XLMRobertaForSequenceClassification(hf_cfg).eval()
    cfg = bert.BertConfig.from_hf(hf_cfg)
    params = convert.bert_from_hf(model.state_dict(), cfg.num_layers)
    ids = np.array([[0, 10, 11, 2], [0, 12, 2, 1]], np.int32)
    am = np.array([[1, 1, 1, 1], [1, 1, 1, 0]], np.int32)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am)
        ).logits.numpy()
    # roberta classification head: dense+tanh on CLS then out_proj — matches
    # the bert pooler+classifier structure after conversion
    out = np.asarray(
        bert.classify(params, cfg, jnp.asarray(ids), jnp.asarray(am))
    )
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-3)
