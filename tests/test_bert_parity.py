"""Numerics-parity tests: bergen_tpu JAX forwards vs HF torch forwards with the
same (randomly initialised, locally constructed) weights — the offline stand-in
for converted hub checkpoints (SURVEY.md §7 'hard parts': weight conversion +
numerics parity)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from bergen_tpu.models import bert, convert


@pytest.fixture(scope="module")
def tiny_hf_bert():
    from transformers import BertConfig, BertForMaskedLM

    torch.manual_seed(0)
    cfg = BertConfig(
        vocab_size=200, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=96, type_vocab_size=2,
    )
    model = BertForMaskedLM(cfg).eval()
    return cfg, model


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(1)
    input_ids = rng.integers(3, 200, size=(4, 24))
    attention_mask = np.ones((4, 24), dtype=np.int32)
    attention_mask[1, 18:] = 0  # padded sample
    attention_mask[3, 10:] = 0
    input_ids = np.where(attention_mask, input_ids, 0)
    return input_ids, attention_mask


def test_bert_hidden_states_parity(tiny_hf_bert, batch):
    cfg, model = tiny_hf_bert
    input_ids, attention_mask = batch
    with torch.no_grad():
        ref = model.bert(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
        ).last_hidden_state.numpy()

    jcfg = bert.BertConfig.from_hf(cfg)
    params = convert.bert_from_hf(model.state_dict(), jcfg.num_layers)
    out = np.asarray(
        bert.encode(params, jcfg, jnp.asarray(input_ids), jnp.asarray(attention_mask))
    )
    # padded positions attend differently in HF (they still produce outputs);
    # compare only valid positions
    valid = attention_mask.astype(bool)
    np.testing.assert_allclose(out[valid], ref[valid], atol=2e-4, rtol=1e-3)


def test_bert_mlm_logits_parity(tiny_hf_bert, batch):
    cfg, model = tiny_hf_bert
    input_ids, attention_mask = batch
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
        ).logits.numpy()

    jcfg = bert.BertConfig.from_hf(cfg)
    params = convert.bert_from_hf(model.state_dict(), jcfg.num_layers)
    hidden = bert.encode(
        params, jcfg, jnp.asarray(input_ids), jnp.asarray(attention_mask)
    )
    logits = np.asarray(bert.mlm_logits(params, jcfg, hidden))
    valid = attention_mask.astype(bool)
    np.testing.assert_allclose(logits[valid], ref[valid], atol=5e-4, rtol=1e-2)


def test_poolers(batch):
    hidden = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 8)), jnp.float32)
    mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]])
    mean = bert.mean_pool(hidden, mask)
    np.testing.assert_allclose(
        np.asarray(mean[0]), np.asarray(hidden[0, :3].mean(0)), atol=1e-6
    )
    cls = bert.cls_pool(hidden, mask)
    np.testing.assert_allclose(np.asarray(cls), np.asarray(hidden[:, 0]))


def test_splade_pool_matches_reference_semantics():
    # max over seq of log(1+relu(logits)) * mask (reference splade.py:42-43)
    logits = jnp.asarray(
        [[[1.0, -2.0], [3.0, 0.5]], [[0.0, 9.0], [4.0, -1.0]]], jnp.float32
    )
    mask = jnp.asarray([[1, 0], [1, 1]])
    out = np.asarray(bert.splade_pool(logits, mask))
    expect = np.array(
        [[np.log1p(1.0), 0.0], [np.log1p(4.0), np.log1p(9.0)]], dtype=np.float32
    )
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_classification_head_parity(batch):
    from transformers import BertConfig, BertForSequenceClassification

    torch.manual_seed(2)
    cfg = BertConfig(
        vocab_size=200, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=96, num_labels=1,
    )
    model = BertForSequenceClassification(cfg).eval()
    input_ids, attention_mask = batch
    tt = np.zeros_like(input_ids)
    tt[:, 12:] = 1  # (q, doc) pair segment ids
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
            token_type_ids=torch.tensor(tt),
        ).logits.numpy()

    jcfg = bert.BertConfig.from_hf(cfg)
    params = convert.bert_from_hf(model.state_dict(), jcfg.num_layers)
    logits = np.asarray(
        bert.classify(
            params, jcfg, jnp.asarray(input_ids), jnp.asarray(attention_mask),
            jnp.asarray(tt),
        )
    )
    np.testing.assert_allclose(logits, ref, atol=2e-4, rtol=1e-3)


def test_distilbert_hidden_states_parity(batch):
    """DistilBERT (tasb backbone) maps onto the same BERT block: no token-type
    embeddings, renamed keys (reference config/retriever/tasb.yaml)."""
    from transformers import DistilBertConfig, DistilBertModel

    torch.manual_seed(0)
    cfg = DistilBertConfig(
        vocab_size=200, dim=64, n_layers=3, n_heads=4, hidden_dim=128,
        max_position_embeddings=96,
    )
    model = DistilBertModel(cfg).eval()
    input_ids, attention_mask = batch
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
        ).last_hidden_state.numpy()

    jcfg = bert.BertConfig.from_hf(cfg)
    assert jcfg.type_vocab_size == 0
    params = convert.bert_from_hf(model.state_dict(), jcfg.num_layers)
    assert "token_type" not in params["embeddings"]
    out = np.asarray(
        bert.encode(params, jcfg, jnp.asarray(input_ids), jnp.asarray(attention_mask))
    )
    valid = attention_mask.astype(bool)
    np.testing.assert_allclose(out[valid], ref[valid], atol=2e-4, rtol=1e-3)
