"""Parity of the rope-BERT (GTE-v1.5 / nomic) and ALiBi-BERT (jina-v2)
encoders vs local torch replicas of the remote-code architectures
(tests/remote_archs.py — the reference loads these with trust_remote_code,
config/retriever/gte-base-en-v1.5.yaml etc.)."""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from bergen_tpu.models import bert, convert

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from remote_archs import GteReplica, JinaReplica, NomicReplica  # noqa: E402


def _inputs(vocab=64, B=2, S=10):
    rng = np.random.default_rng(4)
    ids = rng.integers(1, vocab, (B, S)).astype(np.int32)
    am = np.ones((B, S), np.int32)
    am[1, 7:] = 0  # ragged batch exercises masking
    ids[1, 7:] = 0
    return ids, am


def _parity(replica, cfg, atol=2e-4):
    torch.manual_seed(0)
    replica = replica.eval()
    ids, am = _inputs()
    with torch.no_grad():
        ref = replica(torch.tensor(ids.astype(np.int64)),
                      torch.tensor(am)).numpy()
    params = convert.bert_from_hf(replica.state_dict(), cfg.num_layers)
    out = np.asarray(bert.encode(
        params, cfg, jnp.asarray(ids), jnp.asarray(am)
    ))
    # compare only valid positions
    np.testing.assert_allclose(out[am.astype(bool)], ref[am.astype(bool)],
                               atol=atol, rtol=1e-3)


def test_gte_v15_parity():
    cfg = bert.BertConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=48, type_vocab_size=1,
        position_embedding_type="rope", rope_theta=160000.0, mlp_gated=True,
    )
    _parity(GteReplica(), cfg)


def test_nomic_parity():
    cfg = bert.BertConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=48, type_vocab_size=2, hidden_act="silu",
        position_embedding_type="rope", rope_theta=1000.0, mlp_gated=True,
        mlp_bias=False,
    )
    _parity(NomicReplica(), cfg)


def test_jina_v2_parity():
    cfg = bert.BertConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=48, type_vocab_size=2,
        position_embedding_type="alibi", mlp_gated=True,
    )
    _parity(JinaReplica(), cfg)


def test_alibi_slopes_match_published():
    # canonical ALiBi slopes for 8 heads (Press et al.)
    s = np.asarray(bert.alibi_slopes(8))
    np.testing.assert_allclose(
        s, [2 ** -1, 2 ** -2, 2 ** -3, 2 ** -4, 2 ** -5, 2 ** -6,
            2 ** -7, 2 ** -8], rtol=1e-6,
    )
    s12 = np.asarray(bert.alibi_slopes(12))
    assert s12.shape == (12,) and np.all(s12 > 0)


def test_from_hf_remote_config_mappings():
    gte = bert.BertConfig.from_hf(SimpleNamespace(
        model_type="new", vocab_size=30528, hidden_size=768,
        num_hidden_layers=12, num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=8192, type_vocab_size=0, layer_norm_eps=1e-12,
        hidden_act="gelu", pad_token_id=0, rope_theta=160000.0,
    ))
    assert gte.position_embedding_type == "rope" and gte.mlp_gated
    assert gte.rope_theta == 160000.0

    nomic = bert.BertConfig.from_hf(SimpleNamespace(
        model_type="nomic_bert", vocab_size=30528, n_embd=768, n_layer=12,
        n_head=12, n_inner=3072, n_positions=8192, type_vocab_size=2,
        layer_norm_epsilon=1e-12, pad_token_id=0, rotary_emb_base=1000,
        mlp_fc1_bias=False,
    ))
    assert nomic.hidden_size == 768 and nomic.rope_theta == 1000
    assert nomic.position_embedding_type == "rope" and not nomic.mlp_bias

    jina = bert.BertConfig.from_hf(SimpleNamespace(
        model_type="bert", vocab_size=30528, hidden_size=768,
        num_hidden_layers=12, num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=8192, type_vocab_size=2, layer_norm_eps=1e-12,
        hidden_act="gelu", pad_token_id=0, position_embedding_type="alibi",
        feed_forward_type="geglu",
    ))
    assert jina.position_embedding_type == "alibi" and jina.mlp_gated


def test_dense_retriever_runs_rope_bert(tmp_path):
    """End-to-end: a GTE-layout checkpoint saved to disk loads through
    DenseRetriever and encodes (the three pending retriever configs' path)."""
    from tiny_models import build_tiny_bert

    d = str(tmp_path / "gte")
    build_tiny_bert(d)  # tokenizer files
    torch.manual_seed(1)
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(d)
    replica = GteReplica(vocab=tok.vocab_size, hidden=32, layers=2, heads=4,
                         inter=48)
    # build_tiny_bert left a plain-BERT model.safetensors (we only want its
    # tokenizer files) — replace it with the GTE-layout weights
    from safetensors.torch import save_file

    save_file(dict(replica.state_dict()),
              os.path.join(d, "model.safetensors"))
    import json

    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({
            "model_type": "new", "vocab_size": tok.vocab_size,
            "hidden_size": 32, "num_hidden_layers": 2,
            "num_attention_heads": 4, "intermediate_size": 48,
            "max_position_embeddings": 512, "type_vocab_size": 1,
            "layer_norm_eps": 1e-12, "hidden_act": "gelu",
            "pad_token_id": 0, "rope_theta": 160000.0,
            "architectures": ["NewModel"],
        }, f)

    from bergen_tpu.models.retrievers.dense import DenseRetriever

    r = DenseRetriever(model_name=d, max_len=32, pooler="cls",
                       similarity="cos", batch_size=4)
    emb = r.encode(["a bank by the river", "money in the bank"], "doc")
    assert emb.shape == (2, 32)
    assert np.all(np.isfinite(emb))
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-3)
