"""DeBERTa-v2/v3 parity vs HF torch (disentangled attention numerics)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from bergen_tpu.models import deberta


@pytest.fixture(scope="module")
def tiny_deberta():
    from transformers import DebertaV2Config, DebertaV2ForSequenceClassification

    torch.manual_seed(0)
    hf_cfg = DebertaV2Config(
        vocab_size=120, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, type_vocab_size=0,
        position_buckets=16, max_relative_positions=-1, norm_rel_ebd="layer_norm",
        relative_attention=True,
        pos_att_type=["p2c", "c2p"], position_biased_input=False,
        share_att_key=True, num_labels=1,
    )
    model = DebertaV2ForSequenceClassification(hf_cfg).eval()
    cfg = deberta.DebertaConfig.from_hf(hf_cfg)
    params = deberta.deberta_from_hf(model.state_dict(), cfg.num_layers)
    return model, cfg, params


def test_log_bucket_positions(tiny_deberta):
    _, cfg, _ = tiny_deberta
    rel = deberta.build_relative_position(20, cfg)
    assert rel.shape == (20, 20)
    assert int(rel[0, 0]) == 0
    # symmetric-signed, bucketed beyond mid
    assert int(rel[0, 19]) == -int(rel[19, 0])


def test_hidden_states_parity(tiny_deberta):
    model, cfg, params = tiny_deberta
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 120, (2, 18)).astype(np.int32)
    am = np.ones((2, 18), np.int32)
    am[1, 14:] = 0
    with torch.no_grad():
        ref = model.deberta(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am)
        ).last_hidden_state.numpy()
    out = np.asarray(
        deberta.encode(params, cfg, jnp.asarray(ids), jnp.asarray(am))
    )
    valid = am.astype(bool)
    np.testing.assert_allclose(out[valid], ref[valid], atol=3e-4, rtol=1e-3)


def test_classification_parity(tiny_deberta):
    model, cfg, params = tiny_deberta
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 120, (3, 12)).astype(np.int32)
    am = np.ones((3, 12), np.int32)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am)
        ).logits.numpy()
    out = np.asarray(
        deberta.classify(params, cfg, jnp.asarray(ids), jnp.asarray(am))
    )
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=1e-3)


def test_pos_tables_parity(tiny_deberta):
    """The cached position-table path (build_pos_tables + direct einsum)
    must match both the regather path and HF: same products, same f32
    accumulation — only the batch-scaled regather is gone."""
    model, cfg, params = tiny_deberta
    rng = np.random.default_rng(2)
    S = 18
    ids = rng.integers(3, 120, (2, S)).astype(np.int32)
    am = np.ones((2, S), np.int32)
    am[1, 14:] = 0
    tabs = deberta.build_pos_tables(params, cfg, S)
    assert tabs is not None and len(tabs) == cfg.num_layers
    c2p_tab, p2c_tab = tabs[0]
    H = cfg.num_heads
    assert c2p_tab.shape == (S, S, H, cfg.hidden_size // H)
    out_tab = np.asarray(deberta.encode(
        params, cfg, jnp.asarray(ids), jnp.asarray(am), pos_tables=tabs))
    out_ref = np.asarray(deberta.encode(
        params, cfg, jnp.asarray(ids), jnp.asarray(am)))
    valid = am.astype(bool)
    np.testing.assert_allclose(out_tab[valid], out_ref[valid],
                               atol=1e-5, rtol=1e-5)
    with torch.no_grad():
        hf = model.deberta(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am)
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(out_tab[valid], hf[valid],
                               atol=3e-4, rtol=1e-3)


def test_crossencoder_with_deberta(tmp_path):
    """CrossEncoder auto-detects the DeBERTa architecture."""
    from transformers import DebertaV2Config, DebertaV2ForSequenceClassification
    from tokenizers import Tokenizer, models as tmodels, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    torch.manual_seed(1)
    hf_cfg = DebertaV2Config(
        vocab_size=64, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=0, position_buckets=8,
        norm_rel_ebd="layer_norm", relative_attention=True, pos_att_type=["p2c", "c2p"],
        position_biased_input=False, share_att_key=True, num_labels=1,
    )
    model = DebertaV2ForSequenceClassification(hf_cfg).eval()
    out = str(tmp_path / "deb")
    model.save_pretrained(out)
    vocab = {f"w{i}": i + 4 for i in range(60)}
    vocab.update({"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3})
    wl = Tokenizer(tmodels.WordLevel(vocab, unk_token="[UNK]"))
    wl.pre_tokenizer = pre_tokenizers.Whitespace()
    tok = PreTrainedTokenizerFast(
        tokenizer_object=wl, pad_token="[PAD]", unk_token="[UNK]",
        cls_token="[CLS]", sep_token="[SEP]",
    )
    tok.save_pretrained(out)

    from bergen_tpu.models.rerankers.crossencoder import CrossEncoder

    ce = CrossEncoder(out, max_len=32)
    scores = ce.score_pairs(["w1 w2", "w3"], ["w2 w4", "w9"])
    assert scores.shape == (2,)
    with torch.no_grad():
        # reference through the same loaded tokenizer the CE uses
        enc = ce.tokenizer(["w1 w2", "w3"], ["w2 w4", "w9"], return_tensors="pt",
                           padding=True)
        ref = model(
            input_ids=enc["input_ids"], attention_mask=enc["attention_mask"]
        ).logits[:, 0].numpy()
    np.testing.assert_allclose(
        scores, ref, atol=3e-4, rtol=1e-3,
        err_msg=f"ids={enc['input_ids'].tolist()}",
    )


def test_fused_layers_match_unfused_and_hf():
    """The prebias whole-layer kernel path (interpret mode on CPU) must
    match both the unfused JAX path and HF torch on the same weights."""
    from transformers import DebertaV2Config, DebertaV2ForSequenceClassification

    torch.manual_seed(2)
    hf_cfg = DebertaV2Config(
        vocab_size=160, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=256,
        max_position_embeddings=256, type_vocab_size=0,
        position_buckets=32, max_relative_positions=-1,
        norm_rel_ebd="layer_norm", relative_attention=True,
        pos_att_type=["p2c", "c2p"], position_biased_input=False,
        share_att_key=True, num_labels=1,
    )
    model = DebertaV2ForSequenceClassification(hf_cfg).eval()
    cfg = deberta.DebertaConfig.from_hf(hf_cfg)
    params = deberta.deberta_from_hf(model.state_dict(), cfg.num_layers)

    rng = np.random.default_rng(3)
    S = 128  # >= ops/encoder_attention.MIN_FUSED_SEQ
    ids = rng.integers(3, 160, (8, S)).astype(np.int32)
    am = np.ones((8, S), np.int32)
    am[1, 90:] = 0
    am[5, 30:] = 0
    ids = np.where(am, ids, 0)

    with torch.no_grad():
        ref = model.deberta(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am)
        ).last_hidden_state.numpy()
    try:
        deberta.USE_FUSED_LAYERS = False
        unfused = np.asarray(
            deberta.encode(params, cfg, jnp.asarray(ids), jnp.asarray(am)))
        deberta.USE_FUSED_LAYERS = True
        assert deberta._use_fused_layers(cfg, 8, S), "geometry must be fused"
        fused = np.asarray(
            deberta.encode(params, cfg, jnp.asarray(ids), jnp.asarray(am)))
    finally:
        deberta.USE_FUSED_LAYERS = None
    valid = am.astype(bool)
    np.testing.assert_allclose(fused[valid], unfused[valid],
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(fused[valid], ref[valid], atol=5e-4, rtol=1e-3)
