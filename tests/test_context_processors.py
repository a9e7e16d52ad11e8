"""Context processors: RECOMP extractive, DSLR-CE, Provence fallback, and the
pipeline process_context stage with caching."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DOCS = [
    [
        "Avaria Overview. The capital of avaria is ashford. The country has "
        "many rivers. Its festival is famous.",
        "Borundi Facts. The harbor of borundi is large. The capital of borundi "
        "is blackwell.",
    ]
]
QUERIES = ["what is the capital of avaria"]


@pytest.fixture(scope="module")
def bert_dir(tmp_path_factory):
    from tiny_models import build_tiny_bert

    return build_tiny_bert(str(tmp_path_factory.mktemp("m") / "bert"))


@pytest.fixture(scope="module")
def ce_dir(tmp_path_factory):
    from tiny_models import build_tiny_bert

    return build_tiny_bert(str(tmp_path_factory.mktemp("m") / "ce"),
                           num_labels=1, seed=5)


def test_recomp_extractive(bert_dir):
    from bergen_tpu.models.context_processors.recomp import (
        RecompExtractiveCompressor,
    )

    proc = RecompExtractiveCompressor(bert_dir, top_k=1, max_len=64,
                                      batch_size=8)
    out, metrics = proc.process(DOCS, QUERIES)
    assert len(out) == 1 and len(out[0]) == 2
    # title always kept + exactly top-1 sentence
    assert out[0][0].startswith("Avaria Overview.")
    assert out[0][0].count(".") <= 3
    assert "context_compression" in metrics
    assert metrics["context_compression"] > 0  # something was pruned


def test_dslr_threshold_extremes(ce_dir):
    from bergen_tpu.models.context_processors.dslr_ce import DSLR_CE

    keep_all = DSLR_CE(ce_dir, threshold=0.0, max_len=64, batch_size=8)
    out_all, _ = keep_all.process(DOCS, QUERIES)
    drop_all = DSLR_CE(ce_dir, threshold=1.0, max_len=64, batch_size=8)
    out_none, m_none = drop_all.process(DOCS, QUERIES)
    # threshold 0 keeps every sentence; threshold 1 keeps only titles
    assert len(out_all[0][0]) > len(out_none[0][0])
    assert out_none[0][0] == "Avaria Overview."
    assert m_none["context_compression"] > 50


def test_provence_no_token_head_keeps_everything(bert_dir, tmp_path):
    """Without a trained token head Provence must degrade to keep-all."""
    import torch
    from transformers import DebertaV2Config, DebertaV2Model
    from tokenizers import Tokenizer, models as tmodels, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    torch.manual_seed(0)
    cfg = DebertaV2Config(
        vocab_size=64, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=128, type_vocab_size=0, position_buckets=8,
        norm_rel_ebd="layer_norm", relative_attention=True,
        pos_att_type=["p2c", "c2p"], position_biased_input=False,
        share_att_key=True,
    )
    out_dir = str(tmp_path / "prov")
    DebertaV2Model(cfg).save_pretrained(out_dir)
    vocab = {f"w{i}": i + 4 for i in range(60)}
    vocab.update({"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3})
    wl = Tokenizer(tmodels.WordLevel(vocab, unk_token="[UNK]"))
    wl.pre_tokenizer = pre_tokenizers.Whitespace()
    PreTrainedTokenizerFast(
        tokenizer_object=wl, pad_token="[PAD]", unk_token="[UNK]",
        cls_token="[CLS]", sep_token="[SEP]",
    ).save_pretrained(out_dir)

    from bergen_tpu.models.context_processors.provence import ProvenceCompressor

    proc = ProvenceCompressor(out_dir, threshold=0.5, max_len=64)
    docs = [["w1 w2. w3 w4 w5. w6 w7."]]
    out, metrics = proc.process(docs, ["w1"])
    # keep-prob is 1.0 everywhere without a head → all sentences survive
    assert out[0][0] == "w1 w2. w3 w4 w5. w6 w7."
    assert metrics["context_compression"] == pytest.approx(0.0, abs=1.0)


def test_pipeline_process_context_stage(tmp_path, repo_root, bert_dir):
    """process_context through the CLI pipeline with caching + metrics file."""
    from test_pipeline_e2e import compose, finished_exp, run_main

    cfg = compose(
        tmp_path, repo_root,
        "retriever=contriever",
        f"retriever.init_args.model_name={bert_dir}",
        "retriever.init_args.max_len=64",
        "generator=oracle_answer",
        "+context_processor.init_args._target_=bergen_tpu.models.context_processors.recomp.RecompExtractiveCompressor",
        f"+context_processor.init_args.model_name={bert_dir}",
        "+context_processor.init_args.top_k=1",
        "+context_processor.init_args.max_len=64",
        "retrieve_top_k=4", "rerank_top_k=4", "generation_top_k=2",
        "+debug=true",
    )
    run_main(cfg)
    exp = finished_exp(tmp_path)
    assert os.path.exists(os.path.join(exp, "eval_dev_context_metrics.json"))
    cm = json.load(open(os.path.join(exp, "eval_dev_context_metrics.json")))
    assert "context_compression" in cm
    # cache file exists in the processed_context folder
    pc = os.listdir(f"{tmp_path}/processed_contexts")
    assert any(f.startswith("processed_contexts.recomp_Ext_top1") for f in pc)