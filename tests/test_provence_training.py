"""Provence training pipeline: joint compression+ranking heads on DeBERTa
(reference scripts/provence/{modeling_provence,train_provence}.py)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_deberta_dir(tmp_path_factory):
    from tiny_models import build_tiny_bert
    from transformers import (
        AutoTokenizer, DebertaV2Config, DebertaV2ForSequenceClassification,
    )

    out = str(tmp_path_factory.mktemp("deberta"))
    build_tiny_bert(out)  # tokenizer files (WordPiece with [CLS]/[SEP])
    tok = AutoTokenizer.from_pretrained(out)
    torch.manual_seed(0)
    cfg = DebertaV2Config(
        vocab_size=tok.vocab_size, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, type_vocab_size=0,
        position_buckets=16, max_relative_positions=-1,
        norm_rel_ebd="layer_norm", relative_attention=True,
        pos_att_type=["p2c", "c2p"], position_biased_input=False,
        share_att_key=True, num_labels=1,
    )
    # a real cross-encoder teacher: trained pooler + ranking classifier
    DebertaV2ForSequenceClassification(cfg).save_pretrained(out)
    return out


def test_teacher_ranking_head_is_reused(tiny_deberta_dir, tmp_path):
    """The cross-encoder teacher's pooler/classifier must seed the ranking
    head (not be dropped and random-reinitialised by init_heads)."""
    from transformers import DebertaV2ForSequenceClassification

    from bergen_tpu.train.provence import ProvenceTrainer

    hf = DebertaV2ForSequenceClassification.from_pretrained(tiny_deberta_dir)
    t = ProvenceTrainer(tiny_deberta_dir, _rows(2), _rows(2),
                        str(tmp_path / "o"), max_len=48, batch_size=2,
                        epochs=1)
    np.testing.assert_allclose(
        np.asarray(t.params["classifier"]["kernel"]),
        hf.classifier.weight.detach().numpy().T, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(t.params["pooler"]["kernel"]),
        hf.pooler.dense.weight.detach().numpy().T, atol=1e-6,
    )


def _rows(n):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        # the selected sentence always contains the word "gold"
        rows.append({
            "query": "which sentence matters",
            "context": ["gold answer sentence here",
                        "irrelevant filler text",
                        "more filler words"],
            "selected_sents": [0],
            "ranking_label": float(rng.normal()),
        })
    return rows


def test_collation_label_alignment(tiny_deberta_dir, tmp_path):
    from bergen_tpu.train.provence import ProvenceTrainer

    t = ProvenceTrainer(tiny_deberta_dir, _rows(4), _rows(2),
                        str(tmp_path / "o"), max_len=48, batch_size=2,
                        epochs=1)
    batch = t._collate(_rows(2))
    ii = np.asarray(batch["input_ids"])
    lab = np.asarray(batch["labels"])
    tok = t.tokenizer
    q_len = len(tok("which sentence matters",
                    add_special_tokens=False)["input_ids"])
    s0_len = len(tok("gold answer sentence here",
                     add_special_tokens=False)["input_ids"])
    # [CLS] + query + [SEP] are label 0; sentence-0 tokens are label 1
    assert lab[0, : q_len + 2].sum() == 0
    assert lab[0, q_len + 2 : q_len + 2 + s0_len].sum() == s0_len
    assert lab[0, q_len + 2 + s0_len :].sum() == 0
    assert ii[0, 0] == tok.cls_token_id


def test_training_reduces_joint_loss(tiny_deberta_dir, tmp_path):
    from bergen_tpu.train.provence import ProvenceTrainer

    t = ProvenceTrainer(tiny_deberta_dir, _rows(32), _rows(8),
                        str(tmp_path / "o"), max_len=48, batch_size=8,
                        epochs=4, lr=5e-4)
    result = t.train()
    losses = result["train_loss"]
    assert len(losses) == 16
    assert np.mean(losses[-4:]) < np.mean(losses[:4])
    ev = result["eval"]
    assert set(ev) == {"loss", "acc", "precision", "recall", "f1"}
    assert os.path.exists(tmp_path / "o" / "provence_params.npz")
    assert os.path.exists(tmp_path / "o" / "train_log.csv")


def test_train_provence_cli(tiny_deberta_dir, tmp_path):
    """The script surface end-to-end on a tiny silver-label folder."""
    silver = tmp_path / "silver"
    silver.mkdir()
    for i, row in enumerate(_rows(12)):
        with open(silver / f"q{i}_d{i}.json", "w") as f:
            json.dump({"query": row["query"], "context": row["context"],
                       "selected_sents": row["selected_sents"],
                       "response": "[0]"}, f)
    trec = tmp_path / "teacher.trec"
    with open(trec, "w") as f:
        for i in range(12):
            f.write(f"q{i}\tq0\td{i}\t1\t{1.5 + i * 0.1}\trun\n")
    env = dict(
        os.environ,
        PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""),
        JAX_PLATFORMS="cpu",
    )
    out = subprocess.run(
        [sys.executable, "scripts/provence/train_provence.py",
         "--silver_dir", str(silver), "--teacher_trec", str(trec),
         "--model", tiny_deberta_dir, "--outdir", str(tmp_path / "run"),
         "--max_len", "48", "--batch_size", "4", "--epochs", "1",
         "--eval_fraction", "0.25"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    tail = json.loads(out.stdout.strip().splitlines()[-1])
    assert tail["steps"] >= 2 and "f1" in tail["eval"]
    # teacher scores actually reached the rows
    assert os.path.exists(tmp_path / "run" / "provence_params.npz")
