"""LLM-judge + LID evaluator tests, incl. the evaluate.py CLI over a pre-baked
experiment folder (mirrors reference TestBergenEval, zeroshot_test.py:215-262)."""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bergen_tpu.models.evaluators import utils as eutils
from bergen_tpu.models.evaluators.lid import LID, LID_advanced, detect_language


# --------------------------------------------------------------------------- #
# scoring utils
# --------------------------------------------------------------------------- #


def test_process_outputs():
    scores, weird = eutils.process_llm_outputs_assess_scores(
        ["Yes", "No", "Yes and No", "maybe"], {"Yes": 1, "No": 0}
    )
    assert scores == [1, 0, -100, -100]
    assert weird == ["Yes and No", "maybe"]


def test_mean_without_unknown():
    assert eutils.get_mean_without_unknown([1, 0, -100]) == 0.5
    assert eutils.get_mean_without_unknown([-100]) == 0


def test_unswitch():
    assert eutils.unswitch_switched_scores([1.0, 0.0, -100], [True, False, True]) == [
        0.0, 0.0, -100,
    ]


def test_pairwise_scores():
    out = eutils.get_pairwise_scores_without_unknown([1, 1, 0.5, 0, -100])
    assert out["win"] == 50.0 and out["tie"] == 25.0 and out["lose"] == 25.0


# --------------------------------------------------------------------------- #
# LID
# --------------------------------------------------------------------------- #


def test_detect_language_scripts():
    assert detect_language("这是一个中文句子") == "zh"
    assert detect_language("これは日本語の文です") == "ja"
    assert detect_language("Это русское предложение") == "ru"
    assert detect_language("The capital of France is Paris and it is large") == "en"
    assert detect_language("La capitale de la France est Paris et les rues") == "fr"


def test_lid_evaluator():
    lid = LID("en")
    mean, scores = lid(
        ["the answer is in the city", "这是中文"], [["x"], ["y"]], None
    )
    assert scores == [1.0, 0.0] and mean == 0.5


def test_lid_advanced_gold_fallback():
    lid = LID_advanced("fr")
    # 'Paris' detected as non-fr but matches gold → counted correct
    mean, scores = lid(["Paris"], [["Paris"]], None)
    assert scores == [1.0]


# --------------------------------------------------------------------------- #
# LLM judge with tiny llama
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def judge(tmp_path_factory):
    from tiny_models import build_tiny_llama
    from bergen_tpu import confy
    from bergen_tpu.models.evaluators.llm import LLMeval

    model_dir = build_tiny_llama(str(tmp_path_factory.mktemp("m") / "llama"))
    model_config = confy.Config(
        {"init_args": {
            "_target_": "bergen_tpu.models.generators.jax_llm.LLM",
            "model_name": model_dir, "batch_size": 4, "max_length": 128,
        }}
    )
    return LLMeval(model_config, batch_size=4, config="default_qa")


def test_llm_judge_logits_mode(judge):
    assert judge.use_logits
    mean, scores = judge(
        predictions=["paris", "rome"],
        references=[["Paris"], ["Berlin"]],
        questions=["capital of france?", "capital of germany?"],
    )
    assert len(scores) == 2
    # logits mode produces probabilities in [0, 1]
    assert all(0.0 <= s <= 1.0 for s in scores)
    assert 0.0 <= mean <= 1.0


def test_llm_judge_text_mode(judge):
    judge.use_logits = False
    mean, scores = judge(
        predictions=["paris"], references=[["Paris"]], questions=["q?"]
    )
    assert len(scores) == 1  # tiny model likely outputs weird → -100 allowed
    judge.use_logits = True


def test_llm_judge_pairwise(judge):
    out, scores = judge(
        predictions=["paris", "rome"],
        references=[["Paris"], ["Berlin"]],
        questions=["q1", "q2"],
        opponent_predictions=["lyon", "berlin"],
    )
    assert set(out) == {"win", "tie", "lose"}
    assert len(scores) == 2


# --------------------------------------------------------------------------- #
# evaluate.py CLI over a pre-baked experiment folder
# --------------------------------------------------------------------------- #


def test_evaluate_cli_lid(tmp_path, repo_root):
    exp = tmp_path / "experiments" / "fakeexp"
    exp.mkdir(parents=True)
    with open(exp / "config.yaml", "w") as f:
        f.write(
            "dataset:\n  dev:\n    query:\n      init_args:\n"
            "        _target_: x.Y\n        lng: en\n"
        )
    out_rows = [
        {"q_id": "q0", "response": "the answer is in the town", "label": ["x"],
         "question": "q?", "instruction": "i", "ranking_label": None},
        {"q_id": "q1", "response": "这是中文", "label": ["y"],
         "question": "q?", "instruction": "i", "ranking_label": None},
    ]
    with open(exp / "eval_dev_out.json", "w") as f:
        json.dump(out_rows, f)

    env = dict(os.environ, PYTHONPATH=repo_root, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(repo_root, "evaluate.py"),
         "--experiments_folder", str(tmp_path / "experiments"), "--lid"],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr
    metrics = json.load(open(exp / "eval_dev_metrics.json"))
    assert metrics["lid"] == 0.5
    rows = json.load(open(exp / "eval_dev_out.json"))
    assert rows[0]["lid"] == 1.0 and rows[1]["lid"] == 0.0

    # idempotent: second run skips
    r2 = subprocess.run(
        [sys.executable, os.path.join(repo_root, "evaluate.py"),
         "--experiments_folder", str(tmp_path / "experiments"), "--lid"],
        capture_output=True, text=True, env=env,
    )
    assert "already done" in r2.stdout


def test_print_results_cli(tmp_path, repo_root):
    exp = tmp_path / "experiments" / "someexp"
    exp.mkdir(parents=True)
    with open(exp / "config.yaml", "w") as f:
        f.write(
            "dataset:\n  dev:\n    query:\n      init_args:\n"
            "        _target_: bergen_tpu.data.processors.ut.UT1Queries\n"
            "generator:\n  init_args:\n    model_name: tiny/llama\n"
        )
    with open(exp / "eval_dev_metrics.json", "w") as f:
        json.dump({"M": 0.61, "EM": 0.1, "Recall": 0.5}, f)
    r = subprocess.run(
        [sys.executable, os.path.join(repo_root, "print_results.py"),
         "--folder", str(tmp_path / "experiments")],
        capture_output=True, text=True,
        env=dict(os.environ, PYTHONPATH=repo_root),
    )
    assert r.returncode == 0, r.stderr
    assert "someexp" in r.stdout and "0.61" in r.stdout
