"""evaluate.py --llm end-to-end: judge an experiment folder with the tiny
llama through the real CLI (logits mode)."""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def test_evaluate_llm_judge_cli(tmp_path, repo_root):
    from tiny_models import build_tiny_llama

    llama_dir = build_tiny_llama(str(tmp_path / "llama"))
    # temp generator config registered under config/generator
    cfg_name = "_ut_tiny_judge"
    cfg_path = os.path.join(repo_root, "config", "generator", f"{cfg_name}.yaml")
    with open(cfg_path, "w") as f:
        f.write(
            "init_args:\n"
            "  _target_: bergen_tpu.models.generators.jax_llm.LLM\n"
            f'  model_name: "{llama_dir}"\n'
            "  max_new_tokens: 4\n  max_length: 96\n  batch_size: 4\n"
        )
    try:
        exp = tmp_path / "experiments" / "fakeexp"
        exp.mkdir(parents=True)
        with open(exp / "config.yaml", "w") as f:
            f.write("dataset:\n  dev:\n    query:\n      init_args:\n"
                    "        _target_: x.Y\n")
        rows = [
            {"q_id": f"q{i}", "response": r, "label": [l], "question": q,
             "instruction": "i", "ranking_label": None}
            for i, (r, l, q) in enumerate([
                ("ashford", "Ashford", "capital of avaria?"),
                ("no idea", "Blackwell", "capital of borundi?"),
            ])
        ]
        with open(exp / "eval_dev_out.json", "w") as f:
            json.dump(rows, f)

        env = dict(os.environ, PYTHONPATH=repo_root, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, os.path.join(repo_root, "evaluate.py"),
             "--experiments_folder", str(tmp_path / "experiments"),
             "--llm", cfg_name, "tiny"],
            capture_output=True, text=True, env=env, timeout=500,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        metrics = json.load(open(exp / "eval_dev_metrics.json"))
        assert "LLMeval_tiny_logits" in metrics
        assert 0.0 <= metrics["LLMeval_tiny_logits"] <= 1.0
        out = json.load(open(exp / "eval_dev_out.json"))
        assert all("LLMeval_tiny_logits" in row for row in out)
    finally:
        os.remove(cfg_path)
