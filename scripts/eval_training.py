"""Tabulate finished experiments (reference ``scripts/eval_training.py``):
one row per experiment folder with retriever/reranker/generator/learning-rate
and the EM metric, printed as a markdown table.

Usage: python scripts/eval_training.py [experiments_folder]
"""

import json
import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bergen_tpu import confy  # noqa: E402


def main(experiments_folder: str = "experiments") -> None:
    rows = []
    for exp in sorted(os.listdir(experiments_folder)):
        folder = os.path.join(experiments_folder, exp)
        if exp.startswith("tmp_") or not os.path.isdir(folder):
            continue
        cfg = confy.load_yaml(os.path.join(folder, "config.yaml"))

        def model(group):
            node = cfg.get(group)
            return node["init_args"]["model_name"] if node else None

        lr = None
        if cfg.get("train"):
            lr = cfg["train"].get("trainer", {}).get("learning_rate")
        metrics_file = os.path.join(folder, "eval_dev_metrics.json")
        em = None
        if os.path.exists(metrics_file):
            em = json.load(open(metrics_file)).get("EM")
        rows.append((exp, model("retriever"), model("reranker"),
                     model("generator"), lr, em))

    header = ("Folder", "Retriever", "Reranker", "Generator",
              "Learning Rate", "EM")
    widths = [max(len(str(r[i])) for r in rows + [header]) for i in range(6)]
    fmt = "| " + " | ".join(f"{{:<{w}}}" for w in widths) + " |"
    print(fmt.format(*header))
    print("|" + "|".join("-" * (w + 2) for w in widths) + "|")
    for r in rows:
        print(fmt.format(*[str(x) for x in r]))


if __name__ == "__main__":
    main(*sys.argv[1:])
