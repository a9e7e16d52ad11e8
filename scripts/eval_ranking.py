"""Recompute ranking metrics offline from stored TREC runs (reference
``scripts/eval_ranking.py``): scans finished experiments, reruns the qrels
evaluation over ``eval_{split}_ranking_run.trec``."""

import argparse
import json
import os
import sys

import yaml

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bergen_tpu.utils import eval_retrieval_kilt, load_trec  # noqa: E402


def main(experiments_folder="experiments/", qrels_folder="qrels/",
         dataset_split="dev", doc_dataset_name="kilt-100w"):
    for exp in os.listdir(experiments_folder):
        if exp.startswith("tmp_"):
            continue
        folder = os.path.join(experiments_folder, exp)
        cfg_path = os.path.join(folder, "config.yaml")
        if not os.path.exists(cfg_path):
            continue
        with open(cfg_path) as f:
            config = yaml.safe_load(f)
        if not config.get("retriever"):
            continue
        generation_top_k = config["generation_top_k"]
        retriever = config["retriever"]["init_args"]["model_name"].replace("/", "_")
        if retriever == "oracle_provenance":
            metrics = {"P_1": 1.0, f"recall_{generation_top_k}": 1.0}
            with open(
                os.path.join(folder, f"eval_{dataset_split}_ranking_metrics.json"),
                "w",
            ) as f:
                json.dump(metrics, f)
            continue
        run_file = os.path.join(folder, f"eval_{dataset_split}_ranking_run.trec")
        if not os.path.exists(run_file):
            continue
        target = config["dataset"][dataset_split]["query"]["init_args"]["_target_"]
        query_dataset_name = target.rsplit(".", 1)[-1].lower()
        for marker, name in [
            ("eli5", "kilt_eli5"), ("wow", "kilt_wow"),
            ("hotpot", "kilt_hotpotqa"), ("trivia", "kilt_triviaqa"),
            ("nq", "kilt_nq"),
        ]:
            if marker in query_dataset_name:
                query_dataset_name = name
                break
        q_ids, d_ids, scores = load_trec(run_file)
        out = eval_retrieval_kilt(
            folder, qrels_folder, query_dataset_name, doc_dataset_name,
            dataset_split, q_ids, d_ids, scores, top_k=generation_top_k,
            write_trec_file=False,
        )
        print(exp, query_dataset_name, out)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiments_folder", default="experiments/")
    parser.add_argument("--qrels_folder", default="qrels/")
    parser.add_argument("--split", default="dev")
    args = parser.parse_args()
    main(args.experiments_folder, args.qrels_folder, args.split)
