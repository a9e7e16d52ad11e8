"""Results-table CLI (reference ``print_results.py``): aggregates each finished
experiment's ``eval_{split}_metrics.json`` + config into a markdown/csv table.

    python print_results.py --folder experiments/ --format simple
"""

import argparse
import json
import os
from pathlib import Path

import pandas as pd
import yaml


def get_config(path, split):
    with open(path) as f:
        config = yaml.safe_load(f)
    ds = config["dataset"][split]
    dataset_query = ds["query"]["init_args"]["_target_"].rsplit(".", 1)[-1]

    def model_name(section):
        node = config.get(section)
        if node and node.get("init_args"):
            return node["init_args"].get("model_name")
        return None

    return {
        "query_dataset": dataset_query,
        "Retriever": os.path.basename(model_name("retriever") or "None"),
        "Reranker": os.path.basename(model_name("reranker") or "None"),
        "Generator": os.path.basename(model_name("generator") or "None"),
    }


def collect(folder: str, split: str):
    rows = []
    for exp in Path(folder).iterdir():
        if not exp.is_dir() or "tmp_" in exp.name:
            continue
        metrics_file = exp / f"eval_{split}_metrics.json"
        if not metrics_file.exists():
            continue
        try:
            row = {"exp_folder": exp.name}
            row.update(get_config(exp / "config.yaml", split))
            with open(metrics_file) as f:
                row.update(json.load(f))
            time_file = exp / f"eval_{split}_generation_time.json"
            if time_file.exists():
                with open(time_file) as f:
                    row["gen_time"] = json.load(f)["Generation time"]
            rank_file = exp / f"eval_{split}_ranking_metrics.json"
            if rank_file.exists():
                with open(rank_file) as f:
                    row["P_1"] = json.load(f)["P_1"]
            rows.append(row)
        except Exception as e:
            print(f"Skipping {exp} due to parsing errors: {e}")
    return rows


def main(args):
    rows = collect(args.folder, args.split)
    if not rows:
        print(f'No results in folder "{args.folder}" yet!')
        return
    df = pd.DataFrame(rows)
    llmeval_cols = [c for c in df.columns if "llmeval" in c.lower()]
    base = ["exp_folder", "query_dataset", "Generator", "Retriever", "Reranker"]
    if args.format == "tiny":
        sel = base + ["M"] + llmeval_cols
    elif args.format == "simple":
        sel = base + ["M", "EM", "Recall"] + llmeval_cols
    elif args.format == "full":
        sel = (
            ["exp_folder", "Retriever", "P_1", "Reranker", "Generator",
             "gen_time", "query_dataset", "M", "EM", "F1", "Precision",
             "Recall", "Recall_char3gram", "Rouge-L"] + llmeval_cols
        )
    else:
        raise ValueError("Invalid output format")
    sel = [c for c in sel if c in df.columns]
    df = df[sel].sort_values(by=[args.sort] if args.sort in sel else [sel[0]])
    print("Split:", args.split)
    print(df.to_markdown(floatfmt=".2f"))
    if args.csv:
        os.makedirs("results", exist_ok=True)
        df.to_csv(f"results/{args.folder.replace('/', '_')}.csv", index=False)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--folder", type=str, default="experiments")
    parser.add_argument("--split", type=str, default="dev")
    parser.add_argument("--format", type=str, default="simple",
                        choices=["simple", "tiny", "full"])
    parser.add_argument("--sort", type=str, default="Generator")
    parser.add_argument("--csv", action="store_true")
    args = parser.parse_args()
    main(args)
