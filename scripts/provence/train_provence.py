"""Train a Provence context-pruner+reranker (reference
``scripts/provence/train_provence.py``): silver sentence labels from
``gen_silver_labeling.py`` + teacher ranking scores from a reranking TREC run,
jointly optimised on DeBERTa via ``bergen_tpu.train.provence``.

Usage:
  python scripts/provence/train_provence.py --silver_dir labels/ \
      --teacher_trec runs/run.rerank....trec \
      --model naver/trecdl22-crossencoder-debertav3 --outdir provence_out/
"""

import argparse
import glob
import json
import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def load_rows(silver_dir: str, teacher_trec: str | None):
    from bergen_tpu.utils import load_trec

    teacher = {}
    if teacher_trec:
        q_ids, d_ids, scores = load_trec(teacher_trec)
        for q, docs, ss in zip(q_ids, d_ids, scores):
            for d, s in zip(docs, ss):
                teacher[f"{q}_{d}"] = float(s)

    rows = []
    for path in sorted(glob.glob(os.path.join(silver_dir, "*.json"))):
        item = json.load(open(path))
        key = os.path.splitext(os.path.basename(path))[0]
        rows.append({
            "query": item["query"],
            "context": item["context"],
            "selected_sents": item["selected_sents"],
            "ranking_label": teacher.get(key, 0.0),
        })
    return rows


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--silver_dir", required=True,
                        help="folder of per-example silver-label json files")
    parser.add_argument("--teacher_trec", default=None,
                        help="reranking TREC run with teacher scores")
    parser.add_argument("--model",
                        default="naver/trecdl22-crossencoder-debertav3")
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--max_len", type=int, default=512)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--epochs", type=int, default=1)
    parser.add_argument("--loss_weight", type=float, default=1.0)
    parser.add_argument("--eval_fraction", type=float, default=0.05)
    args = parser.parse_args()

    rows = load_rows(args.silver_dir, args.teacher_trec)
    if not rows:
        raise SystemExit(f"no silver-label json files found in {args.silver_dir}")
    n_eval = max(1, int(len(rows) * args.eval_fraction))
    train_rows, eval_rows = rows[n_eval:], rows[:n_eval]
    print(f"{len(train_rows)} train / {len(eval_rows)} eval examples")

    from bergen_tpu.train.provence import ProvenceTrainer

    trainer = ProvenceTrainer(
        args.model, train_rows, eval_rows, args.outdir,
        max_len=args.max_len, batch_size=args.batch_size, lr=args.lr,
        epochs=args.epochs, loss_weight=args.loss_weight,
    )
    result = trainer.train()
    print(json.dumps({"steps": result["steps"], "eval": result["eval"]}))


if __name__ == "__main__":
    main()
