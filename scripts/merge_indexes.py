"""Merge precomputed per-language embedding indexes into one multilingual index
(reference ``scripts/multilingual/merge_indexes.py``): symlinks every source
chunk into the merged folder with globally renumbered chunk ids, in the same
order as the MergedDocDataset concatenates the corpora.

Usage:
  python scripts/merge_indexes.py --dataset_yaml config/dataset/mkqa/... \
      --indexes_path indexes/ --retriever BAAI_bge-m3
"""

import argparse
import os
import re
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bergen_tpu import confy  # noqa: E402


def chunk_id(fname: str) -> int:
    return int("".join(re.findall(r"\d+", fname)))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_yaml", required=True,
                        help="dataset yaml whose dev.doc is a MergedDocDataset")
    parser.add_argument("--indexes_path", required=True,
                        help="full path to the indexes folder")
    parser.add_argument("--retriever", required=True,
                        help="clean retriever name used in index dir names")
    args = parser.parse_args()

    cfg = confy.load_yaml(args.dataset_yaml)
    ia = cfg["dev"]["doc"]["init_args"]
    if "in_dataset_names" not in ia:
        raise ValueError(
            f"{args.dataset_yaml}: dev.doc is not a MergedDocDataset "
            "(no in_dataset_names) — nothing to merge"
        )
    in_names, in_splits = ia["in_dataset_names"], ia["in_dataset_splits"]
    out_name = ia["out_dataset_name"]
    if len(in_names) < 2 or len(in_names) != len(in_splits):
        raise ValueError("expected >=2 source datasets with matching splits")

    out_path = os.path.join(args.indexes_path, f"{out_name}_doc_{args.retriever}")
    if os.path.exists(out_path) and os.listdir(out_path):
        raise RuntimeError(f"{out_path} already exists and is not empty")
    os.makedirs(out_path, exist_ok=True)

    in_paths = [
        os.path.join(args.indexes_path, f"{name}_doc_{args.retriever}")
        for name in in_names
    ]
    for p in in_paths:
        if not (os.path.isdir(p) and os.listdir(p)):
            raise RuntimeError(f"source index {p} missing — precompute it first")

    next_id = 0
    for in_path in in_paths:
        chunks = sorted(os.listdir(in_path), key=chunk_id)
        for chunk in chunks:
            ext = os.path.splitext(chunk)[1]
            prefix = "sparse_chunk" if chunk.startswith("sparse") else "embedding_chunk"
            os.symlink(
                os.path.abspath(os.path.join(in_path, chunk)),
                os.path.join(out_path, f"{prefix}_{next_id}{ext}"),
            )
            next_id += 1
    print(f"merged {len(in_paths)} indexes → {out_path} ({next_id} chunks)")


if __name__ == "__main__":
    main()
