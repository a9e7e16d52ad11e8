"""Generate oracle-provenance TREC runs for the KILT tasks (reference
``scripts/kilt_generate_oracle.py``): per query, the gold provenance
paragraphs (``{wikipedia_id}_{paragraph}`` against the kilt-100w corpus)
written as a descending-score run, consumed by the oracle_provenance
retriever.  Requires network access to the HF hub.

Usage: python scripts/kilt_generate_oracle.py [runs_folder] [split ...]
"""

import os
import sys

import datasets

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bergen_tpu.utils import get_oracle_ranking_filename  # noqa: E402

DATASETS = [
    "aidayago2", "cweb", "eli5", "fever", "hotpotqa", "nq",
    "structured_zeroshot", "trex", "triviaqa_support_only", "wned", "wow",
]
SPLIT_MAP = {"validation": "dev", "test": "test", "train": "train"}
TOP_N = 100


def gold_passage_ids(sample) -> list:
    ids = []
    for out in sample["output"]:
        if not out.get("answer") or not out.get("provenance"):
            continue
        for prov in out["provenance"]:
            start = prov.get("start_paragraph_id")
            end = prov.get("end_paragraph_id")
            wiki = prov.get("wikipedia_id")
            if start is None or end is None or wiki is None:
                continue
            for p in range(start, end + 1):
                # kilt-100w paragraph ids are 1-based
                ids.append(f"{wiki}_{p + 1}")
    seen, uniq = set(), []
    for pid in ids:
        if pid not in seen:
            seen.add(pid)
            uniq.append(pid)
    return uniq[:TOP_N]


def main(runs_folder: str = "runs", *splits: str) -> None:
    os.makedirs(runs_folder, exist_ok=True)
    for split in splits or ("validation",):
        for name in DATASETS:
            ds = datasets.load_dataset("kilt_tasks", name)[split]
            if name == "triviaqa_support_only":
                tq = datasets.load_dataset(
                    "trivia_qa", "unfiltered.nocontext"
                )[split]
                keep = set(tq["question_id"])
                ds = ds.filter(lambda x: x["id"] in keep)
            out_name = f"kilt_{name}".replace("triviaqa_support_only", "triviaqa")
            out_file = get_oracle_ranking_filename(
                runs_folder, out_name, SPLIT_MAP[split]
            )
            with open(out_file, "w") as fout:
                for sample in ds:
                    pids = gold_passage_ids(sample)
                    for rank, pid in enumerate(pids):
                        fout.write(
                            f"{sample['id']}\tq0\t{pid}\t{rank}\t"
                            f"{TOP_N - rank}\trun\n"
                        )
            print(f"wrote {out_file}")


if __name__ == "__main__":
    main(*sys.argv[1:])
