"""Generate KILT qrels from task provenances (reference
``scripts/kilt_generate_qrels.py``): per query the set of gold wikipedia page
ids with relevance 1, written as both ``qrel.{dataset}.{split}.json``
({q_id: {wiki_id: 1}}) and trec-format ``.txt``.  Requires network access to
the HF hub."""

import json
import os
import sys
from collections import defaultdict

import datasets

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bergen_tpu.utils import get_qrel_ranking_filename  # noqa: E402

DATASETS = [
    "aidayago2", "cweb", "eli5", "fever", "hotpotqa", "nq",
    "structured_zeroshot", "trex", "triviaqa_support_only", "wned", "wow",
]
SPLIT_MAP = {"validation": "dev", "test": "test", "train": "train"}


def main(qrel_folder="qrels", splits=("validation",)):
    os.makedirs(qrel_folder, exist_ok=True)
    for split in splits:
        for name in DATASETS:
            dataset = datasets.load_dataset("kilt_tasks", name)[split]
            if name == "eli5" and split == "validation":
                # the HF mirror drops dev provenances; backfill from the
                # official jsonl (same as the KILTEli5 processor)
                import urllib.request
                from collections import defaultdict as dd

                local = "eli5-dev-kilt.jsonl"
                if not os.path.exists(local):
                    urllib.request.urlretrieve(
                        "https://dl.fbaipublicfiles.com/KILT/eli5-dev-kilt.jsonl",
                        local,
                    )
                prov = dd(list)
                with open(local) as f:
                    for line in f:
                        ex = json.loads(line)
                        prov[ex["id"]] = [
                            o["provenance"] for o in ex["output"]
                            if "provenance" in o
                        ]

                def backfill(x):
                    for i, p in enumerate(prov[x["id"]]):
                        x["output"][i]["provenance"] = p
                    return x

                dataset = dataset.map(backfill)

            out_file = get_qrel_ranking_filename(
                qrel_folder,
                f"kilt_{name}".replace("triviaqa_support_only", "triviaqa"),
                SPLIT_MAP[split],
            )
            qrels = defaultdict(dict)
            with open(out_file.replace(".json", ".txt"), "w") as trec_out:
                for sample in dataset:
                    wiki_ids = set()
                    for out in sample["output"]:
                        if len(out["answer"]) > 0 and out.get("provenance"):
                            wiki_ids.update(
                                p["wikipedia_id"] for p in out["provenance"]
                            )
                    for wiki_id in sorted(wiki_ids):
                        trec_out.write(f"{sample['id']} 0 {wiki_id} 1\n")
                        qrels[sample["id"]][wiki_id] = 1
            with open(out_file, "w") as f:
                json.dump(qrels, f)
            print(f"wrote {out_file} ({len(qrels)} queries)")


if __name__ == "__main__":
    main()
