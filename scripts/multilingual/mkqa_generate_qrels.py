"""Generate MKQA qrels (reference ``scripts/multilingual/mkqa_generate_qrels.py``):
joins MKQA with kilt_nq to inherit English wikipedia provenances, then writes
page-level qrels (relevance 1) as json + trec.  The doc_dataset_name marker is
kilt-100w — retrieval eval is skipped when MKQA runs against another corpus.
Requires network access to the HF hub.

Usage: python scripts/multilingual/mkqa_generate_qrels.py <lang> [qrel_folder]
"""

import json
import os
import sys
from collections import defaultdict

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from bergen_tpu.data.processors.mrag import MKQA  # noqa: E402
from bergen_tpu.utils import get_qrel_ranking_filename  # noqa: E402


def joined_dataset(lang: str):
    """The same MKQA ∩ kilt_nq join the dataset processor performs."""
    proc = MKQA(
        lang, split="train", out_folder=".", num_proc=1, overwrite=False,
        debug=False, oracle_provenance=False, shuffle_labels=False,
    )
    return proc.process()


def main(lang: str, qrel_folder: str = "qrels") -> None:
    mkqa_lang = "zh_cn" if lang == "zh" else lang
    os.makedirs(qrel_folder, exist_ok=True)
    out_file = get_qrel_ranking_filename(qrel_folder, f"mkqa_{lang}", "dev")

    dataset = joined_dataset(mkqa_lang)
    qrels: dict = defaultdict(dict)
    qrels["doc_dataset_name"] = "kilt-100w"
    with open(out_file.replace(".json", ".txt"), "w") as trec:
        for sample in dataset:
            wiki_ids = sorted({
                prov["wikipedia_id"]
                for out in sample["output"]
                if len(out["answer"]) > 0 and out.get("provenance")
                for prov in out["provenance"]
            })
            for wiki_id in wiki_ids:
                trec.write(f"{sample['id']} 0 {wiki_id} 1\n")
                qrels[sample["id"]][wiki_id] = 1
    with open(out_file, "w") as fp:
        json.dump(qrels, fp)
    print(f"wrote {out_file}")


if __name__ == "__main__":
    main(*sys.argv[1:])
