"""Generate MKQA oracle-provenance runs (reference
``scripts/multilingual/mkqa_generate_oracle.py``): the gold kilt-100w
paragraphs (``{wikipedia_id}_{paragraph}``) per joined MKQA∩kilt_nq query,
written as a descending-score TREC run for the oracle_provenance retriever.
Requires network access to the HF hub.

Usage: python scripts/multilingual/mkqa_generate_oracle.py <lang> [runs_folder]
"""

import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from bergen_tpu.utils import get_oracle_ranking_filename  # noqa: E402
from mkqa_generate_qrels import joined_dataset  # noqa: E402

TOP_N = 100


def main(lang: str, runs_folder: str = "runs") -> None:
    mkqa_lang = "zh_cn" if lang == "zh" else lang
    os.makedirs(runs_folder, exist_ok=True)
    out_file = get_oracle_ranking_filename(runs_folder, f"mkqa_{lang}", "dev")

    dataset = joined_dataset(mkqa_lang)
    with open(out_file, "w") as fout:
        for sample in dataset:
            seen, pids = set(), []
            for out in sample["output"]:
                if not out["answer"] or not out.get("provenance"):
                    continue
                for prov in out["provenance"]:
                    start = prov.get("start_paragraph_id")
                    end = prov.get("end_paragraph_id")
                    wiki = prov.get("wikipedia_id")
                    if start is None or end is None or wiki is None:
                        continue
                    for p in range(start, end + 1):
                        pid = f"{wiki}_{p + 1}"  # kilt-100w ids are 1-based
                        if pid not in seen:
                            seen.add(pid)
                            pids.append(pid)
            for rank, pid in enumerate(pids[:TOP_N]):
                fout.write(
                    f"{sample['id']}\tq0\t{pid}\t{rank}\t{TOP_N - rank}\trun\n"
                )
    print(f"wrote {out_file}")


if __name__ == "__main__":
    main(*sys.argv[1:])
