"""Paragraph statistics over kilt_wikipedia (reference
``scripts/kilt_num_paragraphs.py``): reports how many mergeable paragraphs
each article yields under the KILT100w chunking rules (BULLET:: lines
dropped, anchors' paragraph ids merged) — the analysis behind the kilt-100w
corpus granularity.  Requires network access.

Usage: python scripts/kilt_num_paragraphs.py [n_samples]
"""

import sys
from collections import defaultdict

import numpy as np


def merged_paragraph_stats(sample):
    per_id = defaultdict(list)
    for para, pid in zip(sample["text"]["paragraph"],
                         sample["anchors"]["paragraph_id"]):
        if "BULLET::::" not in para and para.split():
            per_id[pid].append(para)
    merged = [" ".join(ps) for ps in per_id.values()]
    return {
        "num_paragraphs": len(merged),
        "lengths": [len(m.split()) for m in merged],
    }


def main(n_samples: str = "10000") -> None:
    import datasets

    limit = int(n_samples)  # validate before any download
    ds = datasets.load_dataset("kilt_wikipedia", split="full",
                               streaming=True)
    counts, lengths = [], []
    for i, sample in enumerate(ds):
        if i >= limit:
            break
        st = merged_paragraph_stats(sample)
        counts.append(st["num_paragraphs"])
        lengths.extend(st["lengths"])
    print(f"articles: {len(counts)}")
    print(f"paragraphs/article: mean {np.mean(counts):.1f} "
          f"p50 {np.percentile(counts, 50):.0f} p95 {np.percentile(counts, 95):.0f}")
    print(f"words/paragraph:    mean {np.mean(lengths):.1f} "
          f"p50 {np.percentile(lengths, 50):.0f} p95 {np.percentile(lengths, 95):.0f}")


if __name__ == "__main__":
    main(*sys.argv[1:])
