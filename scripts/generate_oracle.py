"""Oracle-run generation for the non-KILT benchmarks (one dispatcher replacing
the reference's per-dataset scripts: ``scripts/{frames,sciq,narrativeqa}_oracle.py``,
``{bioasq,pubmed,humaneval}_generate_oracle.py``): writes a TREC oracle run
per query that the oracle_provenance retriever replays.

Self-contained datasets (frames/sciq/narrativeqa) use doc_id == query_id
because their oracle document is attached to the query itself. Requires
network access to the HF hub for most targets.

Usage: python scripts/generate_oracle.py <target> [runs_folder]
       targets: frames frames_debug sciq narrativeqa bioasq_ragged
                bioasq11b humaneval timesensitiveqa
"""

import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bergen_tpu.utils import get_oracle_ranking_filename  # noqa: E402

TOP_N = 100


def _write(out_file, rows):
    """rows: iterable of (q_id, [doc_id, ...])."""
    with open(out_file, "w") as fout:
        for q_id, doc_ids in rows:
            for rank, doc_id in enumerate(doc_ids[:TOP_N]):
                fout.write(f"{q_id}\tq0\t{doc_id}\t{rank}\t{TOP_N - rank}\trun\n")
    print(f"wrote {out_file}")


def self_id_rows(dataset, id_col=None):
    for i, sample in enumerate(dataset):
        q_id = str(sample[id_col]) if id_col else str(i)
        yield q_id, [q_id]


def main(target: str, runs_folder: str = "runs") -> None:
    import datasets

    os.makedirs(runs_folder, exist_ok=True)

    if target in ("frames", "frames_debug"):
        ds = datasets.load_dataset("google/frames-benchmark")["test"]
        if target == "frames_debug":
            ds = ds.select(range(min(len(ds), 50)))
        _write(get_oracle_ranking_filename(runs_folder, target, "dev"),
               self_id_rows(ds, "Unnamed: 0"))

    elif target == "sciq":
        ds = datasets.load_dataset("sciq")["test"]
        rows = ((f"test{i}", [f"test{i}"]) for i in range(len(ds)))
        _write(get_oracle_ranking_filename(runs_folder, "sciq", "dev"), rows)

    elif target == "narrativeqa":
        ds = datasets.load_dataset("deepmind/narrativeqa")["test"]
        _write(get_oracle_ranking_filename(runs_folder, "narrativeqa", "dev"),
               self_id_rows(ds))

    elif target == "bioasq_ragged":
        ds = datasets.load_dataset("jenhsia/ragged", "bioasq")["train"]

        def rows():
            for sample in ds:
                seen, ids = set(), []
                for out in sample["output"]:
                    for prov in out.get("provenance") or []:
                        pid = str(prov["page_id"])
                        if pid not in seen:
                            seen.add(pid)
                            ids.append(pid)
                yield sample["id"], ids

        _write(get_oracle_ranking_filename(runs_folder, "BIOASQ11B_Ragged", "train"),
               rows())

    elif target == "bioasq11b":
        path = os.environ.get("BIOASQ_TSV", "data/bioasq11btrain/bioasq11btrain.tsv")
        ds = datasets.load_dataset("csv", data_files=[path], delimiter="\t")["train"]
        import ast

        rows = ((str(s["id"]), list(ast.literal_eval(s["docs"]))) for s in ds)
        _write(get_oracle_ranking_filename(runs_folder, "bioasq11b", "dev"), rows)

    elif target == "humaneval":
        queries = datasets.load_from_disk("datasets/CodeRAGBench_HumanEval_train")
        corpus = datasets.load_from_disk(
            "datasets/CodeRAGBench_programming_solutions_train"
        )

        def rows():
            for sample in queries:
                sig = f"def {sample['entry_point']}("
                for doc in corpus:
                    if sig in doc["content"]:
                        yield str(sample["id"]), [str(doc["id"])]
                        break

        _write(get_oracle_ranking_filename(runs_folder, "CodeRAGBench_HumanEval", "dev"),
               rows())

    elif target == "timesensitiveqa":
        # reference scripts/wikipedia_time_sensitive_qa_oracle.py: the oracle
        # passage id is the quoted en.wikipedia.org URL derived from the
        # question's page title (idx prefix before '#')
        import urllib.parse

        ds = datasets.load_dataset("diwank/time-sensitive-qa")["validation"]

        def rows():
            for sample in ds:
                title = str(sample["idx"]).split("#")[0]
                url = ("https://en.wikipedia.org"
                       + urllib.parse.quote(title).replace("_", "%20"))
                yield str(sample["idx"]), [url]

        _write(get_oracle_ranking_filename(runs_folder, "TimeSensitiveQA", "dev"),
               rows())

    else:
        raise SystemExit(
            f"unknown target {target!r}; see the docstring for the list"
        )


if __name__ == "__main__":
    main(*sys.argv[1:])
