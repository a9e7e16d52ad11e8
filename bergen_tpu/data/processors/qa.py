"""QA benchmark processors (reference ``modules/processors/qa_dataset_processor.py``)."""

from __future__ import annotations

from collections import defaultdict

import datasets

from bergen_tpu.data.processor import Processor


class TimeSensitiveQA(Processor):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="TimeSensitiveQA")

    def process(self):
        ds = datasets.load_dataset(
            "diwank/time-sensitive-qa", num_proc=self.num_proc
        )[self.split]
        ds = ds.map(lambda ex: {"label": ex["targets"]})
        ds = ds.rename_column("question", "content")
        ds = ds.rename_column("idx", "id")
        return ds.remove_columns(["context", "paragraphs"])


class WIKIQA(Processor):
    """Keep only questions with at least one validated answer sentence; all
    valid sentences become labels (reference :26-57, without its O(n^2)
    per-question filter loop)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="wiki_qa")

    def process(self):
        ds = datasets.load_dataset("wiki_qa", num_proc=self.num_proc)[self.split]
        ds = ds.filter(lambda x: x["label"] == 1)
        by_qid: dict[str, dict] = {}
        answers = defaultdict(list)
        for row in ds:
            by_qid[row["question_id"]] = row["question"]
            answers[row["question_id"]].append(row["answer"])
        return datasets.Dataset.from_list(
            [
                {"id": qid, "content": q, "label": answers[qid]}
                for qid, q in by_qid.items()
            ]
        )


class SCIQ(Processor):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="sciq")

    def process(self):
        ds = datasets.load_dataset("sciq", num_proc=self.num_proc)[self.split]
        ds = ds.add_column("id", [self.split + str(i) for i in range(len(ds))])
        distractors = ["distractor1", "distractor2", "distractor3"]
        if self.oracle_provenance:
            ds = ds.rename_column("support", "content")
            return ds.remove_columns(["question", "correct_answer"] + distractors)
        ds = ds.rename_column("question", "content")
        ds = ds.map(lambda ex: {"label": [ex["correct_answer"]]})
        return ds.remove_columns(["support", "correct_answer"] + distractors)


class ASQA(Processor):
    """Ambiguous questions; all distinct short answers across qa_pairs are
    acceptable labels (reference :88-161)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="asqa")

    def process(self):
        ds = datasets.load_dataset("din0s/asqa", num_proc=self.num_proc)[self.split]
        ds = ds.map(lambda ex, i: {"id": str(i), **ex}, with_indices=True)
        ds = ds.rename_column("ambiguous_question", "content")
        ds = ds.map(
            lambda ex: {
                "label": list(
                    {a for qa in ex["qa_pairs"] for a in qa["short_answers"]}
                )
            }
        )
        return ds.remove_columns(
            ["qa_pairs", "wikipages", "annotations", "sample_id"]
        )


class truthful_qa(Processor):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="truthful_qa")

    def process(self):
        ds = datasets.load_dataset(
            "truthful_qa", "generation", num_proc=self.num_proc
        )[self.split]
        ds = ds.map(lambda ex, i: {"id": str(i), **ex}, with_indices=True)
        ds = ds.map(lambda ex: {"label": [ex["best_answer"]]})
        ds = ds.rename_column("question", "content")
        return ds.remove_columns(
            ["best_answer", "type", "category", "correct_answers",
             "incorrect_answers", "source"]
        )


class POPQA(Processor):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="popqa")

    def process(self):
        ds = datasets.load_dataset("akariasai/PopQA", num_proc=self.num_proc)[
            self.split
        ]
        ds = ds.rename_column("question", "content")
        ds = ds.map(lambda ex: {"label": eval(ex["possible_answers"])})
        ds = ds.remove_columns(
            ["possible_answers", "id", "subj", "prop", "obj", "subj_id",
             "prop_id", "obj_id", "s_aliases", "o_aliases", "s_uri", "o_uri",
             "s_wiki_title", "o_wiki_title", "s_pop", "o_pop"]
        )
        return ds.add_column("id", [self.split + str(i) for i in range(len(ds))])


class wikimultihopqa(Processor):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="2wikimultihopqa")

    def process(self):
        ds = datasets.load_dataset(
            "scholarly-shadows-syndicate/2wikimultihopqa_with_q_gpt35",
            num_proc=self.num_proc,
        )[self.split]
        ds = ds.rename_column("question", "content")
        ds = ds.map(lambda ex: {"label": [ex["answer"]]})
        ds = ds.remove_columns(
            ["answer", "evidences", "supporting_facts", "context"]
        )
        return ds.add_column("id", [self.split + str(i) for i in range(len(ds))])
