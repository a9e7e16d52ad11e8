"""KILT benchmark query processors (reference
``modules/processors/kilt_dataset_processor.py``).

Every KILT task shares one normalisation: non-empty answers become ``label``,
per-answer provenance wikipedia ids become ``ranking_label``, ``input`` →
``content``.  One parametrized base class covers the ten plain tasks; TriviaQA
(question join, reference :38-56) and ELI5 (provenance backfill, :121-160) add
their quirks on top.
"""

from __future__ import annotations

import json
import os
import urllib.request
from collections import defaultdict

import datasets

from bergen_tpu.data.processor import Processor


def kilt_standard_transform(dataset, num_proc: int = 1):
    """Shared KILT output normalisation (reference kilt :21-27 et al.)."""
    dataset = dataset.map(
        lambda ex: {
            "label": [o["answer"] for o in ex["output"] if len(o["answer"]) > 0]
        },
        num_proc=num_proc,
    )
    dataset = dataset.map(
        lambda ex: {
            "ranking_label": [
                [p["wikipedia_id"] for p in o["provenance"]]
                if len(o["answer"]) > 0 and len(o["provenance"]) > 0
                else []
                for o in ex["output"]
            ]
        },
        num_proc=num_proc,
    )
    dataset = dataset.rename_column("input", "content")
    return dataset.remove_columns(["meta", "output"])


class KiltTask(Processor):
    """Parametrized base: ``hf_subset`` selects the kilt_tasks config."""

    hf_subset: str = ""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name=f"kilt_{self.hf_subset}")

    def load(self):
        return datasets.load_dataset(
            "kilt_tasks", self.hf_subset, num_proc=self.num_proc
        )[self.split]

    def process(self):
        return kilt_standard_transform(self.load(), self.num_proc)


class KILTNQ(KiltTask):
    hf_subset = "nq"


class KILTHotpotqa(KiltTask):
    hf_subset = "hotpotqa"


class KILTAidayago2(KiltTask):
    hf_subset = "aidayago2"


class KILTCweb(KiltTask):
    hf_subset = "cweb"


class KILTFever(KiltTask):
    hf_subset = "fever"


class KILTStructuredZeroshot(KiltTask):
    hf_subset = "structured_zeroshot"


class KILTSTrex(KiltTask):
    hf_subset = "trex"

    def __init__(self, *args, **kwargs):
        Processor.__init__(self, *args, **kwargs, dataset_name="kilt_trex")


class KILTWned(KiltTask):
    hf_subset = "wned"


class KILTWow(KiltTask):
    hf_subset = "wow"


class KILTTriviaqa(KiltTask):
    """kilt triviaqa ships only question ids; texts are joined in from the
    original trivia_qa (reference :30-65)."""

    hf_subset = "triviaqa_support_only"

    def __init__(self, *args, **kwargs):
        Processor.__init__(self, *args, **kwargs, dataset_name="kilt_triviaqa")

    def process(self):
        dataset = self.load()
        kilt_ids = set(dataset["id"])
        trivia = datasets.load_dataset("trivia_qa", "unfiltered.nocontext")[self.split]
        qid_to_row = {qid: i for i, qid in enumerate(trivia["question_id"])}

        dataset = dataset.filter(
            lambda x: x["id"] in qid_to_row and x["id"] in kilt_ids,
            num_proc=self.num_proc,
        )

        def join_question(x):
            row = trivia[qid_to_row[x["id"]]]
            x["input"] = row["question"]
            x["output"][0]["original_answer"] = row["answer"]["value"]
            return x

        dataset = dataset.map(join_question, num_proc=self.num_proc)
        return kilt_standard_transform(dataset, self.num_proc)


class KILTEli5(KiltTask):
    """The HF mirror drops dev provenances; backfill them from the official
    KILT jsonl (reference :126-152)."""

    hf_subset = "eli5"
    PROVENANCE_URL = "https://dl.fbaipublicfiles.com/KILT/eli5-dev-kilt.jsonl"

    def process(self):
        dataset = self.load()
        if self.split == "dev":
            local = "../data/eli5-dev-kilt.jsonl"
            if not os.path.exists(local):
                urllib.request.urlretrieve(self.PROVENANCE_URL, local)
            provenance = defaultdict(dict)
            with open(local) as f:
                for line in f:
                    ex = json.loads(line)
                    provenance[ex["id"]] = [
                        o["provenance"] for o in ex["output"] if "provenance" in o
                    ]

            def backfill(x):
                for i, p in enumerate(provenance[x["id"]]):
                    x["output"][i]["provenance"] = p
                return x

            dataset = dataset.map(backfill)
        return kilt_standard_transform(dataset, self.num_proc)


class KILTMULTIQA(Processor):
    """Combined-QA over multiple KILT tasks (reference :252-326); labels can be
    replaced by stored responses from prior runs (distillation targets)."""

    def __init__(self, response_files: list | None = None, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="kilt_combined_qa")
        self.response_files = response_files
        self.use_cache = response_files is None

    def process(self):
        dataset = datasets.load_dataset("dmrau/combined_qa")[self.split]
        if self.response_files is not None:
            responses = {}
            for path in self.response_files:
                with open(path) as f:
                    for row in json.load(f):
                        responses[row["q_id"]] = row["response"]
            assert set(dataset["id"]) == set(responses), "response files incomplete"
            dataset = dataset.map(
                lambda ex: {"label": [responses[ex["id"]]]}
            )
        return dataset

    def get_dataset(self):
        if self.use_cache:
            return super().get_dataset()
        # uncached path: labels come from response files, never persist them
        dataset = self.process()
        dataset.id2index = self.get_index_to_id(dataset)
        if self.debug:
            dataset = dataset.select(range(min(len(dataset), 50)))
        if self.shuffle_labels:
            dataset = self.shuffled_labels_as_content(dataset)
        dataset.name = self.dataset_name + ("_debug" if self.debug else "")
        return dataset


class KiltMultiQAMSMarco(Processor):
    """Combined QA + MS MARCO mixture for generator fine-tuning (reference
    :328-373; the reference hard-codes a scratch path — here it's an arg)."""

    def __init__(self, data_path: str = "data/kilt_combined_qa_ms_marco",
                 *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="kilt_combined_qa_ms_marco")
        self.data_path = data_path

    def process(self):
        return datasets.load_from_disk(self.data_path)
