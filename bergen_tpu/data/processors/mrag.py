"""Multilingual RAG processors (reference
``modules/processors/mrag_dataset_processor.py``): MKQA (joined with kilt_nq
provenances), XOR-TyDiQA (official jsonl with per-language yes/no extension),
and TyDiQA secondary task."""

from __future__ import annotations

import os
import urllib.request

import datasets

from bergen_tpu.data.processor import Processor

_YES = {"ru": ["да"], "ko": ["예"], "ja": ["はい"], "fi": ["kyllä", "joo"],
        "ar": ["نعم", "أجل", "بلى"]}
_NO = {"ru": ["нет"], "ko": ["아니요"], "ja": ["いいえ"], "fi": ["ei"],
       "ar": ["لا"]}


class MKQA(Processor):
    """Per-language queries/labels from MKQA, intersected with kilt_nq to
    inherit its wikipedia provenances as ranking labels (reference :6-31)."""

    def __init__(self, lang, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name=f"mkqa_{lang}")
        # the MKQA dataset has no bare "zh" key (only zh_cn/zh_hk/zh_tw);
        # normalize so the mkqa_zh configs and qrel.mkqa_zh filenames work
        # while sample access uses the real simplified-Chinese key
        self.lang = {"zh": "zh_cn"}.get(lang, lang)

    def process(self):
        mkqa = datasets.load_dataset("mkqa", trust_remote_code=True)
        kilt_nq = datasets.load_dataset("kilt_tasks", "nq")

        mkqa_rows = {s["example_id"]: i for i, s in enumerate(mkqa[self.split])}
        nq_rows = {s["id"]: i for i, s in enumerate(kilt_nq[self.split])}
        shared = set(mkqa_rows) & set(nq_rows)
        mk = mkqa["train"].select([mkqa_rows[i] for i in shared])
        nq = kilt_nq["train"].select([nq_rows[i] for i in shared])

        ds = nq.add_column(
            "content", [s["queries"][self.lang] for s in mk]
        )
        ds = ds.add_column(
            "label",
            [
                [a["text"] for a in s["answers"][self.lang] if a["text"] is not None]
                for s in mk
            ],
        )
        ds = ds.filter(lambda ex: len(ex["label"]) > 0)
        ds = ds.map(
            lambda ex: {
                "ranking_label": [
                    [p["wikipedia_id"] for p in o["provenance"]]
                    if len(o["answer"]) > 0 and len(o["provenance"]) > 0
                    else []
                    for o in ex["output"]
                ]
            }
        )
        return ds.remove_columns(["meta"])


class XORQA(Processor):
    """XOR-TyDiQA dev set from the official jsonl; yes/no answers are extended
    with their target-language surface forms (reference :34-57)."""

    DATA_URL = (
        "https://nlp.cs.washington.edu/xorqa/XORQA_site/data/xor_dev_full_v1_1.jsonl"
    )

    def __init__(self, lang, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name=f"xor_tydiqa_{lang}")
        self.lang = lang

    def process(self):
        local = "xor_dev_full_v1_1.jsonl"
        if not os.path.exists(local):
            urllib.request.urlretrieve(self.DATA_URL, local)
        try:
            ds = datasets.load_dataset("json", data_files=local)["train"]
            ds = ds.filter(lambda ex: ex["lang"] == self.lang)

            def to_labels(ex):
                labels = [a for a in ex["answers"] if len(a) > 0]
                if "yes" in labels:
                    labels = labels + _YES[self.lang]
                if "no" in labels:
                    labels = labels + _NO[self.lang]
                return {"label": labels}

            ds = ds.map(to_labels)
            ds = ds.rename_column("question", "content")
            ds = ds.map(lambda ex: {"id": str(ex["id"])})
        finally:
            if os.path.exists(local):
                os.remove(local)
        return ds


class TydiQA(Processor):
    def __init__(self, langcode="en", language="english", *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name=f"tydiqa_{langcode}")
        self.language = language

    def process(self):
        ds = datasets.load_dataset(
            "google-research-datasets/tydiqa", "secondary_task"
        )[self.split]
        ds = ds.filter(lambda ex: ex["id"].startswith(self.language))
        ds = ds.map(
            lambda ex: {"label": [a for a in ex["answers"]["text"] if len(a) > 0]}
        )
        ds = ds.rename_column("question", "content")
        return ds.remove_columns(["title", "context", "answers"])
