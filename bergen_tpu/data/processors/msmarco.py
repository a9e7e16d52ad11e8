"""MS MARCO full-document processors (reference
``modules/processors/msmarco_dataset_processor.py``)."""

from __future__ import annotations

import numpy as np

import datasets

from bergen_tpu.data.processor import Processor


class MsMarcoFullDocCollection(Processor):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="ms-marco-docs-v1")

    def process(self):
        ds = datasets.load_dataset(
            "irds/msmarco-document", "docs", num_proc=self.num_proc
        )
        ds = ds.rename_column("doc_id", "id")
        ds = ds.map(
            lambda ex: {"content": ex["title"] + " " + ex["body"]},
            num_proc=self.num_proc,
        )
        return ds.remove_columns(["url", "title", "body"])


class MsMarcoFullDocQueries(Processor):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="ms-marco-docs-v1-queries-dev")

    def process(self):
        import ir_datasets

        ird = ir_datasets.load("msmarco-document/train")
        qids, texts = [], []
        for q in ird.queries_iter():
            qids.append(q.query_id)
            texts.append(q.text)
        return datasets.Dataset.from_dict({"id": qids, "content": texts})


class MsMarcoFullDocChunkCollection(Processor):
    """Docs split into random-length sentence chunks (1-10 sentences, skewed
    long) with the title prepended; used for Provence training (reference
    :42-83, arXiv:2501.16214)."""

    def __init__(self, seed: int = 0, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="ms-marco-docs-v1-chunked-v1")
        self.seed = seed

    def process(self):
        ds = datasets.load_dataset(
            "irds/msmarco-document", "docs", num_proc=self.num_proc
        )
        ds = ds.rename_column("doc_id", "id")
        rng = np.random.default_rng(self.seed)

        def gen():
            for ex in ds:
                lines = (ex["title"] + " " + ex["body"]).split("\n")
                title = lines[0] if lines and lines[0] != "" else ""
                sents = [s for s in lines[1:] if s != ""]
                left, chunk_id = 0, 0
                while left < len(sents):
                    u = rng.random() * rng.random() * 0.99
                    length = 10 - int(u * 10)  # 1..10, skewed toward 10
                    chunk = [title] + sents[left : left + length]
                    yield {
                        "id": f"{ex['id']}:{chunk_id}",
                        "content": " ".join(chunk),
                    }
                    left += length
                    chunk_id += 1

        return datasets.Dataset.from_generator(gen)
