"""NIH needle-in-haystack processors (reference
``modules/processors/nih_dataset_processor.py``): naver/bergen_nih_v1 configs
number / simple / multihop, each exposing a query or doc view."""

from __future__ import annotations

import datasets

from bergen_tpu.data.processor import Processor


class NIHDataset(Processor):
    def __init__(self, config_name="number", is_query=True, *args, **kwargs):
        name = f"nih_v1_{config_name}" + ("_query" if is_query else "_doc")
        super().__init__(*args, **kwargs, dataset_name=name)
        self.conf_name = config_name
        self.is_query = is_query

    def process(self):
        ds = datasets.load_dataset("naver/bergen_nih_v1", self.conf_name)[self.split]
        if self.is_query:
            ds = ds.rename_column("qid", "id")
            ds = ds.rename_column("query", "content")
            ds = ds.remove_columns(["did", "doc"])
            return ds.map(lambda ex: {"label": [str(ex["label"])]})
        ds = ds.rename_column("did", "id")
        ds = ds.rename_column("doc", "content")
        return ds.remove_columns(["qid", "query", "label"])


class NIHDatasetNumber(NIHDataset):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, config_name="number")


class NIHDatasetSimple(NIHDataset):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, config_name="simple")


class NIHDatasetMultiHop(NIHDataset):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, config_name="multihop")
