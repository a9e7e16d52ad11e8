"""Dataset processing layer.

Every dataset (queries or documents) is normalised to an HF ``datasets.Dataset``
with the schema the whole pipeline relies on (reference
``modules/dataset_processor.py:10-16``):

* ``id``      — str, unique example id
* ``content`` — str (question text / passage text)
* ``label``   — List[str], acceptable answers (query datasets only)
* ``ranking_label`` — optional provenance ids for retrieval eval

Processed datasets are cached with ``save_to_disk`` plus a pickled ``id2index``
side table (reference :76-103), keyed by ``{name}_{split}`` so any pipeline
re-run hits the cache.  Host-side only — this layer feeds the device queues, it
never touches JAX.
"""

from __future__ import annotations

import os
import pickle
import random
from collections import defaultdict
from functools import partial
from typing import Dict

import datasets
from datasets import Dataset

from bergen_tpu import confy


class Processor:
    """Base processor: subclasses implement ``process() -> Dataset``; caching,
    debug subsetting, label shuffling and id2index live here (reference
    ``modules/dataset_processor.py:31-103``)."""

    def __init__(
        self,
        dataset_name: str,
        split: str,
        out_folder: str,
        num_proc: int,
        overwrite: bool,
        debug: bool,
        oracle_provenance: bool,
        shuffle_labels: bool,
    ) -> None:
        self.dataset_name = dataset_name
        self.split = split
        self.num_proc = num_proc
        self.out_folder = out_folder
        self.overwrite = overwrite
        self.debug = debug
        self.oracle_provenance = oracle_provenance
        self.shuffle_labels = shuffle_labels

    def process(self) -> Dataset:
        raise NotImplementedError

    # ----- helpers ---------------------------------------------------------

    def get_index_to_id(self, dataset: Dataset) -> Dict[str, int]:
        return dict(zip(dataset["id"], range(len(dataset))))

    def shuffled_labels_as_content(self, dataset: Dataset) -> Dataset:
        """Random-answer baseline: shuffle labels across queries, keep original
        first label as ranking_label (reference :67-74)."""
        random.seed(42)
        col = list(dataset["label"])
        random.shuffle(col)
        d = dataset.to_dict()
        d["ranking_label"] = [el[0] for el in col]
        return datasets.Dataset.from_dict(d)

    # ----- cached load -----------------------------------------------------

    def get_dataset(self) -> Dataset:
        assert self.dataset_name is not None
        debug_str = "_debug" if self.debug else ""
        oracle_str = "_oracle_provenance" if self.oracle_provenance else ""
        out_folder = os.path.join(
            self.out_folder, f"{self.dataset_name}_{self.split}{oracle_str}"
        )
        if os.path.exists(out_folder) and not self.overwrite:
            dataset = datasets.load_from_disk(out_folder)
            with open(os.path.join(out_folder, "id2index.p"), "rb") as f:
                id2index = pickle.load(f)
            if self.debug:
                dataset = dataset.select(range(min(len(dataset), 50)))
            if self.shuffle_labels:
                dataset = self.shuffled_labels_as_content(dataset)
        else:
            dataset = self.process()
            dataset.save_to_disk(out_folder)
            id2index = self.get_index_to_id(dataset)
            with open(os.path.join(out_folder, "id2index.p"), "wb") as f:
                pickle.dump(id2index, f)
            if self.debug:
                dataset = dataset.select(range(min(len(dataset), 50)))
            if self.shuffle_labels:
                dataset = self.shuffled_labels_as_content(dataset)
        dataset.id2index = id2index
        dataset.name = self.dataset_name + debug_str + oracle_str
        return dataset


class MergedDocDataset(Processor):
    """Multi-corpus concat with id prefixing (reference :595-633). Inputs must
    already be processed to disk."""

    def __init__(self, out_dataset_name, in_dataset_names, in_dataset_splits,
                 *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name=out_dataset_name)
        assert len(in_dataset_names) == len(in_dataset_splits)
        self.in_dataset_names = in_dataset_names
        self.in_dataset_splits = in_dataset_splits

    def process(self):
        raise NotImplementedError(
            "Merge inputs must be preprocessed independently first."
        )

    def get_dataset(self):
        def prepend(example, label):
            example["id"] = f"{label}_{example['id']}"
            return example

        debug_str = "_debug" if self.debug else ""
        oracle_str = "_oracle_provenance" if self.oracle_provenance else ""
        loaded = []
        for name, split in zip(self.in_dataset_names, self.in_dataset_splits):
            in_folder = os.path.join(self.out_folder, f"{name}_{split}{oracle_str}")
            if not os.path.exists(in_folder):
                raise ValueError(f"Dataset {in_folder} not found")
            ds = datasets.load_from_disk(in_folder)
            ds = ds.map(partial(prepend, label=name), num_proc=self.num_proc)
            loaded.append(ds)
        dataset = datasets.concatenate_datasets(loaded)
        dataset.id2index = self.get_index_to_id(dataset)
        if self.debug:
            dataset = dataset.select(range(50))
        if self.shuffle_labels:
            dataset = self.shuffled_labels_as_content(dataset)
        dataset.name = self.dataset_name + debug_str + oracle_str
        return dataset


class ProcessDatasets:
    """Instantiate & run all processors for a dataset config tree
    ``{split: {query: cfg, doc: cfg}}`` (reference :636-698)."""

    @staticmethod
    def _sanity_checks(dataset: Dataset) -> None:
        for example in dataset:
            for field, value in example.items():
                if value is None:
                    raise ValueError(f"None value in '{field}' field.")
                if isinstance(value, list) and None in value:
                    raise ValueError(f"None inside list in '{field}' field.")
                if isinstance(value, str) and len(value.strip()) == 0:
                    raise ValueError(f"Empty value in '{field}' field.")
                if isinstance(value, list) and len(value) == 0:
                    raise ValueError(f"Empty list in '{field}' field.")

    @staticmethod
    def process(dataset_config, out_folder="datasets", num_proc=1, overwrite=False,
                debug=False, oracle_provenance=False, shuffle_labels=False):
        out = defaultdict(dict)
        for split in dataset_config:
            for query_or_doc in dataset_config[split]:
                node = dataset_config[split][query_or_doc]
                if node is not None:
                    processor = confy.instantiate(
                        node["init_args"],
                        out_folder=out_folder,
                        num_proc=num_proc,
                        overwrite=overwrite,
                        debug=debug if query_or_doc == "query" else False,
                        oracle_provenance=(
                            oracle_provenance if query_or_doc == "doc" else False
                        ),
                        shuffle_labels=(
                            shuffle_labels if query_or_doc == "query" else False
                        ),
                    )
                    dataset = processor.get_dataset()
                    if query_or_doc == "query":
                        ProcessDatasets._sanity_checks(dataset)
                    out[split][query_or_doc] = dataset
                else:
                    out[split][query_or_doc] = None
        return out

    @staticmethod
    def check_instantiate(dataset_config, out_folder="datasets", num_proc=1,
                          overwrite=False, debug=False):
        for split in dataset_config:
            for query_or_doc in dataset_config[split]:
                node = dataset_config[split][query_or_doc]
                if node is not None:
                    confy.instantiate(
                        node["init_args"],
                        out_folder=out_folder,
                        num_proc=num_proc,
                        overwrite=overwrite,
                        debug=debug if query_or_doc == "query" else False,
                        oracle_provenance=False,
                        shuffle_labels=False,
                    )
        return True
