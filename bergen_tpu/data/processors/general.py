"""General-domain query & document processors (reference
``modules/dataset_processor.py:133-543``): QA benchmark queries and the large
Wikipedia / PubMed / MS MARCO document corpora, all normalised to the
``id``/``content``[/``label``/``ranking_label``] schema."""

from __future__ import annotations

import json

import datasets

from bergen_tpu.data.processor import Processor


class BIOASQ11B(Processor):
    """TSV export of the BioASQ 11B task (reference :133-152)."""

    def __init__(self, data_path: str, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="BIOASQ11B")
        self.path = data_path

    def process(self):
        ds = datasets.load_dataset("csv", data_files=[self.path], delimiter="\t")[
            self.split
        ]
        ds = ds.map(lambda ex: {"label": eval(ex["ideal_answer"])})
        ds = ds.rename_column("question", "content")
        return ds.remove_columns(["docs", "type", "exact_answer", "snippets"])


class MMLU(Processor):
    """Choices are folded into the question text; label is the 1-based answer
    index as a string (reference :154-189)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="mmlu")

    def process(self):
        ds = datasets.load_dataset("cais/mmlu", "all", num_proc=self.num_proc)[
            self.split
        ]
        ds = ds.map(lambda ex, i: {"id": str(i), **ex}, with_indices=True)
        ds = ds.map(
            lambda ex: {
                "content": ex["question"]
                + " "
                + " ".join(f"{i + 1}. {c}" for i, c in enumerate(ex["choices"]))
            },
            num_proc=self.num_proc,
        )
        ds = ds.map(lambda ex: {"label": [str(ex["answer"])]})
        return ds.remove_columns(["subject", "choices", "question", "answer"])


class NQOpen(Processor):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="nq_open")

    def process(self):
        ds = datasets.load_dataset("nq_open", num_proc=self.num_proc)[self.split]
        ds = ds.map(lambda ex, i: {"id": str(i), **ex}, with_indices=True)
        ds = ds.rename_column("answer", "label")
        ds = ds.rename_column("question", "content")
        return ds.map(
            lambda ex: {"label": [l.replace("\xa0", " ") for l in ex["label"]]}
        )


class MsMarcoQueries(Processor):
    """Dev queries from a local JSON {qid: text} dump (reference :220-230 —
    the hard-coded cluster path becomes an argument)."""

    def __init__(self, data_path: str = "data/dev_queries.json", *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="ms-marco-dev-queries")
        self.data_path = data_path

    def process(self):
        with open(self.data_path) as f:
            queries = json.load(f)
        ids, texts = zip(*queries.items())
        return datasets.Dataset.from_dict({"id": list(ids), "content": list(texts)})


class Frames(Processor):
    """google/frames-benchmark queries; oracle docs from naver/frames_oracle
    (reference :236-256)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="frames")

    def process(self):
        if self.oracle_provenance:
            ds = datasets.load_dataset("naver/frames_oracle", num_proc=self.num_proc)[
                "train"
            ]
            return ds.map(lambda ex: {"id": str(ex["id"])})
        ds = datasets.load_dataset(
            "google/frames-benchmark", num_proc=self.num_proc
        )[self.split]
        ds = ds.rename_column("Prompt", "content")
        ds = ds.map(
            lambda ex: {"id": str(ex["Unnamed: 0"]), "label": [ex["Answer"]]}
        )
        keep = {"id", "label", "content"}
        return ds.remove_columns([c for c in ds.column_names if c not in keep])


# --------------------------------------------------------------------------- #
# document corpora
# --------------------------------------------------------------------------- #


class _TitledCsvCorpus(Processor):
    """TSV (id, text, title) corpora with 'title: text' content."""

    def __init__(self, data_path, label="", *args, dataset_name, **kwargs):
        super().__init__(*args, **kwargs, dataset_name=dataset_name + label)
        self.path = data_path

    def process(self):
        ds = datasets.load_dataset(
            "csv", data_files=[self.path], delimiter="\t",
            column_names=["id", "text", "title"],
        )[self.split]
        ds = ds.map(
            lambda ex: {"content": f"{ex['title']}: {ex['text']}"},
            num_proc=self.num_proc,
        )
        return ds.remove_columns(["title", "text"])


class ReproduceWikiCorpora63(_TitledCsvCorpus):
    def __init__(self, data_path, label="", *args, **kwargs):
        super().__init__(
            data_path, label, *args, dataset_name="reproduce-wiki-corpora-63",
            **kwargs,
        )


class _OdqaWikiCorpus(Processor):
    """castorini/odqa-wiki-corpora variants (reference :278-463)."""

    hf_subset: str = ""
    corpus_name: str = ""
    title_sep: str = ": "

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name=self.corpus_name)

    def process(self):
        ds = datasets.load_dataset(
            "castorini/odqa-wiki-corpora", self.hf_subset, num_proc=self.num_proc
        )[self.split]
        ds = ds.map(
            lambda ex: {"content": f"{ex['title']}{self.title_sep}{ex['text']}"},
            num_proc=self.num_proc,
        )
        ds = ds.rename_column("docid", "id")
        return ds.remove_columns(["title", "text"])


class ODQAWikiCorpora100WTamber(_OdqaWikiCorpus):
    hf_subset = "wiki-text-100w-tamber"
    corpus_name = "odqa-wiki-corpora-100w-tamber"
    title_sep = " "


class ODQAWikiCorpora100WKarpukhin(_OdqaWikiCorpus):
    hf_subset = "wiki-text-100w-karpukhin"
    corpus_name = "odqa-wiki-corpora-100w-karpukhin"


class ODQAWikiCorpora63tamber(_OdqaWikiCorpus):
    hf_subset = "wiki-text-6-3-tamber"
    corpus_name = "odqa-wiki-corpora-63-tamber"


class ODQAWikiCorpora63tamberALL(_OdqaWikiCorpus):
    hf_subset = "wiki-all-6-3-tamber"
    corpus_name = "odqa-wiki-corpora-all-63-tamber"


class KILT100w(Processor):
    """KILT Wikipedia split into 100-word passages; oracle-provenance mode
    instead keeps predefined paragraphs with ``{wiki_id}_{i+1}`` ids so oracle
    TREC runs resolve (reference :297-340)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="kilt-100w")

    def process(self):
        raw = datasets.load_dataset("kilt_wikipedia", num_proc=self.num_proc)[
            self.split
        ]

        def split_100w(sample, num_words=100):
            title = sample["wikipedia_title"]
            passages = [
                x.strip()
                for x in sample["text"]["paragraph"]
                if "BULLET::::" not in x
            ]
            doc = " ".join(passages).replace("Section::::", "Section:")
            words = doc.split()
            paragraphs = [
                title + ". " + " ".join(words[i : i + num_words])
                for i in range(0, len(words), num_words)
            ]
            return {
                "paragraphs": paragraphs,
                "wiki_ids": [sample["wikipedia_id"]] * len(paragraphs),
            }

        def predefined_paragraphs(sample):
            wiki_id = sample["wikipedia_id"]
            title = sample["wikipedia_title"]
            paragraphs = [
                title + ". " + p.replace("Section::::", "Section:")
                for p in sample["text"]["paragraph"]
            ]
            return {
                "paragraphs": paragraphs,
                "id": [f"{wiki_id}_{i + 1}" for i in range(len(paragraphs))],
                "wiki_ids": [wiki_id] * len(paragraphs),
            }

        map_fn = predefined_paragraphs if self.oracle_provenance else split_100w
        mapped = raw.map(map_fn, num_proc=self.num_proc)
        paragraphs = [p for row in mapped["paragraphs"] for p in row]
        if self.oracle_provenance:
            ids = [i for row in mapped["id"] for i in row]
            return datasets.Dataset.from_dict({"content": paragraphs, "id": ids})
        wiki_ids = [w for row in mapped["wiki_ids"] for w in row]
        ds = datasets.Dataset.from_dict(
            {"content": paragraphs, "wikipedia_id": wiki_ids}
        )
        return ds.map(lambda ex, i: {"id": str(i), **ex}, with_indices=True)


class Wiki_monolingual_100w(Processor):
    """wikimedia/wikipedia 20231101.<lang> → 100-unit passages; zh/ja/th split
    by characters (reference :368-399)."""

    def __init__(self, lang, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="wiki-100w-" + lang)
        self.lang = lang

    def process(self):
        raw = datasets.load_dataset(
            "wikimedia/wikipedia", "20231101." + self.lang, num_proc=self.num_proc
        )[self.split]
        char_split = self.lang in ("zh", "ja", "th")

        def split_100(sample, num_units=100):
            units = list(sample["text"]) if char_split else sample["text"].split()
            paragraphs = [
                sample["title"] + ". " + " ".join(units[i : i + num_units])
                for i in range(0, len(units), num_units)
            ]
            return {
                "paragraphs": paragraphs,
                "wiki_ids": [sample["id"]] * len(paragraphs),
            }

        mapped = raw.map(split_100, num_proc=self.num_proc)
        paragraphs = [p for row in mapped["paragraphs"] for p in row]
        wiki_ids = [w for row in mapped["wiki_ids"] for w in row]
        ds = datasets.Dataset.from_dict(
            {"content": paragraphs, "wikipedia_id": wiki_ids}
        )
        return ds.map(lambda ex, i: {"id": str(i), **ex}, with_indices=True)


class NarrativeQA(Processor):
    def __init__(self, full_text, *args, **kwargs):
        super().__init__(
            *args, **kwargs,
            dataset_name="narrativeqa_full" if full_text else "narrativeqa",
        )
        self.full_text = full_text

    def process(self):
        ds = datasets.load_dataset("deepmind/narrativeqa", num_proc=self.num_proc)[
            self.split
        ]
        ds = ds.add_column("id", [str(i) for i in range(len(ds))])
        if self.oracle_provenance:
            if self.full_text:
                ds = ds.map(lambda ex: {"content": ex["document"]["text"]})
            else:
                ds = ds.map(
                    lambda ex: {"content": ex["document"]["summary"]["text"]}
                )
        else:
            ds = ds.map(
                lambda ex: {
                    "content": ex["question"]["text"].lower(),
                    "label": [ex["answers"][1]["text"]],
                }
            )
        return ds.remove_columns(["question", "document", "answers"])


class PubMed2023(Processor):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="PubMed-2023")

    def process(self):
        ds = datasets.load_dataset(
            "ncbi/pubmed", num_proc=self.num_proc, trust_remote_code=True
        )[self.split]
        ds = ds.map(
            lambda ex: {
                "content": (
                    f"{ex['MedlineCitation']['Article']['ArticleTitle']}: "
                    f"{ex['MedlineCitation']['Article']['Abstract']['AbstractText']}"
                ),
                "id": str(ex["MedlineCitation"]["PMID"]),
            },
            num_proc=self.num_proc,
        )
        return ds.remove_columns(["MedlineCitation", "PubmedData"])


class Wikipedia2023_section(Processor):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="wikipedia-2023-section")

    def process(self):
        ds = datasets.load_dataset(
            "rasdani/cohere-wikipedia-2023-11-en", num_proc=self.num_proc
        )[self.split]
        ds = ds.map(
            lambda ex: {"content": f"{ex['title']}: {ex['text']}"},
            num_proc=self.num_proc,
        )
        ds = ds.remove_columns(["text", "title"])
        return ds.rename_column("_id", "id")


class Wikipedia2023_full(Processor):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="wikipedia-2023-full")

    def process(self):
        ds = datasets.load_dataset(
            "wikimedia/wikipedia", "20231101.en", num_proc=self.num_proc
        )[self.split]
        ds = ds.map(
            lambda ex: {"content": f"{ex['title']}: {ex['text']}"},
            num_proc=self.num_proc,
        )
        ds = ds.remove_columns(["id", "text", "title"])
        return ds.rename_column("url", "id")


class MsMarcoCollection(Processor):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs, dataset_name="ms-marco")

    def process(self):
        ds = datasets.load_dataset(
            "irds/msmarco-passage", "docs", num_proc=self.num_proc
        )
        ds = ds.rename_column("doc_id", "id")
        return ds.rename_column("text", "content")
