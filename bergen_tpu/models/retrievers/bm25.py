"""BM25 retriever over the C++ inverted index (native/bm25).

Replaces reference ``models/retrievers/bm25.py`` which shells into
``pyserini.index.lucene`` (JVM subprocess, :65-78) and queries through a JNI
``LuceneSearcher`` (:28-46).  Same scoring contract: Lucene BM25 with
pyserini's k1=0.9, b=0.4 defaults, English analysis with Porter stemming.
The library auto-builds with make on first use if the .so is missing."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from bergen_tpu.models.retrievers.base import Retriever

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", "native", "bm25"
)


def _load_lib() -> ctypes.CDLL:
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libbm25.so"))
    if not os.path.exists(so):
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)], check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(so)
    lib.bm25_create.restype = ctypes.c_void_p
    lib.bm25_create.argtypes = [ctypes.c_float, ctypes.c_float]
    lib.bm25_add_doc.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_char_p]
    lib.bm25_finalize.argtypes = [ctypes.c_void_p]
    lib.bm25_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.bm25_save.restype = ctypes.c_int
    lib.bm25_load.restype = ctypes.c_void_p
    lib.bm25_load.argtypes = [ctypes.c_char_p]
    lib.bm25_num_docs.argtypes = [ctypes.c_void_p]
    lib.bm25_num_docs.restype = ctypes.c_int32
    lib.bm25_search.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    lib.bm25_batch_search.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    lib.bm25_free.argtypes = [ctypes.c_void_p]
    return lib


class BM25(Retriever):
    def __init__(self, model_name: str = "bm25", k1: float = 0.9, b: float = 0.4,
                 threads: int | None = None, **kwargs):
        self.model_name = model_name
        self.k1 = k1
        self.b = b
        # reference passes `threads` to Lucene batch_search (bm25.py:28-31)
        self.threads = threads or os.cpu_count() or 1
        self.lib = _load_lib()
        self._handle = None

    def encode(self, texts, query_or_doc):
        raise RuntimeError("BM25 searches text directly; it never encodes")

    # ------------------------------------------------------------------ #

    def build_index(self, doc_texts: list[str], index_file: str) -> None:
        h = self.lib.bm25_create(self.k1, self.b)
        try:
            for i, text in enumerate(doc_texts):
                self.lib.bm25_add_doc(h, i, text.encode("utf-8", "ignore"))
            self.lib.bm25_finalize(h)
            os.makedirs(os.path.dirname(index_file), exist_ok=True)
            if self.lib.bm25_save(h, index_file.encode()) != 0:
                raise IOError(f"failed to save BM25 index to {index_file}")
        finally:
            self.lib.bm25_free(h)

    def open_index(self, index_file: str) -> None:
        if self._handle is not None:
            self.lib.bm25_free(self._handle)
        self._handle = self.lib.bm25_load(index_file.encode())
        if not self._handle:
            raise IOError(f"cannot load BM25 index {index_file}")

    def search(self, query_dataset, doc_dataset, top_k: int,
               index_file: str | None = None) -> dict:
        """Pipeline contract: {q_id, doc_id, score} ranked per query
        (reference bm25.py:28-46 batch_search)."""
        if self._handle is None:
            if index_file is None:
                raise RuntimeError("open_index() or index_file required")
            self.open_index(index_file)
        doc_ids = list(doc_dataset["id"])
        field = (
            "generated_query"
            if "generated_query" in query_dataset.features
            else "content"
        )
        out_q, out_d, out_s = [], [], []
        k = min(top_k, len(doc_ids))
        queries = list(query_dataset[field])
        docs, scores = self.batch_search(queries, k)
        for r, q_id in enumerate(query_dataset["id"]):
            d_row, s_row = [], []
            for i in range(k):
                if docs[r, i] < 0:
                    break
                d_row.append(doc_ids[docs[r, i]])
                s_row.append(float(scores[r, i]))
            out_q.append(q_id)
            out_d.append(d_row)
            out_s.append(s_row)
        return {"q_id": out_q, "doc_id": out_d, "score": out_s}

    def batch_search(self, queries: list[str], k: int,
                     threads: int | None = None):
        """Threaded batch search over the open index (the reference's
        LuceneSearcher.batch_search(threads=...) equivalent).  Returns
        (docs [n, k] int32 with -1 padding, scores [n, k] f32)."""
        n = len(queries)
        docs = np.full((n, k), -1, np.int32)
        scores = np.zeros((n, k), np.float32)
        if n == 0:
            return docs, scores
        enc = [q.encode("utf-8", "ignore") for q in queries]
        arr = (ctypes.c_char_p * n)(*enc)
        self.lib.bm25_batch_search(
            self._handle, arr, n, k, threads or self.threads,
            docs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return docs, scores

    def __del__(self):
        if getattr(self, "_handle", None):
            self.lib.bm25_free(self._handle)
