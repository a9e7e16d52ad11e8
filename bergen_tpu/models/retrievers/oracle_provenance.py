"""Oracle-provenance retriever stub (reference
``models/retrievers/oracle_provenance.py:8-22``): retrieval is read from a
pre-existing ``runs/run.oracle.{dataset}.{split}.trec`` file, so the model does
nothing."""

from bergen_tpu.models.retrievers.base import Retriever


class OracleProvenance(Retriever):
    def __init__(self, model_name: str = "oracle_provenance", **kwargs):
        self.model_name = model_name

    def encode(self, texts, query_or_doc):
        raise RuntimeError("oracle_provenance never encodes; ranking comes from runs/")
