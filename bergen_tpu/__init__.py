"""bergen_tpu — a TPU-native RAG benchmarking framework.

Rebuilds the capabilities of naver/bergen (RAG question-answering benchmarking:
``question >> retriever >> reranker >> LLM >> answer``) with a JAX/XLA/Pallas
engine designed for TPU hardware: jitted mesh-sharded encoder/LLM forwards,
device-resident embedding shards scored by Pallas tiled-GEMM kernels with a
distributed top-k merge over ICI, and a C++ BM25 inverted index replacing the
reference's Lucene/JVM dependency.  On-disk artifacts (TREC runs, qrels,
``eval_*_out.json``, cache filenames) remain byte-compatible with the reference
so its published Match/EM/recall baselines validate this build.
"""

__version__ = "0.1.0"
