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

import os as _os

if _os.environ.get("JAX_PLATFORMS", "axon") != "axon":
    # The axon TPU plugin clobbers the standard JAX_PLATFORMS env var at
    # registration (its site hook imports jax and forces the axon platform
    # before any user code runs); re-assert the env var here so CLI
    # subprocesses forced onto CPU (tests, tooling) never try to initialise
    # the TPU tunnel — with the tunnel unreachable that init hangs in a
    # silent retry loop rather than erroring.  Only non-axon values are
    # re-asserted: this hook must never switch a process TOWARD the tunnel
    # (a login shell exporting JAX_PLATFORMS=axon would otherwise override
    # an in-process jax.config choice like tests/conftest.py's cpu forcing).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
