"""BM25 throughput: native/bm25 vs the pyserini/Lucene path it replaces.

The reference retrieves with LuceneSearcher.batch_search(threads=N)
(/root/reference/models/retrievers/bm25.py:28-31) after indexing through a
`pyserini.index.lucene` subprocess.  This benches the C++ replacement on a
synthetic corpus shaped like KILT-100w passages (≈60 words/doc, Zipfian
vocabulary) at 1M docs, 512-query batches of 5-word queries, top-100.

Baseline model (BASELINE.md "BM25 baseline"): Anserini/Lucene BM25 on
MS MARCO passage v1 (8.8M docs, k=1000) runs ~10-20 ms/query/thread on
server CPUs (Anserini regression docs); postings work scales ~linearly with
corpus size and weakly with k, so at 1M docs / k=100 a Lucene thread models
to ~600 QPS.  This box has ONE core, so the honest comparison is
QPS-per-core vs QPS-per-Lucene-thread; the C++ searcher is threaded
(bm25_batch_search) for multi-core deployments.

Usage: python scripts/bench_bm25.py [--docs 1000000] [--queries 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LUCENE_QPS_PER_THREAD = 600.0   # modeled; derivation in the docstring
# Anserini indexes MS MARCO passage (8.8M docs) in ~15-30 min on ~9 threads
# (Anserini regression docs) -> ~600-1800 docs/s/thread; model the generous
# end per thread:
LUCENE_INDEX_DOCS_PER_SEC = 1_500.0

T0 = time.time()


def _log(m):
    print(f"[{time.time()-T0:7.1f}s] {m}", file=sys.stderr, flush=True)


def synth_corpus(n_docs: int, words_per_doc: int = 60, vocab: int = 200_000,
                 seed: int = 0):
    """Zipf-distributed word ids -> text.  Generated in chunks to bound RAM."""
    rng = np.random.default_rng(seed)
    # Zipf via inverse-CDF on ranks (s=1.07, truncated at `vocab`)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = 1.0 / ranks ** 1.07
    probs /= probs.sum()
    cdf = np.cumsum(probs)
    for start in range(0, n_docs, 50_000):
        m = min(50_000, n_docs - start)
        u = rng.random((m, words_per_doc))
        ids = np.searchsorted(cdf, u)
        yield ["w" + " w".join(map(str, row)) for row in ids]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=512)
    ap.add_argument("--qwords", type=int, default=5)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 1)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from bergen_tpu.models.retrievers.bm25 import BM25, _load_lib

    lib = _load_lib()
    bm = BM25(threads=args.threads)

    _log(f"indexing {args.docs} docs")
    h = lib.bm25_create(0.9, 0.4)
    t0 = time.perf_counter()
    i = 0
    for chunk in synth_corpus(args.docs):
        for text in chunk:
            lib.bm25_add_doc(h, i, text.encode())
            i += 1
        if i % 200_000 == 0:
            _log(f"  {i} docs")
    lib.bm25_finalize(h)
    t_index = time.perf_counter() - t0
    docs_per_sec = args.docs / t_index
    _log(f"indexed in {t_index:.1f}s ({docs_per_sec:.0f} docs/s)")

    bm._handle = h
    rng = np.random.default_rng(1)
    # queries drawn from the same Zipf head (realistic term overlap)
    queries = [
        "w" + " w".join(map(str, rng.integers(0, 5_000, args.qwords)))
        for _ in range(args.queries)
    ]
    # warm (page in postings)
    bm.batch_search(queries[:32], args.k, threads=1)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        docs, scores = bm.batch_search(queries, args.k, threads=args.threads)
    dt = (time.perf_counter() - t0) / reps
    qps = args.queries / dt
    n_hit = int((docs[:, 0] >= 0).sum())
    _log(f"search: {qps:.0f} QPS ({args.threads} threads), "
         f"{n_hit}/{args.queries} queries matched")

    rows = [
        {"metric": f"bm25_index_docs_per_sec_{args.docs//1000}k",
         "value": round(docs_per_sec, 1), "unit": "docs/sec/core",
         "vs_baseline": round(docs_per_sec / LUCENE_INDEX_DOCS_PER_SEC, 3)},
        {"metric": f"bm25_search_qps_{args.docs//1000}kdocs_top{args.k}",
         "value": round(qps, 1), "unit": f"queries/sec ({args.threads} thr)",
         "vs_baseline": round(
             qps / (LUCENE_QPS_PER_THREAD * args.threads), 3)},
    ]
    for r in rows:
        print(json.dumps(r), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
