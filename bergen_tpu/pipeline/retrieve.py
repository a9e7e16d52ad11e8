"""Retrieve stage: corpus indexing + query-time search.

Model-agnostic driver mirroring the reference ``modules/retrieve.py``:
``index()`` encodes a corpus into embedding shards on disk (resumable at a
batch boundary via ``continue_batch`` — reference :126-128), ``retrieve()``
runs the search.  The engine differs by design (SURVEY.md §2.4 'corpus
sharding'): instead of streaming 150k-doc chunks host→GPU per query batch
(reference :147-185), the whole corpus is loaded **once** into TPU HBM,
partitioned over the mesh ``data`` axis, and every query batch is scored by
``ops.scoring.sharded_topk`` (Pallas GEMM + per-device top-k + ICI all-gather
merge).
"""

from __future__ import annotations

import glob
import os
import shutil
from typing import Dict

import numpy as np

import jax.numpy as jnp

from bergen_tpu import confy
from bergen_tpu.ops import scoring
from bergen_tpu.parallel import get_mesh

CHUNK_DOCS = 150_000  # shard granularity on disk (reference retrieve.py:111)

GUARD_MAX_Q = 64   # queries per fidelity probe (bounds the host GEMM cost)
GUARD_EVERY = 16   # re-check period in query batches (batch 0 always checked)


def _host_exact_topk(q: np.ndarray, d_emb: np.ndarray, k: int,
                     block: int = 1 << 18):
    """fp32 ground-truth top-k on the host (BLAS), independent of every
    device-side approximation — bin-argmax, approx_max_k, AND int8/bin
    quantization.  The recall guard's previous reference ran over the same
    quantized codes as the kernel under test, which made quantization error
    invisible (advisor r2); scoring the original fp32 embeddings here makes
    the measured overlap a true end-to-end fidelity number."""
    q = np.asarray(q, np.float32)
    k = min(k, d_emb.shape[0])
    run_v = np.full((q.shape[0], 0), -np.inf, np.float32)
    run_i = np.zeros((q.shape[0], 0), np.int64)
    for s in range(0, d_emb.shape[0], block):
        scores = q @ d_emb[s : s + block].astype(np.float32).T
        kk = min(k, scores.shape[1])
        part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        run_v = np.concatenate(
            [run_v, np.take_along_axis(scores, part, axis=1)], axis=1
        )
        run_i = np.concatenate([run_i, part + s], axis=1)
        if run_v.shape[1] > k:
            sel = np.argpartition(-run_v, k - 1, axis=1)[:, :k]
            run_v = np.take_along_axis(run_v, sel, axis=1)
            run_i = np.take_along_axis(run_i, sel, axis=1)
    order = np.argsort(-run_v, axis=1)
    return np.take_along_axis(run_v, order, axis=1), np.take_along_axis(
        run_i, order, axis=1
    )


def _topk_overlap(approx_idx: np.ndarray, exact_idx: np.ndarray, k: int) -> float:
    return float(np.mean([
        len(set(approx_idx[r]) & set(exact_idx[r])) / max(1, k)
        for r in range(approx_idx.shape[0])
    ]))


class Retrieve:
    def __init__(
        self,
        init_args=None,
        batch_size: int = 128,
        batch_size_sim: int = 1024,
        model=None,
        pyserini_num_threads: int = 1,
        continue_batch: int | None = None,
        scoring_dtype: str = "auto",
        topk_method: str = "auto",          # auto | exact | approx
        approx_recall_guard: float = 0.97,  # min measured top-k overlap
        sparse_method: str = "auto",        # auto | exact | sketch | slab
        sketch_d: int = 1024,
        sketch_candidates: int = 512,
        slab_d: int | None = None,          # None = HBM-budgeted auto width
        slab_head_frac: float = 0.8,
    ):
        self.model = model if model is not None else confy.instantiate(
            init_args, batch_size=batch_size
        )
        self.batch_size = batch_size
        self.batch_size_sim = batch_size_sim
        self.continue_batch = continue_batch
        # 'auto' = bf16 on TPU / f32 elsewhere; 'int8' = per-doc symmetric
        # quantized corpus (2x MXU rate + half the HBM traffic on v5e);
        # 'bf16' / 'f32' force. Dense path only — sparse/BM25 ignore it.
        if scoring_dtype not in ("auto", "int8", "bf16", "f32"):
            raise ValueError(f"unknown scoring_dtype {scoring_dtype!r}")
        self.scoring_dtype = scoring_dtype
        # topk_method 'fused' = Pallas fused GEMM+bin-argmax kernel
        # (ops/fused_topk.py — no [Q, N] score materialisation); 'auto'
        # selects it on TPU for large corpora, falling back to
        # approx_max_k / exact.  The recall guard below applies to both.
        if topk_method not in ("auto", "exact", "approx", "fused"):
            raise ValueError(f"unknown topk_method {topk_method!r}")
        self.topk_method = topk_method
        self.approx_recall_guard = approx_recall_guard
        # sparse (SPLADE) scoring engine: 'exact' = densify+GEMM
        # (ops/sparse.py, int8 when scoring_dtype=int8), 'sketch' =
        # count-sketch candidates + exact rescoring (ops/sparse_sketch.py),
        # 'slab' = wide frequency-partitioned int8 slab scored as dense
        # retrieval (ops/sparse_slab.py — the fast path); 'auto' picks slab
        # on TPU for large corpora, guarded.
        if sparse_method not in ("auto", "exact", "sketch", "slab"):
            raise ValueError(f"unknown sparse_method {sparse_method!r}")
        self.sparse_method = sparse_method
        self.sketch_d = sketch_d
        self.sketch_candidates = sketch_candidates
        self.slab_d = slab_d
        self.slab_head_frac = slab_head_frac

    # ------------------------------------------------------------------ #
    # indexing
    # ------------------------------------------------------------------ #

    def _sparse_docs(self, query_or_doc: str) -> bool:
        return query_or_doc == "doc" and getattr(self.model, "is_sparse", False)

    def index(self, dataset, query_or_doc: str, index_path: str) -> None:
        """Encode dataset['content'] into fp16 ``embedding_chunk_{i}.npy``
        shards (dense) or ``sparse_chunk_{i}.npz`` vals/idx shards (SPLADE
        docs) under index_path; skips when the index is already complete."""
        if self._index_complete(index_path, len(dataset)):
            return
        if os.path.exists(index_path) and self.continue_batch is None:
            shutil.rmtree(index_path)  # partial/corrupt index → rebuild
        os.makedirs(index_path, exist_ok=True)

        # queries encode the (possibly rewritten) generated_query column
        # (reference models/retrievers/dense.py:50-56)
        field = (
            "generated_query"
            if query_or_doc == "query" and "generated_query" in dataset.features
            else "content"
        )
        texts = dataset[field]
        n = len(texts)
        sparse = self._sparse_docs(query_or_doc)
        # chunks flush at a fixed batch-aligned row count so resume points are
        # deterministic; continue_batch snaps DOWN to the last complete chunk
        # boundary, re-encoding any rows that were buffered but never flushed
        # when the previous run died
        chunk_rows = max((CHUNK_DOCS // self.batch_size), 1) * self.batch_size
        start = (self.continue_batch or 0) * self.batch_size
        start = (start // chunk_rows) * chunk_rows
        buf, buf_rows, chunk_id = [], 0, start // chunk_rows
        for s in range(start, n, self.batch_size):
            batch_texts = texts[s : s + self.batch_size]
            if sparse:
                vals, idx = self.model.encode_sparse(batch_texts)
                buf.append((vals, idx))
                buf_rows += vals.shape[0]
            else:
                emb = self.model.encode(batch_texts, query_or_doc)
                buf.append(emb.astype(np.float16))
                buf_rows += emb.shape[0]
            if buf_rows >= chunk_rows or s + self.batch_size >= n:
                if sparse:
                    np.savez(
                        os.path.join(index_path, f"sparse_chunk_{chunk_id}.npz"),
                        vals=np.concatenate([b[0] for b in buf], axis=0),
                        idx=np.concatenate([b[1] for b in buf], axis=0),
                    )
                else:
                    np.save(
                        os.path.join(index_path, f"embedding_chunk_{chunk_id}.npy"),
                        np.concatenate(buf, axis=0),
                    )
                buf, buf_rows = [], 0
                chunk_id += 1

    @staticmethod
    def _shard_files(index_path: str) -> list[str]:
        files = glob.glob(os.path.join(index_path, "embedding_chunk_*.npy"))
        files += glob.glob(os.path.join(index_path, "sparse_chunk_*.npz"))
        return sorted(files, key=lambda p: int("".join(filter(str.isdigit, os.path.basename(p)))))

    def _index_complete(self, index_path: str, expected_rows: int) -> bool:
        files = self._shard_files(index_path)
        if not files:
            return False
        rows = 0
        for f in files:
            if f.endswith(".npz"):
                with np.load(f) as z:
                    rows += z["vals"].shape[0]
            else:
                rows += np.load(f, mmap_mode="r").shape[0]
        return rows == expected_rows

    def load_sparse_index(self, index_path: str, expected_rows: int | None = None):
        files = [f for f in self._shard_files(index_path) if f.endswith(".npz")]
        if not files:
            raise RuntimeError(f"No sparse embeddings found in {index_path}")
        vals_l, idx_l = [], []
        for f in files:
            with np.load(f) as z:
                vals_l.append(z["vals"])
                idx_l.append(z["idx"])
        vals = np.concatenate(vals_l, axis=0)
        idx = np.concatenate(idx_l, axis=0)
        if expected_rows is not None and vals.shape[0] != expected_rows:
            raise RuntimeError(
                f"Sparse index {index_path} incomplete: {vals.shape[0]} != "
                f"{expected_rows} docs — delete the folder and re-index."
            )
        return vals, idx

    def load_index(self, index_path: str, expected_rows: int | None = None) -> np.ndarray:
        files = self._shard_files(index_path)
        if not files:
            raise RuntimeError(f"No embeddings found in {index_path}")
        arr = np.concatenate([np.load(f) for f in files], axis=0).astype(np.float32)
        if expected_rows is not None and arr.shape[0] != expected_rows:
            raise RuntimeError(
                f"Index {index_path} incomplete: {arr.shape[0]} != {expected_rows} "
                "docs — delete the folder and re-index."
            )
        return arr

    # ------------------------------------------------------------------ #
    # search
    # ------------------------------------------------------------------ #

    def retrieve(
        self,
        dataset: Dict,
        query_index_path: str,
        doc_index_path: str,
        top_k: int,
        return_embeddings: bool = False,
    ) -> Dict:
        """Dense/sparse path: encode (or load) both sides, then mesh-sharded
        exact top-k. Returns {q_ids, doc_ids, scores [np.ndarray]}."""
        queries, docs = dataset["query"], dataset["doc"]

        # BM25-style models implement their own search over raw text
        if hasattr(self.model, "search"):
            index_file = os.path.join(doc_index_path, "bm25.idx")
            if not os.path.exists(index_file):
                self.model.build_index(list(docs["content"]), index_file)
            self.model.open_index(index_file)
            return self.model.search(queries, docs, top_k)

        self.index(queries, "query", query_index_path)
        self.index(docs, "doc", doc_index_path)
        q_emb = self.load_index(query_index_path, len(queries))

        mesh = get_mesh()
        on_tpu = __import__("jax").default_backend() == "tpu"
        dtype = jnp.bfloat16 if on_tpu else jnp.float32
        if self.scoring_dtype == "bf16":
            dtype = jnp.bfloat16
        elif self.scoring_dtype == "f32":
            dtype = jnp.float32
        int8_scoring = self.scoring_dtype == "int8"
        sparse = self._sparse_docs("doc")
        corpus_dtype = jnp.int8 if int8_scoring else dtype
        method = self.topk_method
        if sparse:
            from bergen_tpu.ops import sparse as sparse_ops

            d_vals, d_idx = self.load_sparse_index(doc_index_path, len(docs))
            vocab = q_emb.shape[1]
            # the bf16 fixed-width rows are always resident: the exact
            # scoring path, the sketch path's rescoring stage, and the
            # recall guard's reference all share them
            vals_dev, idx_dev, valid_n = sparse_ops.shard_sparse_corpus(
                mesh, d_vals, d_idx,
                dtype=jnp.bfloat16 if on_tpu else jnp.float32,
            )
            codes_dev = scales_dev = None
            if int8_scoring:
                codes, scales = sparse_ops.quantize_sparse_int8(d_vals)
                Np = vals_dev.shape[0]
                codes = np.pad(codes, ((0, Np - len(codes)), (0, 0)))
                scales = np.pad(scales, (0, Np - len(scales)))
                from jax.sharding import NamedSharding, PartitionSpec as P

                codes_dev = __import__("jax").device_put(
                    jnp.asarray(codes), NamedSharding(mesh, P("data", None))
                )
                scales_dev = __import__("jax").device_put(
                    jnp.asarray(scales, jnp.float32),
                    NamedSharding(mesh, P("data")),
                )
            use_slab = self.sparse_method == "slab" or (
                self.sparse_method == "auto" and on_tpu
                and len(docs) >= (1 << 17)
            )
            use_sketch = self.sparse_method == "sketch"
            sketch_index = slab_index = None
            if use_slab:
                from bergen_tpu.ops.sparse_slab import SlabIndex

                slab_index = SlabIndex(
                    mesh, d_vals, d_idx, vocab, d=self.slab_d,
                    head_frac=self.slab_head_frac,
                    cache_path=os.path.join(doc_index_path, "slab.npz"),
                )
            if use_sketch:
                from bergen_tpu.ops.sparse_sketch import SketchIndex

                sketch_index = SketchIndex(
                    mesh, d_vals, d_idx, vocab, d=self.sketch_d,
                    candidates=self.sketch_candidates,
                    cache_path=os.path.join(
                        doc_index_path, f"sketch_{self.sketch_d}.npy"
                    ),
                    vals_dev=vals_dev, idx_dev=idx_dev,
                )
        else:
            from bergen_tpu.ops import fused_topk

            d_emb = self.load_index(doc_index_path, len(docs))
            if method == "fused" and not fused_topk.supports(
                d_emb.shape[1], corpus_dtype
            ):
                # forcing fused with a geometry outside the kernel's VMEM
                # budget would die at Mosaic compile time — warn and let the
                # auto selection pick a path that fits (advisor r2)
                import logging

                logging.getLogger(__name__).warning(
                    "topk_method=fused forced but D=%d %s exceeds the fused "
                    "kernel's VMEM budget — falling back to auto",
                    d_emb.shape[1], np.dtype(corpus_dtype).name,
                )
                method = "auto"
            use_fused = method == "fused" or (
                method == "auto" and on_tpu and len(docs) >= (1 << 17)
                and fused_topk.supports(d_emb.shape[1], corpus_dtype)
            )
            exact_scales_dev = None
            if use_fused:
                method = "fused"
                if int8_scoring:
                    # per-bin scales feed the fused kernel's i32 epilogue;
                    # the per-doc expansion feeds the exact recall guard
                    corpus_dev, dscales_dev, exact_scales_dev, valid_n = (
                        fused_topk.shard_corpus_rows(mesh, d_emb, jnp.int8)
                    )
                else:
                    corpus_dev, valid_n = fused_topk.shard_corpus_rows(
                        mesh, d_emb, dtype=corpus_dtype
                    )
                    dscales_dev = None
            elif int8_scoring:
                corpus_dev, dscales_dev, valid_n = scoring.shard_corpus(
                    mesh, d_emb, dtype=jnp.int8
                )
            else:
                corpus_dev, valid_n = scoring.shard_corpus(
                    mesh, d_emb, dtype=dtype
                )
                dscales_dev = None

        k = min(top_k, valid_n)

        def score_batch(q_np, method):
            """One device-side scored batch under the current method."""
            if method == "fused":
                q = jnp.asarray(q_np, jnp.float32)
                # off-TPU the Mosaic kernel runs interpreted — only viable
                # for test-sized corpora ('auto' never selects fused off-TPU;
                # this keeps topk_method=fused drivable in CPU tests)
                return fused_topk.sharded_bin_topk(
                    mesh, q, corpus_dev, k, valid_n=valid_n,
                    doc_scales=dscales_dev, interpret=not on_tpu,
                )
            if method == "exact_rows":
                q = jnp.asarray(q_np, jnp.float32)
                return fused_topk.sharded_exact_topk_rows(
                    mesh, q, corpus_dev, k, valid_n=valid_n,
                    doc_scales=exact_scales_dev,
                )
            q = jnp.asarray(q_np, jnp.float32 if int8_scoring else dtype)
            return scoring.sharded_topk(
                mesh, q, corpus_dev, k, valid_n=valid_n,
                doc_scales=dscales_dev, method=method,
            )

        # The recall guard dual-runs a probe subset of periodic query batches
        # against a host fp32 exact reference (the ORIGINAL embeddings, so
        # bin-argmax loss AND quantization error are both measured — advisor
        # r2).  Engaged whenever the device path is approximate or quantized.
        fidelity: list[dict] = []
        guard_live = not sparse and (
            method == "fused" or int8_scoring
            or (on_tpu and method in ("auto", "approx"))
        )
        # Risk-adaptive probing: corpora just above the 131k auto-fused
        # threshold sit near the bin-collision fidelity cliff (the production
        # E2E evidence shows fused collapsing to 0.584 overlap on a small
        # corpus — the ladder caught it, but only a 64-query probe stood
        # between it and a silent quality loss).  Below 512k docs the probe
        # is also cheapest, so probe 4x as often with 2x the queries there.
        # Env overrides: BERGEN_TPU_GUARD_EVERY / BERGEN_TPU_GUARD_QUERIES.
        near_cliff = len(docs) < (1 << 19)
        guard_every = int(os.environ.get(
            "BERGEN_TPU_GUARD_EVERY",
            GUARD_EVERY // 4 if near_cliff else GUARD_EVERY))
        guard_max_q = int(os.environ.get(
            "BERGEN_TPU_GUARD_QUERIES",
            GUARD_MAX_Q * 2 if near_cliff else GUARD_MAX_Q))
        guard_every = max(1, guard_every)

        if sparse:
            smethod = ("slab" if use_slab else "sketch" if use_sketch
                       else "int8" if int8_scoring else "exact")
            sparse_guard = smethod != "exact"

            def score_sparse(q_np, sm):
                if sm == "slab":
                    return slab_index.search(q_np, k)
                if sm == "sketch":
                    return sketch_index.search(q_np, k)
                if sm == "int8":
                    return sparse_ops.sharded_sparse_topk(
                        mesh, jnp.asarray(q_np, jnp.float32), codes_dev,
                        idx_dev, k, vocab, valid_n=valid_n,
                        doc_scales=scales_dev,
                    )
                return sparse_ops.sharded_sparse_topk(
                    mesh, jnp.asarray(q_np, vals_dev.dtype), vals_dev,
                    idx_dev, k, vocab, valid_n=valid_n,
                )

        all_vals, all_idx = [], []
        for bi, s in enumerate(range(0, q_emb.shape[0], self.batch_size_sim)):
            q_np = q_emb[s : s + self.batch_size_sim]
            if sparse:
                vals, idxs = score_sparse(q_np, smethod)
                if sparse_guard and bi % guard_every == 0:
                    # reference = the exact densify path (full-precision
                    # values); catches sketch recall loss and int8
                    # quantization error alike
                    nq = min(guard_max_q, q_np.shape[0])
                    _, ref_idx = score_sparse(q_np[:nq], "exact")
                    ref_idx = np.asarray(ref_idx)
                    overlap = _topk_overlap(np.asarray(idxs)[:nq], ref_idx, k)
                    fidelity.append(
                        {"batch": bi, "method": smethod, "overlap": overlap}
                    )
                    if overlap < self.approx_recall_guard:
                        import logging

                        fb = ("int8" if smethod in ("slab", "sketch")
                              and int8_scoring else "exact")
                        logging.getLogger(__name__).warning(
                            "sparse %s top-k overlap %.4f < guard %.2f — "
                            "falling back to %s", smethod, overlap,
                            self.approx_recall_guard, fb,
                        )
                        fell_from = smethod
                        smethod = fb
                        vals, idxs = score_sparse(q_np, smethod)
                        if smethod != "exact":
                            overlap = _topk_overlap(
                                np.asarray(idxs)[:nq], ref_idx, k
                            )
                            fidelity.append({
                                "batch": bi, "method": smethod,
                                "overlap": overlap,
                            })
                            if overlap < self.approx_recall_guard:
                                fell_from = smethod
                                smethod = "exact"
                                vals, idxs = score_sparse(q_np, smethod)
                        if smethod == "exact":
                            # record the TERMINAL rung too: exact IS the
                            # reference (overlap 1.0 by construction), but
                            # without this row the artifact reads as if the
                            # failing approximate rung was what shipped
                            # (round-4 run C showed only {slab, 0.62})
                            fidelity.append({
                                "batch": bi, "method": "exact",
                                "overlap": 1.0, "fallback_from": fell_from,
                            })
                        sparse_guard = smethod != "exact"
            else:
                vals, idxs = score_batch(q_np, method)
                if guard_live and bi % guard_every == 0:
                    nq = min(guard_max_q, q_np.shape[0])
                    _, ref_idx = _host_exact_topk(q_np[:nq], d_emb, k)
                    overlap = _topk_overlap(np.asarray(idxs)[:nq], ref_idx, k)
                    fidelity.append(
                        {"batch": bi, "method": method, "overlap": overlap}
                    )
                    if overlap < self.approx_recall_guard:
                        import logging

                        log = logging.getLogger(__name__)
                        if method not in ("exact", "exact_rows"):
                            # rung 1: exact top-k over the same (possibly
                            # quantized) codes — recovers bin-argmax/approx
                            # loss
                            fb = "exact_rows" if method == "fused" else "exact"
                            log.warning(
                                "%s top-k vs fp32 host overlap %.4f < guard "
                                "%.2f — retrying with %s", method, overlap,
                                self.approx_recall_guard, fb,
                            )
                            method = fb
                            vals, idxs = score_batch(q_np, method)
                            overlap = _topk_overlap(
                                np.asarray(idxs)[:nq], ref_idx, k
                            )
                            fidelity.append({
                                "batch": bi, "method": method,
                                "overlap": overlap,
                            })
                        if overlap < self.approx_recall_guard and int8_scoring:
                            # ladder rung 2: quantization itself is at fault
                            # (e.g. dot-product retriever with wildly
                            # non-uniform row norms) — re-shard unquantized
                            log.warning(
                                "exact int8 overlap %.4f still < guard — "
                                "re-sharding corpus unquantized (%s exact)",
                                overlap, np.dtype(dtype).name,
                            )
                            int8_scoring = False
                            corpus_dev, valid_n = scoring.shard_corpus(
                                mesh, d_emb, dtype=dtype
                            )
                            dscales_dev = None
                            method = "exact"
                            vals, idxs = score_batch(q_np, method)
                            overlap = _topk_overlap(
                                np.asarray(idxs)[:nq], ref_idx, k
                            )
                            fidelity.append({
                                "batch": bi, "method": "exact_" +
                                np.dtype(dtype).name, "overlap": overlap,
                            })
                        guard_live = method not in ("exact", "exact_rows") \
                            or int8_scoring
            all_vals.append(np.asarray(vals))
            all_idx.append(np.asarray(idxs))
        vals = np.concatenate(all_vals, axis=0)
        idxs = np.concatenate(all_idx, axis=0)

        doc_id_col = list(docs["id"])
        out = {
            "q_id": list(queries["id"]),
            "doc_id": [[doc_id_col[j] for j in row] for row in idxs],
            "score": vals,
        }
        enc_fid = getattr(self.model, "w8a8_fidelity", None)
        if enc_fid is not None:
            # w8a8 corpus-ENCODING guard (dense.py dual-encode): a different
            # error source than the scoring guards below — record alongside
            fidelity.insert(0, enc_fid)
        if fidelity:
            out["fidelity"] = fidelity
        if return_embeddings:
            out["q_embs"] = q_emb
            out["doc_embs"] = (d_vals, d_idx) if sparse else d_emb
        return out

    def get_clean_model_name(self) -> str:
        return self.model.get_clean_model_name()
