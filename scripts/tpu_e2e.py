"""On-chip end-to-end pipeline evidence run.

Drives config -> retrieve -> rerank -> generate -> metrics through
``bergen.main`` on the REAL TPU chip with tiny locally-built checkpoints —
the reference's own test strategy
(``/root/reference/tests/zeroshot_test.py:99-105``: tiny real models through
the full pipeline on the accelerator) — then the same configs on the virtual
8-device CPU mesh, and reports artifact parity between the two backends.

Two runs per backend:

* **Run A (parity)** — f32 encoders/generator, default exact-ish scoring.
  Ranking doc-id columns and generated responses should match the CPU mesh
  exactly (same f32 math modulo XLA reduction order; the summary reports
  any drift).
* **Run B (production paths)** — ``scoring_dtype=int8`` +
  ``topk_method=fused`` with the recall guard live, serve-mode w8a8
  generation: the shipped TPU fast paths against real pipeline artifacts.
  The fidelity artifact documents what the guard measured on-chip.

Usage::

    python scripts/tpu_e2e.py --backend tpu --out /tmp/tpu_e2e/tpu
    python scripts/tpu_e2e.py --backend cpu --out /tmp/tpu_e2e/cpu
    python scripts/tpu_e2e.py --compare /tmp/tpu_e2e/tpu /tmp/tpu_e2e/cpu \
        --out /tmp/tpu_e2e/parity.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _force_backend(backend: str) -> None:
    if backend == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

        assert jax.default_backend() == "tpu", (
            f"expected a TPU backend, got {jax.default_backend()}"
        )


def _build_models(models_dir: str) -> dict:
    """Deterministic tiny checkpoints (fixed torch seeds) shared by both
    backend invocations so parity compares math, not weights."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from tiny_models import build_tiny_bert, build_tiny_llama

    return {
        "bert": build_tiny_bert(os.path.join(models_dir, "bert"), seed=0),
        "ce": build_tiny_bert(os.path.join(models_dir, "ce"), num_labels=1,
                              seed=3),
        "llama": build_tiny_llama(os.path.join(models_dir, "llama"), seed=0),
        "mlm": build_tiny_bert(os.path.join(models_dir, "mlm"),
                               with_mlm=True, seed=5),
    }


def _compose(work: str, models: dict, extra: list[str]):
    from bergen_tpu import confy

    base = [
        "dataset=ut1",
        f"dataset_folder={work}/datasets/",
        f"index_folder={work}/indexes/",
        f"runs_folder={work}/runs/",
        f"experiments_folder={work}/experiments/",
        f"generated_query_folder={work}/generated_queries/",
        f"processed_context_folder={work}/processed_contexts/",
        f"qrels_folder={REPO}/tests/utdata",
        "retriever=contriever",
        f"retriever.init_args.model_name={models['bert']}",
        "retriever.init_args.max_len=64",
        "retriever.batch_size=64",
        "reranker=minilm6",
        f"reranker.init_args.model_name={models['ce']}",
        "reranker.init_args.max_len=64",
        "reranker.batch_size=64",
        "generator=tinyllama-chat",
        f"generator.init_args.model_name={models['llama']}",
        "generator.init_args.max_new_tokens=16",
        "generator.init_args.batch_size=16",
        "generator.init_args.max_length=256",
        "retrieve_top_k=10",
        "rerank_top_k=10",
        "generation_top_k=5",
    ]
    # a run that swaps a whole config group (e.g. f_bm25's retriever=bm25)
    # invalidates the base list's dotted overrides into that group — confy
    # applies group choices first, so `retriever.init_args.max_len` would
    # crash against a retriever config that has no such key
    swapped = {e.split("=", 1)[0] for e in extra
               if "=" in e and "." not in e.split("=", 1)[0]}
    base = [b for b in base
            if b.split("=", 1)[0].split(".")[0].lstrip("+") not in swapped
            or "." not in b.split("=", 1)[0]]
    return confy.compose(os.path.join(REPO, "config"), "rag", base + extra)


RUNS = {
    # f32 end to end: exact cross-backend parity is the expectation
    "a_parity_f32": [
        "+retriever.init_args.dtype=f32",
        "+reranker.init_args.dtype=f32",
        "+generator.init_args.dtype=f32",
        "retriever.scoring_dtype=f32",
    ],
    # the shipped TPU fast paths: int8 fused scoring + recall guard,
    # serve-mode (continuous batching) w8a8 generation
    "b_production": [
        "retriever.scoring_dtype=int8",
        "+retriever.topk_method=fused",
        "+generator.init_args.serve=true",
        "+generator.init_args.quantization=w8a8",
    ],
    # vLLM-style paged-KV serving: page-pool cache + block-table attention
    # (ops/paged_attention.py) behind the continuous-batching server
    "d_paged_serving": [
        "+generator.init_args.serve=true",
        "+generator.init_args.kv_cache=paged",
    ],
    # true 4-bit weight-only generation (hand-packed nibble storage — the
    # portable int4 representation; convert.quantize_tree_int4(packed=True))
    # through the full pipeline
    "e_int4_generation": [
        "+generator.init_args.quantization=int4",
    ],
    # sparse retrieval through the wide-slab engine (stage-1 int8 slab GEMM
    # + stage-2 exact host rescore), recall guard live — the round-3 SPLADE
    # fast path against real pipeline artifacts
    "c_splade_slab": [
        "retriever=spladev3",
        "retriever.init_args.model_name={mlm}",
        "retriever.init_args.max_len=64",
        "retriever.init_args.nnz=32",
        "retriever.batch_size=64",
        "+retriever.sparse_method=slab",
    ],
    # lexical retrieval through the C++ inverted index (native/bm25) —
    # the reference drives bm25 through its full pipeline tests
    # (/root/reference/tests/zeroshot_test.py:91-98)
    "f_bm25": [
        "retriever=bm25",
    ],
}


def run_backend(backend: str, out_dir: str, models_dir: str,
                only: list | None = None) -> None:
    _force_backend(backend)
    import jax

    import bergen

    models = _build_models(models_dir)
    os.makedirs(out_dir, exist_ok=True)
    summary = {
        "backend": backend,
        "jax_backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "runs": {},
    }
    # incremental evidence capture: merge into an existing summary so a
    # --only invocation extends the evidence dir instead of erasing the
    # previously captured runs
    prev = os.path.join(out_dir, "summary.json")
    if os.path.exists(prev):
        with open(prev) as f:
            summary["runs"] = json.load(f).get("runs", {})
    for name, extra in RUNS.items():
        if only and name not in only:
            continue
        work = os.path.join(out_dir, "work_" + name)
        shutil.rmtree(work, ignore_errors=True)
        extra = [e.format(**models) for e in extra]
        cfg = _compose(work, models, extra)
        t0 = time.time()
        if name.startswith("a_parity"):
            # TPU f32 matmuls default to bf16 passes; force true f32 so the
            # parity run compares math, not precision policy
            with jax.default_matmul_precision("highest"):
                bergen.main(cfg)
        else:
            bergen.main(cfg)
        wall = time.time() - t0
        exps = [d for d in os.listdir(os.path.join(work, "experiments"))
                if not d.startswith("tmp_")]
        assert len(exps) == 1, exps
        exp = os.path.join(work, "experiments", exps[0])
        keep = os.path.join(out_dir, name)
        shutil.rmtree(keep, ignore_errors=True)
        shutil.copytree(exp, keep)
        rec = {"wall_s": round(wall, 1), "experiment": exps[0]}
        for f in ("eval_dev_metrics.json", "eval_dev_ranking_metrics.json",
                  "eval_dev_reranking_metrics.json",
                  "eval_dev_retrieval_fidelity.json"):
            p = os.path.join(exp, f)
            if os.path.exists(p):
                rec[f.replace("eval_dev_", "").replace(".json", "")] = (
                    json.load(open(p))
                )
        summary["runs"][name] = rec
        shutil.rmtree(work, ignore_errors=True)
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


# --------------------------------------------------------------------------- #
# parity comparison between two backend evidence dirs
# --------------------------------------------------------------------------- #


def _trec_rows(path: str):
    """(qid, docid, rank) triples — scores compared separately w/ tolerance."""
    rows, scores = [], []
    with open(path) as f:
        for line in f:
            p = line.split()
            rows.append((p[0], p[2], p[3]))
            scores.append(float(p[4]))
    return rows, scores


def compare(dir_a: str, dir_b: str, out_path: str) -> dict:
    report = {"a": dir_a, "b": dir_b, "runs": {}}
    for name in RUNS:
        ra, rb = os.path.join(dir_a, name), os.path.join(dir_b, name)
        if not (os.path.isdir(ra) and os.path.isdir(rb)):
            # run absent from one evidence dir (older capture / crashed run):
            # record it so the parity report can't silently omit a run
            report["runs"][name] = {
                "skipped": f"missing in {'a' if not os.path.isdir(ra) else 'b'}"
            }
            continue
        rec = {}
        trecs = sorted(
            f for f in os.listdir(ra)
            if f.endswith(".trec") and os.path.exists(os.path.join(rb, f))
        )
        for t in trecs:
            rows_a, sc_a = _trec_rows(os.path.join(ra, t))
            rows_b, sc_b = _trec_rows(os.path.join(rb, t))
            same = rows_a == rows_b
            n_diff = sum(x != y for x, y in zip(rows_a, rows_b)) + abs(
                len(rows_a) - len(rows_b)
            )
            max_ds = max(
                (abs(x - y) for x, y in zip(sc_a, sc_b)), default=0.0
            ) if len(sc_a) == len(sc_b) else float("inf")
            rec[t] = {"docid_rank_match": same,
                      "rows_differ": f"{n_diff}/{len(rows_a)}",
                      "max_score_delta": round(max_ds, 6)}
        for f in ("eval_dev_out.json",):
            oa = json.load(open(os.path.join(ra, f)))
            ob = json.load(open(os.path.join(rb, f)))
            resp_match = sum(
                x["response"] == y["response"] for x, y in zip(oa, ob)
            )
            rec["responses_equal"] = f"{resp_match}/{len(oa)}"
        ma = json.load(open(os.path.join(ra, "eval_dev_metrics.json")))
        mb = json.load(open(os.path.join(rb, "eval_dev_metrics.json")))
        rec["metrics_equal"] = {
            k: (round(ma[k], 4) == round(mb.get(k, float("nan")), 4))
            for k in ma
        }
        report["runs"][name] = rec
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", choices=["tpu", "cpu"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--models-dir", default="/tmp/tpu_e2e_models")
    ap.add_argument("--compare", nargs=2, metavar=("TPU_DIR", "CPU_DIR"))
    ap.add_argument("--runs", default=None,
                    help="comma-separated subset of RUNS to execute")
    args = ap.parse_args()
    sys.path.insert(0, REPO)
    if args.compare:
        compare(args.compare[0], args.compare[1], args.out)
    else:
        assert args.backend, "--backend required unless --compare"
        run_backend(args.backend, args.out, args.models_dir,
                    only=args.runs.split(",") if args.runs else None)
