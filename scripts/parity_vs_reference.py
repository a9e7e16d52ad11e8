"""Engine-parity measurement: reference (torch) vs this rebuild, same inputs.

No network egress exists in this environment, so published-number reproduction
(BASELINE.md quality rows) is not directly possible — no real checkpoints or
HF datasets can be downloaded.  This script produces the strongest parity
evidence available instead: it drives the REFERENCE's own retrieval engine
(``/root/reference/models/retrievers/dense.py`` Dense + the scoring semantics
of ``modules/retrieve.py:147-185``) and this rebuild's engine on the SAME
locally-built HF checkpoint and the SAME ut1 fixture corpus (the reference's
own test corpus, ``tests/utdata``), then compares the rankings end to end.

Usage:  python scripts/parity_vs_reference.py [--reference /root/reference]

Outputs a JSON summary (top-50 overlap, rank-1 agreement, score MAE) and is
recorded in documentation/parity.md.
"""

import argparse
import csv
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# run the rebuild on the CPU mesh (the axon TPU plugin ignores JAX_PLATFORMS,
# so force it via config — same technique as tests/conftest.py)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

TOP_K = 50


def load_ut1():
    base = os.path.join(REPO, "tests", "utdata")
    docs, queries = [], []
    with open(os.path.join(base, "ut1_docs.tsv")) as f:
        for row in csv.reader(f, delimiter="\t"):
            if len(row) >= 2:
                docs.append(row[1])
    with open(os.path.join(base, "ut1_queries.tsv")) as f:
        for row in csv.reader(f, delimiter="\t"):
            if len(row) >= 2:
                queries.append(row[1])
    return queries, docs


def reference_rankings(ref_root: str, ckpt: str, queries, docs):
    """Run the reference's Dense retriever + its per-chunk mm/topk scoring
    loop (modules/retrieve.py:147-185 semantics, single chunk) on CPU."""
    import torch

    sys.path.insert(0, ref_root)
    from models.retrievers.dense import Dense, DotProduct, MeanPooler

    model = Dense(
        model_name=ckpt, max_len=128, pooler=MeanPooler(),
        similarity=DotProduct(),
    )

    def encode(texts, query_or_doc):
        out = []
        for s in range(0, len(texts), 64):
            batch = [
                {"content": t, "generated_query": t}
                for t in texts[s : s + 64]
            ]
            kwargs = model.collate_fn(batch, query_or_doc=query_or_doc)
            with torch.no_grad():
                emb = model("doc" if query_or_doc == "doc" else "query",
                            kwargs)["embedding"]
            out.append(emb.float())
        return torch.cat(out)

    q_emb = encode(queries, "query")
    d_emb = encode(docs, "doc")
    scores = model.similarity_fn(q_emb, d_emb)          # torch.mm
    vals, idxs = torch.topk(scores, TOP_K, dim=1)       # retrieve.py:157
    return vals.numpy(), idxs.numpy()


def torch_fp32_control(ckpt: str, queries, docs):
    """Same model, plain transformers in fp32 with identical pooling/scoring.
    The reference-vs-this gap isolates the reference's OWN fp16 noise floor:
    the rebuild only needs to agree with the reference as well as the
    reference agrees with a higher-precision run of itself."""
    import torch
    from transformers import AutoModel, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(ckpt)
    model = AutoModel.from_pretrained(ckpt, dtype=torch.float32).eval()

    def encode(texts):
        out = []
        for s in range(0, len(texts), 64):
            enc = tok(texts[s : s + 64], padding="longest", truncation=True,
                      max_length=128, return_tensors="pt")
            with torch.no_grad():
                h = model(**enc)[0]
            m = enc["attention_mask"]
            h = h.masked_fill(~m[..., None].bool(), 0.0)
            out.append(h.sum(dim=1) / m.sum(dim=1)[..., None])
        return torch.cat(out)

    scores = encode(queries) @ encode(docs).T
    vals, idxs = torch.topk(scores, TOP_K, dim=1)
    return vals.numpy(), idxs.numpy()


def rebuild_rankings(ckpt: str, queries, docs):
    """Run this rebuild's JAX engine: DenseRetriever encode + exact
    topk_blocked scoring (the pipeline's dense path)."""
    import jax.numpy as jnp

    from bergen_tpu.models.retrievers.dense import DenseRetriever
    from bergen_tpu.ops import scoring
    from bergen_tpu.parallel import get_mesh

    model = DenseRetriever(model_name=ckpt, max_len=128, pooler="mean",
                           similarity="dot")
    q_emb = model.encode(queries, "query")
    d_emb = model.encode(docs, "doc")
    mesh = get_mesh()
    corpus, valid_n = scoring.shard_corpus(mesh, d_emb, dtype=jnp.float32)
    vals, idxs = scoring.sharded_topk(
        mesh, jnp.asarray(q_emb), corpus, TOP_K, valid_n=valid_n,
        method="exact",
    )
    return np.asarray(vals), np.asarray(idxs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=None, help="write JSON summary here")
    args = ap.parse_args()
    if not os.path.isdir(args.reference):
        sys.exit(f"reference checkout not found at {args.reference}")

    from tiny_models import build_tiny_bert

    queries, docs = load_ut1()
    with tempfile.TemporaryDirectory() as td:
        ckpt = build_tiny_bert(
            os.path.join(td, "bert"), hidden=128, layers=4, seed=7,
        )
        ref_v, ref_i = reference_rankings(args.reference, ckpt, queries, docs)
        ctl_v, ctl_i = torch_fp32_control(ckpt, queries, docs)
        new_v, new_i = rebuild_rankings(ckpt, queries, docs)

    k = min(TOP_K, ref_i.shape[1], new_i.shape[1])

    def agreement(a_i, b_i):
        ov = [len(set(a_i[r, :k]) & set(b_i[r, :k])) / k
              for r in range(a_i.shape[0])]
        return ov, float(np.mean(a_i[:, 0] == b_i[:, 0]))

    overlaps, rank1 = agreement(ref_i, new_i)
    ctl_overlaps, ctl_rank1 = agreement(ref_i, ctl_i)
    # positional top-k score MAE: rank-r score under each engine's OWN
    # ranking. When rankings differ this mixes different documents' scores —
    # it bounds (not equals) the per-document score error, which the
    # overlap/rank1 rows already characterise.
    mae = float(np.mean(np.abs(ref_v[:, :k] - new_v[:, :k])))
    rel = mae / float(np.mean(np.abs(ref_v[:, :k])) + 1e-12)
    summary = {
        "n_queries": len(queries),
        "n_docs": len(docs),
        "top_k": k,
        "mean_topk_overlap": round(float(np.mean(overlaps)), 4),
        "min_topk_overlap": round(float(np.min(overlaps)), 4),
        "rank1_agreement": round(rank1, 4),
        "fp16_noise_floor_topk_overlap": round(float(np.mean(ctl_overlaps)), 4),
        "fp16_noise_floor_rank1": round(ctl_rank1, 4),
        "topk_score_mae": round(mae, 6),
        "topk_score_rel_err": round(rel, 6),
        "reference_dtype": "fp16 (reference hardcodes torch_dtype=float16)",
        "rebuild_dtype": "f32 on CPU / bf16 on TPU",
    }
    print(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
