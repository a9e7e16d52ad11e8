"""Silver labeling for Provence training (reference
``scripts/provence/gen_silver_labeling_provence.py``): an instruction LLM
answers each (query, context) with bracketed sentence citations ``[i]``; cited
sentences become positive compression labels. One json file per example in
``--outdir``, consumed by ``train_provence.py``.  Requires a local/downloaded
LLM checkpoint.

Usage:
  python scripts/provence/gen_silver_labeling.py --outdir labels/ \
      --queries datasets/ms-marco-docs-v1-queries-dev_full \
      --datastore datasets/ms-marco-docs-v1-chunked-v1_full \
      --trec runs/run.rerank....trec
"""

import argparse
import json
import os
import re
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

PROMPTS = {
    "answer": (
        "Question: %s\n\nContext:\n%s\n\nAnswer the Question, using ONLY "
        "information provided in the Context. If no useful information is "
        "provided, you MUST output “No answer”. If some parts of the Context "
        "are used to answer, you MUST cite ALL the corresponding sentences. "
        "Use the symbols [ ] to indicate when a fact comes from a sentence in "
        "the context, e.g [0] for a fact from sentence 0. You should only "
        "answer the given question and should not provide any additional "
        "information. "
    ),
    "relevant": (
        "Question: %s\n\nContext:\n%s\n\nSummarize which information, "
        "generally relevant to the given Question, the given Context "
        "provides. If no useful information is provided, you MUST output "
        "“No answer”. If some parts of the Context are relevant (fully or "
        "partially), you MUST summarize it and you MUST cite ALL the "
        "corresponding sentences. Use the symbols [ ] to indicate when a "
        "fact comes from a sentence in the context, e.g [0] for a fact from "
        "sentence 0. "
    ),
    "straightforward": (
        "Question: %s\n\nContext:\n%s\n\nOutput the indexes of the sentences "
        "which contain an answer to the given Question. Use the symbols [ ] "
        "to select sentences, e.g. [0, 5] for selecting sentences 0 and 5. "
        "If no useful information is provided, you MUST output “No answer”. "
    ),
}


def sent_split(text: str):
    """nltk-free sentence split (same splitter the RECOMP/Provence
    context processors use)."""
    from bergen_tpu.models.context_processors.recomp import _sent_tokenize

    return _sent_tokenize(text)


def parse_citations(response: str, n_sents: int):
    if "No answer" in response:
        return []
    matches = re.findall(r"\[([\d, ]+)\]", response)
    try:
        idxs = {int(n) for m in matches for n in m.split(",") if n.strip()}
    except ValueError:
        return None
    if not idxs:
        return None  # no "No answer" and no citations → discard (ref :138)
    return [i for i in range(n_sents) if i in idxs]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="meta-llama/Meta-Llama-3-8B-Instruct")
    parser.add_argument("--queries", required=True,
                        help="bergen-saved query dataset folder")
    parser.add_argument("--datastore", required=True,
                        help="bergen-saved doc dataset folder")
    parser.add_argument("--trec", required=True,
                        help="reranking trec run over queries×datastore")
    parser.add_argument("--top_k", type=int, default=5)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--prompt", choices=list(PROMPTS), default="answer")
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--max_new_tokens", type=int, default=256)
    parser.add_argument("--skip", type=int, default=1)
    args = parser.parse_args()

    if os.path.exists(args.outdir) and os.listdir(args.outdir) and not args.overwrite:
        raise SystemExit(f"{args.outdir} exists — pass --overwrite to replace")
    os.makedirs(args.outdir, exist_ok=True)

    import datasets
    import pickle

    from bergen_tpu.models.generators.jax_llm import LLM
    from bergen_tpu.utils import load_trec, prepare_dataset_from_ids

    def load_saved(path):
        ds = datasets.load_from_disk(path)
        ds.id2index = pickle.load(open(os.path.join(path, "id2index.p"), "rb"))
        return ds

    processed = {"query": load_saved(args.queries),
                 "doc": load_saved(args.datastore)}
    q_ids, d_ids, _ = load_trec(args.trec)
    flat_q = [q for q, docs in zip(q_ids, d_ids) for _ in docs[: args.top_k]]
    flat_d = [[d] for _, docs in zip(q_ids, d_ids) for d in docs[: args.top_k]]
    gen_dataset = prepare_dataset_from_ids(processed, flat_q, flat_d,
                                           multi_doc=False)

    llm = LLM(args.model, batch_size=args.batch_size,
              max_new_tokens=args.max_new_tokens, max_length=2048)
    template = PROMPTS[args.prompt]

    rows = list(zip(gen_dataset["query"], gen_dataset["doc"],
                    gen_dataset["q_id"], gen_dataset["d_id"]))[:: args.skip]
    for start in range(0, len(rows), args.batch_size):
        chunk = rows[start : start + args.batch_size]
        prompts, sents_all = [], []
        for q, cntx, _, _ in chunk:
            cntx = cntx[0] if isinstance(cntx, list) else cntx
            if cntx.startswith("."):
                cntx = cntx[1:].strip()
            sents = sent_split(cntx)
            sents_all.append(sents)
            numbered = " ".join(f"[{i}] {s}" for i, s in enumerate(sents))
            prompt = template % (q, numbered)
            if llm.tokenizer.chat_template is not None:
                prompt = llm.tokenizer.apply_chat_template(
                    [{"role": "user", "content": prompt}],
                    tokenize=False, add_generation_prompt=True,
                )
            prompts.append(prompt)
        responses = llm.generate(prompts)
        for (q, _, qid, did), sents, response in zip(chunk, sents_all, responses):
            selected = parse_citations(response, len(sents))
            if selected is None:
                continue
            with open(os.path.join(args.outdir, f"{qid}_{did}.json"), "w") as f:
                json.dump({"query": q, "context": sents,
                           "selected_sents": selected,
                           "response": response}, f)
    print(f"labels written to {args.outdir}")


if __name__ == "__main__":
    main()
