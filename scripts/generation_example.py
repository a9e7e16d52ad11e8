"""Minimal standalone example (reference ``scripts/generation_example.py``):
score a candidate answer against a reference answer with an LLM's first-token
logits — the same mechanism the LLM judge uses (``models/evaluators/llm.py``),
as one jitted prefill on TPU instead of a ``generate`` call.

Usage: python scripts/generation_example.py [model_name_or_path]
"""

import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax.nn  # noqa: E402
import numpy as np  # noqa: E402

from bergen_tpu.models.generators.jax_llm import LLM  # noqa: E402


def format_instruction(sample: dict) -> str:
    return (
        "Is the candidate answer semantically or lexically equivalent to the "
        "reference answer regarding the question? The candidate should contain "
        "at least the same (or more) relevant information as the reference but "
        "should not omit any relevant information present in the reference. "
        "Output {equivalent} or {not equivalent}.\n"
        f"    Question: {sample['question']}\n"
        f"    Reference: {sample['reference']}\n"
        f"    Candidate: {sample['candidate']}\n"
        "    Output: {"
    )


def main(model_name: str = "TinyLlama/TinyLlama-1.1B-Chat-v1.0") -> None:
    llm = LLM(model_name, batch_size=1, max_new_tokens=1, max_length=512)
    tok = llm.tokenizer
    # first token at which the two option strings diverge (the reference's
    # hard-coded [-2] index only holds for TinyLlama's tokenizer)
    pos_ids = tok.encode("\nequivalent", add_special_tokens=False)
    neg_ids = tok.encode("\nnot equivalent", add_special_tokens=False)
    i = next(
        (k for k, (a, b) in enumerate(zip(pos_ids, neg_ids)) if a != b),
        min(len(pos_ids), len(neg_ids)) - 1,
    )
    pos_id, neg_id = pos_ids[i], neg_ids[i]

    example = {
        "question": "this is the question.",
        "reference": "44 thousand motors.",
        "candidate": "this is the candidate.",
    }
    logits = llm.first_token_logits([format_instruction(example)])  # [1, V]
    pair = np.asarray(logits[:, [neg_id, pos_id]], np.float32)
    pos_prob = float(jax.nn.softmax(pair, axis=1)[0, 1])
    print(pos_id, neg_id)
    print(pos_prob)


if __name__ == "__main__":
    main(*sys.argv[1:])
