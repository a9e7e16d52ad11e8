"""Query rewriting through the main generator (reference
``models/query_generators/unfold_api_query.py``): reformulates APIBench-style
prompts into retrieval-friendly queries using the pipeline's own LLM."""

from __future__ import annotations

from typing import List

import datasets

from bergen_tpu.models.query_generators.base import QueryGenerator


class UnfoldAPIQuery(QueryGenerator):
    def __init__(self, name: str = "unfolded_query", model: str = "generator",
                 prompt: str = ""):
        self.name = name
        self.prompt = prompt
        self.generator = None

    def set_generator(self, generator) -> None:
        self.generator = generator

    def generate(self, user_questions: List[str]) -> List[str]:
        assert self.generator is not None, "UnfoldAPIQuery needs the pipeline LLM"
        ds = datasets.Dataset.from_dict(
            {
                "query": [
                    self.prompt.format(user_prompt=q) for q in user_questions
                ],
                "q_id": [str(i) for i in range(len(user_questions))],
                "label": [[""] for _ in user_questions],
                "ranking_labels": [None] * len(user_questions),
            }
        )
        q_ids, _, _, responses, _, _ = self.generator.eval(ds)
        ordered = sorted(zip(q_ids, responses), key=lambda p: int(p[0]))
        return [r for _, r in ordered]
