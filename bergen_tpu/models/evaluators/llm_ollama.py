"""Ollama-server judge (reference ``models/evaluators/llm_ollama.py``): sends
the same yes/no rubric to a remote ollama HTTP endpoint.  Uses plain
``requests`` (no langchain dependency)."""

from __future__ import annotations

from bergen_tpu.models.evaluators.utils import (
    get_mean_without_unknown,
    process_llm_outputs_assess_scores,
)

_OPTIONS = {"Yes": 1, "No": 0}
_PROMPT = (
    "You are an evaluation tool. Just answer by Yes or No. Here is a question, "
    "a golden answer and an AI-generated answer. Judge whether the AI-generated "
    "answer is correct according to the question and golden answer, answer with "
    "Yes or No.\nQuestion: {question}.\nGolden answer: {answer}\n"
    "Generated answer: {prediction}"
)


class OllamaEval:
    def __init__(self, model_name: str, batch_size: int = 1,
                 config: str = "default_qa", basic_url: str = "http://localhost:11434"):
        self.model_name = model_name
        self.url = basic_url.rstrip("/") + "/api/generate"
        self.batch_size = batch_size

    def _ask(self, prompt: str) -> str:
        import requests

        resp = requests.post(
            self.url,
            json={"model": self.model_name, "prompt": prompt, "stream": False},
            timeout=120,
        )
        resp.raise_for_status()
        return resp.json().get("response", "")

    def __call__(self, predictions, references, questions):
        outputs = [
            self._ask(_PROMPT.format(question=q, answer=r, prediction=p))
            for p, r, q in zip(predictions, references, questions)
        ]
        scores, _ = process_llm_outputs_assess_scores(outputs, _OPTIONS)
        return get_mean_without_unknown(scores), scores
