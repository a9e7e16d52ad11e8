"""OpenAI chat-API generator (reference ``models/generators/llm_openai.py``):
remote GPT generation with per-model $ cost accounting surfaced into
``eval_{split}_generation_cost.json`` by the orchestrator."""

from __future__ import annotations

from typing import List

from bergen_tpu.models.evaluators.openai import PRICING_PER_1K
from bergen_tpu.models.generators.base import Generator


class OpenAIGenerator(Generator):
    def __init__(self, model_name: str = "gpt-4o", batch_size: int = 1,
                 max_new_tokens: int = 128, max_doc_len: int = 100,
                 max_length: int | None = None, prompt=None, **kwargs):
        super().__init__(
            model_name=model_name, batch_size=batch_size,
            max_new_tokens=max_new_tokens, max_doc_len=max_doc_len,
            max_length=max_length,
        )
        import openai  # deferred: optional dependency

        self.client = openai.OpenAI()
        self.prompt = prompt
        self.total_cost = 0.0
        self.prompt_cost = 0.0
        self.completion_cost = 0.0

    # API generator has no local tokenizer: compile_prompt builds plain text
    def format_instruction(self, sample: dict, eval: bool = True):
        question = sample["query"]
        if "doc" in sample and sample["doc"] is not None:
            docs = ""
            for i, doc in enumerate(d for d in sample["doc"] if d.strip()):
                doc = " ".join(doc.split()[: self.max_doc_len])
                docs += f"Document {i + 1}: {doc}\n"
            user = eval_fstring(self.prompt.user, question=question, docs=docs)
            system = self.prompt.system
        else:
            user = eval_fstring(self.prompt.user_without_docs, question=question)
            system = self.prompt.system_without_docs
        return f"{system}\n{user}", None

    def generate(self, prompts: List[str]) -> List[str]:
        out = []
        for prompt in prompts:
            system, _, user = prompt.partition("\n")
            resp = self.client.chat.completions.create(
                messages=[
                    {"role": "system", "content": system},
                    {"role": "user", "content": user},
                ],
                model=self.model_name,
                max_tokens=self.max_new_tokens,
            )
            pricing = PRICING_PER_1K.get(self.model_name)
            if pricing:
                pc = resp.usage.prompt_tokens * pricing["prompt"] / 1000
                cc = resp.usage.completion_tokens * pricing["completion"] / 1000
                self.prompt_cost += pc
                self.completion_cost += cc
                self.total_cost += pc + cc
            out.append(resp.choices[0].message.content)
        return out


def eval_fstring(template: str, **kw) -> str:
    return eval(template, {"__builtins__": {}}, kw).replace(":\\ ", ": ")
