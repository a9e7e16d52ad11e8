"""OpenAI GPT-judge evaluator (reference ``models/evaluators/openai.py``):
chat-API yes/no judging + pairwise with $ cost accounting.  The openai package
is an optional dependency (absent in this image); import is deferred so the
rest of the framework never needs it."""

from __future__ import annotations

import random

from bergen_tpu.models.evaluators.utils import (
    get_mean_without_unknown,
    get_pairwise_scores_without_unknown,
    process_llm_outputs_assess_scores,
    unswitch_switched_scores,
)

PRICING_PER_1K = {
    "gpt-3.5-turbo": {"prompt": 0.0015, "completion": 0.0020},
    "gpt-4-1106-preview": {"prompt": 0.01, "completion": 0.03},
    "gpt-4-0125-preview": {"prompt": 0.01, "completion": 0.03},
    "gpt-4": {"prompt": 0.03, "completion": 0.06},
    "gpt-4o": {"prompt": 0.005, "completion": 0.015},
}


def openai_api_calculate_cost(usage, model="gpt-4-1106-preview"):
    try:
        p = PRICING_PER_1K[model]
    except KeyError:
        raise ValueError("Invalid model specified")
    prompt_cost = usage.prompt_tokens * p["prompt"] / 1000
    completion_cost = usage.completion_tokens * p["completion"] / 1000
    return (round(prompt_cost + completion_cost, 6), prompt_cost, completion_cost)


_SYSTEM = "You are an evaluation tool. Answer with one of Yes, No."
_USER = (
    "Here is a question, a golden answer and an AI-generated answer. Can you "
    "judge whether the AI-generated answer is correct according to the question "
    "and golden answer, simply answer with one of Yes, No.\n"
    "Question: {question}.\nGolden answer: {answer}\nGenerated answer: {prediction}"
)
_SYSTEM_PAIRWISE = (
    "You are a helpful assistant, that ranks models by the quality of their "
    "answers. Please act as an impartial judge."
)
_USER_PAIRWISE = (
    "Here is a question, a ground truth answer, an AI-generated answer 1 and an "
    "AI-generated answer 2. Which answer is the most correct one ? Simply answer "
    "1 if the first is better, 2 if the second is better and 3 if it's a tie.\n"
    "Question: {question}.\nGround truth answer: {answer}.\n"
    "Answer 1: {prediction_1}.\nAnswer 2: {prediction_2}."
)

OPTIONS = {"Yes": 1, "No": 0}
OPTIONS_PAIRWISE = {"1": 1.0, "2": 0.0, "3": 0.5}


class OpenAIEval:
    def __init__(self, model_name: str = "gpt-4o"):
        import openai  # deferred: optional dependency

        self.client = openai.OpenAI()
        self.model_name = model_name

    def _chat(self, system: str, user: str):
        resp = self.client.chat.completions.create(
            messages=[
                {"role": "system", "content": system},
                {"role": "user", "content": user},
            ],
            model=self.model_name,
        )
        cost = openai_api_calculate_cost(resp.usage, self.model_name)
        return resp.choices[0].message.content, cost

    def __call__(self, predictions, references, questions):
        scores, total, pc, cc = [], 0.0, 0.0, 0.0
        for pred, refs, q in zip(predictions, references, questions):
            text, (t, p, c) = self._chat(
                _SYSTEM, _USER.format(question=q, answer=refs, prediction=pred)
            )
            total, pc, cc = total + t, pc + p, cc + c
            s, _ = process_llm_outputs_assess_scores([text], OPTIONS)
            scores.extend(s)
        cost = {"total_cost": total, "prompt_cost": pc, "completion_cost": cc}
        return get_mean_without_unknown(scores), scores, cost

    def pairwise_win_rate(self, predictions, opponent_predictions, references,
                          questions):
        scores, switches = [], []
        total, pc, cc = 0.0, 0.0, 0.0
        for pred, opp, refs, q in zip(
            predictions, opponent_predictions, references, questions
        ):
            switch = random.choice([True, False])
            p1, p2 = (opp, pred) if switch else (pred, opp)
            text, (t, p, c) = self._chat(
                _SYSTEM_PAIRWISE,
                _USER_PAIRWISE.format(
                    question=q, answer=refs, prediction_1=p1, prediction_2=p2
                ),
            )
            total, pc, cc = total + t, pc + p, cc + c
            s, _ = process_llm_outputs_assess_scores([text], OPTIONS_PAIRWISE)
            scores.extend(s)
            switches.append(switch)
        scores = unswitch_switched_scores(scores, switches)
        cost = {"total_cost": total, "prompt_cost": pc, "completion_cost": cc}
        return get_pairwise_scores_without_unknown(scores), scores, cost


# reference exposes the class as `OpenAI`
OpenAI = OpenAIEval
