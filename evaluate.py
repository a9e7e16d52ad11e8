"""Post-hoc LLM-judge / LID evaluation CLI (reference ``evaluate.py``).

Scans experiment folders, computes LLMeval (logits or text mode, optionally
pairwise against an opponent folder) and LID metrics over the stored
``eval_{split}_out.json``, appends per-sample columns, and updates
``eval_{split}_metrics.json`` atomically.  Idempotent: already-computed metrics
are skipped unless --force.

    python evaluate.py --experiments_folder experiments/ --llm tinyllama-chat tiny
    python evaluate.py --folder experiments/<run> --lid
"""

import argparse
import json
import os
import shutil


def load_data(input_file: str, nb_samples: int):
    with open(input_file) as f:
        rows = json.load(f)
    if 0 < nb_samples < len(rows):
        rows = rows[:nb_samples]
    return rows


def load_opponent_predictions(opponent_folder: str, split: str, rows):
    with open(f"{opponent_folder}/eval_{split}_out.json") as f:
        other = json.load(f)
    by_qid = {r["q_id"]: r for r in other}
    q_ids = [r["q_id"] for r in rows]
    missing = [q for q in q_ids if q not in by_qid]
    assert not missing, f"opponent folder missing q_ids: {missing[:5]}"
    return [by_qid[q]["response"] for q in q_ids]


def eval_single(experiment_folder, folder, split, model, metric_name,
                nb_samples=-1, gpt=None, opponent_folder=None, force=False):
    if nb_samples > 0:
        metric_name = f"{metric_name}_{nb_samples}"
    folders = (
        [folder]
        if folder is not None
        else [
            f.path
            for f in os.scandir(experiment_folder)
            if f.is_dir() and "tmp_" not in f.path
        ]
    )
    for exp in folders:
        input_file = f"{exp}/eval_{split}_out.json"
        if not os.path.exists(input_file):
            continue
        rows = load_data(input_file, nb_samples)

        metrics_file = f"{exp}/eval_{split}_metrics.json"
        metrics_dict = (
            json.load(open(metrics_file)) if os.path.exists(metrics_file) else {}
        )
        if (metric_name in metrics_dict or f"{metric_name}_tie" in metrics_dict) \
                and not force:
            print(f"{exp}\t{metric_name}\talready done")
            continue

        predictions = [r["response"] for r in rows]
        references = [r["label"] for r in rows]
        questions = [r["question"] for r in rows]

        if gpt is not None:
            if opponent_folder is None:
                model_score, scores, cost = model(predictions, references, questions)
            else:
                opponent = load_opponent_predictions(opponent_folder, split, rows)
                model_score, scores, cost = model.pairwise_win_rate(
                    predictions, opponent, references, questions
                )
            with open(f"{exp}/eval_{split}_cost_{metric_name}_out.json", "w") as f:
                json.dump(cost, f)
        else:
            if opponent_folder is None:
                model_score, scores = model(predictions, references, questions)
            else:
                opponent = load_opponent_predictions(opponent_folder, split, rows)
                model_score, scores = model(
                    predictions=predictions, references=references,
                    questions=questions, opponent_predictions=opponent,
                )

        for r, s in zip(rows, scores):
            r[metric_name] = s
        out_file = input_file if nb_samples <= 0 else f"{exp}/eval_{split}_out_{nb_samples}.json"
        with open(out_file + "_", "w") as f:
            json.dump(rows, f, indent=2)
        shutil.move(out_file + "_", out_file)

        if isinstance(model_score, dict):  # pairwise win/tie/lose
            metrics_dict.update(
                {f"{metric_name}_{k}": v for k, v in model_score.items()}
            )
        else:
            metrics_dict[metric_name] = model_score
        print(metric_name, model_score)
        with open(metrics_file + "_", "w") as f:
            json.dump(metrics_dict, f, indent=2)
        shutil.move(metrics_file + "_", metrics_file)


def llm_eval(llm, experiment_folder, folder, split, batch_size, llm_prompt,
             opponent_folder, opponent_name, nb_samples, force):
    from bergen_tpu import confy
    from bergen_tpu.models.evaluators.llm import LLMeval

    if len(llm) == 0:
        model_config_name, metric_name = "SOLAR-107B", "LLMeval_SOLAR-107B"
    else:
        model_config_name = llm[0]
        metric_name = f"LLMeval_{llm[1] if len(llm) > 1 else model_config_name}"
    if opponent_folder is not None:
        metric_name += "_VS_" + opponent_name

    cfg_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "config")
    model_config = confy.load_yaml(
        os.path.join(cfg_dir, "generator", f"{model_config_name}.yaml")
    )
    model = LLMeval(model_config, batch_size=batch_size, config=llm_prompt)
    if model.use_logits:
        if opponent_folder is not None:
            model.use_logits = False
        else:
            metric_name = f"{metric_name}_logits"
    eval_single(experiment_folder, folder, split, model, metric_name=metric_name,
                nb_samples=nb_samples, opponent_folder=opponent_folder, force=force)


def lid_eval(lid, lid_advanced, experiment_folder, folder, split, nb_samples, force):
    import yaml

    from bergen_tpu.models.evaluators.lid import LID, LID_advanced

    folders = (
        [folder]
        if folder is not None
        else [
            f.path
            for f in os.scandir(experiment_folder)
            if f.is_dir() and "tmp_" not in f.path
        ]
    )
    for exp in folders:
        with open(f"{exp}/config.yaml") as f:
            config = yaml.safe_load(f)
        init_args = config["dataset"][split]["query"]["init_args"]
        tgt_lng = init_args.get("lng") or init_args.get("lang") or "en"
        if lid is not None:
            eval_single(experiment_folder, exp, split, LID(tgt_lng),
                        metric_name="lid", nb_samples=nb_samples, force=force)
        if lid_advanced is not None:
            eval_single(experiment_folder, exp, split, LID_advanced(tgt_lng),
                        metric_name="lid_advanced", nb_samples=nb_samples,
                        force=force)


def run_eval(experiment_folder=None, split="dev", llm=None, llm_ollama=None,
             gpt=None, lid=None, lid_advanced=None, llm_batch_size=None,
             llm_prompt="default_qa", ollama_url=None, folder=None, force=False,
             nb_samples=-1, opponent_folder=None, opponent_name=None):
    if gpt is not None:
        from bergen_tpu.models.evaluators.openai import OpenAIEval

        model = OpenAIEval(gpt)
        metric_name = gpt + (f"_VS_{opponent_name}" if opponent_folder else "")
        eval_single(experiment_folder, folder, split, model, gpt=gpt,
                    metric_name=metric_name, nb_samples=nb_samples,
                    opponent_folder=opponent_folder, force=force)
    if llm is not None:
        llm_eval(llm, experiment_folder, folder, split, llm_batch_size,
                 llm_prompt, opponent_folder, opponent_name, nb_samples, force)
    if llm_ollama is not None:
        from bergen_tpu.models.evaluators.llm_ollama import OllamaEval

        name = f"LLMeval_{llm_ollama[1] if len(llm_ollama) > 1 else llm_ollama[0]}"
        model = OllamaEval(llm_ollama[0], batch_size=llm_batch_size or 1,
                           config=llm_prompt, basic_url=ollama_url)
        eval_single(experiment_folder, folder, split, model, metric_name=name,
                    nb_samples=nb_samples, force=force)
    if lid is not None or lid_advanced is not None:
        lid_eval(lid, lid_advanced, experiment_folder, folder, split,
                 nb_samples, force)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiments_folder", type=str, default="experiments/")
    parser.add_argument("--folder", type=str, default=None)
    parser.add_argument("--split", type=str, default="dev")
    parser.add_argument("--sample", type=int, default=-1)
    parser.add_argument("--lid", action="store_true", default=None)
    parser.add_argument("--lid_advanced", action="store_true", default=None)
    parser.add_argument("--llm", type=str, nargs="*", default=None)
    parser.add_argument("--llm_ollama", type=str, nargs="*", default=None)
    parser.add_argument("--gpt", type=str, default=None)
    parser.add_argument("--opponent_folder", type=str, default=None)
    parser.add_argument("--opponent_name", type=str, default=None)
    parser.add_argument("--llm_batch_size", type=int, default=None)
    parser.add_argument("--force", action="store_true")
    parser.add_argument("--llm_prompt", type=str, default="default_qa")
    parser.add_argument("--ollama_url", type=str, default="http://localhost:11434")
    args = parser.parse_args()

    if args.opponent_folder is not None:
        assert args.gpt or args.llm is not None
        assert args.folder is not None, "pairwise needs an explicit --folder"
        assert os.path.isdir(args.opponent_folder)
        assert args.opponent_name is not None

    run_eval(
        folder=args.folder, experiment_folder=args.experiments_folder,
        split=args.split, llm=args.llm, llm_ollama=args.llm_ollama, gpt=args.gpt,
        lid=args.lid, lid_advanced=args.lid_advanced,
        llm_batch_size=args.llm_batch_size, llm_prompt=args.llm_prompt,
        ollama_url=args.ollama_url, force=args.force, nb_samples=args.sample,
        opponent_folder=args.opponent_folder, opponent_name=args.opponent_name,
    )
