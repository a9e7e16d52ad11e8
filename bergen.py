"""CLI entry point (reference ``bergen.py``):

    python bergen.py dataset=ut1 retriever=contriever generator=tinyllama-chat

Root config selected by the ``CONFIG`` env var (default ``rag``), composed from
the ``config/`` tree with hydra-style overrides, then run through the RAG
orchestrator: train if a train config is present, else eval the dev split.
"""

import os
import sys


def main(config):
    from bergen_tpu.rag import RAG

    rag = RAG(**config, config=config)
    if "train" in config and config["train"] is not None:
        rag.train()
    else:
        rag.eval(dataset_split="dev")


if __name__ == "__main__":
    from bergen_tpu import confy

    config_name = os.environ.get("CONFIG", "rag")
    config_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "config")
    cfg = confy.compose(config_path, config_name, sys.argv[1:])
    main(cfg)
