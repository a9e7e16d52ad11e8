"""List every dataset processor class (reference ``scripts/list_datasets.py``):
prints the concrete Processor subclasses per module so users can discover what
``config/dataset/*.yaml`` may reference."""

import inspect
import importlib
import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

MODULES = [
    "bergen_tpu.data.processors.general",
    "bergen_tpu.data.processors.kilt",
    "bergen_tpu.data.processors.qa",
    "bergen_tpu.data.processors.mrag",
    "bergen_tpu.data.processors.msmarco",
    "bergen_tpu.data.processors.multidomain",
    "bergen_tpu.data.processors.nih",
    "bergen_tpu.data.processors.ut",
]


def main() -> None:
    from bergen_tpu.data.processor import Processor

    print("Datasets (collection and queries):")
    for mpath in MODULES:
        mod = importlib.import_module(mpath)
        names = sorted(
            name
            for name, cls in inspect.getmembers(mod, inspect.isclass)
            if cls.__module__ == mpath
            and issubclass(cls, Processor)
            and cls is not Processor
            and not name.startswith("_")
        )
        if names:
            print(f"\n{mpath}:")
            for name in names:
                print(f"  {name}")


if __name__ == "__main__":
    main()
