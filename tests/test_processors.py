"""Config smoke tests: every dataset config instantiates its processors without
downloading (mirrors reference test_processor_all, zeroshot_test.py:157-182)."""

import glob
import os

import pytest

from bergen_tpu import confy
from bergen_tpu.data.processor import ProcessDatasets


def _all_dataset_configs(repo_root):
    cfg_dir = os.path.join(repo_root, "config", "dataset")
    out = []
    for path in sorted(
        glob.glob(os.path.join(cfg_dir, "**", "*.yaml"), recursive=True)
    ):
        out.append(path)
    return out


def test_found_configs(repo_root):
    assert len(_all_dataset_configs(repo_root)) >= 75


def test_all_processor_configs_instantiate(repo_root, tmp_path):
    failures = []
    for path in _all_dataset_configs(repo_root):
        cfg = confy.load_yaml(path)
        try:
            ProcessDatasets.check_instantiate(cfg, out_folder=str(tmp_path))
        except Exception as e:
            failures.append(f"{os.path.relpath(path, repo_root)}: {e}")
    assert not failures, "\n".join(failures)


def test_kilt_standard_transform_semantics():
    import datasets as hfds

    from bergen_tpu.data.processors.kilt import kilt_standard_transform

    raw = hfds.Dataset.from_dict(
        {
            "id": ["a", "b"],
            "input": ["q1", "q2"],
            "meta": [{}, {}],
            "output": [
                [
                    {"answer": "x", "provenance": [{"wikipedia_id": "11"}]},
                    {"answer": "", "provenance": [{"wikipedia_id": "22"}]},
                ],
                [{"answer": "y", "provenance": []}],
            ],
        }
    )
    out = kilt_standard_transform(raw)
    assert out["label"] == [["x"], ["y"]]
    assert out["ranking_label"] == [[["11"], []], [[]]]
    assert out["content"] == ["q1", "q2"]
    assert "output" not in out.column_names


def test_multidomain_label_helpers():
    from bergen_tpu.data.processors.multidomain import (
        BIOASQ12B, _extract_instruction,
    )

    # gorilla instruction extraction variants
    assert (
        _extract_instruction("xx###Instruction: do thing\n###Output: y")
        == "do thing"
    )
    assert (
        _extract_instruction("xx### Instruction: do thing ### Output: y")
        == "do thing"
    )
    assert _extract_instruction("no markers") is None

    # bioasq list-label combination expansion
    labels = BIOASQ12B._list_labels([["a", "b"], ["c"]], "id1")
    assert sorted(labels) == ["a, c", "b, c"]
