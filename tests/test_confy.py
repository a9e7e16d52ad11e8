"""Unit tests for the confy config system (composition, overrides, instantiate)."""

import os

import pytest

from bergen_tpu import confy


@pytest.fixture()
def cfg_tree(tmp_path):
    root = tmp_path / "config"
    (root / "retriever").mkdir(parents=True)
    (root / "dataset").mkdir()
    (root / "prompt").mkdir()
    (root / "rag.yaml").write_text(
        """
defaults:
    - _self_
    - retriever: null
    - dataset: ??
    - prompt: basic

retrieve_top_k: 50
experiments_folder: 'experiments/'
"""
    )
    (root / "retriever" / "dense.yaml").write_text(
        """
init_args:
  _target_: tests.test_confy.FakeRetriever
  model_name: tiny
batch_size: 32
"""
    )
    (root / "dataset" / "ut1.yaml").write_text(
        """
dev:
  query:
    init_args:
      _target_: bergen_tpu.data.processors.ut.UT1Queries
      split: dev
  doc: null
"""
    )
    (root / "prompt" / "basic.yaml").write_text("system: 'sys'\nuser: 'usr'\n")
    return str(root)


class FakeRetriever:
    def __init__(self, model_name, batch_size=1):
        self.model_name = model_name
        self.batch_size = batch_size


def test_compose_defaults_and_groups(cfg_tree):
    cfg = confy.compose(cfg_tree, "rag", ["dataset=ut1"])
    assert cfg.retrieve_top_k == 50
    assert cfg.retriever is None
    assert cfg.prompt.system == "sys"
    assert cfg.dataset.dev.query.init_args._target_.endswith("UT1Queries")


def test_missing_mandatory_group(cfg_tree):
    with pytest.raises(confy.MissingMandatoryValue):
        confy.compose(cfg_tree, "rag", [])


def test_group_choice_and_dotted_overrides(cfg_tree):
    cfg = confy.compose(
        cfg_tree,
        "rag",
        ["dataset=ut1", "retriever=dense", "retriever.batch_size=8",
         "retrieve_top_k=10", "+new.flag=true", "~prompt"],
    )
    assert cfg.retriever.batch_size == 8
    assert cfg.retrieve_top_k == 10
    assert cfg.new.flag is True
    assert "prompt" not in cfg


def test_override_type_parsing(cfg_tree):
    cfg = confy.compose(
        cfg_tree, "rag",
        ["dataset=ut1", "+a=5", "+b=5.5", "+c=null", "+d=text", "+e=[1,2]"],
    )
    assert cfg.a == 5 and cfg.b == 5.5 and cfg.c is None
    assert cfg.d == "text" and cfg.e == [1, 2]


def test_unknown_override_key_raises(cfg_tree):
    with pytest.raises(KeyError):
        confy.compose(cfg_tree, "rag", ["dataset=ut1", "nonexistent_key=3"])


def test_instantiate_recursive(cfg_tree):
    cfg = confy.compose(cfg_tree, "rag", ["dataset=ut1", "retriever=dense"])
    obj = confy.instantiate(cfg.retriever.init_args, batch_size=4)
    assert type(obj).__name__ == "FakeRetriever"
    assert obj.model_name == "tiny"
    assert obj.batch_size == 4


def test_yaml_roundtrip(cfg_tree, tmp_path):
    cfg = confy.compose(cfg_tree, "rag", ["dataset=ut1"])
    path = tmp_path / "saved.yaml"
    confy.save_yaml(cfg, str(path))
    again = confy.load_yaml(str(path))
    assert again.to_dict() == cfg.to_dict()
