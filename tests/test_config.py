"""Tests for the Hydra-compatible config system."""
import pathlib

import pytest

from sam_pt_tpu.config import compose, instantiate, resolve_interpolations


@pytest.fixture
def cfg_dir(tmp_path: pathlib.Path) -> pathlib.Path:
    (tmp_path / "model").mkdir()
    (tmp_path / "model" / "tracker").mkdir()
    (tmp_path / "root.yaml").write_text(
        """
defaults:
  - model: sam_pt
  - _self_
seed: 72
data_path: ${hydra:runtime.cwd}/data
points: ${model.positive_points}
"""
    )
    (tmp_path / "model" / "sam_pt.yaml").write_text(
        """
defaults:
  - tracker: pips
  - tracker@other.nested: cotracker
_target_: collections.OrderedDict
positive_points: 8
"""
    )
    (tmp_path / "model" / "tracker" / "pips.yaml").write_text(
        "name: pips\nstride: 4\n"
    )
    (tmp_path / "model" / "tracker" / "cotracker.yaml").write_text(
        "name: cotracker\nwindow: 8\n"
    )
    return tmp_path


class TestCompose:
    def test_defaults_composition(self, cfg_dir):
        cfg = compose(cfg_dir, "root")
        assert cfg["seed"] == 72
        assert cfg["model"]["tracker"]["name"] == "pips"
        assert cfg["model"]["other"]["nested"]["name"] == "cotracker"

    def test_group_override(self, cfg_dir):
        cfg = compose(cfg_dir, "root", ["model/tracker=cotracker"])
        assert cfg["model"]["tracker"]["name"] == "cotracker"
        assert cfg["model"]["tracker"]["window"] == 8

    def test_value_overrides(self, cfg_dir):
        cfg = compose(cfg_dir, "root", ["seed=1", "model.positive_points=3", "+extra.x=true"])
        assert cfg["seed"] == 1
        assert cfg["model"]["positive_points"] == 3
        assert cfg["extra"]["x"] is True

    def test_missing_override_path_raises(self, cfg_dir):
        with pytest.raises(KeyError):
            compose(cfg_dir, "root", ["nonexistent.path=1"])

    def test_interpolation(self, cfg_dir):
        cfg = resolve_interpolations(compose(cfg_dir, "root"), runtime_cwd="/wd")
        assert cfg["data_path"] == "/wd/data"
        assert cfg["points"] == 8  # type-preserving whole-string interpolation


class TestInstantiate:
    def test_recursive_target(self):
        obj = instantiate(
            {"_target_": "collections.Counter", "a": 1, "b": 2}
        )
        import collections

        assert isinstance(obj, collections.Counter)
        assert obj["a"] == 1

    def test_partial(self):
        fn = instantiate({"_target_": "operator.add", "_partial_": True})
        assert fn(2, 3) == 5
