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


class TestRealConfigTree:
    """The shipped configs/ tree must compose + interpolate for every
    tracker and SAM variant (no instantiation — that needs checkpoints)."""

    def test_all_tracker_groups_compose(self):
        import pathlib

        cfg_dir = pathlib.Path(__file__).parent.parent / "configs"
        trackers = ["pips", "pips_plus_plus", "cotracker", "raft",
                    "tapir", "tapnet", "superglue"]
        for tr in trackers:
            cfg = compose(cfg_dir, "vos_eval_root",
                          [f"model/point_tracker={tr}"])
            cfg = resolve_interpolations(cfg, runtime_cwd="/repo")
            assert cfg["model"]["point_tracker"]["_target_"], tr

    def test_all_sam_variants_compose(self):
        import pathlib

        cfg_dir = pathlib.Path(__file__).parent.parent / "configs"
        variants = ["sam_vit_base", "sam_vit_large", "sam_vit_huge",
                    "sam_mobile_vit_tiny", "samhq_vit_huge",
                    "samhq_light_vit_tiny"]
        for v in variants:
            cfg = compose(cfg_dir, "vos_eval_root",
                          [f"model/sam@model.sam_predictor={v}"])
            cfg = resolve_interpolations(cfg, runtime_cwd="/repo")
            assert cfg["model"]["sam_predictor"]["variant"], v

    def test_vis_and_demo_compose(self):
        import pathlib

        cfg_dir = pathlib.Path(__file__).parent.parent / "configs"
        for name in ("vis_eval_root", "demo"):
            cfg = resolve_interpolations(
                compose(cfg_dir, name), runtime_cwd="/repo"
            )
            assert cfg["model"], name
