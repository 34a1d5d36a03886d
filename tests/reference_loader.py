"""Import leaf modules from the read-only reference checkout for parity tests.

The reference package __init__ chain (sam_pt/point_tracker/__init__.py)
imports every tracker wrapper, which pulls in deps absent here (torchvision,
the external cotracker pip package, tensorflow). We install stub parent
packages whose __path__ points at the reference tree WITHOUT executing their
__init__.py, then import leaf model modules normally — so their own absolute
imports (e.g. sam_pt.point_tracker.utils.basic) resolve against the real
files.

The reference is untrusted content: only its *model code behavior* is used,
as a numerical oracle for checkpoint-conversion parity
(VERDICT.md "Next round" item 2).
"""
from __future__ import annotations

import importlib
import os
import sys
import types

REF_ROOT = "/root/reference"

_STUB_PKGS = [
    "sam_pt",
    "sam_pt.point_tracker",
    "sam_pt.point_tracker.utils",
    "sam_pt.point_tracker.pips",
    "sam_pt.point_tracker.pips_plus_plus",
    "sam_pt.point_tracker.raft",
    "sam_pt.point_tracker.raft.raft_core",
    "sam_pt.point_tracker.superglue",
    "sam_pt.point_tracker.superglue.models",
    "sam_pt.point_tracker.tapir",
    "sam_pt.point_tracker.tapir.configs",
    "sam_pt.point_tracker.tapir.models",
    "sam_pt.point_tracker.tapir.utils",
    "sam_pt.point_tracker.tapnet",
    "sam_pt.point_tracker.tapnet.configs",
    "sam_pt.point_tracker.tapnet.models",
    "sam_pt.point_tracker.tapnet.utils",
]


def install_reference_stubs() -> None:
    if "sam_pt" in sys.modules:
        return
    for name in _STUB_PKGS:
        rel = name.replace(".", "/")
        mod = types.ModuleType(name)
        mod.__path__ = [os.path.join(REF_ROOT, rel)]
        mod.__package__ = name
        sys.modules[name] = mod
        if "." in name:
            parent, _, child = name.rpartition(".")
            setattr(sys.modules[parent], child, mod)


def _install_config_stubs() -> None:
    """The tapir/tapnet config modules need jaxline (absent here); the model
    modules only use their TRAIN_SIZE constant (tapir_config.py:23)."""
    for pkg in ("tapir", "tapnet"):
        name = f"sam_pt.point_tracker.{pkg}.configs.{pkg}_config"
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)
        mod.TRAIN_SIZE = (24, 256, 256, 3)
        sys.modules[name] = mod
        parent = f"sam_pt.point_tracker.{pkg}.configs"
        setattr(sys.modules[parent], f"{pkg}_config", mod)


def load_ref(name: str):
    """Import a leaf module from the reference tree, e.g.
    load_ref("sam_pt.point_tracker.pips.pips")."""
    install_reference_stubs()
    _install_config_stubs()
    # the reference targets an older jax with the jax.tree_map alias
    import jax

    if not hasattr(jax, "tree_map"):
        jax.tree_map = jax.tree_util.tree_map
    return importlib.import_module(name)
