"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip (and behind a high-latency tunnel) in CI;
tests run on CPU, and multi-chip sharding is validated on virtual CPU devices
via XLA host-platform device multiplexing (SURVEY.md §4 test strategy).

Note: the environment's sitecustomize imports jax and pins JAX_PLATFORMS=axon
before any test code runs, so we must switch platforms via jax.config (env
edits are captured at jax import time and would be ignored).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(72)  # reference eval seed (vos_eval_root.yaml)


# ---------------------------------------------------------------------------
# Two-tier suite: tests matching these nodeid substrings take >8 s each on a
# CI-class CPU (big jit compiles / reference-parity forwards) and are marked
# `slow`. Fast tier: `pytest -m "not slow"` (< 3 min); full suite for CI.
# Measured with `pytest --durations` (see README Testing section).
# ---------------------------------------------------------------------------
_SLOW_PATTERNS = (
    "test_parity_",                 # all reference-parity suites
    "test_demo.py",
    "test_interactive.py",
    "test_tiny_vit.py",
    "test_tapir.py",
    "test_tapnet.py::TestTapNet",
    "test_sam_pt.py::TestReinit",
    "test_sam_pt.py::TestDeterminism",
    "test_sam_pt.py::TestForwardContract::test_query_points_path",
    "test_sam_pt.py::TestForwardContract::test_query_masks_path",
    "test_checkpoint.py::TestPipsConversion",
    "test_checkpoint.py::TestSamConversion",
    "test_pips2.py",
    "test_pips.py::TestPipsModel::test_window_forward_shapes",
    "test_vos_eval.py::TestEndToEndEval",
    "test_vis_eval.py::TestEndToEndVIS",
    "test_cotracker.py::TestCoTrackerModel::test_window_forward",
    "test_cotracker.py::TestUpdateFormer",
    "test_hq.py::TestMaskDecoderHQ::test_output_shapes",
    "test_hq.py::TestSamHQ::test_end_to_end_vit",
    "test_raft.py::TestRaftCore::test_forward_shapes",
    "test_parallel.py::TestMesh::test_sharded_sam_predictor_matches_unsharded",
    "test_superglue.py::TestTracker::test_contract_and_statefulness",
    "test_sam.py::TestPadTokenMasking",
    "test_cotracker.py::TestTracker",
    "test_checkpoint.py::TestSuperGlueConversion",
    "test_raft.py::TestRaftTracker",
    "test_vis_eval.py::TestAutoMaskGenerator",
    "test_pips.py::TestCorrelation",
    "test_pips.py::TestPipsModel",
    "test_pips.py::TestPipsTracker",
    "test_superglue.py::TestSuperPoint",
    "test_tapnet.py::TestTSM::test_backbone_stride8",
    "test_sam.py::TestMaskDecoder",
    # heavyweight parity/compile tests (> ~20 s on a 1-CPU box); each area
    # keeps a faster representative in the fast tier
    "test_parallel.py::TestShardedOrchestrator",
    "test_sam_pt.py::TestDeviceFlow",
    "test_tensor_parallel.py::TestTensorParallelEncode::test_sam_level_tp",
    "test_tensor_parallel.py::TestTensorParallelEncode::"
    "test_tp_predictor_matches_unsharded",
    "test_sam.py::TestCropPadTokens::test_padded_input_crops_and_zero_fills",
    "test_sam.py::TestCropPadTokens::test_square_input_is_identity",
    "test_parallel.py::TestTemporalSharding::"
    "test_tapnet_tracker_time_parallel_matches",
    "test_parallel.py::TestTemporalSharding::"
    "test_tapnet_time_sharded_matches_unsharded[16]",
    "test_sam.py::TestSamEndToEnd",
    "test_sam_pt.py::TestReinitMidVideoQuery",
    "test_sam_pt.py::TestBlankedLogitsResize",
    "test_tensor_parallel.py::TestPallasTpParity",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(pat in item.nodeid for pat in _SLOW_PATTERNS):
            item.add_marker(pytest.mark.slow)
