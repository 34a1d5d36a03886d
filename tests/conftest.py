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
