"""Standalone TAPIR demo / setup smoke test.

TPU-native equivalent of the reference's vendored demo
(/root/reference/sam_pt/point_tracker/tapir/demo.py): runs the tracker
alone on the bundled bees clip, times the jitted forward, plots
trajectories. `python -m sam_pt_tpu.models.tracker.tapir.demo --help`.
"""
from ..standalone_demo import run

if __name__ == "__main__":
    run("tapir")
