"""Demo entry-point integration test on the bundled bees clip (tiny config).

This is the reference's bundled-demo smoke test (SURVEY.md §4 item 4) run on
CPU with a small SAM image size and random weights.
"""
import os

import numpy as np
import pytest

DEMO_DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "demo_data",
)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(DEMO_DATA, "bees.mp4")),
    reason="demo data not mounted",
)
class TestDemo:
    def test_bees_end_to_end(self, tmp_path):
        from demo.demo import load_frames, load_query_points, main

        cfg = {
            "seed": 72,
            "frames_path": os.path.join(DEMO_DATA, "bees.mp4"),
            "query_points_path": os.path.join(
                DEMO_DATA, "query_points__bees.txt"
            ),
            # query_points_scale omitted: auto-scaled by the frame resize
            # factor (256/1280 for the 720x1280 clip), like the reference
            "frame_stride": 5,
            "max_frames": 4,
            "longest_side_length": 256,
            "output_dir": str(tmp_path / "demo_out"),
            "model": {
                "_target_": "sam_pt_tpu.models.sam_pt.SamPt",
                "point_tracker": {
                    "_target_": "sam_pt_tpu.models.tracker.pips.tracker.PipsPointTracker",
                    "checkpoint_path": None,
                    "stride": 4,
                    "s": 4,
                    "iters": 2,
                    "allow_random_init": True,
                },
                "sam_predictor": {
                    "_target_": "sam_pt_tpu.models.sam.factory.build_predictor",
                    "variant": "vit_b",
                    "checkpoint": None,
                    "dtype": "float32",
                    "image_size": 128,
                    "allow_random_init": True,
                },
                "sam_iou_threshold": 0.0,
                "positive_points_per_mask": 1,
                "negative_points_per_mask": 0,
                "iterative_refinement_iterations": 1,
                "sam_decode_chunk": 8,
                "sam_encode_chunk": 2,
            },
        }
        out = main(cfg)
        assert len(out["logits"]) == 2  # bees clip defines two masks
        t = out["logits"][0].shape[0]
        assert t == 4
        assert os.path.exists(tmp_path / "demo_out" / "overlay.mp4")

    def test_query_points_parsing(self):
        from demo.demo import load_query_points

        qp, n_pos = load_query_points(
            os.path.join(DEMO_DATA, "query_points__bees.txt")
        )
        assert qp.ndim == 3 and qp.shape[2] == 3
        assert n_pos >= 1
