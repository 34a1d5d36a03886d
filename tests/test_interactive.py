"""SamPtInteractive tests (tiny random models, synthetic GT)."""
import numpy as np
import pytest

from sam_pt_tpu.models.sam_pt_interactive import (
    SamPtInteractive,
    extract_largest_cluster_points,
)
from sam_pt_tpu.utils.testing import build_tiny_pips, build_tiny_predictor


def build_tiny_interactive(tmp_path, **kw):
    defaults = dict(
        sam_iou_threshold=0.0,
        positive_points_per_mask=2,
        negative_points_per_mask=0,
        positive_point_selection_method="random",
        negative_point_selection_method="random",
        iterative_refinement_iterations=0,
        sam_decode_chunk=8,
        sam_encode_chunk=4,
        interactions_max=6,
        interactions_max_per_frame=2,
        online=True,
        online_interactive_iou_threshold=0.9,
        output_root=str(tmp_path / "interactions"),
    )
    defaults.update(kw)
    return SamPtInteractive(
        point_tracker=build_tiny_pips(48, 64),
        sam_predictor=build_tiny_predictor(64),
        **defaults,
    )


class TestClusterPoints:
    def test_selects_from_largest_cluster(self):
        mask = np.zeros((60, 80), bool)
        mask[10:40, 10:40] = True   # large cluster
        mask[50:53, 70:73] = True   # small cluster
        pts = extract_largest_cluster_points(mask, 3,
                                             rng=np.random.default_rng(0))
        assert pts.shape == (3, 2)
        # all selected points inside the large cluster
        assert (pts[:, 0] < 45).all() and (pts[:, 1] < 45).all()


class TestInteractive:
    def test_end_to_end(self, tmp_path, rng):
        model = build_tiny_interactive(tmp_path)
        t, h, w = 3, 48, 64
        gt = np.zeros((t, h, w), np.float32)
        gt[:, 10:30, 10:40] = 1
        video = {
            "video_name": "synthetic",
            "video_id": 0,
            "image": rng.integers(0, 255, size=(t, h, w, 3)).astype(np.uint8),
            "target_hw": (h, w),
            "query_masks": gt[:1],
            "query_point_timestep": np.zeros((1,), np.float32),
            "gt_masks": gt[:, None],
        }
        out = model.forward(video)
        assert len(out["logits"]) == 1
        assert out["logits"][0].shape == (t, h, w)
        assert "interaction_history" in out
        assert (tmp_path / "interactions" / "0" / "history.json").exists()
