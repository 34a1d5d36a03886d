"""VIS-to-VOS adapter: SAM auto-proposals on frame 0, tracked through video.

Re-implements the reference SamBasedVisToVosAdapter
(sam_pt/modeling/vis_to_vos_adapter.py): SamAutomaticMaskGenerator proposes
masks on the first frame (:116-120), SamPt tracks each through the video in
mask batches (:126-152), outputs detectron2-style records (:93-102) for the
YTVIS evaluator. Labels are a dummy 0 (SAM does not classify; :123).
"""
from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from ..models.sam.auto_mask_generator import SamAutomaticMaskGenerator
from ..models.sam_pt import SamPt


class SamBasedVisToVosAdapter:
    def __init__(
        self,
        model: SamPt,
        sam_generator: SamAutomaticMaskGenerator,
        max_num_masks: int = 100,
        masks_batch_size: int = 100,
        visualize_results: bool = False,
        max_videos_to_visualize: int = 0,
        visualization_dir: str = "outputs/vis_visualizations",
    ):
        self.model = model
        self.sam_generator = sam_generator
        self.max_num_masks = max_num_masks
        self.masks_batch_size = masks_batch_size
        self.visualize_results = visualize_results
        self.max_videos_to_visualize = max_videos_to_visualize
        self.visualization_dir = visualization_dir
        self._n_visualized = 0

    def forward(self, batched_inputs: List[Dict]) -> Dict:
        assert len(batched_inputs) == 1, "Only single video inputs are supported"
        inp = batched_inputs[0]
        images = np.asarray(inp["image"])  # [T, H, W, 3] uint8
        if images.shape[1] == 3 and images.shape[-1] != 3:
            images = images.transpose(0, 2, 3, 1)
        assert images.dtype == np.uint8
        vid_id = inp.get("video_id", 0)
        target_hw = (inp["height"], inp["width"])

        records = self.sam_generator.generate(images[0])
        print(
            f"Generated {len(records)} masks for video {vid_id}, keeping the "
            f"first {min(self.max_num_masks, len(records))}"
        )
        if not records:
            t = images.shape[0]
            return {
                "image_size": target_hw,
                "pred_scores": [],
                "pred_labels": [],
                "pred_masks": [],
                "pred_logits": [],
                "trajectories": np.zeros((t, 0, 1, 2), np.float32),
                "visibilities": np.zeros((t, 0, 1), np.float32),
            }

        query_masks = np.stack(
            [r["segmentation"] for r in records[: self.max_num_masks]]
        ).astype(np.float32)
        n_masks = query_masks.shape[0]
        query_ts = np.zeros((n_masks,), np.float32)
        query_labels = np.zeros((n_masks,), np.int64)

        logits_list, traj_list, vis_list, scores = [], [], [], []
        for i in range(0, n_masks, self.masks_batch_size):
            video = {
                "image": images,
                "target_hw": target_hw,
                "query_masks": query_masks[i : i + self.masks_batch_size],
                "query_point_timestep": query_ts[i : i + self.masks_batch_size],
            }
            out = self.model.forward(video)
            logits_list.extend(out["logits"])
            traj_list.append(out["trajectories"])
            vis_list.append(out["visibilities"])
            scores.extend(out["scores"])

        logits = np.stack(logits_list, axis=0)  # [M, T, h, w]
        trajectories = np.concatenate(traj_list, axis=1)
        visibilities = np.concatenate(vis_list, axis=1)

        if (
            self.visualize_results
            and self._n_visualized < self.max_videos_to_visualize
        ):
            from ..utils.viz import render_predictions, save_video

            frames = render_predictions(
                images, [np.asarray(m) for m in logits],
                trajectories, visibilities,
            )
            save_video(
                frames,
                os.path.join(self.visualization_dir, f"video_{vid_id}.mp4"),
            )
            self._n_visualized += 1

        return {
            "image_size": target_hw,
            "pred_scores": list(scores),
            "pred_labels": query_labels.tolist(),
            "pred_masks": [m > 0 for m in logits],
            "pred_logits": [m for m in logits],
            "trajectories": trajectories,
            "visibilities": visibilities,
        }

    __call__ = forward
