"""VIS stack tests: RLE codec, video AP, auto mask generator, end-to-end."""
import json
import os
from os import path

import numpy as np
import pytest
from PIL import Image

from sam_pt_tpu.vis_eval.rle import (
    compress_counts,
    decode_mask,
    decompress_counts,
    encode_mask,
    mask_to_rle_counts,
    rle_counts_to_mask,
)
from sam_pt_tpu.vis_eval.ytvos_eval import YTVOSEvaluator, track_iou


class TestRLE:
    def test_roundtrip(self, rng):
        mask = rng.uniform(size=(23, 31)) > 0.6
        rle = encode_mask(mask)
        back = decode_mask(rle)
        np.testing.assert_array_equal(back, mask)

    def test_counts_compression_roundtrip(self, rng):
        counts = [0, 5, 3, 100, 2, 713]
        assert decompress_counts(compress_counts(counts)) == counts

    def test_counts_fortran_order(self):
        mask = np.zeros((3, 2), np.uint8)
        mask[0, 0] = 1  # first element in column-major order
        assert mask_to_rle_counts(mask) == [0, 1, 5]
        np.testing.assert_array_equal(
            rle_counts_to_mask([0, 1, 5], (3, 2)), mask.astype(bool)
        )


class TestTrackIoU:
    def test_identical_and_disjoint(self):
        a = np.zeros((8, 8), bool)
        a[2:5, 2:5] = True
        b = np.zeros((8, 8), bool)
        b[6:8, 6:8] = True
        assert track_iou([a, a], [a, a]) == 1.0
        assert track_iou([a], [b]) == 0.0
        # None frames contribute zero intersection but full union
        assert track_iou([a, None], [a, a]) == pytest.approx(9 / 18)


def make_gt(n_videos=1, t=3, h=16, w=16):
    videos, anns = [], []
    for v in range(n_videos):
        videos.append({"id": v + 1, "height": h, "width": w, "length": t,
                       "file_names": [f"v{v}/{i:05d}.jpg" for i in range(t)]})
        mask = np.zeros((h, w), bool)
        mask[4:10, 4:10] = True
        anns.append({
            "id": v + 1, "video_id": v + 1, "category_id": 1,
            "segmentations": [encode_mask(mask)] * t, "iscrowd": 0,
        })
    return {"videos": videos, "annotations": anns,
            "categories": [{"id": 1, "name": "object"}]}


class TestVideoAP:
    def test_perfect_detection(self):
        gt = make_gt()
        mask = np.zeros((16, 16), bool)
        mask[4:10, 4:10] = True
        dets = [{
            "video_id": 1, "category_id": 1, "score": 0.9,
            "segmentations": [encode_mask(mask)] * 3,
        }]
        m = YTVOSEvaluator(gt).evaluate(dets)
        assert m["AP"] == pytest.approx(1.0, abs=1e-6)
        assert m["AR@100"] == pytest.approx(1.0, abs=1e-6)

    def test_miss(self):
        gt = make_gt()
        mask = np.zeros((16, 16), bool)
        mask[0:2, 0:2] = True
        dets = [{
            "video_id": 1, "category_id": 1, "score": 0.9,
            "segmentations": [encode_mask(mask)] * 3,
        }]
        m = YTVOSEvaluator(gt).evaluate(dets)
        assert m["AP"] == 0.0


def _det(vid, score, mask, t=3, cat=1):
    return {"video_id": vid, "category_id": cat, "score": score,
            "segmentations": [encode_mask(mask)] * t}


def _box_mask(h, w, y0, x0, size):
    m = np.zeros((h, w), bool)
    m[y0:y0 + size, x0:x0 + size] = True
    return m


class TestVideoAPFullStats:
    """Area-range and maxDets semantics vs hand-computed COCO values
    (reference ytvis_api/ytvoseval.py:286-546)."""

    H, W = 300, 420

    def _gt(self, objects, iscrowd=None):
        anns = []
        for i, mask in enumerate(objects):
            anns.append({
                "id": i + 1, "video_id": 1, "category_id": 1,
                "segmentations": [encode_mask(mask)] * 3,
                "iscrowd": 0 if iscrowd is None else iscrowd[i],
            })
        return {
            "videos": [{"id": 1, "height": self.H, "width": self.W,
                        "length": 3,
                        "file_names": [f"v/{i:05d}.jpg" for i in range(3)]}],
            "annotations": anns,
            "categories": [{"id": 1, "name": "object"}],
        }

    def test_area_buckets(self):
        # small 10x10=100 < 128^2; medium 150^2 in (128^2, 256^2);
        # large 260^2 > 256^2 — one perfect det each
        small = _box_mask(self.H, self.W, 0, 0, 10)
        medium = _box_mask(self.H, self.W, 20, 20, 150)
        large = _box_mask(self.H, self.W, 0, 150, 260)
        gt = self._gt([small, medium, large])
        dets = [_det(1, 0.9, small), _det(1, 0.8, medium),
                _det(1, 0.7, large)]
        m = YTVOSEvaluator(gt).evaluate(dets)
        for k in ("AP", "AP50", "AP75", "APs", "APm", "APl",
                  "AR@1", "AR@10", "AR@100", "ARs", "ARm", "ARl"):
            assert k in m, k
        assert m["AP"] == pytest.approx(1.0, abs=1e-6)
        assert m["APs"] == pytest.approx(1.0, abs=1e-6)
        assert m["APm"] == pytest.approx(1.0, abs=1e-6)
        assert m["APl"] == pytest.approx(1.0, abs=1e-6)
        # AR@1 sees only the top-scored det -> recalls 1 of 3 GTs
        assert m["AR@1"] == pytest.approx(1 / 3, abs=1e-6)
        assert m["AR@10"] == pytest.approx(1.0, abs=1e-6)

    def test_high_scored_fp_halves_ap(self):
        # dets: FP at score .9 then perfect TP at .8 -> precision envelope
        # is 0.5 at every recall point -> AP exactly 0.5 (COCO 101-pt)
        obj = _box_mask(self.H, self.W, 40, 40, 150)
        spurious = _box_mask(self.H, self.W, 250, 350, 30)
        gt = self._gt([obj])
        dets = [_det(1, 0.9, spurious), _det(1, 0.8, obj)]
        m = YTVOSEvaluator(gt).evaluate(dets)
        assert m["AP"] == pytest.approx(0.5, abs=1e-6)
        assert m["AP50"] == pytest.approx(0.5, abs=1e-6)

    def test_out_of_range_unmatched_det_is_ignored_not_fp(self):
        # same fixture, but scored per area range: in 'large' the small
        # spurious det is out of range and unmatched -> ignored -> APl = 1
        obj = _box_mask(self.H, self.W, 0, 0, 260)  # large
        spurious = _box_mask(self.H, self.W, 280, 390, 10)  # small
        gt = self._gt([obj])
        dets = [_det(1, 0.9, spurious), _det(1, 0.8, obj)]
        m = YTVOSEvaluator(gt).evaluate(dets)
        assert m["AP"] == pytest.approx(0.5, abs=1e-6)   # FP in 'all'
        assert m["APl"] == pytest.approx(1.0, abs=1e-6)  # ignored in 'large'
        assert m["APs"] == -1.0  # no small GT anywhere -> absent bucket

    def test_crowd_gt_ignored(self):
        # det matching a crowd GT is ignored (neither TP nor FP); the real
        # GT's TP keeps AP at 1 despite the higher-scored crowd match
        crowd = _box_mask(self.H, self.W, 0, 0, 150)
        real = _box_mask(self.H, self.W, 160, 160, 130)
        gt = self._gt([crowd, real], iscrowd=[1, 0])
        dets = [_det(1, 0.9, crowd), _det(1, 0.8, real)]
        m = YTVOSEvaluator(gt).evaluate(dets)
        assert m["AP"] == pytest.approx(1.0, abs=1e-6)
        assert m["AR@100"] == pytest.approx(1.0, abs=1e-6)

    def test_avg_area_uses_nonzero_frames(self):
        from sam_pt_tpu.vis_eval.ytvos_eval import avg_area

        m1 = _box_mask(self.H, self.W, 0, 0, 10)
        assert avg_area([m1, None, np.zeros_like(m1)]) == 100.0
        assert avg_area([None, None]) == 0.0


class TestAutoMaskGenerator:
    def test_generate_contract(self, rng):
        from sam_pt_tpu.models.sam.auto_mask_generator import (
            SamAutomaticMaskGenerator,
        )
        from sam_pt_tpu.utils.testing import build_tiny_predictor

        gen = SamAutomaticMaskGenerator(
            model=build_tiny_predictor(),
            points_per_side=3,
            points_per_batch=4,
            pred_iou_thresh=-1e9,  # random weights -> keep everything
            stability_score_thresh=0.0,
        )
        img = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
        records = gen.generate(img)
        # random weights may or may not produce masks; check record schema
        for r in records:
            assert set(r) >= {"segmentation", "bbox", "predicted_iou",
                              "point_coords", "stability_score", "area"}
            assert r["segmentation"].shape == (48, 64)

    def test_crop_layers_full_image_masks(self, rng):
        """crop_n_layers >= 1: every record's segmentation must be on the
        FULL image canvas (crops used to emit crop-local shapes that broke
        np.stack in the VIS adapter), and between-crop NMS must run."""
        from sam_pt_tpu.models.sam.auto_mask_generator import (
            SamAutomaticMaskGenerator,
        )
        from sam_pt_tpu.utils.testing import build_tiny_predictor

        gen = SamAutomaticMaskGenerator(
            model=build_tiny_predictor(),
            points_per_side=2,
            points_per_batch=4,
            pred_iou_thresh=-1e9,
            stability_score_thresh=0.0,
            crop_n_layers=1,
        )
        img = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
        records = gen.generate(img)
        assert records, "random-weight generation produced no masks"
        for r in records:
            assert r["segmentation"].shape == (48, 64)
        np.stack([r["segmentation"] for r in records])  # adapter's stack

    def test_small_region_postprocess_updates_boxes(self):
        """Island removal + hole filling must recompute the record bbox."""
        from sam_pt_tpu.models.sam.auto_mask_generator import (
            SamAutomaticMaskGenerator, mask_to_box,
        )
        from sam_pt_tpu.utils.testing import build_tiny_predictor

        gen = SamAutomaticMaskGenerator(
            model=build_tiny_predictor(), min_mask_region_area=10,
        )
        m = np.zeros((32, 32), bool)
        m[4:16, 4:16] = True   # main region (144 px)
        m[8:10, 8:10] = False  # small hole (4 px) -> filled
        m[28:30, 28:30] = True  # distant speck (4 px) -> removed
        rec = {
            "segmentation": m.copy(),
            "bbox_xyxy": mask_to_box(m),
            "predicted_iou": 0.9,
            "crop_box": [0, 0, 32, 32],
        }
        out = gen._postprocess_small_regions([rec])
        assert len(out) == 1
        got = out[0]["segmentation"]
        assert got[8:10, 8:10].all(), "hole must be filled"
        assert not got[28:30, 28:30].any(), "speck must be removed"
        np.testing.assert_array_equal(
            out[0]["bbox_xyxy"], np.array([4, 4, 16, 16], np.float32)
        )


class TestEndToEndVIS:
    def test_synthetic_uvo(self, tmp_path, rng):
        from sam_pt_tpu.vis_eval.datasets import register_dataset
        from sam_pt_tpu.vis_eval.eval import evaluate

        t, h, w = 3, 48, 64
        gt = make_gt(1, t, h, w)
        img_root = tmp_path / "frames"
        os.makedirs(img_root / "v0")
        for i in range(t):
            Image.fromarray(
                rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
            ).save(img_root / "v0" / f"{i:05d}.jpg")
        json_file = tmp_path / "gt.json"
        with open(json_file, "w") as f:
            json.dump(gt, f)
        register_dataset("synthetic_vis", str(json_file), str(img_root),
                         class_agnostic=True)

        cfg = {
            "seed": 72,
            "dataset": "synthetic_vis",
            "output": str(tmp_path / "out"),
            "score": True,
            "max_videos": None,
            "model": {
                "_target_": "sam_pt_tpu.vis_eval.adapter.SamBasedVisToVosAdapter",
                "max_num_masks": 5,
                "masks_batch_size": 5,
                "visualize_results": True,
                "max_videos_to_visualize": 1,
                "visualization_dir": str(tmp_path / "viz"),
                "model": {
                    "_target_": "sam_pt_tpu.utils.testing.build_tiny_sam_pt",
                    "height": h, "width": w,
                },
                "sam_generator": {
                    "_target_": "sam_pt_tpu.models.sam.auto_mask_generator.SamAutomaticMaskGenerator",
                    "model": {
                        "_target_": "sam_pt_tpu.utils.testing.build_tiny_predictor",
                    },
                    "points_per_side": 3,
                    "points_per_batch": 4,
                    "pred_iou_thresh": -1e9,
                    "stability_score_thresh": 0.0,
                },
            },
        }
        results = evaluate(cfg)
        assert "AP" in results
        assert os.path.exists(tmp_path / "out" / "results.json")
        # visualize_results wrote one rendered video for the first video
        viz = os.listdir(tmp_path / "viz")
        assert len(viz) == 1 and viz[0].startswith("video_"), viz
